#!/usr/bin/env python3
"""Pre-flight oracle check (dev tooling only — NOT part of the library).

Emulates the driver's correctness gate STRICTLY: both sides go through
pandas (like the driver), values are hashed in EMITTED row order (so the
canonical ORDER BY must make both engines agree), and dtype divergence
(e.g. DuckDB HUGEINT -> float64 vs Spark int64) is flagged — that dtype
path is what broke q15/q49/q51 in round 1 despite equal values.

    python3 dev/oracle_check.py <verify_out_dir> <sf_dir> [--json <path>] [query ...]

--json <path> additionally emits the round's machine-readable record in
the driver's CORRECTNESS_r*.json schema (per-query {rows_match,
schema_match, hash_match, spark_rows, oracle_rows, err}) so every gate
leaves a diffable artifact (docs/correctness_latest.json) even when the
driver's own file arrives empty — as it did in rounds 7 and 8.
"""
import glob
import hashlib
import json
import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, (float, np.floating)) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def nan_null_profile(tbl):
    """Per-float-column (null_count, nan_count) from the ARROW table, where
    NULL and NaN are still distinct (pandas float64 conflates them, so the
    hash compare can't see a real NaN-vs-NULL divergence — this note can).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    prof = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if pa.types.is_floating(col.type):
            nans = pc.sum(pc.is_nan(pc.drop_null(col.combine_chunks()))).as_py() or 0
            prof[name] = (col.null_count, int(nans))
    return prof


def fingerprint(df):
    cols = sorted(df.columns)
    df = df[cols]
    dtypes = [str(df[c].dtype) for c in cols]
    rows = ["|".join(norm_cell(v) for v in rec)
            for rec in df.itertuples(index=False, name=None)]
    h_emitted = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    h_sorted = hashlib.sha256("\n".join(sorted(rows)).encode()).hexdigest()
    return cols, dtypes, len(rows), h_emitted, h_sorted, rows


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    json_path = None
    if "--json" in rest:
        i = rest.index("--json")
        if i + 1 >= len(rest):
            sys.exit("usage: --json requires a path argument")
        json_path = rest[i + 1]
        if json_path.startswith("q") and not os.sep in json_path \
                and "." not in json_path:
            sys.exit(f"--json argument {json_path!r} looks like a query "
                     "name, not a path — did you forget the path?")
        rest = rest[:i] + rest[i + 2:]
    only = set(rest)
    record = {}

    def rec(name, rows_match, schema_match, hash_match,
            spark_rows=None, oracle_rows=None, err=None):
        record[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            rec(name, False, False, False, err="no spark output")
            n_fail += 1
            continue
        got_tbl = pq.read_table(files[0] if len(files) == 1
                                else f"{out_dir}/{name}")
        got = got_tbl.to_pandas()
        try:
            exp_tbl = con.execute(sql).arrow()
            exp = exp_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            rec(name, False, False, False, spark_rows=len(got),
                err=f"oracle sql error: {e}")
            n_fail += 1
            continue
        gc, gd, gn, ghe, ghs, grows = fingerprint(got)
        ec, ed, en, ehe, ehs, erows = fingerprint(exp)
        # INVARIANT (GraftQuery.canonicalOrder): Spark sorts output rows by
        # SCHEMA field order, the oracle wrapper by SELECT-LIST order — the
        # two only agree when every oracle names its columns in the Spark
        # output's left-to-right order. Enforce it HERE (both engines'
        # un-sorted column lists are visible), so a reordered column fails
        # with the cause instead of a cryptic ORDER-ONLY hash mismatch.
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: column ORDER spark={list(got.columns)} "
                  f"duckdb={list(exp.columns)} — canonical sort keys diverge")
            rec(name, gn == en, gc == ec, False, gn, en,
                err="column order diverges from oracle SELECT list")
            n_fail += 1
            continue
        if gc != ec:
            print(f"FAIL {name}: schema spark={gc} duckdb={ec}")
            rec(name, gn == en, False, False, gn, en,
                err=f"schema spark={gc} duckdb={ec}")
            n_fail += 1
        elif gn != en:
            print(f"FAIL {name}: rows spark={gn} duckdb={en}")
            rec(name, False, True, False, gn, en, err="row count mismatch")
            n_fail += 1
        elif ghe != ehe:
            kind = "ORDER-ONLY" if ghs == ehs else "VALUES"
            diff = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
            print(f"FAIL {name}: {kind} mismatch; dtypes spark={gd} "
                  f"duckdb={ed}; first diffs: {diff}")
            rec(name, True, True, False, gn, en,
                err=f"{kind} hash mismatch; first diffs: {diff}")
            n_fail += 1
        else:
            note = "" if gd == ed else f"  [dtype note: spark={gd} duckdb={ed}]"
            gp, ep = nan_null_profile(got_tbl), nan_null_profile(exp_tbl)
            if gp != ep:
                note += (f"  [NaN/NULL note: spark={gp} duckdb={ep} "
                         f"(null_count, nan_count) diverge — hash treats them alike]")
            print(f"PASS {name} ({gn} rows){note}")
            rec(name, True, True, True, gn, en)
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    if json_path:
        # strict round trip (the Verify.main discipline): what lands on
        # disk must read back as exactly the record just built
        with open(json_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        assert json.load(open(json_path)) == record, "correctness JSON round-trip"
        print(f"wrote {json_path} ({len(record)} queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
