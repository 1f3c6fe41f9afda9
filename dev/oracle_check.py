#!/usr/bin/env python3
"""Pre-flight oracle check (dev tooling only — NOT part of the library).

Mimics the driver's t2 gate: run `graft.Verify` output against DuckDB on the
same parquet tables, compare per query (schema by sorted column name, values
by sorted-row hash). Usage:

    python3 dev/oracle_check.py <verify_out_dir> <sf_dir> [query ...]
"""
import glob
import hashlib
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # match plausible driver normalization: repr of float
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_fingerprint(tbl):
    cols = sorted(tbl.column_names)
    rows = []
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    for i in range(n):
        rows.append("|".join(norm_cell(data[c][i]) for c in cols))
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return cols, n, h, rows


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
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
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pq.read_table(files[0] if len(files) == 1 else f"{out_dir}/{name}")
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        gc, gn, gh, grows = table_fingerprint(got)
        ec, en, eh, erows = table_fingerprint(exp)
        if gc != ec:
            print(f"FAIL {name}: schema spark={gc} duckdb={ec}")
            n_fail += 1
        elif gn != en:
            print(f"FAIL {name}: rows spark={gn} duckdb={en}")
            n_fail += 1
        elif gh != eh:
            diff = [(a, b) for a, b in zip(grows, erows) if a != b][:3]
            print(f"FAIL {name}: hash mismatch; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({gn} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
