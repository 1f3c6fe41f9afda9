#!/usr/bin/env python3
"""Scale-validation fixture generator (driver-side tooling, NOT engine code).

Produces /tmp/graft-scale/sfX from /root/testdata/sf0.1 by replicating the
tables the heavy-tail bench queries read (documents, orders, lineitem,
part, customer) with disjoint key offsets, copying the rest verbatim.
Replica semantics:

- documents: doc_id += r*OFF; text is deterministically word-shuffled per
  replica (seed = replica index), so replicas are NEW documents, not
  near-duplicates of the originals — the pair structure stays sparse like
  the base corpus and q162/q111 scaling measures candidate generation,
  not an artificial dup explosion.
- orders/lineitem/part/customer: all keys += r*OFF — each replica is a
  DISJOINT copy of the co-purchase graph, so q80/q119/q139 scaling
  measures per-edge work on a k× graph with the same local structure.

Usage: python3 dev/scale_gen.py 3 10   (build sf0.3 = 3x and sf1 = 10x)
"""
import sys, os, shutil, random
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/tmp/graft-scale"
OFF = 100_000_000


def shuffle_text(text, seed):
    if seed == 0:
        return text
    words = text.split(" ")
    rnd = random.Random(seed * 1_000_003 + len(words))
    rnd.shuffle(words)
    return " ".join(words)


def scale_documents(k, out):
    t = pq.read_table(f"{SRC}/documents.parquet")
    d = t.to_pydict()
    cols = {c: [] for c in d}
    n = len(d["doc_id"])
    for r in range(k):
        for i in range(n):
            for c in d:
                if c == "doc_id":
                    cols[c].append(d[c][i] + r * OFF)
                elif c == "text":
                    cols[c].append(shuffle_text(d[c][i], r))
                else:
                    cols[c].append(d[c][i])
    pq.write_table(pa.table(cols, schema=t.schema), f"{out}/documents.parquet")


def scale_keys(name, key_cols, k, out):
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for r in range(k):
        if r == 0:
            parts.append(t)
            continue
        arrays = []
        for c in t.schema.names:
            a = t.column(c)
            if c in key_cols:
                a = pa.chunked_array(
                    [pa.compute.add(ch, r * OFF) for ch in a.chunks])
            arrays.append(a)
        parts.append(pa.table(dict(zip(t.schema.names, arrays)),
                              schema=t.schema))
    pq.write_table(pa.concat_tables(parts), f"{out}/{name}.parquet")


def scale_embeddings(k, out):
    # replicate vectors verbatim with offset ids: candidate volume per
    # probed cell grows k-fold, which is the quantity IVF scaling measures
    scale_keys("embeddings", {"vec_id"}, k, out)


def build(k, label):
    out = f"{DST}/{label}"
    os.makedirs(out, exist_ok=True)
    scale_documents(k, out)
    scale_embeddings(k, out)
    scale_keys("orders", {"o_orderkey", "o_custkey"}, k, out)
    # l_suppkey / c_nationkey keep referencing the verbatim-copied dims —
    # replicas share suppliers/nations; the co-purchase graph (order ×
    # part co-occurrence) still splits into k disjoint copies
    scale_keys("lineitem", {"l_orderkey", "l_partkey"}, k, out)
    scale_keys("part", {"p_partkey"}, k, out)
    scale_keys("customer", {"c_custkey"}, k, out)
    for name in ["nation", "region", "supplier", "events"]:
        shutil.copy(f"{SRC}/{name}.parquet", f"{out}/{name}.parquet")
    print(f"{label}: {k}x written to {out}")


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [3, 10]
    for k in ks:
        build(k, f"sf{k}x")
