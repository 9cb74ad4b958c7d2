#!/usr/bin/env python3
"""Synthesize an sf1-scale dataset (10x sf0.1) for scale testing.

The driver ships sf{0.001,0.01,0.1}; the scale audit (VERDICT r6 #2) wants
the suite proven at 10x. This replicates every large sf0.1 table 10 times
with per-replica key offsets chosen so referential integrity holds within
each replica (lineitem->orders->customer, lineitem->part/supplier,
documents<->embeddings ids), while nation/region (tiny dims, fixed key
domain) are copied as-is. Non-key attributes are left untouched, so value
distributions match the driver's generator exactly; only key cardinality
and row count scale.

events.parquet stores TIMESTAMP(NANOS); it goes through pyarrow (DuckDB
would truncate to micros and silently change the type Spark's nanosAsLong
path depends on). Everything else goes through DuckDB SQL.

With --mutate, document replicas are perturbed (~1 token in 20 replaced,
deterministically per replica) so they are NEAR-duplicates of their base
doc instead of exact copies — the organic-density regime: a 10x corpus
whose duplication looks like real crawl growth rather than pure
replication. Exact-replication mode (the default) remains the worst case
for the near-dup family (C(10,2) pairs per base doc); mutate mode is the
expected case. Everything else scales identically in both modes.

Usage: python3 tools/scale_up.py [src] [dst] [--mutate] [--r N] [--only t1,t2]
  src default /root/testdata/sf0.1, dst default /tmp/sf1, N default 10
  (--r 100 on sf0.1 synthesizes the sf10 probe regime, r11 verdict #3;
   --r 1000 --only documents synthesizes the sf100 documents rung, r12
   verdict #6 — 5 M organic near-dup docs, no unused 600 M-row lineitem)
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MUTATE = "--mutate" in sys.argv
ARGS = [a for a in sys.argv[1:] if a != "--mutate"]
if "--r" in ARGS:
    i = ARGS.index("--r")
    R = int(ARGS[i + 1])
    del ARGS[i:i + 2]
else:
    R = 10  # replicas
if "--only" in ARGS:
    # restrict to one table family (e.g. --only documents for the sf100
    # documents-family rung, where scaling lineitem 1000x would waste an
    # hour and 50 GB for tables the probe never reads)
    i = ARGS.index("--only")
    ONLY = set(ARGS[i + 1].split(","))
    del ARGS[i:i + 2]
else:
    ONLY = None
SRC = ARGS[0] if len(ARGS) > 0 else "/root/testdata/sf0.1"
DST = ARGS[1] if len(ARGS) > 1 else "/tmp/sf1"
# replica key ranges must never collide: base keys stay well under one
# stride, and R strides stay far from 2^53 for every family (largest
# stride is event_id's 1e9)
assert R * 1_000_000_000 < 2 ** 53, "replica count overflows key strides"

# per-key-family offsets (one replica stride); large enough that replica
# key ranges never collide, small enough to stay far from 2^53
OFF = {
    "custkey": 10_000_000,
    "orderkey": 100_000_000,
    "partkey": 10_000_000,
    "suppkey": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 1_000_000_000,
    "user_id": 1_000_000,
}

# table -> {column: key family}; unlisted columns copy through
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
COPY = ["region", "nation"]


def scale_sql(table: str) -> None:
    # stream replica-by-replica through one ParquetWriter: R-independent
    # memory, and no R-term UNION ALL (DuckDB's parser rejects ~1000-deep
    # expressions, which broke the --r 1000 embeddings rung)
    keys = KEYED[table]
    t = pq.read_table(f"{SRC}/{table}.parquet")
    total = 0
    with pq.ParquetWriter(f"{DST}/{table}.parquet", t.schema) as w:
        for r in range(R):
            cols = {}
            for name in t.column_names:
                col = t.column(name)
                if name in keys and r > 0:
                    col = pc.add(col, r * OFF[keys[name]])
                cols[name] = col
            part = pa.table(cols, schema=t.schema)
            w.write_table(part)
            total += part.num_rows
    print(f"{table}: {total} rows")


def mutate_text(text: str, r: int) -> str:
    """Replace every 20th token (replica-dependent phase) with a replica-
    tagged token — deterministic, no RNG; jaccard(base, replica) at 3-gram
    shingles stays high (~0.7-0.8) but never 1.0."""
    toks = text.split(" ")
    phase = (r * 7) % 20
    for i in range(phase, len(toks), 20):
        toks[i] = f"m{r}v{i % 97}"
    return " ".join(toks)


def scale_documents_mutated() -> None:
    # stream replica-by-replica through one ParquetWriter: at --r 1000 the
    # concat-then-write shape would hold all 5 M mutated texts in memory
    t = pq.read_table(f"{SRC}/documents.parquet")
    base_texts = [v.as_py() for v in t.column("text")]
    total = 0
    with pq.ParquetWriter(f"{DST}/documents.parquet", t.schema) as w:
        for r in range(R):
            cols = {}
            for name in t.column_names:
                col = t.column(name)
                if name == "doc_id":
                    col = pc.add(col, r * OFF["doc_id"])
                elif name == "text" and r > 0:
                    col = pa.array(
                        [mutate_text(v, r) for v in base_texts],
                        type=col.type)
                cols[name] = col
            part = pa.table(cols, schema=t.schema)
            w.write_table(part)
            total += part.num_rows
    print(f"documents: {total} rows (mutated replicas)")


def scale_events() -> None:
    t = pq.read_table(f"{SRC}/events.parquet")
    # stream one replica per row group instead of concat-ing R copies in
    # memory (R=10000 over sf0.1 would hold ~90 GB); version 2.6 + no
    # coercion keeps TIMESTAMP(NANOS) exactly as stored
    writer = pq.ParquetWriter(f"{DST}/events.parquet", t.schema,
                              version="2.6", coerce_timestamps=None)
    for r in range(R):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name == "event_id":
                col = pc.add(col, r * OFF["event_id"])
            elif name == "user_id":
                col = pc.add(col, r * OFF["user_id"])
            cols[name] = col
        writer.write_table(pa.table(cols, schema=t.schema))
    writer.close()
    n = pq.ParquetFile(f"{DST}/events.parquet").metadata.num_rows
    print(f"events: {n} rows (nanos preserved: "
          f"{t.schema.field('ts').type})")


def main() -> None:
    import os
    os.makedirs(DST, exist_ok=True)
    for tbl in COPY:
        if ONLY is not None and tbl not in ONLY:
            continue
        duckdb.sql(f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') "
                   f"TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")
        print(f"{tbl}: copied")
    for tbl in KEYED:
        if ONLY is not None and tbl not in ONLY:
            continue
        if tbl == "documents" and MUTATE:
            scale_documents_mutated()
        else:
            scale_sql(tbl)
    if ONLY is None or "events" in ONLY:
        scale_events()


if __name__ == "__main__":
    main()
