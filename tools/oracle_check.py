#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [query ...]

For each query dir under verify_out_dir: load Spark's parquet result and
the DuckDB oracle result (oracle_sql.json over the sf parquet tables),
sort columns by name, sort rows, and compare dtypes + values the way the
driver's hash compare would see them.
"""
import json, os, sys, glob, math

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # Let big oracle intermediates (the 10x near-dup pair SQL) spill to
    # disk instead of dying on the in-memory default — the oracle must be
    # able to STATE the answer even when it needs more than RAM to do so.
    con.sql("SET temp_directory='/tmp/duckdb_oracle_spill'")
    con.sql("SET max_temp_directory_size='40GiB'")
    # Cap the memory budget well under physical RAM: DuckDB sizes its
    # default limit off total memory at startup, so a replay racing a
    # Spark JVM for the same RAM dies with "failed to allocate" instead
    # of spilling (seen on the 10x pair SQL). Derive the cap from the
    # host's actual RAM (half of it, at most 40GiB) so a smaller box
    # still plans out-of-core instead of over-committing; results are
    # identical either way.
    ram_gib = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / (1 << 30)
    cap_gib = max(1, min(40, int(ram_gib // 2)))
    con.sql(f"SET memory_limit='{cap_gib}GiB'")
    for t in TABLES:
        # partial corpora (e.g. a scale_up --only embeddings rung) carry a
        # subset of the tables; views over the rest would fail at CREATE
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name:24s} NO SPARK OUTPUT")
            fails += 1
            continue
        spark_df = norm(con.sql(
            f"SELECT * FROM read_parquet({files!r})").df())
        try:
            ora_df = norm(con.sql(sql).df())
        except Exception as e:
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            fails += 1
            continue
        problems = []
        if len(spark_df) != len(ora_df):
            problems.append(f"rows {len(spark_df)} vs {len(ora_df)}")
        if list(spark_df.columns) != list(ora_df.columns):
            problems.append(f"cols {list(spark_df.columns)} vs {list(ora_df.columns)}")
        else:
            for c in spark_df.columns:
                if str(spark_df[c].dtype) != str(ora_df[c].dtype):
                    problems.append(f"dtype[{c}] {spark_df[c].dtype} vs {ora_df[c].dtype}")
            if not problems:
                for c in spark_df.columns:
                    a, b = spark_df[c], ora_df[c]
                    if a.dtype.kind == "f":
                        bad = ~((a.isna() & b.isna()) | (abs(a - b) <= 1e-9))
                    else:
                        bad = ~((a.isna() & b.isna()) | (a == b))
                    n = int(bad.sum())
                    if n:
                        i = bad.idxmax()
                        problems.append(
                            f"values[{c}] {n} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
        if problems:
            fails += 1
            print(f"{name:24s} FAIL: " + "; ".join(problems[:4]))
        else:
            print(f"{name:24s} ok ({len(spark_df)} rows)")
    print(f"\n{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
