#!/usr/bin/env python3
"""DuckDB twin of graft.tools.SessionFingerprintLab: the gaps-and-islands
sessionize (the committed oracle formulation, SparkEntry.oracleSql
["sessionize"]) reduced to the same order-independent aggregate
fingerprints, for full-scale rungs whose session output exceeds the
row-compare harness (1 B events -> 954.7 M session rows).

Key packing must stay provably inside BIGINT: DuckDB raises on 64-bit
overflow (it does not wrap), so every packed key shifts a mod-2^31
component by 32 and adds an epoch < 2^32 (max (2^31-1)*2^32 + 2^32-1
< 2^63). k_end folds user_id in because the replicated 1B rung makes
(session_id, end_ts) replica-invariant -- an even replica count XORs
to a content-free 0.

Usage: python3 tools/session_fingerprint.py <sfDir> [spill_dir]
Prints one JSON line; compare field-for-field with the Spark line.
"""
import json
import sys
import time

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
spill = sys.argv[2] if len(sys.argv) > 2 else "/tmp/duck_spill"

con = duckdb.connect()
con.execute(f"SET temp_directory='{spill}'")
con.execute("SET preserve_insertion_order=false")

t0 = time.time()
row = con.execute(f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM '{sf}/events.parquet'),
numbered AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged),
sessions AS (
  SELECT user_id, session_id, min(ts) AS start_ts, max(ts) AS end_ts,
         count(*) AS n_events
  FROM numbered GROUP BY user_id, session_id)
SELECT count(*) AS n,
       bit_xor(((user_id % 2147483648) << 32) + CAST(floor(epoch(start_ts)) AS BIGINT)) AS xor_start,
       bit_xor((((user_id * 31 + session_id) % 2147483648) << 32) + CAST(floor(epoch(end_ts)) AS BIGINT)) AS xor_end,
       CAST(sum(n_events) AS BIGINT) AS sum_nev,
       CAST(sum(session_id) AS BIGINT) AS sum_sid,
       max(user_id) AS max_user,
       max(session_id) AS max_sid
FROM sessions
""").fetchone()
print(json.dumps({
    "engine": "duckdb", "sf": sf,
    "n": row[0], "xor_start": row[1], "xor_end": row[2],
    "sum_nev": row[3], "sum_sid": row[4],
    "max_user": row[5], "max_sid": row[6],
    "secs": round(time.time() - t0, 1)}))
