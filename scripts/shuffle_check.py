#!/usr/bin/env python3
"""Robustness check: rewrite the corpus with shuffled physical row order
and re-run the full oracle gate against the shuffled copy. Both engines
see the same shuffled bag, so every query must still hash-match — this
catches any hidden dependence on input row order (a 100 TB cluster never
guarantees one).

Usage: python3 scripts/shuffle_check.py [src_sf_dir]
"""
import os, subprocess, sys, tempfile

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
DST = tempfile.mkdtemp(prefix="graft-shuffled-")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    src = f"{SRC}/{t}.parquet"
    if not os.path.exists(src):
        continue
    # deterministic-but-scrambled order: sort by a hash of the row number
    con.sql(f"""
      COPY (SELECT * EXCLUDE (__rn) FROM
              (SELECT *, row_number() OVER () AS __rn FROM '{src}')
            ORDER BY md5(CAST(__rn AS VARCHAR)))
      TO '{DST}/{t}.parquet' (FORMAT PARQUET)""")
print(f"[shuffle] corpus rewritten in scrambled order at {DST}")

r = subprocess.run([sys.executable, "scripts/check_oracle.py", DST,
                    f"{DST}/verify_out"], cwd="/root/repo")
sys.exit(r.returncode)
