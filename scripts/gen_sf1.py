#!/usr/bin/env python
"""Synthesize the sf1 key tables for the 100x scale rehearsal.

The engine's world derivations consume ONLY key columns — DISTINCT
(l_orderkey, l_linenumber) pairs from lineitem, p_partkey from part,
n_nationkey from nation (datagen/world.py:66-67,199,247,270) — so an sf1
input only needs the keysets at the right scale and shape.  The driver's
testdata stops at sf0.1 (TESTDATA.md) and this sandbox has no network for
duckdb's tpch extension, so we extrapolate the measured sf0.1 shape
(orders 1..150000, linenumber 1..7 uniform, ~4.07 lines/order, 20k parts)
by 10x deterministically:

  orders 1..1_500_000; line l in 1..7 kept iff (o*31 + l*17) % 7 < 4
  (expected 4 lines/order -> ~6.0M lineitem pairs); parts 0..199_999.

Everything is a pure function of the keys — no RNG, no timestamps — so the
rehearsal world is reproducible bit-for-bit.

Usage: python scripts/gen_sf1.py [/tmp/sf1]
"""

import os
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

con.execute(f"""
COPY (
  SELECT o AS l_orderkey, CAST(l AS INTEGER) AS l_linenumber
  FROM range(1, 1500001) r(o), range(1, 8) s(l)
  WHERE (o * 31 + l * 17) % 7 < 4
  ORDER BY o, l
) TO '{out}/lineitem.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (SELECT range AS p_partkey FROM range(200000))
TO '{out}/part.parquet' (FORMAT PARQUET)
""")
con.execute(f"""
COPY (SELECT range AS n_nationkey FROM range(25))
TO '{out}/nation.parquet' (FORMAT PARQUET)
""")
n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}/lineitem.parquet')").fetchone()[0]
print(f"sf1 written to {out}: lineitem={n} part=200000 nation=25")
