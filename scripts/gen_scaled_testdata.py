#!/usr/bin/env python
"""Deterministic up-scaled testdata for scaling-curve measurement.

TESTDATA.md caps the driver-generated data at sf0.1 (~600k lineitem),
so every 100 TB claim in the repo rests on plan-shape audits
(PLANS.md + the test_plans guards). This generator converts those
"shaped right" claims into MEASURED time-vs-rows curves (VERDICT-r10
task 2) by tiling the sf0.1 corpus K times with disjoint key ranges:

- copy 0 is the original sf0.1 data verbatim;
- copies 1..K-1 offset every synthetic key (order/cust/supp/part/
  event/user/doc/vec) by copy * 10_000_000 — far above any sf0.1 key
  and congruent 0 mod every sampling modulus the corpus uses, so the
  deterministic audit samples scale linearly with the data;
- document text in copy k rewrites ~1/3 of tokens (hash(w||k) % 3)
  so cross-copy doc pairs fall well below every shingle-Jaccard /
  SimHash near-dup threshold while WITHIN-copy near-dup structure is
  preserved (both members of a pair get the same rewrite) — a K-times
  corpus therefore has K times the dup classes at the same class-size
  profile, which is what linear corpus growth looks like (verbatim
  tiling would instead multiply class SIZES by K and conflate output
  blowup with compute scaling);
- embeddings in copy k get a per-element deterministic jitter
  (~1e-2 scale) so exact-dedup and near-dup structure also replicate
  per copy instead of compounding across copies;
- dims (region/nation) and the calendar stay FIXED — exactly the
  bounded-grain design the day-frame/window allowlists claim.

Usage: python scripts/gen_scaled_testdata.py OUT_DIR K
   e.g. python scripts/gen_scaled_testdata.py scaledata/sf0.5 5
        python scripts/gen_scaled_testdata.py scaledata/sf1 10

Output is for LOCAL measurement only (scripts/bench_scaling.py);
never committed (see .gitignore) and never read by correctness gates.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def main() -> None:
    out_dir, k = sys.argv[1], int(sys.argv[2])
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE MACRO off(x, k) AS x + k * {STRIDE}")

    def gen(table: str, select_sql: str) -> None:
        src = f"read_parquet('{SRC}/{table}.parquet')"
        dst = f"{out_dir}/{table}.parquet"
        con.execute(
            f"COPY ({select_sql.format(src=src, k=k)}) TO '{dst}' "
            "(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    # dims: verbatim
    for t in ("region", "nation"):
        gen(t, "SELECT * FROM {src}")

    gen("customer", """
        SELECT off(c_custkey, k) AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM {src}, range(0, {k}) t(k)""")
    gen("supplier", """
        SELECT off(s_suppkey, k) AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM {src}, range(0, {k}) t(k)""")
    gen("part", """
        SELECT off(p_partkey, k) AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM {src}, range(0, {k}) t(k)""")
    gen("orders", """
        SELECT off(o_orderkey, k) AS o_orderkey,
               off(o_custkey, k) AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src}, range(0, {k}) t(k)""")
    gen("lineitem", """
        SELECT off(l_orderkey, k) AS l_orderkey,
               off(l_partkey, k) AS l_partkey,
               off(l_suppkey, k) AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src}, range(0, {k}) t(k)""")
    gen("events", """
        SELECT off(event_id, k) AS event_id, ts,
               off(user_id, k) AS user_id, event_type, value, props
        FROM {src}, range(0, {k}) t(k)""")
    gen("documents", """
        SELECT off(doc_id, k) AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE array_to_string(list_transform(
                        string_split(text, ' '),
                        w -> CASE WHEN hash(w || k) % 3 = 0
                                  THEN w || k ELSE w END), ' ')
               END AS text,
               lang, source,
               CAST(LENGTH(CASE WHEN k = 0 THEN text
                    ELSE array_to_string(list_transform(
                        string_split(text, ' '),
                        w -> CASE WHEN hash(w || k) % 3 = 0
                                  THEN w || k ELSE w END), ' ')
               END) AS BIGINT) AS n_chars
        FROM {src}, range(0, {k}) t(k)""")
    gen("embeddings", """
        SELECT off(vec_id, k) AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE list_transform(embedding, x -> CAST(
                        x + (CAST(hash(CAST(x AS VARCHAR) || k) % 1001
                                  AS BIGINT) - 500) * 2e-5 AS FLOAT))
               END AS embedding,
               label
        FROM {src}, range(0, {k}) t(k)""")


if __name__ == "__main__":
    main()
