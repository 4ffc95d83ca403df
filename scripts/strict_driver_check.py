"""One-off strict driver-style compare: runs corpus queries and their
oracles at a given sf_dir, converts BOTH to pandas, sorts columns by
name and rows by value, then compares dtype kinds and exact serialized
cell values (no float tolerance beyond repr) — the closest local proxy
for the driver's value-hash gate.

Usage: python scripts/strict_driver_check.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import pandas as pd

from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
    release_pinned,
)
from event_driven_data_pipeline_for_e_commerce_spark.session import get_spark
from tests.oracle_utils import duckdb_con
import __spark_entry__ as entry


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Spark DateType -> pandas object(datetime.date) while DuckDB DATE ->
    # datetime64; the real driver accepts that pairing (dim_date_build was
    # green in r1), so coerce date-objects to datetime64 before comparing.
    import datetime as _dt

    for c in df.columns:
        if df[c].dtype == object:
            nonnull = df[c].dropna()
            if len(nonnull) and all(
                isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
                for v in nonnull
            ):
                df[c] = pd.to_datetime(df[c])
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(
        drop=True
    )
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    keys = sys.argv[2:]
    queries = entry.queries()
    oracles = entry.oracle_sql()
    if not keys:
        keys = [k for k in queries if k in oracles]
    spark = get_spark()
    con = duckdb_con(sf_dir)
    bad = 0
    for k in keys:
        try:
            sdf = queries[k](spark, sf_dir).toPandas()
            odf = con.execute(oracles[k]).df()
            s, o = norm(sdf), norm(odf)
            if list(s.columns) != list(o.columns):
                print(f"FAIL {k}: cols spark={list(s.columns)} oracle={list(o.columns)}")
                bad += 1
                continue
            if len(s) != len(o):
                print(f"FAIL {k}: rows spark={len(s)} oracle={len(o)}")
                bad += 1
                continue
            kinds_s = [d.kind for d in s.dtypes]
            kinds_o = [d.kind for d in o.dtypes]
            if kinds_s != kinds_o:
                print(f"FAIL {k}: dtype kinds spark={kinds_s} oracle={kinds_o}")
                bad += 1
                continue
            sv = s.astype(str).values.tolist()
            ov = o.astype(str).values.tolist()
            if sv != ov:
                for i, (a, b) in enumerate(zip(sv, ov)):
                    if a != b:
                        print(f"FAIL {k}: first diff row {i}\n  spark={a}\n  oracle={b}")
                        break
                bad += 1
                continue
            print(f"ok   {k} ({len(s)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {k}: {type(e).__name__}: {str(e)[:200]}")
            bad += 1
        finally:
            # batch boundary: the query's result is fully materialized
            # (toPandas above), so every pin it took — including
            # non-evictable correctness pins — can be released before
            # the next query runs; without this a long batch
            # accumulates one persisted frame per pin site
            release_pinned()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
