"""Capture the POST-execution (AQE-final) physical plan of corpus
queries: run once with the noop sink, then `explain("formatted")` on
the same DataFrame — executed stages print with isFinalPlan=true and
runtime join conversions (broadcast from pinned-frame stats) visible.

Usage: python scripts/final_plan_r12.py <query> [query ...]
Writes plans/r12/<query>_final_<n>.txt and prints the run time.
"""
from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from event_driven_data_pipeline_for_e_commerce_spark.operators.pinning import (
    release_pinned,
)
from event_driven_data_pipeline_for_e_commerce_spark.session import get_spark
import __spark_entry__ as entry


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = entry.queries()
    spark = get_spark("final-plan-r12")
    os.makedirs("plans/r12", exist_ok=True)
    for name in names:
        release_pinned()
        spark.catalog.clearCache()
        c0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        c1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"finalplan:{name}")
        df.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(None)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r12/{name}_final.txt", "w") as fh:
            fh.write(buf.getvalue())
        print(
            f"{name}: construct={c1 - c0:.3f}s run={t1 - c1:.3f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
