"""Time a subset of registry queries with the bench.py harness semantics
(fresh lineage per run, clearCache between runs, best-of-N).

Usage: python tools/time_queries.py name [name ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_RUNS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main(names: list[str]) -> None:
    from diive_spark import queries as q
    from diive_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="time-queries",
        shuffle_partitions=int(CPUS),
    )
    warm = spark.read.parquet(f"{SF_DIR}/events.parquet")
    warm.count()

    @F.pandas_udf("double")
    def _noop(v):
        return v

    warm.select(_noop("value")).count()
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    out = {}
    for name in names:
        fn = q.QUERIES[name]
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            _ = fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1:])
