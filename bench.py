"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

``--scaling`` additionally runs the flagship rollup at local[8] and local[32]
and reports throughput (rolled-up points/sec) at both plus the scaling
efficiency (BASELINE.md scaling criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def run_bench() -> dict:
    from diive_spark import queries as q
    from diive_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="diive-spark-bench",
        shuffle_partitions=int(CPUS),
    )
    # warm the JVM + parquet footers once
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in q.QUERIES.items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = n
    total = round(sum(timings.values()), 4)
    try:
        sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = None
    return {
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }


def run_scaling() -> dict:
    """Flagship rollup throughput at two parallelism levels (the sandbox
    proxy for N vs 4N executors — BASELINE.md scaling criterion)."""
    from diive_spark import queries as q
    from diive_spark.session import get_spark

    results = {}
    for cores in (8, 32):
        spark = get_spark(
            master=f"local[{cores}]",
            app_name=f"diive-spark-scale-{cores}",
            shuffle_partitions=cores,
        )
        spark.read.parquet(f"{SF_DIR}/events.parquet").count()  # warm
        t0 = time.perf_counter()
        n_points = q.q_resample_30min_gated(spark, SF_DIR).count()
        dt = time.perf_counter() - t0
        results[f"local[{cores}]"] = {
            "sec": round(dt, 4),
            "points": n_points,
            "points_per_sec": round(n_points / dt, 1),
        }
        spark.stop()
    eff = (
        results["local[32]"]["points_per_sec"]
        / results["local[8]"]["points_per_sec"]
        / 4.0
    )
    results["scaling_efficiency"] = round(eff, 3)
    return results


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
