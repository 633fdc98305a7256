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
    # warm the JVM + parquet footers + Python UDF workers once
    from pyspark.sql import functions as F

    warm = spark.read.parquet(f"{SF_DIR}/events.parquet")
    warm.count()

    @F.pandas_udf("double")
    def _noop(v):
        return v

    warm.select(_noop("value")).count()

    # best-of-2 per query: this VM's hypervisor steal varies run-to-run
    # by up to 5x in bursts (BASELINE.md methodology) — a single-shot
    # timing can attribute a steal window to whatever query it lands on.
    # Each query still builds its DataFrame fresh per run (no cached
    # plans are reused across the two runs beyond Spark's normal
    # session state).
    #
    # VERDICT r4 #3: the old single-loop budget guard silently degraded
    # 703/981 queries to one run once the wall passed 480 s.  Two-pass
    # structure instead: pass 1 times EVERY query once (full coverage
    # survives any interruption), pass 2 spends the remaining budget on
    # second runs in registry order and takes the min.  A SIGTERM from a
    # caller-side timeout dumps whatever is complete so the round artifact
    # is never lost.
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "2100"))
    bench_t0 = time.perf_counter()
    timings: dict[str, float] = {}
    second_runs: set[str] = set()

    def one_run(fn) -> float:
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        _ = df.count()
        dt = time.perf_counter() - t0
        # queries that persist intermediates (signature tables) must
        # rebuild them each run — cache reuse would hide their cost
        spark.catalog.clearCache()
        return dt

    def snapshot() -> dict:
        degraded = [n for n in timings if n not in second_runs]
        try:
            sf = float(SF_DIR.rstrip("/").split("sf")[-1])
        except ValueError:
            sf = None
        rec = {
            "metric": "total_query_time",
            "value": round(sum(timings.values()), 4),
            "unit": "sec",
            "queries": {n: round(v, 4) for n, v in timings.items()},
            "sf": sf,
            "runs_per_query": runs_per_query,
        }
        if degraded and runs_per_query > 1:
            rec["degraded_to_one_run"] = degraded
        return rec

    import signal

    def on_term(signum, frame):  # pragma: no cover - driver-kill path
        rec = snapshot()
        rec["interrupted"] = True
        (REPO / "bench_out.json").write_text(json.dumps(rec, indent=1))
        print(json.dumps(rec), flush=True)
        print(
            json.dumps(
                {
                    "metric": rec["metric"],
                    "value": rec["value"],
                    "unit": rec["unit"],
                    "sf": rec["sf"],
                    "n_queries": len(rec["queries"]),
                    "interrupted": True,
                }
            ),
            flush=True,
        )
        sys.exit(1)

    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGINT, on_term)

    items = list(q.QUERIES.items())
    for name, fn in items:  # pass 1: coverage
        timings[name] = one_run(fn)
    for rep in range(1, runs_per_query):  # pass 2+: stability
        for name, fn in items:
            if time.perf_counter() - bench_t0 > budget_s:
                break
            timings[name] = min(timings[name], one_run(fn))
            second_runs.add(name)
    return snapshot()


SCALE_KEYS = 8000
SCALE_ROWS_PER_KEY = 1440  # one day of 1-min points per series
# the flagship-rollup scaling job runs on a 16x input (184M points):
# at the standard size the rollup finishes sub-second on 8 cores, so the
# measured "efficiency" was fixed-cost amortization, not the operator
# (round-5 measurement: 11.5M pts -> 0.51 at 2->8; 184M pts -> 0.94)
SCALE_XL_FACTOR = 16


def _scale_input(spark, cores: int, n_keys: int = SCALE_KEYS,
                 partitions_per_core: int = 1):
    """Deterministic distributed synthesis — identical input at every
    parallelism level (no external data, no randomness)."""
    from pyspark.sql import functions as F

    n = n_keys * SCALE_ROWS_PER_KEY
    return spark.range(
        0, n, 1, numPartitions=cores * partitions_per_core
    ).select(
        F.concat(F.lit("url"), (F.col("id") / SCALE_ROWS_PER_KEY).cast("long")).alias(
            "url"
        ),
        F.timestamp_micros(
            F.lit(1704067200_000_000) + (F.col("id") % SCALE_ROWS_PER_KEY) * 60_000_000
        ).alias("ts"),
        ((F.xxhash64("id") % 100000) / 997.0).alias("value"),
    )


def run_scaling() -> dict:
    """Same two jobs at several parallelism levels — the sandbox proxy for
    N vs 4N executors (BASELINE.md scaling criterion).

    Jobs (both tiers of the engine):
      * rollup  — expression-tier gated resample (whole-stage codegen)
      * gorilla — kernel-tier Gorilla+delta-of-delta block compression
        (Arrow-batched applyInPandas; compute-bound)

    Methodology: identical deterministic input at every level; one
    warm-up run then best-of-3 timed runs (the sandbox VM shows
    hypervisor steal time under full load — see BASELINE.md).
    Efficiencies are reported for BOTH N->4N pairs: cores 2->8 and 8->32.
    """
    from diive_spark.compression.blocks import compress_blocks, decompress_blocks
    from diive_spark.operators.resample import resample_gated
    from diive_spark.session import get_spark

    n_input = SCALE_KEYS * SCALE_ROWS_PER_KEY
    results: dict = {"input_points": n_input}
    for cores in (2, 8, 32):
        spark = get_spark(
            master=f"local[{cores}]",
            app_name=f"diive-spark-scale-{cores}",
            shuffle_partitions=cores,
            extra_conf={"spark.driver.memory": "8g"},
        )
        inp = _scale_input(spark, cores)
        compressed = compress_blocks(inp, "url", "ts", "value", block_seconds=86400)
        # pre-materialize compressed blocks so the decode job is pure
        # kernel compute over a tiny scan (the shape a tier read has)
        import tempfile

        blk_dir = tempfile.mkdtemp(prefix=f"scale_blocks_{cores}_")
        compressed.repartition(cores).write.mode("overwrite").parquet(blk_dir)
        blocks_on_disk = spark.read.parquet(blk_dir)
        inp_xl = _scale_input(
            spark, cores, n_keys=SCALE_KEYS * SCALE_XL_FACTOR,
            partitions_per_core=2,
        )
        n_xl = SCALE_KEYS * SCALE_XL_FACTOR * SCALE_ROWS_PER_KEY
        jobs = {
            "rollup": resample_gated(
                inp, "url", "ts", "value", bucket_seconds=1800, mincounts_perc=0.9
            ),
            # north-rule headline: the gated rollup at a size where the
            # operator, not session fixed cost, dominates even on 8 cores
            "rollup_xl": resample_gated(
                inp_xl, "url", "ts", "value", bucket_seconds=1800,
                mincounts_perc=0.9,
            ),
            "gorilla": compressed,
            "gorilla_decode": decompress_blocks(blocks_on_disk, key_col="url"),
        }
        level = {}
        for name, df in jobs.items():
            df.count()  # warm-up (JIT, codegen, python workers)
            times = []
            for _ in range(2 if name == "rollup_xl" else 4):
                t0 = time.perf_counter()
                df.count()
                times.append(time.perf_counter() - t0)
            dt = min(times)
            n_job = n_xl if name == "rollup_xl" else n_input
            level[name] = {
                "sec": round(dt, 4),
                "points_per_sec": round(n_job / dt, 1),
            }
        results[f"local[{cores}]"] = level
        spark.stop()
        import shutil

        shutil.rmtree(blk_dir, ignore_errors=True)

    for job in ("rollup", "rollup_xl", "gorilla", "gorilla_decode"):
        for lo, hi in ((2, 8), (8, 32)):
            eff = (
                results[f"local[{hi}]"][job]["points_per_sec"]
                / results[f"local[{lo}]"][job]["points_per_sec"]
                / (hi / lo)
            )
            results[f"efficiency_{job}_{lo}to{hi}"] = round(eff, 3)
    return results


def run_reference_compare() -> dict:
    """Match-or-beat check (BASELINE.md): the reference's own
    ``resample_series_to_30MIN`` (imported from /root/reference, pandas,
    single-node sequential per-series loop — its only execution mode)
    versus the engine's gated rollup at local[32], on IDENTICAL data:
    1000 series x 10k points @10min = 10M points (large enough that
    Spark's fixed per-job cost stops dominating — the regime this engine
    is built for)."""
    import contextlib
    import io

    import numpy as np
    import pandas as pd

    sys.path.insert(0, str(REPO / "tests"))
    from reference_import import load_reference

    ref = load_reference()
    n_series, n_pts = 1000, 10_000
    total = n_series * n_pts
    rng = np.random.RandomState(1)
    idx = pd.date_range(
        "2023-01-01 00:10", periods=n_pts, freq="10min", name="TIMESTAMP_END"
    )
    values = rng.normal(50, 8, (n_series, n_pts))

    out: dict = {"points": total}
    if ref is not None:
        series_list = [
            pd.Series(values[i], index=idx, name=f"s{i}") for i in range(n_series)
        ]
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(io.StringIO()):
            for s in series_list:
                ref.resample_series_to_30MIN(
                    s, to_freqstr="30T", agg="mean", mincounts_perc=0.9
                )
        dt = time.perf_counter() - t0
        out["reference"] = {"sec": round(dt, 3), "points_per_sec": round(total / dt)}

    from diive_spark.operators.resample import resample_gated
    from diive_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="ref-compare",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.driver.memory": "12g"},
    )
    # the engine reads from storage (parquet), like the 100 TB target;
    # the reference keeps its pandas frames fully in memory - a handicap
    # for the engine, kept for honesty
    import tempfile

    long = pd.DataFrame(
        {
            "key": np.repeat(np.arange(n_series), n_pts),
            "ts": np.tile(idx.values, n_series),
            "value": values.ravel(),
        }
    )
    tmp = tempfile.mkdtemp(prefix="refcmp_")
    spark.createDataFrame(long).repartition(int(CPUS)).write.mode(
        "overwrite"
    ).parquet(tmp)
    del long
    sdf = spark.read.parquet(tmp)
    sdf.count()  # warm footers
    job = resample_gated(
        sdf, "key", "ts", "value", bucket_seconds=1800,
        mincounts_perc=0.9, source_freq_seconds=600,
    )
    job.count()  # warm codegen
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        job.count()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    out["engine"] = {"sec": round(dt, 3), "points_per_sec": round(total / dt)}
    if "reference" in out:
        out["speedup"] = round(
            out["engine"]["points_per_sec"] / out["reference"]["points_per_sec"], 2
        )
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--reference" in sys.argv:
        print(json.dumps(run_reference_compare()))
    else:
        res = run_bench()
        # VERDICT r3 #6: the driver's capture keeps the END of stdout, so
        # the giant full record must come FIRST and the short headline LAST
        # — otherwise the tail keeps only the truncated giant line and
        # BENCH parses as null (it did in r02 AND r03).  Full record also
        # persisted to bench_out.json.
        (REPO / "bench_out.json").write_text(json.dumps(res, indent=1))
        print(json.dumps(res), flush=True)
        print(
            json.dumps(
                {
                    "metric": res["metric"],
                    "value": res["value"],
                    "unit": res["unit"],
                    "sf": res["sf"],
                    "n_queries": len(res["queries"]),
                }
            ),
            flush=True,
        )
