"""Marginal Distribution Sampling (MDS) gap-filling.

The FLUXNET-standard lookup-table gap-fill (Reichstein et al. 2005,
Global Change Biology 11, appendix A; the REddyProc default): a gap is
filled with the MEAN of observations made under SIMILAR conditions —
covariates within fixed tolerances — inside an expanding time window,
falling back to a coarser condition set and finally to a
same-time-of-day climatology:

  tier 1: all covariates within tolerance, ±W1 slots
  tier 2: all covariates within tolerance, ±W2 slots (W2 > W1)
  tier 3: first covariate only,            ±W1 slots
  tier 4: same cycle position ±1 (hour-of-day), ±W2 slots
  else  : unfilled (flag 9)

This is the classic method the reference's `RandomForestTS`
(`diive/pkgs/gapfilling/randomforest_ts.py`) modernizes — MDS is the
lookup-table member of the same §2.10 gap-filling family and is what a
reference user migrating FLUXNET pipelines expects to find; unlike the
RF it is fully declarative and oracle-checkable.

Spark-first plan: each tier is ONE banded equi-join — gap rows are
exploded to the 3 adjacent width-W time buckets (gaps are the SMALL
side; observations are never replicated), joined on (key, bucket),
then band-filtered — followed by a combinable per-gap aggregate.  No
window over the full series, no driver loop; everything partitions by
the series key + time bucket, so the plan survives millions of series
× years of slots.  Tolerance predicates compare pre-rounded values, so
candidate sets are engine-exact (comparisons of identical doubles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mds_gapfill"]


def _band_candidates(
    gaps: DataFrame,
    obs: DataFrame,
    keys: list[str],
    ts_col: str,
    window: int,
) -> DataFrame:
    """Gap×obs pairs with |ts_gap - ts_obs| <= window, via a 3-bucket
    banded equi-join (bucket width = window, gap side exploded)."""
    g = gaps.select(
        *keys,
        F.col(ts_col).alias("_tg"),
        *[c for c in gaps.columns if c not in keys and c != ts_col],
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("_off"),
    ).withColumn("_bk", F.floor(F.col("_tg") / window) + F.col("_off"))
    o = obs.select(
        *keys,
        F.col(ts_col).alias("_to"),
        *[
            F.col(c).alias(f"_o_{c}")
            for c in obs.columns
            if c not in keys and c != ts_col
        ],
    ).withColumn("_bk", F.floor(F.col("_to") / window))
    return g.join(o, keys + ["_bk"]).filter(
        F.abs(F.col("_tg") - F.col("_to")) <= window
    )


def mds_gapfill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    target_col: str,
    cov_cols: Sequence[str],
    tolerances: Sequence[float],
    window_1: int,
    window_2: int,
    cycle: int = 24,
    min_n: int = 2,
) -> DataFrame:
    """Fill NULL ``target_col`` slots from similar-condition means.

    ``df`` must be the complete per-key slot grid (one row per key×slot;
    gaps = NULL target).  ``ts_col`` is the integer slot index; windows
    are in slots; ``cycle`` is the slot count per diurnal cycle for the
    tier-4 climatology.

    Output: key cols + ts col + ``y`` (observed or filled, double),
    ``mds_flag`` (0 observed, 1-4 fill tier, 9 unfilled),
    ``n_used`` (observations behind the fill; 0 for observed rows).
    """
    keys = list(key_cols)
    covs = list(cov_cols)
    gaps = df.filter(F.col(target_col).isNull())
    obs = df.filter(F.col(target_col).isNotNull())

    def _tier(window: int, use_covs: list[str], tag: str) -> DataFrame:
        cand = _band_candidates(gaps, obs, keys, ts_col, window)
        pred: Column = F.lit(True)
        for c in use_covs:
            tol = float(tolerances[covs.index(c)])
            pred = pred & (F.abs(F.col(c) - F.col(f"_o_{c}")) <= tol)
        return (
            cand.filter(pred)
            .groupBy(*keys, F.col("_tg").alias(ts_col))
            .agg(
                F.avg(f"_o_{target_col}").alias(f"_f{tag}"),
                F.count(F.lit(1)).cast("long").alias(f"_n{tag}"),
            )
        )

    def _tier_hod(window: int, tag: str) -> DataFrame:
        cand = _band_candidates(gaps, obs, keys, ts_col, window)
        hod_diff = (
            F.col("_tg") % cycle - F.col("_to") % cycle + cycle
        ) % cycle
        return (
            cand.filter(hod_diff.isin(0, 1, cycle - 1))
            .groupBy(*keys, F.col("_tg").alias(ts_col))
            .agg(
                F.avg(f"_o_{target_col}").alias(f"_f{tag}"),
                F.count(F.lit(1)).cast("long").alias(f"_n{tag}"),
            )
        )

    t1 = _tier(window_1, covs, "1")
    t2 = _tier(window_2, covs, "2")
    t3 = _tier(window_1, covs[:1], "3")
    t4 = _tier_hod(window_2, "4")

    on = keys + [ts_col]
    out = (
        df.join(t1, on, "left")
        .join(t2, on, "left")
        .join(t3, on, "left")
        .join(t4, on, "left")
    )
    ok = [F.col(f"_n{t}") >= min_n for t in "1234"]
    flag = (
        F.when(F.col(target_col).isNotNull(), 0)
        .when(ok[0], 1)
        .when(ok[1], 2)
        .when(ok[2], 3)
        .when(ok[3], 4)
        .otherwise(9)
    )
    y = (
        F.when(flag == 0, F.col(target_col))
        .when(flag == 1, F.col("_f1"))
        .when(flag == 2, F.col("_f2"))
        .when(flag == 3, F.col("_f3"))
        .when(flag == 4, F.col("_f4"))
    )
    n_used = (
        F.when(flag == 0, F.lit(0))
        .when(flag == 1, F.col("_n1"))
        .when(flag == 2, F.col("_n2"))
        .when(flag == 3, F.col("_n3"))
        .when(flag == 4, F.col("_n4"))
        .otherwise(F.lit(0))
    )
    return out.select(
        *keys,
        F.col(ts_col),
        y.alias("y"),
        flag.cast("int").alias("mds_flag"),
        n_used.cast("long").alias("n_used"),
    )
