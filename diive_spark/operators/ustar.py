"""USTAR threshold DETECTION via the moving-point test (SURVEY §2.11;
reference scaffold ``UstarDetectionMPT``,
/root/reference/diive/pkgs/flux/ustar_detection.py:7-141).

The reference ships the data-assembly scaffold only (its calculation body
stops at a literal ``# TODO HIER WEITER``, ustar_detection.py:56) but the
docstring (ustar_detection.py:58-71) fully specifies the intended
algorithm — the classic moving-point test of Papale et al. (2006,
Biogeosciences 3:571, public literature):

  * nighttime data, divided into seasons,
  * each season into X air-temperature (TA) classes,
  * each TA class into Y ustar subclasses (quantile bins),
  * per subclass: mean NEE and mean ustar; the class threshold is the
    mean ustar of the FIRST subclass whose mean NEE reaches
    ``plateau_frac`` (99%) of the mean NEE of all higher-ustar
    subclasses, with the condition also met by the following subclass,
  * season threshold = max of its TA-class thresholds (docstring's
    "e.g. the max"); TA classes with |corr(TA, USTAR)| above a cutoff
    can be excluded (Papale's correlation screen).

Spark shape — fully declarative, NO Python in the loop:
``ntile`` windows assign TA classes per season and ustar subclasses per
(season, class) (ordered by (value, id) so ties break identically across
engines); one groupBy computes subclass means; the plateau scan is a
following-rows window average + lead(); thresholds are min/max
aggregates.  Everything shuffles on (season, class) keys — subclass
tables are tiny regardless of input scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ustar_mpt_thresholds(
    df: DataFrame,
    nee_col: str,
    ta_col: str,
    ustar_col: str,
    id_col: str,
    season_col: str | Column | None = None,
    n_ta_classes: int = 7,
    n_ustar_classes: int = 20,
    plateau_frac: float = 0.99,
    max_ta_ustar_corr: float | None = None,
) -> DataFrame:
    """Per-(season, TA class) ustar thresholds + the season max.

    Returns one row per (season, ta_class): ``threshold`` (the class
    MPT threshold, falling back to the class's highest subclass-mean
    ustar when no plateau is found), ``n_rows``, ``ta_ustar_corr``, and
    ``season_threshold`` (max over the season's included classes).
    """
    season = (
        F.lit(0) if season_col is None
        else (F.col(season_col) if isinstance(season_col, str) else season_col)
    )
    d = (
        df.select(
            season.alias("season"),
            F.col(nee_col).alias("nee"),
            F.col(ta_col).alias("ta"),
            F.col(ustar_col).alias("ustar"),
            F.col(id_col).alias("_id"),
        )
        .dropna()
    )
    # deterministic ntile: unique (value, id) order so engines agree on ties
    w_ta = Window.partitionBy("season").orderBy("ta", "_id")
    d = d.withColumn("ta_class", F.ntile(n_ta_classes).over(w_ta))
    w_us = Window.partitionBy("season", "ta_class").orderBy("ustar", "_id")
    d = d.withColumn("ustar_class", F.ntile(n_ustar_classes).over(w_us))

    # ONE scan: the subclass agg also carries the sufficient statistics
    # for the class-level TA~USTAR correlation (sums are associative), so
    # no second pass over the raw rows and no class-level join arm
    sub = d.groupBy("season", "ta_class", "ustar_class").agg(
        F.avg("nee").alias("nee_mean"),
        F.avg("ustar").alias("ustar_mean"),
        F.count("*").alias("n"),
        F.sum("ta").alias("s_x"),
        F.sum("ustar").alias("s_y"),
        F.sum(F.col("ta") * F.col("ustar")).alias("s_xy"),
        F.sum(F.col("ta") * F.col("ta")).alias("s_xx"),
        F.sum(F.col("ustar") * F.col("ustar")).alias("s_yy"),
    )

    w_next = (
        Window.partitionBy("season", "ta_class")
        .orderBy("ustar_class")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w_ord = Window.partitionBy("season", "ta_class").orderBy("ustar_class")
    scan = (
        sub.withColumn("nee_above", F.avg("nee_mean").over(w_next))
        .withColumn(
            "plateau",
            F.when(
                F.col("nee_above").isNotNull(),
                F.col("nee_mean") >= plateau_frac * F.col("nee_above"),
            ).otherwise(F.lit(True)),
        )
        .withColumn(
            "plateau2",
            F.col("plateau") & F.coalesce(F.lead("plateau").over(w_ord), F.lit(True)),
        )
    )
    n_t = F.sum("n")
    sx, sy = F.sum("s_x"), F.sum("s_y")
    sxy, sxx, syy = F.sum("s_xy"), F.sum("s_xx"), F.sum("s_yy")
    out = scan.groupBy("season", "ta_class").agg(
        F.coalesce(
            F.min(F.when(F.col("plateau2"), F.col("ustar_mean"))),
            F.max("ustar_mean"),
        ).alias("threshold"),
        n_t.alias("n_rows"),
        (
            (n_t * sxy - sx * sy)
            / F.sqrt((n_t * sxx - sx * sx) * (n_t * syy - sy * sy))
        ).alias("ta_ustar_corr"),
    )
    included = (
        F.lit(True)
        if max_ta_ustar_corr is None
        else F.abs(F.col("ta_ustar_corr")) <= max_ta_ustar_corr
    )
    out = out.withColumn("included", included.cast("int"))
    w_season = Window.partitionBy("season")
    return out.withColumn(
        "season_threshold",
        F.max(F.when(F.col("included") == 1, F.col("threshold"))).over(w_season),
    )
