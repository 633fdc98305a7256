"""Wind operators (SURVEY §2.11 WindRotation2D, §2.4 T13 / §2.9 C5
WindDirOffset).

Both are re-expressed as pure DataFrame plans:

* **Double rotation**: the reference computes two rotation angles from the
  *segment-mean* wind and applies them row-wise to the high-resolution
  samples (/root/reference/diive/pkgs/echires/windrotation.py:78-136).
  Spark shape: the means are analytic `avg(...) over (partitionBy key)`
  windows — the rotation is then a per-row expression over those window
  columns.  No join, no shuffle beyond the one window exchange, and the
  per-row math stays in whole-stage codegen.

* **Wind-direction offset search**: the reference correlates a per-group
  wind-direction histogram against a reference histogram over a grid of
  candidate offsets and picks the argmax
  (/root/reference/diive/pkgs/corrections/winddiroffset.py:102-141).
  Spark shape: crossJoin(group-histograms × offset grid) over a DENSE bin
  grid (missing bins count 0 so Pearson r is well-defined and
  engine-portable), `corr` per (group, offset), then `max_by`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def double_rotation(
    df: DataFrame,
    key_col: str,
    u_col: str = "u",
    v_col: str = "v",
    w_col: str = "w",
) -> DataFrame:
    """Add ``u_rot/v_rot/w_rot`` — double coordinate rotation so mean(v)
    and mean(w) become ~0 per segment (windrotation.py:78-136).

    angle_r1 = atan(v_mean / u_mean); after rotating the mean wind by r1,
    angle_r2 = atan(w_mean / u_temp).  Angles derive from *means*, applied
    sample-wise — exactly the reference's two-step.
    """
    wkey = Window.partitionBy(key_col)
    u_m = F.avg(u_col).over(wkey)
    v_m = F.avg(v_col).over(wkey)
    w_m = F.avg(w_col).over(wkey)
    a1 = F.atan(v_m / u_m)
    u_temp_m = u_m * F.cos(a1) + v_m * F.sin(a1)
    a2 = F.atan(w_m / u_temp_m)

    u, v, w = F.col(u_col), F.col(v_col), F.col(w_col)
    u_temp = u * F.cos(a1) + v * F.sin(a1)
    v_temp = -u * F.sin(a1) + v * F.cos(a1)
    return (
        df.withColumn("u_rot", u_temp * F.cos(a2) + w * F.sin(a2))
        .withColumn("v_rot", v_temp)
        .withColumn("w_rot", -u_temp * F.sin(a2) + w * F.cos(a2))
    )


def winddir_offset_search(
    df: DataFrame,
    group_col: str,
    wd_col: str,
    offsets: list[int],
    bin_deg: int = 10,
    round_r: int | None = None,
) -> DataFrame:
    """Per group: the offset (degrees) whose shifted wind-direction
    histogram best correlates with the all-data reference histogram
    (winddiroffset.py:102-141 re-shaped for Spark).

    Returns ``(group, best_offset, best_corr)``.  All candidate
    histograms are built in ONE aggregation over an exploded offset
    column (|offsets| copies of the input — the reference loops the same
    factor serially); the reference histogram is a broadcast join.
    """
    nbins = 360 // bin_deg
    wd = F.col(wd_col)

    # reference histogram over all data, dense bins
    ref_binned = df.select(
        F.floor(((wd % 360) + 360) % 360 / bin_deg).cast("int").alias("bin")
    )
    ref_hist = ref_binned.groupBy("bin").agg(F.count("*").alias("ref_n"))

    # candidate histograms: explode offsets, shift, bin
    cand = (
        df.select(F.col(group_col).alias("grp"), wd.alias("wd"))
        .withColumn("off", F.explode(F.array(*[F.lit(o) for o in offsets])))
        .select(
            "grp",
            "off",
            F.floor((((F.col("wd") + F.col("off")) % 360) + 360) % 360 / bin_deg)
            .cast("int")
            .alias("bin"),
        )
        .groupBy("grp", "off", "bin")
        .agg(F.count("*").alias("n"))
    )

    # dense grid so zero-count bins participate in the correlation
    grid = (
        cand.select("grp", "off")
        .distinct()
        .crossJoin(
            df.sparkSession.range(nbins).select(F.col("id").cast("int").alias("bin"))
        )
    )
    dense = (
        grid.join(cand, ["grp", "off", "bin"], "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
        .join(F.broadcast(ref_hist), "bin", "left")
        .withColumn("ref_n", F.coalesce("ref_n", F.lit(0)))
    )
    scored = dense.groupBy("grp", "off").agg(
        F.corr(F.col("n").cast("double"), F.col("ref_n").cast("double")).alias("r")
    )
    if round_r is not None:
        # pre-round before ranking so the argmax is engine-portable when
        # two offsets score within float noise of each other
        scored = scored.withColumn("r", F.round("r", round_r))
    # deterministic argmax: highest r, smallest offset on ties
    wbest = Window.partitionBy("grp").orderBy(F.col("r").desc(), F.col("off").asc())
    return (
        scored.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            "grp",
            F.col("off").alias("best_offset"),
            F.col("r").alias("best_corr"),
        )
    )
