"""Analytics operators (SURVEY §2.3/§2.4): histograms, quantile binning,
circular stats, frequency detection, lag-search covariance, similarity
range-join, scenario fan-out, combine-first merge.

All are pure DataFrame compositions — no Python UDFs. Where the reference
iterates per-row (uncertainty.py:244-291 iterrows, lag.py:189-231 per-shift
loop) the re-expression is a join/window, per the input_hint ban on per-row
Python.

Scale notes are on each function: the recurring patterns are
(1) broadcast tiny aggregate back onto the big side,
(2) bucketed range join instead of theta cross-join,
(3) window functions partitioned by the series key so Spark shuffles once
    per key layout and reuses it across chained ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def histogram_fixed_bins(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_bins: int = 20,
    ignore_fringe: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-key equal-width histogram (reference Histogram,
    /root/reference/diive/pkgs/analyses/histogram.py:14-125);
    ``ignore_fringe=(i, j)`` drops the first i and last j bins
    (histogram.py:110-115).

    Per-key (min, max) is a tiny aggregate — broadcast back onto the fact
    side, so the only wide exchange is the final (key, bin) count, which is
    map-side combinable."""
    bounds = df.groupBy(key_col).agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / n_bins
    binned = df.join(F.broadcast(bounds), key_col).withColumn(
        "bin",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
            F.least(
                F.floor((F.col(value_col) - F.col("_lo")) / width),
                F.lit(n_bins - 1),
            )
        ).cast("long"),
    )
    out = (
        binned.groupBy(key_col, "bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min("_lo") + F.col("bin") * F.min(width), 4).alias("bin_lo"),
        )
        .select(key_col, "bin", "bin_lo", "n")
    )
    if ignore_fringe:
        i, j = ignore_fringe
        out = out.filter((F.col("bin") >= i) & (F.col("bin") <= n_bins - 1 - j))
    return out


def circular_mean_deg(deg_col: str | Column) -> Column:
    """Circular (Kanda) mean of angles in degrees, result in [0, 360)
    (reference winddirection_agg_kanda, funcs.py:52-85):
    atan2(mean sin, mean cos), vectorized aggregate expression."""
    c = F.col(deg_col) if isinstance(deg_col, str) else deg_col
    rad = F.radians(c)
    mean_deg = F.degrees(F.atan2(F.avg(F.sin(rad)), F.avg(F.cos(rad))))
    return F.pmod(mean_deg + 360.0, F.lit(360.0))


def freq_detect(
    df: DataFrame, key_col: str, ts_col: str, order_cols: list[str] | None = None
) -> DataFrame:
    """Per-key dominant timestamp delta (reference DetectFrequency mode
    path, times.py:637-720: delta mode must hold >90% share).

    lag + two grouped aggs; every stage is keyed by ``key_col`` so one
    hash layout serves all three."""
    order_cols = order_cols or [ts_col]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    deltas = (
        df.withColumn("_e", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn("_d", (F.col("_e") - F.lag("_e").over(w)) / 1_000_000.0)
        .filter(F.col("_d").isNotNull())
        .withColumn("delta_s", F.floor("_d").cast("long"))
    )
    counts = deltas.groupBy(key_col, "delta_s").agg(
        F.count("*").cast("long").alias("n_mode")
    )
    totals = deltas.groupBy(key_col).agg(F.count("*").cast("long").alias("n_total"))
    wr = Window.partitionBy(key_col).orderBy(
        F.col("n_mode").desc(), F.col("delta_s").asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") == 1)
        .join(F.broadcast(totals), key_col)
        .withColumn("share", F.round(F.col("n_mode") / F.col("n_total"), 4))
        .withColumn("freq_ok", (F.col("n_mode") / F.col("n_total") >= 0.9).cast("int"))
        .select(key_col, "delta_s", "n_mode", "n_total", "share", "freq_ok")
    )


def freq_detect_reconciled(
    df: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """T6 full 3-way DetectFrequency reconcile (reference
    /root/reference/diive/core/times/times.py:637-801), per key:

    * ``full``  — the whole index is one constant delta and n >= 10
      (pd.infer_freq-over-fullset analog for second grids);
    * ``mode``  — most frequent delta holds > 90% of ALL rows (the
      reference divides by the row count INCLUDING the first NaN delta,
      times.py:793-797);
    * ``prog``  — progressively shrinking head/tail check: some
      ndr in [4, 1000] with n >= 2*ndr has the first ndr and last ndr
      rows regular with the same delta — equivalently the leading and
      trailing constant-delta runs both span >= 3 deltas and agree.

    Reconcile mirrors the reference's branch order exactly, including
    the quirk that three DISAGREEING detections yield freq = null
    (times.py:664-672 sets nothing when the set has > 1 element):
    all-agree -> 'max'; all-found-but-disagree -> 'ambiguous' (null
    freq); else full -> 'max', mode -> 'high', prog -> 'medium',
    nothing -> 'failed'.

    Plan shape: every window and aggregation is keyed by ``key_col`` —
    one hash exchange serves the lag, both rank directions and the final
    aggregate; the mode sub-aggregate is map-side combinable.
    """
    w = Window.partitionBy(key_col).orderBy("_e")
    wd = Window.partitionBy(key_col).orderBy(F.col("_e").desc())
    wk = Window.partitionBy(key_col)
    d = (
        df.select(key_col, F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_e"))
        .withColumn("delta", (F.col("_e") - F.lag("_e").over(w)) / F.lit(1_000_000.0))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("rnd", F.row_number().over(wd))
    )
    d = d.withColumn(
        "fd", F.max(F.when(F.col("rn") == 2, F.col("delta"))).over(wk)
    ).withColumn(
        "ld", F.max(F.when(F.col("rnd") == 1, F.col("delta"))).over(wk)
    )
    per_key = d.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n"),
        F.count_distinct("delta").alias("n_distinct"),
        F.max("fd").alias("first_delta"),
        F.max("ld").alias("last_delta"),
        F.min(
            F.when((F.col("rn") >= 2) & (F.col("delta") != F.col("fd")), F.col("rn"))
        ).alias("first_mismatch"),
        F.min(
            F.when((F.col("rnd") >= 1) & F.col("delta").isNotNull()
                   & (F.col("delta") != F.col("ld")), F.col("rnd"))
        ).alias("last_mismatch"),
    )
    mode_counts = (
        d.filter(F.col("delta").isNotNull())
        .groupBy(key_col, "delta")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wr = Window.partitionBy(key_col).orderBy(F.col("cnt").desc(), F.col("delta").asc())
    mode = (
        mode_counts.withColumn("_r", F.row_number().over(wr))
        .filter(F.col("_r") == 1)
        .select(key_col, F.col("delta").alias("mode_delta"), F.col("cnt").alias("mode_cnt"))
    )
    j = per_key.join(mode, key_col, "left")
    lead_len = F.coalesce(F.col("first_mismatch"), F.col("n") + 1) - 2
    trail_len = F.coalesce(F.col("last_mismatch"), F.col("n")) - 1
    freq_full = F.when(
        (F.col("n") >= 10) & (F.col("n_distinct") == 1), F.col("first_delta")
    )
    freq_mode = F.when(
        F.col("mode_cnt") / F.col("n") > 0.90, F.col("mode_delta")
    )
    freq_prog = F.when(
        (F.col("n") >= 8)
        & (F.col("first_delta") == F.col("last_delta"))
        & (lead_len >= 3)
        & (trail_len >= 3),
        F.col("first_delta"),
    )
    out = j.select(
        key_col,
        F.col("n"),
        freq_full.alias("freq_full_s"),
        freq_mode.alias("freq_mode_s"),
        freq_prog.alias("freq_prog_s"),
    )
    all3 = (
        F.col("freq_full_s").isNotNull()
        & F.col("freq_mode_s").isNotNull()
        & F.col("freq_prog_s").isNotNull()
    )
    agree = (F.col("freq_full_s") == F.col("freq_mode_s")) & (
        F.col("freq_mode_s") == F.col("freq_prog_s")
    )
    return out.withColumn(
        "freq_s",
        F.when(all3 & agree, F.col("freq_full_s"))
        .when(all3, F.lit(None))
        .when(F.col("freq_full_s").isNotNull(), F.col("freq_full_s"))
        .when(F.col("freq_mode_s").isNotNull(), F.col("freq_mode_s"))
        .when(F.col("freq_prog_s").isNotNull(), F.col("freq_prog_s")),
    ).withColumn(
        "confidence",
        F.when(all3 & agree, F.lit("max"))
        .when(all3, F.lit("ambiguous"))
        .when(F.col("freq_full_s").isNotNull(), F.lit("max"))
        .when(F.col("freq_mode_s").isNotNull(), F.lit("high"))
        .when(F.col("freq_prog_s").isNotNull(), F.lit("medium"))
        .otherwise(F.lit("failed")),
    )


def lag_search_max_cov(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_cols: list[str],
    max_shift: int = 5,
) -> DataFrame:
    """Per-key lag search (reference MaxCovariance, echires/lag.py:167-244):
    covariance between the series and its k-shifted copy for k=1..max_shift,
    flagging the |cov|-argmax shift.

    The reference loops shifts in Python per segment; here all shifts are
    window expressions over ONE sorted layout (single shuffle), and the
    per-(key, shift) covariances are one grouped agg after an unpivot."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    shifted = df.select(
        key_col,
        F.col(value_col).alias("_v"),
        *[F.lag(value_col, k).over(w).alias(f"_l{k}") for k in range(1, max_shift + 1)],
    )
    stacked = shifted.select(
        key_col,
        "_v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(k).alias("shift"), F.col(f"_l{k}").alias("_lv"))
                    for k in range(1, max_shift + 1)
                ]
            )
        ).alias("s"),
    ).select(key_col, "_v", "s.shift", "s._lv")
    cov = stacked.groupBy(key_col, "shift").agg(
        F.covar_samp("_v", "_lv").alias("_cov")
    )
    wb = Window.partitionBy(key_col).orderBy(
        F.abs(F.round("_cov", 6)).desc(), F.col("shift").asc()
    )
    return cov.withColumn(
        "is_best", (F.row_number().over(wb) == 1).cast("int")
    ).select(
        key_col,
        F.col("shift").cast("long").alias("shift"),
        F.round("_cov", 4).alias("cov"),
        "is_best",
    )


def similarity_window_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    ts_tol_s: int = 1800,
    value_tol: float = 5.0,
) -> DataFrame:
    """Similarity-window uncertainty (reference RandomUncertaintyPAS20
    method-1, flux/uncertainty.py:218-291): for every record, the std/count
    of records of the same key within ±ts_tol AND ±value_tol.

    The reference iterates rows in Python; re-expressed as a **bucketed
    range join**: bucket = floor(ts / tol); each left row joins right rows
    in its bucket ±1 (covers the full ±tol range), then the exact predicate
    filters. Join key (key, bucket) is equi — sort-merge/AQE handles it;
    candidate sets stay O(rows per 3 buckets), never O(n²)."""
    e = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1_000_000.0
    base = df.select(
        F.col(id_col), F.col(key_col), e.alias("_e"), F.col(value_col).alias("_v")
    ).withColumn("_b", F.floor(F.col("_e") / ts_tol_s).cast("long"))
    left = base.select(
        F.col(id_col),
        F.col(key_col),
        F.col("_e").alias("_ea"),
        F.col("_v").alias("_va"),
        F.explode(
            F.array(F.col("_b") - 1, F.col("_b"), F.col("_b") + 1)
        ).alias("_b"),
    )
    right = base.select(
        F.col(key_col), F.col("_b"), F.col("_e").alias("_eb"), F.col("_v").alias("_vb")
    )
    joined = left.join(right, [key_col, "_b"]).filter(
        (F.abs(F.col("_ea") - F.col("_eb")) <= ts_tol_s)
        & (F.abs(F.col("_va") - F.col("_vb")) <= value_tol)
    )
    return joined.groupBy(id_col, key_col).agg(
        F.count("*").cast("long").alias("n_similar"),
        F.round(F.stddev_samp("_vb"), 4).alias("sd_similar"),
        F.round(F.avg("_vb"), 4).alias("mean_similar"),
    )


def scenario_threshold_fanout(
    df: DataFrame,
    key_col: str,
    value_col: str,
    thresholds: list[float],
) -> DataFrame:
    """Constant-threshold scenario fan-out (reference
    UstarThresholdConstantScenarios, ustarthreshold.py:14-166: for each
    threshold u, mask value where below u, aggregate what survives).
    The threshold list is a literal array — explode is per-row, no join."""
    t = F.explode(F.array(*[F.lit(float(x)) for x in thresholds])).alias("threshold")
    masked = df.select(F.col(key_col), F.col(value_col).alias("_v"), t).withColumn(
        "_kept", F.when(F.col("_v") >= F.col("threshold"), F.col("_v"))
    ).withColumn(
        # surviving values as exact e4 integers: the scenario mean is then
        # an order-free integer sum + one division (round(avg(double), 4)
        # drifted at .xxxx5 boundaries in the sf0.1 sweep)
        "_k4",
        F.floor(F.col("_kept") * 10_000 + F.lit(0.31830988618367)).cast(
            "long"
        ),
    )
    return masked.groupBy(key_col, "threshold").agg(
        F.count("_kept").cast("long").alias("n_kept"),
        (
            F.floor(
                F.sum("_k4").cast("double") / F.count("_kept")
                + F.lit(0.31830988618367)
            )
            / 10_000.0
        ).alias("mean_kept"),
    )


def binned_quadratic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    n_bins: int = 12,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Binned quadratic fit (SURVEY §2.11 ``BinFitterCP``/``QuadraticFit``,
    /root/reference/diive/core/dfun/fits.py:74-260): quantile-bin x, take
    per-bin medians of x and y, then fit ``y = c0 + c1*x + c2*x^2``
    through the bin medians.

    The reference calls ``np.polyfit`` on the binned medians; here the
    degree-2 least-squares solution is CLOSED FORM — power sums + Cramer's
    rule — so the whole fit is two aggregations (bin medians, then per-group
    sums): pure Spark SQL, no driver math, one small shuffle, and an exact
    DuckDB oracle twin.
    """
    order = [x_col] + (order_cols or [])
    wb = Window.partitionBy(group_col).orderBy(*order)
    binned = df.withColumn("__bin", F.ntile(n_bins).over(wb))
    med = binned.groupBy(group_col, "__bin").agg(
        F.expr(f"percentile({x_col}, 0.5)").alias("mx"),
        F.expr(f"percentile({y_col}, 0.5)").alias("my"),
    )
    mx, my = F.col("mx"), F.col("my")
    sums = med.groupBy(group_col).agg(
        F.count("*").cast("double").alias("s0"),
        F.sum(mx).alias("s1"),
        F.sum(mx * mx).alias("s2"),
        F.sum(mx * mx * mx).alias("s3"),
        F.sum(mx * mx * mx * mx).alias("s4"),
        F.sum(my).alias("t0"),
        F.sum(my * mx).alias("t1"),
        F.sum(my * mx * mx).alias("t2"),
    )
    s0, s1, s2, s3, s4 = (F.col(c) for c in ("s0", "s1", "s2", "s3", "s4"))
    t0, t1, t2 = (F.col(c) for c in ("t0", "t1", "t2"))
    # Cramer's rule for [[s0,s1,s2],[s1,s2,s3],[s2,s3,s4]] @ [c0,c1,c2] = [t0,t1,t2]
    det = (
        s0 * (s2 * s4 - s3 * s3)
        - s1 * (s1 * s4 - s3 * s2)
        + s2 * (s1 * s3 - s2 * s2)
    )
    d0 = (
        t0 * (s2 * s4 - s3 * s3)
        - s1 * (t1 * s4 - s3 * t2)
        + s2 * (t1 * s3 - s2 * t2)
    )
    d1 = (
        s0 * (t1 * s4 - t2 * s3)
        - t0 * (s1 * s4 - s3 * s2)
        + s2 * (s1 * t2 - s2 * t1)
    )
    d2 = (
        s0 * (s2 * t2 - s3 * t1)
        - s1 * (s1 * t2 - s2 * t1)
        + t0 * (s1 * s3 - s2 * s2)
    )
    return sums.select(
        group_col,
        (d0 / det).alias("c0"),
        (d1 / det).alias("c1"),
        (d2 / det).alias("c2"),
    )


def histogram_uniques(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ignore_fringe: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-key histogram with each unique value as a bin edge (reference
    Histogram ``method='uniques'``, histogram.py:56-83 + numpy edge
    semantics): k uniques form k-1 bins; the LAST bin is right-inclusive,
    so it counts the two largest uniques together.  ``ignore_fringe=(i,
    j)`` drops the first i and last j result bins
    (histogram.py:110-115).

    Plan: one (key, value) count aggregate (map-side combinable), one
    keyed window for the rank/lead — no data explosion, no Python."""
    cnt = df.filter(F.col(value_col).isNotNull()).groupBy(key_col, value_col).agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.partitionBy(key_col).orderBy(value_col)
    wk = Window.partitionBy(key_col)
    d = (
        cnt.withColumn("rn", F.row_number().over(w))
        .withColumn("k", F.count("*").over(wk))
        .withColumn("next_cnt", F.lead("cnt").over(w))
    )
    out = d.filter(F.col("rn") <= F.col("k") - 1).select(
        key_col,
        F.col(value_col).alias("bin_start_incl"),
        (
            F.col("cnt")
            + F.when(F.col("rn") == F.col("k") - 1, F.col("next_cnt")).otherwise(F.lit(0))
        ).cast("long").alias("counts"),
        "rn",
        "k",
    )
    if ignore_fringe:
        i, j = ignore_fringe
        out = out.filter(
            (F.col("rn") > i) & (F.col("rn") <= F.col("k") - 1 - j)
        )
    return out.drop("rn", "k")


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_tiles: int,
    range_col: str | None = None,
    n_buckets: int = 32,
    out_col: str = "ntile",
) -> DataFrame:
    """Exact global ``ntile(n)`` without the single-task unpartitioned
    window (SortingBinsMethod's first-level bin, reference
    /root/reference/diive/pkgs/analyses/quantilexyaggz.py sorting path).

    An unpartitioned ``Window.orderBy`` funnels every row through ONE task
    — fine at sf0.01, fatal at 100 TB.  This reproduces the exact ntile
    semantics distributed, in two phases:

    1. Range-bucket rows on ``range_col`` (default: first order column)
       at boundaries from ``approxQuantile`` (a no-shuffle aggregate;
       driver holds ≤ ``n_buckets`` doubles).  Equal boundary values all
       land in one bucket, so bucket id is MONOTONE in the composite sort
       order — a per-bucket local rank plus the bucket's global offset is
       an exact global rank.
    2. Per-bucket ``row_number`` (parallel window, one hash exchange on
       the bucket id) + cumulative bucket offsets computed IN-PLAN from a
       ≤ ``n_buckets``-row aggregate and broadcast-joined back → global
       row number → closed-form ntile bucket (first ``k % n`` tiles get
       one extra row, matching Spark/DuckDB/pandas ``qcut``-free ntile).

    The only eager action is ``approxQuantile`` (one column-pruned scan);
    the bucket counts, offsets, and the total row count all stay inside
    the single main job, so the table is scanned twice total — not three
    times as a driver-side offsets collect would cost.
    """
    range_col = range_col or order_cols[0]
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.approxQuantile(range_col, qs, 0.001)))
    bucket = F.lit(0)
    for i, b in enumerate(bounds):
        bucket = F.when(F.col(range_col) > F.lit(b), F.lit(i + 1)).otherwise(bucket)
    b = df.withColumn("_gb", bucket)
    # offsets table: n_buckets tiny rows; the unpartitioned windows are a
    # single task over <=n_buckets rows regardless of table size
    cnt = b.groupBy("_gb").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_gb").rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = cnt.select(
        "_gb",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_n").over(w_tot).alias("_total"),
    )
    b = b.join(F.broadcast(off), "_gb")
    w = Window.partitionBy("_gb").orderBy(*order_cols)
    rn = (F.row_number().over(w) + F.col("_off")).cast("long")
    return (
        b.withColumn(out_col, _tile_of_rank(rn, "_total", n_tiles))
        .drop("_gb", "_off", "_total")
    )


def _tile_of_rank(rn, total_col: str, n_tiles: int):
    """Closed-form ntile bucket of an exact 1-based global rank: first
    ``total % n`` tiles get one extra row (Spark/DuckDB ntile rule)."""
    base = F.floor(F.col(total_col) / n_tiles)
    rem = F.col(total_col) % n_tiles
    threshold = rem * (base + 1)
    safe_base = F.greatest(base, F.lit(1))  # base==0 (k<n) → one row per tile
    tile = F.when(
        rn <= threshold,
        F.floor((rn - 1) / (base + 1)) + 1,
    ).otherwise(rem + F.floor((rn - 1 - threshold) / safe_base) + 1)
    return tile.cast("int")


def global_ntile_multi(
    df: DataFrame,
    specs: list[tuple[list[str], int, str]],
    n_buckets: int = 32,
) -> DataFrame:
    """Several exact global ntiles over the SAME table in one fused plan
    (VERDICT r4 #6 — ``qxy_binagg``'s x- and y-deciles each paid their own
    sampled-range pass and, worse, the y-pass's offsets aggregate re-ran
    the x window's sort exchange because it counted over the x-binned
    lineage).

    ``specs`` = [(order_cols, n_tiles, out_col), ...].  Identical per-tile
    semantics to :func:`global_ntile` (pinned in tests), fused three ways:

    1. ONE ``approxQuantile`` action samples every range column together
       (one column-pruned scan instead of one per spec);
    2. every spec's bucket-offsets aggregate runs over the raw bucketed
       scan — never over another spec's windowed output — so no window is
       ever re-executed to count rows;
    3. the per-spec rank windows chain inside one job: scan → broadcast
       offset joins → exchange(x)+sort → exchange(y)+sort → downstream.
    """
    range_cols = [spec[0][0] for spec in specs]
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # boundaries only affect LOAD BALANCE (the offsets make ranks exact),
    # so a 2% pre-sample feeds the quantile summaries: same scan, ~50x
    # fewer QuantileSummaries inserts; deterministic given the seed and
    # file layout, and collapses to at-most-n_buckets driver doubles at
    # any table size
    all_bounds = df.sample(0.02, seed=7).stat.approxQuantile(
        range_cols, qs, 0.01
    )
    b = df
    for (order_cols, _, out_col), bounds in zip(specs, all_bounds):
        bucket = F.lit(0)
        for i, bd in enumerate(sorted(set(bounds))):
            bucket = F.when(
                F.col(order_cols[0]) > F.lit(bd), F.lit(i + 1)
            ).otherwise(bucket)
        b = b.withColumn(f"_gb_{out_col}", bucket)
    base_cols = df.columns
    # ONE joint counts aggregate feeds every spec's offsets: the grid is
    # at most n_buckets^len(specs) rows (32^2 = 1024 here) regardless of
    # table size, so each spec's margin is a tiny rollup of the same scan
    # instead of its own pass over the data
    gb_cols = [f"_gb_{s[2]}" for s in specs]
    joint = b.groupBy(*gb_cols).agg(F.count("*").alias("_n"))
    for order_cols, _, out_col in specs:
        gb = f"_gb_{out_col}"
        cnt = joint.groupBy(gb).agg(F.sum("_n").alias("_n"))
        w_off = Window.orderBy(gb).rowsBetween(
            Window.unboundedPreceding, -1
        )
        w_tot = Window.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off = cnt.select(
            gb,
            F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias(
                f"_off_{out_col}"
            ),
            F.sum("_n").over(w_tot).cast("long").alias(f"_tot_{out_col}"),
        )
        b = b.join(F.broadcast(off), gb)
    for order_cols, n_tiles, out_col in specs:
        gb = f"_gb_{out_col}"
        w = Window.partitionBy(gb).orderBy(*order_cols)
        rn = (F.row_number().over(w) + F.col(f"_off_{out_col}")).cast(
            "long"
        )
        b = b.withColumn(
            out_col, _tile_of_rank(rn, f"_tot_{out_col}", n_tiles)
        )
    return b.select(*base_cols, *[s[2] for s in specs])


def combine_first(
    primary: DataFrame,
    secondary: DataFrame,
    on: list[str],
    value_col: str,
    out_col: str = "v",
) -> DataFrame:
    """First-non-null-wins merge of two sources (reference
    ``combine_first`` in MultiDataFileReader, filereader.py:271-272):
    full-outer join on the grid keys + coalesce, primary wins."""
    p = primary.select(*on, F.col(value_col).alias("_vp"))
    s = secondary.select(*on, F.col(value_col).alias("_vs"))
    return (
        p.join(s, on, "full_outer")
        .withColumn(out_col, F.coalesce("_vp", "_vs"))
        .withColumn(
            "src",
            F.when(F.col("_vp").isNotNull(), F.lit("primary"))
            .when(F.col("_vs").isNotNull(), F.lit("secondary"))
            .otherwise(F.lit("none")),
        )
        .drop("_vp", "_vs")
    )
