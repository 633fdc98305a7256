"""Round-4h query registry: multiple-testing control, product-analytics
rollups, session path mining, and graph structure — Benjamini-Hochberg
FDR over the per-user runs-test family, DAU/WAU stickiness, top event
trigram paths, directed-edge reciprocity, fixed-round BFS depths from a
deterministic source, and per-language character entropy.

Oracle conventions as everywhere in this repo: identical column names,
every DuckDB integer SUM wrapped in ``CAST(... AS BIGINT)``, derived
doubles floor-scaled with the house 1/pi offset.  The one transcendental
beyond the established ln/exp/sqrt set — the standard normal CDF — is
computed from the SAME Abramowitz-Stegun 7.1.26 polynomial literal on
both engines (no erf dependency).

Reference parity notes: the reference's flag ladders emit per-series
test statistics but never control the family-wise error across
hundreds of sensors; bh_fdr_runs adds the standard FDR step-up
(Benjamini & Hochberg 1995) the multi-series deployment needs.  The
rest are the crawl/event-warehouse rollups (engagement stickiness,
path mining, link symmetry, hop distance) with no reference
counterpart — public literature cited per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from diive_spark.queries_stats2 import _OFF, _documents
from diive_spark.queries_stats3 import q_runs_test

# ---------------------------------------------------------------------------
# bh_fdr_runs — Benjamini-Hochberg step-up over the runs-test family
# ---------------------------------------------------------------------------
# Two-sided p-values from the per-user Wald-Wolfowitz z (the SCALED
# z_e4 output of q_runs_test is the exact cross-engine contract, so
# both engines start from IDENTICAL doubles), Phi via the Abramowitz-
# Stegun 7.1.26 polynomial (|eps| < 7.5e-8 — far inside the e6
# scaling); BH at q = 0.10: reject ranks 1..k where k = max{i : p_(i)
# <= i q / m} (Benjamini & Hochberg JRSS-B 1995).  The family is ONE
# ROW PER USER (not per observation), so the family-wide rank window
# is bounded by the key cardinality — the same justified-global-window
# class as survival_km; the step-up "max k" is a running max over the
# reversed rank order, one more bounded window.

_BH_Q = 0.10
# A&S 7.1.26 constants — embedded as the same literals in the SQL twin
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_P = 0.2316419
_INV_SQRT_2PI = 0.3989422804014327


def _phi_upper(z: Column) -> Column:
    """Upper-tail P(Z > z) for z >= 0 via A&S 7.1.26 (same op tree as
    the SQL twin)."""
    t = 1.0 / (1.0 + _AS_P * z)
    poly = (
        _AS_B[0] * t
        + _AS_B[1] * t * t
        + _AS_B[2] * t * t * t
        + _AS_B[3] * t * t * t * t
        + _AS_B[4] * t * t * t * t * t
    )
    return _INV_SQRT_2PI * F.exp(-z * z / 2.0) * poly


def q_bh_fdr_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = q_runs_test(spark, sf_dir).select(
        "user_id", (F.col("z_e4").cast("double") / 1e4).alias("z")
    )
    p = base.withColumn("p", 2.0 * _phi_upper(F.abs(F.col("z"))))
    m = Window.partitionBy()
    wr = Window.orderBy(F.asc("p"), F.asc("user_id"))
    ranked = (
        p.withColumn("m", F.count(F.lit(1)).over(m))
        .withColumn("rank", F.row_number().over(wr))
        .withColumn(
            "passes", (F.col("p") <= F.col("rank") * _BH_Q / F.col("m")).cast("long")
        )
    )
    # step-up: rejected iff rank <= max rank that passes
    wk = Window.orderBy(F.desc("rank")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = ranked.withColumn(
        "k", F.max(F.when(F.col("passes") == 1, F.col("rank"))).over(wk)
    ).withColumn("rejected", (F.col("k").isNotNull()).cast("long"))
    return out.select(
        "user_id",
        F.col("rank").cast("long").alias("rank"),
        F.floor(F.col("p") * 1_000_000 + F.lit(_OFF)).cast("long").alias("p_e6"),
        "rejected",
    ).orderBy("rank")


def _sql_bh(runs_sql: str) -> str:
    b = _AS_B
    phi = (
        f"{_INV_SQRT_2PI} * exp(-(az * az) / 2.0)"
        f" * ({b[0]!r} * tt + {b[1]!r} * tt * tt + {b[2]!r} * tt * tt * tt"
        f" + {b[3]!r} * tt * tt * tt * tt"
        f" + {b[4]!r} * tt * tt * tt * tt * tt)"
    )
    return f"""
WITH runs_out AS (
{runs_sql.replace("ORDER BY user_id", "")}
), z AS (
  SELECT user_id, CAST(z_e4 AS DOUBLE) / 1e4 AS zz FROM runs_out
), pv AS (
  SELECT user_id,
         2.0 * {phi} AS p
  FROM (
    SELECT user_id, abs(zz) AS az,
           1.0 / (1.0 + {_AS_P!r} * abs(zz)) AS tt
    FROM z
  )
), ranked AS (
  SELECT user_id, p,
         count(*) OVER () AS m,
         row_number() OVER (ORDER BY p, user_id) AS rank
  FROM pv
), marked AS (
  SELECT *,
         CASE WHEN p <= rank * {_BH_Q} / m THEN 1 ELSE 0 END AS passes
  FROM ranked
), stepped AS (
  SELECT *,
         max(CASE WHEN passes = 1 THEN rank END)
           OVER (ORDER BY rank DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k
  FROM marked
)
SELECT user_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(p * 1000000 + {_OFF}) AS BIGINT) AS p_e6,
       CAST(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM stepped
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# stickiness_dau_wau — DAU / trailing-7-day WAU engagement ratio
# ---------------------------------------------------------------------------
# The product-analytics stickiness metric: DAU(d) / WAU(d) with
# WAU(d) = |distinct users active in [d-6, d]|.  The user-day DISTINCT
# table is the materialization boundary (combinable distinct); WAU is a
# bounded range join of that table against the tiny day grid (7-day
# band), then one count-distinct per day — never a window over raw
# events.  All integers; stickiness is one division.


def q_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ud = ev.select(
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
        "user_id",
    ).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    days = ud.select("day").distinct()
    wau = (
        ud.join(
            F.broadcast(days.withColumnRenamed("day", "d")),
            (F.col("d") - F.col("day") >= 0) & (F.col("d") - F.col("day") <= 6),
        )
        .groupBy("d")
        .agg(F.count_distinct("user_id").alias("wau"))
        .withColumnRenamed("d", "day")
    )
    out = dau.join(wau, "day")
    stick = F.col("dau").cast("double") / F.col("wau").cast("double")
    return out.select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        F.floor(stick * 10_000 + F.lit(_OFF)).cast("long").alias("stickiness_e4"),
    ).orderBy("day")


SQL_STICKINESS = f"""
WITH ud AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
  FROM events
), dau AS (
  SELECT day, count(*) AS dau FROM ud GROUP BY 1
), days AS (
  SELECT DISTINCT day AS d FROM ud
), wau AS (
  SELECT d AS day, count(DISTINCT user_id) AS wau
  FROM ud JOIN days ON days.d - ud.day BETWEEN 0 AND 6
  GROUP BY 1
)
SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
       CAST(floor(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE)
                  * 10000 + {_OFF}) AS BIGINT) AS stickiness_e4
FROM dau JOIN wau ON wau.day = dau.day
ORDER BY dau.day
"""


# ---------------------------------------------------------------------------
# session_paths — top event-type trigram paths per user-day session
# ---------------------------------------------------------------------------
# Path mining over (user, day) sessions: the 10 most frequent ordered
# event-type trigrams with their corpus share.  Two lags on ONE
# per-session sort exchange (ts, event_id total order — deterministic
# under timestamp ties); exact integer counts; top-10 by (count desc,
# path asc) — the global rank window runs over the bounded trigram-type
# table (<= |types|^3 rows), never the event table.


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = ev.select(
        "user_id",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts_us", "event_id")
    tri = (
        s.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
    )
    cnt = tri.groupBy("path").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("total"))
    wr = Window.orderBy(F.desc("c"), F.asc("path"))
    top = (
        cnt.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 10)
        .crossJoin(F.broadcast(tot))
    )
    share = F.col("c").cast("double") / F.col("total").cast("double")
    return top.select(
        F.col("rank").cast("long").alias("rank"),
        "path",
        F.col("c").cast("long").alias("c"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias("share_e6"),
    ).orderBy("rank")


SQL_SESSION_PATHS = f"""
WITH s AS (
  SELECT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         epoch_us(ts) AS ts_us, event_id, event_type
  FROM events
), tri AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path
  FROM (
    SELECT event_type,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
    FROM s
    WINDOW w AS (PARTITION BY user_id, day ORDER BY ts_us, event_id)
  ) WHERE e3 IS NOT NULL
), cnt AS (
  SELECT path, count(*) AS c FROM tri GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt
), top AS (
  SELECT path, c, row_number() OVER (ORDER BY c DESC, path) AS rank
  FROM cnt
)
SELECT CAST(rank AS BIGINT) AS rank, path, CAST(c AS BIGINT) AS c,
       CAST(floor(CAST(c AS DOUBLE) / CAST(total AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS share_e6
FROM top CROSS JOIN tot
WHERE rank <= 10
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# graph_reciprocity — directed-edge reciprocity of the crawl graph
# ---------------------------------------------------------------------------
# r = |{(u,v) in E : (v,u) in E}| / |E| over the DISTINCT directed
# edge set (Wasserman & Faust §13; Garlaschelli & Loffredo PRL 2004) —
# the symmetry diagnostic for the crawl-order transition graph.  One
# distinct, one self-join on the reversed key, exact integers.


def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "lang", "source")
    w = Window.partitionBy("lang").orderBy("doc_id")
    e = (
        d.withColumn("_nxt", F.lead("source").over(w))
        .filter(F.col("_nxt").isNotNull() & (F.col("source") != F.col("_nxt")))
        .select(F.col("source").alias("src"), F.col("_nxt").alias("dst"))
        .distinct()
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi").agg(
        F.count(F.lit(1)).alias("n_recip")
    )
    tot = e.agg(F.count(F.lit(1)).alias("n_edges"))
    out = tot.crossJoin(recip)
    r = F.col("n_recip").cast("double") / F.col("n_edges").cast("double")
    return out.select(
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_recip").cast("long").alias("n_recip"),
        F.floor(r * 1_000_000 + F.lit(_OFF)).cast("long").alias("reciprocity_e6"),
    )


SQL_RECIPROCITY = f"""
WITH e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT source AS src,
           lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS dst
    FROM documents QUALIFY dst IS NOT NULL
  ) WHERE src <> dst
), recip AS (
  SELECT count(*) AS n_recip
  FROM e WHERE EXISTS (SELECT 1 FROM e r WHERE r.src = e.dst AND r.dst = e.src)
), tot AS (
  SELECT count(*) AS n_edges FROM e
)
SELECT CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_recip AS BIGINT) AS n_recip,
       CAST(floor(CAST(n_recip AS DOUBLE) / CAST(n_edges AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS reciprocity_e6
FROM tot CROSS JOIN recip
"""


# ---------------------------------------------------------------------------
# bfs_depths — fixed-round BFS hop distances from a deterministic source
# ---------------------------------------------------------------------------
# Single-source shortest hop distances on the undirected domain graph
# from the deterministic source (max degree, min name tie-break) —
# 6 synchronous label-relaxation rounds (d'(v) = min(d(v),
# min_{u~v} d(u)+1)), the same fixed-iteration contract as kcore_2 /
# label_propagation, localCheckpoint per round.  A pytest pins 6
# rounds == true BFS at test scale.  Per round: one hash join + one
# combinable min-agg on the edge set.


_BFS_ROUNDS = 6


def q_bfs_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "lang", "source")
    w = Window.partitionBy("lang").orderBy("doc_id")
    e0 = (
        d.withColumn("_nxt", F.lead("source").over(w))
        .filter(F.col("_nxt").isNotNull() & (F.col("source") != F.col("_nxt")))
        .select(
            F.least("source", "_nxt").alias("a"),
            F.greatest("source", "_nxt").alias("b"),
        )
        .distinct()
    )
    # both directions for relaxation
    e = e0.unionAll(
        e0.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    src = (
        deg.orderBy(F.desc("deg"), F.asc("a")).limit(1).select(F.col("a").alias("n"))
    )
    depth = src.withColumn("depth", F.lit(0).cast("long")).localCheckpoint()
    for _ in range(_BFS_ROUNDS):
        relaxed = (
            e.join(depth, e["a"] == depth["n"])
            .select(F.col("b").alias("n"), (F.col("depth") + 1).alias("depth"))
        )
        depth = (
            depth.unionAll(relaxed)
            .groupBy("n")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint()
        )
    return depth.select("n", F.col("depth").cast("long").alias("depth")).orderBy(
        "n"
    )


def _sql_bfs() -> str:
    parts = [
        """
WITH e0 AS MATERIALIZED (
  SELECT DISTINCT least(sa, sb) AS a, greatest(sa, sb) AS b
  FROM (
    SELECT source AS sa,
           lead(source) OVER (PARTITION BY lang ORDER BY doc_id) AS sb
    FROM documents QUALIFY sb IS NOT NULL
  ) WHERE sa <> sb
), e AS MATERIALIZED (
  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0
), src AS (
  SELECT a AS n FROM (
    SELECT a, count(*) AS deg FROM e GROUP BY 1
  ) ORDER BY deg DESC, a LIMIT 1
), d_0 AS MATERIALIZED (
  SELECT n, CAST(0 AS BIGINT) AS depth FROM src
)"""
    ]
    for r in range(_BFS_ROUNDS):
        parts.append(
            f""", d_{r + 1} AS MATERIALIZED (
  SELECT n, min(depth) AS depth FROM (
    SELECT n, depth FROM d_{r}
    UNION ALL
    SELECT e.b AS n, d_{r}.depth + 1 AS depth
    FROM e JOIN d_{r} ON d_{r}.n = e.a
  ) GROUP BY n
)"""
        )
    parts.append(
        f"""
SELECT n, CAST(depth AS BIGINT) AS depth FROM d_{_BFS_ROUNDS} ORDER BY n
"""
    )
    return "".join(parts)


# ---------------------------------------------------------------------------
# char_entropy_lang — character-distribution entropy per language
# ---------------------------------------------------------------------------
# Shannon entropy of the character frequency mix per language (plus the
# printable-distinct count) — the cheap orthographic fingerprint next
# to the n-gram langid profile.  H = ln N - sum(c ln c)/N over exact
# integer character counts; <= |alphabet| ln terms per language.


def q_char_entropy_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = _documents(spark, sf_dir).select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(r"[\s\S]"), F.lit(0))
        ).alias("ch"),
    )
    cnt = ch.groupBy("lang", "ch").agg(F.count(F.lit(1)).alias("c"))
    agg = cnt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_chars_distinct"),
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias(
            "clogc"
        ),
    )
    h = F.log(F.col("n").cast("double")) - F.col("clogc") / F.col("n").cast(
        "double"
    )
    return agg.select(
        "lang",
        F.col("n_chars_distinct").cast("long").alias("n_chars_distinct"),
        F.col("n").cast("long").alias("n"),
        F.floor(h * 10_000 + F.lit(0.5)).cast("long").alias("entropy_e4"),
    ).orderBy("lang")


SQL_CHAR_ENTROPY = r"""
WITH ch AS (
  SELECT lang, unnest(regexp_extract_all(text, '[\s\S]')) AS ch
  FROM documents
), cnt AS (
  SELECT lang, ch, count(*) AS c FROM ch GROUP BY 1, 2
), agg AS (
  SELECT lang, count(*) AS n_chars_distinct,
         CAST(sum(c) AS BIGINT) AS n,
         sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clogc
  FROM cnt GROUP BY 1
)
SELECT lang, CAST(n_chars_distinct AS BIGINT) AS n_chars_distinct, n,
       CAST(floor((ln(CAST(n AS DOUBLE)) - clogc / CAST(n AS DOUBLE))
                  * 10000 + 0.5) AS BIGINT) AS entropy_e4
FROM agg
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# energy_distance — exact squared energy distance between language mixes
# ---------------------------------------------------------------------------
# ED^2(P,Q) = 2 E|X-Y| - E|X-X'| - E|Y-Y'| (Szekely & Rizzo 2004) over
# doc lengths.  Kept EXACT on the same union-support-grid scaffold as
# wasserstein_doclen: with per-lang cumulative counts/sums at support
# point v, sum_x |x - v| = v*(2*cumcnt - n) - 2*cumsum + totsum — a
# BIGINT; the cross term folds c_other(v) * that.  Every pairwise
# expectation is an exact integer divided once at the end.  Two
# combinable groupBys + one per-lang cumsum window on the value-domain
# grid + the |langs|^2 pair join on the support point.


def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("lang", "n_chars")
    cnt = d.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    support = cnt.select("n_chars").distinct()
    langs = cnt.select("lang").distinct()
    grid = langs.crossJoin(support)
    w = Window.partitionBy("lang").orderBy("n_chars")
    cum = (
        grid.join(cnt, ["lang", "n_chars"], "left")
        .fillna(0, subset=["c"])
        .withColumn(
            "cumc", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn(
            "cums",
            F.sum(F.col("c") * F.col("n_chars")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("n", F.sum("c").over(Window.partitionBy("lang")))
        .withColumn(
            "s", F.sum(F.col("c") * F.col("n_chars")).over(Window.partitionBy("lang"))
        )
    )
    # sum_x |x - v| for this lang at support point v (exact BIGINT)
    absdist = (
        F.col("n_chars") * (2 * F.col("cumc") - F.col("n"))
        - 2 * F.col("cums")
        + F.col("s")
    )
    base = cum.select(
        "lang", "n_chars", F.col("c").alias("cv"), absdist.alias("ad"),
        F.col("n").alias("nn"),
    )
    a = base.select(
        F.col("lang").alias("la"),
        "n_chars",
        F.col("cv").alias("c_a"),
        F.col("ad").alias("ad_a"),
        F.col("nn").alias("n_a"),
    )
    b = base.select(
        F.col("lang").alias("lb"),
        "n_chars",
        F.col("cv").alias("c_b"),
        F.col("ad").alias("ad_b"),
        F.col("nn").alias("n_b"),
    )
    j = a.join(b, "n_chars").filter(F.col("la") < F.col("lb"))
    agg = j.groupBy("la", "lb").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(F.col("c_b") * F.col("ad_a")).alias("sxy"),
        F.sum(F.col("c_a") * F.col("ad_a")).alias("sxx"),
        F.sum(F.col("c_b") * F.col("ad_b")).alias("syy"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ed2 = (
        2.0 * F.col("sxy").cast("double") / (na * nb)
        - F.col("sxx").cast("double") / (na * na)
        - F.col("syy").cast("double") / (nb * nb)
    )
    return agg.select(
        "la",
        "lb",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.floor(ed2 * 10_000 + F.lit(_OFF)).cast("long").alias("ed2_e4"),
    ).orderBy("la", "lb")


SQL_ENERGY = f"""
WITH cnt AS (
  SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
), support AS (
  SELECT DISTINCT n_chars FROM cnt
), langs AS (
  SELECT DISTINCT lang FROM cnt
), cum AS (
  SELECT g.lang, g.n_chars, COALESCE(cnt.c, 0) AS c,
         CAST(sum(COALESCE(cnt.c, 0)) OVER pw AS BIGINT) AS cumc,
         CAST(sum(COALESCE(cnt.c, 0) * g.n_chars) OVER pw AS BIGINT) AS cums,
         CAST(sum(COALESCE(cnt.c, 0)) OVER (PARTITION BY g.lang) AS BIGINT) AS n,
         CAST(sum(COALESCE(cnt.c, 0) * g.n_chars)
              OVER (PARTITION BY g.lang) AS BIGINT) AS s
  FROM (SELECT lang, n_chars FROM langs CROSS JOIN support) g
  LEFT JOIN cnt ON cnt.lang = g.lang AND cnt.n_chars = g.n_chars
  WINDOW pw AS (PARTITION BY g.lang ORDER BY g.n_chars
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), base AS (
  SELECT lang, n_chars, c AS cv,
         n_chars * (2 * cumc - n) - 2 * cums + s AS ad, n AS nn
  FROM cum
), j AS (
  SELECT a.lang AS la, b.lang AS lb,
         a.cv AS c_a, b.cv AS c_b, a.ad AS ad_a, b.ad AS ad_b,
         a.nn AS n_a, b.nn AS n_b
  FROM base a JOIN base b ON a.n_chars = b.n_chars AND a.lang < b.lang
), agg AS (
  SELECT la, lb, max(n_a) AS n_a, max(n_b) AS n_b,
         CAST(sum(c_b * ad_a) AS BIGINT) AS sxy,
         CAST(sum(c_a * ad_a) AS BIGINT) AS sxx,
         CAST(sum(c_b * ad_b) AS BIGINT) AS syy
  FROM j GROUP BY 1, 2
)
SELECT la, lb, n_a, n_b,
       CAST(floor((2.0 * CAST(sxy AS DOUBLE)
                    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                   - CAST(sxx AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
                   - CAST(syy AS DOUBLE)
                     / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)))
                  * 10000 + {_OFF}) AS BIGINT) AS ed2_e4
FROM agg
ORDER BY la, lb
"""


# ---------------------------------------------------------------------------
# basket_lift — association lift between event types in user-day baskets
# ---------------------------------------------------------------------------
# Market-basket association (Agrawal et al. SIGMOD 1993 support/
# confidence; lift per Brin et al. 1997): baskets are user-day DISTINCT
# type sets; for each ordered type pair, support(ab), confidence
# P(b|a), lift P(ab)/(P(a)P(b)).  Pair counts via one equi-self-join of
# the distinct basket-membership table on the basket key (output
# bounded by |types|^2); every probability an exact integer ratio.


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bm = ev.select(
        "user_id",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
        "event_type",
    ).distinct()
    nb = bm.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    single = bm.groupBy("event_type").agg(F.count(F.lit(1)).alias("c1"))
    pair = (
        bm.alias("x")
        .join(
            bm.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.day") == F.col("y.day"))
            & (F.col("x.event_type") != F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("ta"), F.col("y.event_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    out = (
        pair.join(
            F.broadcast(single.withColumnRenamed("event_type", "ta").withColumnRenamed("c1", "c_a")),
            "ta",
        )
        .join(
            F.broadcast(single.withColumnRenamed("event_type", "tb").withColumnRenamed("c1", "c_b")),
            "tb",
        )
        .crossJoin(F.broadcast(nb))
    )
    nbl = F.col("n_baskets").cast("double")
    lift = (
        F.col("c_ab").cast("double")
        * nbl
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    conf = F.col("c_ab").cast("double") / F.col("c_a").cast("double")
    supp = F.col("c_ab").cast("double") / nbl
    return out.select(
        "ta",
        "tb",
        F.col("c_ab").cast("long").alias("c_ab"),
        F.floor(supp * 1_000_000 + F.lit(_OFF)).cast("long").alias("support_e6"),
        F.floor(conf * 1_000_000 + F.lit(_OFF)).cast("long").alias("confidence_e6"),
        F.floor(lift * 10_000 + F.lit(_OFF)).cast("long").alias("lift_e4"),
    ).orderBy("ta", "tb")


SQL_BASKET_LIFT = f"""
WITH bm AS (
  SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         event_type
  FROM events
), nb AS (
  SELECT count(*) AS n_baskets FROM (SELECT DISTINCT user_id, day FROM bm)
), single AS (
  SELECT event_type, count(*) AS c1 FROM bm GROUP BY 1
), pair AS (
  SELECT x.event_type AS ta, y.event_type AS tb, count(*) AS c_ab
  FROM bm x JOIN bm y
    ON x.user_id = y.user_id AND x.day = y.day
   AND x.event_type <> y.event_type
  GROUP BY 1, 2
)
SELECT ta, tb, CAST(c_ab AS BIGINT) AS c_ab,
       CAST(floor(CAST(c_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS support_e6,
       CAST(floor(CAST(c_ab AS DOUBLE) / CAST(sa.c1 AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS confidence_e6,
       CAST(floor(CAST(c_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE)
                  / (CAST(sa.c1 AS DOUBLE) * CAST(sb.c1 AS DOUBLE))
                  * 10000 + {_OFF}) AS BIGINT) AS lift_e4
FROM pair
JOIN single sa ON sa.event_type = pair.ta
JOIN single sb ON sb.event_type = pair.tb
CROSS JOIN nb
ORDER BY ta, tb
"""


# ---------------------------------------------------------------------------
# trending_terms — last-day odds-ratio trending terms with Haldane fix
# ---------------------------------------------------------------------------
# Temporal companion of log_odds_terms: terms whose LAST-DAY share
# jumped vs the prior corpus, scored by the Haldane-Anscombe-corrected
# log odds ratio ln(((a+.5)/(A-a+.5)) / ((b+.5)/(B-b+.5))) — exact
# integer counts, one deterministic expression; top-10 by (log-OR desc,
# term asc) over the bounded candidate set (terms seen on the last
# day with count >= 3).  documents carry no timestamp, so the "day" is
# the crawl-order bucket doc_id // 100 — the synthetic-table analog of
# a crawl batch; the LAST bucket is the trending window.


def q_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _documents(spark, sf_dir).select(
        (F.col("doc_id") / 100).cast("long").alias("bucket"),
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
    )
    last = toks.agg(F.max("bucket").alias("lb"))
    t = toks.crossJoin(F.broadcast(last)).withColumn(
        "is_last", (F.col("bucket") == F.col("lb")).cast("long")
    )
    cnt = t.groupBy("w").agg(
        F.sum("is_last").alias("a"),
        F.sum(F.lit(1) - F.col("is_last")).alias("b"),
    )
    tot = cnt.agg(
        F.sum("a").alias("ta"), F.sum("b").alias("tb")
    )
    c = cnt.filter(F.col("a") >= 3).crossJoin(F.broadcast(tot))
    lor = F.log(
        ((F.col("a") + 0.5) / (F.col("ta") - F.col("a") + 0.5))
        / ((F.col("b") + 0.5) / (F.col("tb") - F.col("b") + 0.5))
    )
    scored = c.select(
        "w",
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.floor(lor * 10_000 + F.lit(_OFF)).cast("long").alias("log_or_e4"),
    )
    wr = Window.orderBy(F.desc("log_or_e4"), F.asc("w"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 10)
        .select(F.col("rank").cast("long").alias("rank"), "w", "a", "b", "log_or_e4")
        .orderBy("rank")
    )


SQL_TRENDING = f"""
WITH toks AS (
  SELECT doc_id // 100 AS bucket,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents
), last AS (
  SELECT max(bucket) AS lb FROM toks
), cnt AS (
  SELECT w,
         CAST(sum(CASE WHEN bucket = lb THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN bucket = lb THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM toks CROSS JOIN last GROUP BY 1
), tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb FROM cnt
), scored AS (
  SELECT w, a, b,
         CAST(floor(ln(((a + 0.5) / (ta - a + 0.5))
                       / ((b + 0.5) / (tb - b + 0.5))) * 10000 + {_OFF})
              AS BIGINT) AS log_or_e4
  FROM cnt CROSS JOIN tot
  WHERE a >= 3
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY log_or_e4 DESC, w) AS rank
  FROM scored
)
SELECT CAST(rank AS BIGINT) AS rank, w, a, b, log_or_e4
FROM ranked WHERE rank <= 10
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Homogeneity battery — Pettitt / Buishand / SNHT per user
# ---------------------------------------------------------------------------
# The three standard break-detection screens for sensor relocation /
# recalibration (complementing cusum_shift / binseg / pelt which find
# MEAN shifts by least squares): Pettitt's rank test (1979,
# distribution-free), Buishand's cumulative-deviation range (1982), and
# Alexandersson's SNHT (1986).  All three reduce to per-key windows
# over the hourly centivalue series with EXACT integer cores:
# Pettitt's U_t = cumsum(2*avg-rank) - t(n+1) is a BIGINT; Buishand's
# n-scaled partial sums n*cum_k - k*tot are BIGINTs; SNHT's T_k is a
# deterministic double from those same exact cums.  p-values /
# rescaled stats are single expressions.

from diive_spark.queries_stats2 import _HOURLY_SQL as _HSQL
from diive_spark.queries_stats2 import _hourly as _hourly_df


def q_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rank over v ALONE (no tiebreak column): rank() must give tied
    # values their shared min rank for the average-rank identity
    wv = Window.partitionBy("user_id").orderBy("v")
    wt = Window.partitionBy("user_id", "v")
    wtime = Window.partitionBy("user_id").orderBy("t")
    wn = Window.partitionBy("user_id")
    h = (
        _hourly_df(spark, sf_dir)
        .withColumn("rk", F.rank().over(wv))
        .withColumn("ties", F.count(F.lit(1)).over(wt))
        .withColumn("r2", 2 * F.col("rk") + F.col("ties") - 1)
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("tpos", F.row_number().over(wtime))
        .withColumn(
            "cum_r2",
            F.sum("r2").over(wtime.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    # U_t (x2 scale cancels: cum_r2 = 2*cum_avg_rank) -> U_t = cum_r2 - t(n+1)
    u = h.withColumn(
        "u_abs", F.abs(F.col("cum_r2") - F.col("tpos") * (F.col("n") + 1))
    ).filter(F.col("tpos") < F.col("n"))
    agg = u.groupBy("user_id").agg(
        F.max("n").alias("n"), F.max("u_abs").alias("k_stat")
    )
    nd = F.col("n").cast("double")
    kd = F.col("k_stat").cast("double")
    p = 2.0 * F.exp(-6.0 * kd * kd / (nd * nd * nd + nd * nd))
    return agg.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        F.col("k_stat").cast("long").alias("k_stat"),
        F.floor(F.least(p, F.lit(1.0)) * 1_000_000 + F.lit(_OFF))
        .cast("long")
        .alias("p_e6"),
    ).orderBy("user_id")


SQL_PETTITT = f"""
WITH {_HSQL},
r AS (
  SELECT user_id, t, v,
         2 * rank() OVER (PARTITION BY user_id ORDER BY v)
           + count(*) OVER (PARTITION BY user_id, v) - 1 AS r2,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM hourly
), c AS (
  SELECT user_id, n,
         row_number() OVER wt AS tpos,
         sum(r2) OVER (PARTITION BY user_id ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_r2
  FROM r
  WINDOW wt AS (PARTITION BY user_id ORDER BY t)
), u AS (
  SELECT user_id, n, abs(cum_r2 - tpos * (n + 1)) AS u_abs
  FROM c WHERE tpos < n
), agg AS (
  SELECT user_id, CAST(max(n) AS BIGINT) AS n,
         CAST(max(u_abs) AS BIGINT) AS k_stat
  FROM u GROUP BY 1
)
SELECT user_id, n, k_stat,
       CAST(floor(least(2.0 * exp(-6.0 * CAST(k_stat AS DOUBLE) * CAST(k_stat AS DOUBLE)
                                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                     + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 1.0)
                  * 1000000 + {_OFF}) AS BIGINT) AS p_e6
FROM agg
ORDER BY user_id
"""


def q_buishand_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    wtime = Window.partitionBy("user_id").orderBy("t")
    wn = Window.partitionBy("user_id")
    h = (
        _hourly_df(spark, sf_dir)
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("tot", F.sum("v").over(wn))
        .withColumn("sv2", F.sum(F.col("v") * F.col("v")).over(wn))
        .withColumn("k", F.row_number().over(wtime))
        .withColumn(
            "cum", F.sum("v").over(wtime.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    # n-scaled partial sum deviations: n*S_k = n*cum_k - k*tot (exact)
    s = h.withColumn("ns", F.col("n") * F.col("cum") - F.col("k") * F.col("tot"))
    agg = s.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.max("tot").alias("tot"),
        F.max("sv2").alias("sv2"),
        F.max("ns").alias("smax"),
        F.min("ns").alias("smin"),
    )
    nd = F.col("n").cast("double")
    # population variance via ss identity (Buishand's form uses /n)
    var = (
        F.col("sv2").cast("double")
        - F.col("tot").cast("double") * F.col("tot").cast("double") / nd
    ) / nd
    q = (F.col("smax").cast("double") - F.col("smin").cast("double")) / nd
    rb = q / (F.sqrt(var) * F.sqrt(nd))
    return (
        agg.filter(var > 0)
        .select(
            "user_id",
            F.col("n").cast("long").alias("n"),
            (F.col("smax") - F.col("smin")).cast("long").alias("q_n_scaled"),
            F.floor(rb * 10_000 + F.lit(_OFF)).cast("long").alias("rb_e4"),
        )
        .orderBy("user_id")
    )


SQL_BUISHAND = f"""
WITH {_HSQL},
h AS (
  SELECT user_id, t, v,
         count(*) OVER pw AS n,
         CAST(sum(v) OVER pw AS BIGINT) AS tot,
         CAST(sum(v * v) OVER pw AS BIGINT) AS sv2,
         row_number() OVER wt AS k,
         CAST(sum(v) OVER (PARTITION BY user_id ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM hourly
  WINDOW pw AS (PARTITION BY user_id),
         wt AS (PARTITION BY user_id ORDER BY t)
), s AS (
  SELECT user_id, n, tot, sv2, n * cum - k * tot AS ns FROM h
), agg AS (
  SELECT user_id, CAST(max(n) AS BIGINT) AS n,
         max(tot) AS tot, max(sv2) AS sv2,
         CAST(max(ns) AS BIGINT) AS smax, CAST(min(ns) AS BIGINT) AS smin
  FROM s GROUP BY 1
), alg AS (
  SELECT user_id, n, smax, smin,
         (CAST(sv2 AS DOUBLE)
          - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
         / CAST(n AS DOUBLE) AS var
  FROM agg
)
SELECT user_id, n, smax - smin AS q_n_scaled,
       CAST(floor((CAST(smax AS DOUBLE) - CAST(smin AS DOUBLE)) / CAST(n AS DOUBLE)
                  / (sqrt(var) * sqrt(CAST(n AS DOUBLE)))
                  * 10000 + {_OFF}) AS BIGINT) AS rb_e4
FROM alg
WHERE var > 0
ORDER BY user_id
"""


def q_snht_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    wtime = Window.partitionBy("user_id").orderBy("t")
    wn = Window.partitionBy("user_id")
    h = (
        _hourly_df(spark, sf_dir)
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("tot", F.sum("v").over(wn))
        .withColumn("sv2", F.sum(F.col("v") * F.col("v")).over(wn))
        .withColumn("k", F.row_number().over(wtime))
        .withColumn(
            "cum", F.sum("v").over(wtime.rowsBetween(Window.unboundedPreceding, 0))
        )
        .filter(F.col("k") < F.col("n"))
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    mean = F.col("tot").cast("double") / nd
    var = (
        F.col("sv2").cast("double")
        - F.col("tot").cast("double") * F.col("tot").cast("double") / nd
    ) / nd
    z1 = (F.col("cum").cast("double") / kd - mean) / F.sqrt(var)
    z2 = (
        (F.col("tot") - F.col("cum")).cast("double") / (nd - kd) - mean
    ) / F.sqrt(var)
    tk = kd * z1 * z1 + (nd - kd) * z2 * z2
    s = h.withColumn("tk", tk).filter(var > 0)
    # max T_k with smallest-k tie-break: per-k T values are identical
    # IEEE expressions on both engines, so the argmax is deterministic
    best = s.groupBy("user_id").agg(
        F.max("n").alias("n"),
        F.max(F.struct(F.col("tk"), (-F.col("k")).alias("negk"))).alias("b"),
    )
    return best.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        (-F.col("b.negk")).cast("long").alias("k_hat"),
        F.floor(F.col("b.tk") * 10_000 + F.lit(_OFF)).cast("long").alias("t_e4"),
    ).orderBy("user_id")


SQL_SNHT = f"""
WITH {_HSQL},
h AS (
  SELECT user_id, t, v,
         count(*) OVER pw AS n,
         CAST(sum(v) OVER pw AS BIGINT) AS tot,
         CAST(sum(v * v) OVER pw AS BIGINT) AS sv2,
         row_number() OVER wt AS k,
         CAST(sum(v) OVER (PARTITION BY user_id ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM hourly
  WINDOW pw AS (PARTITION BY user_id),
         wt AS (PARTITION BY user_id ORDER BY t)
), s AS (
  SELECT user_id, n, k,
         CAST(k AS DOUBLE)
           * pow((CAST(cum AS DOUBLE) / CAST(k AS DOUBLE)
                  - CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(sv2 AS DOUBLE)
                         - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)), 2)
         + (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
           * pow((CAST(tot - cum AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))
                  - CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(sv2 AS DOUBLE)
                         - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
                        / CAST(n AS DOUBLE)), 2) AS tk
  FROM h
  WHERE k < n
    AND (CAST(sv2 AS DOUBLE)
         - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) / CAST(n AS DOUBLE))
        / CAST(n AS DOUBLE) > 0
), best AS (
  SELECT user_id, n, k, tk,
         row_number() OVER (PARTITION BY user_id ORDER BY tk DESC, k ASC) AS rn
  FROM s
)
SELECT user_id, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_hat,
       CAST(floor(tk * 10000 + {_OFF}) AS BIGINT) AS t_e4
FROM best
WHERE rn = 1
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# JSON property extraction — the semi-structured ingest path
# ---------------------------------------------------------------------------
# events.props is a JSON string column ({"k": N}); these two queries
# exercise the JSON extraction path end-to-end (Spark get_json_object —
# JVM-side, codegen — vs DuckDB json_extract_string), the capability a
# web-event warehouse uses constantly.  Extraction stays in the scan
# stage (no UDF); malformed/missing keys count as nulls and are
# reported, never dropped silently.


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    e = ev.select("event_type", k.alias("k"))
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("k").isNull().cast("long")).alias("n_null"),
        F.sum("k").alias("sk"),
        F.sum(F.col("k") * F.col("k")).alias("sk2"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )
    nn = (F.col("n") - F.col("n_null")).cast("double")
    mean = F.col("sk").cast("double") / nn
    var = (
        F.col("sk2").cast("double")
        - F.col("sk").cast("double") * F.col("sk").cast("double") / nn
    ) / (nn - 1.0)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("sk").cast("long").alias("sk"),
        F.col("k_min").cast("long").alias("k_min"),
        F.col("k_max").cast("long").alias("k_max"),
        F.floor(mean * 10_000 + F.lit(_OFF)).cast("long").alias("mean_e4"),
        F.floor(var * 10_000 + F.lit(_OFF)).cast("long").alias("var_e4"),
    ).orderBy("event_type")


SQL_JSON_STATS = f"""
WITH e AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS sk2,
         min(k) AS k_min, max(k) AS k_max
  FROM e GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n, n_null, sk,
       CAST(k_min AS BIGINT) AS k_min, CAST(k_max AS BIGINT) AS k_max,
       CAST(floor(CAST(sk AS DOUBLE) / CAST(n - n_null AS DOUBLE)
                  * 10000 + {_OFF}) AS BIGINT) AS mean_e4,
       CAST(floor((CAST(sk2 AS DOUBLE)
                   - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE)
                     / CAST(n - n_null AS DOUBLE))
                  / (CAST(n - n_null AS DOUBLE) - 1.0)
                  * 10000 + {_OFF}) AS BIGINT) AS var_e4
FROM agg
ORDER BY event_type
"""


def q_json_props_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    ).filter(F.col("k").isNotNull())
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sk"),
        F.sum("v").alias("sv"),
        F.sum(F.col("k") * F.col("k")).alias("skk"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
        F.sum(F.col("k") * F.col("v")).alias("skv"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("skv").cast("double") - F.col("sk").cast("double") * F.col(
        "sv"
    ).cast("double")
    den = F.sqrt(
        nd * F.col("skk").cast("double")
        - F.col("sk").cast("double") * F.col("sk").cast("double")
    ) * F.sqrt(
        nd * F.col("svv").cast("double")
        - F.col("sv").cast("double") * F.col("sv").cast("double")
    )
    return (
        agg.filter(den > 0)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor(num / den * 1_000_000 + F.lit(_OFF)).cast("long").alias(
                "corr_e6"
            ),
        )
        .orderBy("event_type")
    )


SQL_JSON_CORR = f"""
WITH e AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), f AS (
  SELECT * FROM e WHERE k IS NOT NULL
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(k) AS BIGINT) AS sk, CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(k * k) AS BIGINT) AS skk,
         CAST(sum(v * v) AS BIGINT) AS svv,
         CAST(sum(k * v) AS BIGINT) AS skv
  FROM f GROUP BY 1
), alg AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) * CAST(skv AS DOUBLE)
           - CAST(sk AS DOUBLE) * CAST(sv AS DOUBLE) AS num,
         sqrt(CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
              - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
         * sqrt(CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
                - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) AS den
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(num / den * 1000000 + {_OFF}) AS BIGINT) AS corr_e6
FROM alg
WHERE den > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# new_user_share — cold-start share of daily actives
# ---------------------------------------------------------------------------
# Share of each day's active users whose FIRST-EVER activity is that
# day.  First-seen via one combinable min-agg on the user-day distinct
# table, joined back co-partitioned; exact integers.


def q_new_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ud = ev.select(
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
        "user_id",
    ).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = ud.join(first, "user_id")
    agg = j.groupBy("day").agg(
        F.count(F.lit(1)).alias("dau"),
        F.sum((F.col("day") == F.col("first_day")).cast("long")).alias("n_new"),
    )
    share = F.col("n_new").cast("double") / F.col("dau").cast("double")
    return agg.select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("n_new").cast("long").alias("n_new"),
        F.floor(share * 1_000_000 + F.lit(_OFF)).cast("long").alias("new_share_e6"),
    ).orderBy("day")


SQL_NEW_USER_SHARE = f"""
WITH ud AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
  FROM events
), first AS (
  SELECT user_id, min(day) AS first_day FROM ud GROUP BY 1
), agg AS (
  SELECT ud.day, count(*) AS dau,
         CAST(sum(CASE WHEN ud.day = first.first_day THEN 1 ELSE 0 END)
              AS BIGINT) AS n_new
  FROM ud JOIN first ON first.user_id = ud.user_id
  GROUP BY 1
)
SELECT day, CAST(dau AS BIGINT) AS dau, n_new,
       CAST(floor(CAST(n_new AS DOUBLE) / CAST(dau AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS new_share_e6
FROM agg
ORDER BY day
"""


# ---------------------------------------------------------------------------
# churn_labels — 7-day-inactivity churn label generation per active day
# ---------------------------------------------------------------------------
# The ML-pipeline label generator: a user "churns at day d" if they are
# active on d and have NO activity in (d, d+7].  One lead() on the
# per-user sorted active-day list decides the label (the next active
# day is all that matters); per-day label rates are exact integers.
# The last 7 days of the observation window are right-censored and
# excluded (the label is undefined there), matching standard practice.


def q_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ud = ev.select(
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
        "user_id",
    ).distinct()
    horizon = ud.agg(F.max("day").alias("max_day"))
    w = Window.partitionBy("user_id").orderBy("day")
    lab = (
        ud.withColumn("next_day", F.lead("day").over(w))
        .crossJoin(F.broadcast(horizon))
        .filter(F.col("day") <= F.col("max_day") - 7)
        .withColumn(
            "churned",
            (
                F.col("next_day").isNull() | (F.col("next_day") > F.col("day") + 7)
            ).cast("long"),
        )
    )
    agg = lab.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum("churned").alias("n_churned"),
    )
    rate = F.col("n_churned").cast("double") / F.col("n_active").cast("double")
    return agg.select(
        "day",
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_churned").cast("long").alias("n_churned"),
        F.floor(rate * 1_000_000 + F.lit(_OFF)).cast("long").alias("churn_rate_e6"),
    ).orderBy("day")


SQL_CHURN_LABELS = f"""
WITH ud AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, user_id
  FROM events
), horizon AS (
  SELECT max(day) AS max_day FROM ud
), lab AS (
  SELECT day,
         CASE WHEN next_day IS NULL OR next_day > day + 7
              THEN 1 ELSE 0 END AS churned
  FROM (
    SELECT user_id, day,
           lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
    FROM ud
  ) CROSS JOIN horizon
  WHERE day <= max_day - 7
), agg AS (
  SELECT day, count(*) AS n_active,
         CAST(sum(churned) AS BIGINT) AS n_churned
  FROM lab GROUP BY 1
)
SELECT day, CAST(n_active AS BIGINT) AS n_active, n_churned,
       CAST(floor(CAST(n_churned AS DOUBLE) / CAST(n_active AS DOUBLE)
                  * 1000000 + {_OFF}) AS BIGINT) AS churn_rate_e6
FROM agg
ORDER BY day
"""


# ---------------------------------------------------------------------------
# lorenz_curve — source-concentration Lorenz deciles per language
# ---------------------------------------------------------------------------
# The curve behind gini_sources: sources ranked ascending by doc count
# (count, then source name — deterministic), cumulative doc share at
# each source rank expressed at the source-decile grid via the exact
# NTILE quota arithmetic (first n%10 buckets one larger — the
# ts_crossings device).  All integers; shares are single divisions.


def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    per = (
        _documents(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy("c", "source")
    wn = Window.partitionBy("lang")
    r = (
        per.withColumn("rk", F.row_number().over(w))
        .withColumn("ns", F.count(F.lit(1)).over(wn))
        .withColumn("tot", F.sum("c").over(wn))
        .withColumn(
            "cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
    )
    q10 = F.col("ns") - F.floor(F.col("ns") / 10) * 10
    big = (F.floor(F.col("ns") / 10) + 1) * q10
    bucket = F.when(
        F.col("rk") <= big,
        F.ceil(F.col("rk") / (F.floor(F.col("ns") / 10) + 1)),
    ).otherwise(
        q10
        + F.ceil(
            (F.col("rk") - big) / F.greatest(F.floor(F.col("ns") / 10), F.lit(1))
        )
    )
    b = r.withColumn("decile", bucket.cast("long"))
    agg = b.groupBy("lang", "decile").agg(
        F.max("cum").alias("cum"),
        F.max("tot").alias("tot"),
        F.max("rk").alias("rk_hi"),
        F.max("ns").alias("ns"),
    )
    share = F.col("cum").cast("double") / F.col("tot").cast("double")
    pop = F.col("rk_hi").cast("double") / F.col("ns").cast("double")
    return agg.select(
        "lang",
        "decile",
        F.floor(pop * 10_000 + F.lit(_OFF)).cast("long").alias("pop_share_e4"),
        F.floor(share * 10_000 + F.lit(_OFF)).cast("long").alias("doc_share_e4"),
    ).orderBy("lang", "decile")


SQL_LORENZ = f"""
WITH per AS (
  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2
), r AS (
  SELECT lang, c,
         row_number() OVER w AS rk,
         count(*) OVER (PARTITION BY lang) AS ns,
         CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS tot,
         CAST(sum(c) OVER (PARTITION BY lang ORDER BY c, source
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM per
  WINDOW w AS (PARTITION BY lang ORDER BY c, source)
), b AS (
  SELECT *,
         CASE WHEN rk <= (ns // 10 + 1) * (ns % 10)
              THEN CAST(ceil(rk / (ns // 10 + 1.0)) AS BIGINT)
              ELSE ns % 10 + CAST(ceil((rk - (ns // 10 + 1) * (ns % 10))
                                       / greatest(ns // 10, 1) * 1.0) AS BIGINT)
         END AS decile
  FROM r
), agg AS (
  SELECT lang, decile,
         CAST(max(cum) AS BIGINT) AS cum, max(tot) AS tot,
         CAST(max(rk) AS BIGINT) AS rk_hi, CAST(max(ns) AS BIGINT) AS ns
  FROM b GROUP BY 1, 2
)
SELECT lang, decile,
       CAST(floor(CAST(rk_hi AS DOUBLE) / CAST(ns AS DOUBLE)
                  * 10000 + {_OFF}) AS BIGINT) AS pop_share_e4,
       CAST(floor(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
                  * 10000 + {_OFF}) AS BIGINT) AS doc_share_e4
FROM agg
ORDER BY lang, decile
"""


# ---------------------------------------------------------------------------
# cohens_kappa — agreement between two quality heuristics per language
# ---------------------------------------------------------------------------
# Inter-annotator agreement (Cohen 1960) between two in-engine binary
# labelers over documents: A = "length above the language's lower
# median", B = "distinct-token ratio above the language's lower
# median".  Medians are exact order-statistic element picks (the
# ts_crossings device); the 2x2 contingency is exact integers; kappa =
# (po - pe)/(1 - pe) is one double expression.  The IAA metric every
# labeling pipeline reports, computed without leaving the engine.


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select(
        "lang",
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split(F.trim("text"), r"\s+"))).alias("n_types"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"),
    )
    # distinct-token ratio scaled exact: ttr_e6 = floor(types/toks * 1e6 + OFF)
    d = d.withColumn(
        "ttr_e6",
        F.floor(
            F.col("n_types").cast("double") / F.col("n_toks") * 1_000_000
            + F.lit(_OFF)
        ).cast("long"),
    )
    wlen = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wttr = Window.partitionBy("lang").orderBy("ttr_e6", "doc_id")
    wn = Window.partitionBy("lang")
    r = (
        d.withColumn("r_len", F.row_number().over(wlen))
        .withColumn("r_ttr", F.row_number().over(wttr))
        .withColumn("nn", F.count(F.lit(1)).over(wn))
    )
    med_len = r.filter(
        F.col("r_len") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("lang", F.col("n_chars").alias("med_len"))
    med_ttr = r.filter(
        F.col("r_ttr") == F.floor((F.col("nn") - 1) / 2) + 1
    ).select("lang", F.col("ttr_e6").alias("med_ttr"))
    lab = (
        d.join(F.broadcast(med_len), "lang")
        .join(F.broadcast(med_ttr), "lang")
        .withColumn("a", (F.col("n_chars") > F.col("med_len")).cast("long"))
        .withColumn("b", (F.col("ttr_e6") > F.col("med_ttr")).cast("long"))
    )
    agg = lab.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 1)).cast("long")).alias("n11"),
        F.sum(((F.col("a") == 1) & (F.col("b") == 0)).cast("long")).alias("n10"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 1)).cast("long")).alias("n01"),
        F.sum(((F.col("a") == 0) & (F.col("b") == 0)).cast("long")).alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / nd
    pe = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01")).cast("double")
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00")).cast("double")
    ) / (nd * nd)
    kappa = (po - pe) / (1.0 - pe)
    return agg.filter(pe < 1.0).select(
        "lang",
        F.col("n").cast("long").alias("n"),
        F.col("n11").cast("long").alias("n11"),
        F.col("n00").cast("long").alias("n00"),
        F.floor(kappa * 1_000_000 + F.lit(_OFF)).cast("long").alias("kappa_e6"),
    ).orderBy("lang")


SQL_COHENS_KAPPA = f"""
WITH d AS (
  SELECT lang, doc_id, n_chars,
         CAST(floor(CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))
                         AS DOUBLE)
                    / len(regexp_split_to_array(trim(text), '\\s+'))
                    * 1000000 + {_OFF}) AS BIGINT) AS ttr_e6
  FROM documents
), r AS (
  SELECT lang, doc_id, n_chars, ttr_e6,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS r_len,
         row_number() OVER (PARTITION BY lang ORDER BY ttr_e6, doc_id) AS r_ttr,
         count(*) OVER (PARTITION BY lang) AS nn
  FROM d
), med_len AS (
  SELECT lang, n_chars AS med_len FROM r WHERE r_len = (nn - 1) // 2 + 1
), med_ttr AS (
  SELECT lang, ttr_e6 AS med_ttr FROM r WHERE r_ttr = (nn - 1) // 2 + 1
), lab AS (
  SELECT d.lang,
         CASE WHEN d.n_chars > med_len.med_len THEN 1 ELSE 0 END AS a,
         CASE WHEN d.ttr_e6 > med_ttr.med_ttr THEN 1 ELSE 0 END AS b
  FROM d
  JOIN med_len ON med_len.lang = d.lang
  JOIN med_ttr ON med_ttr.lang = d.lang
), agg AS (
  SELECT lang, count(*) AS n,
         CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
         CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
         CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
         CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM lab GROUP BY 1
), alg AS (
  SELECT lang, n, n11, n00,
         CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
         (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
          + CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
  FROM agg
)
SELECT lang, CAST(n AS BIGINT) AS n, n11, n00,
       CAST(floor((po - pe) / (1.0 - pe) * 1000000 + {_OFF}) AS BIGINT)
         AS kappa_e6
FROM alg
WHERE pe < 1.0
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# cuped_adjustment — CUPED variance reduction per event type
# ---------------------------------------------------------------------------
# CUPED (Deng, Xu, Kohavi & Walker WSDM 2013): using each user's
# FIRST-half mean value as the pre-experiment covariate X for their
# SECOND-half mean Y, theta = cov(X,Y)/var(X) and the achievable
# variance reduction is rho^2.  Per-user means are floored to exact
# centi-integers FIRST (floor of an exact num/den ratio — deterministic),
# so all cross-user moment sums are exact BIGINTs and theta/rho^2 are
# single expressions.  Two combinable groupBys + one co-keyed join.


def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "event_type",
        "user_id",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    mid = e.agg(
        F.floor((F.min("day") + F.max("day")) / 2).cast("long").alias("mid")
    )
    e = e.crossJoin(F.broadcast(mid)).withColumn(
        "half", (F.col("day") > F.col("mid")).cast("long")
    )
    um = e.groupBy("event_type", "user_id", "half").agg(
        F.sum("v").alias("num"), F.count(F.lit(1)).alias("den")
    )
    # exact centi-integer user mean
    um = um.withColumn(
        "m",
        F.floor(F.col("num").cast("double") / F.col("den") * 100 + F.lit(_OFF))
        .cast("long"),
    )
    x = um.filter(F.col("half") == 0).select(
        "event_type", "user_id", F.col("m").alias("x")
    )
    y = um.filter(F.col("half") == 1).select(
        "event_type", "user_id", F.col("m").alias("y")
    )
    j = x.join(y, ["event_type", "user_id"])
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / nd
    vy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / nd
    theta = cov / vx
    rho2 = cov * cov / (vx * vy)
    return (
        agg.filter((vx > 0) & (vy > 0))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.floor(theta * 10_000 + F.lit(_OFF)).cast("long").alias("theta_e4"),
            F.floor(rho2 * 1_000_000 + F.lit(_OFF)).cast("long").alias("rho2_e6"),
        )
        .orderBy("event_type")
    )


SQL_CUPED = f"""
WITH e AS (
  SELECT event_type, user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), mid AS (
  SELECT (min(day) + max(day)) // 2 AS mid FROM e
), h AS (
  SELECT event_type, user_id,
         CASE WHEN day > mid THEN 1 ELSE 0 END AS half, v
  FROM e CROSS JOIN mid
), um AS (
  SELECT event_type, user_id, half,
         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) * 100 + {_OFF})
              AS BIGINT) AS m
  FROM h GROUP BY 1, 2, 3
), j AS (
  SELECT x.event_type, x.user_id, x.m AS x, y.m AS y
  FROM (SELECT * FROM um WHERE half = 0) x
  JOIN (SELECT * FROM um WHERE half = 1) y
    ON y.event_type = x.event_type AND y.user_id = x.user_id
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM j GROUP BY 1
), alg AS (
  SELECT event_type, n,
         CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
           / CAST(n AS DOUBLE) AS cov,
         CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
           / CAST(n AS DOUBLE) AS vx,
         CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
           / CAST(n AS DOUBLE) AS vy
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(floor(cov / vx * 10000 + {_OFF}) AS BIGINT) AS theta_e4,
       CAST(floor(cov * cov / (vx * vy) * 1000000 + {_OFF}) AS BIGINT)
         AS rho2_e6
FROM alg
WHERE vx > 0 AND vy > 0
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# diff_in_diff — DiD estimate between the two heaviest event types
# ---------------------------------------------------------------------------
# Difference-in-differences (Card & Krueger 1994 canonical 2x2):
# treatment = the most frequent event type, control = the second, cut
# at the midpoint day.  DiD = (y_t,post - y_t,pre) - (y_c,post -
# y_c,pre) over exact centivalue means — a single expression over 8
# exact integers.  The type selection is count-based (deterministic).


def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    e = ev.select(
        "event_type",
        (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000))
        .cast("long")
        .alias("day"),
        F.floor(F.col("value") * 100 + F.lit(_OFF)).cast("long").alias("v"),
    )
    wr = Window.orderBy(F.desc("c"), F.asc("event_type"))
    top2 = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= 2)
        .select("event_type", "rk")
    )
    mid = e.agg(F.floor((F.min("day") + F.max("day")) / 2).cast("long").alias("mid"))
    cells = (
        e.join(F.broadcast(top2), "event_type")
        .crossJoin(F.broadcast(mid))
        .withColumn("post", (F.col("day") > F.col("mid")).cast("long"))
        .groupBy("rk", "post")
        .agg(F.sum("v").alias("num"), F.count(F.lit(1)).alias("den"))
    )
    flat = cells.select(
        F.when((F.col("rk") == 1) & (F.col("post") == 1), F.col("num")).alias("tn1"),
        F.when((F.col("rk") == 1) & (F.col("post") == 1), F.col("den")).alias("td1"),
        F.when((F.col("rk") == 1) & (F.col("post") == 0), F.col("num")).alias("tn0"),
        F.when((F.col("rk") == 1) & (F.col("post") == 0), F.col("den")).alias("td0"),
        F.when((F.col("rk") == 2) & (F.col("post") == 1), F.col("num")).alias("cn1"),
        F.when((F.col("rk") == 2) & (F.col("post") == 1), F.col("den")).alias("cd1"),
        F.when((F.col("rk") == 2) & (F.col("post") == 0), F.col("num")).alias("cn0"),
        F.when((F.col("rk") == 2) & (F.col("post") == 0), F.col("den")).alias("cd0"),
    ).agg(
        F.max("tn1").alias("tn1"),
        F.max("td1").alias("td1"),
        F.max("tn0").alias("tn0"),
        F.max("td0").alias("td0"),
        F.max("cn1").alias("cn1"),
        F.max("cd1").alias("cd1"),
        F.max("cn0").alias("cn0"),
        F.max("cd0").alias("cd0"),
    )
    did = (
        F.col("tn1").cast("double") / F.col("td1")
        - F.col("tn0").cast("double") / F.col("td0")
    ) - (
        F.col("cn1").cast("double") / F.col("cd1")
        - F.col("cn0").cast("double") / F.col("cd0")
    )
    return flat.select(
        F.col("td0").cast("long").alias("n_treat_pre"),
        F.col("td1").cast("long").alias("n_treat_post"),
        F.col("cd0").cast("long").alias("n_ctrl_pre"),
        F.col("cd1").cast("long").alias("n_ctrl_post"),
        F.floor(did * 10_000 + F.lit(_OFF)).cast("long").alias("did_e4"),
    )


SQL_DIFF_IN_DIFF = f"""
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         CAST(floor(value * 100 + {_OFF}) AS BIGINT) AS v
  FROM events
), top2 AS (
  SELECT event_type, rk FROM (
    SELECT event_type, row_number() OVER (ORDER BY count(*) DESC, event_type)
           AS rk
    FROM e GROUP BY event_type
  ) WHERE rk <= 2
), mid AS (
  SELECT (min(day) + max(day)) // 2 AS mid FROM e
), cells AS (
  SELECT top2.rk, CASE WHEN e.day > mid.mid THEN 1 ELSE 0 END AS post,
         CAST(sum(e.v) AS BIGINT) AS num, count(*) AS den
  FROM e JOIN top2 ON top2.event_type = e.event_type CROSS JOIN mid
  GROUP BY 1, 2
), flat AS (
  SELECT
    max(CASE WHEN rk = 1 AND post = 1 THEN num END) AS tn1,
    max(CASE WHEN rk = 1 AND post = 1 THEN den END) AS td1,
    max(CASE WHEN rk = 1 AND post = 0 THEN num END) AS tn0,
    max(CASE WHEN rk = 1 AND post = 0 THEN den END) AS td0,
    max(CASE WHEN rk = 2 AND post = 1 THEN num END) AS cn1,
    max(CASE WHEN rk = 2 AND post = 1 THEN den END) AS cd1,
    max(CASE WHEN rk = 2 AND post = 0 THEN num END) AS cn0,
    max(CASE WHEN rk = 2 AND post = 0 THEN den END) AS cd0
  FROM cells
)
SELECT CAST(td0 AS BIGINT) AS n_treat_pre, CAST(td1 AS BIGINT) AS n_treat_post,
       CAST(cd0 AS BIGINT) AS n_ctrl_pre, CAST(cd1 AS BIGINT) AS n_ctrl_post,
       CAST(floor(((CAST(tn1 AS DOUBLE) / td1 - CAST(tn0 AS DOUBLE) / td0)
                   - (CAST(cn1 AS DOUBLE) / cd1 - CAST(cn0 AS DOUBLE) / cd0))
                  * 10000 + {_OFF}) AS BIGINT) AS did_e4
FROM flat
"""


def _runs_sql() -> str:
    from diive_spark.queries_stats3 import SQL_RUNS_TEST

    return SQL_RUNS_TEST


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bh_fdr_runs": q_bh_fdr_runs,
    "stickiness_dau_wau": q_stickiness_dau_wau,
    "session_paths": q_session_paths,
    "graph_reciprocity": q_graph_reciprocity,
    "bfs_depths": q_bfs_depths,
    "char_entropy_lang": q_char_entropy_lang,
    "energy_distance": q_energy_distance,
    "basket_lift": q_basket_lift,
    "trending_terms": q_trending_terms,
    "pettitt_test": q_pettitt_test,
    "buishand_range": q_buishand_range,
    "snht_test": q_snht_test,
    "json_props_stats": q_json_props_stats,
    "json_props_corr": q_json_props_corr,
    "new_user_share": q_new_user_share,
    "churn_labels": q_churn_labels,
    "lorenz_curve": q_lorenz_curve,
    "cohens_kappa": q_cohens_kappa,
    "cuped_adjustment": q_cuped_adjustment,
    "diff_in_diff": q_diff_in_diff,
}

ORACLE_SQL: dict[str, str] = {
    "bh_fdr_runs": _sql_bh(_runs_sql()),
    "stickiness_dau_wau": SQL_STICKINESS,
    "session_paths": SQL_SESSION_PATHS,
    "graph_reciprocity": SQL_RECIPROCITY,
    "bfs_depths": _sql_bfs(),
    "char_entropy_lang": SQL_CHAR_ENTROPY,
    "energy_distance": SQL_ENERGY,
    "basket_lift": SQL_BASKET_LIFT,
    "trending_terms": SQL_TRENDING,
    "pettitt_test": SQL_PETTITT,
    "buishand_range": SQL_BUISHAND,
    "snht_test": SQL_SNHT,
    "json_props_stats": SQL_JSON_STATS,
    "json_props_corr": SQL_JSON_CORR,
    "new_user_share": SQL_NEW_USER_SHARE,
    "churn_labels": SQL_CHURN_LABELS,
    "lorenz_curve": SQL_LORENZ,
    "cohens_kappa": SQL_COHENS_KAPPA,
    "cuped_adjustment": SQL_CUPED,
    "diff_in_diff": SQL_DIFF_IN_DIFF,
}
