"""Registry entries for HTML text extraction (input_hint invariant) and
ML gap-filling (SURVEY §2.10)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from diive_spark.ml.gapfill import ml_gapfill
from diive_spark.text.extract import verify_extraction


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# extract_text_roundtrip — input_hint invariant: build html around each
# document's text (identically in both engines), extract, and verify the
# extraction is byte-identical to the source text.
# ---------------------------------------------------------------------------

def q_extract_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents(spark, sf_dir).select("doc_id", "text")
    html = F.concat(
        F.lit("<html><head><style>p{color:red}</style></head><body><p>"),
        F.col("text"),
        F.lit("</p><script>var x = 1;</script></body></html>"),
    )
    pages = d.withColumn("html", F.encode(html, "UTF-8"))
    out = verify_extraction(pages, html_col="html", text_col="text", binary=True)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("extract_ok").cast("int").alias("extract_ok"),
        "n_chars_extracted",
    )


SQL_EXTRACT_TEXT = r"""
WITH pages AS (
  SELECT doc_id, text,
         '<html><head><style>p{color:red}</style></head><body><p>' || text ||
         '</p><script>var x = 1;</script></body></html>' AS html
  FROM documents
), stripped AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(html, '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
             '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
           '(?s)<[^>]*>', ' ', 'g') AS s
  FROM pages
), unescaped AS (
  SELECT doc_id, text,
         replace(replace(replace(replace(replace(
           s, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
           '&amp;', '&') AS s
  FROM stripped
), final AS (
  SELECT doc_id, text,
         trim(regexp_replace(s, '\s+', ' ', 'g')) AS extracted
  FROM unescaped
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(CASE WHEN extracted = text THEN 1 ELSE 0 END AS INT) AS extract_ok,
       CAST(length(extracted) AS BIGINT) AS n_chars_extracted
FROM final
"""


# ---------------------------------------------------------------------------
# ml_gapfill_30min — M1/M2 pipeline on the gridded 30-min series
# (rows-only driver check: the OLS kernel is not SQL-expressible;
# exactness vs the pandas oracle is asserted in tests/test_mlgapfill.py)
# ---------------------------------------------------------------------------

def q_ml_gapfill_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    binned = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        (
            (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_800_000_000) + 1)
            * 1800
        ).cast("long").alias("slot_s"),
        "value",
    )
    agg = binned.groupBy("user_id", "slot_s").agg(F.avg("value").alias("v"))
    # grid reindex happens INSIDE the kernel (grid_step) — no sequence/
    # explode + join, two fewer shuffles (see PLANS.md §4)
    out = ml_gapfill(agg, "user_id", "slot_s", "v", n_lags=1, grid_step=1800)
    return out.select(
        "user_id",
        F.col("ts_s").alias("slot_s"),
        F.round("value_filled", 4).alias("v_filled"),
        F.col("flag_fill").cast("int").alias("flag_fill"),
    )


# ---------------------------------------------------------------------------
# ml_gapfill_longterm — M3 LongTermRandomForestTS
# (randomforest_ts.py:948-1095): per-year model trained on the year plus
# its two nearest neighbor years (rows-only driver check: the iterative
# fit is not SQL-expressible; pytest-exact vs a pandas oracle of the same
# year-pool scheme in tests/test_extract_ml_streaming.py)
# ---------------------------------------------------------------------------

def q_ml_gapfill_longterm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.ml.gapfill import ml_gapfill_longterm

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # events span only ~1 month (anchored at 2024-01-01 = 1704067200) —
    # stretch 40x from a 2013 base so the fixture covers several calendar
    # years (the scheme under test is per-year pooling)
    stretched = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        (
            F.lit(1356998400)
            + (F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
               - F.lit(1704067200)) * 40
        ).cast("long").alias("ts_s"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value")).alias("v"),
    )
    agg = stretched.groupBy("user_id", "ts_s").agg(F.avg("v").alias("v"))
    out = ml_gapfill_longterm(agg, "user_id", "ts_s", "v", n_lags=1)
    return out.select(
        "user_id",
        "center_year",
        "ts_s",
        F.round("value_filled", 4).alias("v_filled"),
        F.col("flag_fill").cast("int").alias("flag_fill"),
    )


# ---------------------------------------------------------------------------
# ml_train_report — M1 model-quality: train/test scores + permutation
# importance (randomforest_ts.py:431-495,682-710; rows-only — seeded
# shuffles are not SQL-expressible, exactness pytest-checked)
# ---------------------------------------------------------------------------

def q_ml_train_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.ml.gapfill import ml_train_report

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    binned = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        (
            (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_800_000_000) + 1)
            * 1800
        ).cast("long").alias("slot_s"),
        "value",
    )
    agg = binned.groupBy("user_id", "slot_s").agg(F.avg("value").alias("v"))
    out = ml_train_report(agg, "user_id", "slot_s", "v", n_lags=1)
    return out.select(
        "user_id",
        "feature",
        F.round("perm_importance", 4).alias("perm_importance"),
        F.round("r2", 4).alias("r2"),
        F.round("rmse", 4).alias("rmse"),
        "n_train",
        "n_test",
    )


# ---------------------------------------------------------------------------
# flag_lof — F9 LocalOutlierFactor (rows-only driver check: kNN-density is
# not SQL-expressible; exactness vs a brute-force O(n^2) LOF oracle is
# asserted in tests/test_lof.py)
# ---------------------------------------------------------------------------

def q_flag_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.operators.lof import lof_flag_kernel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "value",
    )
    out = lof_flag_kernel(
        ev, "user_id", "event_id", "value", n_neighbors=20, contamination=0.02
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("flag_lof").cast("int").alias("flag_lof"),
        F.round("lof", 4).alias("lof"),
    )


# ---------------------------------------------------------------------------
# flag_iforest — Isolation Forest anomaly score over (value, time-of-day)
# (ml/iforest.py; Liu et al. ICDM'08).  Rows-only driver check: the
# random-split ensemble is not SQL-expressible; distributed==local
# scoring and planted-outlier behavior are pinned in tests/test_iforest.py.
# ---------------------------------------------------------------------------

def q_flag_iforest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.ml.iforest import iforest_score

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.col("value").cast("double").alias("value"),
        (
            F.floor(
                F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000
            ) % 86_400
        ).cast("double").alias("sec_of_day"),
    )
    out = iforest_score(
        ev,
        feature_cols=["value", "sec_of_day"],
        id_cols=["event_id", "user_id"],
        n_trees=50,
        psi=256,
        seed=7,
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("iforest_score", 4).alias("iforest_score"),
        (F.col("iforest_score") >= 0.6).cast("int").alias("flag_iforest"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# embedding_pca — distributed PCA of the embeddings table (ml/pca.py):
# one-pass per-partition Gram partials -> driver eigh (d x d, model-sized)
# -> broadcast projection.  Rows-only driver check (no SQL eig);
# distributed==numpy pinned in tests/test_pca.py.
# ---------------------------------------------------------------------------

def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.ml.pca import pca_fit, pca_project

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("label").cast("long").alias("label"),
        "embedding",
    )
    model = pca_fit(e, "embedding", k=4)
    out = pca_project(e, model, "embedding", out_col="p")
    return out.select(
        "vec_id",
        "label",
        *[F.round(F.col("p")[i], 4).alias(f"pc{i}") for i in range(4)],
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# gorilla_blocks — north-rule compression: per-(series, day) Gorilla XOR +
# delta-of-delta block stats (rows-only: bit-packing is not SQL-expressible;
# lossless round-trip is property-tested in tests/test_compression.py)
# ---------------------------------------------------------------------------

def q_gorilla_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.compression.blocks import compress_blocks

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("url"), "ts", "value"
    )
    # size-bounded blocks (no day alignment): sparse series would shatter
    # into ~2.5-point day blocks otherwise (VERDICT r1 "What's wrong #1")
    blocks = compress_blocks(ev, "url", "ts", "value", block_seconds=None,
                             max_points=4096)
    return blocks.select(
        "url",
        "block_start_s",
        "n_points",
        "raw_bytes",
        "enc_bytes",
        F.round(F.col("raw_bytes") / F.col("enc_bytes"), 2).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# ml_gapfill_rf / ml_gapfill_xgb — M1 with the reference's actual model
# family (numpy histogram random forest / gradient-boosted trees,
# ml/forest.py) instead of the OLS stand-in; ml_optimize_params — M4
# OptimizeParamsRFTS grid search under TimeSeriesSplit CV.
# (rows-only driver checks: tree fits are not SQL-expressible; exactness
# + model-quality properties asserted in tests/test_forest.py)
# ---------------------------------------------------------------------------

def _agg_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    binned = ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        (
            (F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_800_000_000) + 1)
            * 1800
        ).cast("long").alias("slot_s"),
        "value",
    )
    return binned.groupBy("user_id", "slot_s").agg(F.avg("value").alias("v"))


def q_ml_gapfill_rf(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ml_gapfill(
        _agg_30min(spark, sf_dir), "user_id", "slot_s", "v",
        n_lags=1, grid_step=1800, regressor="rf",
        n_estimators=10, max_depth=5, min_samples_leaf=3,
    )
    return out.select(
        "user_id",
        F.col("ts_s").alias("slot_s"),
        F.round("value_filled", 4).alias("v_filled"),
        F.col("flag_fill").cast("int").alias("flag_fill"),
    )


def q_ml_gapfill_xgb(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ml_gapfill(
        _agg_30min(spark, sf_dir), "user_id", "slot_s", "v",
        n_lags=1, grid_step=1800, regressor="gbt",
        n_estimators=30, max_depth=3,
    )
    return out.select(
        "user_id",
        F.col("ts_s").alias("slot_s"),
        F.round("value_filled", 4).alias("v_filled"),
        F.col("flag_fill").cast("int").alias("flag_fill"),
    )


def q_ml_train_report_rf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 model-quality report with the REAL forest regressor:
    permutation importance over a fitted random forest (the reference's
    actual model family) instead of the OLS stand-in."""
    from diive_spark.ml.gapfill import ml_train_report

    agg = _agg_30min(spark, sf_dir).filter(F.col("user_id") % 3 == 1)
    out = ml_train_report(
        agg, "user_id", "slot_s", "v", n_lags=1, perm_n_repeats=5,
        regressor="rf", n_estimators=10, max_depth=5,
    )
    return out.select(
        "user_id", "feature",
        F.round("perm_importance", 4).alias("perm_importance"),
        F.round("r2", 4).alias("r2"),
        F.round("mae", 4).alias("mae"),
        "n_train", "n_test",
    )


def q_ml_optimize_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    from diive_spark.ml.gapfill import ml_optimize_params

    # param search is a per-deployment calibration, not a per-series
    # always-on stage — run it on a third of the series
    agg = _agg_30min(spark, sf_dir).filter(F.col("user_id") % 3 == 0)
    out = ml_optimize_params(
        agg, "user_id", "slot_s", "v",
        n_lags=1, n_splits=3,
    )
    return out.select(
        "user_id",
        "best_n_estimators",
        "best_max_depth",
        "best_min_samples_leaf",
        F.round("cv_neg_mse", 4).alias("cv_neg_mse"),
        "n_folds",
        F.round("test_mae", 4).alias("test_mae"),
        F.round("test_r2", 4).alias("test_r2"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "extract_text_roundtrip": q_extract_text_roundtrip,
    "ml_gapfill_30min": q_ml_gapfill_30min,
    "ml_gapfill_longterm": q_ml_gapfill_longterm,
    "ml_train_report": q_ml_train_report,
    "ml_train_report_rf": q_ml_train_report_rf,
    "ml_gapfill_rf": q_ml_gapfill_rf,
    "ml_gapfill_xgb": q_ml_gapfill_xgb,
    "ml_optimize_params": q_ml_optimize_params,
    "flag_lof": q_flag_lof,
    "flag_iforest": q_flag_iforest,
    "embedding_pca": q_embedding_pca,
    "gorilla_blocks": q_gorilla_blocks,
}

ORACLE_SQL: dict[str, str] = {
    "extract_text_roundtrip": SQL_EXTRACT_TEXT,
    # ml_gapfill_30min / flag_lof: kernel loops — rows-only check
}
