"""Exactness pins for the round-4b spectral/robust operators:

* STOMP matrix profile vs an O(n^2 m) brute-force z-norm oracle
* Student-t quantile vs published t-table values; S-H-ESD recovers
  injected anomalies and stays silent on clean series
* Kleinberg burst Viterbi localizes an injected rate burst
* periodogram + ACF refinement recover known synthetic periods
* MinMaxLTTB == plain LTTB when preselection keeps every point
* Bloom decontamination: zero false negatives vs the exact join, FPR
  within theory
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators.burst import burst_kernel
from diive_spark.operators.esd import shesd_kernel, t_ppf
from diive_spark.operators.lttb import lttb_downsample, minmax_lttb
from diive_spark.operators.matrixprofile import matrix_profile_kernel, regrid
from diive_spark.operators.period import dominant_period_kernel


# ---------------------------------------------------------------------------
# matrix profile
# ---------------------------------------------------------------------------

def _mp_brute(y: np.ndarray, m: int) -> np.ndarray:
    n = len(y)
    k = n - m + 1
    excl = m // 2
    subs = [y[i : i + m] for i in range(k)]
    sig = [s.std() for s in subs]

    def zn(a):
        s = a.std()
        return np.zeros_like(a) if s < 1e-13 else (a - a.mean()) / s

    prof = np.full(k, np.inf)
    for i in range(k):
        for j in range(k):
            if abs(i - j) <= excl:
                continue
            if sig[i] < 1e-13 and sig[j] < 1e-13:
                d = 0.0
            elif sig[i] < 1e-13 or sig[j] < 1e-13:
                d = float(np.sqrt(m))
            else:
                d = float(np.linalg.norm(zn(subs[i]) - zn(subs[j])))
            prof[i] = min(prof[i], d)
    return prof


@pytest.mark.parametrize("n,m,inject", [(120, 12, None), (160, 17, "const"),
                                        (200, 12, "discord")])
def test_matrix_profile_vs_brute(n, m, inject):
    rng = np.random.default_rng(7)
    y = np.sin(np.arange(n) / 6.0) + rng.normal(0, 0.3, n)
    if inject == "const":
        y[40:70] = 2.25
    if inject == "discord":
        y[100:112] = 5.0
    prof, _ = matrix_profile_kernel(y, m)
    brute = _mp_brute(y, m)
    assert np.nanmax(np.abs(prof - brute)) < 1e-6
    assert int(np.argmax(prof)) == int(np.argmax(brute))


def test_regrid_fills_missing_slots():
    ts = np.array([0, 3600, 10800], dtype=np.int64)  # slot 2 missing
    t0, full = regrid(ts, np.array([1.0, 2.0, 4.0]), 3600, fill=None)
    assert t0 == 0 and len(full) == 4
    assert full[2] == 2.0  # median fill


# ---------------------------------------------------------------------------
# S-H-ESD
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "p,df,want",
    [(0.975, 10, 2.2281), (0.95, 5, 2.0150), (0.975, 1, 12.7062),
     (0.995, 25, 2.7874), (0.999, 30, 3.3852), (0.9, 2, 1.8856),
     (0.05, 5, -2.0150)],
)
def test_t_ppf_published_tables(p, df, want):
    assert abs(t_ppf(p, df) - want) < 2e-4


def test_shesd_recovers_injected_anomalies():
    rng = np.random.default_rng(3)
    n, period = 24 * 30, 24
    base = 10 + 3 * np.sin(2 * np.pi * np.arange(n) / period)
    y = base + rng.normal(0, 0.4, n)
    inj = [100, 333, 600]
    y[inj] += [8, -7, 9]
    idx = shesd_kernel(y, period, max_anoms=0.02, alpha=0.05)
    assert set(inj) <= set(idx.tolist())
    assert len(idx) <= 6


def test_shesd_clean_series_silent():
    rng = np.random.default_rng(4)
    n, period = 24 * 30, 24
    y = 10 + 3 * np.sin(2 * np.pi * np.arange(n) / period)
    y += rng.normal(0, 0.4, n)
    assert len(shesd_kernel(y, period, max_anoms=0.02, alpha=0.001)) == 0


# ---------------------------------------------------------------------------
# Kleinberg bursts
# ---------------------------------------------------------------------------

def test_burst_kernel_localizes_injected_burst():
    rng = np.random.default_rng(11)
    gaps = (
        list(rng.exponential(60, 300))
        + list(rng.exponential(5, 100))
        + list(rng.exponential(60, 300))
    )
    st = burst_kernel(np.cumsum(gaps))
    bi = np.where(st >= 1)[0]
    assert 280 <= bi.min() <= 310 and 390 <= bi.max() <= 410
    # homogeneous stream: silent
    st2 = burst_kernel(np.cumsum(rng.exponential(60, 500)))
    assert (st2 >= 1).sum() == 0


# ---------------------------------------------------------------------------
# period detection
# ---------------------------------------------------------------------------

def test_detect_period_daily_and_weekly():
    rng = np.random.default_rng(5)
    n = 24 * 60
    y = 5 * np.sin(2 * np.pi * np.arange(n) / 24) + rng.normal(0, 0.5, n)
    p, ap, pf = dominant_period_kernel(y, 3600.0)
    assert abs(p / 3600 - 24) < 0.5 and abs(ap / 3600 - 24) < 0.5
    assert pf > 0.5
    y = np.tile([1.0, 1, 1, 1, 1, 4, 4], 200) + rng.normal(0, 0.2, 7 * 200)
    p, ap, _ = dominant_period_kernel(y, 86400.0)
    assert abs(p / 86400 - 7) < 0.2 and abs(ap / 86400 - 7) < 0.2


# ---------------------------------------------------------------------------
# MinMaxLTTB
# ---------------------------------------------------------------------------

def _ts_df(spark, n_keys=3, n=400, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for k in range(n_keys):
        x = np.sort(rng.choice(10**6, n, replace=False))
        y = np.cumsum(rng.normal(0, 1, n))
        rows += [(k, int(xi), float(yi)) for xi, yi in zip(x, y)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "ts_s", "value"])
    )


def test_minmax_lttb_exact_when_preselect_keeps_all(spark):
    df = _ts_df(spark)
    plain = (
        lttb_downsample(df, "key", "ts_s", "value", n_out=40)
        .toPandas().sort_values(["key", "ts_s"]).reset_index(drop=True)
    )
    exact = (
        minmax_lttb(df, "key", "ts_s", "value", n_out=40, ratio=10**6)
        .toPandas().sort_values(["key", "ts_s"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, exact)


def test_minmax_lttb_default_ratio_shape(spark):
    df = _ts_df(spark)
    pdf = df.toPandas()
    out = minmax_lttb(df, "key", "ts_s", "value", n_out=40, ratio=4).toPandas()
    assert (out.groupby("key").size() == 40).all()
    # selection only — every output point exists in the input
    merged = out.merge(pdf, on=["key", "ts_s", "value"], how="left",
                       indicator=True)
    assert (merged["_merge"] == "both").all()
    for k, sub in pdf.groupby("key"):
        o = out[out.key == k]
        assert o.ts_s.min() == sub.ts_s.min()
        assert o.ts_s.max() == sub.ts_s.max()


# ---------------------------------------------------------------------------
# Bloom decontamination
# ---------------------------------------------------------------------------

def test_bloom_superset_of_exact_and_fpr(spark, sf_dir):
    from diive_spark.text.bloom import bloom_decontaminate
    from diive_spark.text.curation import decontaminate_ngram

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    exact = (
        decontaminate_ngram(corpus, bench, k=3, min_hits=1)
        .select("doc_id", F.col("contaminated").alias("c_exact"))
    )
    bloom = bloom_decontaminate(
        corpus, bench, k=3, m_bits=1 << 16, k_hashes=4
    ).select("doc_id", F.col("contaminated").alias("c_bloom"))
    j = exact.join(bloom, "doc_id").toPandas()
    # Bloom guarantee: no false negatives, ever
    assert ((j.c_exact == 1) & (j.c_bloom == 0)).sum() == 0
    clean = j[j.c_exact == 0]
    if len(clean) >= 20:
        assert (clean.c_bloom == 1).mean() < 0.25  # generous FPR ceiling


def test_bloom_fpr_matches_theory():
    """Pure-numpy replica of the probe math on random 60-bit hashes:
    members always hit; non-member FPR within 3x of (1-e^{-kn/m})^k."""
    rng = np.random.default_rng(9)
    m, k = 1 << 14, 4
    members = rng.integers(0, 1 << 60, 1500, dtype=np.int64)
    bitmap = np.zeros((m + 31) // 32, dtype=np.int64)
    for h in members:
        h1, h2 = h % m, (h >> 30) | 1
        for i in range(k):
            p = (h1 + i * h2) % m
            bitmap[p >> 5] |= np.int64(1) << np.int64(p & 31)

    def probe(h):
        h1, h2 = h % m, (h >> 30) | 1
        return all(
            (bitmap[(p := (h1 + i * h2) % m) >> 5] >> np.int64(p & 31)) & 1
            for i in range(k)
        )

    assert all(probe(h) for h in members)
    others = rng.integers(0, 1 << 60, 4000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    fpr = np.mean([probe(h) for h in others])
    theory = (1 - np.exp(-k * len(members) / m)) ** k
    assert fpr <= 3 * theory + 0.002
