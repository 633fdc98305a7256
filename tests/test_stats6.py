"""queries_stats6 — CUSUM-of-squares / Bartels RVN / Good-Toulmin /
Hill numbers pinned against independent brute-force oracles at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from diive_spark.queries_stats2 import _OFF
from diive_spark.queries_stats6 import (
    _GT_K,
    q_bartels_rvn,
    q_cusum_squares,
    q_good_toulmin,
    q_hill_numbers,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").toPandas()


def _daily_counts(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    return Counter(zip(ev["event_type"], ev["day"]))


def test_cusum_squares_matches_loop(spark):
    out = {r["event_type"]: r for r in q_cusum_squares(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        cs = np.array([dd[d] for d in days], dtype=np.int64)
        n, s = len(cs), int(cs.sum())
        u = (n * cs - s) ** 2
        utot = int(u.sum())
        if utot <= 0:
            assert et not in out
            continue
        cum = np.cumsum(u)
        dev = np.abs(n * cum - np.arange(1, n + 1) * utot)
        mx = int(dev.max())
        break_day = min(d for d, dv in zip(days, dev) if dv == mx)
        row = out[et]
        assert row["n"] == n
        assert row["break_day"] == break_day
        assert row["excursion_e6"] == math.floor(mx / (n * utot) * 1e6 + _OFF)


def _avg_ranks(vals):
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals), dtype=float)
    sv = np.asarray(vals)[order]
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def test_bartels_rvn_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_bartels_rvn(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        cs = [dd[d] for d in days]
        n = len(cs)
        if n < 10:
            assert et not in out
            continue
        r = _avg_ranks(cs)
        num = np.sum(np.diff(r) ** 2)
        den = np.sum((r - r.mean()) ** 2)
        if den <= 0:
            assert et not in out
            continue
        rvn = num / den
        row = out[et]
        assert row["n"] == n
        assert row["num4"] == int(round(4 * num))
        assert abs(row["rvn_e4"] - math.floor(rvn * 10_000 + _OFF)) <= 1
        # randomness keeps RVN near 2
        assert 0 < row["rvn_e4"] < 40_000


def test_good_toulmin_matches_counter(spark):
    out = {r["lang"]: r for r in q_good_toulmin(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        cnt = Counter(w for t in grp["text"] for w in t.strip().split())
        spec = Counter(cnt.values())
        delta = sum(
            (1 if k % 2 == 1 else -1) * vk
            for k, vk in spec.items()
            if k <= _GT_K
        )
        row = out[lang]
        assert row["n"] == sum(cnt.values())
        assert row["v"] == len(cnt)
        assert row["delta_v"] == delta
        assert row["growth_e6"] == math.floor(
            delta / len(cnt) * 1_000_000 + _OFF
        )


def test_hill_numbers_matches_counter(spark):
    out = {r["lang"]: r for r in q_hill_numbers(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        cnt = Counter(w for t in grp["text"] for w in t.strip().split())
        n = sum(cnt.values())
        d0 = len(cnt)
        h = -sum(m / n * math.log(m / n) for m in cnt.values())
        d1 = math.exp(h)
        d2 = n * n / sum(m * m for m in cnt.values())
        row = out[lang]
        assert row["n"] == n and row["d0"] == d0
        assert abs(row["d1_e2"] - math.floor(d1 * 100 + 0.5)) <= 1
        assert abs(row["d2_e2"] - math.floor(d2 * 100 + 0.5)) <= 1
        # Hill ordering: D0 >= D1 >= D2
        assert row["d0"] * 100 >= row["d1_e2"] >= row["d2_e2"]
