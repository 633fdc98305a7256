"""queries_stats3 — concentration / dispersion / randomness / mixing /
forecast-scoring queries pinned against independent numpy + pandas
oracles at sf0.001 (the DuckDB twin is the cross-engine gate; these
pins prove the SEMANTICS, not just engine agreement)."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from diive_spark.queries_stats2 import _OFF
from diive_spark.queries_stats3 import (
    q_degree_assortativity,
    q_forecast_mase,
    q_poisson_dispersion,
    q_runs_test,
    q_source_hhi,
    q_turning_points,
)

SF = "/root/testdata/sf0.001"


def _hourly_pd(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    df["t"] = (df["ts"].astype("int64") // 10**9 // 3600) * 3600
    g = df.groupby(["user_id", "t"])["value"].mean().reset_index()
    g["v"] = np.floor(g["value"] * 100 + _OFF)
    return g.sort_values(["user_id", "t"])


def test_source_hhi_matches_counter(spark):
    out = {r["lang"]: r for r in q_source_hhi(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    for lang, grp in docs.groupby("lang"):
        counts = Counter(grp["source"])
        n = sum(counts.values())
        ss = sum(c * c for c in counts.values())
        sp = sum(c * (c - 1) for c in counts.values())
        hhi = ss / (n * n)
        simpson = 1.0 - sp / (n * (n - 1))
        row = out[lang]
        assert row["n_sources"] == len(counts)
        assert row["n_docs"] == n
        assert row["hhi_e6"] == math.floor(hhi * 1e6 + _OFF)
        assert row["simpson_e6"] == math.floor(simpson * 1e6 + _OFF)
        assert row["eff_sources_e2"] == math.floor(1.0 / hhi * 100 + _OFF)
        # effective sources can never exceed observed sources
        assert row["eff_sources_e2"] <= len(counts) * 100


def test_poisson_dispersion_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_poisson_dispersion(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["hr"] = ev["ts"].astype("int64") // 10**9 // 3600
    for et, grp in ev.groupby("event_type"):
        c = grp.groupby("hr").size().to_numpy(dtype=float)
        n = len(c)
        mean = c.sum() / n
        var = (np.sum(c * c) - c.sum() ** 2 / n) / (n - 1)
        disp = var / mean
        row = out[et]
        assert row["n"] == n
        assert row["n_events"] == int(c.sum())
        assert abs(row["dispersion_e6"] - math.floor(disp * 1e6 + _OFF)) <= 1
        assert abs(row["chi2_e4"] - math.floor((n - 1) * disp * 1e4 + _OFF)) <= 1


def test_turning_points_matches_loop(spark):
    out = {r["user_id"]: r for r in q_turning_points(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:10]:
        v = grp["v"].to_numpy()
        n = len(v)
        t = sum(
            1
            for i in range(1, n - 1)
            if (v[i - 1] < v[i] and v[i + 1] < v[i])
            or (v[i - 1] > v[i] and v[i + 1] > v[i])
        )
        e = 2.0 * (n - 2) / 3.0
        var = (16.0 * n - 29.0) / 90.0
        z = (t - e) / math.sqrt(var)
        row = out[uid]
        assert row["n"] == n
        assert row["t_pts"] == t
        assert abs(row["z_e4"] - math.floor(z * 1e4 + _OFF)) <= 1


def test_runs_test_matches_loop(spark):
    out = {r["user_id"]: r for r in q_runs_test(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:10]:
        v = grp["v"].to_numpy()
        med = np.sort(v)[(len(v) - 1) // 2]
        s = v[v != med]
        abv = (s > med).astype(int)
        n1 = int(abv.sum())
        n2 = len(abv) - n1
        runs = 1 + int(np.sum(abv[1:] != abv[:-1]))
        if n1 == 0 or n2 == 0 or n1 + n2 < 10:
            assert uid not in out
            continue
        n = n1 + n2
        mu = 1.0 + 2.0 * n1 * n2 / n
        sig2 = (2.0 * n1 * n2) * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
        z = (runs - mu) / math.sqrt(sig2)
        row = out[uid]
        assert (row["n1"], row["n2"], row["runs"]) == (n1, n2, runs)
        assert abs(row["z_e4"] - math.floor(z * 1e4 + _OFF)) <= 1


def _und_edges(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .toPandas()
        .sort_values(["lang", "doc_id"])
    )
    edges = set()
    for _, grp in docs.groupby("lang"):
        src = grp["source"].tolist()
        for a, b in zip(src, src[1:]):
            if a != b:
                edges.add((min(a, b), max(a, b)))
    return edges


def test_degree_assortativity_matches_numpy(spark):
    row = q_degree_assortativity(spark, SF).collect()[0]
    edges = _und_edges(spark)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    x = np.array(xs, dtype=float)
    y = np.array(ys, dtype=float)
    m2 = len(x)
    num = m2 * np.sum(x * y) - np.sum(x) ** 2
    den = m2 * np.sum(x * x) - np.sum(x) ** 2
    assert row["m_edges"] == len(edges)
    if den != 0:
        assert abs(row["assortativity_e6"] - math.floor(num / den * 1e6 + _OFF)) <= 1
        # correlation bound
        assert -1_000_001 <= row["assortativity_e6"] <= 1_000_001


def test_forecast_mase_matches_pandas(spark):
    out = {r["user_id"]: r for r in q_forecast_mase(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:10]:
        v = grp["v"].to_numpy()
        n = len(v)
        if n < 72:
            assert uid not in out
            continue
        train, test = v[: n - 24], v[n - 24 :]
        lag24 = v[n - 48 : n - 24]
        insample = np.abs(train[24:] - train[:-24])
        if insample.sum() == 0:
            assert uid not in out
            continue
        scale = insample.mean()
        mase_sn = np.abs(test - lag24).mean() / scale
        mase_nv = np.abs(test - train[-1]).mean() / scale
        mean = train.sum() / len(train)
        mase_mn = np.abs(test - mean).mean() / scale
        row = out[uid]
        assert row["n"] == n
        assert abs(row["mase_snaive_e4"] - math.floor(mase_sn * 1e4 + _OFF)) <= 1
        assert abs(row["mase_naive_e4"] - math.floor(mase_nv * 1e4 + _OFF)) <= 1
        assert abs(row["mase_mean_e4"] - math.floor(mase_mn * 1e4 + _OFF)) <= 1


def test_turning_points_random_series_near_zero_z():
    """Property: on IID uniform data the turning-point z is near 0."""
    rng = np.random.default_rng(7)
    v = rng.integers(0, 10**6, size=5000).astype(float)
    n = len(v)
    t = sum(
        1
        for i in range(1, n - 1)
        if (v[i - 1] < v[i] and v[i + 1] < v[i])
        or (v[i - 1] > v[i] and v[i + 1] > v[i])
    )
    z = (t - 2.0 * (n - 2) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    assert abs(z) < 3.5


def test_spectral_entropy_matches_numpy(spark):
    from diive_spark.queries_stats3 import _SE_PERIODS, q_spectral_entropy

    out = {r["user_id"]: r for r in q_spectral_entropy(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        hr = (grp["t"] // 3600).to_numpy()
        v = grp["v"].to_numpy(dtype=float)
        dy = v - v.mean()
        powers = []
        for p in _SE_PERIODS:
            th = 2 * np.pi * (hr % p) / p
            powers.append(
                np.sum(dy * np.cos(th)) ** 2 + np.sum(dy * np.sin(th)) ** 2
            )
        pw = np.array(powers)
        if pw.sum() == 0:
            assert uid not in out
            continue
        pr = pw / pw.sum()
        pr = pr[pr > 0]
        ent = -np.sum(pr * np.log(pr)) / math.log(len(_SE_PERIODS))
        row = out[uid]
        assert row["n"] == len(v)
        assert abs(row["spec_entropy_e4"] - math.floor(ent * 1e4 + 0.5)) <= 1
        assert 0 <= row["spec_entropy_e4"] <= 10_001


def test_clustering_coefficient_matches_bruteforce(spark):
    from diive_spark.queries_stats3 import q_clustering_coefficient

    out = {r["node"]: r for r in q_clustering_coefficient(spark, SF).collect()}
    edges = _und_edges(spark)
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for node, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            assert node not in out
            continue
        t = sum(
            1
            for x in nbrs
            for y in nbrs
            if x < y and y in adj.get(x, ())
        )
        row = out[node]
        assert row["deg"] == d
        assert row["n_tri"] == t
        assert row["clustering_e6"] == math.floor(
            2.0 * t / (d * (d - 1)) * 1e6 + _OFF
        )


def test_kcore_2_six_rounds_is_fixpoint(spark):
    """The fixed-6-round contract equals the true peeling fixpoint at
    test scale, and the result is the maximal 2-core (every node has
    degree >= 2 inside it)."""
    from diive_spark.queries_stats3 import q_kcore_2

    out = {r["node"]: r["deg"] for r in q_kcore_2(spark, SF).collect()}
    edges = set(_und_edges(spark))
    # peel to TRUE fixpoint
    while True:
        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        drop = {n for n, d in deg.items() if d < 2}
        if not drop:
            break
        edges = {(a, b) for a, b in edges if a not in drop and b not in drop}
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    assert out == dict(deg)
    assert all(d >= 2 for d in out.values())


def test_granger_matches_numpy_ols(spark):
    from diive_spark.queries_stats3 import q_granger_causality

    out = {(r["ta"], r["tb"]): r for r in q_granger_causality(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["hr"] = ev["ts"].astype("int64") // 10**9 // 3600
    hrs = np.sort(ev["hr"].unique())
    types = sorted(ev["event_type"].unique())
    series = {
        t: ev[ev["event_type"] == t].groupby("hr").size().reindex(hrs, fill_value=0)
        for t in types
    }
    for ta in types:
        for tb in types:
            if ta == tb:
                continue
            y = series[ta].to_numpy(dtype=float)
            x = series[tb].to_numpy(dtype=float)
            Y, Y1, X1 = y[1:], y[:-1], x[:-1]
            n = len(Y)
            # restricted OLS: Y ~ [1, Y1]
            A = np.column_stack([np.ones(n), Y1])
            rss_r = np.sum((Y - A @ np.linalg.lstsq(A, Y, rcond=None)[0]) ** 2)
            B = np.column_stack([np.ones(n), Y1, X1])
            rss_u = np.sum((Y - B @ np.linalg.lstsq(B, Y, rcond=None)[0]) ** 2)
            f = (rss_r - rss_u) * (n - 3) / rss_u
            row = out[(ta, tb)]
            assert row["n"] == n
            assert abs(row["rss_r_e4"] / 1e4 - rss_r) < max(1e-3, rss_r * 1e-7)
            assert abs(row["rss_u_e4"] / 1e4 - rss_u) < max(1e-3, rss_u * 1e-7)
            assert abs(row["f_e4"] / 1e4 - f) < max(1e-3, abs(f) * 1e-5)


def test_gumbel_matches_numpy(spark):
    from diive_spark.queries_stats3 import (
        _EULER_GAMMA,
        _GUMBEL_C,
        _GUMBEL_RL,
        q_gumbel_maxima,
    )

    out = {r["user_id"]: r for r in q_gumbel_maxima(spark, SF).collect()}
    g = _hourly_pd(spark)
    g["day"] = g["t"] // 86400
    for uid, grp in list(g.groupby("user_id"))[:10]:
        mx = grp.groupby("day")["v"].max().to_numpy(dtype=float)
        n = len(mx)
        if n < 5 or mx.std(ddof=1) == 0:
            assert uid not in out
            continue
        s = mx.std(ddof=1)
        beta = s * _GUMBEL_C
        mu = mx.mean() - _EULER_GAMMA * beta
        rl = mu - beta * _GUMBEL_RL
        row = out[uid]
        assert row["n_days"] == n
        assert abs(row["mu_e2"] - math.floor(mu * 100 + _OFF)) <= 1
        assert abs(row["beta_e2"] - math.floor(beta * 100 + _OFF)) <= 1
        assert abs(row["rl30_e2"] - math.floor(rl * 100 + _OFF)) <= 1
        # the 30-day return level sits above the location parameter
        assert row["rl30_e2"] > row["mu_e2"]


def test_wasserstein_matches_scipy_formula(spark):
    from diive_spark.queries_stats3 import q_wasserstein_doclen

    out = {
        (r["la"], r["lb"]): r for r in q_wasserstein_doclen(spark, SF).collect()
    }
    docs = _docs_pd(spark)
    langs = sorted(docs["lang"].unique())
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            a = np.sort(docs[docs["lang"] == la]["n_chars"].to_numpy())
            b = np.sort(docs[docs["lang"] == lb]["n_chars"].to_numpy())
            # brute W1 on the union support
            support = np.unique(np.concatenate([a, b]))
            fa = np.searchsorted(a, support, side="right") / len(a)
            fb = np.searchsorted(b, support, side="right") / len(b)
            gaps = np.diff(support)
            w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * gaps))
            row = out[(la, lb)]
            assert (row["n_a"], row["n_b"]) == (len(a), len(b))
            assert abs(row["w1_e4"] - math.floor(w1 * 1e4 + _OFF)) <= 1


def _docs_pd(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").toPandas()


def test_mann_whitney_matches_scipy_formula(spark):
    from diive_spark.queries_stats3 import q_mann_whitney_daynight

    out = {r["user_id"]: r for r in q_mann_whitney_daynight(spark, SF).collect()}
    g = _hourly_pd(spark)
    g["is_day"] = ((g["t"] // 3600 % 24 >= 6) & (g["t"] // 3600 % 24 < 18))
    import pandas as pd

    for uid, grp in list(g.groupby("user_id"))[:10]:
        v = grp["v"].to_numpy()
        day = grp["is_day"].to_numpy()
        n1, n2 = int(day.sum()), int((~day).sum())
        ranks = pd.Series(v).rank(method="average").to_numpy()
        r1 = ranks[day].sum()
        u1 = r1 - n1 * (n1 + 1) / 2
        n = n1 + n2
        _, counts = np.unique(v, return_counts=True)
        tie3 = float(np.sum(counts**3 - counts))
        sig2 = n1 * n2 / 12 * ((n + 1) - tie3 / (n * (n - 1)))
        if n1 < 5 or n2 < 5 or sig2 <= 0:
            assert uid not in out
            continue
        z = (u1 - n1 * n2 / 2) / math.sqrt(sig2)
        row = out[uid]
        assert (row["n1"], row["n2"]) == (n1, n2)
        assert row["u1_x2"] == int(round(2 * u1))
        assert abs(row["z_e4"] - math.floor(z * 1e4 + _OFF)) <= 1


def test_topk_churn_matches_counter(spark):
    from diive_spark.queries_stats3 import q_topk_churn

    out = {r["day"]: r for r in q_topk_churn(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    tops = {}
    for day, grp in ev.groupby("day"):
        c = grp.groupby("user_id").size().reset_index(name="c")
        c = c.sort_values(["c", "user_id"], ascending=[False, True])
        tops[day] = set(c.head(10)["user_id"])
    days = sorted(tops)
    for prev, cur in zip(days, days[1:]):
        if cur != prev + 1:
            assert cur not in out
            continue
        common = len(tops[cur] & tops[prev])
        jac = common / len(tops[cur] | tops[prev])
        row = out[cur]
        assert row["k"] == len(tops[cur])
        assert row["n_common"] == common
        assert row["jaccard_e6"] == math.floor(jac * 1e6 + _OFF)
