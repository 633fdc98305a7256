"""queries_stats2 — seasonal MK / AR(1) / variance ratio / records /
lexical diversity / n-gram novelty pinned against independent numpy and
brute-force oracles at sf0.001 (the DuckDB twin is the cross-engine gate;
these pins prove the SEMANTICS, not just engine agreement)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pytest

from diive_spark.queries_stats2 import (
    _OFF,
    q_ar1_halflife,
    q_lexical_diversity,
    q_ngram_novelty,
    q_running_records,
    q_seasonal_mann_kendall,
    q_variance_ratio,
)

SF = "/root/testdata/sf0.001"


def _hourly_pd(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    df["t"] = (df["ts"].astype("int64") // 10**9 // 3600) * 3600
    g = df.groupby(["user_id", "t"])["value"].mean().reset_index()
    g["v"] = np.floor(g["value"] * 100 + _OFF)
    return g.sort_values(["user_id", "t"])


def _mk_s_var(v):
    """O(n^2) textbook MK S and tie-corrected var*18."""
    v = np.asarray(v, dtype=float)
    n = len(v)
    s = sum(
        int(np.sign(v[j] - v[i])) for i in range(n) for j in range(i + 1, n)
    )
    _, counts = np.unique(v, return_counts=True)
    tie = int(sum(c * (c - 1) * (2 * c + 5) for c in counts))
    v18 = n * (n - 1) * (2 * n + 5) - tie
    return s, v18


def test_seasonal_mk_matches_bruteforce(spark):
    out = {
        r["user_id"]: r
        for r in q_seasonal_mann_kendall(spark, SF).collect()
    }
    g = _hourly_pd(spark)
    g["season"] = (g["t"] // 3600 % 24) // 6
    for uid, grp in list(g.groupby("user_id"))[:8]:
        s_tot = v18_tot = n_tot = 0
        for _, sg in grp.groupby("season"):
            s, v18 = _mk_s_var(sg["v"].to_numpy())
            s_tot += s
            v18_tot += v18
            n_tot += len(sg)
        row = out[uid]
        assert row["n"] == n_tot
        assert row["s"] == s_tot
        assert row["var_s18"] == v18_tot
        if v18_tot > 0 and s_tot != 0:
            z = (s_tot - math.copysign(1, s_tot)) / math.sqrt(v18_tot / 18.0)
        else:
            z = 0.0
        assert row["z_e4"] == math.floor(z * 10_000 + _OFF)


def test_ar1_matches_numpy_corrcoef(spark):
    out = {r["user_id"]: r for r in q_ar1_halflife(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy()
        if len(v) < 3:
            continue
        x, y = v[:-1], v[1:]
        r = float(np.corrcoef(x, y)[0, 1])
        row = out[uid]
        assert row["n_pairs"] == len(x)
        assert abs(row["r1_e6"] - math.floor(r * 1e6 + _OFF)) <= 1
        if 0 < r < 1:
            hl = -math.log(2) / math.log(r)
            assert abs(row["halflife_h_e4"] - math.floor(hl * 1e4 + _OFF)) <= 1


def test_variance_ratio_matches_numpy(spark):
    out = {r["user_id"]: r for r in q_variance_ratio(spark, SF).collect()}
    g = _hourly_pd(spark)
    q = 24
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy()
        d1 = v[1:] - v[:-1]
        dq = v[q:] - v[:-q] if len(v) > q else np.array([])
        row = out[uid]
        assert row["n1"] == len(d1) and row["nq"] == len(dq)
        if len(dq) >= 2 and np.var(d1) > 0:
            vr = float(np.var(dq) / q / np.var(d1))
            assert abs(row["vr_e6"] - math.floor(vr * 1e6 + _OFF)) <= 1


def test_running_records_matches_pandas_cummax(spark):
    out = {r["user_id"]: r for r in q_running_records(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in g.groupby("user_id"):
        v = grp["v"].to_numpy()
        t = grp["t"].to_numpy()
        run = np.maximum.accumulate(v)
        rec = np.concatenate([[True], v[1:] > run[:-1]])
        row = out[uid]
        assert row["n_obs"] == len(v)
        assert row["n_records"] == int(rec.sum())
        assert row["last_record_t"] == int(t[rec][-1])
        assert row["max_v_e2"] == int(v.max())


_WORD = re.compile(r"[a-z0-9]+")


def test_lexical_diversity_matches_counter(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    out = {r["doc_id"]: r for r in q_lexical_diversity(spark, SF).collect()}
    assert len(out) == len(docs)
    for _, d in docs.head(40).iterrows():
        ct = Counter(_WORD.findall((d["text"] or "").lower()))
        n_tok = sum(ct.values())
        n_typ = len(ct)
        n_hap = sum(1 for c in ct.values() if c == 1)
        row = out[d["doc_id"]]
        assert (row["n_tokens"], row["n_types"], row["n_hapax"]) == (
            n_tok, n_typ, n_hap,
        )
        assert row["ttr_e6"] == math.floor(n_typ / max(n_tok, 1) * 1e6 + _OFF)


def test_ngram_novelty_matches_bruteforce(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
    )
    grams: dict[int, set] = {}
    for _, d in docs.iterrows():
        toks = _WORD.findall((d["text"] or "").lower())
        grams[d["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        }
    owner: dict[str, int] = {}
    for did in sorted(grams):
        for ng in grams[did]:
            owner.setdefault(ng, did)
    out = {r["doc_id"]: r for r in q_ngram_novelty(spark, SF).collect()}
    for did, gs in grams.items():
        if not gs:
            assert did not in out
            continue
        n_novel = sum(1 for ng in gs if owner[ng] == did)
        row = out[did]
        assert row["n_grams"] == len(gs)
        assert row["n_novel"] == n_novel
        assert row["novelty_e6"] == math.floor(
            n_novel / len(gs) * 1e6 + _OFF
        )


def test_variance_ratio_random_walk_near_one(spark):
    """Sanity: VR(q) of a pure random walk is ~1 (the statistic's defining
    property) — built directly, not via parquet."""
    rng = np.random.default_rng(3)
    steps = rng.choice([-100.0, 100.0], size=4000)
    v = np.cumsum(steps)
    rows = [(1, 3600 * i, float(x)) for i, x in enumerate(v)]
    df = spark.createDataFrame(rows, "user_id long, t long, v double")

    import diive_spark.queries_stats2 as m

    orig = m._hourly
    m._hourly = lambda s, d: df
    try:
        row = q_variance_ratio(spark, "ignored").collect()[0]
    finally:
        m._hourly = orig
    assert 0.8e6 < row["vr_e6"] < 1.2e6


def test_survival_km_matches_manual_product(spark):
    from diive_spark.queries_stats2 import q_survival_km

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr(
            "user_id", "event_type",
            "cast(unix_micros(cast(ts as timestamp)) / 86400000000 as long)"
            " as day",
        )
        .toPandas()
    )
    g = ev.groupby(["user_id", "event_type"])["day"].agg(["min", "max"])
    g["ud1"] = g.groupby(level=0)["max"].transform("max")
    g["life"] = g["max"] - g["min"]
    g["obs"] = (g["max"] <= g["ud1"] - 7).astype(int)
    subj = g[["life", "obs"]].reset_index(drop=True)
    out = q_survival_km(spark, SF).collect()
    s = 1.0
    exp_rows = []
    for t in sorted(subj["life"].unique()):
        n_risk = int((subj["life"] >= t).sum())
        d = int(subj[(subj["life"] == t) & (subj["obs"] == 1)].shape[0])
        s *= 1.0 - d / n_risk
        if d > 0:
            exp_rows.append((t, n_risk, d, s))
    assert len(out) == len(exp_rows)
    for row, (t, n_risk, d, s) in zip(out, exp_rows):
        assert (row["life_days"], row["n_risk"], row["n_events"]) == (
            t, n_risk, d,
        )
        assert abs(row["s_e6"] - math.floor(s * 1e6 + _OFF)) <= 1
    # monotone non-increasing survival
    ss = [r["s_e6"] for r in out]
    assert all(a >= b for a, b in zip(ss, ss[1:]))


def test_powerlaw_alpha_matches_numpy_mle(spark):
    from diive_spark.queries_stats2 import _PL_XMIN, q_powerlaw_alpha

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "text")
        .toPandas()
    )
    docs["x"] = docs["text"].map(
        lambda t: len(_WORD.findall((t or "").lower()))
    )
    out = {r["lang"]: r for r in q_powerlaw_alpha(spark, SF).collect()}
    for lang, grp in docs.groupby("lang"):
        x = grp["x"].to_numpy()
        tail = x[x >= _PL_XMIN].astype(float)
        if len(tail) == 0:
            assert lang not in out
            continue
        alpha = 1.0 + len(tail) / np.sum(np.log(tail / (_PL_XMIN - 0.5)))
        row = out[lang]
        assert row["n_tail"] == len(tail)
        assert abs(row["alpha_e4"] - math.floor(alpha * 1e4 + _OFF)) <= 1


def test_source_overlap_matches_bruteforce(spark):
    from diive_spark.queries_stats2 import q_source_overlap

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "text")
        .toPandas()
    )
    vocab: dict[str, set] = {}
    for _, d in docs.iterrows():
        toks = _WORD.findall((d["text"] or "").lower())
        vocab.setdefault(d["source"], set()).update(
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        )
    out = {
        (r["src_a"], r["src_b"]): r
        for r in q_source_overlap(spark, SF).collect()
    }
    srcs = sorted(vocab)
    n_pairs_with_overlap = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                assert (a, b) not in out
                continue
            n_pairs_with_overlap += 1
            row = out[(a, b)]
            assert row["n_a"] == len(vocab[a])
            assert row["n_b"] == len(vocab[b])
            assert row["n_both"] == inter
            union = len(vocab[a] | vocab[b])
            assert row["jaccard_e6"] == math.floor(inter / union * 1e6 + 0.5)
    assert len(out) == n_pairs_with_overlap


def test_markov_entropy_rate_matches_manual(spark):
    from diive_spark.queries_stats2 import q_markov_entropy_rate

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    pairs = Counter()
    for _, grp in ev.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            pairs[(a, b)] += 1
    tn = sum(pairs.values())
    rowtot = Counter()
    for (a, _), n in pairs.items():
        rowtot[a] += n
    h = -sum(n / tn * math.log(n / rowtot[a]) for (a, _), n in pairs.items())
    row = q_markov_entropy_rate(spark, SF).collect()[0]
    assert abs(row["h_rate_e4"] - math.floor(h * 1e4 + _OFF)) <= 1


def test_shewhart_imr_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_shewhart_imr

    out = {r["user_id"]: r for r in q_shewhart_imr(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in g.groupby("user_id"):
        v = grp["v"].to_numpy()
        t = grp["t"].to_numpy()
        if len(v) < 2:
            assert uid not in out
            continue
        mu = v.mean()
        mrbar = np.abs(np.diff(v)).mean()
        ucl, lcl = mu + 2.66 * mrbar, mu - 2.66 * mrbar
        bad = (v > ucl) | (v < lcl)
        row = out[uid]
        assert row["n"] == len(v)
        assert row["mu_e4"] == math.floor(mu * 1e4 + _OFF)
        assert row["ucl_e4"] == math.floor(ucl * 1e4 + _OFF)
        assert row["n_viol"] == int(bad.sum())
        if bad.any():
            assert row["first_viol_t"] == int(t[bad][0])
        else:
            assert row["first_viol_t"] is None


def test_ljung_box_matches_numpy(spark):
    from diive_spark.queries_stats2 import _LB_H, q_ljung_box

    out = {r["user_id"]: r for r in q_ljung_box(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy(dtype=float)
        n = len(v)
        if n <= _LB_H + 1:
            assert uid not in out
            continue
        vbar = v.mean()
        den = float(np.sum((v - vbar) ** 2))
        qstat = 0.0
        for k in range(1, _LB_H + 1):
            rk = float(np.sum((v[:-k] - vbar) * (v[k:] - vbar))) / den
            qstat += rk * rk / (n - k)
        qstat *= n * (n + 2)
        row = out[uid]
        assert row["n"] == n
        assert abs(row["q_e4"] - math.floor(qstat * 1e4 + _OFF)) <= 1


def test_ljung_box_white_noise_small_q(spark):
    """iid noise should give small Q (below the chi2_6 99% quantile ~16.8
    most of the time); a strongly autocorrelated series must exceed it."""
    import diive_spark.queries_stats2 as m
    from diive_spark.queries_stats2 import q_ljung_box

    rng = np.random.default_rng(5)
    noise = np.floor(rng.normal(0, 100, 600))
    trend = np.floor(np.cumsum(rng.normal(0, 30, 600)) + 1000)
    rows = [(1, 3600 * i, float(x)) for i, x in enumerate(noise)] + [
        (2, 3600 * i, float(x)) for i, x in enumerate(trend)
    ]
    df = spark.createDataFrame(rows, "user_id long, t long, v double")
    orig = m._hourly
    m._hourly = lambda s, d: df
    try:
        res = {r["user_id"]: r["q_e4"] for r in q_ljung_box(spark, "x").collect()}
    finally:
        m._hourly = orig
    assert res[1] < 30 * 10_000       # white noise: Q small
    assert res[2] > 100 * 10_000      # random walk: Q enormous


def test_anova_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_anova_event_types

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type", "value")
        .toPandas()
    )
    ev["v"] = np.floor(ev["value"] * 100 + _OFF)
    out = {r["user_id"]: r for r in q_anova_event_types(spark, SF).collect()}
    for uid, grp in list(ev.groupby("user_id"))[:8]:
        groups = [g["v"].to_numpy() for _, g in grp.groupby("event_type")]
        k, n = len(groups), len(grp)
        if k < 2 or n <= k:
            continue
        grand = grp["v"].mean()
        ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
        ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
        f = (ssb / (k - 1)) / (ssw / (n - k))
        row = out[uid]
        assert (row["n"], row["k"]) == (n, k)
        assert abs(row["f_e4"] - math.floor(f * 1e4 + _OFF)) <= 1


def test_chisq_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_chisq_type_hour

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("user_id", "event_type", "cast(hour(ts) / 6 as long) blk")
        .toPandas()
    )
    out = {r["user_id"]: r for r in q_chisq_type_hour(spark, SF).collect()}
    for uid, grp in list(ev.groupby("user_id"))[:8]:
        ct = grp.groupby(["event_type", "blk"]).size()
        n = len(grp)
        rows = ct.groupby(level=0).sum()
        cols = ct.groupby(level=1).sum()
        chi2 = 0.0
        for (etype, blk), o in ct.items():
            e = rows[etype] * cols[blk] / n
            chi2 += (o - e) ** 2 / e
        row = out[uid]
        assert row["n"] == n
        assert row["n_cells"] == len(ct)
        assert abs(row["chi2_e4"] - math.floor(chi2 * 1e4 + _OFF)) <= 1


def test_spearman_matches_scipy_formula(spark):
    from diive_spark.queries_stats2 import q_spearman_daily

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    d = (
        ev.groupby(["user_id", "day"])["value"]
        .agg(cnt="count", mean="mean")
        .reset_index()
    )
    d["m"] = np.floor(d["mean"] * 100 + _OFF)
    out = {r["user_id"]: r for r in q_spearman_daily(spark, SF).collect()}
    import pandas as pd

    for uid, grp in list(d.groupby("user_id"))[:10]:
        if len(grp) < 3:
            assert uid not in out
            continue
        rx = pd.Series(grp["cnt"]).rank(method="average").to_numpy()
        ry = pd.Series(grp["m"]).rank(method="average").to_numpy()
        if np.var(rx) == 0 or np.var(ry) == 0:
            assert out[uid]["rho_e6"] is None
            continue
        rho = float(np.corrcoef(rx, ry)[0, 1])
        row = out[uid]
        assert row["n_days"] == len(grp)
        assert abs(row["rho_e6"] - math.floor(rho * 1e6 + _OFF)) <= 1


def test_heaps_law_matches_numpy_regression(spark):
    from diive_spark.queries_stats2 import q_heaps_law

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "text")
        .toPandas()
    )
    docs["n_tok"] = docs["text"].map(
        lambda t: len(_WORD.findall((t or "").lower()))
    )
    docs["n_typ"] = docs["text"].map(
        lambda t: len(set(_WORD.findall((t or "").lower())))
    )
    d = docs[(docs["n_tok"] >= 10) & (docs["n_typ"] >= 2)]
    out = {r["lang"]: r for r in q_heaps_law(spark, SF).collect()}
    for lang, grp in d.groupby("lang"):
        x = np.log(grp["n_tok"].to_numpy(dtype=float))
        y = np.log(grp["n_typ"].to_numpy(dtype=float))
        beta, lnk = np.polyfit(x, y, 1)
        row = out[lang]
        assert row["n_docs"] == len(grp)
        assert abs(row["beta_e4"] - math.floor(beta * 1e4 + _OFF)) <= 1
        assert abs(row["k_e2"] - math.floor(math.exp(lnk) * 100 + _OFF)) <= 1
        # Heaps exponent must be sublinear
        assert 0 < row["beta_e4"] < 10_000


def test_ewma_control_matches_numpy(spark):
    from diive_spark.queries_stats2 import (
        _EC_DECAY, _EC_K, _EC_L, q_ewma_control,
    )

    out = {r["user_id"]: r for r in q_ewma_control(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy(dtype=float)
        t = grp["t"].to_numpy()
        n = len(v)
        mu = v.mean()
        sigma = math.sqrt(((v - mu) ** 2).mean())
        alarms = []
        for i in range(n):
            m = min(i + 1, _EC_K)
            wts = np.array([_EC_DECAY**j for j in range(m)])
            window = v[max(0, i - m + 1) : i + 1][::-1]
            z = float((window * wts).sum() / wts.sum())
            fac = math.sqrt((wts**2).sum()) / wts.sum()
            alarms.append(abs(z - mu) > _EC_L * sigma * fac)
        row = out[uid]
        assert row["n"] == n
        assert row["n_alarms"] == int(sum(alarms))
        if any(alarms):
            assert row["first_alarm_t"] == int(t[np.argmax(alarms)])


def test_tukey_fences_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_tukey_fences

    out = {r["user_id"]: r for r in q_tukey_fences(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in g.groupby("user_id"):
        v = np.sort(grp["v"].to_numpy())
        n = len(v)
        q1 = v[math.ceil(n * 0.25) - 1]
        q3 = v[math.ceil(n * 0.75) - 1]
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        row = out[uid]
        assert (row["q1_e2"], row["q3_e2"]) == (int(q1), int(q3))
        assert row["n"] == n
        assert row["n_outliers"] == int(((v < lo) | (v > hi)).sum())


def test_trimmed_stats_matches_scipy_conventions(spark):
    from diive_spark.queries_stats2 import q_trimmed_stats

    out = {r["user_id"]: r for r in q_trimmed_stats(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in g.groupby("user_id"):
        v = np.sort(grp["v"].to_numpy())
        n = len(v)
        k = int(math.floor(n * 0.1))
        core = v[k : n - k]
        tm = core.mean()
        wv = v.copy()
        wv[:k] = v[k]
        wv[n - k :] = v[n - k - 1]
        wm = wv.mean()
        row = out[uid]
        assert row["n_trim"] == k
        assert abs(row["trimmed_e4"] - math.floor(tm * 1e4 + _OFF)) <= 1
        assert abs(row["winsor_e4"] - math.floor(wm * 1e4 + _OFF)) <= 1


def test_kendall_tau_matches_bruteforce(spark):
    from diive_spark.queries_stats2 import q_kendall_tau

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    d = (
        ev.groupby(["user_id", "day"])["value"]
        .agg(x="count", mean="mean")
        .reset_index()
    )
    d["y"] = np.floor(d["mean"] * 100 + _OFF)
    out = {r["user_id"]: r for r in q_kendall_tau(spark, SF).collect()}
    for uid, grp in list(d.groupby("user_id"))[:10]:
        xs = grp["x"].to_numpy()
        ys = grp["y"].to_numpy()
        n = len(xs)
        cmd = tx = ty = 0
        for i in range(n):
            for j in range(i + 1, n):
                cmd += int(np.sign(xs[j] - xs[i]) * np.sign(ys[j] - ys[i]))
                tx += int(xs[i] == xs[j])
                ty += int(ys[i] == ys[j])
        n0 = n * (n - 1) // 2
        if n0 <= tx or n0 <= ty:
            assert uid not in out
            continue
        tau = cmd / math.sqrt((n0 - tx) * (n0 - ty))
        row = out[uid]
        assert row["n_pairs"] == n0
        assert abs(row["tau_e6"] - math.floor(tau * 1e6 + _OFF)) <= 1


def test_quantile_norm_matches_pandas(spark):
    from diive_spark.queries_stats2 import q_quantile_norm

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .toPandas()
        .sort_values("doc_id")
    )
    pooled = docs.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    nt = len(pooled)
    out = {r["doc_id"]: r for r in q_quantile_norm(spark, SF).collect()}
    assert len(out) == nt
    for lang, grp in docs.groupby("lang"):
        g = grp.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        nl = len(g)
        for i, r in g.iterrows():
            p = i / max(nl - 1, 1)
            tgt = int(math.floor(p * (nt - 1)))
            expect = int(pooled.iloc[tgt]["n_chars"])
            row = out[r["doc_id"]]
            assert row["norm_score"] == expect
            assert row["score"] == r["n_chars"]
    # normalized scores preserve within-language ordering
    for lang, grp in docs.groupby("lang"):
        g = grp.sort_values(["n_chars", "doc_id"])
        norms = [out[d]["norm_score"] for d in g["doc_id"]]
        assert norms == sorted(norms)


def test_lang_jsd_matches_direct_formula(spark):
    from diive_spark.queries_stats2 import q_lang_jsd

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "text")
        .toPandas()
    )
    dists: dict[str, Counter] = {}
    for _, d in docs.iterrows():
        dists.setdefault(d["lang"], Counter()).update(
            _WORD.findall((d["text"] or "").lower())
        )
    probs = {
        lang: {w: c / sum(ct.values()) for w, c in ct.items()}
        for lang, ct in dists.items()
    }
    out = {(r["la"], r["lb"]): r for r in q_lang_jsd(spark, SF).collect()}
    langs = sorted(probs)
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            P, Q = probs[la], probs[lb]
            support = set(P) | set(Q)
            # direct: JSD = H(M) - (H(P)+H(Q))/2
            hm = -sum(
                ((P.get(w, 0) + Q.get(w, 0)) / 2)
                * math.log((P.get(w, 0) + Q.get(w, 0)) / 2)
                for w in support
            )
            hp = -sum(p * math.log(p) for p in P.values())
            hq = -sum(q * math.log(q) for q in Q.values())
            jsd = hm - (hp + hq) / 2
            row = out[(la, lb)]
            assert row["n_shared"] == len(set(P) & set(Q))
            assert abs(row["jsd_e6"] - math.floor(jsd * 1e6 + _OFF)) <= 1
            # JSD bounded by ln 2
            assert 0 <= row["jsd_e6"] <= math.log(2) * 1e6 + 1


def test_label_propagation_distributed_equals_cutover(spark):
    from diive_spark.text.graph import label_propagation

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy("doc_id")
    from pyspark.sql import functions as F

    edges = (
        docs.withColumn("_n", F.lead("source").over(w))
        .filter(F.col("_n").isNotNull())
        .select(F.col("source").alias("src"), F.col("_n").alias("dst"))
    )
    small = {
        r["node"]: r["label"]
        for r in label_propagation(edges, n_iter=4).collect()
    }
    dist = {
        r["node"]: r["label"]
        for r in label_propagation(
            edges, n_iter=4, small_graph_threshold=0
        ).collect()
    }
    assert small == dist
    assert len(small) > 0
    # labels are nodes of the same graph
    assert set(small.values()) <= set(small.keys())


def test_mutual_info_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_mutual_info

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("user_id", "event_type", "cast(hour(ts) / 6 as long) blk")
        .toPandas()
    )
    out = {r["user_id"]: r for r in q_mutual_info(spark, SF).collect()}
    for uid, grp in list(ev.groupby("user_id"))[:8]:
        ct = grp.groupby(["event_type", "blk"]).size()
        n = len(grp)
        rows = ct.groupby(level=0).sum()
        cols = ct.groupby(level=1).sum()
        mi = sum(
            (o / n) * math.log2(o * n / (rows[e] * cols[b]))
            for (e, b), o in ct.items()
        )
        row = out[uid]
        assert row["n"] == n
        assert abs(row["mi_e6"] - math.floor(mi * 1e6 + _OFF)) <= 1
        assert row["mi_e6"] >= -1  # MI is non-negative (floor noise aside)


def test_lpa_disjoint_cliques_form_two_communities(spark):
    from diive_spark.text.graph import label_propagation

    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    edges = spark.createDataFrame(tri1 + tri2, "src string, dst string")
    for thresh in (1_000_000, 0):  # cutover AND distributed paths
        lbl = {
            r["node"]: r["label"]
            for r in label_propagation(
                edges, n_iter=4, small_graph_threshold=thresh
            ).collect()
        }
        assert len({lbl["a"], lbl["b"], lbl["c"]}) == 1
        assert len({lbl["x"], lbl["y"], lbl["z"]}) == 1
        assert lbl["a"] != lbl["x"]


@pytest.mark.parametrize("parts", [1, 7])
def test_new_queries_partition_invariant(spark, parts):
    """Results must not depend on spark.sql.shuffle.partitions — catches
    order-dependent aggregation bugs in the exact-integer formulations."""
    from diive_spark.queries_stats2 import (
        q_kendall_tau, q_ljung_box, q_shewhart_imr, q_variance_ratio,
    )

    old = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = {}
    for fn in (q_variance_ratio, q_ljung_box, q_shewhart_imr, q_kendall_tau):
        baseline[fn.__name__] = sorted(
            tuple(r) for r in fn(spark, SF).collect()
        )
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        for fn in (
            q_variance_ratio, q_ljung_box, q_shewhart_imr, q_kendall_tau,
        ):
            got = sorted(tuple(r) for r in fn(spark, SF).collect())
            assert got == baseline[fn.__name__], fn.__name__
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_prewhitened_mk_matches_bruteforce(spark):
    from diive_spark.queries_stats2 import q_prewhitened_mk

    out = {r["user_id"]: r for r in q_prewhitened_mk(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:6]:
        v = grp["v"].to_numpy(dtype=float)
        if len(v) < 3:
            continue
        x, y = v[:-1], v[1:]
        npairs = len(x)
        den = (npairs * (x * x).sum() - x.sum() ** 2) * (
            npairs * (y * y).sum() - y.sum() ** 2
        )
        r = (
            (npairs * (x * y).sum() - x.sum() * y.sum()) / math.sqrt(den)
            if den > 0
            else 0.0
        )
        if abs(r) <= 1.96 / math.sqrt(npairs):
            r = 0.0
        vp = y - r * x
        s, v18 = _mk_s_var(vp)
        row = out[uid]
        assert row["n"] == len(vp)
        assert row["s"] == s
        assert row["var_s18"] == v18


def test_welch_t_matches_scipy_formula(spark):
    from diive_spark.queries_stats2 import q_welch_t

    out = {r["user_id"]: r for r in q_welch_t(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy(dtype=float)
        n = len(v)
        k = n // 2
        x, y = v[:k], v[k:]
        if len(x) < 2 or len(y) < 2:
            continue
        v1, v2 = x.var(ddof=1), y.var(ddof=1)
        se2 = v1 / len(x) + v2 / len(y)
        t = (x.mean() - y.mean()) / math.sqrt(se2)
        df = se2**2 / (
            (v1 / len(x)) ** 2 / (len(x) - 1)
            + (v2 / len(y)) ** 2 / (len(y) - 1)
        )
        row = out[uid]
        assert (row["n1"], row["n2"]) == (len(x), len(y))
        assert abs(row["t_e4"] - math.floor(t * 1e4 + _OFF)) <= 1
        assert abs(row["df_e2"] - math.floor(df * 100 + _OFF)) <= 1


def test_embedding_drift_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_embedding_drift

    df = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    out = {r["label"]: r for r in q_embedding_drift(spark, SF).collect()}
    mat = np.array([np.array(e, dtype=float) for e in df["embedding"]])
    gc = mat.mean(axis=0)
    for label, grp in df.groupby("label"):
        m = np.array([np.array(e, dtype=float) for e in grp["embedding"]])
        c = m.mean(axis=0)
        cos = float(c @ gc / (np.linalg.norm(c) * np.linalg.norm(gc)))
        row = out[label]
        assert row["n_vecs"] == len(grp)
        assert abs(row["cos_e6"] - math.floor(cos * 1e6 + _OFF)) <= 2


def test_ts_strength_matches_manual_decompose(spark):
    from diive_spark.queries_stats2 import q_ts_strength

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["ts_s"] = (ev["ts"].astype("int64") // 10**9 // 3600) * 3600
    h = (
        ev.groupby(["event_type", "ts_s"])["value"]
        .mean()
        .round(4)
        .reset_index(name="y")
    )
    out = {r["event_type"]: r for r in q_ts_strength(spark, SF).collect()}
    for etype, grp in h.groupby("event_type"):
        g = grp.sort_values("ts_s").reset_index(drop=True)
        y = g["y"].to_numpy()
        n = len(y)
        trend = np.full(n, np.nan)
        for i in range(12, n - 12):
            w = y[i - 12 : i + 13]
            trend[i] = (w.sum() - 0.5 * y[i - 12] - 0.5 * y[i + 12]) / 24.0
        phase = (g["ts_s"].to_numpy() // 3600) % 24
        det = y - trend
        sraw = np.full(n, np.nan)
        means = {}
        for ph in np.unique(phase):
            means[ph] = np.nanmean(det[phase == ph])
        grand = np.mean(list(means.values()))
        seasonal = np.array([means[p] - grand for p in phase])
        resid = y - trend - seasonal
        keep = ~np.isnan(trend)
        vr = np.var(resid[keep])
        vtr = np.var((trend + resid)[keep])
        vsr = np.var((seasonal + resid)[keep])
        if vtr <= 0 or vsr <= 0:
            assert etype not in out
            continue
        ft = max(0.0, 1 - vr / vtr)
        fs = max(0.0, 1 - vr / vsr)
        row = out[etype]
        assert row["n"] == int(keep.sum())
        assert abs(row["f_trend_e4"] - math.floor(ft * 1e4 + _OFF)) <= 1
        assert abs(row["f_seas_e4"] - math.floor(fs * 1e4 + _OFF)) <= 1
        assert 0 <= row["f_trend_e4"] <= 10_000
        assert 0 <= row["f_seas_e4"] <= 10_000


def test_ts_stability_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_ts_stability

    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["ts_s"] = (ev["ts"].astype("int64") // 10**9 // 3600) * 3600
    h = (
        ev.groupby(["event_type", "ts_s"])["value"]
        .mean()
        .round(4)
        .reset_index(name="y")
    )
    h["tile"] = h["ts_s"] // 86400
    out = {r["event_type"]: r for r in q_ts_stability(spark, SF).collect()}
    for etype, grp in h.groupby("event_type"):
        ms, s2s = [], []
        for _, tg in grp.groupby("tile"):
            if len(tg) >= 12:
                ms.append(tg["y"].mean())
                s2s.append(tg["y"].var(ddof=0))
        if len(ms) < 2:
            assert etype not in out
            continue
        row = out[etype]
        assert row["n_tiles"] == len(ms)
        assert abs(
            row["stability_e4"] - math.floor(np.var(ms) * 1e4 + _OFF)
        ) <= 1
        assert abs(
            row["lumpiness_e4"] - math.floor(np.var(s2s) * 1e4 + _OFF)
        ) <= 1


def test_ts_crossings_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_ts_crossings

    out = {r["user_id"]: r for r in q_ts_crossings(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:10]:
        v = grp["v"].to_numpy()
        n = len(v)
        med = np.sort(v)[(n - 1) // 2]
        abv = (v > med).astype(int)
        crossings = int((abv[1:] != abv[:-1]).sum())
        # decile via NTILE quota on (v, t) rank
        order = np.lexsort((grp["t"].to_numpy(), v))
        rnv = np.empty(n, dtype=int)
        rnv[order] = np.arange(1, n + 1)
        q, r = divmod(n, 10)
        big = (q + 1) * r
        dec = np.where(
            rnv <= big,
            np.ceil(rnv / (q + 1)),
            r + np.ceil((rnv - big) / max(q, 1)),
        ).astype(int)
        runs, best = 1, 1
        for i in range(1, n):
            runs = runs + 1 if dec[i] == dec[i - 1] else 1
            best = max(best, runs)
        row = out[uid]
        assert row["n"] == n
        assert row["crossing_points"] == crossings
        assert row["flat_spots"] == best


def test_ar2_yule_walker_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_ar2_yule_walker

    out = {r["user_id"]: r for r in q_ar2_yule_walker(spark, SF).collect()}
    g = _hourly_pd(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy(dtype=float)
        n = len(v)
        if n <= 4:
            continue
        vbar = v.mean()
        den = ((v - vbar) ** 2).sum()
        r1 = ((v[:-1] - vbar) * (v[1:] - vbar)).sum() / den
        r2 = ((v[:-2] - vbar) * (v[2:] - vbar)).sum() / den
        disc = 1 - r1 * r1
        row = out[uid]
        assert abs(row["r1_e6"] - math.floor(r1 * 1e6 + _OFF)) <= 1
        assert abs(row["r2_e6"] - math.floor(r2 * 1e6 + _OFF)) <= 1
        if disc > 0:
            phi1 = r1 * (1 - r2) / disc
            phi2 = (r2 - r1 * r1) / disc
            assert abs(row["phi1_e6"] - math.floor(phi1 * 1e6 + _OFF)) <= 1
            assert abs(row["phi2_e6"] - math.floor(phi2 * 1e6 + _OFF)) <= 1


def test_term_burstiness_matches_counter(spark):
    from diive_spark.queries_stats2 import q_term_burstiness

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    df_ct, tf_ct, df2_ct = Counter(), Counter(), Counter()
    for _, d in docs.iterrows():
        ct = Counter(_WORD.findall((d["text"] or "").lower()))
        for w, c in ct.items():
            df_ct[w] += 1
            tf_ct[w] += c
            if c >= 2:
                df2_ct[w] += 1
    out = {r["w"]: r for r in q_term_burstiness(spark, SF).collect()}
    expect = {w for w, c in df_ct.items() if c >= 20}
    assert set(out) == expect
    for w in expect:
        row = out[w]
        assert row["df"] == df_ct[w]
        assert row["tf_total"] == tf_ct[w]
        assert row["p_repeat_e6"] == math.floor(
            df2_ct[w] / df_ct[w] * 1e6 + 0.5
        )
        assert row["extra_e6"] == math.floor(
            (tf_ct[w] - df_ct[w]) / df_ct[w] * 1e6 + 0.5
        )


def test_log_odds_terms_matches_numpy(spark):
    from diive_spark.queries_stats2 import q_log_odds_terms

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "text")
        .toPandas()
    )
    counts: dict[str, Counter] = {}
    for _, d in docs.iterrows():
        counts.setdefault(d["lang"], Counter()).update(
            _WORD.findall((d["text"] or "").lower())
        )
    gw = Counter()
    for ct in counts.values():
        gw.update(ct)
    gt = sum(gw.values())
    out = q_log_odds_terms(spark, SF).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        nl = sum(counts[lang].values())
        nr = gt - nl
        scored = []
        for w, g in gw.items():
            y = counts[lang].get(w, 0)
            a = g / gt * 500.0
            yr = g - y
            delta = math.log((y + a) / (nl + 500.0 - y - a)) - math.log(
                (yr + a) / (nr + 500.0 - yr - a)
            )
            z = delta / math.sqrt(1.0 / (y + a) + 1.0 / (yr + a))
            scored.append((-z, w))
        scored.sort()
        top5 = [w for _, w in scored[:5]]
        assert [r["w"] for r in sorted(rows, key=lambda r: r["rank"])] == top5
        for r in rows:
            zexp = -next(s for s, w in scored if w == r["w"])
            assert abs(r["z_e4"] - math.floor(zexp * 1e4 + _OFF)) <= 1


def test_vocab_richness_matches_counter(spark):
    from diive_spark.queries_stats2 import q_vocab_richness

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang", "text")
        .toPandas()
    )
    out = {r["lang"]: r for r in q_vocab_richness(spark, SF).collect()}
    by_lang: dict[str, Counter] = {}
    for _, d in docs.iterrows():
        by_lang.setdefault(d["lang"], Counter()).update(
            _WORD.findall((d["text"] or "").lower())
        )
    for lang, ct in by_lang.items():
        s_obs = len(ct)
        n = sum(ct.values())
        n1 = sum(1 for c in ct.values() if c == 1)
        n2 = sum(1 for c in ct.values() if c == 2)
        chao1 = s_obs + n1 * n1 / (2.0 * max(n2, 1))
        row = out[lang]
        assert (row["s_obs"], row["n_tokens"], row["n1"], row["n2"]) == (
            s_obs, n, n1, n2,
        )
        assert row["chao1_e2"] == math.floor(chao1 * 100 + 0.5)
        assert row["p0_e6"] == math.floor(n1 / n * 1e6 + 0.5)
        # Chao1 never below observed richness
        assert row["chao1_e2"] >= s_obs * 100
