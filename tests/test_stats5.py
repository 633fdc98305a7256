"""queries_stats5 — McNemar / mean-excess / Taylor's law / Brown-Forsythe
pinned against independent brute-force oracles at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np

from diive_spark.queries_stats2 import _OFF
from diive_spark.queries_stats5 import (
    q_arch_lm,
    q_brier_decomposition,
    q_qq_slope,
    q_source_coherence,
    q_tail_coexceedance,
    q_lognormal_fit,
    q_nelson_aalen,
    q_retention_curve,
    q_user_concentration,
    q_source_lang_purity,
    q_split_half_reliability,
    q_staleness_quantiles,
    q_type_corr_matrix,
    q_cliffs_delta,
    q_hedges_g,
    q_ks_doclen,
    q_quantile_shape,
    q_robust_scale,
    q_span_leakage,
    q_streak_stats,
    q_wilson_ci,
    q_char_class_profile,
    q_diel_concentration,
    q_page_hinkley,
    q_sentence_length_quantiles,
    q_cochran_q,
    q_cramers_v,
    q_source_profile_cosine,
    q_theil_sen,
    q_durbin_watson,
    q_friedman_test,
    q_lexical_richness,
    q_wilcoxon_signed_rank,
    q_grubbs_test,
    q_jarque_bera,
    q_kruskal_wallis,
    _ME_QS,
    _TL_MIN_DAYS,
    q_levene_bf,
    q_mcnemar_labelers,
    q_mean_excess,
    q_taylor_law,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").toPandas()


def _labels(docs):
    """Recompute the kappa labeler pair with the low-median convention."""
    out = {}
    docs = docs.copy()
    toks = docs["text"].str.strip().str.split()
    docs["ttr_e6"] = [
        math.floor(len(set(t)) / len(t) * 1_000_000 + _OFF) for t in toks
    ]
    for lang, grp in docs.groupby("lang"):
        n = len(grp)
        med_len = sorted(grp["n_chars"])[(n - 1) // 2]
        med_ttr = sorted(grp["ttr_e6"])[(n - 1) // 2]
        a = (grp["n_chars"] > med_len).astype(int)
        b = (grp["ttr_e6"] > med_ttr).astype(int)
        out[lang] = (a.values, b.values)
    return out


def test_mcnemar_matches_counter(spark):
    out = {r["lang"]: r for r in q_mcnemar_labelers(spark, SF).collect()}
    for lang, (a, b) in _labels(_docs(spark)).items():
        n10 = int(((a == 1) & (b == 0)).sum())
        n01 = int(((a == 0) & (b == 1)).sum())
        if n10 + n01 == 0:
            assert lang not in out
            continue
        chi2 = (abs(n10 - n01) - 1) ** 2 / (n10 + n01)
        row = out[lang]
        assert row["n"] == len(a)
        assert row["n10"] == n10
        assert row["n01"] == n01
        assert row["chi2_e4"] == math.floor(chi2 * 10_000 + _OFF)


def test_mean_excess_matches_sorted(spark):
    out = {
        (r["lang"], r["q_pct"]): r for r in q_mean_excess(spark, SF).collect()
    }
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        xs = sorted(grp["n_chars"].astype(int))
        n = len(xs)
        for q in _ME_QS:
            u = xs[((n - 1) * q) // 100]  # rank is 1-based; index 0-based
            exc = [x - u for x in xs if x > u]
            if not exc:
                assert (lang, q) not in out
                continue
            row = out[(lang, q)]
            assert row["u"] == u
            assert row["n_exc"] == len(exc)
            assert row["s_exc"] == sum(exc)
            assert row["me_e4"] == math.floor(
                sum(exc) / len(exc) * 10_000 + _OFF
            )


def test_taylor_law_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_taylor_law(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    daily = Counter(zip(ev["event_type"], ev["day"]))
    weekly = defaultdict(list)
    for (et, day), c in daily.items():
        weekly[(et, day // 7)].append(c)
    pts = defaultdict(list)
    for (et, _wk), cs in weekly.items():
        if len(cs) < _TL_MIN_DAYS:
            continue
        nd, s1, s2 = len(cs), sum(cs), sum(c * c for c in cs)
        m_e2 = math.floor(s1 / nd * 100 + _OFF)
        v_e2 = math.floor((nd * s2 - s1 * s1) / (nd * (nd - 1)) * 100 + _OFF)
        if m_e2 > 0 and v_e2 > 0:
            pts[et].append((m_e2, v_e2))
    for et, pp in pts.items():
        if len(pp) < 3:
            assert et not in out
            continue
        x = np.log([p[0] for p in pp])
        y = np.log([p[1] for p in pp])
        b = np.polyfit(x, y, 1)[0]
        row = out[et]
        assert row["n_weeks"] == len(pp)
        assert abs(row["b_e4"] - math.floor(b * 10_000 + 0.5)) <= 1
    assert set(out) == {et for et, pp in pts.items() if len(pp) >= 3}


def test_taylor_exponent_plausible(spark):
    # fluctuation scaling for count processes lives in b ~ [0.5, 2.5];
    # sf0.001 has few weeks so allow wide small-sample noise
    for r in q_taylor_law(spark, SF).collect():
        assert -20_000 < r["b_e4"] < 60_000


def test_levene_bf_matches_numpy(spark):
    out = {r["user_id"]: r for r in q_levene_bf(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["v"] = [math.floor(v * 100 + _OFF) for v in ev["value"]]
    for uid, grp in ev.groupby("user_id"):
        groups = []
        for _et, g in grp.groupby("event_type"):
            vs = sorted(g["v"].astype(int))
            med = vs[(len(vs) - 1) // 2]
            groups.append([abs(v - med) for v in vs])
        k = len(groups)
        n = sum(len(g) for g in groups)
        if k < 2 or n <= k:
            assert uid not in out
            continue
        s = sum(sum(g) for g in groups)
        q = sum(sum(z * z for z in g) for g in groups)
        w = sum(sum(g) ** 2 / len(g) for g in groups)
        ssb = w - s * s / n
        ssw = q - w
        if ssw <= 0:
            assert uid not in out
            continue
        wstat = (ssb / (k - 1)) / (ssw / (n - k))
        row = out[int(uid)]
        assert row["n"] == n
        assert row["k"] == k
        assert abs(row["w_e4"] - math.floor(wstat * 10_000 + _OFF)) <= 1


def test_kruskal_wallis_matches_scipy_style(spark):
    out = {r["user_id"]: r for r in q_kruskal_wallis(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["v"] = [math.floor(v * 100 + _OFF) for v in ev["value"]]
    for uid, grp in ev.groupby("user_id"):
        vals = grp["v"].astype(int).values
        types = grp["event_type"].values
        n = len(vals)
        k = len(set(types))
        if k < 2:
            assert uid not in out
            continue
        # average ranks with ties
        order = np.argsort(vals, kind="stable")
        ranks = np.empty(n, dtype=float)
        sv = vals[order]
        i = 0
        while i < n:
            j = i
            while j < n and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        rr = 0.0
        for et in set(types):
            mask = types == et
            rr += ranks[mask].sum() ** 2 / mask.sum()
        h = 12.0 / (n * (n + 1)) * rr - 3 * (n + 1)
        cnt = Counter(vals)
        tsum = sum(t**3 - t for t in cnt.values())
        corr = 1.0 - tsum / (n**3 - n)
        if corr <= 0:
            assert uid not in out
            continue
        hc = h / corr
        row = out[int(uid)]
        assert row["n"] == n
        assert row["k"] == k
        assert row["tsum"] == tsum
        assert abs(row["h_e4"] - math.floor(hc * 10_000 + _OFF)) <= 1


def _daily_counts(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    return Counter(zip(ev["event_type"], ev["day"]))


def test_arch_lm_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_arch_lm(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        cs = np.array([dd[d] for d in days], dtype=np.int64)
        n, s = len(cs), cs.sum()
        u = (n * cs - s) ** 2
        # lag pairs only for CONSECUTIVE-in-sort-order rows (window lag)
        x = u[:-1].astype(float)
        y = u[1:].astype(float)
        m = len(x)
        if m < 5:
            assert et not in out
            continue
        r = np.corrcoef(x, y)[0, 1]
        lm = m * r * r
        row = out[et]
        assert row["m"] == m
        assert abs(row["lm_e4"] - math.floor(lm * 10_000 + 0.5)) <= 1


def test_jarque_bera_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_jarque_bera(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(list)
    for (et, _day), c in daily.items():
        per[et].append(c)
    for et, cs in per.items():
        x = np.array(cs, dtype=float)
        n = len(x)
        if n < 8:
            assert et not in out
            continue
        m2 = ((x - x.mean()) ** 2).mean()
        if m2 <= 0:
            assert et not in out
            continue
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
        row = out[et]
        assert row["n"] == n
        assert abs(row["skew_e4"] - math.floor(g1 * 10_000 + _OFF)) <= 1
        assert abs(row["exkurt_e4"] - math.floor(g2 * 10_000 + _OFF)) <= 1
        assert abs(row["jb_e4"] - math.floor(jb * 10_000 + _OFF)) <= 1


def test_grubbs_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_grubbs_test(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        cs = np.array([dd[d] for d in days], dtype=np.int64)
        n, s = len(cs), int(cs.sum())
        if n < 3:
            assert et not in out
            continue
        dev = np.abs(n * cs - s)
        maxdev = int(dev.max())
        out_day = min(d for d, dv in zip(days, dev) if dv == maxdev)
        q = int((cs.astype(object) ** 2).sum())
        var = (n * q - s * s) / (n * (n - 1))
        if var <= 0:
            assert et not in out
            continue
        g = maxdev / n / math.sqrt(var)
        row = out[et]
        assert row["n"] == n
        assert row["out_day"] == out_day
        assert row["dev"] == maxdev
        assert abs(row["g_e4"] - math.floor(g * 10_000 + _OFF)) <= 1


def test_lexical_richness_matches_counter(spark):
    out = {r["lang"]: r for r in q_lexical_richness(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        cnt = Counter(w for t in grp["text"] for w in t.strip().split())
        n = sum(cnt.values())
        v = len(cnt)
        v1 = sum(1 for m in cnt.values() if m == 1)
        v2 = sum(1 for m in cnt.values() if m == 2)
        s2 = sum(m * m for m in cnt.values())
        if v1 >= v or n <= 1:
            assert lang not in out
            continue
        yule_k = 10_000.0 * (s2 - n) / (n * n)
        sichel = v2 / v
        honore = 100.0 * math.log(n) / (1.0 - v1 / v)
        brunet = math.exp(math.log(n) * math.exp(-0.165 * math.log(v)))
        row = out[lang]
        assert (row["n"], row["v"], row["v1"], row["v2"]) == (n, v, v1, v2)
        assert row["yule_k_e4"] == math.floor(yule_k * 10_000 + _OFF)
        assert row["sichel_e6"] == math.floor(sichel * 1_000_000 + _OFF)
        assert abs(row["honore_e2"] - math.floor(honore * 100 + 0.5)) <= 1
        assert abs(row["brunet_e2"] - math.floor(brunet * 100 + 0.5)) <= 1


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


def test_wilcoxon_matches_numpy(spark):
    out = {
        r["event_type"]: r for r in q_wilcoxon_signed_rank(spark, SF).collect()
    }
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        ds = [
            dd[day + 7] - dd[day]
            for day in sorted(dd)
            if day + 7 in dd and dd[day + 7] != dd[day]
        ]
        n = len(ds)
        if n < 5:
            assert et not in out
            continue
        ad = np.abs(ds)
        ranks = _avg_ranks(ad)
        wplus = sum(r for r, d in zip(ranks, ds) if d > 0)
        tcnt = Counter(ad)
        tsum = sum(t**3 - t for t in tcnt.values())
        var = n * (n + 1) * (2 * n + 1) / 24.0 - tsum / 48.0
        if var <= 0:
            assert et not in out
            continue
        z = (wplus - n * (n + 1) / 4.0) / math.sqrt(var)
        row = out[et]
        assert row["n"] == n
        assert row["w2"] == int(round(2 * wplus))
        assert row["tsum"] == tsum
        assert abs(row["z_e4"] - math.floor(z * 10_000 + _OFF)) <= 1


def test_durbin_watson_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_durbin_watson(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        t = np.array(days) - days[0]
        y = np.array([dd[d] for d in days], dtype=float)
        n = len(y)
        if n < 5:
            assert et not in out
            continue
        b, a = np.polyfit(t, y, 1)
        e = y - a - b * t
        dw = np.sum(np.diff(e) ** 2) / np.sum(e**2)
        row = out[et]
        assert row["n"] == n
        assert abs(row["dw_e4"] - math.floor(dw * 10_000 + _OFF)) <= 1
        assert 0 <= row["dw_e4"] <= 40_000  # DW in [0, 4]


def test_friedman_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_friedman_test(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        weeks = defaultdict(dict)
        for day, c in dd.items():
            weeks[day // 7][(day + 3) % 7] = c
        complete = {wk: m for wk, m in weeks.items() if len(m) == 7}
        b = len(complete)
        if b < 2:
            assert et not in out
            continue
        rsum = defaultdict(float)
        for _wk, m in complete.items():
            dows = sorted(m)
            ranks = _avg_ranks([m[d] for d in dows])
            for d, r in zip(dows, ranks):
                rsum[d] += r
        chi2 = 12.0 / (b * 7 * 8) * sum(r * r for r in rsum.values()) - 3 * b * 8
        row = out[et]
        assert row["b"] == b
        assert row["rr"] == int(round(sum((2 * r) ** 2 for r in rsum.values())))
        assert abs(row["chi2_e4"] - math.floor(chi2 * 10_000 + _OFF)) <= 1


def test_cramers_v_matches_numpy(spark):
    row = q_cramers_v(spark, SF).collect()[0]
    docs = _docs(spark)
    tab = docs.groupby(["source", "lang"]).size().unstack(fill_value=0)
    o = tab.values.astype(float)
    n = o.sum()
    r = o.sum(axis=1, keepdims=True)
    c = o.sum(axis=0, keepdims=True)
    e = r @ c / n
    mask = e > 0
    chi2 = float(((o - e)[mask] ** 2 / e[mask]).sum())
    nr, nc = o.shape
    v = math.sqrt(chi2 / (n * min(nr - 1, nc - 1)))
    phi2c = max(0.0, chi2 / n - (nr - 1) * (nc - 1) / (n - 1))
    rp = nr - (nr - 1) ** 2 / (n - 1)
    cp = nc - (nc - 1) ** 2 / (n - 1)
    vc = math.sqrt(phi2c / min(rp - 1, cp - 1))
    assert row["n"] == int(n)
    assert row["nr"] == nr and row["nc"] == nc
    assert abs(row["chi2_e4"] - math.floor(chi2 * 10_000 + _OFF)) <= 1
    assert abs(row["v_e6"] - math.floor(v * 1_000_000 + _OFF)) <= 2
    assert abs(row["v_corr_e6"] - math.floor(vc * 1_000_000 + _OFF)) <= 2


def test_cochran_q_matches_counter(spark):
    import re

    out = {r["lang"]: r for r in q_cochran_q(spark, SF).collect()}
    docs = _docs(spark)
    docs = docs.copy()
    toks = docs["text"].str.strip().str.split()
    docs["ttr_e6"] = [
        math.floor(len(set(t)) / len(t) * 1_000_000 + _OFF) for t in toks
    ]
    docs["pd_e6"] = [
        math.floor(
            len(re.findall(r"[.,;:!?]", tx)) / nc * 1_000_000 + _OFF
        )
        for tx, nc in zip(docs["text"], docs["n_chars"])
    ]
    for lang, grp in docs.groupby("lang"):
        n = len(grp)
        med = lambda s: sorted(s)[(n - 1) // 2]
        a = (grp["n_chars"] > med(grp["n_chars"])).astype(int).values
        b = (grp["ttr_e6"] > med(grp["ttr_e6"])).astype(int).values
        c = (grp["pd_e6"] > med(grp["pd_e6"])).astype(int).values
        g1, g2, g3 = int(a.sum()), int(b.sum()), int(c.sum())
        ll = a + b + c
        sl, sl2 = int(ll.sum()), int((ll * ll).sum())
        den = 3 * (3 * sl - sl2)
        if den <= 0:
            assert lang not in out
            continue
        s = g1 + g2 + g3
        num = sum((3 * g - s) ** 2 for g in (g1, g2, g3))
        q = 2 * num / den
        row = out[lang]
        assert (row["g1"], row["g2"], row["g3"]) == (g1, g2, g3)
        assert row["q_e4"] == math.floor(q * 10_000 + _OFF)


def test_source_profile_cosine_matches_counter(spark):
    out = {
        (r["sa"], r["sb"]): r
        for r in q_source_profile_cosine(spark, SF).collect()
    }
    docs = _docs(spark)
    gc = Counter(w for t in docs["text"] for w in t.strip().split())
    vocab = set(
        w
        for w, _ in sorted(gc.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    )
    prof = {}
    for src, grp in docs.groupby("source"):
        cnt = Counter(
            w for t in grp["text"] for w in t.strip().split() if w in vocab
        )
        prof[src] = cnt
    srcs = sorted(prof)
    expected = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            dot = sum(prof[sa][w] * prof[sb][w] for w in vocab)
            if dot == 0:
                continue
            na = sum(v * v for v in prof[sa].values())
            nb = sum(v * v for v in prof[sb].values())
            expected[(sa, sb)] = (dot, dot / math.sqrt(na * nb))
    assert set(out) == set(expected)
    for key, (dot, cos) in expected.items():
        row = out[key]
        assert row["dot"] == dot
        assert abs(row["cos_e6"] - math.floor(cos * 1_000_000 + _OFF)) <= 1


def test_theil_sen_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_theil_sen(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        slopes = [
            (dd[d2] - dd[d1]) / (d2 - d1)
            for i, d1 in enumerate(days)
            for d2 in days[i + 1 :]
        ]
        if not slopes:
            assert et not in out
            continue
        med = sorted(slopes)[(len(slopes) - 1) // 2]
        row = out[et]
        assert row["n_pairs"] == len(slopes)
        assert row["slope_e6"] == math.floor(med * 1_000_000 + _OFF)


def test_char_class_profile_matches_re(spark):
    import re

    out = {r["lang"]: r for r in q_char_class_profile(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        nc = int(grp["n_chars"].sum())
        na = sum(len(re.findall(r"[A-Za-z]", t)) for t in grp["text"])
        ndg = sum(len(re.findall(r"[0-9]", t)) for t in grp["text"])
        nsp = sum(len(re.findall(r"\s", t)) for t in grp["text"])
        npt = sum(len(re.findall(r"[.,;:!?]", t)) for t in grp["text"])
        row = out[lang]
        assert (row["nc"], row["na"], row["ndg"], row["nsp"], row["npt"]) == (
            nc,
            na,
            ndg,
            nsp,
            npt,
        )
        assert row["noth"] == nc - na - ndg - nsp - npt
        assert row["alpha_e6"] == math.floor(na / nc * 1_000_000 + _OFF)
        assert row["space_e6"] == math.floor(nsp / nc * 1_000_000 + _OFF)


def test_sentence_length_quantiles_matches_sorted(spark):
    import re

    out = {
        (r["lang"], r["q_pct"]): r
        for r in q_sentence_length_quantiles(spark, SF).collect()
    }
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        lens = []
        for t in grp["text"]:
            for s in re.split(r"[.!?]+", t):
                if s.strip():
                    lens.append(len(s.strip().split()))
        lens.sort()
        n = len(lens)
        for q in (25, 50, 90):
            want = lens[((n - 1) * q) // 100]
            row = out[(lang, q)]
            assert row["n_sents"] == n
            assert row["slen"] == want


def test_page_hinkley_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_page_hinkley(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        cs = [dd[d] for d in days]
        m, cum, mmin = 0.0, 0, None
        excs = []
        for i, c in enumerate(cs, 1):
            cum += c
            m += c - cum / i
            mmin = m if mmin is None else min(mmin, m)
            excs.append(math.floor((m - mmin) * 10_000 + _OFF))
        mx = max(excs)
        alarm = days[excs.index(mx)]
        row = out[et]
        assert row["n"] == len(days)
        assert row["ph_e4"] == mx
        assert row["alarm_day"] == alarm


def test_diel_concentration_matches_numpy(spark):
    out = {
        r["event_type"]: r for r in q_diel_concentration(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["sec"] = (ev["ts"].astype("int64") // 1_000_000_000) % 86_400
    for et, grp in ev.groupby("event_type"):
        th = grp["sec"].values * (2.0 * math.pi / 86_400.0)
        cs, sn = np.cos(th).sum(), np.sin(th).sum()
        n = len(th)
        rbar = math.sqrt(cs * cs + sn * sn) / n
        hour = (math.atan2(sn, cs) * (24.0 / (2.0 * math.pi)) + 24.0) % 24.0
        row = out[et]
        assert row["n"] == n
        assert abs(row["r_e6"] - math.floor(rbar * 1_000_000 + _OFF)) <= 2
        assert abs(row["peak_hour_e2"] - math.floor(hour * 100 + 0.5)) <= 1
        assert 0 <= row["r_e6"] <= 1_000_000


def test_span_leakage_matches_sets(spark):
    out = {(r["sa"], r["sb"]): r for r in q_span_leakage(spark, SF).collect()}
    docs = _docs(spark)
    grams = {}
    for src, grp in docs.groupby("source"):
        s = set()
        for t in grp["text"]:
            toks = t.strip().split()
            s |= {
                " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
            }
        grams[src] = s
    srcs = sorted(grams)
    expected = {}
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            n = len(grams[sa] & grams[sb])
            if n:
                expected[(sa, sb)] = n
    assert {k: v["n_spans"] for k, v in out.items()} == expected


def test_robust_scale_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_robust_scale(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(list)
    for (et, _day), c in daily.items():
        per[et].append(c)
    for et, cs in per.items():
        n = len(cs)
        if n < 2:
            assert et not in out
            continue
        xs = sorted(cs)
        med = xs[(n - 1) // 2]
        mad = sorted(abs(c - med) for c in cs)[(n - 1) // 2]
        q1 = xs[((n - 1) * 25) // 100]
        q3 = xs[((n - 1) * 75) // 100]
        dists = sorted(
            abs(a - b)
            for i, a in enumerate(cs)
            for b in cs[i + 1 :]
        )
        h = n // 2 + 1
        k = h * (h - 1) // 2
        qn = dists[k - 1]
        row = out[et]
        assert row["n"] == n
        assert row["med"] == med
        assert row["mad"] == mad
        assert row["qn"] == qn
        assert row["iqr"] == q3 - q1


def test_wilson_ci_matches_formula(spark):
    out = {r["event_type"]: r for r in q_wilson_ci(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["night"] = (ev["ts"].dt.hour < 6).astype(int)
    for et, grp in ev.groupby("event_type"):
        n = len(grp)
        k = int(grp["night"].sum())
        p = k / n
        z = 1.96
        z2n = z * z / n
        center = (p + z2n / 2) / (1 + z2n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / (1 + z2n)
        row = out[et]
        assert row["n"] == n and row["k"] == k
        assert row["p_e6"] == math.floor(p * 1_000_000 + _OFF)
        assert abs(row["lo_e6"] - math.floor((center - half) * 1e6 + _OFF)) <= 1
        assert abs(row["hi_e6"] - math.floor((center + half) * 1e6 + _OFF)) <= 1
        assert row["lo_e6"] <= row["p_e6"] <= row["hi_e6"]


def test_streak_stats_matches_loop(spark):
    out = {r["event_type"]: r for r in q_streak_stats(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        cs = [dd[d] for d in days]
        med = sorted(cs)[(len(cs) - 1) // 2]
        ups = [1 if c > med else 0 for c in cs]
        runs = []
        for u in ups:
            if runs and runs[-1][0] == u:
                runs[-1][1] += 1
            else:
                runs.append([u, 1])
        row = out[et]
        assert row["n_runs"] == len(runs)
        assert row["max_up"] == max(
            (ln for u, ln in runs if u == 1), default=0
        )
        assert row["max_down"] == max(
            (ln for u, ln in runs if u == 0), default=0
        )


def test_ks_doclen_matches_numpy(spark):
    out = {(r["la"], r["lb"]): r for r in q_ks_doclen(spark, SF).collect()}
    docs = _docs(spark)
    by_lang = {
        lang: sorted(grp["n_chars"].astype(int))
        for lang, grp in docs.groupby("lang")
    }
    langs = sorted(by_lang)
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            xa, xb = by_lang[la], by_lang[lb]
            na, nb = len(xa), len(xb)
            support = sorted(set(xa) | set(xb))
            m = 0
            for v in support:
                ca = np.searchsorted(xa, v, side="right")
                cb = np.searchsorted(xb, v, side="right")
                m = max(m, abs(ca * nb - cb * na))
            row = out[(la, lb)]
            assert (row["n_a"], row["n_b"]) == (na, nb)
            assert row["m"] == m
            assert row["ks_e6"] == math.floor(m / (na * nb) * 1e6 + _OFF)


def test_cliffs_delta_matches_loop(spark):
    out = {r["event_type"]: r for r in q_cliffs_delta(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["v"] = [math.floor(v * 100 + _OFF) for v in ev["value"]]
    ev["night"] = (ev["ts"].dt.hour < 6).astype(int)
    for et, grp in ev.groupby("event_type"):
        xd = sorted(grp[grp["night"] == 0]["v"].astype(int))
        xn = sorted(grp[grp["night"] == 1]["v"].astype(int))
        if not xd or not xn:
            assert et not in out
            continue
        xn_arr = np.array(xn)
        gt = int(sum(np.searchsorted(xn_arr, v, side="left") for v in xd))
        lt = int(
            sum(len(xn) - np.searchsorted(xn_arr, v, side="right") for v in xd)
        )
        delta = (gt - lt) / (len(xd) * len(xn))
        row = out[et]
        assert (row["n_day"], row["n_night"]) == (len(xd), len(xn))
        assert (row["gt"], row["lt"]) == (gt, lt)
        assert row["delta_e6"] == math.floor(delta * 1_000_000 + _OFF)
        assert -1_000_000 <= row["delta_e6"] <= 1_000_000


def test_hedges_g_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_hedges_g(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(lambda: ([], []))
    for (et, day), c in daily.items():
        per[et][1 if (day + 3) % 7 >= 5 else 0].append(c)
    for et, (wd, we) in per.items():
        n1, n2 = len(wd), len(we)
        if n1 < 2 or n2 < 2:
            assert et not in out
            continue
        x1, x2 = np.array(wd, float), np.array(we, float)
        ss = ((x1 - x1.mean()) ** 2).sum() + ((x2 - x2.mean()) ** 2).sum()
        if ss <= 0:
            assert et not in out
            continue
        sp = math.sqrt(ss / (n1 + n2 - 2))
        d = (x1.mean() - x2.mean()) / sp
        gg = d * (1 - 3 / (4 * (n1 + n2 - 2) - 1))
        row = out[et]
        assert (row["n1"], row["n2"]) == (n1, n2)
        assert abs(row["d_e4"] - math.floor(d * 10_000 + _OFF)) <= 1
        assert abs(row["g_e4"] - math.floor(gg * 10_000 + _OFF)) <= 1


def test_quantile_shape_matches_sorted(spark):
    out = {r["event_type"]: r for r in q_quantile_shape(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["v"] = [math.floor(v * 100 + _OFF) for v in ev["value"]]
    for et, grp in ev.groupby("event_type"):
        xs = sorted(grp["v"].astype(int))
        n = len(xs)
        e = {i: xs[((n - 1) * i) // 8] for i in range(1, 8)}
        if e[6] - e[2] <= 0:
            assert et not in out
            continue
        bowley = (e[6] + e[2] - 2 * e[4]) / (e[6] - e[2])
        moors = ((e[7] - e[5]) + (e[3] - e[1])) / (e[6] - e[2])
        row = out[et]
        assert row["n"] == n
        assert (row["q1"], row["q2"], row["q3"]) == (e[2], e[4], e[6])
        assert row["bowley_e6"] == math.floor(bowley * 1_000_000 + _OFF)
        assert row["moors_e6"] == math.floor(moors * 1_000_000 + _OFF)


def test_source_lang_purity_matches_counter(spark):
    out = {r["source"]: r for r in q_source_lang_purity(spark, SF).collect()}
    docs = _docs(spark)
    for src, grp in docs.groupby("source"):
        cnt = Counter(grp["lang"])
        tot = sum(cnt.values())
        major = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        h = -sum(c / tot * math.log(c / tot) for c in cnt.values())
        row = out[src]
        assert row["n_docs"] == tot
        assert row["n_langs"] == len(cnt)
        assert row["major_lang"] == major[0]
        assert row["purity_e6"] == math.floor(major[1] / tot * 1e6 + _OFF)
        assert abs(row["entropy_e4"] - math.floor(h * 10_000 + 0.5)) <= 1


def test_staleness_quantiles_matches_sorted(spark):
    out = {
        (r["event_type"], r["q_pct"]): r
        for r in q_staleness_quantiles(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    last = ev.groupby(["event_type", "user_id"])["day"].max()
    gmax = int(ev["day"].max())
    for et, grp in last.groupby(level=0):
        st = sorted(gmax - grp.values)
        n = len(st)
        for q in (50, 90, 100):
            want = st[((n - 1) * q) // 100]
            row = out[(et, q)]
            assert row["n_users"] == n
            assert row["stale_days"] == want


def test_type_corr_matrix_matches_numpy(spark):
    out = {(r["ta"], r["tb"]): r for r in q_type_corr_matrix(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    types = sorted(per)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            common = sorted(set(per[ta]) & set(per[tb]))
            n = len(common)
            if n < 5:
                assert (ta, tb) not in out
                continue
            x = np.array([per[ta][d] for d in common], float)
            y = np.array([per[tb][d] for d in common], float)
            if x.std() == 0 or y.std() == 0:
                assert (ta, tb) not in out
                continue
            r = float(np.corrcoef(x, y)[0, 1])
            row = out[(ta, tb)]
            assert row["n"] == n
            assert abs(row["r_e6"] - math.floor(r * 1_000_000 + _OFF)) <= 2


def test_split_half_reliability_matches_numpy(spark):
    out = {
        r["event_type"]: r
        for r in q_split_half_reliability(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    ev["hr"] = ev["ts"].dt.hour
    ev["even"] = (ev["day"] % 2 == 0).astype(int)
    for et, grp in ev.groupby("event_type"):
        hrs = sorted(grp["hr"].unique())
        x = np.array(
            [((grp["hr"] == h) & (grp["even"] == 1)).sum() for h in hrs],
            float,
        )
        y = np.array(
            [((grp["hr"] == h) & (grp["even"] == 0)).sum() for h in hrs],
            float,
        )
        if x.std() == 0 or y.std() == 0:
            assert et not in out
            continue
        r = float(np.corrcoef(x, y)[0, 1])
        sb = 2 * r / (1 + r)
        row = out[et]
        assert row["n_bins"] == len(hrs)
        assert abs(row["r_half_e6"] - math.floor(r * 1e6 + _OFF)) <= 2
        assert abs(row["r_full_e6"] - math.floor(sb * 1e6 + _OFF)) <= 2


def test_lognormal_fit_matches_numpy(spark):
    out = {r["lang"]: r for r in q_lognormal_fit(spark, SF).collect()}
    docs = _docs(spark)

    def phi(z):
        # A&S 7.1.26, matching the engine op tree
        az = abs(z)
        t = 1.0 / (1.0 + 0.2316419 * az)
        poly = (
            0.319381530 * t
            - 0.356563782 * t**2
            + 1.781477937 * t**3
            - 1.821255978 * t**4
            + 1.330274429 * t**5
        )
        up = 0.3989422804014327 * math.exp(-az * az / 2.0) * poly
        return 1.0 - up if z >= 0 else up

    for lang, grp in docs.groupby("lang"):
        xs = sorted(int(x) for x in grp["n_chars"] if x > 0)
        n = len(xs)
        lx = np.log(xs)
        mu, var = lx.mean(), lx.var()
        if var <= 0:
            assert lang not in out
            continue
        mu_q = math.floor(mu * 10_000 + 0.5) / 10_000
        sg_q = math.floor(math.sqrt(var) * 10_000 + 0.5) / 10_000
        support = sorted(set(xs))
        import bisect

        ks = 0.0
        for v in support:
            cum = bisect.bisect_right(xs, v)
            prev = bisect.bisect_left(xs, v)
            fh = phi((math.log(v) - mu_q) / sg_q)
            ks = max(ks, abs(cum / n - fh), abs(prev / n - fh))
        row = out[lang]
        assert row["n"] == n
        assert abs(row["mu_e4"] - math.floor(mu * 10_000 + 0.5)) <= 1
        assert (
            abs(row["sigma_e4"] - math.floor(math.sqrt(var) * 10_000 + 0.5))
            <= 1
        )
        assert abs(row["ks_e4"] - math.floor(ks * 10_000 + 0.5)) <= 1


def test_user_concentration_matches_counter(spark):
    out = {
        r["event_type"]: r for r in q_user_concentration(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    for et, grp in ev.groupby("event_type"):
        cnt = Counter(grp["user_id"])
        nu = len(cnt)
        tot = sum(cnt.values())
        k = max(1, nu // 100)
        top = sum(
            c
            for _u, c in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
                :k
            ]
        )
        h = -sum(c / tot * math.log(c / tot) for c in cnt.values())
        row = out[et]
        assert (row["n_users"], row["n_events"], row["k"]) == (nu, tot, k)
        assert row["top_share_e6"] == math.floor(top / tot * 1e6 + _OFF)
        assert abs(row["entropy_e4"] - math.floor(h * 10_000 + 0.5)) <= 1


def test_nelson_aalen_matches_loop(spark):
    out = {r["life_days"]: r for r in q_nelson_aalen(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    ut = ev.groupby(["user_id", "event_type"])["day"].agg(["min", "max"])
    ud1 = ut.groupby(level=0)["max"].max()
    lives = defaultdict(lambda: [0, 0])
    for (uid, _et), row in ut.iterrows():
        life = int(row["max"] - row["min"])
        obs = int(row["max"] <= ud1[uid] - 7)
        lives[life][0] += 1
        lives[life][1] += obs
    times = sorted(lives)
    n_risk_tot = sum(v[0] for v in lives.values())
    h = v = 0.0
    seen = 0
    for t in times:
        n_at, d = lives[t]
        n_risk = n_risk_tot - seen
        seen += n_at
        h += d / n_risk
        v += d / (n_risk * n_risk)
        if d > 0:
            row = out[t]
            assert row["n_risk"] == n_risk
            assert row["n_events"] == d
            assert abs(row["h_e6"] - math.floor(h * 1e6 + _OFF)) <= 1
            assert abs(row["var_e9"] - math.floor(v * 1e9 + _OFF)) <= 1
    assert set(out) == {t for t in times if lives[t][1] > 0}


def test_retention_curve_matches_counter(spark):
    out = {r["k"]: r for r in q_retention_curve(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["d"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    ud = set(zip(ev["user_id"], ev["d"]))
    d0 = {}
    for u, d in ud:
        d0[u] = min(d0.get(u, d), d)
    cohort = Counter(d0.values())
    acc = defaultdict(lambda: [0, 0])
    for u, d in ud:
        k = d - d0[u]
        if 1 <= k <= 14:
            acc[k][0] += 1
    # n0 pooled over cohorts that appear at that k
    per_k_cohorts = defaultdict(set)
    for u, d in ud:
        k = d - d0[u]
        if 1 <= k <= 14:
            per_k_cohorts[k].add(d0[u])
    for k in acc:
        acc[k][1] = sum(cohort[c] for c in per_k_cohorts[k])
    assert set(out) == set(acc)
    for k, (nk, n0) in acc.items():
        row = out[k]
        assert (row["nk"], row["n0"]) == (nk, n0)
        assert row["r_e6"] == math.floor(nk / n0 * 1_000_000 + _OFF)


def test_brier_decomposition_matches_loop(spark):
    out = {
        r["event_type"]: r
        for r in q_brier_decomposition(spark, SF).collect()
    }
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        cs = [dd[d] for d in days]
        med = sorted(cs)[(len(cs) - 1) // 2]
        n = len(days)
        obs = {d: int(dd[d] > med) for d in days}
        obar = sum(obs.values()) / n
        bins = defaultdict(list)
        for d in days:
            bins[(d + 3) % 7].append(obs[d])
        res = sum(
            len(v) * (sum(v) / len(v) - obar) ** 2 for v in bins.values()
        ) / n
        unc = obar * (1 - obar)
        # reliability is 0 by construction (forecast = bin mean), so
        # Brier = unc - res; verify against the direct mean squared error
        brier_direct = sum(
            (sum(v) / len(v) - o) ** 2 for v in bins.values() for o in v
        ) / n
        assert abs((unc - res) - brier_direct) < 1e-12
        row = out[et]
        assert row["n"] == n
        assert row["n_above"] == sum(obs.values())
        assert abs(row["resolution_e6"] - math.floor(res * 1e6 + _OFF)) <= 1
        assert abs(row["uncertainty_e6"] - math.floor(unc * 1e6 + _OFF)) <= 1
        assert abs(row["brier_e6"] - math.floor((unc - res) * 1e6 + _OFF)) <= 1


def test_source_coherence_matches_counter(spark):
    out = {r["source"]: r for r in q_source_coherence(spark, SF).collect()}
    docs = _docs(spark)
    gc = Counter(w for t in docs["text"] for w in t.strip().split())
    vocab = set(
        w for w, _ in sorted(gc.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    )
    for src, grp in docs.groupby("source"):
        xs = []
        for t in grp["text"]:
            cnt = Counter(w for w in t.strip().split() if w in vocab)
            if cnt:
                xs.append(cnt)
        svec = Counter()
        for x in xs:
            svec.update(x)
        s2 = sum(v * v for v in svec.values())
        cos_sum = 0.0
        n_docs = 0
        for x in xs:
            x2 = sum(v * v for v in x.values())
            dot = sum(v * svec[w] for w, v in x.items())
            if x2 > 0 and s2 > 0:
                cos_sum += dot / math.sqrt(x2 * s2)
                n_docs += 1
        row = out[src]
        assert row["n_docs"] == n_docs
        assert (
            abs(row["coherence_e4"] - math.floor(cos_sum / n_docs * 1e4 + 0.5))
            <= 1
        )


def test_qq_slope_matches_numpy(spark):
    out = {(r["la"], r["lb"]): r for r in q_qq_slope(spark, SF).collect()}
    docs = _docs(spark)
    decs = {}
    for lang, grp in docs.groupby("lang"):
        xs = sorted(grp["n_chars"].astype(int))
        n = len(xs)
        decs[lang] = [xs[((n - 1) * i) // 10] for i in range(1, 10)]
    langs = sorted(decs)
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            qa, qb = np.array(decs[la], float), np.array(decs[lb], float)
            slope = np.polyfit(qa, qb, 1)[0]
            r2 = float(np.corrcoef(qa, qb)[0, 1] ** 2)
            row = out[(la, lb)]
            assert row["n_pts"] == 9
            assert abs(row["slope_e4"] - math.floor(slope * 1e4 + 0.5)) <= 1
            assert abs(row["r2_e6"] - math.floor(r2 * 1e6 + 0.5)) <= 2


def test_tail_coexceedance_matches_loop(spark):
    out = {
        (r["ta"], r["tb"]): r
        for r in q_tail_coexceedance(spark, SF).collect()
    }
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    thr = {}
    for et, dd in per.items():
        days = sorted(dd)
        cs = sorted(dd[d] for d in days)
        thr[et] = cs[((len(cs) - 1) * 90) // 100]
    types = sorted(per)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            common = sorted(set(per[ta]) & set(per[tb]))
            n = len(common)
            xa = [int(per[ta][d] > thr[ta]) for d in common]
            xb = [int(per[tb][d] > thr[tb]) for d in common]
            na, nb = sum(xa), sum(xb)
            nboth = sum(a * b for a, b in zip(xa, xb))
            if na == 0 or nb == 0:
                assert (ta, tb) not in out
                continue
            chi = nboth * n / (na * nb)
            row = out[(ta, tb)]
            assert (row["n"], row["na"], row["nb"], row["nboth"]) == (
                n,
                na,
                nb,
                nboth,
            )
            assert row["chi_e4"] == math.floor(chi * 10_000 + _OFF)
