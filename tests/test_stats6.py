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
    q_boilerplate_prefixes,
    q_charset_coverage,
    q_core_vocab_coverage,
    q_caps_profile,
    q_cohens_h,
    q_l_moments,
    q_laplace_trend,
    q_zero_inflation,
    q_cusum_squares,
    q_diel_fwhm,
    q_expected_shortfall,
    q_max_outage,
    q_median_ci,
    q_kpss_level,
    q_medcouple,
    q_ulcer_index,
    q_user_specialization,
    q_diel_jsd,
    q_sample_entropy,
    q_time_reversal_asymmetry,
    q_cvm_two_sample,
    q_dow_anova,
    q_habit_strength,
    q_peak_week,
    q_exp_gap_fit,
    q_extremal_index,
    q_vocab_gini,
    q_word_length_profile,
    q_mad_outlier_rate,
    q_load_profile,
    q_rate_ratio,
    q_transfer_entropy,
    q_uniqueness_risk,
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


def test_transfer_entropy_matches_loop(spark):
    out = {(r["ta"], r["tb"]): r for r in q_transfer_entropy(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    med = {}
    for et, dd in per.items():
        cs = sorted(dd.values())
        med[et] = cs[(len(cs) - 1) // 2]
    st = {et: {d: int(c > med[et]) for d, c in dd.items()} for et, dd in per.items()}
    types = sorted(st)
    for ta in types:
        for tb in types:
            if ta == tb:
                continue
            trips = Counter()
            for d in st[ta]:
                if d in st[tb] and d + 1 in st[ta]:
                    trips[(st[ta][d], st[tb][d], st[ta][d + 1])] += 1
            n = sum(trips.values())
            if n < 10:
                assert (ta, tb) not in out
                continue
            c_ab = Counter()
            c_a = Counter()
            c_an = Counter()
            for (sa, sb, sn), c in trips.items():
                c_ab[(sa, sb)] += c
                c_a[sa] += c
                c_an[(sa, sn)] += c
            te = sum(
                c / n * math.log(c * c_a[sa] / (c_ab[(sa, sb)] * c_an[(sa, sn)]))
                for (sa, sb, sn), c in trips.items()
            )
            row = out[(ta, tb)]
            assert row["n"] == n
            assert abs(row["te_e6"] - math.floor(te * 1e6 + 0.5)) <= 2
            assert row["te_e6"] >= -2  # TE >= 0 up to quantization


def test_rate_ratio_matches_formula(spark):
    out = {r["event_type"]: r for r in q_rate_ratio(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(lambda: ([], []))
    for (et, day), c in daily.items():
        per[et][1 if (day + 3) % 7 >= 5 else 0].append(c)
    for et, (wd, we) in per.items():
        if not wd or not we or sum(wd) == 0 or sum(we) == 0:
            assert et not in out
            continue
        s1, s2 = sum(wd), sum(we)
        rr = (s1 / len(wd)) / (s2 / len(we))
        se = math.sqrt(1 / s1 + 1 / s2)
        row = out[et]
        assert (row["s1"], row["s2"]) == (s1, s2)
        assert row["rr_e4"] == math.floor(rr * 10_000 + _OFF)
        assert abs(row["lo_e4"] - math.floor(math.exp(math.log(rr) - 1.96 * se) * 1e4 + 0.5)) <= 1
        assert abs(row["hi_e4"] - math.floor(math.exp(math.log(rr) + 1.96 * se) * 1e4 + 0.5)) <= 1
        assert row["lo_e4"] <= row["rr_e4"] <= row["hi_e4"]


def test_uniqueness_risk_matches_counter(spark):
    row = q_uniqueness_risk(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["blk"] = ev["ts"].dt.hour // 6
    fav_t = {}
    fav_b = {}
    for uid, grp in ev.groupby("user_id"):
        ct = Counter(grp["event_type"])
        fav_t[uid] = sorted(ct.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        cb = Counter(grp["blk"])
        fav_b[uid] = sorted(cb.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    cls = Counter((fav_t[u], fav_b[u]) for u in fav_t)
    n_users = sum(cls.values())
    n_unique = sum(1 for k in cls.values() if k == 1)
    assert row["n_users"] == n_users
    assert row["n_classes"] == len(cls)
    assert row["n_unique"] == n_unique
    assert row["u_2_5"] == sum(k for k in cls.values() if 2 <= k <= 5)
    assert row["u_gt5"] == sum(k for k in cls.values() if k > 5)
    assert row["risk_e6"] == math.floor(n_unique / n_users * 1e6 + _OFF)


def test_load_profile_matches_counter(spark):
    out = {r["event_type"]: r for r in q_load_profile(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["hr"] = ev["ts"].astype("int64") // 1_000_000_000 // 3600
    for et, grp in ev.groupby("event_type"):
        cnt = Counter(grp["hr"])
        peak = max(cnt.values())
        peak_hr = min(h for h, c in cnt.items() if c == peak)
        tot = sum(cnt.values())
        nh = len(cnt)
        lf = tot / (nh * peak)
        row = out[et]
        assert (row["n_hours"], row["peak_hr"], row["peak"], row["tot"]) == (
            nh,
            peak_hr,
            peak,
            tot,
        )
        assert row["load_factor_e6"] == math.floor(lf * 1e6 + _OFF)


def test_boilerplate_prefixes_matches_counter(spark):
    out = {
        r["source"]: r for r in q_boilerplate_prefixes(spark, SF).collect()
    }
    docs = _docs(spark)
    for src, grp in docs.groupby("source"):
        prefixes = [
            " ".join(t.strip().split()[:5])
            for t in grp["text"]
            if len(t.strip().split()) >= 5
        ]
        if not prefixes:
            assert src not in out
            continue
        cl = Counter(prefixes)
        n_docs = len(prefixes)
        n_clusters = sum(1 for v in cl.values() if v >= 2)
        n_boiler = sum(v for v in cl.values() if v >= 2)
        row = out[src]
        assert row["n_docs"] == n_docs
        assert row["n_clusters"] == n_clusters
        assert row["max_cluster"] == max(cl.values())
        assert row["n_boiler"] == n_boiler
        assert row["boiler_share_e6"] == math.floor(
            n_boiler / n_docs * 1e6 + _OFF
        )


def test_mad_outlier_rate_matches_loop(spark):
    out = {r["lang"]: r for r in q_mad_outlier_rate(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        xs = sorted(grp["n_chars"].astype(int))
        n = len(xs)
        med = xs[(n - 1) // 2]
        ads = sorted(abs(x - med) for x in xs)
        mad = ads[(n - 1) // 2]
        if mad <= 0:
            assert lang not in out
            continue
        n_out = sum(
            1 for x in grp["n_chars"] if abs(int(x) - med) * 10_000 > 44_478 * mad
        )
        row = out[lang]
        assert (row["n"], row["med"], row["mad"], row["n_out"]) == (
            n,
            med,
            mad,
            n_out,
        )
        assert row["rate_e6"] == math.floor(n_out / n * 1e6 + _OFF)


def test_charset_coverage_matches_counter(spark):
    out = {r["lang"]: r for r in q_charset_coverage(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        cnt = Counter(ch for t in grp["text"] for ch in t)
        n_distinct = len(cnt)
        printable = {ch for ch in cnt if 32 <= ord(ch) <= 126}
        nonprint_mass = sum(c for ch, c in cnt.items() if ch not in printable)
        row = out[lang]
        assert row["n_distinct"] == n_distinct
        assert row["n_printable"] == len(printable)
        assert row["nonprint_mass"] == nonprint_mass
        assert row["printable_cov_e6"] == math.floor(
            len(printable) / 95.0 * 1e6 + _OFF
        )


def test_core_vocab_coverage_matches_counter(spark):
    out = {r["lang"]: r for r in q_core_vocab_coverage(spark, SF).collect()}
    docs = _docs(spark)
    gc = Counter(w for t in docs["text"] for w in t.strip().split())
    vocab = set(
        w
        for w, _ in sorted(gc.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    )
    for lang, grp in docs.groupby("lang"):
        cnt = Counter(w for t in grp["text"] for w in t.strip().split())
        n = sum(cnt.values())
        core_mass = sum(c for w, c in cnt.items() if w in vocab)
        core_types = sum(1 for w in cnt if w in vocab)
        row = out[lang]
        assert row["n"] == n
        assert row["v"] == len(cnt)
        assert row["core_types"] == core_types
        assert row["core_mass"] == core_mass
        assert row["coverage_e6"] == math.floor(core_mass / n * 1e6 + _OFF)


def test_extremal_index_matches_loop(spark):
    out = {r["event_type"]: r for r in q_extremal_index(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        cs = sorted(dd.values())
        thr = cs[((len(cs) - 1) * 90) // 100]
        exc = sorted(d for d, c in dd.items() if c > thr)
        if len(exc) < 2:
            assert et not in out
            continue
        gaps = [b - a for a, b in zip(exc, exc[1:])]
        n_clusters = 1 + sum(1 for g in gaps if g > 2)
        theta = n_clusters / len(exc)
        mean_gap = sum(gaps) / len(gaps)
        row = out[et]
        assert (row["n_exc"], row["n_clusters"]) == (len(exc), n_clusters)
        assert row["theta_e6"] == math.floor(theta * 1e6 + _OFF)
        assert row["mean_gap_e4"] == math.floor(mean_gap * 1e4 + _OFF)
        assert 0 < row["theta_e6"] <= 1_000_000


def test_vocab_gini_matches_sorted(spark):
    out = {r["lang"]: r for r in q_vocab_gini(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        cnt = Counter(w for t in grp["text"] for w in t.strip().split())
        ms = sorted(cnt.values())
        v, n = len(ms), sum(ms)
        im = sum((i + 1) * m for i, m in enumerate(ms))
        gini = 2 * im / (v * n) - (v + 1) / v
        row = out[lang]
        assert (row["v"], row["n"]) == (v, n)
        assert row["gini_e6"] == math.floor(gini * 1e6 + _OFF)
        assert 0 <= row["gini_e6"] <= 1_000_000


def test_exp_gap_fit_matches_loop(spark):
    out = {r["event_type"]: r for r in q_exp_gap_fit(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["mn"] = ev["ts"].astype("int64") // 1_000_000_000 // 60
    gaps_by_type = defaultdict(list)
    for (et, _uid), grp in ev.groupby(["event_type", "user_id"]):
        mns = sorted(grp["mn"])
        gaps_by_type[et].extend(
            b - a for a, b in zip(mns, mns[1:]) if b - a > 0
        )
    for et, gaps in gaps_by_type.items():
        n = len(gaps)
        if n < 10:
            assert et not in out
            continue
        s = sum(gaps)
        lam_e9 = math.floor(n / s * 1e9 + 0.5)
        lam = lam_e9 / 1e9
        xs = sorted(gaps)
        support = sorted(set(xs))
        import bisect

        ks = 0.0
        for g in support:
            cum = bisect.bisect_right(xs, g)
            prev = bisect.bisect_left(xs, g)
            fh = 1.0 - math.exp(-lam * g)
            ks = max(ks, abs(cum / n - fh), abs(prev / n - fh))
        row = out[et]
        assert row["n"] == n
        assert row["lam_e9"] == lam_e9
        assert abs(row["ks_e4"] - math.floor(ks * 1e4 + 0.5)) <= 1


def test_word_length_profile_matches_counter(spark):
    out = {r["lang"]: r for r in q_word_length_profile(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        lens = [len(w) for t in grp["text"] for w in t.strip().split() if w]
        n = len(lens)
        cnt = Counter(lens)
        mean = sum(lens) / n
        h = -sum(c / n * math.log(c / n) for c in cnt.values())
        rate = sum(1 for ln in lens if ln > 7) / n
        row = out[lang]
        assert row["n"] == n
        assert row["mean_len_e4"] == math.floor(mean * 1e4 + _OFF)
        assert abs(row["entropy_e4"] - math.floor(h * 1e4 + 0.5)) <= 1
        assert row["long_rate_e6"] == math.floor(rate * 1e6 + _OFF)


def test_habit_strength_matches_loop(spark):
    row = q_habit_strength(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["d"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    ud = defaultdict(set)
    for u, d in set(zip(ev["user_id"], ev["d"])):
        ud[u].add(d)
    m = r1 = c1 = n11 = 0
    n_users = 0
    for u, ds in ud.items():
        d0, d1 = min(ds), max(ds)
        if d1 - d0 < 7:
            continue
        n_users += 1
        m += d1 - d0 - 6
        for d in range(d0, d1 - 6):
            a = d in ds
            b = (d + 7) in ds
            r1 += a
            c1 += b
            n11 += a and b
    n10, n01 = r1 - n11, c1 - n11
    n00 = m - r1 - c1 + n11
    phi = (n11 * n00 - n10 * n01) / math.sqrt(
        (n11 + n10) * (n01 + n00) * (n11 + n01) * (n10 + n00)
    )
    lor = math.log(((n11 + 0.5) * (n00 + 0.5)) / ((n10 + 0.5) * (n01 + 0.5)))
    assert row["n_users"] == n_users
    assert row["m"] == m
    assert row["n11"] == n11
    assert abs(row["phi_e6"] - math.floor(phi * 1e6 + _OFF)) <= 1
    assert abs(row["lor_e4"] - math.floor(lor * 1e4 + 0.5)) <= 1


def test_dow_anova_matches_numpy(spark):
    out = {r["event_type"]: r for r in q_dow_anova(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(lambda: defaultdict(list))
    for (et, day), c in daily.items():
        per[et][(day + 3) % 7].append(c)
    for et, groups in per.items():
        k = len(groups)
        n = sum(len(v) for v in groups.values())
        if k < 2 or n <= k:
            assert et not in out
            continue
        allv = [c for v in groups.values() for c in v]
        gm = sum(allv) / n
        ssb = sum(
            len(v) * (sum(v) / len(v) - gm) ** 2 for v in groups.values()
        )
        ssw = sum(
            (c - sum(v) / len(v)) ** 2 for v in groups.values() for c in v
        )
        sst = sum((c - gm) ** 2 for c in allv)
        if ssw <= 0:
            assert et not in out
            continue
        fstat = (ssb / (k - 1)) / (ssw / (n - k))
        eta2 = ssb / sst
        row = out[et]
        assert (row["n"], row["k"]) == (n, k)
        assert abs(row["f_e4"] - math.floor(fstat * 1e4 + _OFF)) <= 1
        assert abs(row["eta2_e6"] - math.floor(eta2 * 1e6 + _OFF)) <= 2


def test_peak_week_matches_loop(spark):
    out = {r["event_type"]: r for r in q_peak_week(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        wk7 = {
            d: sum(dd.get(x, 0) for x in range(d - 6, d + 1)) for d in days
        }
        mx, mn = max(wk7.values()), min(wk7.values())
        row = out[et]
        assert row["peak"] == mx
        assert row["trough"] == mn
        assert row["peak_end_day"] == min(d for d in days if wk7[d] == mx)
        assert row["trough_end_day"] == min(d for d in days if wk7[d] == mn)
        assert row["ratio_e4"] == math.floor(mx / mn * 1e4 + _OFF)


def test_cvm_two_sample_matches_loop(spark):
    out = {r["event_type"]: r for r in q_cvm_two_sample(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(lambda: ([], []))
    for (et, day), c in daily.items():
        per[et][1 if (day + 3) % 7 >= 5 else 0].append(c)
    for et, (wd, we) in per.items():
        n1, n2 = len(wd), len(we)
        if n1 == 0 or n2 == 0:
            assert et not in out
            continue
        support = sorted(set(wd) | set(we))
        s = 0
        for v in support:
            l = wd.count(v) + we.count(v)
            cum1 = sum(1 for x in wd if x <= v)
            cum2 = sum(1 for x in we if x <= v)
            s += l * (cum1 * n2 - cum2 * n1) ** 2
        tstat = s / ((n1 + n2) ** 2 * n1 * n2)
        row = out[et]
        assert (row["n1"], row["n2"], row["s"]) == (n1, n2, s)
        assert row["t_e6"] == math.floor(tstat * 1e6 + _OFF)


def test_sample_entropy_matches_loop(spark):
    out = {r["event_type"]: r for r in q_sample_entropy(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        x = [dd[d] for d in days]
        n = len(x)
        s, q = sum(x), sum(v * v for v in x)
        var_num = n * q - s * s
        nn1 = n * (n - 1)
        bb = aa = 0
        for i in range(n):
            for j in range(i + 1, n):
                m1 = (x[i] - x[j]) ** 2 * 25 * nn1 <= var_num
                bb += m1
                if m1 and i + 1 < n and j + 1 < n:
                    if (x[i + 1] - x[j + 1]) ** 2 * 25 * nn1 <= var_num:
                        aa += 1
        if aa == 0 or bb == 0:
            assert et not in out
            continue
        row = out[et]
        assert (row["n"], row["b_m"], row["a_m1"]) == (n, bb, aa)
        assert abs(row["sampen_e4"] - math.floor(math.log(bb / aa) * 1e4 + 0.5)) <= 1
        assert row["sampen_e4"] >= 0


def test_trev_matches_numpy(spark):
    out = {
        r["event_type"]: r
        for r in q_time_reversal_asymmetry(spark, SF).collect()
    }
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        cs = [dd[d] for d in days]
        ds = [b - a for a, b in zip(cs, cs[1:])]
        m = len(ds)
        if m < 5:
            assert et not in out
            continue
        s2 = sum(d * d for d in ds)
        s3 = sum(d**3 for d in ds)
        if s2 <= 0:
            assert et not in out
            continue
        trev = (s3 / m) / (s2 / m) ** 1.5
        row = out[et]
        assert (row["m"], row["s2"], row["s3"]) == (m, s2, s3)
        assert abs(row["trev_e4"] - math.floor(trev * 1e4 + _OFF)) <= 1


def test_cohens_h_matches_formula(spark):
    out = {r["event_type"]: r for r in q_cohens_h(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    ev["night"] = (ev["ts"].dt.hour < 6).astype(int)
    for et, grp in ev.groupby("event_type"):
        d0, d1 = int(grp["day"].min()), int(grp["day"].max())
        mid = d0 + (d1 - d0) // 2
        first = grp[grp["day"] <= mid]
        second = grp[grp["day"] > mid]
        n1, n2 = len(first), len(second)
        if n1 == 0 or n2 == 0:
            assert et not in out
            continue
        k1, k2 = int(first["night"].sum()), int(second["night"].sum())
        h = 2 * math.asin(math.sqrt(k1 / n1)) - 2 * math.asin(
            math.sqrt(k2 / n2)
        )
        row = out[et]
        assert (row["n1"], row["k1"], row["n2"], row["k2"]) == (n1, k1, n2, k2)
        assert abs(row["h_e4"] - math.floor(h * 1e4 + 0.5)) <= 1


def test_diel_jsd_matches_loop(spark):
    out = {r["event_type"]: r for r in q_diel_jsd(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = (ev["ts"].astype("int64") // 1_000_000_000) // 86_400
    ev["hr"] = ev["ts"].dt.hour
    ev["wkend"] = ((ev["day"] + 3) % 7 >= 5).astype(int)
    for et, grp in ev.groupby("event_type"):
        wd = Counter(grp[grp["wkend"] == 0]["hr"])
        we = Counter(grp[grp["wkend"] == 1]["hr"])
        na, nb = sum(wd.values()), sum(we.values())
        if na == 0 or nb == 0:
            assert et not in out
            continue
        jsd = 0.0
        for h in set(wd) | set(we):
            pa = wd.get(h, 0) / na
            pb = we.get(h, 0) / nb
            m = (pa + pb) / 2
            if pa > 0:
                jsd += 0.5 * pa * math.log(pa / m)
            if pb > 0:
                jsd += 0.5 * pb * math.log(pb / m)
        row = out[et]
        assert (row["na"], row["nb"]) == (na, nb)
        assert abs(row["jsd_e6"] - math.floor(jsd * 1e6 + 0.5)) <= 2
        assert abs(row["dist_e4"] - math.floor(math.sqrt(jsd) * 1e4 + 0.5)) <= 1
        assert 0 <= row["jsd_e6"] <= 693_148  # JSD <= ln 2


def test_l_moments_matches_loop(spark):
    out = {r["event_type"]: r for r in q_l_moments(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        xs = sorted(dd.values())
        n = len(xs)
        if n < 8:
            assert et not in out
            continue
        b0 = sum(xs) / n
        b1 = sum((i) * x for i, x in enumerate(xs)) / (n * (n - 1))
        b2 = sum(i * (i - 1) * x for i, x in enumerate(xs)) / (
            n * (n - 1) * (n - 2)
        )
        b3 = sum(i * (i - 1) * (i - 2) * x for i, x in enumerate(xs)) / (
            n * (n - 1) * (n - 2) * (n - 3)
        )
        l1 = b0
        l2 = 2 * b1 - b0
        l3 = 6 * b2 - 6 * b1 + b0
        l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
        if l2 <= 0:
            assert et not in out
            continue
        row = out[et]
        assert row["n"] == n
        assert abs(row["l1_e2"] - math.floor(l1 * 100 + _OFF)) <= 1
        assert abs(row["l2_e2"] - math.floor(l2 * 100 + _OFF)) <= 1
        assert abs(row["lcv_e6"] - math.floor(l2 / l1 * 1e6 + _OFF)) <= 2
        assert abs(row["lskew_e6"] - math.floor(l3 / l2 * 1e6 + _OFF)) <= 2
        assert abs(row["lkurt_e6"] - math.floor(l4 / l2 * 1e6 + _OFF)) <= 2
        # Hosking bounds: |tau3| < 1, tau4 in [(5*tau3^2-1)/4, 1)
        assert -1_000_000 < row["lskew_e6"] < 1_000_000


def test_zero_inflation_matches_formula(spark):
    out = {r["event_type"]: r for r in q_zero_inflation(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["hr"] = ev["ts"].astype("int64") // 1_000_000_000 // 3600
    for et, grp in ev.groupby("event_type"):
        cnt = Counter(grp["hr"])
        span = int(max(cnt) - min(cnt) + 1)
        n0 = span - len(cnt)
        tot = sum(cnt.values())
        lam = tot / span
        p0 = math.exp(-lam)
        den2 = span * p0 * (1 - p0) - span * lam * p0 * p0
        if span < 10 or den2 <= 0:
            assert et not in out
            continue
        z = (n0 - span * p0) / math.sqrt(den2)
        row = out[et]
        assert (row["span"], row["n0"], row["tot"]) == (span, n0, tot)
        assert abs(row["z_e4"] - math.floor(z * 1e4 + 0.5)) <= 1


def test_laplace_trend_matches_formula(spark):
    out = {r["event_type"]: r for r in q_laplace_trend(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["sec"] = ev["ts"].astype("int64") // 1_000_000_000
    for et, grp in ev.groupby("event_type"):
        secs = grp["sec"].astype(int)
        t0, t1 = int(secs.min()), int(secs.max())
        tt = t1 - t0
        n = len(secs)
        if tt <= 0 or n < 10:
            assert et not in out
            continue
        su = int((secs - t0).sum())
        z = (su / n / tt - 0.5) * math.sqrt(12 * n)
        row = out[et]
        assert (row["n"], row["span_s"]) == (n, tt)
        assert abs(row["z_e4"] - math.floor(z * 1e4 + 0.5)) <= 1


def test_caps_profile_matches_re(spark):
    import re

    out = {r["lang"]: r for r in q_caps_profile(spark, SF).collect()}
    docs = _docs(spark)
    for lang, grp in docs.groupby("lang"):
        n_words = sum(len(t.strip().split()) for t in grp["text"])
        n_title = sum(
            len(re.findall(r"(^|\s)[A-Z][a-z]+", t)) for t in grp["text"]
        )
        n_allcaps = sum(
            len(re.findall(r"(^|\s)[A-Z]{2,}(\s|$)", t)) for t in grp["text"]
        )
        n_upper = sum(len(re.findall(r"[A-Z]", t)) for t in grp["text"])
        n_alpha = sum(len(re.findall(r"[A-Za-z]", t)) for t in grp["text"])
        row = out[lang]
        assert (row["n_words"], row["n_title"], row["n_allcaps"]) == (
            n_words,
            n_title,
            n_allcaps,
        )
        assert row["title_rate_e6"] == math.floor(
            n_title / n_words * 1e6 + _OFF
        )
        assert row["upper_share_e6"] == math.floor(
            n_upper / n_alpha * 1e6 + _OFF
        )


def test_kpss_level_matches_loop(spark):
    out = {r["event_type"]: r for r in q_kpss_level(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        x = [dd[d] for d in days]
        n = len(x)
        s, q = sum(x), sum(v * v for v in x)
        if n < 10 or n * q - s * s <= 0:
            assert et not in out
            continue
        cum = 0
        ss = 0
        for t, v in enumerate(x, 1):
            cum += v
            ss += (n * cum - t * s) ** 2
        eta = ss / (n * n * (n * q - s * s))
        row = out[et]
        assert (row["n"], row["ss"]) == (n, ss)
        assert row["eta_e6"] == math.floor(eta * 1e6 + _OFF)


def test_user_specialization_matches_counter(spark):
    row = q_user_specialization(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    hhi_sum = 0.0
    n_spec = 0
    k_sum = 0
    users = 0
    for _uid, grp in ev.groupby("user_id"):
        cnt = Counter(grp["event_type"])
        tot = sum(cnt.values())
        c2 = sum(c * c for c in cnt.values())
        hhi_sum += c2 / (tot * tot)
        n_spec += 2 * c2 > tot * tot
        k_sum += len(cnt)
        users += 1
    assert row["n_users"] == users
    assert row["n_specialists"] == n_spec
    assert abs(row["mean_hhi_e6"] - math.floor(hhi_sum / users * 1e6 + 0.5)) <= 1
    assert row["spec_share_e6"] == math.floor(n_spec / users * 1e6 + _OFF)
    assert row["mean_k_e4"] == math.floor(k_sum / users * 1e4 + _OFF)


def test_medcouple_matches_loop(spark):
    out = {r["event_type"]: r for r in q_medcouple(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        xs = sorted(dd.values())
        med = xs[(len(xs) - 1) // 2]
        lo = [x for x in xs if x < med]
        hi = [x for x in xs if x > med]
        hs = sorted(
            ((xj - med) - (med - xi)) / (xj - xi) for xi in lo for xj in hi
        )
        if not hs:
            assert et not in out
            continue
        mc = hs[(len(hs) - 1) // 2]
        row = out[et]
        assert row["n_pairs"] == len(hs)
        assert row["mc_e6"] == math.floor(mc * 1e6 + _OFF)
        assert -1_000_000 <= row["mc_e6"] <= 1_000_000


def test_ulcer_index_matches_loop(spark):
    out = {r["event_type"]: r for r in q_ulcer_index(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(dict)
    for (et, day), c in daily.items():
        per[et][day] = c
    for et, dd in per.items():
        days = sorted(dd)
        rmax = 0
        sdd = 0.0
        for d in days:
            rmax = max(rmax, dd[d])
            pct = (rmax - dd[d]) / rmax * 100.0
            sdd += pct * pct
        ui = math.sqrt(sdd / len(days))
        row = out[et]
        assert row["n"] == len(days)
        assert row["peak"] == rmax
        assert abs(row["ui_e4"] - math.floor(ui * 1e4 + 0.5)) <= 1


def test_expected_shortfall_matches_loop(spark):
    out = {
        r["event_type"]: r for r in q_expected_shortfall(spark, SF).collect()
    }
    daily = _daily_counts(spark)
    per = defaultdict(list)
    for (et, _day), c in daily.items():
        per[et].append(c)
    for et, cs in per.items():
        xs = sorted(cs)
        n = len(xs)
        k = max(1, n // 20)
        tail = xs[:k]
        row = out[et]
        assert (row["n"], row["k"]) == (n, k)
        assert row["var_k"] == xs[k - 1]
        assert row["es_e4"] == math.floor(sum(tail) / k * 1e4 + _OFF)
        assert row["es_e4"] <= row["var_k"] * 10_000


def test_median_ci_matches_loop(spark):
    out = {r["event_type"]: r for r in q_median_ci(spark, SF).collect()}
    daily = _daily_counts(spark)
    per = defaultdict(list)
    for (et, _day), c in daily.items():
        per[et].append(c)
    for et, cs in per.items():
        xs = sorted(cs)
        n = len(xs)
        if n < 6:
            assert et not in out
            continue
        lo_rk = max(1, math.floor((n - 1.96 * math.sqrt(n)) / 2))
        hi_rk = min(n, n + 1 - lo_rk)
        row = out[et]
        assert row["n"] == n
        assert row["lo"] == xs[lo_rk - 1]
        assert row["med"] == xs[(n - 1) // 2]
        assert row["hi"] == xs[hi_rk - 1]
        assert row["lo"] <= row["med"] <= row["hi"]


def test_max_outage_matches_loop(spark):
    out = {r["event_type"]: r for r in q_max_outage(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["hr"] = ev["ts"].astype("int64") // 1_000_000_000 // 3600
    for et, grp in ev.groupby("event_type"):
        hrs = sorted(set(grp["hr"]))
        silences = [b - a - 1 for a, b in zip(hrs, hrs[1:])]
        row = out[et]
        assert row["n_hours"] == len(hrs)
        assert row["max_silent"] == (max(silences) if silences else 0)
        assert row["n_outages_3h"] == sum(1 for s in silences if s >= 3)
        assert row["total_silent"] == sum(silences)


def test_diel_fwhm_matches_loop(spark):
    out = {r["event_type"]: r for r in q_diel_fwhm(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["hr"] = ev["ts"].dt.hour
    for et, grp in ev.groupby("event_type"):
        cnt = Counter(grp["hr"])
        peak = max(cnt.values())
        peak_hr = min(h for h, c in cnt.items() if c == peak)
        fwhm = sum(1 for c in cnt.values() if 2 * c >= peak)
        tot = sum(cnt.values())
        nh = len(cnt)
        pmr = peak * nh / tot
        row = out[et]
        assert (row["peak_hr"], row["peak"], row["fwhm_hours"]) == (
            peak_hr,
            peak,
            fwhm,
        )
        assert row["peak_mean_ratio_e4"] == math.floor(pmr * 1e4 + _OFF)
