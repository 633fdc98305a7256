"""queries_stats4 — BH-FDR / stickiness / session paths / reciprocity /
BFS / char entropy pinned against independent oracles at sf0.001."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np

from diive_spark.queries_stats2 import _OFF
from diive_spark.queries_stats4 import (
    _BFS_ROUNDS,
    _BH_Q,
    q_bfs_depths,
    q_bh_fdr_runs,
    q_char_entropy_lang,
    q_graph_reciprocity,
    q_session_paths,
    q_stickiness_dau_wau,
)

SF = "/root/testdata/sf0.001"


def test_bh_fdr_matches_stepup(spark):
    rows = q_bh_fdr_runs(spark, SF).collect()
    m = len(rows)
    assert m > 0
    # check the BH step-up logic exactly on the query's OWN p-values
    # (the CDF itself is pinned against math.erfc below).
    ps = [r["p_e6"] / 1e6 for r in sorted(rows, key=lambda r: r["rank"])]
    assert ps == sorted(ps)
    ks = [i + 1 for i, p in enumerate(ps) if p <= (i + 1) * _BH_Q / m]
    k = max(ks) if ks else 0
    for r in rows:
        assert r["rejected"] == (1 if r["rank"] <= k else 0)


def test_bh_pvalues_match_normal_cdf(spark):
    from diive_spark.queries_stats3 import q_runs_test

    z = {r["user_id"]: r["z_e4"] / 1e4 for r in q_runs_test(spark, SF).collect()}
    rows = q_bh_fdr_runs(spark, SF).collect()
    # exact two-sided normal p via the stdlib complementary error
    # function: 2 * (1 - Phi(|z|)) = erfc(|z| / sqrt(2))
    got = sorted(r["p_e6"] for r in rows)
    want = sorted(
        math.floor(math.erfc(abs(v) / math.sqrt(2)) * 1e6 + _OFF)
        for v in z.values()
    )
    assert len(got) == len(want)
    # A&S 7.1.26 absolute error < 7.5e-8 -> after e6 scaling p differs
    # by at most 1 count from the exact CDF
    assert all(abs(a - b) <= 1 for a, b in zip(got, want))


def test_stickiness_matches_counter(spark):
    out = {r["day"]: r for r in q_stickiness_dau_wau(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    ud = ev[["day", "user_id"]].drop_duplicates()
    days = sorted(ud["day"].unique())
    for d in days:
        dau = ud[ud["day"] == d]["user_id"].nunique()
        wau = ud[(ud["day"] >= d - 6) & (ud["day"] <= d)]["user_id"].nunique()
        row = out[d]
        assert (row["dau"], row["wau"]) == (dau, wau)
        assert row["stickiness_e4"] == math.floor(dau / wau * 1e4 + _OFF)
        assert row["dau"] <= row["wau"]


def test_session_paths_matches_counter(spark):
    rows = q_session_paths(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    ev["ts_us"] = ev["ts"].astype("int64") // 1000
    ev = ev.sort_values(["user_id", "day", "ts_us", "event_id"])
    c = Counter()
    for _, grp in ev.groupby(["user_id", "day"]):
        t = grp["event_type"].tolist()
        for i in range(len(t) - 2):
            c[f"{t[i]}>{t[i + 1]}>{t[i + 2]}"] += 1
    total = sum(c.values())
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert len(rows) == min(10, len(top))
    for rank, (path, cnt) in enumerate(top, start=1):
        row = next(r for r in rows if r["rank"] == rank)
        assert (row["path"], row["c"]) == (path, cnt)
        assert row["share_e6"] == math.floor(cnt / total * 1e6 + _OFF)


def _edges_directed(spark):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .toPandas()
        .sort_values(["lang", "doc_id"])
    )
    e = set()
    for _, grp in docs.groupby("lang"):
        src = grp["source"].tolist()
        for a, b in zip(src, src[1:]):
            if a != b:
                e.add((a, b))
    return e


def test_reciprocity_matches_set_logic(spark):
    row = q_graph_reciprocity(spark, SF).collect()[0]
    e = _edges_directed(spark)
    recip = sum(1 for a, b in e if (b, a) in e)
    assert row["n_edges"] == len(e)
    assert row["n_recip"] == recip
    assert row["reciprocity_e6"] == math.floor(recip / len(e) * 1e6 + _OFF)


def test_bfs_six_rounds_is_true_bfs(spark):
    out = {r["n"]: r["depth"] for r in q_bfs_depths(spark, SF).collect()}
    e = _edges_directed(spark)
    und = {(min(a, b), max(a, b)) for a, b in e}
    adj: dict[str, set[str]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(v) for n, v in adj.items()}
    src = sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    # true BFS
    depth = {src: 0}
    frontier = [src]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in depth:
                    depth[v] = d
                    nxt.append(v)
        frontier = nxt
    reachable6 = {n: dd for n, dd in depth.items() if dd <= _BFS_ROUNDS}
    assert out == reachable6


def test_char_entropy_matches_counter(spark):
    out = {r["lang"]: r for r in q_char_entropy_lang(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    for lang, grp in docs.groupby("lang"):
        c = Counter(ch for t in grp["text"] for ch in t)
        n = sum(c.values())
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        row = out[lang]
        assert row["n_chars_distinct"] == len(c)
        assert row["n"] == n
        assert abs(row["entropy_e4"] - math.floor(h * 1e4 + 0.5)) <= 1
        # entropy bounded by log of alphabet size
        assert row["entropy_e4"] <= math.floor(math.log(len(c)) * 1e4) + 1


def test_energy_distance_matches_numpy(spark):
    from diive_spark.queries_stats4 import q_energy_distance

    out = {
        (r["la"], r["lb"]): r for r in q_energy_distance(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    langs = sorted(docs["lang"].unique())
    arr = {
        lg: docs[docs["lang"] == lg]["n_chars"].to_numpy(dtype=np.int64)
        for lg in langs
    }
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            x, y = arr[la], arr[lb]
            sxy = np.abs(x[:, None] - y[None, :]).sum()
            sxx = np.abs(x[:, None] - x[None, :]).sum()
            syy = np.abs(y[:, None] - y[None, :]).sum()
            ed2 = (
                2 * sxy / (len(x) * len(y))
                - sxx / len(x) ** 2
                - syy / len(y) ** 2
            )
            row = out[(la, lb)]
            assert (row["n_a"], row["n_b"]) == (len(x), len(y))
            assert abs(row["ed2_e4"] - math.floor(ed2 * 1e4 + _OFF)) <= 1
            # energy distance is nonnegative
            assert row["ed2_e4"] >= 0


def test_basket_lift_matches_counter(spark):
    from diive_spark.queries_stats4 import q_basket_lift

    out = {(r["ta"], r["tb"]): r for r in q_basket_lift(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    baskets = ev.groupby(["user_id", "day"])["event_type"].apply(set)
    n = len(baskets)
    types = sorted(ev["event_type"].unique())
    c1 = {t: sum(1 for b in baskets if t in b) for t in types}
    for ta in types:
        for tb in types:
            if ta == tb:
                continue
            cab = sum(1 for b in baskets if ta in b and tb in b)
            if cab == 0:
                assert (ta, tb) not in out
                continue
            row = out[(ta, tb)]
            assert row["c_ab"] == cab
            assert row["support_e6"] == math.floor(cab / n * 1e6 + _OFF)
            assert row["confidence_e6"] == math.floor(cab / c1[ta] * 1e6 + _OFF)
            assert abs(
                row["lift_e4"] - math.floor(cab * n / (c1[ta] * c1[tb]) * 1e4 + _OFF)
            ) <= 1


def test_trending_terms_matches_counter(spark):
    from diive_spark.queries_stats4 import q_trending_terms

    rows = q_trending_terms(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    docs["bucket"] = docs["doc_id"] // 100
    lb = docs["bucket"].max()
    a_cnt: Counter = Counter()
    b_cnt: Counter = Counter()
    for _, r in docs.iterrows():
        toks = r["text"].strip().split()
        tgt = a_cnt if r["bucket"] == lb else b_cnt
        tgt.update(toks)
    ta, tb = sum(a_cnt.values()), sum(b_cnt.values())
    scored = {}
    for w, a in a_cnt.items():
        if a < 3:
            continue
        b = b_cnt.get(w, 0)
        lor = math.log(((a + 0.5) / (ta - a + 0.5)) / ((b + 0.5) / (tb - b + 0.5)))
        scored[w] = (a, b, math.floor(lor * 1e4 + _OFF))
    top = sorted(scored.items(), key=lambda kv: (-kv[1][2], kv[0]))[:10]
    assert len(rows) == min(10, len(top))
    for rank, (w, (a, b, lor_e4)) in enumerate(top, start=1):
        row = next(r for r in rows if r["rank"] == rank)
        assert (row["w"], row["a"], row["b"]) == (w, a, b)
        assert abs(row["log_or_e4"] - lor_e4) <= 1


def _hourly_pd4(spark):
    from diive_spark.queries_stats2 import _OFF as OFF

    df = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    df["t"] = (df["ts"].astype("int64") // 10**9 // 3600) * 3600
    g = df.groupby(["user_id", "t"])["value"].mean().reset_index()
    g["v"] = np.floor(g["value"] * 100 + OFF)
    return g.sort_values(["user_id", "t"])


def test_pettitt_matches_bruteforce(spark):
    from diive_spark.queries_stats4 import q_pettitt_test

    out = {r["user_id"]: r for r in q_pettitt_test(spark, SF).collect()}
    g = _hourly_pd4(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy()
        n = len(v)
        # brute-force U_t = sum_{i<=t} sum_{j>t} sign(x_j - x_i)
        k = 0
        for t in range(1, n):
            u = int(np.sign(v[t:][None, :] - v[:t][:, None]).sum())
            k = max(k, abs(u))
        p = min(2 * math.exp(-6 * k * k / (n**3 + n**2)), 1.0)
        row = out[uid]
        assert row["n"] == n
        assert row["k_stat"] == k
        assert abs(row["p_e6"] - math.floor(p * 1e6 + _OFF)) <= 1


def test_buishand_matches_numpy(spark):
    from diive_spark.queries_stats4 import q_buishand_range

    out = {r["user_id"]: r for r in q_buishand_range(spark, SF).collect()}
    g = _hourly_pd4(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy(dtype=float)
        n = len(v)
        s = np.cumsum(v - v.mean())
        q = (s.max() - s.min())
        rb = q / (v.std() * math.sqrt(n))
        row = out[uid]
        assert row["n"] == n
        assert row["q_n_scaled"] == int(round(q * n))
        assert abs(row["rb_e4"] - math.floor(rb * 1e4 + _OFF)) <= 1


def test_snht_matches_numpy(spark):
    from diive_spark.queries_stats4 import q_snht_test

    out = {r["user_id"]: r for r in q_snht_test(spark, SF).collect()}
    g = _hourly_pd4(spark)
    for uid, grp in list(g.groupby("user_id"))[:8]:
        v = grp["v"].to_numpy(dtype=float)
        n = len(v)
        s = v.std()
        if s == 0:
            assert uid not in out
            continue
        best_t, best_k = -1.0, -1
        for k in range(1, n):
            z1 = (v[:k].mean() - v.mean()) / s
            z2 = (v[k:].mean() - v.mean()) / s
            tk = k * z1 * z1 + (n - k) * z2 * z2
            if tk > best_t:
                best_t, best_k = tk, k
        row = out[uid]
        assert row["n"] == n
        assert row["k_hat"] == best_k
        assert abs(row["t_e4"] - math.floor(best_t * 1e4 + _OFF)) <= 1


def test_json_props_stats_matches_pandas(spark):
    import json as _json

    from diive_spark.queries_stats4 import q_json_props_stats

    out = {r["event_type"]: r for r in q_json_props_stats(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()

    def _k(s):
        try:
            v = _json.loads(s).get("k")
            return int(v) if v is not None else None
        except Exception:
            return None

    ev["k"] = ev["props"].map(_k)
    for et, grp in ev.groupby("event_type"):
        k = grp["k"].dropna().to_numpy(dtype=np.int64)
        row = out[et]
        assert row["n"] == len(grp)
        assert row["n_null"] == int(grp["k"].isna().sum())
        assert row["sk"] == int(k.sum())
        assert (row["k_min"], row["k_max"]) == (int(k.min()), int(k.max()))
        mean = k.sum() / len(k)
        var = (np.sum(k.astype(float) ** 2) - k.sum() ** 2 / len(k)) / (len(k) - 1)
        assert abs(row["mean_e4"] - math.floor(mean * 1e4 + _OFF)) <= 1
        assert abs(row["var_e4"] - math.floor(var * 1e4 + _OFF)) <= 1


def test_json_props_corr_matches_numpy(spark):
    import json as _json

    from diive_spark.queries_stats4 import q_json_props_corr

    out = {r["event_type"]: r for r in q_json_props_corr(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["k"] = ev["props"].map(lambda s: _json.loads(s).get("k"))
    ev["v"] = np.floor(ev["value"] * 100 + _OFF)
    ev = ev.dropna(subset=["k"])
    for et, grp in ev.groupby("event_type"):
        k = grp["k"].to_numpy(dtype=float)
        v = grp["v"].to_numpy(dtype=float)
        if len(k) < 2 or k.std() == 0 or v.std() == 0:
            assert et not in out
            continue
        r = np.corrcoef(k, v)[0, 1]
        row = out[et]
        assert row["n"] == len(k)
        assert abs(row["corr_e6"] - math.floor(r * 1e6 + _OFF)) <= 2


def test_new_user_share_matches_pandas(spark):
    from diive_spark.queries_stats4 import q_new_user_share

    out = {r["day"]: r for r in q_new_user_share(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    ud = ev[["day", "user_id"]].drop_duplicates()
    first = ud.groupby("user_id")["day"].min()
    for d, grp in ud.groupby("day"):
        dau = len(grp)
        n_new = int((first.loc[grp["user_id"]] == d).sum())
        row = out[d]
        assert (row["dau"], row["n_new"]) == (dau, n_new)
        assert row["new_share_e6"] == math.floor(n_new / dau * 1e6 + _OFF)


def test_churn_labels_matches_pandas(spark):
    from diive_spark.queries_stats4 import q_churn_labels

    out = {r["day"]: r for r in q_churn_labels(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    ud = ev[["day", "user_id"]].drop_duplicates()
    max_day = ud["day"].max()
    got = {}
    for uid, grp in ud.groupby("user_id"):
        days = sorted(grp["day"])
        for i, d in enumerate(days):
            if d > max_day - 7:
                continue
            nxt = days[i + 1] if i + 1 < len(days) else None
            churned = nxt is None or nxt > d + 7
            a, c = got.get(d, (0, 0))
            got[d] = (a + 1, c + int(churned))
    assert set(out) == set(got)
    for d, (a, c) in got.items():
        row = out[d]
        assert (row["n_active"], row["n_churned"]) == (a, c)
        assert row["churn_rate_e6"] == math.floor(c / a * 1e6 + _OFF)


def test_lorenz_curve_matches_pandas(spark):
    from diive_spark.queries_stats4 import q_lorenz_curve

    rows = q_lorenz_curve(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    for lang, grp in docs.groupby("lang"):
        per = (
            grp.groupby("source").size().reset_index(name="c")
            .sort_values(["c", "source"]).reset_index(drop=True)
        )
        ns, tot = len(per), per["c"].sum()
        cum = per["c"].cumsum()
        # NTILE quota decile of each rank
        import numpy as _np

        q10 = ns % 10
        big = (ns // 10 + 1) * q10
        lang_rows = [r for r in rows if r["lang"] == lang]
        shares = {}
        for rk in range(1, ns + 1):
            if rk <= big:
                dec = math.ceil(rk / (ns // 10 + 1))
            else:
                dec = q10 + math.ceil((rk - big) / max(ns // 10, 1))
            shares[dec] = (rk, int(cum[rk - 1]))
        for r in lang_rows:
            rk_hi, cumv = shares[r["decile"]]
            assert r["pop_share_e4"] == math.floor(rk_hi / ns * 1e4 + _OFF)
            assert r["doc_share_e4"] == math.floor(cumv / tot * 1e4 + _OFF)
        # Lorenz curve lies below the diagonal (concentration)
        for r in lang_rows:
            assert r["doc_share_e4"] <= r["pop_share_e4"] + 1


def test_cohens_kappa_matches_counter(spark):
    from diive_spark.queries_stats4 import q_cohens_kappa

    out = {r["lang"]: r for r in q_cohens_kappa(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    docs["toks"] = docs["text"].str.strip().str.split()
    docs["ttr_e6"] = docs["toks"].map(
        lambda t: math.floor(len(set(t)) / len(t) * 1e6 + _OFF)
    )
    for lang, grp in docs.groupby("lang"):
        grp = grp.sort_values(["n_chars", "doc_id"])
        n = len(grp)
        med_len = grp["n_chars"].to_numpy()[(n - 1) // 2]
        med_ttr = np.sort(grp["ttr_e6"].to_numpy())[(n - 1) // 2]
        a = (grp["n_chars"] > med_len).to_numpy()
        b = (grp["ttr_e6"] > med_ttr).to_numpy()
        n11 = int((a & b).sum())
        n10 = int((a & ~b).sum())
        n01 = int((~a & b).sum())
        n00 = int((~a & ~b).sum())
        po = (n11 + n00) / n
        pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
        if pe >= 1:
            assert lang not in out
            continue
        kappa = (po - pe) / (1 - pe)
        row = out[lang]
        assert (row["n"], row["n11"], row["n00"]) == (n, n11, n00)
        assert abs(row["kappa_e6"] - math.floor(kappa * 1e6 + _OFF)) <= 1
        assert -1_000_001 <= row["kappa_e6"] <= 1_000_001


def test_cuped_matches_numpy(spark):
    from diive_spark.queries_stats4 import q_cuped_adjustment

    out = {r["event_type"]: r for r in q_cuped_adjustment(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    ev["v"] = np.floor(ev["value"] * 100 + _OFF)
    mid = (ev["day"].min() + ev["day"].max()) // 2
    ev["half"] = (ev["day"] > mid).astype(int)
    for et, grp in ev.groupby("event_type"):
        um = grp.groupby(["user_id", "half"])["v"].agg(["sum", "count"])
        um["m"] = np.floor(um["sum"] / um["count"] * 100 + _OFF)
        x = um.xs(0, level="half")["m"]
        y = um.xs(1, level="half")["m"]
        both = x.index.intersection(y.index)
        xv, yv = x.loc[both].to_numpy(), y.loc[both].to_numpy()
        if len(both) < 2 or xv.std() == 0 or yv.std() == 0:
            assert et not in out
            continue
        cov = np.sum(xv * yv) - xv.sum() * yv.sum() / len(both)
        vx = np.sum(xv * xv) - xv.sum() ** 2 / len(both)
        vy = np.sum(yv * yv) - yv.sum() ** 2 / len(both)
        row = out[et]
        assert row["n"] == len(both)
        assert abs(row["theta_e4"] - math.floor(cov / vx * 1e4 + _OFF)) <= 1
        assert abs(
            row["rho2_e6"] - math.floor(cov * cov / (vx * vy) * 1e6 + _OFF)
        ) <= 1
        assert 0 <= row["rho2_e6"] <= 1_000_001


def test_diff_in_diff_matches_pandas(spark):
    from diive_spark.queries_stats4 import q_diff_in_diff

    row = q_diff_in_diff(spark, SF).collect()[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["day"] = ev["ts"].astype("int64") // 10**9 // 86400
    ev["v"] = np.floor(ev["value"] * 100 + _OFF)
    counts = ev.groupby("event_type").size().reset_index(name="c")
    counts = counts.sort_values(["c", "event_type"], ascending=[False, True])
    treat, ctrl = counts["event_type"].iloc[0], counts["event_type"].iloc[1]
    mid = (ev["day"].min() + ev["day"].max()) // 2
    ev["post"] = (ev["day"] > mid).astype(int)

    def m(et, post):
        g = ev[(ev["event_type"] == et) & (ev["post"] == post)]["v"]
        return g.sum() / len(g), len(g)

    t1, nt1 = m(treat, 1)
    t0, nt0 = m(treat, 0)
    c1, nc1 = m(ctrl, 1)
    c0, nc0 = m(ctrl, 0)
    did = (t1 - t0) - (c1 - c0)
    assert (
        row["n_treat_pre"],
        row["n_treat_post"],
        row["n_ctrl_pre"],
        row["n_ctrl_post"],
    ) == (nt0, nt1, nc0, nc1)
    assert abs(row["did_e4"] - math.floor(did * 1e4 + _OFF)) <= 1
