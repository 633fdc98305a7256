"""Pure-numpy tree ensembles: random forest + gradient boosting.

The reference's gap-filling model family is sklearn's
``RandomForestRegressor`` (M1-M3,
/root/reference/diive/pkgs/gapfilling/randomforest_ts.py:431-495) and an
XGBoost variant (M5, xgboost_ts.py); neither library ships in this
container, so this module implements the standard histogram CART
algorithm (quantile-binned features, level-wise split search — the
LightGBM/XGBoost "hist" construction, public knowledge) in vectorized
numpy:

  * features are quantile-binned to <=256 uint8 codes once per fit;
  * each tree level computes per-(node, feature, bin) histograms of
    (weight, sum_y) with ``np.bincount`` — one vectorized pass per
    feature, no per-node Python loop;
  * the best split per node maximizes the SSE reduction
    sum_L^2/n_L + sum_R^2/n_R (variance gain), subject to
    ``min_samples_leaf``;
  * bootstrap resampling enters as integer sample WEIGHTS in the same
    bincounts (no data copies);
  * per-tree feature subsampling (``colsample``) provides the forest's
    decorrelation (per-split sampling would forbid the level-wise
    vectorization; per-tree is the classic Ho-1998 random-subspace
    variant).

Gradient boosting reuses the same tree builder on residuals with a
learning rate and optional row subsampling.

Everything is deterministic given ``seed`` — the Spark kernels seed per
series key, so results are independent of partitioning.
"""

from __future__ import annotations

import numpy as np

MAX_BINS = 256


def _adaptive_bins(n: int, max_bins: int = MAX_BINS) -> int:
    """Bin count scaled to the sample: ~4 samples per bin floor, min 16.
    256 bins on a 100-row series is statistical overkill AND makes the
    per-level histogram arrays 10x larger than the data."""
    return int(min(max_bins, max(16, n // 4)))


def _quantile_bin(X: np.ndarray, max_bins: int = MAX_BINS):
    """Per-feature quantile bin edges + uint8 codes.

    Returns (codes (n, F) uint8, edges list of per-feature arrays).
    """
    n, f = X.shape
    codes = np.zeros((n, f), dtype=np.uint8)
    edges = []
    qs = np.linspace(0.0, 1.0, max_bins + 1)[1:-1]
    for j in range(f):
        e = np.unique(np.quantile(X[:, j], qs))
        codes[:, j] = np.searchsorted(e, X[:, j], side="right").astype(np.uint8)
        edges.append(e)
    return codes, edges


def _apply_bins(X: np.ndarray, edges) -> np.ndarray:
    n, f = X.shape
    codes = np.zeros((n, f), dtype=np.uint8)
    for j in range(f):
        codes[:, j] = np.searchsorted(edges[j], X[:, j], side="right").astype(
            np.uint8
        )
    return codes


def _build_tree(
    codes: np.ndarray,
    y: np.ndarray,
    w: np.ndarray,
    feat_idx: np.ndarray,
    max_depth: int,
    min_samples_leaf: int,
    n_bins: int = MAX_BINS,
    rng: np.random.Generator | None = None,
    colsample_bynode: float | None = None,
):
    """Level-wise histogram CART on pre-binned features.

    Returns (split_feat, split_bin, leaf_value) arrays in implicit
    heap layout: node i has children 2i+1 / 2i+2; split_feat == -1
    marks a leaf.  All rows participate via weights (w == 0 rows are
    out-of-bag — they traverse but never contribute to histograms).

    ``colsample_bynode`` adds sklearn-style PER-SPLIT feature sampling
    without giving up the level-wise vectorization: histograms are still
    one bincount pass over every candidate feature, and each node's gain
    matrix is then masked to its own random feature subset before the
    argmax (the XGBoost ``colsample_bynode`` construction).
    """
    n = len(y)
    n_nodes = 2 ** (max_depth + 1) - 1
    split_feat = np.full(n_nodes, -1, dtype=np.int32)
    split_bin = np.zeros(n_nodes, dtype=np.int32)
    leaf_value = np.zeros(n_nodes, dtype=np.float64)

    node = np.zeros(n, dtype=np.int64)  # heap index per row
    wy = w * y
    tot_w = w.sum()
    leaf_value[0] = wy.sum() / tot_w if tot_w > 0 else 0.0

    n_f = len(feat_idx)
    codes_sel = codes[:, feat_idx].astype(np.int64)  # (n, n_f)
    foff = np.arange(n_f, dtype=np.int64) * n_bins  # per-feature key offset

    level_start = 0
    for depth in range(max_depth):
        k = 2**depth  # nodes at this level
        rel = node - level_start
        active = (rel >= 0) & (rel < k)
        if not active.any():
            break
        # ONE bincount pair over (node, feature, bin) keys for ALL
        # features — per-feature passes were overhead-bound on the short
        # series this kernel typically sees
        w_a, wy_a = w[active], wy[active]
        key = (
            rel[active, None] * (n_f * n_bins) + foff[None, :] + codes_sel[active]
        ).ravel()
        rep_w = np.broadcast_to(w_a[:, None], (len(w_a), n_f)).ravel()
        rep_wy = np.broadcast_to(wy_a[:, None], (len(wy_a), n_f)).ravel()
        size = k * n_f * n_bins
        cw = np.bincount(key, weights=rep_w, minlength=size).reshape(k, n_f, n_bins)
        cwy = np.bincount(key, weights=rep_wy, minlength=size).reshape(k, n_f, n_bins)
        # prefix over bins: split "bin <= b goes left"
        lw = np.cumsum(cw, axis=2)[:, :, :-1]
        lwy = np.cumsum(cwy, axis=2)[:, :, :-1]
        tw = lw[:, :, -1:] + cw[:, :, -1:]
        twy = lwy[:, :, -1:] + cwy[:, :, -1:]
        rw = tw - lw
        rwy = twy - lwy
        ok = (lw >= min_samples_leaf) & (rw >= min_samples_leaf)
        with np.errstate(divide="ignore", invalid="ignore"):
            gain = (
                np.where(ok, lwy * lwy / np.where(lw > 0, lw, 1.0), 0.0)
                + np.where(ok, rwy * rwy / np.where(rw > 0, rw, 1.0), 0.0)
                - np.where(tw > 0, twy * twy / np.where(tw > 0, tw, 1.0), 0.0)
            )
        gain = np.where(ok, gain, 0.0)
        if colsample_bynode is not None:
            # per-node random feature subset: mask the gain matrix, keep
            # the vectorized histogram pass (mtry smallest ranks win).
            # An int is an EXPLICIT mtry (sklearn max_features mapping —
            # fit_forest floors like sklearn does); a float is a fraction.
            if isinstance(colsample_bynode, (int, np.integer)) and not isinstance(
                colsample_bynode, bool
            ):
                mtry = int(min(n_f, max(1, colsample_bynode)))
            else:
                mtry = max(1, int(round(colsample_bynode * n_f)))
            if mtry < n_f:
                ranks = np.argsort(rng.random((k, n_f)), axis=1).argsort(axis=1)
                gain = np.where((ranks < mtry)[:, :, None], gain, 0.0)
        flat = gain.reshape(k, n_f * (n_bins - 1))
        gi = np.argmax(flat, axis=1)
        gv = flat[np.arange(k), gi]
        has_gain = gv > 1e-12
        best_feat = np.where(has_gain, feat_idx[gi // (n_bins - 1)], -1)
        best_bin = np.where(has_gain, gi % (n_bins - 1), 0)

        made_split = best_feat >= 0
        if not made_split.any():
            break
        node_ids = level_start + np.arange(k)
        split_feat[node_ids] = np.where(made_split, best_feat, -1).astype(np.int32)
        split_bin[node_ids] = best_bin.astype(np.int32)

        # route rows; rows in non-split nodes keep their node id (it
        # falls out of later levels' [level_start, level_start+k) window
        # and its leaf_value is already final)
        act_idx = np.flatnonzero(active)
        r_act = rel[active]
        f_act = best_feat[r_act]
        has = f_act >= 0
        moved = act_idx[has]
        go_right = (
            codes[moved, f_act[has]] > best_bin[r_act[has]]
        ).astype(np.int64)
        node[moved] = (level_start + k) + 2 * r_act[has] + go_right

        # leaf values for the new level (weighted means)
        next_start = level_start + k
        nk = 2 * k
        relc = node - next_start
        in_next = (relc >= 0) & (relc < nk)
        if in_next.any():
            cw = np.bincount(relc[in_next], weights=w[in_next], minlength=nk)
            cwy = np.bincount(relc[in_next], weights=wy[in_next], minlength=nk)
            with np.errstate(divide="ignore", invalid="ignore"):
                lv = np.where(cw > 0, cwy / cw, 0.0)
            # empty children inherit the parent mean (possible when the
            # in-bag histogram and the routed rows disagree via w == 0)
            parent = leaf_value[level_start : level_start + k]
            inherit = np.repeat(parent, 2)
            leaf_value[next_start : next_start + nk] = np.where(cw > 0, lv, inherit)
        level_start += k

    return split_feat, split_bin, leaf_value


def _tree_predict(codes: np.ndarray, tree, depth: int | None = None) -> np.ndarray:
    """Traverse to ``depth`` levels (default: the tree's own depth).

    Depth-truncated prediction is EXACT equivalence to a tree grown with
    that max_depth: level-wise split decisions at levels < d never look at
    the depth limit, and every node (internal included) stores its
    weighted-mean value — the grid-search fast path below leans on this.
    """
    split_feat, split_bin, leaf_value = tree
    n = len(codes)
    node = np.zeros(n, dtype=np.int64)
    # max depth implied by array length
    full_depth = int(np.log2(len(split_feat) + 1)) - 1
    depth = full_depth if depth is None else min(depth, full_depth)
    level_start = 0
    for d in range(depth):
        k = 2**d
        f = split_feat[node]
        is_split = f >= 0
        b = split_bin[node]
        right = np.zeros(n, dtype=np.int64)
        idx = np.flatnonzero(is_split)
        if len(idx):
            right[idx] = (
                codes[idx, f[idx]] > b[idx]
            ).astype(np.int64)
        rel = node - level_start
        child = level_start + k + 2 * rel + right
        node = np.where(is_split & (rel >= 0) & (rel < k), child, node)
        level_start += k
    return leaf_value[node]


def fit_forest(
    X: np.ndarray,
    y: np.ndarray,
    n_estimators: int = 20,
    max_depth: int = 5,
    min_samples_leaf: int = 3,
    colsample: float = 0.8,
    colsample_bynode: float | None = None,
    max_features: float | int | str | None = None,
    seed: int = 0,
):
    """Random forest: bootstrap weights + per-tree feature subsample;
    ``colsample_bynode`` additionally re-samples the candidate features at
    EVERY split (sklearn ``max_features`` semantics).

    ``max_features`` is the sklearn-spelled alias reference users pass
    through RandomForestTS kwargs (randomforest_ts.py:251 feeds **kwargs
    straight to RandomForestRegressor): float fraction, int count,
    'sqrt'/'log2', or 1.0/None for all features — mapped onto
    ``colsample_bynode``'s per-split sampling."""
    if max_features is not None:
        # ADVICE r3: sklearn FLOORS ('sqrt' on 8 features -> mtry 2, not
        # round(sqrt(8))=3) — carry an explicit integer mtry through to
        # _build_tree instead of a fraction that gets re-rounded.
        f_all = X.shape[1]
        if max_features == "sqrt":
            mtry = max(1, int(np.sqrt(f_all)))
        elif max_features == "log2":
            mtry = max(1, int(np.log2(f_all)))
        elif isinstance(max_features, (int, np.integer)) and not isinstance(
            max_features, bool
        ):
            mtry = int(max_features)
        else:
            mtry = max(1, int(float(max_features) * f_all))
        colsample_bynode = min(f_all, max(1, mtry))
        colsample = 1.0  # sklearn samples per split over ALL features
    rng = np.random.default_rng(seed)
    nb = _adaptive_bins(len(y))
    codes, edges = _quantile_bin(X, nb)
    n, f = X.shape
    n_feats = max(1, int(round(colsample * f)))
    trees = []
    for _ in range(n_estimators):
        w = np.bincount(rng.integers(0, n, n), minlength=n).astype(np.float64)
        feat_idx = np.sort(rng.choice(f, size=n_feats, replace=False))
        trees.append(
            _build_tree(
                codes, y, w, feat_idx, max_depth, min_samples_leaf, nb,
                rng=rng, colsample_bynode=colsample_bynode,
            )
        )
    return {"kind": "rf", "trees": trees, "edges": edges}


def fit_gbt(
    X: np.ndarray,
    y: np.ndarray,
    n_estimators: int = 50,
    max_depth: int = 3,
    min_samples_leaf: int = 3,
    learning_rate: float = 0.3,
    subsample: float = 1.0,
    colsample_bynode: float | None = None,
    seed: int = 0,
):
    """Gradient-boosted trees on squared loss (residual fitting)."""
    rng = np.random.default_rng(seed)
    nb = _adaptive_bins(len(y))
    codes, edges = _quantile_bin(X, nb)
    n, f = X.shape
    base = float(np.mean(y))
    resid = y - base
    feat_idx = np.arange(f)
    trees = []
    for _ in range(n_estimators):
        if subsample < 1.0:
            w = (rng.random(n) < subsample).astype(np.float64)
        else:
            w = np.ones(n)
        tree = _build_tree(
            codes, resid, w, feat_idx, max_depth, min_samples_leaf, nb,
            rng=rng, colsample_bynode=colsample_bynode,
        )
        pred = _tree_predict(codes, tree)
        resid = resid - learning_rate * pred
        trees.append(tree)
    return {
        "kind": "gbt",
        "trees": trees,
        "edges": edges,
        "base": base,
        "lr": learning_rate,
    }


def predict(
    model,
    X: np.ndarray,
    n_trees: int | None = None,
    depth: int | None = None,
) -> np.ndarray:
    """``n_trees``/``depth`` evaluate a PREFIX of the ensemble.

    For an rf fit WITHOUT per-split feature sampling, trees[:k] of an
    n-tree fit are bit-identical to a k-tree fit (one rng stream, two
    draws per tree regardless of depth) and depth-truncated traversal is
    bit-identical to a shallower fit — so one (max trees, max depth) fit
    answers the whole (n_estimators × max_depth) grid.  For gbt only the
    n_trees prefix is exact (residuals depend on depth)."""
    codes = _apply_bins(X, model["edges"])
    trees = model["trees"] if n_trees is None else model["trees"][:n_trees]
    preds = np.stack([_tree_predict(codes, t, depth=depth) for t in trees])
    if model["kind"] == "rf":
        return preds.mean(axis=0)
    return model["base"] + model["lr"] * preds.sum(axis=0)
