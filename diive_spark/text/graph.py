"""Distributed connected components for near-duplicate clustering.

Pairwise dedup (MinHash-LSH / SimHash) emits EDGES; a curation pipeline
needs CLUSTERS — "keep one doc per connected component of the near-dup
graph" (the Gopher / RefinedWeb / SlimPajama procedure).  Naive min-label
propagation needs O(graph diameter) rounds — a duplicate CHAIN
(A~B~C~...~Z, common with boilerplate drift) makes that linear.  This
module implements the alternating large-star / small-star algorithm of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14):
O(log^2 n) rounds, each round two map-side-combinable shuffles on node id
— the standard shape for trillion-edge graphs and the right posture for a
10^12-document crawl.

Every round is pure DataFrame algebra (groupBy-min + equi-join); the
driver loop only compares a (count, xor-of-hashes) fingerprint per round,
so nothing about the graph ever reaches the driver.  ``localCheckpoint``
truncates the iterative lineage (the local stand-in for
``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` on a cluster).

Reference analog: diive has no graph ops; this generalizes its
dedup-keep-last "pick one representative per group" pattern
(/root/reference/diive/core/times/times.py:804-821) from equal timestamps
to connected similarity components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "cluster_sizes", "pagerank", "triangle_count"]


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set stored high→low: (a, b) with a > b, distinct."""
    return (
        e.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """large-star(u): connect every STRICTLY LARGER neighbor of u to
    m = min(Γ(u) ∪ {u}).  Emitted edges (v, m) satisfy v > u ≥ m, so the
    output is already high→low and self-loop-free."""
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    mins = sym.groupBy("a").agg(F.min("b").alias("_mn"))
    mins = mins.select("a", F.least("_mn", F.col("a")).alias("_m"))
    return (
        sym.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """small-star(u): over edges directed high→low, connect every smaller
    neighbor of u (and u itself) to m = min(N(u)).  Output stays
    high→low; (m, m) self-loops are excluded by the b != m filter."""
    d = _canonical(e)
    mins = d.groupBy("a").agg(F.min("b").alias("_m"))
    rewires = (
        d.join(mins, "a")
        .filter(F.col("b") != F.col("_m"))
        .select(F.col("b").alias("a"), F.col("_m").alias("b"))
    )
    anchors = mins.select("a", F.col("_m").alias("b"))
    return rewires.unionByName(anchors).distinct()


def _fingerprint(e: DataFrame) -> tuple[int, int]:
    """(edge count, sum of per-edge 64-bit hashes) — an order-independent
    edge-set fingerprint; ONE tiny aggregate per round is the only thing
    the driver ever sees."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # hashes folded to 31 bits before summing: ANSI mode makes a raw
        # sum(xxhash64) overflow bigint on ~4 rows
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("a", "b"), F.lit(2**31))), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _unionfind_labels(edge_rows) -> dict[int, int]:
    """Driver-side union-find with min-id representatives — the
    small-graph cutover's kernel.  Path-halving find; union by
    attaching the larger root under the smaller, so the final root of
    every set IS its minimum node id (same labels the star algorithm
    converges to)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 30,
    num_partitions: int | None = None,
    small_graph_threshold: int = 1_000_000,
    with_sizes: bool = False,
) -> DataFrame:
    """Label every node of the undirected graph with the MINIMUM node id
    of its connected component (the deterministic cluster representative).

    Returns a DataFrame (node: long, cluster_id: long); with
    ``with_sizes=True`` a third ``cluster_size`` column is attached —
    free in the small-graph cutover (driver-side Counter), one
    map-side-combinable agg + co-partitioned join otherwise.  Isolated
    nodes never enter ``edges`` and are therefore absent — callers union
    singletons back if they need total coverage (see ``q_dedup_clusters``).

    Alternates large-star and small-star rounds until the edge-set
    fingerprint is stable; at the fixpoint the edge set is a union of
    stars (v → component minimum), so labels fall out of one final
    groupBy-min.  ``max_iter`` is a safety bound — the algorithm provably
    converges in O(log^2 n) rounds (Kiveris et al. 2014, Thm 2); hitting
    the bound raises rather than returning partial clusters.

    ``num_partitions`` right-sizes the per-round shuffles: the edge set
    is usually orders of magnitude smaller than the corpus that produced
    it (near-dup pairs, not documents), and every round pays fixed task
    overhead per partition across ~4 exchanges — size it to the EDGE
    data, not to the session default (AQE coalesces within a round, but
    the checkpoint materialization and loop fan-out follow the input
    partitioning).
    """
    e = _canonical(
        edges.select(
            F.col(src_col).cast("long").alias("a"),
            F.col(dst_col).cast("long").alias("b"),
        )
    )
    if num_partitions:
        e = e.repartition(num_partitions)
    e = e.localCheckpoint()
    fp = _fingerprint(e)
    if fp[0] <= small_graph_threshold:
        # Small-graph cutover — the broadcast-join analog for iterative
        # graph work: below the threshold (≤ ~16 MB of edge pairs, the
        # same order as a broadcast side) the O(log² n) star rounds are
        # pure scheduling overhead, so run union-find on the collected
        # edge list instead.  Labels are IDENTICAL to the star fixpoint
        # (min node id per component — pinned by a threshold=0 vs
        # threshold=∞ equality test).  Near-dup edge sets sit orders of
        # magnitude below their corpus; a crawl-scale run that does
        # exceed the threshold takes the distributed loop below.
        labels_map = _unionfind_labels(
            (r["a"], r["b"]) for r in e.collect()
        )
        if with_sizes:
            # sizes ride along for free: the labels already live on the
            # driver, so the cluster_sizes groupBy+join (two exchanges +
            # an extra createDataFrame round-trip, ~1 s of pure small-
            # data overhead at sf0.1) collapses into a Counter.
            from collections import Counter

            sizes = Counter(labels_map.values())
            return edges.sparkSession.createDataFrame(
                [(n, c, sizes[c]) for n, c in labels_map.items()],
                "node long, cluster_id long, cluster_size long",
            )
        return edges.sparkSession.createDataFrame(
            list(labels_map.items()), "node long, cluster_id long"
        )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # lazy checkpoint: the fingerprint aggregate right below
        # materializes it inside its own job (eager would add a full
        # extra materialization job per round)
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        nfp = _fingerprint(e)
        if nfp == fp:
            break
        fp = nfp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged: every non-root node a has exactly one edge (a, root);
    # roots label themselves via the left join fallback
    labels = e.groupBy("a").agg(F.min("b").alias("cluster_id"))
    out = nodes.join(
        labels, nodes["node"] == labels["a"], "left"
    ).select(
        "node", F.coalesce("cluster_id", F.col("node")).alias("cluster_id")
    )
    return cluster_sizes(out) if with_sizes else out


def cluster_sizes(labels: DataFrame) -> DataFrame:
    """Attach cluster_size to a (node, cluster_id) labeling — one
    map-side-combinable agg + a co-partitioned join back."""
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return labels.join(sizes, "cluster_id").select(
        "node", "cluster_id", "cluster_size"
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    small_graph_threshold: int = 1_000_000,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank (Page & Brin 1998) with uniform dangling-
    mass redistribution:

        r'(v) = (1-d)/N + d * ( Σ_{u→v} r(u)/outdeg(u) + dangling/N )

    Multi-edges carry weight (outdeg counts multiplicity).  Returns
    (node, rank) after exactly ``n_iter`` power iterations from the
    uniform start — a FIXED iteration count keeps the operator
    SQL-expressible (the DuckDB twin unrolls the same chain), unlike a
    convergence loop.

    Small-graph cutover (same pattern and threshold class as
    ``connected_components``): below ``small_graph_threshold`` edges the
    iteration cost is pure driver-coordinated job overhead (measured
    ~0.7 s/round on a 20-node graph regardless of data), so collect the
    edge list and run the identical numpy power iteration — pinned equal
    to the distributed loop to 1e-12 in tests/test_pagerank.py.

    Distributed path: per iteration one hash-join (ranks ⋈ edges on
    src) + one map-side-combinable groupBy(dst) + two 1-row aggregates —
    rank state is one row per node, orders of magnitude below the edge
    set.  ``checkpoint_every`` rounds get a localCheckpoint: measured
    best cadence (every round = more materialization jobs; never = the
    10-deep nested-join plan costs 2× in the optimizer).
    """
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).localCheckpoint(eager=False)
    n_edges = e.count()
    if n_edges <= small_graph_threshold:
        import numpy as np

        rows = e.collect()
        pairs = [(r["_s"], r["_d"]) for r in rows]
        node_list = sorted({u for u, _ in pairs} | {v for _, v in pairs})
        ix = {u: i for i, u in enumerate(node_list)}
        n = len(node_list)
        src = np.array([ix[u] for u, _ in pairs], dtype=np.int64)
        dst = np.array([ix[v] for _, v in pairs], dtype=np.int64)
        out = np.bincount(src, minlength=n).astype(np.float64)
        r = np.full(n, 1.0 / n)
        d = float(damping)
        for _ in range(n_iter):
            share = np.where(out > 0, r / np.where(out > 0, out, 1.0), 0.0)
            contrib = np.bincount(dst, weights=share[src], minlength=n)
            dang = r[out == 0].sum()
            r = (1.0 - d) / n + d * (contrib + dang / n)
        return edges.sparkSession.createDataFrame(
            [(node_list[i], float(r[i])) for i in range(n)],
            f"node {edges.schema[src_col].dataType.simpleString()}, rank double",
        )
    outdeg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_tot = F.broadcast(nodes.groupBy().agg(F.count(F.lit(1)).alias("_n")))
    ranks = nodes.crossJoin(n_tot).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("rank")
    )
    d = float(damping)
    for it in range(n_iter):
        with_deg = ranks.join(outdeg, ranks["node"] == outdeg["_s"], "left")
        contrib = (
            with_deg.filter(F.col("_deg").isNotNull())
            .select("node", (F.col("rank") / F.col("_deg")).alias("_share"))
            .join(e, F.col("node") == F.col("_s"))
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("_share").alias("_in"))
        )
        dang = F.broadcast(
            with_deg.filter(F.col("_deg").isNull())
            .groupBy()
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(n_tot)
            .crossJoin(dang)
            .select(
                "node",
                (
                    (1.0 - d) / F.col("_n")
                    + d * (F.coalesce(F.col("_in"), F.lit(0.0))
                           + F.col("_dang") / F.col("_n"))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts on the undirected simple graph.

    Degree-ordered wedge closure (Cohen, CiSE 2009; Suri &
    Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the Last
    Reducer"): orient every canonical edge from its lower endpoint to
    its higher endpoint under the total order pi(v) = (degree(v), v),
    build wedges by self-joining out-edges on their source, and close
    each wedge against the oriented edge set.  Under pi-orientation a
    triangle {x,y,z} with pi(x)<pi(y)<pi(z) is produced exactly once —
    as the wedge at x closed by (y,z) — and every node's out-degree is
    bounded by O(sqrt(|E|)) on skewed (power-law) graphs, which is the
    whole point: the hub that would explode a naive wedge join emits
    almost no wedges because nearly all its edges point INTO it.

    Three shuffles total: degree groupBy, wedge self-join on the wedge
    apex, closure join on the (lo, hi) edge key — all combinable /
    equi-joins, no driver participation.  Returns (node, n_tri) for
    nodes in >= 1 triangle.
    """
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("db"))
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lo_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    e1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1")
    )
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2")
    )
    order12 = (F.col("dv1") < F.col("dv2")) | (
        (F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2"))
    )
    wedges = e1.join(e2, "u").where(order12).select("u", "v1", "v2")
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tris = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    nodes = (
        tris.select(F.col("u").alias("node"))
        .unionAll(tris.select(F.col("v1").alias("node")))
        .unionAll(tris.select(F.col("v2").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").cast("long").alias("n_tri"))


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 5,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration HITS hub/authority scores (Kleinberg, JACM 1999)
    with L1 normalization after each half-step:

        auth'(v) = sum_{u->v} hub(u)   then auth /= sum(auth)
        hub'(u)  = sum_{u->v} auth(v)  then hub  /= sum(hub)

    starting from uniform hub = 1/N over all nodes.  A FIXED iteration
    count keeps the operator SQL-expressible (the DuckDB twin unrolls
    the identical chain), same design as :func:`pagerank`.  Distinct
    directed edges only — HITS on a multigraph double-counts crawl
    adjacency noise.

    Small-graph cutover below ``small_graph_threshold`` edges: the
    per-iteration cost is pure job-coordination overhead at that size,
    so run the identical numpy iteration driver-side — pinned equal to
    the distributed loop in tests/test_stats_queries.py.

    Distributed path per iteration: two hash joins (scores x edges) and
    two combinable groupBys, plus two broadcastable 1-row sums for the
    L1 norms; score state is one row per node.  Returns
    ``(node, hub, auth)``.
    """
    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .filter(F.col("_s") != F.col("_d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    node_t = edges.schema[src_col].dataType.simpleString()
    n_edges = e.count()
    if n_edges <= small_graph_threshold:
        import numpy as np

        pairs = [(r["_s"], r["_d"]) for r in e.collect()]
        node_list = sorted({u for u, _ in pairs} | {v for _, v in pairs})
        ix = {u: i for i, u in enumerate(node_list)}
        n = len(node_list)
        src = np.array([ix[u] for u, _ in pairs], dtype=np.int64)
        dst = np.array([ix[v] for _, v in pairs], dtype=np.int64)
        hub = np.full(n, 1.0 / n)
        auth = np.zeros(n)
        for _ in range(n_iter):
            auth = np.bincount(dst, weights=hub[src], minlength=n)
            auth = auth / auth.sum() if auth.sum() > 0 else auth
            hub = np.bincount(src, weights=auth[dst], minlength=n)
            hub = hub / hub.sum() if hub.sum() > 0 else hub
        return edges.sparkSession.createDataFrame(
            [
                (node_list[i], float(hub[i]), float(auth[i]))
                for i in range(n)
            ],
            f"node {node_t}, hub double, auth double",
        )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .unionByName(e.select(F.col("_d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_tot = F.broadcast(nodes.groupBy().agg(F.count(F.lit(1)).alias("_n")))
    hub = nodes.crossJoin(n_tot).select(
        "node", (F.lit(1.0) / F.col("_n")).alias("hub")
    )
    auth = None
    for it in range(n_iter):
        a_raw = (
            hub.join(e, hub["node"] == e["_s"])
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("hub").alias("_a"))
        )
        a_sum = F.broadcast(a_raw.groupBy().agg(F.sum("_a").alias("_as")))
        auth = (
            nodes.join(a_raw, "node", "left")
            .crossJoin(a_sum)
            .select(
                "node",
                (F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_as")).alias(
                    "auth"
                ),
            )
        )
        h_raw = (
            auth.join(e, auth["node"] == e["_d"])
            .groupBy(F.col("_s").alias("node"))
            .agg(F.sum("auth").alias("_h"))
        )
        h_sum = F.broadcast(h_raw.groupBy().agg(F.sum("_h").alias("_hs")))
        hub = (
            nodes.join(h_raw, "node", "left")
            .crossJoin(h_sum)
            .select(
                "node",
                (F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_hs")).alias(
                    "hub"
                ),
            )
        )
        if (it + 1) % 2 == 0:
            hub = hub.localCheckpoint(eager=False)
            auth = auth.localCheckpoint(eager=False)
    return hub.join(auth, "node")


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 4,
    small_graph_threshold: int = 1_000_000,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) on the
    UNDIRECTED multigraph, with the deterministic update

        label'(v) = argmax_l  Σ_{u~v, label(u)=l} w(u,v)
                    (ties -> lexicographically smallest label)

    run for exactly ``n_iter`` rounds from label(v) = v.  The fixed
    iteration count + deterministic tie-break keep the operator
    SQL-expressible (the DuckDB twin unrolls the same chain), same
    design as :func:`pagerank`/:func:`hits`.

    Distributed path per round: one hash join (labels ⋈ symmetrized
    edges) + one combinable groupBy(node, label) + a per-node window
    whose width is the node's neighbor-label count (degree-bounded).
    Label state is one row per node.  Small-graph cutover mirrors the
    identical synchronous loop in plain dicts (pinned equal in tests).
    """
    sym = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(
            edges.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=False)
    )
    n_edges = sym.count()
    nodes = sym.select(F.col("s").alias("node")).distinct()
    if n_edges <= small_graph_threshold:
        rows = sym.collect()
        adj: dict = {}
        for r in rows:
            adj.setdefault(r["s"], {})[r["d"]] = r["w"]
        lbl = {v: v for v in adj}
        for _ in range(n_iter):
            new = {}
            for v, nbrs in adj.items():
                score: dict = {}
                for u, w in nbrs.items():
                    l = lbl[u]
                    score[l] = score.get(l, 0) + w
                best = min(score.items(), key=lambda kv: (-kv[1], kv[0]))
                new[v] = best[0]
            lbl = new
        spark = edges.sparkSession
        return spark.createDataFrame(
            sorted(lbl.items()), "node string, label string"
        )
    from pyspark.sql import Window

    labels = nodes.select("node", F.col("node").alias("label"))
    for it in range(n_iter):
        scored = (
            sym.join(
                labels.select(
                    F.col("node").alias("s"), F.col("label").alias("l")
                ),
                "s",
            )
            .groupBy(F.col("d").alias("node"), F.col("l").alias("label"))
            .agg(F.sum("w").alias("wt"))
        )
        wn = Window.partitionBy("node").orderBy(
            F.col("wt").desc(), F.col("label").asc()
        )
        labels = (
            scored.withColumn("rn", F.row_number().over(wn))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
        if (it + 1) % 2 == 0:
            labels = labels.localCheckpoint(eager=False)
    return labels
