"""SemDeDup composition (queries_text.q_semantic_dedup building blocks):
planted near-identical embeddings collapse to one kept representative;
distinct vectors all survive."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from diive_spark.text import graph as GR
from diive_spark.text import similarity as SIM


def test_semdedup_keeps_one_per_group(spark):
    rng = np.random.RandomState(11)
    base = rng.normal(0, 1, (20, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i < 5:  # plant a scaled near-copy (cosine == 1) for the first 5
            rows.append((100 + i, [float(x) * 1.7 for x in v]))
    emb = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    seeds = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 4).collect()
    ]
    cents = SIM.train_ivf_kmeans(emb, seeds, n_iters=2)
    cells = SIM.with_ivf_cell(emb, cents, out_col="cell")
    pairs = SIM.cosine_neardup_pairs_kernel(
        cells, "vec_id", "embedding", block_col="cell", threshold=0.95
    )
    labels = GR.connected_components(
        pairs, src_col="id_a", dst_col="id_b", num_partitions=4
    ).withColumnRenamed("node", "vec_id")
    out = (
        cells.select("vec_id").join(labels, "vec_id", "left")
        .withColumn("rep", F.coalesce("cluster_id", "vec_id"))
        .toPandas()
    )
    kept = set(out[out["rep"] == out["vec_id"]]["vec_id"])
    # each planted pair collapses: copy 100+i dropped, original i kept
    for i in range(5):
        assert i in kept and (100 + i) not in kept
    # all unplanted vectors are their own representative (random gaussians
    # in 16-d are nowhere near cosine 0.95)
    for i in range(5, 20):
        assert i in kept
    assert len(kept) == 20
