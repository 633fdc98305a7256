"""Halo chunking for monster series (SURVEY §7.3; VERDICT r2 next #5).

A per-key window (`Window.partitionBy(key)`) or grouped kernel
(`groupBy(key).applyInPandas`) puts the WHOLE key in one task — a
10⁹-point series OOMs it.  These helpers split one key's rows into
bounded chunks with overlap ("halo") rows duplicated into the adjacent
chunk, so a rolling computation near a chunk edge still sees its full
window and the chunked output equals the unchunked output exactly:

  * row-frame windows (Hampel winsize w): halo = w//2 ROWS of the non-null
    sequence — exact for any null distribution because chunking happens on
    an exact global row number computed WITHOUT a single-partition window
    (two-level: per-(key, coarse-block) counts → per-key prefix sum over
    the tiny block table → block offset + in-block row_number).
  * grid/slot operators (linear interp with gap_limit L): chunk on the
    slot lattice, halo = L+1 slots (a fillable gap and both anchors fit).
  * iterated kernels (LocalSD repeat-until-clean): influence can travel
    one winsize per iteration, so the caller sizes halo ≥ winsize × the
    expected iteration count (tests pin equality; pathological non-local
    convergence is the documented residual).

The explode duplicates only 2·halo rows per chunk — fractionally nothing
at the chunk sizes that matter (10⁶ rows), and every downstream shuffle is
on (key, chunk), restoring balance no matter how skewed the key is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rn", "explode_halo_chunks"]


def with_global_rn(
    df: DataFrame,
    key_col: str,
    order_col: str,
    coarse_span: int = 1_000_000,
    rn_col: str = "__rn",
) -> DataFrame:
    """Exact 0-based per-key row number by ``order_col`` without ever
    forming a per-key window partition.

    Two levels: rows land in coarse blocks (floor(order/coarse_span)); the
    per-(key, block) counts are a tiny table (rows = keys × blocks) whose
    per-key prefix sum gives each block its starting offset; rn = offset +
    row_number within (key, block).  The only per-key-wide state is the
    block-count table — 10⁹ rows / 10⁶-wide blocks = 10³ rows per key.
    ``order_col`` must be unique per key (a timestamp / slot)."""
    blk = F.floor(F.col(order_col) / coarse_span)
    d = df.withColumn("__blk", blk)
    counts = d.groupBy(key_col, "__blk").agg(F.count(F.lit(1)).alias("__n"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("__blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w), F.lit(0))
    ).select(key_col, "__blk", "__off")
    w_in = Window.partitionBy(key_col, "__blk").orderBy(order_col)
    return (
        d.join(offsets, [key_col, "__blk"])
        .withColumn(rn_col, F.col("__off") + F.row_number().over(w_in) - 1)
        .drop("__blk", "__off")
    )


def explode_halo_chunks(
    df: DataFrame,
    pos_col: str,
    chunk_size: int,
    halo: int,
    chunk_col: str = "__chunk",
) -> DataFrame:
    """Assign every row to its own chunk (floor(pos/chunk_size)) plus the
    neighbouring chunk when within ``halo`` of the shared edge.  Rows where
    ``chunk_col == floor(pos/chunk_size)`` are the "own" rows a caller
    keeps after the windowed computation.  Requires halo <= chunk_size."""
    if halo > chunk_size:
        raise ValueError("halo must be <= chunk_size")
    own = F.floor(F.col(pos_col) / chunk_size)
    inpos = F.pmod(F.col(pos_col), F.lit(chunk_size))
    memberships = F.array(
        own,
        F.when(inpos < halo, own - 1),
        F.when(inpos >= chunk_size - halo, own + 1),
    )
    return df.withColumn(
        chunk_col,
        F.explode(F.filter(memberships, lambda c: c.isNotNull())),
    )
