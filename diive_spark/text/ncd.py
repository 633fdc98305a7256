"""Normalized compression distance (Cilibrasi & Vitanyi 2005): the
parameter-free similarity

    NCD(x, y) = (C(xy) - min(C(x), C(y))) / max(C(x), C(y))

with C = deflate (zlib level 6) compressed length.  Approximates the
normalized information distance of Kolmogorov-complexity theory; low
NCD means one document's regularities compress the other — the
similarity signal that catches paraphrase-level duplication that
shingle hashes (set overlap) and alignment scores (order overlap)
both miss.

diive counterpart: none (public literature only).  Scale shape:
per-source Arrow batches against the source representative, sampled
members only — the alignkernels posture; per-pair cost is one deflate
over two clipped prefixes.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from diive_spark.session import kernel_partition

__all__ = ["ncd", "ncd_frame"]

_LEVEL = 6


def _clen(b: bytes) -> int:
    return len(zlib.compress(b, _LEVEL))


def ncd(x: bytes, y: bytes) -> float:
    """Normalized compression distance of two byte strings."""
    cx, cy = _clen(x), _clen(y)
    cxy = _clen(x + y)
    hi = max(cx, cy)
    if hi == 0:
        return 0.0
    return (cxy - min(cx, cy)) / hi


def ncd_frame(
    df: DataFrame,
    key_col: str,
    id_col: str,
    text_col: str,
    prefix_len: int = 512,
    sample_mod: int = 5,
) -> DataFrame:
    """Per key: NCD profile of sampled members against the key's
    representative (min id).  Rows-only kernel."""
    schema = (
        f"{key_col} string, n_members long, n_scored long,"
        " mean_ncd double, min_ncd double, max_ncd double,"
        " rep_clen long"
    )

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        rep = str(pdf[text_col].iloc[0])[:prefix_len].encode(
            "utf-8", "replace"
        )
        sel = pdf[(pdf[id_col] % sample_mod == 0)
                  & (pdf[id_col] != pdf[id_col].iloc[0])]
        ds = [
            ncd(rep, str(t)[:prefix_len].encode("utf-8", "replace"))
            for t in sel[text_col]
        ]
        k = len(ds)
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_members": [len(pdf)],
                "n_scored": [k],
                "mean_ncd": [float(np.mean(ds)) if k else float("nan")],
                "min_ncd": [float(min(ds)) if k else float("nan")],
                "max_ncd": [float(max(ds)) if k else float("nan")],
                "rep_clen": [_clen(rep)],
            }
        )

    return (
        kernel_partition(df.select(key_col, id_col, text_col), key_col)
        .groupBy(key_col)
        .applyInPandas(apply, schema=schema)
    )
