"""As-of join vs pandas.merge_asof (independent oracle) + edge cases."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from diive_spark.operators.asofjoin import asof_join_backward


def _run(spark, left_rows, right_rows, tolerance=None):
    left = spark.createDataFrame(
        left_rows, "key long, t long, lval double"
    )
    right = spark.createDataFrame(
        right_rows, "key long, t long, rval double"
    )
    out = asof_join_backward(
        left, right, on="t", by="key", value_cols=["rval"],
        tolerance=tolerance,
    )
    return {
        (r["key"], r["t"], r["lval"]): (r["asof_rval"], r["asof_t"])
        for r in out.collect()
    }


def _pandas(left_rows, right_rows, tolerance=None):
    l = pd.DataFrame(left_rows, columns=["key", "t", "lval"]).sort_values("t")
    r = pd.DataFrame(right_rows, columns=["key", "t", "rval"]).sort_values("t")
    m = pd.merge_asof(
        l, r, on="t", by="key", direction="backward",
        allow_exact_matches=True,
        tolerance=tolerance,
        suffixes=("", "_r"),
    )
    # recover the matched right timestamp for comparison
    rmap = {(int(k), float(v)): int(t) for k, t, v in right_rows}
    out = {}
    for _, row in m.iterrows():
        rv = None if pd.isna(row["rval"]) else float(row["rval"])
        rt = rmap[(int(row["key"]), rv)] if rv is not None else None
        out[(int(row["key"]), int(row["t"]), float(row["lval"]))] = (rv, rt)
    return out


CASES = {
    "basic": (
        [(1, 10, 1.0), (1, 20, 2.0), (1, 5, 3.0)],
        [(1, 8, 80.0), (1, 15, 150.0)],
        None,
    ),
    "exact_tie_matches": (
        [(1, 10, 1.0)],
        [(1, 10, 99.0), (1, 9, 88.0)],
        None,
    ),
    "no_match_before": (
        [(1, 3, 1.0), (2, 100, 2.0)],
        [(1, 5, 50.0)],
        None,
    ),
    "tolerance_cuts": (
        [(1, 100, 1.0), (1, 200, 2.0)],
        [(1, 95, 9.5), (1, 50, 5.0)],
        10,
    ),
    "per_key_isolation": (
        [(1, 10, 1.0), (2, 10, 2.0)],
        [(1, 9, 19.0), (2, 8, 28.0)],
        None,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_asof_vs_pandas(spark, name):
    left, right, tol = CASES[name]
    assert _run(spark, left, right, tol) == _pandas(left, right, tol)


def test_asof_random_vs_pandas(spark):
    rng = np.random.RandomState(11)
    left = [
        (int(k), int(t), float(i))
        for i, (k, t) in enumerate(
            zip(rng.randint(0, 5, 300), rng.randint(0, 1000, 300))
        )
    ]
    right_ts = set()
    right = []
    for i, (k, t) in enumerate(
        zip(rng.randint(0, 5, 200), rng.randint(0, 1000, 200))
    ):
        if (k, t) in right_ts:  # unique per (key, t) as the op requires
            continue
        right_ts.add((k, t))
        right.append((int(k), int(t), float(1000 + i)))
    assert _run(spark, left, right, 50) == _pandas(left, right, 50)
