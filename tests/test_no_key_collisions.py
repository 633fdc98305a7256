"""Registry modules must not shadow each other's query names — the
queries.py dict merge silently keeps the LAST registration, which
round-4 battery L proved can eat an older query (energy_distance).
This pins pairwise disjointness of every module-level QUERIES dict."""

from __future__ import annotations

import importlib
import pkgutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_query_module_keys_disjoint():
    sys.path.insert(0, str(REPO))
    import diive_spark

    owners: dict[str, str] = {}
    clashes: list[tuple[str, str, str]] = []
    for info in pkgutil.iter_modules(diive_spark.__path__):
        if not info.name.startswith("queries"):
            continue
        mod = importlib.import_module(f"diive_spark.{info.name}")
        q = getattr(mod, "QUERIES", None)
        if not isinstance(q, dict):
            continue
        # queries.py aggregates the others — skip the aggregator
        if info.name == "queries":
            continue
        for k in q:
            if k in owners:
                clashes.append((k, owners[k], info.name))
            else:
                owners[k] = info.name
    assert not clashes, f"shadowed query names: {clashes}"
