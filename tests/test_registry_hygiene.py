"""Registry hygiene guards.

Round-4 full sweep caught a module-level constant collision: two
``SQL_KATZ =`` definitions in one registry file silently clobbered the
katz_fd oracle with the katz_centrality twin (per-batch checks only
exercise NEW queries, so the damage surfaced only in a full sweep).
These guards make that class of bug a test failure:

1. no registry module defines the same top-level SQL_*/const name twice;
2. every ``queries()`` key has exactly one owner module;
3. every oracle is syntactically distinct from any other oracle that
   belongs to a DIFFERENT query function (same-text oracles for two
   different queries almost always mean a clobbered constant).
"""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = REPO / "diive_spark"


def _registry_modules():
    return sorted(PKG.glob("queries*.py"))


def test_no_duplicate_toplevel_constants():
    # only fresh string-literal definitions count — the house
    # `X = X.format(...)` self-substitution idiom is fine
    pat = re.compile(r'^([A-Z_][A-Z0-9_]*) = f?"""', re.M)
    for path in _registry_modules():
        names = pat.findall(path.read_text())
        dupes = {n for n in names if names.count(n) > 1}
        assert not dupes, f"{path.name}: duplicate constants {dupes}"


def test_registry_keys_unique_across_modules():
    import sys

    sys.path.insert(0, str(REPO))
    import importlib

    owners: dict[str, str] = {}
    for path in _registry_modules():
        mod = importlib.import_module(
            f"diive_spark.{path.stem}"
        )
        q = getattr(mod, "QUERIES", None)
        if not q or path.stem == "queries":
            continue
        for k in q:
            assert k not in owners, (
                f"query key {k!r} defined in both {owners[k]} and "
                f"{path.stem}"
            )
            owners[k] = path.stem


def test_no_shared_oracle_text_between_queries():
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    by_text: dict[str, list[str]] = {}
    for name, sql in o.items():
        by_text.setdefault(sql, []).append(name)
    for sql, names in by_text.items():
        if len(names) < 2:
            continue
        fns = {q[n].__name__ for n in names if n in q}
        # identical oracle text is only legitimate when the queries
        # are wrappers of the same function (none today)
        assert len(fns) <= 1, (
            f"oracle text shared by distinct queries {sorted(names)} — "
            "a constant was probably clobbered"
        )
