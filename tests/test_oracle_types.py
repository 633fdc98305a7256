"""Guard against the round-3 driver hash-fail class: DuckDB integer ``SUM()``
returns HUGEINT, which surfaces as ``decimal128(38,0)`` in Arrow output while
Spark emits ``int64`` — the driver's value hash is type-sensitive, so the
numbers match but the hash does not (CORRECTNESS_r03: trend_mann_kendall,
scd2_url_versions, hysteresis_alerts).

This test DESCRIBEs every oracle twin (bind-only, no execution) and asserts
no output column is HUGEINT or DECIMAL.  Any integer sum in an oracle must be
wrapped in ``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

from pathlib import Path

import duckdb
import pytest

SF_DIR = Path("/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.skipif(not SF_DIR.exists(), reason="driver testdata absent")
def test_no_oracle_emits_hugeint_or_decimal():
    from diive_spark import queries as q

    con = duckdb.connect()
    for t in TABLES:
        p = SF_DIR / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    offenders: list[str] = []
    for name, sql in q.ORACLE_SQL.items():
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, typ, *_ in rows:
            up = typ.upper()
            if "HUGEINT" in up or "DECIMAL" in up:
                offenders.append(f"{name}.{col} -> {typ}")
    assert not offenders, (
        "oracle twins emit driver-hash-unsafe types (wrap in CAST(... AS "
        f"BIGINT)): {offenders}"
    )
