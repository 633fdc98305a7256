"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_queries.py [name ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from diive_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 2**52:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out


def main(names: list[str] | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    spark = get_spark(master="local[8]", app_name="check-queries", shuffle_partitions=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if names and name not in names:
            continue
        sdf = fn(spark, SF_DIR)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name}: rows-only check, {len(srows)} rows "
                  f"({'OK' if len(srows) >= 0 else 'FAIL'})")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        if len(srows) != len(orows):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(srows)} duck={len(orows)}")
            ok = False
        if ok:
            a = canon([tuple(r) for r in srows], scols)
            b = canon(orows, ocols)
            if a != b:
                ndiff = sum(1 for x, y in zip(a, b) if x != y)
                print(f"{name}: VALUE MISMATCH ({ndiff} differing rows of {len(a)})")
                for x, y in list(zip(a, b))[:2000]:
                    if x != y:
                        print("  spark:", x)
                        print("  duck :", y)
                        break
                ok = False
        if ok:
            print(f"{name}: OK ({len(srows)} rows)")
        else:
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
