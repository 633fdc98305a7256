"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_queries.py [name ...]
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from diive_spark.session import get_spark  # noqa: E402

import os

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """Type-TAGGED normalization (round-3 verdict #2): the driver's value
    hash is type-sensitive — DuckDB HUGEINT surfacing as ``decimal128`` vs
    Spark ``int64`` hash-fails even when the numbers are equal.  Tag every
    cell with its Python type family so a Decimal never compares equal to
    an int, and an int never to a float.  Floats keep the 6-sig-fig value
    normalization (cross-engine ulp noise), but no longer collapse to ints.
    """
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return f"f:{v:.6g}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return f"s:{v}"


# Spark simpleString dtype -> acceptable DuckDB Arrow type families.  A
# mismatch here is exactly the class the driver caught in round 3
# (decimal128(38,0) from an uncast HUGEINT sum vs Spark int64).
_TYPE_FAMILY = {
    "bigint": {"int64"},
    "int": {"int32", "int64"},
    "smallint": {"int16", "int32", "int64"},
    "tinyint": {"int8", "int16", "int32", "int64"},
    "double": {"double", "float"},
    "float": {"float", "double"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "date": {"date32[day]", "date64[ms]"},
}


def arrow_type_ok(spark_dtype: str, arrow_type: str) -> bool:
    fam = _TYPE_FAMILY.get(spark_dtype)
    if fam is None:
        # arrays/structs/timestamps: value compare still applies; skip the
        # family check rather than false-positive on container spellings.
        return True
    return str(arrow_type) in fam


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
            tbl = con.execute(oracles[name]).arrow()
            ocols = tbl.column_names
            orows = [tuple(r.values()) for r in tbl.to_pylist()]
            otypes = {n: str(t) for n, t in zip(tbl.schema.names, tbl.schema.types)}
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(ocols)}")
            ok = False
        else:
            sdtypes = dict(sdf.dtypes)
            for c in scols:
                if not arrow_type_ok(sdtypes[c], otypes[c]):
                    print(f"{name}: TYPE MISMATCH col={c} "
                          f"spark={sdtypes[c]} duck-arrow={otypes[c]}")
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
