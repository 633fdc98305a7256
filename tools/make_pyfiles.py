"""Build the spark-submit --py-files artifact (BASELINE.json north_rule:
"ships as a spark-submit --py-files package").

Usage:
    python tools/make_pyfiles.py            # -> dist/diive_spark.zip
    spark-submit --py-files dist/diive_spark.zip __spark_entry__.py

The zip contains the pure-Python ``diive_spark`` package (no data, no
tests); ``__spark_entry__.py`` stays outside as the driver script.
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "diive_spark.zip"
    out.parent.mkdir(exist_ok=True)
    pkg = REPO / "diive_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    path = build(Path(sys.argv[1]) if len(sys.argv) > 1 else None)
    names = zipfile.ZipFile(path).namelist()
    print(f"{path} ({len(names)} modules, {path.stat().st_size} bytes)")
