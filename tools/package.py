"""Build the spark-submit artifact: ``dist/json_validator_spark.zip``.

Usage:
    python tools/package.py
    spark-submit --py-files dist/json_validator_spark.zip \
        $(python -c 'import json_validator_spark.cli as m; print(m.__file__)') \
        validate --input ... --output ...
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or ROOT / "dist" / "json_validator_spark.zip"
    out.parent.mkdir(exist_ok=True)
    pkg = ROOT / "json_validator_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted(pkg.rglob("*.py")):
            z.write(py, py.relative_to(ROOT))
    return out


if __name__ == "__main__":
    p = build()
    names = zipfile.ZipFile(p).namelist()
    print(f"{p} ({len(names)} files)")
