#!/usr/bin/env python
"""Build the --py-files zip for spark-submit (pure stdlib, deterministic).

    python scripts/make_pyfiles.py [dist/pdf_extractor_spark.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "pdf_extractor_spark"


def build(out: Path) -> Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted(p for p in PKG.rglob("*.py") if "__pycache__" not in p.parts)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in files:
            # fixed timestamp -> byte-identical zips for identical sources
            info = zipfile.ZipInfo(str(f.relative_to(REPO)), date_time=(2024, 1, 1, 0, 0, 0))
            z.writestr(info, f.read_bytes())
    return out


if __name__ == "__main__":
    target = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "pdf_extractor_spark.zip"
    print(build(target))
