"""Build the --py-files artifact: dist/vector_tile_go_spark.zip.

Usage:  python tools/make_pyfiles.py
Then:   spark-submit --py-files dist/vector_tile_go_spark.zip \
            jobs/tile_pipeline.py <sf_dir> <out_dir> [zoom]

Pure-stdlib zip of the package tree (no pip/build backends needed); every
executor unpacks the same code, which is how the engine ships to a real
multi-executor cluster (north rule: "run via spark-submit --py-files").
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "vector_tile_go_spark"


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, PKG)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
