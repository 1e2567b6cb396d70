"""Build the --py-files artifact: geo_inference_spark.zip.

North-rule packaging: "the job is submitted with spark-submit
--py-files". The zip contains the pure-Python package (no binary
deps beyond numpy/pandas/pyarrow, which live on the cluster image);
executors unpack it onto their PYTHONPATH.
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "geo_inference_spark"
OUT = os.path.join(ROOT, "dist", f"{PKG}.zip")


def main() -> str:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, ROOT))
    print(OUT)
    return OUT


if __name__ == "__main__":
    main()
