#!/usr/bin/env python3
"""Build the --py-files artifact for spark-submit cluster launches:

    python tools/build_pyfiles.py          # -> dist/rustiflow_spark.zip
    spark-submit --py-files dist/rustiflow_spark.zip \
        -m rustiflow_spark.cli extract --input ... --output ...

(__spark_entry__ ships the same zip via addPyFile for library-mode use.)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile


def build(out_dir: str = "dist") -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.isabs(out_dir):
        out_dir = os.path.join(repo, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    staging = tempfile.mkdtemp()
    shutil.copytree(
        os.path.join(repo, "rustiflow_spark"),
        os.path.join(staging, "rustiflow_spark"),
        ignore=shutil.ignore_patterns("__pycache__"),
    )
    base = os.path.join(out_dir, "rustiflow_spark")
    path = shutil.make_archive(base, "zip", staging)
    shutil.rmtree(staging)
    return path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
