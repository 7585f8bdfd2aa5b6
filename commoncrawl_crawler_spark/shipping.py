"""Ship the package to Python workers regardless of driver cwd.

Pandas-UDF closures reference this package by module name; worker
Python processes must be able to import it even when the driving
process was launched from elsewhere (the driver harness does exactly
that). `ensure_shipped` zips the package once per session and
registers it via addPyFile -- the Spark-native mechanism that works
identically on a real cluster (files are shipped to every executor).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_ccspark_pkg_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = os.path.join(
        tempfile.gettempdir(), f"ccspark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, arcname=str(py.relative_to(pkg_dir.parent)))
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
