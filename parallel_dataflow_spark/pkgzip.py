"""Self-distribution of the engine package to Python workers.

Cluster deployment is ``spark-submit --py-files engine.zip``; when the
engine is imported into an already-running session (e.g. the driver
harness), ``ensure_on_executors`` ships the same zip at runtime via
``SparkContext.addPyFile`` so worker-side unpickling of our pandas-UDF
kernels resolves the package regardless of the driver's cwd/sys.path.
Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_zip_path: str | None = None
_added_to: set[str] = set()


def build_pkg_zip() -> str:
    """Zip parallel_dataflow_spark into a stable temp file (once/process)."""
    global _zip_path
    if _zip_path and os.path.exists(_zip_path):
        return _zip_path
    fd, path = tempfile.mkstemp(prefix="parallel_dataflow_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    "parallel_dataflow_spark", os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    _zip_path = path
    return path


def ensure_on_executors(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _added_to:
        return
    sc.addPyFile(build_pkg_zip())
    _added_to.add(key)
