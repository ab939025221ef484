"""spark-submit packaging: ship the engine package to executors.

Pandas-UDF closures reference this package by module name, so every
Python worker must be able to import it. On a real cluster that's
``spark-submit --py-files <zip>``; ``ensure_package_on_workers`` does
the equivalent programmatically (``SparkContext.addPyFile``) so any
driver process — notebook, driver-contract harness, bench — works
without external packaging steps.
"""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)


def build_package_zip(out_dir: str | None = None) -> str:
    """Zip this package (sources only) for --py-files; returns path."""
    import tempfile

    out_dir = out_dir or tempfile.gettempdir()
    zip_path = os.path.join(out_dir, f"{_PKG_NAME}.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(_PKG_DIR):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.join(
                    _PKG_NAME, os.path.relpath(full, _PKG_DIR)
                )
                zf.write(full, rel)
    return zip_path


_SHIPPED: set[str] = set()


def ensure_package_on_workers(spark) -> str:  # noqa: ANN001
    """Make the package importable in executor Python workers.
    Idempotent per SparkContext (safe to call from every query entry —
    the driver contract may hand us a session we didn't build).

    No-ops when the package is ALREADY distributed — running from a
    ``spark-submit --py-files`` zip, or a same-named zip already
    registered on the context. Re-adding would make Spark reject the
    freshly-built zip as "exists and does not match contents" (byte
    differences are expected: zip timestamps), killing real
    spark-submit runs — pinned by tests/test_spark_submit.py."""
    zip_name = f"{_PKG_NAME}.zip"
    if f"{os.sep}{zip_name}{os.sep}" in _PKG_DIR or _PKG_DIR.endswith(zip_name):
        # imported from a --py-files zip: already on every node
        return _PKG_DIR
    sc = spark.sparkContext
    key = sc.applicationId
    zip_path = os.path.join(
        __import__("tempfile").gettempdir(), zip_name
    )
    if key in _SHIPPED:
        return zip_path
    if any(f.endswith(zip_name) for f in getattr(sc, "_python_includes", [])):
        # same-named zip registered via --py-files / an earlier addPyFile
        _SHIPPED.add(key)
        return zip_path
    zip_path = build_package_zip()
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
    return zip_path
