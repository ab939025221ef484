"""Real ``spark-submit --py-files`` packaging round-trip (north-rule
packaging contract): build the package zip, copy the entry script
OUTSIDE the repo (so its repo-relative sys.path insert cannot mask the
zip), and run the flagship pipeline in a fresh spark-submit JVM whose
driver AND workers can only import the engine from --py-files."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    try:
        import pyspark

        p = Path(pyspark.__file__).parent / "bin" / "spark-submit"
        return str(p) if p.exists() else None
    except ImportError:  # pragma: no cover
        return None


def test_spark_submit_py_files_roundtrip(tmp_path, pages_pdf, spark):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH or in the pyspark dist")

    from med_doi_feature_extraction_spark.packaging import build_package_zip

    zip_path = build_package_zip(str(tmp_path))
    script = tmp_path / "run_pipeline.py"
    shutil.copyfile(REPO / "tools" / "run_pipeline.py", script)

    inp = tmp_path / "pages.parquet"
    spark.createDataFrame(pages_pdf).write.parquet(str(inp))

    env = dict(os.environ, SPARK_DRIVER_MEM="2g")
    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            str(script),
            "--input", str(inp),
            "--output", str(tmp_path / "features"),
            "--manifest", str(tmp_path / "manifest"),
            "--run-id", "submit-test",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        timeout=280,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = None
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            summary = json.loads(line)
            break
    assert summary is not None, proc.stdout[-2000:]
    assert summary["rows_out"] == len(pages_pdf)
    out = spark.read.parquet(str(tmp_path / "features"))
    assert out.count() == len(pages_pdf)
    assert "transparency" in out.columns and "lineage" in out.columns
