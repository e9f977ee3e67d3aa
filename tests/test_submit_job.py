"""North-rule run mode: the engine ships as `spark-submit --py-files`.

The smoke test runs REAL spark-submit (the one bundled with pyspark) with
the packaged zip, from a scratch cwd with a COPY of the driver script —
so the engine package is importable only through --py-files, exactly the
cluster situation."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

from tools.make_pyfiles import build

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else None


def test_pyfiles_zip_contains_package(tmp_path):
    out = build(tmp_path)
    import zipfile

    names = zipfile.ZipFile(out).namelist()
    assert "accelerating_tc_spark/__init__.py" in names
    assert "accelerating_tc_spark/operators/triangles.py" in names
    assert not [n for n in names if not n.endswith(".py")]


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not found")
def test_spark_submit_tc_job(tmp_path, sf_tiny):
    zip_path = build(tmp_path)
    script = tmp_path / "submit_job.py"
    shutil.copy(os.path.join(REPO, "tools", "submit_job.py"), script)
    out_dir = tmp_path / "out"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import route
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(script),
            "--job", "tc",
            "--edges", sf_tiny,
            "--output", str(out_dir),
        ],
        capture_output=True,
        text=True,
        cwd=tmp_path,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    metrics = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert metrics["job"] == "tc"
    assert metrics["rows"] == 1
    # the job wrote a readable parquet with a positive exact count
    import pyarrow.parquet as pq

    table = pq.read_table(out_dir)
    assert table.num_rows == 1
    assert table.column("triangles")[0].as_py() > 0
