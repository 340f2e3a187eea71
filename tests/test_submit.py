"""spark-submit --py-files launch contract (BASELINE.json.north_star:
"launched via spark-submit --py-files").

Runs the real spark-submit binary against dist/spatial.zip -- executors
import the engine from the zip, not from the repo checkout -- then re-runs
with the same --out to prove manifest-based resume skips committed batches.
"""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _submit(out_dir: str) -> dict:
    subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "package_pyfiles.sh")],
        check=True, capture_output=True)
    proc = subprocess.run(
        [SPARK_SUBMIT,
         "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", os.path.join(REPO, "dist", "spatial.zip"),
         os.path.join(REPO, "jobs", "run_pipeline.py"),
         "--pages", "synth:5000", "--regions", "synth",
         "--out", out_dir, "--batches", "2"],
        capture_output=True, text=True, timeout=240,
        # scrub the repo from PYTHONPATH: `import spatial` must resolve
        # from the shipped zip for the --py-files claim to mean anything
        cwd="/tmp",
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_submit_and_resume(tmp_path):
    # one-Spark-session rule (CLAUDE.md): conftest fronts this test so no
    # in-process session exists yet; skip rather than violate the rule if
    # something started one anyway (e.g. running with -p no:cacheprovider
    # orderings or a stray notebook session).
    from pyspark.sql import SparkSession
    if SparkSession.getActiveSession() is not None:
        pytest.skip("in-process Spark session active; run this module standalone")
    out = str(tmp_path / "out")
    first = _submit(out)
    assert first["ran_batches"] == [0, 1]
    assert first["committed"] == [0, 1]
    # outputs exist and are non-empty parquet
    for table in ("join_out", "tile_assign", "metrics"):
        assert os.path.isdir(os.path.join(out, table, "batch=0"))
    # second run: everything committed -> nothing re-runs (resume contract)
    second = _submit(out)
    assert second["ran_batches"] == []
    assert second["committed"] == [0, 1]
