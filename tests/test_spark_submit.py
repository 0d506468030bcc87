"""End-to-end packaging smoke: the BASELINE.json "packaged for
spark-submit --py-files" claim, actually exercised — a fresh JVM +
fresh Python workers import the engine FROM THE ZIP (cwd is an empty
temp dir, so the repo tree is not importable) and run a full validate
pass via the CLI."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_zip(tmp_path, spark):
    # build the artifact fresh
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        check=True, cwd=REPO,
    )
    zip_path = os.path.join(REPO, "dist", "json_validator_spark.zip")

    # input corpus written by the test session (schema = the engine's own)
    sys.path.insert(0, REPO)
    from json_validator_spark.sources.synth import synth_documents

    docs = str(tmp_path / "docs")
    synth_documents(spark, 500).write.parquet(docs)

    runner = tmp_path / "runner.py"
    runner.write_text(
        "import sys\n"
        "from json_validator_spark.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    res = subprocess.run(
        [
            "spark-submit", "--master", "local[2]",
            "--py-files", zip_path,
            str(runner), "validate", "--input", docs, "--output", out,
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    # the S7 sinks landed
    viol = spark.read.parquet(f"{out}/violations")
    assert viol.count() > 0
    assert set(viol.columns) >= {"doc_id", "span_path", "rule_id", "severity"}
    assert spark.read.parquet(f"{out}/verdicts").count() == 500
