"""The north_rule runs the pipeline via spark-submit; prove the CLI
entry point works end-to-end as an actual spark-submit invocation."""

from __future__ import annotations

import json
import os
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


def test_spark_submit_pipeline(spark, tmp_path):
    # pages input shaped per BASELINE.json input_hint (url + text used)
    pages = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").selectExpr(
        "cast(doc_id as string) as url", "text"
    )
    inp = tmp_path / "pages"
    out = tmp_path / "out"
    pages.write.parquet(str(inp))

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}" + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            str(REPO / "scripts" / "run_pipeline.py"),
            "--input", str(inp),
            "--output", str(out),
            "--no-lsh",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    metrics = json.loads((out / "metrics.json").read_text())
    assert metrics["n_docs"] == 500 and metrics["n_pairs"] > 0

    clusters = spark.read.parquet(str(out / "clusters"))
    assert clusters.count() == 500
    assert set(clusters.columns) >= {"doc_id", "cluster_id"}
