"""CLI entrypoint smoke: the spark-submit surface of the pipeline."""

from __future__ import annotations

import json
import subprocess
import sys


def test_pipeline_cli(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "ta2_minmod_kg_spark.plans.pipeline",
            "--n-sites",
            "60",
            "--workdir",
            str(tmp_path / "wd"),
            "--master",
            "local[4]",
            "--n-buckets",
            "4",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    payload = json.loads(line)
    assert payload["n_triples"] > 1000
    assert payload["stages"]["triples"]["n_rows"] == payload["n_triples"]
