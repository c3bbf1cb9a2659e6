"""The examples are the 'switch from the reference' documentation —
they must actually run. Each executes in its own subprocess (they build
and stop their own SparkSession, which must never touch the suite's)
at the smallest scale factor.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_example(name: str) -> str:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert proc.returncode == 0, f"{name} failed:\n{proc.stderr[-3000:]}"
    return proc.stdout


def test_training_data_pipeline_example_runs():
    out = _run_example("training_data_pipeline.py")
    assert "raw docs:" in out
    # the split stats table materialized all stages end-to-end
    assert "train" in out and "n_packs" in out


def test_library_usage_example_runs():
    out = _run_example("library_usage.py")
    assert "q1 pricing summary" in out
    assert "near-duplicate pairs:" in out
    assert "LSH candidate pairs:" in out
    assert "semdedup_fast" in out


def test_log_ingestion_example_runs():
    out = _run_example("log_ingestion.py")
    assert "produced hwms:" in out
    assert "acked offsets" in out
    assert "backfill rows: 40" in out


def test_incremental_ingest_example_runs():
    out = _run_example("incremental_ingest.py")
    assert "existing corpus:" in out
    assert "survivors after incremental dedup:" in out
    assert "per-source packing:" in out
