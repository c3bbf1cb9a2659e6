"""The CLI job entry point (job.py = reference main() analogue) wires a
full run from a properties file: source dir -> three-way pipeline ->
sinks, run-once mode."""

from __future__ import annotations

import glob
import os
import sys

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.job import run


def test_job_runs_from_properties_file(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    msgs = pd.DataFrame({"value": [
        f"{'session':<16}{'1700000000000':<16}" + " " * 32 + f"payload-{i}"
        for i in range(20)
    ] + [f"{'other':<16}{'1700000000000':<16}" + " " * 32 + "x"]})
    pq.write_table(pa.Table.from_pandas(msgs), str(src / "m.parquet"))

    props = tmp_path / "job.properties"
    props.write_text(f"""
job_name=test-job
parallelism=4
run_once=true
frozen_now_ms=1700000005000
source_dir={src}
checkpoint_location={tmp_path}/ckpt
main_out_dir={tmp_path}/main
bulk_endpoint={tmp_path}/bulk
metric_spool_dir={tmp_path}/metrics
""")
    q = run(["-c", str(props)], await_termination=True)
    assert q.lastProgress is not None

    assert spark.read.parquet(str(tmp_path / "main")).count() == 21
    bulk_lines = []
    for p in glob.glob(f"{tmp_path}/bulk/*.ndjson"):
        bulk_lines += open(p, encoding="utf-8").read().splitlines()
    assert len(bulk_lines) == 20  # session tails only
    metrics = glob.glob(f"{tmp_path}/metrics/*.json")
    assert metrics, "metric reporter produced no batches"
