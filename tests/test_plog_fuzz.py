"""Property fuzz of the partitioned-log custom stream source
(sources/plog.py): random producer schedules — uneven partition
spreads, empty partitions, unicode/quoted/empty payloads, appends
landing mid-query, appends landing across a checkpoint restart, and
paced vs unpaced reads — must always drain to EXACTLY the produced
records: per-partition offsets dense from 0, no duplicate, no loss,
no reorder within a partition, and cumulative acks never ahead of the
produced high-water mark. The fixed e2e (test_plog_source.py) pins one
hand-built scenario; this lane walks the schedule space around it,
where offset-planning bugs (byte-range splits at segment boundaries,
pacing cursor vs checkpoint regression) would hide.

Every example runs two real streaming queries (initial + restart), so
the lane caps its example count instead of inheriting the soak knob.
"""

from __future__ import annotations

import os
import sys
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.sources.plog import (
    PartitionedLogDataSource,
    PartitionedLogWriter,
    committed_acks,
)

MAX_EXAMPLES = min(int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "20")), 30)

_PAYLOAD_SPICE = ["", "é", "漢字", "😀", "with space", 'q"uote', "pipe|comma,"]

# an append instruction: (partition selector, record count 1..3)
_APPENDS = st.lists(st.tuples(st.integers(0, 3), st.integers(1, 3)),
                    min_size=0, max_size=3)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(PartitionedLogDataSource)


@settings(max_examples=MAX_EXAMPLES, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(n_parts=st.integers(1, 4),
       phase_a=_APPENDS, phase_b=_APPENDS, phase_c=_APPENDS,
       pacing=st.sampled_from([None, 1, 2]))
def test_plog_random_schedule_exactly_once(spark, n_parts, phase_a,
                                           phase_b, phase_c, pacing):
    root = tempfile.mkdtemp(prefix="plog_fuzz_")
    log_dir = os.path.join(root, "log")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    w = PartitionedLogWriter(log_dir, n_partitions=n_parts)

    produced: dict[int, list[tuple[str, str]]] = {p: [] for p in range(n_parts)}
    counter = 0

    def produce(appends):
        nonlocal counter
        for pid_sel, n in appends:
            pid = pid_sel % n_parts
            recs = []
            for _ in range(n):
                spice = _PAYLOAD_SPICE[counter % len(_PAYLOAD_SPICE)]
                recs.append((f"k{counter}", f"v{counter}{spice}"))
                counter += 1
            w.append(pid, recs)
            produced[pid].extend(recs)

    def start():
        src = (spark.readStream.format("plog")
               .option("path", log_dir).option("partitions", n_parts))
        if pacing is not None:
            src = src.option("maxroundspertrigger", pacing)
        return (src.load().writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .start())

    try:
        produce(phase_a)
        q = start()
        q.processAllAvailable()
        produce(phase_b)          # lands mid-query
        q.processAllAvailable()
        q.stop()
        produce(phase_c)          # lands across the restart
        q2 = start()
        q2.processAllAvailable()
        q2.stop()

        if os.path.exists(out_dir):
            rows = (spark.read.parquet(out_dir)
                    .select("partition", "offset", "key", "value").collect())
        else:
            rows = []  # no batch ever wrote (all phases empty)
        got: dict[int, dict[int, tuple[str, str]]] = {}
        for r in rows:
            by_part = got.setdefault(r["partition"], {})
            assert r["offset"] not in by_part, (
                f"duplicate (partition {r['partition']}, offset "
                f"{r['offset']}) — exactly-once violated")
            by_part[r["offset"]] = (r["key"], r["value"])
        for pid in range(n_parts):
            want = produced[pid]
            have = got.get(pid, {})
            assert sorted(have) == list(range(len(want))), (
                f"partition {pid}: offsets {sorted(have)} not dense "
                f"0..{len(want) - 1}")
            for off, rec in enumerate(want):
                assert have[off] == rec, (
                    f"partition {pid} offset {off}: got {have[off]!r}, "
                    f"produced {rec!r}")
        acks = committed_acks(log_dir)
        if acks is not None:
            for pid_s, a in acks.items():
                assert a["n"] <= len(produced[int(pid_s)]), (
                    f"ack ahead of production on partition {pid_s}")
    finally:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
