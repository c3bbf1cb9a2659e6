"""The driver records a 2000-char stdout TAIL of bench.py and parses the
last line as JSON. BENCH_r07/r08 were lost (`parsed: null`) because the
one JSON line outgrew the tail. These tests pin the repaired contract:
`bench.slim_line()` always emits a line that (a) fits TAIL_BUDGET,
(b) survives the driver's tail-truncate-then-parse, and (c) still
carries every per-query median and the streaming headline rates.

No SparkSession needed — pure emission-layer tests.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

DRIVER_TAIL = 2000


def _worst_case_out(n_errors: int = 0) -> dict:
    """Max-width artifact: every HEADLINE query at a 7-char median, the
    full streaming/state/zipf key family, long regime strings."""
    out = {
        "metric": "headline_suite_wall_sec",
        "value": 1234.5678,
        "unit": "sec",
        # 12.3456 per query => a 650 s suite at sf0.1: well past any
        # plausible regression while keeping per-entry width honest
        "queries": {n: 12.3456 for n in bench.HEADLINE},
        "sf": 0.1,
    }
    for prefix in ("streaming", "streaming_tp",
                   "streaming_state_rocksdb", "streaming_state_hdfs",
                   "streaming_state_zipf_rocksdb",
                   "streaming_state_zipf_hdfs",
                   "streaming_state_zipf_rocksdb_tuned"):
        out[f"{prefix}_msgs"] = 1_000_000
        out[f"{prefix}_wall_sec"] = 123.4567
        out[f"{prefix}_msgs_per_sec"] = 123456.7
    out["streaming_regime"] = "latency (sf events, 8 micro-batches)"
    out["streaming_tp_regime"] = ("throughput (10x replicated distinct "
                                  "ids, 8 micro-batches)")
    out["streaming_state_regime"] = ("dedup(1000000 distinct ids) -> "
                                     "6h-window x user agg (10x replicated "
                                     "distinct keys, 8 micro-batches, "
                                     "append, noop sink)")
    out["host_load"] = {
        "start": {"cpus_online": 32, "load1": 31.97, "load5": 28.4,
                  "load15": 20.11, "procs_running": 40},
        "end": {"cpus_online": 32, "load1": 35.5, "load5": 30.0,
                "load15": 22.0, "procs_running": 38}}
    for i in range(n_errors):
        out.setdefault("errors", {})[f"q_broken_{i}"] = (
            "AnalysisException: " + "x" * 480)
    return out


def _driver_parse(stdout: str):
    """What the driver does: keep the last 2000 chars, parse the last
    non-empty line as JSON."""
    tail = stdout[-DRIVER_TAIL:]
    last = [ln for ln in tail.splitlines() if ln.strip()][-1]
    return json.loads(last)


def test_slim_line_fits_budget_worst_case():
    line = bench.slim_line(_worst_case_out())
    assert len(line) <= bench.TAIL_BUDGET
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["metric"] == "headline_suite_wall_sec"
    assert parsed["streaming_msgs_per_sec"] == 123456
    assert parsed["streaming_state_zipf_rocksdb_msgs_per_sec"] == 123456
    # the contamination signal survives into the tail as [start, end]
    # 1-min loadavg (VERDICT r9: official bench run was environment-
    # inflated with no way to tell from the artifact)
    assert parsed["host_load"] == [31.97, 35.5]


def test_slim_line_fits_budget_with_errors():
    line = bench.slim_line(_worst_case_out(n_errors=4))
    assert len(line) <= bench.TAIL_BUDGET
    parsed = json.loads(line)
    # errors degrade (possibly to names-only) but never disappear
    errs = parsed["errors"]
    names = set(errs) if isinstance(errs, dict) else set(errs)
    assert names == {f"q_broken_{i}" for i in range(4)}
    # medians survive up to a counted fastest-queries omission (errors
    # outrank the cheapest medians; the file keeps everything)
    kept = set(parsed["queries"])
    assert kept <= set(bench.HEADLINE)
    assert len(kept) + parsed.get("queries_omitted", 0) == len(bench.HEADLINE)
    assert len(kept) >= len(bench.HEADLINE) - 3
    # the dropped ones are the FASTEST (all equal in this fixture, so
    # just require the expensive half intact)
    assert "text_pipeline_full_auto" in kept


def test_tail_truncation_roundtrip():
    """Simulate real driver capture: progress noise before the line,
    tail-truncate to 2000, parse."""
    out = _worst_case_out(n_errors=2)
    stdout = "ivy resolving...\n" * 200 + bench.slim_line(out) + "\n"
    parsed = _driver_parse(stdout)
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["sf"] == 0.1


def test_emit_writes_full_artifact(tmp_path, monkeypatch):
    full = tmp_path / "BENCH_LOCAL.json"
    monkeypatch.setattr(bench, "FULL_OUT", str(full))
    out = _worst_case_out(n_errors=1)
    line = bench.emit(out)
    assert len(line) <= bench.TAIL_BUDGET
    on_disk = json.loads(full.read_text())
    # the FILE is lossless: regimes, msg counts, full error text
    assert on_disk == out
    assert "streaming_state_regime" in on_disk
    assert on_disk["errors"]["q_broken_0"].startswith("AnalysisException")


def test_emit_per_run_filenames(tmp_path, monkeypatch):
    """r13: probes and scaling runs must not clobber the canonical
    artifact (the r12 BENCH_LOCAL.json was silently overwritten by the
    driver's 8-core run). Subset runs and non-full-width runs land in
    BENCH_LOCAL_<cpus>c[_subset].json only."""
    full = tmp_path / "BENCH_LOCAL.json"
    monkeypatch.setattr(bench, "FULL_OUT", str(full))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_OUT", raising=False)
    out = _worst_case_out()

    # full-width full-suite run -> canonical + per-run
    monkeypatch.setenv("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ONLY", raising=False)
    bench.emit(out)
    assert full.exists()
    assert (tmp_path / f"BENCH_LOCAL_{os.cpu_count()}c.json").exists()

    # subset probe -> per-run only, canonical untouched
    full.unlink()
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ONLY", "q1_pricing_summary")
    bench.emit(out)
    assert not full.exists()
    assert (tmp_path /
            f"BENCH_LOCAL_{os.cpu_count()}c_subset.json").exists()

    # scaling run at a different width -> per-run only
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ONLY", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")
    bench.emit(out)
    assert not full.exists()
    assert (tmp_path / "BENCH_LOCAL_8c.json").exists()

    # explicit SPARK_GRAFT_BENCH_OUT wins exactly (tool contract):
    # FULL_OUT is derived from it at import, and no extra files appear
    monkeypatch.setenv("SPARK_GRAFT_BENCH_OUT", str(tmp_path / "x.json"))
    monkeypatch.setattr(bench, "FULL_OUT", str(tmp_path / "x.json"))
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "16")
    bench.emit(out)
    assert (tmp_path / "x.json").exists()
    assert not (tmp_path / "BENCH_LOCAL_16c.json").exists()
    assert not full.exists()


def test_query_meta_rides_file_not_tail():
    """r13: per-query {runs, spread, load1_before} stamps make a
    contended sample distinguishable from a regression — in the FULL
    artifact only; the slim tail keeps its exact legacy keys."""
    out = _worst_case_out()
    out["query_meta"] = {n: {"load1_before": 0.5, "n": 3,
                             "runs": [12.3, 12.4, 12.5], "spread": 0.2}
                         for n in bench.HEADLINE}
    line = bench.slim_line(out)
    assert len(line) <= bench.TAIL_BUDGET
    parsed = json.loads(line)
    assert "query_meta" not in parsed
    assert set(parsed["queries"]) == set(bench.HEADLINE)


def test_budget_degrade_is_monotonic():
    """Even an absurdly wide artifact (simulated 200-query registry dump)
    still emits a parseable line inside budget via the drop-fastest
    fallback, with the omission counted."""
    out = _worst_case_out()
    out["queries"] = {f"category_query_name_{i:03d}": 1.2345
                      for i in range(200)}
    line = bench.slim_line(out)
    assert len(line) <= bench.TAIL_BUDGET
    parsed = json.loads(line)
    assert parsed.get("queries_omitted", 0) + len(parsed["queries"]) == 200
    # drop-fastest keeps the expensive queries (all equal here, so just
    # check non-empty)
    assert parsed["queries"]


def test_wait_for_idle_stamps_and_returns_fast_when_idle():
    """r11 (--require-idle): when load1 is already under threshold the
    wait returns immediately with a satisfied stamp; an impossible
    threshold times out quickly and says so — the artifact records
    which case occurred instead of leaving contamination ambiguous."""
    import bench

    ok = bench._wait_for_idle(threshold=10**6, timeout=1.0, poll=0.1)
    assert ok["satisfied"] is True
    assert ok["waited_sec"] < 1.0
    bad = bench._wait_for_idle(threshold=-1.0, timeout=0.3, poll=0.1)
    assert bad["satisfied"] is False
    assert bad["waited_sec"] >= 0.3


def test_slim_line_survives_idle_wait_stamp():
    """host_load.idle_wait rides the full artifact; the slim tail keeps
    only the load1 pair regardless."""
    import json

    import bench

    out = {"metric": "headline_suite_wall_sec", "value": 1.0,
           "queries": {"q1": 1.0},
           "host_load": {"start": {"load1": 0.5}, "end": {"load1": 0.7},
                         "idle_wait": {"threshold": 1.0, "satisfied": True,
                                       "waited_sec": 12.3}}}
    line = bench.slim_line(out)
    assert len(line) <= bench.TAIL_BUDGET
    assert json.loads(line)["host_load"] == [0.5, 0.7]


def test_unknown_flag_refused_before_measuring():
    """ADVICE r11: a typo'd flag (e.g. --require-idel) used to be
    silently ignored via the raw `in sys.argv` match — it must exit 2
    before any Spark work."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--require-idel"],
        capture_output=True, text=True, timeout=60)
    assert p.returncode == 2
    assert "unknown argument" in p.stderr


def test_require_idle_conflicts_with_no_wait_env():
    """ADVICE r11: SPARK_GRAFT_BENCH_NO_IDLE_WAIT=1 leaves idle_wait
    None, so --require-idle was a silent no-op. The combination must
    refuse instead."""
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, SPARK_GRAFT_BENCH_NO_IDLE_WAIT="1")
    p = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"), "--require-idle"],
        capture_output=True, text=True, timeout=60, env=env)
    assert p.returncode == 2
    assert "incompatible" in p.stderr
