"""Property-based check of the fixed-width parse semantics
(reference DataStreamProcessingJob.java:47-63) against a pure-Python
model: for ANY message string, the engine must apply the same length
guard, the same [0,16)/[16,32)/[64,..) character carve-out, the same
trim, and NULL-on-garbage for the send-time cast (engine policy where
the reference would crash the task, SURVEY.md §7.4).

Messages are generated per hypothesis example as a whole batch so each
example costs one Spark job, not one per message.
"""

from __future__ import annotations

import os
import re
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.streaming.messages import parse_messages

HEADER = 64
_INT_RE = re.compile(r"[+-]?\d+")

# ascii printable; spaces common so trims/padding paths get exercised
_CHARS = st.sampled_from(list(" " * 8) + [chr(c) for c in range(33, 127)])
_MESSAGE = st.text(alphabet=_CHARS, min_size=0, max_size=120)
# realistic well-formed messages too, so the happy path is always present
_WELLFORMED = st.builds(
    lambda mod, ms, tail: f"{mod:<16}{ms:<16}{' ' * 32}{tail}",
    st.sampled_from(["session", "other", "metrics"]),
    st.integers(min_value=0, max_value=2**41),
    st.text(alphabet=_CHARS, min_size=0, max_size=30),
)


def model_parse(value: str):
    """The reference's semantics in plain Python (Spark trim = spaces)."""
    if len(value) <= HEADER:
        return None
    module = value[0:16].strip(" ")
    st_raw = value[16:32].strip(" ")
    send_ms = None
    if _INT_RE.fullmatch(st_raw):
        v = int(st_raw)
        if -(2**63) <= v < 2**63:
            send_ms = v
    return (module, send_ms, value[64:])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_MESSAGE | _WELLFORMED, min_size=1, max_size=25))
def test_parse_matches_reference_model(spark, messages):
    raw = spark.createDataFrame([(m,) for m in messages], "value string")
    got = sorted(
        (r["module_name"], r["send_ts_ms"], r["payload"])
        for r in parse_messages(raw).collect())
    want = sorted(m for m in map(model_parse, messages) if m is not None)
    assert got == want
