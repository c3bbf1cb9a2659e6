"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (<= TAIL_BUDGET chars, so the driver's
2000-char stdout tail always parses):
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
and writes the FULL artifact (regime strings, msg counts, untrimmed
floats, full error text) to BENCH_LOCAL.json (override with
$SPARK_GRAFT_BENCH_OUT). Run tools/preflight_bench.py before round end
to prove the tail-parse contract on the freshest artifact.

Protocol (BASELINE.md): wall-clock sec/query, median of 3 warm runs
(1 untimed warm-up first), full materialization through the noop sink
(no driver-side collect — measures the distributed plan, which is what
scales). `value` = sum of per-query medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datastream_processing_demo_spark.plans.registry import all_queries
from datastream_processing_demo_spark.session import EngineConfig, get_session

# The driver records only a 2000-char stdout TAIL and parses the last
# line as JSON. BENCH_r07/r08 were lost (`parsed: null`) because the
# full JSON line outgrew that tail. Contract now: the FULL artifact is
# written to BENCH_LOCAL.json (committed per round), and stdout gets a
# compact line guaranteed <= TAIL_BUDGET chars (see slim_line()).
TAIL_BUDGET = 1950  # tail is 2000; leave headroom for the trailing newline
FULL_OUT = os.environ.get(
    "SPARK_GRAFT_BENCH_OUT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH_LOCAL.json"))


def slim_line(out: dict, budget: int = TAIL_BUDGET) -> str:
    """Compact one-line JSON that always fits the driver's stdout tail.

    Keeps the per-query medians (the judge's primary record) and the
    streaming throughput headlines; sheds redundancy in degrade steps —
    everything shed is still in BENCH_LOCAL.json:
      1. regime descriptions + msg counts out; floats trimmed
      2. non-latency wall_secs out (derivable from msgs/rate in the file)
      3. error details -> error names
      4. query medians at 2dp
      5. host_load pair out (full context stays in the file)
      6. (last resort) fastest queries dropped, count noted
    """
    def build(qdp: int, err_chars, keep_walls: bool, drop_n: int = 0,
              keep_load: bool = True) -> str:
        slim: dict = {}
        for k, v in out.items():
            if k.endswith("_regime") or k.endswith("_msgs") or k == "unit":
                continue
            if k == "query_meta":
                continue  # per-run diagnostics live in the file only
            if k == "host_load" and not keep_load:
                continue
            if k == "queries":
                items = sorted(v.items(), key=lambda kv: -kv[1])
                if drop_n:
                    items = items[:max(1, len(items) - drop_n)]
                slim[k] = {n: round(t, qdp) for n, t in items}
                if drop_n:
                    slim["queries_omitted"] = drop_n
            elif k == "errors":
                slim[k] = (sorted(v) if err_chars is None
                           else {n: m[:err_chars] for n, m in v.items()})
            elif k.endswith("_wall_sec"):
                if keep_walls or k == "streaming_wall_sec":
                    slim[k] = round(v, 2)
            elif k.endswith("_msgs_per_sec"):
                slim[k] = int(v)
            elif k == "host_load":
                # keep the contamination signal in the tail: 1-min load
                # at start/end (full context stays in BENCH_LOCAL.json)
                slim[k] = [v.get("start", {}).get("load1"),
                           v.get("end", {}).get("load1")]
            elif isinstance(v, float):
                slim[k] = round(v, 2)
            else:
                slim[k] = v
        slim["full"] = os.path.basename(FULL_OUT)
        return json.dumps(slim, separators=(",", ":"))

    for qdp, err_chars, keep_walls, keep_load in (
            (3, 120, True, True), (3, 120, False, True),
            (3, None, False, True), (2, None, False, True),
            (2, None, False, False)):
        s = build(qdp, err_chars, keep_walls, keep_load=keep_load)
        if len(s) <= budget:
            return s
    for drop_n in range(1, len(out.get("queries", {})) + 1):
        s = build(2, None, False, drop_n, keep_load=False)
        if len(s) <= budget:
            return s
    return build(2, None, False, keep_load=False)[:budget]  # unreachable


def emit(out: dict) -> str:
    """Write the full artifact; return the stdout line.

    Per-run artifact filenames (VERDICT r12 "What's wrong #4": the r12
    committed BENCH_LOCAL.json was silently overwritten first by a
    2-query probe, then by the driver's 8-core scaling run): unless the
    caller pinned an explicit $SPARK_GRAFT_BENCH_OUT, every run also
    writes BENCH_LOCAL_<cpus>c[_subset].json, and the canonical
    BENCH_LOCAL.json is only touched by a FULL-suite run at the host's
    full width — scaling runs and probes can no longer clobber it."""
    paths = [FULL_OUT]
    if "SPARK_GRAFT_BENCH_OUT" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 0))
        subset = bool(os.environ.get("SPARK_GRAFT_BENCH_ONLY"))
        tag = f"{cpus}c" + ("_subset" if subset else "")
        per_run = os.path.join(os.path.dirname(FULL_OUT),
                               f"BENCH_LOCAL_{tag}.json")
        if subset or cpus != str(os.cpu_count() or 0):
            paths = [per_run]
        else:
            paths = [FULL_OUT, per_run]
    for p in paths:
        with open(p, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(f"bench: full artifact -> {', '.join(paths)}", file=sys.stderr)
    return slim_line(out)


HEADLINE = [
    "q1_pricing_summary",      # scan + filter + hash agg + sort
    "join_inner_3way",         # fact->orders->customer joins
    "join_broadcast_star",     # star join, broadcast dims
    "join_semi",               # semi join
    "agg_groupby_family",      # wide aggregate family
    "agg_cube",                # cube
    "agg_distinct",            # multi count-distinct
    "win_ranking",             # full-table window functions
    "win_topk_per_group",      # top-k idiom
    "sort_multikey_limit",     # global sort + limit
    "setop_union_all",         # set op
    "json_extract",            # JSON path extraction
    "array_higher_order",      # array folds
    "stream_tumbling_window",  # event-time windows (batch form)
    "stream_session_window",   # session windows
    "pipeline_delay_metric",   # reference pipeline parse+route+delay
    "text_bigram_tf",          # n-gram TF (explode-heavy)
    "dedup_ngram_jaccard",     # inverted-index near-dup join
    "dedup_minhash_lsh",       # MinHash+LSH banding
    "sim_bruteforce_topk",     # brute-force ANN baseline
    "udf_pandas_vectorized",   # Arrow UDF path
    "mm_decode_features",      # mapInPandas multimodal stage
    "join_asof_attribution",   # as-of join (union+window form)
    "stream_hypertable_rollup",  # minute->hour->day rollup cascade
    "stream_gap_fill",         # dense-grid densification + LOCF
    "join_merge_upsert",       # MERGE idiom (full-outer coalesce)
    "text_vocab_build",        # corpus term count + rank
    "text_sequence_pack",      # running token-offset packing
    "text_repetition_filter",  # map-only trigram rep-ratio
    "sim_quantize_int8",       # map-only embedding quantization
    "json_variant",            # Variant parse + typed extraction
    "text_pii_redact",         # map-only regex PII scrub
    "fn_string_distance",      # blocked fuzzy self-join (bounded levenshtein)
    "text_pipeline_full_auto",  # composed pipeline, near-dup lane scale-dispatched (r10)
    "text_pipeline_full_lsh",  # same pipeline, near-dup pinned to MinHash+LSH
    "mm_audio_wav_real",       # REAL WAV codec lane (wrap + container parse)
    "mm_image_ppm_real",       # REAL netpbm codec lane (wrap + container parse)
    "mm_image_png_real",       # REAL compressed PNG codec lane
    "text_gopher_rules",       # map-only Gopher quality gate
    "dedup_decontaminate",     # 8-gram eval-overlap broadcast join
    "dedup_corpus_dup_fraction",  # corpus duplicated-span fraction
    "win_funnel_stages",       # single-shuffle ordered-sequence funnel
    "sample_temperature_mixture",  # broadcast-weight temperature sampling
    "text_unigram_logprob",    # corpus unigram-LM doc scoring
    "text_bigram_logprob",     # bigram-LM doc scoring (fluency gate)
    "sim_tfidf_cosine_topk_dense",  # block-dense gram-matrix cosine (applyInPandas)
    "sim_hybrid_rrf",          # lexical+vector reciprocal-rank fusion
    "dedup_incremental_delta",  # anti-join new shard vs corpus hash state
    "text_chunk_overlap",      # map-only context-window chunking
    "sim_semdedup",            # k-means-cell semantic dedup (blocked components)
    "sim_semdedup_auto",       # same, cells sized from the corpus (Arrow lane)
    "dedup_minhash_incremental",  # shard vs persisted corpus LSH index ingest
    "fn_string_distance_auto",  # cardinality-dispatched fuzzy match (r9)
    "dedup_simhash_auto",      # corpus-sized-width SimHash pipeline (r9)
]

RUNS = 3


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_pipeline_regime(spark, msgs, n_msgs: int, prefix: str) -> dict:
    """One end-to-end run of the reference-parity three-sink pipeline
    (parse -> route -> delay -> bulk/metric/main sinks) over a prepared
    message DataFrame. File-stream source in 8 micro-batches, spool
    sinks, full checkpointing — the real streaming path, not a batch
    proxy."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.streaming.pipeline import (
        run_pipeline_stream,
    )
    from datastream_processing_demo_spark.streaming.sinks import (
        HttpBulkWriter,
        MetricAvgReporter,
    )

    work = tempfile.mkdtemp(prefix="bench-stream-")
    try:
        src_dir = os.path.join(work, "src")
        msgs.repartition(8).write.mode("overwrite").parquet(src_dir)
        src = (spark.readStream.schema("value string")
               .option("maxFilesPerTrigger", 1).parquet(src_dir))
        t0 = time.perf_counter()
        q = run_pipeline_stream(
            src, checkpoint_dir=os.path.join(work, "ckpt"),
            main_out_dir=os.path.join(work, "main"),
            bulk_writer=HttpBulkWriter(os.path.join(work, "bulk")),
            metric_reporter=MetricAvgReporter(os.path.join(work, "metric")),
            now_ms=F.lit(1700000000000))
        finished = q.awaitTermination(timeout=600)
        wall = time.perf_counter() - t0
        if not finished:
            # Timed out: stop the query and report an error instead of a
            # bogus ~600 s-denominator throughput (ADVICE r2).
            q.stop()
            return {f"{prefix}_msgs": n_msgs,
                    f"{prefix}_error": "streaming query not finished after 600s"}
        return {f"{prefix}_msgs": n_msgs,
                f"{prefix}_wall_sec": round(wall, 4),
                f"{prefix}_msgs_per_sec": round(n_msgs / wall, 1)}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _run_stateful_regime(spark, df, n_rows: int, prefix: str,
                         provider: str, extra_conf: dict | None = None) -> dict:
    """One run of the STATE-BOUND streaming regime: watermarked
    cross-batch dedup over n_rows DISTINCT event ids chained into a
    6h-window x user aggregate — two stateful operators whose store
    grows across all 8 micro-batches. noop sink, so the number is the
    source+state path, not sink I/O. `provider` pins the state-store
    implementation for this query (set before start, restored after)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.streaming.windows import (
        dedup_within_watermark,
    )

    work = tempfile.mkdtemp(prefix="bench-state-")
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf_key, None)
    oldp = spark.conf.get("spark.sql.shuffle.partitions")
    extra_olds = {}
    try:
        # apply extra_conf INSIDE the try: if a conf.set raises mid-loop
        # the finally restores the keys already applied instead of
        # leaking them into subsequent regimes' measurements (ADVICE r10)
        for k, v in (extra_conf or {}).items():
            extra_olds[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        src_dir = os.path.join(work, "src")
        df.repartition(8).write.mode("overwrite").parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src_dir))
        spark.conf.set(conf_key, provider)
        # state tasks are frozen per checkpoint from shuffle.partitions;
        # 8 keeps per-batch scheduling cost honest for a single host
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        agg = (dedup_within_watermark(src, watermark="40 days")
               .groupBy(F.window("ts", "6 hours"), "user_id")
               .agg(F.count(F.lit(1)).alias("n")))
        t0 = time.perf_counter()
        q = (agg.writeStream.format("noop")
             .option("checkpointLocation", os.path.join(work, "ckpt"))
             .outputMode("append").trigger(availableNow=True).start())
        finished = q.awaitTermination(timeout=600)
        wall = time.perf_counter() - t0
        if not finished:
            q.stop()
            return {f"{prefix}_msgs": n_rows,
                    f"{prefix}_error": "stateful query not finished in 600s"}
        return {f"{prefix}_msgs": n_rows,
                f"{prefix}_wall_sec": round(wall, 4),
                f"{prefix}_msgs_per_sec": round(n_rows / wall, 1)}
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)
        for k, v in extra_olds.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.conf.set("spark.sql.shuffle.partitions", oldp)
        shutil.rmtree(work, ignore_errors=True)


def _replicated_events(spark, sf_dir: str, target: int = 1_000_000):
    """The shared state-regime base: sf events replicated to >= `target`
    rows with per-replica DISTINCT event/user ids."""
    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.catalog import load_table

    events = (load_table(spark, sf_dir, "events")
              .select("event_id", "ts", "user_id", "event_type", "value"))
    n = events.count()
    reps = max(1, -(-target // max(n, 1)))
    base = (events
            .withColumn("_rep", F.explode(
                F.sequence(F.lit(0), F.lit(reps - 1))))
            .withColumn("event_id", F.col("event_id").cast("long")
                        + F.col("_rep").cast("long")
                        * F.lit(1_000_000_000).cast("long"))
            .withColumn("user_id", F.col("user_id").cast("long")
                        + F.col("_rep").cast("long")
                        * F.lit(1_000_000).cast("long"))
            .drop("_rep"))
    return base, n * reps


def _streaming_state_zipf_throughput(spark, sf_dir: str) -> dict:
    """State-bound regime under ZIPF-keyed aggregation (VERDICT r8 task
    #6): the uniform-key regime spreads state updates evenly; real
    streams have hot users. Same >=1M-distinct-id dedup stage (event_id
    stays uniform — the dedup store still grows to 1M keys), but
    user_id is remapped to a Zipf(~1) rank via inverse-CDF on a
    content hash: rank = floor(N^u) with u = hash(event_id)/2^20 in
    [0,1) gives P(rank r) ~ 1/r — the hottest user takes ~6% of all
    rows (ln 2 / ln N), so one (window, user) agg key concentrates
    ~60k updates while the tail stays wide. Deterministic (no RNG),
    both providers measured."""
    from pyspark.sql import functions as F

    base, n_rows = _replicated_events(spark, sf_dir)
    n_users = 100_000
    u = ((F.pmod(F.xxhash64("event_id"), F.lit(1_048_576)).cast("double")
          + 0.5) / 1_048_576.0)
    base = base.withColumn(
        "user_id", F.floor(F.pow(F.lit(float(n_users)), u)).cast("long"))
    out: dict = {}
    rocksdb = ("org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider")
    for tag, provider in (
            ("rocksdb", rocksdb),
            ("hdfs", "org.apache.spark.sql.execution.streaming.state."
                     "HDFSBackedStateStoreProvider")):
        out.update(_run_stateful_regime(
            spark, base, n_rows, f"streaming_state_zipf_{tag}", provider))
    # tuned RocksDB line (VERDICT r9 task #5): changelog checkpointing
    # skips the per-batch full-SST snapshot upload; bigger block cache +
    # write buffers fit the hot partition's working set. Interleaved
    # median-of-3 probe: +5-7% over defaults; compression=off measured a
    # wash; the rest of the ~40% gap to the heap provider is the native
    # serde/JNI per-update cost (SCALE.md r10).
    out.update(_run_stateful_regime(
        spark, base, n_rows, "streaming_state_zipf_rocksdb_tuned", rocksdb,
        extra_conf={
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled": "true",
            "spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB": "256",
            "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "64",
            "spark.sql.streaming.stateStore.rocksdb."
            "maxWriteBufferNumber": "4"}))
    out["streaming_state_zipf_regime"] = (
        f"dedup({n_rows} distinct ids) -> 6h-window x Zipf user agg "
        f"(rank = floor({n_users}^u), hottest user ~6% of rows, "
        f"8 micro-batches, append, noop sink)")
    return out


def _streaming_state_throughput(spark, sf_dir: str) -> dict:
    """Stateful-regime throughput (VERDICT r6 task #6): the msgs/s
    headline regimes are a stateless parse-route-sink pipeline; this
    measures the regime where the STATE STORE is the bottleneck —
    >= 1M distinct dedup keys + ~1M distinct (window, user) aggregate
    keys growing across 8 micro-batches — under BOTH providers
    (RocksDB = the engine/scale default, HDFSBacked = vanilla)."""
    base, n_rows = _replicated_events(spark, sf_dir)
    out: dict = {}
    for tag, provider in (
            ("rocksdb", "org.apache.spark.sql.execution.streaming.state."
                        "RocksDBStateStoreProvider"),
            ("hdfs", "org.apache.spark.sql.execution.streaming.state."
                     "HDFSBackedStateStoreProvider")):
        out.update(_run_stateful_regime(spark, base, n_rows,
                                        f"streaming_state_{tag}", provider))
    out["streaming_state_regime"] = (
        f"dedup({n_rows} distinct ids) -> 6h-window x user agg "
        f"(replicated distinct keys, 8 micro-batches, append, noop sink)")
    return out


def _streaming_throughput(spark, sf_dir: str) -> dict:
    """Two regimes, both reported (VERDICT r4 item 8):

    - `streaming_*` — the sf events table as-is (~100k msgs at sf0.1).
      Per-batch fixed costs (checkpoint commits, sink rotation)
      dominate at this size, so this is the LATENCY-regime check.
    - `streaming_tp_*` — the same messages replicated to >= 1M rows
      (distinct event ids per replica). Overheads amortize; this is the
      honest THROUGHPUT headline for a pipeline that runs continuously.
    """
    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.catalog import load_table
    from datastream_processing_demo_spark.streaming.messages import (
        messages_from_events,
    )

    events = load_table(spark, sf_dir, "events")
    n_msgs = events.count()
    out = _run_pipeline_regime(spark, messages_from_events(events), n_msgs,
                               prefix="streaming")
    out["streaming_regime"] = "latency (sf events, 8 micro-batches)"
    reps = max(1, -(-1_000_000 // max(n_msgs, 1)))
    if reps > 1:
        # salt event ids per replica so dedup/session state sees 1M
        # DISTINCT messages, not 10 copies of 100k
        base = (events
                .withColumn("_rep", F.explode(
                    F.sequence(F.lit(0), F.lit(reps - 1))))
                .withColumn("event_id", F.col("event_id").cast("long")
                            + F.col("_rep").cast("long")
                            * F.lit(1_000_000_000).cast("long"))
                .drop("_rep"))
        out.update(_run_pipeline_regime(
            spark, messages_from_events(base), n_msgs * reps,
            prefix="streaming_tp"))
        out["streaming_tp_regime"] = (
            f"throughput ({reps}x replicated distinct ids, 8 micro-batches)")
    return out


def _load_context() -> dict:
    """Host-load snapshot recorded in the artifact so a contaminated run
    is self-identifying (VERDICT r9: the official BENCH_r09 was ~1.5x
    slower across the board than same-code idle-box runs — including
    untouched trivial queries — with no way to tell from the artifact).
    `load1` >> 32 at start, or end >> start, means the medians were
    taken under host contention and a re-median is owed before reading
    them as regressions."""
    ctx: dict = {"cpus_online": os.cpu_count()}
    try:
        la1, la5, la15 = os.getloadavg()
        ctx.update({"load1": round(la1, 2), "load5": round(la5, 2),
                    "load15": round(la15, 2)})
    except OSError:
        pass
    try:  # rough concurrent-work hint: runnable/total from /proc
        with open("/proc/loadavg") as f:
            ctx["procs_running"] = int(
                f.read().split()[3].split("/")[0]) - 1  # minus this reader
    except (OSError, ValueError, IndexError):
        pass
    return ctx


def _wait_for_idle(threshold: float, timeout: float,
                   poll: float = 5.0) -> dict:
    """Spin-wait until load1 <= threshold (or timeout), so the official
    artifact is idle-by-construction instead of merely self-identifying
    (VERDICT r10: the official r10 run started at load1 = 4.02 and
    showed ~2x scatter on untouched lanes). Returns a stamp for the
    artifact: what we waited for, how long, and whether we got it."""
    t0 = time.monotonic()
    try:
        first = os.getloadavg()[0]
    except OSError:  # platform without getloadavg: nothing to wait on
        return {"threshold": threshold, "satisfied": True,
                "waited_sec": 0.0, "note": "no loadavg on this platform"}
    la1 = first
    while la1 > threshold and time.monotonic() - t0 < timeout:
        time.sleep(poll)
        la1 = os.getloadavg()[0]
    return {"threshold": threshold, "start_load1": round(first, 2),
            "final_load1": round(la1, 2),
            "waited_sec": round(time.monotonic() - t0, 1),
            "satisfied": la1 <= threshold}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Strict flag parsing (ADVICE r11): a typo'd flag must not silently
    # run an unguarded measurement.
    known_flags = {"--require-idle"}
    unknown = [a for a in sys.argv[1:] if a not in known_flags]
    if unknown:
        print(f"bench: unknown argument(s) {unknown}; "
              f"known flags: {sorted(known_flags)}", file=sys.stderr)
        sys.exit(2)
    require_idle = "--require-idle" in sys.argv[1:]
    # Idle-by-construction (VERDICT r10 task #5): wait out residual host
    # load before measuring. Default = bounded spin-wait (the driver
    # runs bench right after the correctness sweep, when load1 is still
    # draining); --require-idle REFUSES instead of proceeding when the
    # box never quiets; SPARK_GRAFT_BENCH_NO_IDLE_WAIT=1 skips entirely.
    # The two directly conflict (ADVICE r11: no-wait left idle_wait None
    # so the refuse branch could never fire) — refuse the combination.
    idle_wait = None
    if require_idle and os.environ.get("SPARK_GRAFT_BENCH_NO_IDLE_WAIT"):
        print("bench: --require-idle is incompatible with "
              "SPARK_GRAFT_BENCH_NO_IDLE_WAIT=1 (the no-wait path never "
              "evaluates load1, so the idle requirement would silently "
              "not be enforced)", file=sys.stderr)
        sys.exit(2)
    if not os.environ.get("SPARK_GRAFT_BENCH_NO_IDLE_WAIT"):
        idle_wait = _wait_for_idle(
            threshold=float(os.environ.get(
                "SPARK_GRAFT_BENCH_IDLE_LOAD1", "1.0")),
            timeout=float(os.environ.get(
                "SPARK_GRAFT_BENCH_IDLE_TIMEOUT", "300")))
        if idle_wait.get("waited_sec", 0) > 0 and \
                os.environ.get("SPARK_GRAFT_BENCH_PROGRESS"):
            print(f"bench: idle wait {idle_wait}", file=sys.stderr)
        if require_idle and not idle_wait["satisfied"]:
            print(f"bench: REFUSING to measure under load: {idle_wait}",
                  file=sys.stderr)
            sys.exit(3)
    load_start = _load_context()
    spark = get_session(EngineConfig(app_name="bench"))
    specs = all_queries()
    # Debug/re-median aid: SPARK_GRAFT_BENCH_ONLY="q1,q2" runs just those
    # queries and skips the streaming regimes (they dominate wall time).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    headline = ([q for q in only.split(",") if q] if only else HEADLINE)

    # Fault-isolated: one broken query records an error string and the
    # suite keeps going — a single failure must never zero the round.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # per-query contamination stamps (VERDICT r12 "What's wrong #1"):
    # the raw runs, their spread, and load1 right before the timing
    # block ride the full artifact, so a contended sample is
    # DISTINGUISHABLE from a regression after the fact. The timed path
    # itself (1 warm-up + median of RUNS noop materializations) is
    # byte-identical to every prior round — additions only.
    qmeta: dict[str, dict] = {}
    for name in headline:
        try:
            spec = specs[name]
            try:
                load1 = round(os.getloadavg()[0], 2)
            except OSError:
                load1 = None
            _materialize(spec.spark(spark, sf_dir))  # warm-up (scan cache, JIT)
            runs = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                _materialize(spec.spark(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(runs), 4)
            qmeta[name] = {"load1_before": load1, "n": len(runs),
                           "runs": [round(r, 4) for r in runs],
                           "spread": round(max(runs) - min(runs), 4)}
            if os.environ.get("SPARK_GRAFT_BENCH_PROGRESS"):
                print(f"bench: {name} {timings[name]}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_meta": qmeta,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if not only:
        try:
            out.update(_streaming_throughput(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — never zero the batch numbers
            errors["_streaming"] = f"{type(exc).__name__}: {exc}"[:500]
        try:
            out.update(_streaming_state_throughput(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            errors["_streaming_state"] = f"{type(exc).__name__}: {exc}"[:500]
        try:
            out.update(_streaming_state_zipf_throughput(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            errors["_streaming_state_zipf"] = f"{type(exc).__name__}: {exc}"[:500]
    if errors:
        out["errors"] = errors
    out["host_load"] = {"start": load_start, "end": _load_context()}
    if idle_wait is not None:
        out["host_load"]["idle_wait"] = idle_wait
    print(emit(out))


if __name__ == "__main__":
    main()
