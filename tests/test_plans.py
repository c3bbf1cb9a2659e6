"""Physical-plan audits (the 100 TB discipline checks): filters push to
parquet, dimension joins broadcast, hot paths stay in whole-stage
codegen, projections prune columns at the scan."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datastream_processing_demo_spark.plans.registry import all_queries


def _plan(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    import contextlib
    import io

    df = all_queries()[name].spark(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q1_filter_pushdown_and_codegen(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters:" in plan and "l_shipdate" in plan.split("PushedFilters:")[1].split("\n")[0], \
        "shipdate filter must reach the parquet scan"
    assert plan.count("HashAggregate") >= 2, "expect partial+final hash aggregate"
    # with AQE the pre-execution plan wraps everything in
    # AdaptiveSparkPlan (codegen stars appear only in the final plan);
    # assert the adaptive wrapper is present — runtime re-planning is
    # part of the 100 TB posture
    simple = _plan(spark, sf_dir, "q1_pricing_summary", mode="simple")
    assert "AdaptiveSparkPlan" in simple


def test_q1_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    # only the 7 referenced columns, not all 11
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema, \
        f"scan reads unreferenced columns: {read_schema}"


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast_star")
    assert plan.count("BroadcastHashJoin") >= 3, \
        "all three dimension joins must be broadcast (no fact shuffle)"
    assert "SortMergeJoin" not in plan


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_semi")
    assert "LeftSemi" in plan


def test_projection_prunes_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "proj_derived_exprs")
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_shipdate" not in read_schema and "l_returnflag" not in read_schema


def test_topk_prunes_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "win_topk_per_group")
    # Catalyst's WindowGroupLimit applies the k-limit map-side BEFORE the
    # shuffle — the property that makes window top-k viable at 100 TB
    assert "WindowGroupLimit" in plan, "expected partial top-k pushdown"


def test_q6_pushes_all_filters(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_q6_revenue_forecast")
    pushed = plan.split("PushedFilters:")[1].split("\n")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} filter must reach the parquet scan"
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_orderkey" not in read_schema and "l_returnflag" not in read_schema


def test_ivf_assignment_is_shuffle_free(spark, sf_dir):
    # cell assignment embeds the centroids as literals: the corpus side
    # must flow scan -> project -> broadcast join with NO exchange before
    # the join (the only exchange allowed is the window over tiny top-k
    # candidates). No SMJ, no cartesian product anywhere.
    plan = _plan(spark, sf_dir, "sim_ivf_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    import re
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) <= 1, \
        f"corpus side must not shuffle for assignment: {exchanges}"


def test_pivot_explicit_values_single_pass(spark, sf_dir):
    # with the value list given, pivot is ONE aggregate over ONE scan —
    # no extra distinct-values job, no second read of the fact table
    import re
    plan = _plan(spark, sf_dir, "agg_pivot")
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1, f"pivot must scan orders once: {scans}"


def test_correlated_exists_decorrelates_to_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "subq_correlated_exists")
    assert "LeftSemi" in plan, "EXISTS must decorrelate to a semi join"
    assert "CartesianProduct" not in plan


def test_minhash_lsh_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, \
        "LSH candidates must come from the bucket join, not all-pairs"


def test_q19_disjunction_stays_equi_hash_join(spark, sf_dir):
    # The OR-of-ANDs predicate shares the p_partkey equality conjunct;
    # the plan must be a (broadcast) hash join with a post-join filter,
    # never a nested-loop over the disjunction.
    plan = _plan(spark, sf_dir, "sql_q19_disjunctive_join")
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q17_correlated_subquery_decorrelates(spark, sf_dir):
    # Catalyst must rewrite the per-row scalar subquery into an
    # aggregate on l_partkey joined back — no nested-loop rescan.
    plan = _plan(spark, sf_dir, "sql_q17_small_quantity")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_asof_join_is_window_not_join(spark, sf_dir):
    # The as-of operator is union+window: one hash exchange on user_id,
    # zero join operators (a range/theta join here would explode at
    # scale; the window streams each key).
    plan = _plan(spark, sf_dir, "join_asof_attribution")
    assert "Window" in plan
    assert "Join" not in plan
    assert "hashpartitioning(user_id" in plan


def test_centroid_rollup_partial_aggregates(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sim_centroid_rollup")
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan
    assert "CartesianProduct" not in plan


def test_q9_pushes_like_filter_to_part_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sql_q9_product_profit")
    # the LIKE-filtered part dimension must be filtered at its scan (so
    # the dimension side stays small enough to broadcast), not after the
    # 5-way join
    pushed = [seg.split("\n")[0] for seg in plan.split("PushedFilters:")[1:]]
    assert any("p_name" in p for p in pushed), \
        f"p_name LIKE must reach the part scan: {pushed}"


def test_gap_fill_single_shuffle_of_raw_data(spark, sf_dir):
    plan = _plan(spark, sf_dir, "stream_gap_fill")
    # events shuffles once into the hour-grain aggregate; the grid is
    # derived from the aggregated table, so no second raw-data exchange
    # with events' grouping keys appears.  The hour aggregate must
    # partial-combine map-side.
    assert plan.count("HashAggregate") >= 2, "hour grain must partial-aggregate"
    events_scans = plan.count("events.parquet") or plan.count("Scan parquet")
    assert events_scans >= 1


def test_mode_partial_aggregates_and_group_limit(spark, sf_dir):
    plan = _plan(spark, sf_dir, "agg_mode_exact")
    assert plan.count("HashAggregate") >= 2, "count level must map-side combine"
    assert "WindowGroupLimit" in plan or "Window" in plan


def test_merge_upsert_is_single_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_merge_upsert")
    assert "FullOuter" in plan, "MERGE idiom must be one full-outer join"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_vocab_build_ranks_aggregated_table_only(spark, sf_dir):
    # r5 shape: the aggregate + range-exchange happen before the
    # two-phase rank's checkpoint, so the FINAL plan is a pure map-side
    # projection over the checkpointed ranked table — no Window, no
    # re-aggregation, no second shuffle.
    plan = _plan(spark, sf_dir, "text_vocab_build")
    assert "Window" not in plan, "vocab rank must not use a Window"
    assert "ExistingRDD" in plan, "rank must read the checkpointed sort"
    assert "Exchange" not in plan, "id assignment must be map-side"


def test_q2_correlated_min_decorrelates(spark, sf_dir):
    # The per-part correlated MIN over the region-filtered supplier set
    # must become an aggregate joined back on p_partkey — equi hash
    # joins only, no per-row rescan of the ps view.
    plan = _plan(spark, sf_dir, "sql_q2_min_cost_supplier")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_q20_nested_in_chain_is_semi_joins(spark, sf_dir):
    # Both IN subqueries and the correlated scalar threshold decorrelate:
    # the plan is a chain of semi joins + aggregates, never a loop.
    plan = _plan(spark, sf_dir, "sql_q20_excess_inventory")
    assert "LeftSemi" in plan, "IN chains must plan as semi joins"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_exists_pair_is_semi_plus_anti(spark, sf_dir):
    # EXISTS -> left semi, NOT EXISTS -> left anti, both self-joins of
    # lineitem on l_orderkey (co-partitioned with the main join at
    # scale); the <> conjunct rides along as a join residual.
    plan = _plan(spark, sf_dir, "sql_q21_waiting_orders")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rollup_cascades_scan_raw_once(spark, sf_dir):
    # The multi-resolution rollups must produce minute/hour/day from ONE
    # raw scan (grouping sets over the minute-grain table). A union of
    # cascaded aggregates silently replans N full rescans — Spark shares
    # no subplans across union branches.
    from datastream_processing_demo_spark.plans.aggregates import agg_sketch_rollup

    def _plan_of(name):
        # agg_sketch_rollup retired from the registry (superseded by the
        # exact-oracled agg_sketch_bounds) but its plan shape stays pinned
        if name == "agg_sketch_rollup":
            import contextlib
            import io
            df = agg_sketch_rollup(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue()
        return _plan(spark, sf_dir, name)

    for name in ("stream_hypertable_rollup", "agg_sketch_rollup"):
        plan = _plan_of(name)
        n_scans = plan.count("Scan parquet")
        assert n_scans <= 2, \
            f"{name}: expected one raw scan, plan mentions {n_scans}"
        assert "Expand" in plan, f"{name}: grouping-sets Expand missing"


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    # Runtime row-level filtering (SPARK-32268): a selective dimension
    # filter feeding a shuffle join injects bloom_filter_agg on the dim
    # side and might_contain on the fact side, discarding non-matching
    # fact rows BEFORE the shuffle. At 100 TB that is the difference
    # between shuffling the full fact table and shuffling the matching
    # slice. Production thresholds (10M creation rows / 10G scan) don't
    # trip at test scale, so pin them down for the audit only.
    import contextlib
    import io

    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.catalog import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT")
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "might_contain" in plan, \
            "fact side must be pre-filtered by the runtime bloom filter"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_zorder_layout_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """The z-order claim made concrete: files written sorted by the
    Morton key carry parquet footer min/max stats that are tight in
    BOTH x and y, so row-group pruning works for filters on EITHER
    column; a single-column sort is tight in that column only. This is
    the mechanism that prunes a 100 TB scan down to a few files."""
    import pyarrow.parquet as pq

    from datastream_processing_demo_spark.plans.registry import get

    zdf = get("storage_zorder_key").spark(spark, sf_dir)
    n_files = 8

    def spans(path) -> dict:
        out = {"x": [], "y": []}
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            meta = pq.read_metadata(os.path.join(path, f))
            mins, maxs = {}, {}
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    col = meta.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in out:
                        st = col.statistics
                        mins[name] = min(mins.get(name, st.min), st.min)
                        maxs[name] = max(maxs.get(name, st.max), st.max)
            for name in out:
                out[name].append(maxs[name] - mins[name])
        return out

    lo = {c: zdf.agg({c: "min"}).collect()[0][0] for c in ("x", "y")}
    hi = {c: zdf.agg({c: "max"}).collect()[0][0] for c in ("x", "y")}
    rng = {c: hi[c] - lo[c] for c in ("x", "y")}

    zpath = str(tmp_path / "zsorted")
    (zdf.repartitionByRange(n_files, "zkey").sortWithinPartitions("zkey")
        .write.mode("overwrite").parquet(zpath))
    xpath = str(tmp_path / "xsorted")
    (zdf.repartitionByRange(n_files, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(xpath))

    zs, xs = spans(zpath), spans(xpath)
    # median per-file span as a fraction of the full value range
    med = lambda v: sorted(v)[len(v) // 2]
    z_frac = {c: med(zs[c]) / rng[c] for c in ("x", "y")}
    x_frac = {c: med(xs[c]) / rng[c] for c in ("x", "y")}
    # single-column sort: tight on x, blind on y
    assert x_frac["x"] <= 0.30, x_frac
    assert x_frac["y"] >= 0.90, x_frac
    # z-order: meaningfully tight on BOTH dimensions
    assert z_frac["x"] <= 0.60 and z_frac["y"] <= 0.60, z_frac
    assert z_frac["y"] <= x_frac["y"] / 1.5, (z_frac, x_frac)


def test_text_pipeline_full_no_cartesian_no_python(spark, sf_dir):
    # The composed training pipeline must stay one declarative Catalyst
    # plan: no cartesian/nested-loop pair generation (the near-dup stage
    # is the inverted-index join) and no Python evaluation anywhere
    # (redact/quality/split are all built-in expressions).
    plan = _plan(spark, sf_dir, "text_pipeline_full")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pipeline_delay_metric_prunes_and_pushes(spark, sf_dir):
    # The reference-parity delay pipeline reads only the columns that
    # form the message (event_id/ts/event_type/props); the unused
    # user_id and value columns must prune out of the events scan.
    plan = _plan(spark, sf_dir, "pipeline_delay_metric")
    assert "CartesianProduct" not in plan
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "user_id" not in read_schema and "value" not in read_schema, \
        f"delay metric reads unreferenced columns: {read_schema}"


def test_embedding_near_dup_is_bucket_equi_join(spark, sf_dir):
    # Candidates must come from the sign-LSH bucket equi-join — never a
    # cartesian or a data-correlated block join (VERDICT r1 #6).
    plan = _plan(spark, sf_dir, "sim_embedding_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bucket" in plan


def test_portable_minhash_no_cartesian(spark, sf_dir):
    # Portable MinHash banding joins on (band, key) buckets only.
    plan = _plan(spark, sf_dir, "dedup_minhash_portable")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_pipeline_no_cartesian_no_python(spark, sf_dir):
    # The LSH-mode composed pipeline must keep the same discipline as
    # the exact one: single declarative plan, candidates from the band
    # bucket join, no Python evaluation.
    plan = _plan(spark, sf_dir, "text_pipeline_full_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_multimodal_real_codec_lanes_are_map_only(spark, sf_dir):
    # Two chained Arrow stages (wrap -> decode) must stay map-only:
    # no Exchange anywhere — a shuffle in a per-row codec lane would be
    # pure waste at 100 TB.
    for name in ("mm_audio_wav_real", "mm_image_ppm_real",
                 "mm_image_png_real", "mm_image_jpeg_real",
                 "mm_image_jpeg_color"):
        plan = _plan(spark, sf_dir, name, mode="simple")
        assert "Exchange" not in plan, f"{name} must be shuffle-free"
        assert plan.count("MapInPandas") == 2, \
            f"{name}: expected wrap+decode Arrow stages"


def test_sample_property_queries_stay_cheap(spark, sf_dir):
    # The binomial-bound queries join two 1-row aggregates: the only
    # join must be a broadcast of a single row, never a real shuffle of
    # data rows, and sampling itself stays a map-side filter.
    plan = _plan(spark, sf_dir, "sample_bernoulli", mode="simple")
    assert "CartesianProduct" not in plan.replace(
        "BroadcastNestedLoopJoin", "")
    assert "Sample" in plan, "native sampler must be in the plan"


def test_ivf_assignment_still_shuffle_free(spark, sf_dir):
    # The dot-form L2 rewrite (exact-oracle round 3) must not have
    # changed the scale shape: corpus cell-assignment stays a literal-
    # centroid projection; the only SHUFFLE is the top-k window over
    # cell-joined candidates (the query side's BroadcastExchange is the
    # designed broadcast, not a shuffle).
    plan = _plan(spark, sf_dir, "sim_ivf_topk", mode="simple")
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_mm_pipeline_full_single_shuffle_fused_codecs(spark, sf_dir):
    # Composed multimodal prep: exactly one shuffle (the md5 dedup
    # window) and ONE fused Arrow codec stage — no join reuniting the
    # audio/image lanes, binary column scanned once.
    plan = _plan(spark, sf_dir, "mm_pipeline_full", mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("MapInPandas") == 1, plan
    assert "Join" not in plan, plan


def test_gopher_rules_map_only(spark, sf_dir):
    # The Gopher rule battery is the cheap first gate at 100 TB: it must
    # stay a map-only scan — one tokenization projection, zero Exchange,
    # zero joins, zero Python evaluation.
    plan = _plan(spark, sf_dir, "text_gopher_rules")
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    # The eval/benchmark gram set is the small side by construction; the
    # 100 TB training side must never shuffle by gram — the overlap join
    # has to be a broadcast hash join, and never a cartesian.
    plan = _plan(spark, sf_dir, "dedup_decontaminate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_corpus_dup_fraction_no_cartesian(spark, sf_dir):
    # Duplicated-span fraction needs no candidate pairs: gram-count agg
    # + equi-join back. No quadratic operator may appear, and the join
    # back must be an equi join on gram.
    plan = _plan(spark, sf_dir, "dedup_corpus_dup_fraction")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_funnel_single_sort_shuffle(spark, sf_dir):
    # The N-stage funnel must cost ONE shuffle + ONE sort of events:
    # both running-min windows share the (user_id; ts, event_id) spec,
    # so Catalyst stacks them on a single Exchange/Sort pair. A second
    # hashpartitioning of the raw events would mean the naive
    # one-shuffle-per-stage shape crept back in.
    plan = _plan(spark, sf_dir, "win_funnel_stages")
    # Both Window nodes stack on ONE Sort (and thus one user_id
    # exchange). Don't count hashpartitioning keys: the count-distinct
    # Expand's exchange reorders its grouping keys with attribute ids
    # and can lead with user_id, which made a key-prefix count flaky.
    assert plan.count("Window (") == 2, plan
    assert plan.count("Sort (") == 1, plan


def test_twap_single_user_shuffle(spark, sf_dir):
    # TWAP's lead/min/max windows and the per-user aggregate must all
    # ride ONE hash partitioning of events by user_id.
    plan = _plan(spark, sf_dir, "win_time_weighted_avg")
    assert plan.count("hashpartitioning(user_id") == 1, plan


def test_cohort_retention_two_shuffles(spark, sf_dir):
    # Cohort assignment (window min by user) + the matrix aggregate:
    # exactly the user shuffle and the (cohort, offset) shuffle — a
    # third would mean the window stopped sharing the user partitioning.
    plan = _plan(spark, sf_dir, "win_cohort_retention")
    assert plan.count("hashpartitioning(") == 2, plan


def test_interval_join_is_bucket_equi_join(spark, sf_dir):
    # The range join must compile to a hash/sort-merge EQUI-join on the
    # time bucket with the containment predicate as a residual filter —
    # never the BroadcastNestedLoopJoin Spark gives a pure theta join.
    plan = _plan(spark, sf_dir, "join_interval_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan), plan
    assert "bucket" in plan


def test_segment_dedup_two_key_shuffles_no_python(spark, sf_dir):
    # Segment dedup must be: explode -> min-agg per segment -> equi-join
    # back (riding the SAME seg partitioning) -> one doc_id reassembly
    # shuffle. Exactly two hash keys, no quadratic operator, no Python.
    plan = _plan(spark, sf_dir, "text_segment_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert "hashpartitioning(seg" in plan and "hashpartitioning(doc_id" in plan


def test_semdedup_candidates_are_cell_equi_join(spark, sf_dir):
    # SemDeDup's quadratic term must be bounded by the k-means cell: the
    # candidate stage is an equi-join on cell_id (hash or sort-merge),
    # never a cartesian, and the cell assignment itself is a
    # shuffle-free literal-centroid projection.
    from datastream_processing_demo_spark.catalog import load_table
    from datastream_processing_demo_spark.operators.similarity import (
        semdedup_candidates,
    )
    import contextlib
    import io

    emb = load_table(spark, sf_dir, "embeddings")
    member, pairs = semdedup_candidates(emb, threshold=0.35, n_cells=16)
    for df, label in ((member, "member"), (pairs, "pairs")):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan, label
        assert "BroadcastNestedLoopJoin" not in plan, label
        if label == "member":
            # assignment is a projection over the scan: no Exchange
            # before the spread() repartition, no join anywhere
            assert "Join" not in plan, plan
        else:
            assert "cell_id" in plan, plan


def test_global_rank_never_single_partition_window(spark, sf_dir):
    # The epoch-shuffle rank must come from the two-phase total sort:
    # phase 1 is ONE range exchange + local sort (no Window operator at
    # all — a partition-less Window would collapse every row into one
    # partition), and the final result keeps the range parallelism.
    from datastream_processing_demo_spark.catalog import load_table
    from datastream_processing_demo_spark.operators.ranking import (
        _range_sorted,
        global_rank,
    )
    from pyspark.sql import functions as F
    import contextlib
    import io

    keyed = (load_table(spark, sf_dir, "documents")
             .select("doc_id", F.md5(F.col("doc_id").cast("string"))
                     .alias("_skey")))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _range_sorted(keyed, "_skey", 8).explain("formatted")
    plan = buf.getvalue()
    assert "rangepartitioning" in plan.lower(), plan
    assert "Window" not in plan, plan

    out = global_rank(keyed, "_skey", rank_col="r", num_partitions=8)
    assert out.rdd.getNumPartitions() > 1
    rows = out.orderBy("r").collect()
    n = len(rows)
    assert [r["r"] for r in rows] == list(range(1, n + 1))
    # total order respects the key
    keys = [r["_skey"] for r in rows]
    assert keys == sorted(keys)


def test_tokenize_ids_vocab_is_broadcast(spark, sf_dir):
    # The word->id mapping must ride a broadcast join (vocab is tiny vs
    # corpus) and the ranking window must run over the aggregated vocab
    # only — the corpus side contributes the explode, the broadcast
    # probe, and one doc_id reassembly shuffle.
    plan = _plan(spark, sf_dir, "text_tokenize_ids")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_eval_set_pipeline_single_plan_no_python(spark, sf_dir):
    # The composed eval-set builder must stay one Catalyst plan: no
    # cartesian, no Python eval (the quality gate is pure column
    # arithmetic), and the only wide operations are the content-hash
    # window, the source pick window, and the final metadata-scale
    # ordering window.
    plan = _plan(spark, sf_dir, "pipeline_eval_set")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan, plan


def test_temperature_mixture_broadcast_only(spark, sf_dir):
    """The corpus side of temperature sampling must never shuffle: the
    weight table joins back as a broadcast, so the only exchange in the
    plan feeds the tiny lang-count aggregate."""
    plan = _plan(spark, sf_dir, "sample_temperature_mixture")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, \
        "corpus must not sort-merge against the weight table"


def test_unigram_logprob_plan_shape(spark, sf_dir):
    """LM scoring plan guards: no cartesian, no Python eval, the 1-row
    total broadcast, and the static corpus-scan count capped at 4
    distinct scan nodes — tok-side + model-side of the scoring join,
    each duplicated once under the total's subtree (which derives from
    the per-doc aggregate precisely so AQE stage reuse can serve both
    consumers from one shuffle at runtime). A regression that adds a
    third logical corpus pass or drops to Python trips one of these."""
    import re

    plan = _plan(spark, sf_dir, "text_unigram_logprob")
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    scans = set(re.findall(r"\(\d+\) Scan parquet", plan))
    assert len(scans) <= 4, plan
    assert "BroadcastExchange" in plan


def test_string_distance_compresses_to_distinct_name_matrix(spark, sf_dir):
    # r4 rewrite (sf1 rehearsal finding): the quadratic step must run on
    # DISTINCT names (the 64-value space), never on sum(block^2) id
    # pairs. Plan contract: the only nested-loop is the tiny distinct-
    # name cross (both sides are aggregates of the name column), the
    # fan-out back to ids is broadcast/hash equi-joins, and the part
    # table never self-joins on p_brand alone.
    plan = _plan(spark, sf_dir, "fn_string_distance")
    assert plan.count("HashAggregate") >= 2, "distinct-name aggregate missing"
    assert "BroadcastHashJoin" in plan, "id fan-out must be a hash join"
    # the name-matrix cross join exists but must sit ABOVE aggregates
    # (inputs are the distinct sets), not above raw scans
    assert "SortMergeJoin" not in plan or "p_brand" not in \
        plan.split("SortMergeJoin")[1][:200], \
        "no raw brand-blocked self-join"


def test_bigram_logprob_single_adjacency_shuffle(spark, sf_dir):
    # adjacency (lead over doc_id,pos) must ride ONE shuffle of the
    # token stream; the model/context joins must be broadcasts at this
    # corpus scale (Catalyst picks them via AQE/size estimate)
    import re
    plan = _plan(spark, sf_dir, "text_bigram_logprob")
    assert "CartesianProduct" not in plan
    exchanges = re.findall(r"^\s*(?:\+-|:-)?\s*\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) <= 6, f"too many exchanges ({len(exchanges)})"
    scans = re.findall(r"^\s*(?:\+-|:-)?\s*\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) <= 2, \
        f"bigram stream must be materialized once, not re-scanned: {len(scans)}"


def test_minhash_lsh_single_full_tokenize(spark, sf_dir):
    # r5 fix (VERDICT r4 #2): the full corpus is tokenized exactly once
    # (pipelined into the signature aggregate, materialized as the tiny
    # candidate checkpoint); the verify stage re-tokenizes ONLY docs
    # semi-joined to the candidate ids and its set table is checkpointed
    # once — the FINAL plan reads checkpoints alone, zero parquet scans.
    import contextlib
    import io
    import re

    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    scans = re.findall(r"^\s*(?:\+-|:-)?\s*\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 0, \
        f"final plan must read checkpoints only, got: {scans}"
    assert "CartesianProduct" not in plan
    # the verify-stage prune discipline, audited pre-checkpoint on the
    # exposed un-materialized builder: exactly one parquet scan, pruned
    # through a LeftSemi against the candidate ids
    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.catalog import load_table
    from datastream_processing_demo_spark.plans.dedup import (
        _candidate_shingle_sets,
    )
    docs = load_table(spark, sf_dir, "documents")
    cands = docs.limit(2).select(
        F.col("doc_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _candidate_shingle_sets(docs, cands).explain("formatted")
    sub = buf.getvalue()
    assert "LeftSemi" in sub, "verify must prune to candidates pre-collect_set"
    n_doc_scans = len(re.findall(r"Scan parquet.*documents", sub))
    assert n_doc_scans <= 2, sub  # docs + the cands fragment's own scan


def test_vocab_lanes_no_partitionless_window(spark, sf_dir):
    # r5 fix (VERDICT r4 #3): vocab ranking must never funnel the vocab
    # through a single-task Window. text_tokenize_ids takes top-512 via
    # TakeOrderedAndProject; both lanes rank via the two-phase total
    # sort (operators/ranking.py) — zero WindowExec in either plan.
    import contextlib
    import io

    from pyspark.sql import functions as F

    from datastream_processing_demo_spark.catalog import load_table

    for name in ("text_vocab_build", "text_tokenize_ids"):
        plan = _plan(spark, sf_dir, name)
        assert "Window" not in plan, f"{name} still plans a Window:\n{plan[:800]}"
    # the top-512 sub-plan (pre-checkpoint, so not visible in the final
    # explain) must compile to the distributed TakeOrderedAndProject —
    # pin it on the same counts->orderBy->limit shape the lane builds
    counts = (load_table(spark, sf_dir, "documents")
              .select(F.explode(F.split("text", " ")).alias("word"))
              .groupBy("word").agg(F.count(F.lit(1)).alias("c")))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        counts.orderBy(F.col("c").desc(), "word").limit(512).explain("simple")
    assert "TakeOrderedAndProject" in buf.getvalue()


def test_hybrid_rrf_no_allpairs_lexical(spark, sf_dir):
    # the lexical posting join must be keyed on the term (w) — an
    # all-pairs doc x doc product would dwarf it at corpus scale
    plan = _plan(spark, sf_dir, "sim_hybrid_rrf")
    assert "CartesianProduct" not in plan


def test_string_distance_passjoin_no_cartesian_shuffled_hash(spark, sf_dir):
    """The PassJoin lane's reason to exist is replacing the name-matrix
    cross product with an equi-join: no cartesian/nested-loop anywhere,
    and the candidate join is a SHUFFLED hash join (neither side is
    broadcast-safe past ~50k names — auto-broadcast OOMed the driver)."""
    plan = _plan(spark, sf_dir, "fn_string_distance_passjoin")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "ShuffledHashJoin" in plan


def test_simhash_auto_no_cartesian(spark, sf_dir):
    """Multi-word pigeonhole blocking must stay a bucket equi-join at
    any width — never an all-pairs product."""
    plan = _plan(spark, sf_dir, "dedup_simhash_auto")
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_argmax_single_hash_aggregate_no_window(spark, sf_dir):
    """max_by/min_by must plan as ONE partial+final hash aggregate over
    a pruned scan — not the window-row_number alternative (full sort
    shuffle) and not a self-join-back. One exchange keyed on the group
    column is the whole query (VERDICT r10 task #7 plan pin)."""
    plan = _plan(spark, sf_dir, "agg_argmax")
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("HashAggregate") >= 2, "expect partial+final agg"
    # node-detail headers "(N) Exchange" count each node exactly once
    # (the tree outline repeats node names)
    assert plan.count(") Exchange") == 1, "one group-key shuffle only"
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "o_totalprice" in read_schema and "o_comment" not in read_schema, \
        f"scan must prune to the 3 referenced columns: {read_schema}"


def test_data_profile_single_scan_bounded_shuffles(spark, sf_dir):
    """The N-column profile must cost ONE scan of the table (stack()
    unpivots map-side in a Generate), never one job per column; both
    exchanges are keyed on bounded-cardinality profile keys
    ((col_name, val) for the distinct pre-merge, then col_name), and
    there is no join anywhere (VERDICT r10 task #7 plan pin)."""
    plan = _plan(spark, sf_dir, "agg_data_profile")
    assert plan.count(") Scan parquet") == 1, "profile must be one table scan"
    assert "Generate" in plan and "stack" in plan, "map-side unpivot"
    assert "Join" not in plan
    assert plan.count(") Exchange") == 2, \
        "distinct-count pre-merge + final profile key — no more"
    for frag in plan.split("hashpartitioning(")[1:]:
        key = frag.split(")")[0]
        assert "col_name" in key, f"shuffle keyed off profile key: {key}"
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "o_comment" not in read_schema and "o_totalprice" not in read_schema


def test_pq_serving_is_broadcast_code_scan(spark, sf_dir):
    """PQ serving must be the linear code scan it promises: the tiny
    query-LUT side broadcasts into a single pass over the corpus codes
    (a non-equi broadcast join is the intended shape, like the
    brute-force lane), with the only exchange being the per-query
    ranking window."""
    plan = _plan(spark, sf_dir, "sim_ann_pq")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
