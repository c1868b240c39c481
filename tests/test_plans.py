"""Physical-plan regression tests: the scale properties every operator
depends on at 100 TB, pinned against Spark's explain output.

Correctness tests say the answer is right; these say the PLAN is right —
filters reach the parquet scan, projections prune the read schema, small
dimensions broadcast, aggregations combine map-side, top-k never sorts
globally, and the LSH self-join shuffles only (band, hash, doc_id)."""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod
from kafka_go_cardinality_spark.plans.inspect import (
    assert_broadcast_join,
    assert_partial_aggregation,
    assert_pushed_filter,
    assert_read_schema_only,
    assert_sort_free_topk,
    assert_whole_stage_codegen,
    count_exchanges,
    exchange_blocks,
    plan_string,
)

QUERIES = entry_mod.queries()


def q(name, spark, sf_dir):
    return QUERIES[name](spark, sf_dir)


def test_filter_pushdown(spark, sf_dir):
    assert_pushed_filter(q("q_filter_pred", spark, sf_dir), "o_totalprice")


def test_projection_prunes_scan(spark, sf_dir):
    # 16-column lineitem, 5-column query: the scan must read only those 5.
    assert_read_schema_only(
        q("q_project_expr", spark, sf_dir),
        {"l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"},
    )


def test_broadcast_join_hint(spark, sf_dir):
    assert_broadcast_join(q("q_join_broadcast", spark, sf_dir))


def test_three_way_join_broadcasts_dims(spark, sf_dir):
    # customer/orders join lineitem: dims are broadcast at any sf where
    # they fit; the fact table must never be the build side of a shuffle.
    assert_broadcast_join(q("q_join3_agg", spark, sf_dir))


def test_hll_partial_merge(spark, sf_dir):
    """The core scale win (SURVEY.md §4): the HLL aggregation must
    partial-aggregate map-side so the exchange carries sketches, not
    uids."""
    assert_partial_aggregation(
        q("q_card_day_approx", spark, sf_dir), "hll_sketch_agg"
    )


def test_exact_cardinality_partial(spark, sf_dir):
    assert_partial_aggregation(q("q_agg_q1", spark, sf_dir), "sum")


def test_cardinality_single_shuffle(spark, sf_dir):
    """One grain = exactly one exchange (group-by window key). More means
    an accidental repartition crept in."""
    assert count_exchanges(q("q_card_day_approx", spark, sf_dir)) == 1


def test_minute_approx_uses_sparse_sketches(spark, sf_dir):
    """Fine-grained windows are the many-groups/few-rows regime where
    HLL++'s unconditional ~21 KB dense buffer per (window, partition)
    dominates the aggregation (measured 8.6× at sf0.1).  The minute grain
    must use DataSketches ``hll_sketch_agg`` — sparse state for small
    groups — with exactly one exchange (partial sketches map-side, no
    repartition hacks)."""
    df = q("q_card_minute_approx", spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = plan_string(df)
    assert "hll_sketch_agg" in plan
    assert "REPARTITION" not in plan


def test_grain_fanout_shuffles(spark, sf_dir):
    """The 5-grain fan-out reads the input ONCE (explode before grouping,
    processor.go:60-75 re-expressed), not five passes.  The approx variant
    is a single sketch-carrying shuffle; the exact variant pays exactly one
    extra exchange for the distinct expansion — never 5x either way."""
    from kafka_go_cardinality_spark.operators.cardinality import grain_fanout
    from kafka_go_cardinality_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    assert count_exchanges(grain_fanout(events, exact=False)) == 1
    assert count_exchanges(grain_fanout(events, exact=True)) == 2


def test_topk_never_global_sorts(spark, sf_dir):
    assert_sort_free_topk(q("q_topk", spark, sf_dir))


def test_scan_stays_in_codegen(spark, sf_dir):
    # AQE's pre-execution explain hides codegen annotation; plan the same
    # query non-adaptively to see the fused stages.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert_whole_stage_codegen(q("q_agg_q1", spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_minhash_lsh_join_sheds_payload(spark, sf_dir):
    """Candidate pairs must travel as bare (doc_a, doc_b) ids — shingle
    sets (the documents themselves) are re-attached only after the
    candidate dedup.  If any set column rides the pair shuffle, the
    payload-shedding optimization regressed.  (At tiny SF the band join
    itself broadcasts, so the pair-dedup exchange is the stable thing to
    pin.)"""
    blocks = [
        b
        for b in exchange_blocks(q("q_dedup_minhash", spark, sf_dir))
        if "hashpartitioning(doc_a" in b
    ]
    assert blocks, "no (doc_a, doc_b) exchange found — LSH join shape changed"
    for b in blocks:
        assert not re.search(r"shingle_set|set_a|set_b", b), (
            f"shingle sets ride the candidate shuffle:\n{b}"
        )


def test_entry_plan_is_aggregating(spark):
    plan = plan_string(entry_mod.entry(spark), mode="simple")
    assert "hll_sketch_agg" in plan and "count" in plan


def test_partition_pruned_scan(spark, sf_dir):
    """The date filter must bind to the hive partition column at planning
    time: exactly ONE of the 30 day-directories is selected, and the
    pushed data filter list stays empty (nothing left to filter inside
    the files).  If the filter ever lands in PushedFilters instead, the
    layout lever is broken and all 30 days get opened."""
    df = q("q_scan_partition_pruned", spark, sf_dir)
    plan = plan_string(df, mode="formatted")
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    # Spark's formatted scan node reports the selected partition count.
    pc = re.search(r"partition count[^0-9]*(\d+)", plan, re.IGNORECASE)
    if pc:
        assert int(pc.group(1)) == 1, plan


def test_sessionize_single_shuffle(spark, sf_dir):
    """Batch sessionization must run end-to-end on ONE exchange: both
    window passes (lag + running sum) and the final per-session aggregate
    all require hashpartitioning(user_id), so EnsureRequirements must
    reuse a single shuffle.  A second exchange means the session-id
    projection broke the partitioning contract."""
    df = q("q_sessionize_batch", spark, sf_dir)
    assert count_exchanges(df) == 1, plan_string(df, mode="simple")


def test_exists_subquery_becomes_semi_join(spark, sf_dir):
    """Catalyst must rewrite the correlated EXISTS into a (broadcast)
    left-semi hash join with the l_quantity predicate pushed to the
    lineitem scan — the SQL surface converging on the same physical plan
    as the hand-written DataFrame semi join."""
    plan = plan_string(q("q_exists_subquery", spark, sf_dir), mode="simple")
    assert "LeftSemi" in plan, plan
    assert_pushed_filter(q("q_exists_subquery", spark, sf_dir), "l_quantity")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key to the same bucket count must
    yield a join with ZERO exchanges — the pre-shuffled co-located join
    that turns the nightly fact join at 100 TB into a map-side merge.
    (In-partition Sorts remain: since SPARK-28632 the scan does not
    propagate bucket-sort order unless the legacy flag is set; the
    exchange elimination is the scale-relevant property.)"""
    from pyspark.sql import functions as F

    from kafka_go_cardinality_spark.plans.inspect import plan_string
    from kafka_go_cardinality_spark.sources import load_table, write_bucketed

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    write_bucketed(orders, "orders_by_cust", "o_custkey", 8, path=str(tmp_path / "o"))
    write_bucketed(cust, "customer_by_key", "c_custkey", 8, path=str(tmp_path / "c"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = spark.table("orders_by_cust").join(
            spark.table("customer_by_key"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert count_exchanges(joined) == 0, plan_string(joined, mode="simple")
        plan = plan_string(joined, mode="simple")
        assert "SortMergeJoin" in plan, plan
        # same answer as the plain (shuffled) join
        assert joined.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_by_cust")
        spark.sql("DROP TABLE IF EXISTS customer_by_key")


def test_repetition_is_shuffle_free(spark, sf_dir):
    """q_text_repetition is a pure narrow map: any exchange means the
    per-document scoring accidentally became a distributed job."""
    assert count_exchanges(q("q_text_repetition", spark, sf_dir)) == 0


def test_agg_stats_partial(spark, sf_dir):
    """Moment aggregates (stddev/corr/covar) must combine map-side so the
    exchange carries per-partition moment tuples, not rows."""
    df = q("q_agg_stats", spark, sf_dir)
    assert_partial_aggregation(df, "stddev_samp")
    assert count_exchanges(df) == 1


def test_window_ntile_single_shuffle(spark, sf_dir):
    """Distribution window functions need exactly one hash exchange on the
    partition key; the in-partition sort must not become a global one."""
    df = q("q_window_ntile", spark, sf_dir)
    assert count_exchanges(df) == 1
    plan = plan_string(df)
    assert "rangepartitioning" not in plan.lower()


def test_normalize_is_shuffle_free(spark, sf_dir):
    """Text normalization is a narrow JVM-regex map: any exchange means
    the per-document pass accidentally became a distributed job."""
    assert count_exchanges(q("q_text_normalize", spark, sf_dir)) == 0


def test_contamination_broadcasts_bench_side(spark, sf_dir):
    """The benchmark shingle postings must broadcast — the 100 TB train
    corpus postings never shuffle for the overlap join."""
    assert_broadcast_join(q("q_text_contamination", spark, sf_dir))


def test_centroid_shuffles_integer_sums(spark, sf_dir):
    """Centroid aggregation must combine map-side (partial integer sums
    per (label, dim)); two exchanges total: (label, dim) then label."""
    df = q("q_emb_centroids", spark, sf_dir)
    assert_partial_aggregation(df, "sum")
    assert count_exchanges(df) == 2


def test_pipeline_curate_filters_before_dedup_window(spark, sf_dir):
    """The composed curation pipeline must stay ONE Catalyst plan with
    exactly two hash exchanges (dedup window on the content hash + final
    per-lang aggregate): the quality filter reaches the scans (pruned
    before anything shuffles) and the doc_id join broadcasts."""
    df = q("q_pipeline_curate", spark, sf_dir)
    assert count_exchanges(df) == 2
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_declared_bucketed_join_single_exchange(spark, sf_dir):
    """q_join_bucketed: the join over the pre-bucketed pair contributes
    ZERO shuffle exchanges — the only exchange in the whole plan is the
    final nationkey aggregate's (and if Spark chooses to broadcast the
    small side instead, even that still leaves at most one)."""
    df = q("q_join_bucketed", spark, sf_dir)
    assert count_exchanges(df) <= 1, plan_string(df, mode="simple")


def test_funnel_single_shuffle(spark, sf_dir):
    """Any number of funnel stages must cost exactly ONE hash exchange:
    every chained analytic minimum reuses the user_id partitioning, and
    the final explode of per-stage counts is exchange-free (the
    single-row aggregate's exchange is SinglePartition, not hash)."""
    df = q("q_funnel", spark, sf_dir)
    assert count_exchanges(df) <= 1, plan_string(df, mode="simple")


def test_markov_transitions_single_fact_shuffle(spark, sf_dir):
    """The transition matrix pays ONE hash exchange on the raw events
    (the lag window's user partitioning); everything after runs on the
    |types|²-bounded collapsed frame — marginals attach broadcast, no
    sort-merge join, no second pass over events."""
    df = q("q_markov_transitions", spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    # post-checkpoint plan: only the vocab-bounded marginal exchange
    assert count_exchanges(df) <= 1, plan


def test_zscore_broadcasts_moments(spark, sf_dir):
    """The fact scan must never shuffle: group moments (5 rows) broadcast
    back over events."""
    assert_broadcast_join(q("q_anomaly_zscore", spark, sf_dir))


def test_latest_per_key_single_shuffle(spark, sf_dir):
    """Keep-latest compaction is one row_number window: one hash
    exchange on the key, no join, no global sort."""
    df = q("q_dedup_latest", spark, sf_dir)
    assert count_exchanges(df) == 1, plan_string(df, mode="simple")
    assert "SortMergeJoin" not in plan_string(df, mode="simple")


def test_substring_dedup_never_shuffles_text(spark, sf_dir):
    """Substring dedup must move 16-byte hashed postings only through
    every HASH exchange: no join of any kind, and no aggregation
    shuffle may carry the text column.  (The one round-robin spread of
    the raw corpus is the fixture-layout artifact _signature documents
    — a one-file fixture has no scan parallelism to inherit; a
    many-file 100 TB corpus already arrives spread.)"""
    df = q("q_dedup_substring", spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert "Join" not in plan, plan
    for block in exchange_blocks(df):
        if "hashpartitioning" in block:
            assert "text#" not in block, block


def test_source_overlap_has_no_self_join(spark, sf_dir):
    """The source-overlap matrix must come from in-row pair enumeration
    over per-shingle buckets — never a posting self-join (bucket² rows)
    or a cartesian of sources; the only joins are the two broadcast
    size attachments."""
    plan = plan_string(q("q_dedup_source_overlap", spark, sf_dir), mode="simple")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "InMemoryRelation" in plan, plan  # corpus scanned once


def test_incremental_dedup_bands_carry_no_shingles(spark, sf_dir):
    """Batch-vs-corpus screening must shuffle band keys only: the
    (band, band_hash) candidate join never carries a shingle set, and
    nothing degenerates into a cartesian."""
    df = q("q_dedup_incremental", spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    for block in exchange_blocks(df):
        if "band_hash" in block:
            assert "shingle" not in block and "set_" not in block, block


def test_vocab_top_is_takeordered_then_model_sized_window(spark, sf_dir):
    """Vocabulary induction must TakeOrderedAndProject the counts (never
    globally sort every distinct token) — the single-partition
    row_number window is fine because it runs over the already-limited
    V rows (model-sized state)."""
    df = q("q_text_vocab", spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_chunking_is_map_only(spark, sf_dir):
    """RAG chunking must be a pure map pass: chunk starts, slices, and
    hashes built in-row, ZERO exchanges — at 100 TB it costs one scan."""
    df = q("q_text_chunk", spark, sf_dir)
    assert count_exchanges(df) == 0, plan_string(df, mode="simple")


def test_bigram_assoc_shuffles_only_collapsed_vocab(spark, sf_dir):
    """The PMI-odds table may shuffle only vocab-bounded frames: the
    corpus collapses into the checkpointed bigram-count frame once, the
    two unigram reductions broadcast back (2 hash joins), the 1-row
    total attaches as a scalar broadcast — never a cartesian of data."""
    df = q("q_text_bigram_assoc", spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert count_exchanges(df) <= 2, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "CartesianProduct" not in plan, plan


def test_textrank_round_is_broadcast_only(spark, sf_dir):
    """Rank state must stay DISTRIBUTED across the PageRank solve: each
    round broadcast-joins the vocab-sized rank frame onto the edge
    frame — no plan-embedded literal rank map, no collect of sums, and
    the round's single exchange sits above a partial aggregation so it
    moves vocab-bounded partial sums, never edges (VERDICT r2 item 1:
    the old create_map literal + per-iteration vocab collect was the
    one genuine 100 TB scale-killer on the surface)."""
    import pyspark.sql.functions as F

    from kafka_go_cardinality_spark.operators import text as tx
    from kafka_go_cardinality_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    e, nodes = tx._textrank_graph(docs)
    ranks = nodes.select("token", F.lit(tx.TEXTRANK_Q).cast("long").alias("r"))
    rnd = tx._textrank_round(e, nodes, ranks)
    plan = plan_string(rnd, mode="simple")
    assert "create_map" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert count_exchanges(rnd) == 1, plan
    # The one exchange must be fed by a map-side partial sum.
    assert_partial_aggregation(rnd, "sum")


def test_dpp_prunes_fact_partitions(spark, sf_dir):
    """q_scan_dpp's weekend filter lives on the calendar dim, so static
    pruning can't fire — the fact scan must carry a dynamicpruning
    subquery on event_date (partitions picked at runtime from the
    broadcast dim)."""
    df = q("q_scan_dpp", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan[:2000]


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """q_join_runtime_filter must carry the orders-side bloom filter as
    a might_contain predicate evaluated on the lineitem side before the
    join shuffle."""
    df = q("q_join_runtime_filter", spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, plan[:2000]


def test_zorder_prunes_both_dimensions(spark):
    """Measured from real parquet footers at sf0.01: under the 2-D box
    (user_id 100-500 × Jan 10-14) the Morton-clustered layout must leave
    no more candidate files than the day-sorted linear layout, and must
    actually skip some files (the linear layout can only prune the day
    dimension; z-order keeps min/max tight on both columns)."""
    import os

    import pyarrow.parquet as pq

    from kafka_go_cardinality_spark.sources.tables import zordered_events_paths

    zpath, lpath = zordered_events_paths(spark, "/root/testdata/sf0.01")

    def candidates(path):
        total, cand = 0, 0
        for entry in os.scandir(path):
            if not entry.name.endswith(".parquet"):
                continue
            md = pq.read_metadata(entry.path)
            lo_u = lo_d = float("inf")
            hi_u = hi_d = float("-inf")
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                cols = {
                    row.column(i).path_in_schema: row.column(i).statistics
                    for i in range(row.num_columns)
                }
                lo_u = min(lo_u, cols["user_id"].min)
                hi_u = max(hi_u, cols["user_id"].max)
                lo_d = min(lo_d, cols["day_no"].min)
                hi_d = max(hi_d, cols["day_no"].max)
            total += 1
            if hi_u >= 100 and lo_u <= 500 and hi_d >= 9 and lo_d <= 13:
                cand += 1
        return total, cand

    z_total, z_cand = candidates(zpath)
    l_total, l_cand = candidates(lpath)
    assert z_total == l_total == 256
    assert z_cand < l_cand, (z_cand, l_cand)
    assert z_cand < z_total, "z-order layout skipped nothing"


def test_profile_two_hash_scans_never_expand_sort(spark, sf_dir):
    """Profiling is two column-pruned scans, not N per-column re-scans:
    the distinct counts share one Expand pass that stays in
    HashAggregate (fixed-width count buffers), and min/max fold in a
    separate global aggregate — deliberately NOT merged, because a
    variable-width min(string) buffer would demote the Expand pass to
    SortAggregate (a sort of 7× the table at scale)."""
    plan = plan_string(q("q_profile_columns", spark, sf_dir), mode="simple")
    assert plan.count("FileScan parquet") == 2, plan
    assert "Expand" in plan, plan
    # The Expand (distinct-count) pass must hash-aggregate: no sort may
    # sit between Expand and its aggregate.
    idx = plan.index("Expand")
    expand_tail = plan[max(0, idx - 2000) : idx]
    assert "SortAggregate" not in expand_tail, plan


def test_global_enumerate_never_single_partition_sorts_fact(spark, sf_dir):
    """The fact-side ranking must run per bucket (hashpartitioning on
    bucket), with the only SinglePartition exchange feeding the
    constant-size offset table — never the events scan."""
    df = q("q_global_enumerate", spark, sf_dir)
    blocks = exchange_blocks(df)
    single = [b for b in blocks if "SinglePartition" in b]
    # offsets frame carries (bucket, cnt) only — no event_id/value payload
    for b in single:
        assert "event_id" not in b, b
    assert any("hashpartitioning(bucket" in b for b in blocks), blocks


def test_unigram_vocab_broadcasts(spark, sf_dir):
    """The score-back join must broadcast the vocabulary: the token
    stream (corpus-sized) never shuffles for the join."""
    assert_broadcast_join(q("q_text_unigram_nll", spark, sf_dir))


def test_cms_sketch_broadcasts_to_readout(spark, sf_dir):
    """All four depth-slices of the (d, bucket)→cnt sketch join the
    candidate side as broadcasts; the sketch build itself is the only
    aggregation over the full stream."""
    plan = plan_string(q("q_freq_cms", spark, sf_dir), mode="simple")
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_semantic_dedup_shuffles_on_cell_only(spark, sf_dir):
    """Cell assignment is map-side (no exchange between the scan and the
    argmax projection): every exchange partitions on cell / vec keys,
    never a cross join."""
    plan = plan_string(q("q_dedup_semantic", spark, sf_dir), mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_tpch_q3_pushes_all_filters_and_takes_ordered(spark, sf_dir):
    """All three predicates must reach their scans and the top-10 must
    plan as TakeOrderedAndProject — a global sort of the aggregate
    would be the bottleneck at scale."""
    df = q("q_tpch_q3", spark, sf_dir)
    assert_pushed_filter(df, "c_mktsegment")
    assert_pushed_filter(df, "o_orderdate")
    assert_pushed_filter(df, "l_shipdate")
    assert_sort_free_topk(df)


def test_seg_overlap_exact_reuses_one_fact_pass(spark, sf_dir):
    """The pairwise overlap must compute its user-keyed aggregate ONCE —
    the three consumers (off-diagonal, both size lookups) must reuse
    the exchange, never re-scan the fact table."""
    df = q("q_seg_overlap_exact", spark, sf_dir)
    df.collect()  # AQE finalizes reuse at execution
    plan = plan_string(df)
    assert "ReusedExchange" in plan, f"no exchange reuse:\n{plan}"


def test_seg_overlap_sketch_never_self_joins_fact(spark, sf_dir):
    """The sketch path pairs T-row sketch frames; the events table must
    appear in (reused-deduped) scans whose join inputs are sketch
    aggregates — concretely: every join in the plan is broadcast (the
    kilobyte sketch pairing), with no sort-merge or shuffled-hash join
    of fact-sized inputs."""
    plan = plan_string(q("q_seg_overlap_sketch", spark, sf_dir), mode="simple")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_line_dedup_df_count_combines_map_side(spark, sf_dir):
    """The chunk document-frequency count must partial-aggregate before
    its exchange — the shuffle carries (chunk, partial distinct set)
    state, not raw exploded rows."""
    assert_partial_aggregation(q("q_text_linededup", spark, sf_dir), "count")


def test_emb_quantize_is_shuffle_free(spark, sf_dir):
    """Int8 quantization is a pure map pass: zero exchanges."""
    assert count_exchanges(q("q_emb_quantize", spark, sf_dir)) == 0


def test_fk_audit_broadcasts_small_dims(spark, sf_dir):
    """The nation/customer anti joins must broadcast the dim side so the
    fact side is never exchanged."""
    assert_broadcast_join(q("q_fk_audit", spark, sf_dir))


def test_tpch_q18_semi_joins_before_wide_join(spark, sf_dir):
    """The HAVING subquery's surviving keys must reach the orders
    pipeline as a LeftSemi join (never materializing the IN list
    driver-side), and the top-100 must plan sort-free."""
    df = q("q_tpch_q18", spark, sf_dir)
    plan = plan_string(df, mode="simple")
    assert "LeftSemi" in plan, plan
    assert_sort_free_topk(df)


def test_theta_retention_broadcasts_sketch_table(spark, sf_dir):
    """q_retention_theta pairs adjacent days by a calendar self-join of
    the tiny (day, sketch) table — that join must be broadcast; the
    fact table must never reach a sort-merge or shuffled-hash join."""
    plan = plan_string(q("q_retention_theta", spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_seg_overlap_theta_never_self_joins_fact(spark, sf_dir):
    """Theta twin of the overlap query: all joins are the T×T broadcast
    pairing of kilobyte sketches — no fact-sized join anywhere."""
    plan = plan_string(q("q_seg_overlap_theta", spark, sf_dir), mode="simple")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_tpch_q6_pushes_all_three_predicates(spark, sf_dir):
    """Q6 is pure pushdown: date bounds, discount band, and quantity cap
    must all reach the lineitem parquet scan as PushedFilters, and the
    read schema must be exactly the 4 referenced columns."""
    df = q("q_tpch_q6", spark, sf_dir)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert_pushed_filter(df, col)
    assert_read_schema_only(
        df, {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    )


def test_tpch_q19_extracts_disjunction_to_part_scan(spark, sf_dir):
    """The OR'd cross-table predicate must not survive as a join-only
    filter: CNF extraction pushes the (brand, size) disjunction into the
    part side, so the part scan carries pushed filters on p_brand, and
    part still broadcasts."""
    df = q("q_tpch_q19", spark, sf_dir)
    plan = plan_string(df)
    assert "p_brand" in re.sub(r"ReadSchema:.*", "", plan), plan
    assert_broadcast_join(df)


def test_tpch_q8_only_fact_joins_shuffle(spark, sf_dir):
    """Q8's 8-table tree: every dimension broadcasts, so the only
    exchanges are the fact-side equi-joins (lineitem⋈orders⋈customer)
    plus the year aggregate — at most 4 shuffle exchanges, never a
    dim-side one."""
    df = q("q_tpch_q8", spark, sf_dir)
    assert_broadcast_join(df)
    assert count_exchanges(df) <= 4, plan_string(df)


def test_tpch_q12_pushes_date_band_and_prunes(spark, sf_dir):
    """The shipdate band reaches the lineitem scan, and both scan sides
    project only join key + one payload column."""
    df = q("q_tpch_q12", spark, sf_dir)
    assert_pushed_filter(df, "l_shipdate")
    plan = plan_string(df)
    scans = [l for l in plan.splitlines() if "ReadSchema" in l]
    for s in scans:
        if "lineitem" in s or "l_orderkey" in s:
            assert "l_extendedprice" not in s, s


def test_tpch_q15_single_fact_scan(spark, sf_dir):
    """The rev view is computed once; the global-max comparison joins the
    aggregated frame against a broadcast 1-row max — the lineitem file
    must appear in exactly one scan node."""
    plan = plan_string(q("q_tpch_q15", spark, sf_dir))
    assert plan.count("lineitem.parquet") - plan.count("ReusedExchange") <= 2
    assert_pushed_filter(q("q_tpch_q15", spark, sf_dir), "l_shipdate")


def test_tpch_q16_anti_join_broadcasts_exclusion(spark, sf_dir):
    """The complaints exclusion is a broadcast anti join: the lineitem
    side must not be exchanged to evaluate it."""
    plan = plan_string(q("q_tpch_q16", spark, sf_dir))
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), plan


def test_emb_gram_shuffles_matrix_state_not_vectors(spark, sf_dir):
    """The Gram matrix's shuffle carries (i, j, partial) int rows —
    fixed d² state per partition — never the embedding arrays."""
    df = q("q_emb_gram", spark, sf_dir)
    for block in exchange_blocks(df):
        assert "embedding" not in block, block


def test_hash_classifier_is_shuffle_free_and_pythonless(spark, sf_dir):
    """Classifier inference is a narrow map: no exchange, no Python
    evaluation node — the whole model folds inside codegen."""
    df = q("q_text_hash_classifier", spark, sf_dir)
    assert count_exchanges(df) == 0, plan_string(df)
    assert "Python" not in plan_string(df)


def test_argmax_never_sort_aggregates(spark, sf_dir):
    """argmax must stay in HashAggregate end to end: a struct-keyed
    max_by has a variable-width buffer that silently demotes the whole
    aggregation to a SortAggregate over the entire fact table."""
    df = q("q_argmax", spark, sf_dir)
    plan = plan_string(df)
    assert "SortAggregate" not in plan, plan
    assert_broadcast_join(df)


def test_ann_lsh_dedups_bare_id_pairs(spark, sf_dir):
    """The LSH candidate dedup must hash-aggregate bare (query_id,
    vec_id) pairs: vector arrays riding the distinct would give it a
    variable-width first() buffer and demote it to a SortAggregate over
    every band collision."""
    plan = plan_string(q("q_sim_ann_lsh", spark, sf_dir))
    assert "SortAggregate" not in plan, plan


# Queries whose DATA PATH legitimately crosses into Python — the three
# Arrow-batched UDF demonstrations, the multimodal decode stub, the
# Gram-matrix partial matmul, and the UDTF fan-out.  Everything else
# must stay JVM-side end to end: a Python eval node appearing anywhere
# else is a hot-path regression, not a style issue.
PYTHON_PATH_QUERIES = {
    "q_udf_pandas_scalar",
    "q_udf_grouped_agg",
    "q_udf_grouped_map",
    "q_udtf_chunks",
    "q_mm_decode",
    "q_emb_gram",
}

PY_MARKERS = (
    "ArrowEvalPython",
    "BatchEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "PythonUDTF",
    "AggregateInPandas",
)


def test_python_stays_off_hot_paths(spark, sf_dir):
    """Whole-surface invariant: no batch query outside the declared
    Python-path set may contain a Python evaluation node.  (Streaming
    queries are exercised by their own tests; building their plans here
    would start queries.)"""
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("q_stream") or name in PYTHON_PATH_QUERIES:
            continue
        plan = plan_string(fn(spark, sf_dir), mode="simple")
        if any(m in plan for m in PY_MARKERS):
            offenders.append(name)
    assert not offenders, offenders


# Queries allowed to contain a KEYED SortAggregate, each with the reason
# it cannot be hash-aggregated.  Everything else must stay hash-only —
# a keyed SortAggregate is a per-partition sort of its full input, the
# silent scale-bug class the round-2 audit (SURVEY §7.7) eliminated.
SORT_AGG_ALLOWED = {
    # Spark's BitmapConstructAgg only implements the sort-based
    # aggregation path (fixed 4 KiB binary buffer, not hash-compatible,
    # not a TypedImperativeAggregate — verified on a minimal plan).  The
    # sort keys are (day, bucket) and partial aggregation still combines
    # map-side; the sort-free exact paths (q_card_*_exact, _salted)
    # exist alongside.
    "q_card_day_exact_bitmap",
}


def test_no_keyed_sort_aggregation_outside_allowlist(spark, sf_dir):
    """Whole-surface invariant pinning the SURVEY §7.7 audit: no query
    may plan a KEYED SortAggregate (per-partition sort of its input)
    unless allowlisted with a reason.  Key-less SortAggregate (a global
    fold — min/max(string) over one group) requires no sort and is
    fine."""
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("q_stream") or name in SORT_AGG_ALLOWED:
            continue
        plan = plan_string(fn(spark, sf_dir), mode="simple")
        for m in re.finditer(r"SortAggregate\(key=\[([^\]]*)\]", plan):
            if m.group(1).strip():
                offenders.append(name)
                break
    assert not offenders, offenders


def test_no_higher_order_expressions_in_scan_datafilters(spark, sf_dir):
    """Whole-surface invariant: no parquet scan may evaluate a
    higher-order array expression inside its DataFilters.
    InferFiltersFromGenerate turns a non-outer explode into a
    ``size(<expr>) > 0`` pre-filter and pushes it below any repartition
    INTO THE SCAN — so the full tokenize/shingle/hash expression runs at
    the parquet file's parallelism (one task on a one-file fixture)
    before the spread the operator asked for; measured 23× on
    source_overlap at sf0.1.  The fix pattern is explode_outer + an
    explicit null-filter on the generator OUTPUT (which cannot sink
    below the Generate)."""
    offenders = []
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("q_stream"):
            continue
        plan = plan_string(fn(spark, sf_dir), mode="simple")
        for line in plan.splitlines():
            if "DataFilters:" in line and "lambdafunction" in line:
                offenders.append(name)
                break
    assert not offenders, offenders


def test_exchange_counts_stay_within_budget(spark, sf_dir):
    """Whole-surface shuffle budget: every batch query's exchange count
    is snapshotted in tests/exchange_budgets.json (regenerate with
    ``python scripts_gen_exchange_budgets.py`` after a DELIBERATE plan
    change).
    The check is an exact RATCHET, both directions: a count above
    budget means a shuffle crept in (the primary scale regression this
    suite exists to catch); a count below budget means a deliberate
    improvement landed without re-snapshotting — re-run the generator
    so the file stays the plan's single source of truth."""
    import json
    import pathlib

    budgets = json.loads(
        (pathlib.Path(__file__).parent / "exchange_budgets.json").read_text()
    )
    drifted = {}
    for name, budget in sorted(budgets.items()):
        n = count_exchanges(QUERIES[name](spark, sf_dir))
        if n != budget:
            drifted[name] = (n, budget)
    assert not drifted, f"exchange count drift (actual, budget): {drifted}"
    missing = {
        n
        for n in QUERIES
        if not n.startswith("q_stream") and n not in budgets
    }
    assert not missing, f"queries with no exchange budget: {missing}"


def test_fact_table_never_broadcast_in_join_queries(spark, sf_dir):
    """Tree-aware whole-family invariant: in every TPC-H/join query,
    lineitem (the fact table) must never sit inside a BroadcastExchange
    subtree.  Catalyst's size estimates at fixture scale CAN pick the
    pruned fact as the build side (it did for Q5 as originally written)
    — locally harmless, at 100 TB the one plan that cannot run."""
    import json as _json

    def subtree_has_lineitem(nodes, i):
        node = nodes[i]
        found = "lineitem.parquet" in _json.dumps(node)
        j = i + 1
        for _ in range(node.get("num-children", 0)):
            j, f = subtree_has_lineitem(nodes, j)
            found = found or f
        return j, found

    offenders = []
    for name, fn in sorted(QUERIES.items()):
        if not (name.startswith("q_tpch") or name.startswith("q_join")):
            continue
        nodes = _json.loads(
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toJSON()
        )
        for i, node in enumerate(nodes):
            if "BroadcastExchange" in node.get("class", ""):
                _, f = subtree_has_lineitem(nodes, i)
                if f:
                    offenders.append(name)
                    break
    assert not offenders, offenders


def test_no_hard_broadcast_hint_on_growing_dims(spark, sf_dir):
    """Supplier/part/customer GROW with sf — a hard broadcast hint on
    them is honored regardless of size and cannot execute at sf10k
    (~15 GB supplier).  The TPC-H family must rely on Catalyst's
    size-aware auto-broadcast instead (round-4 verdict #3).  Pinned by
    plan text: no ResolvedHint survives into the optimized plan of any
    TPC-H query (hints on nation/region fold into the join strategy
    before this point only if declared — we dropped all but the
    fixed-cardinality dims, whose hint is fine at any sf)."""
    import re as _re

    for name in [k for k in QUERIES if k.startswith("q_tpch_")]:
        df = q(name, spark, sf_dir)
        # The analyzed (pre-optimization) plan retains every user hint.
        analyzed = df._jdf.queryExecution().analyzed().toString()
        for m in _re.finditer(r"ResolvedHint \(strategy=broadcast\)([\s\S]{0,400})", analyzed):
            tail = m.group(1)
            assert not _re.search(r"relation=\[?(supplier|part|lineitem|orders|customer)", tail), (
                f"{name}: broadcast hint on a growing table\n{tail[:200]}"
            )


def test_unhinted_supplier_part_still_autobroadcast_at_fixture_scale(spark, sf_dir):
    """Dropping the hints must not change fixture-scale plans: Catalyst's
    size estimate still picks broadcast joins for supplier/part-derived
    sides in the representative queries (Q5 asia_sup, Q9 part+supplier,
    Q21 supplier)."""
    for name in ("q_tpch_q5", "q_tpch_q9", "q_tpch_q21"):
        assert_broadcast_join(q(name, spark, sf_dir))


def test_broadcastable_set_is_sf_invariant():
    """Mechanical guard for the BROADCASTABLE contract: every member must
    have the SAME row count at every fixture scale factor — i.e. be a
    fixed-cardinality dimension.  supplier fails this (10k rows/sf), so
    it can never re-enter the set without this test flagging it."""
    import duckdb

    from kafka_go_cardinality_spark.sources.tables import BROADCASTABLE

    con = duckdb.connect()
    for name in sorted(BROADCASTABLE):
        counts = {
            sf: con.execute(
                f"SELECT count(*) FROM read_parquet('/root/testdata/{sf}/{name}.parquet')"
            ).fetchone()[0]
            for sf in ("sf0.001", "sf0.01", "sf0.1")
        }
        assert len(set(counts.values())) == 1, (
            f"{name} row count varies with sf ({counts}) — not hard-hint safe"
        )
    con.close()


def test_winnow_fingerprints_is_map_only(spark, sf_dir):
    """Winnowing is a pure in-row map: zero shuffles beyond the scan."""
    assert count_exchanges(q("q_text_winnow", spark, sf_dir)) == 0


def test_bm25_never_shuffles_the_corpus(spark, sf_dir):
    """BM25 with a fixed term set: in-row tf, one single-row stats
    aggregate broadcast back, TakeOrdered top-k — no hash/range
    exchange anywhere (the stats aggregate is a SinglePartition
    exchange, not a repartitioning of the corpus)."""
    df = q("q_text_bm25", spark, sf_dir)
    assert count_exchanges(df) == 0
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_winnow_pairs_shuffles_postings_only(spark, sf_dir):
    """The winnow-pair shuffles carry (fingerprint, doc_id) longs — the
    document text never rides an exchange."""
    df = q("q_dedup_winnow", spark, sf_dir)
    assert count_exchanges(df) == 2
    for block in exchange_blocks(df):
        assert "text" not in block, block


def test_seq_pack_never_single_partition_sums_corpus(spark, sf_dir):
    """The packing prefix sum must run per doc_id bucket: the only
    SinglePartition exchange feeds the ≤64-row bucket-totals frame
    (bucket, btot) — the corpus (doc_id, cnt) rows never collapse to
    one task."""
    df = q("q_text_pack", spark, sf_dir)
    blocks = exchange_blocks(df)
    single = [b for b in blocks if "SinglePartition" in b]
    assert single, "expected the constant-size offset frame exchange"
    for b in single:
        assert "cnt" not in b and "doc_id" not in b, b
    assert any("hashpartitioning(bucket" in b for b in blocks), blocks


def test_shuffle_shards_single_exchange_on_shard(spark, sf_dir):
    """The corpus shuffle is ONE hash exchange on shard; the rank
    window is partition-local (no global sort, no SinglePartition)."""
    df = q("q_shuffle_shards", spark, sf_dir)
    blocks = exchange_blocks(df)
    assert not any("SinglePartition" in b for b in blocks), blocks
    assert count_exchanges(df) == 1, blocks
    assert any("hashpartitioning(shard" in b for b in blocks), blocks


def test_curriculum_never_single_partition_sorts_corpus(spark, sf_dir):
    """The curriculum enumerate must run per difficulty bucket: every
    SinglePartition exchange feeds a constant-size frame (the 1-row
    stats aggregate or the ≤64-row bucket counts) — per-document rows
    (doc_id, avg_nll_q) never collapse to one task."""
    df = q("q_text_curriculum", spark, sf_dir)
    blocks = exchange_blocks(df)
    single = [b for b in blocks if "SinglePartition" in b]
    assert single, "expected the constant-size stats/offset exchanges"
    for b in single:
        assert "doc_id" not in b, b
    assert any("hashpartitioning(bucket" in b for b in blocks), blocks


def test_hard_negatives_broadcasts_query_side(spark, sf_dir):
    """The mining join must broadcast the model-sized query set against
    the partitioned corpus (cosine_topk's shape): two hash exchanges —
    the salted level-1 top-k window and the survivor-ranking level-2
    window — and no shuffle of corpus vectors."""
    from kafka_go_cardinality_spark.plans.inspect import (
        assert_broadcast_join,
    )

    df = q("q_sim_hard_negatives", spark, sf_dir)
    assert_broadcast_join(df)
    assert count_exchanges(df) == 2, exchange_blocks(df)


def _plan_depth(line):
    """Tree depth of a simple-plan line = column where the operator text
    starts, past the ``+- : `` tree art (codegen ``*(n)`` stars count as
    content — fine, depth only needs to be consistent within a plan)."""
    return len(line) - len(line.lstrip(" :+-"))


def _window_partition_specs(df):
    """(partition_spec, line_index, depth, lines) for every Window node
    in the simple plan.  A simple-mode Window line is ``Window [exprs],
    [partition spec], [order spec]`` — the middle bracket group is the
    partition spec (rsplit from the right dodges the commas/brackets
    inside the window expressions)."""
    lines = plan_string(df, mode="simple").splitlines()
    specs = []
    for i, line in enumerate(lines):
        stripped = line.strip().lstrip("+-: ").strip()
        if not stripped.startswith("Window ["):
            continue
        parts = line.rstrip().rstrip("]").rsplit("], [", 2)
        assert len(parts) == 3, f"unparseable Window line: {line}"
        specs.append((parts[1], i, _plan_depth(line)))
    return specs, lines


def _subtree_range(lines, i, depth):
    """Line range (i, j) of the subtree rooted at line i: subsequent
    lines strictly deeper than ``depth`` (root-first printing puts a
    node's input/children immediately below it at greater depth)."""
    j = i + 1
    while j < len(lines) and (
        not lines[j].strip() or _plan_depth(lines[j]) > depth
    ):
        j += 1
    return i + 1, j


def test_retrieval_topk_windows_are_salted_two_level(spark, sf_dir):
    """THE 100 TB shape of the retrieval family (r6 verdict item 1): no
    window whose partition count is bounded by ``n_queries`` may sort a
    corpus-proportional frame.  Pin: every Window partitioned by
    query_id ALONE must sit downstream of the salted level-1 Window
    (partition key includes ``_salt``) whose ≤k filter bounds its input
    to TOPK_SALTS·k survivors per query.  Spark prints a plan root-first,
    so downstream == an earlier line on these linear spines."""
    for name in (
        "q_sim_cosine_topk",
        "q_sim_hard_negatives",
        "q_sim_knn_classify",
        "q_sim_knn_ivf",
        "q_sim_knn_ivfpq",
        "q_sim_ann_lsh",
        "q_sim_ann_ivf",
        "q_sim_ann_ivfpq_residual",
        "q_sim_ann_ivfpqr",
    ):
        specs, lines = _window_partition_specs(QUERIES[name](spark, sf_dir))
        salted = [i for s, i, _ in specs if "_salt" in s]
        assert salted, f"{name}: no salted level-1 top-k window in plan"
        # A query may stack SEVERAL two-level top-ks (ivfpqr: the ADC
        # over-fetch and the exact re-rank each have one), so a global
        # first/last-salted-line check is either too strict or too weak.
        # The sound form: each query_id-alone window's INPUT — its own
        # subtree (the deeper lines below it, root-first printing) —
        # must contain a salted level-1 window bounding it to
        # TOPK_SALTS*k survivors per query.
        for s, i, d in specs:
            if "_salt" in s or "query_id" not in s:
                continue
            lo, hi = _subtree_range(lines, i, d)
            assert any(lo <= j < hi for j in salted), (
                f"{name}: Window partitioned by [{s}] (line {i}) has NO "
                f"salted level-1 window in its own subtree (lines "
                f"{lo}..{hi}) — a reducer may sort a "
                f"corpus-proportional frame"
            )


def test_session_codegen_cache_sized_to_surface(spark):
    """The generated-class cache must stay sized above the query surface
    (session.py sets 4000; Spark's default 100 evicts every compiled
    stage before reuse on a ~200-plan sweep — measured as multi-second
    pass-to-pass bench swings in round 6)."""
    assert (
        int(spark.conf.get("spark.sql.codegen.cache.maxEntries")) >= 2000
    )


def test_model_literals_constant_fold_out_of_physical_plans(spark, sf_dir):
    """The r10 folded-literal device (similarity._dmodel and the
    from_json-emitting _dot_sql/_pq_*_expr): Catalyst must fold every
    model-bearing ``from_json(<string literal>)`` into a plain array
    Literal BEFORE execution.  If a Spark upgrade stops folding it,
    every row would re-parse a 10-20 KB JSON string — values stay
    right (parity blind), wall explodes — so the pin is on the PLAN:
    no JsonToStructs survives into the optimized physical tree of the
    queries that ship models this way."""
    for name in (
        "q_sim_ann_pq",
        "q_sim_ann_ivfpq",
        "q_sim_ann_ivfpq_residual",
        "q_sim_ann_ivfpqr",
        "q_sim_knn_ivfpq",
        "q_sim_ann_lsh",
        "q_dedup_semdedup",
        "q_stream_vec_assign",
    ):
        if name not in QUERIES:
            continue
        df = QUERIES[name](spark, sf_dir)
        plan = plan_string(df, mode="simple")
        assert "from_json" not in plan, (
            f"{name}: from_json survived optimization — the model "
            "literal is being parsed per row"
        )
