"""Plan-property regression tests: the physical plans the engine promises
(PERFORMANCE.md) — pushdown, pruning, broadcast dims, top-k without global
sort, shuffle-free bucketed joins — asserted so they can't silently rot."""

import re

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(entry_mod.q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "l_orderkey" not in read and "l_partkey" not in read  # pruned
    assert "l_quantity" in read


def test_zero_shuffle_scan_project(spark, sf_dir):
    plan = _plan(entry_mod.filter_project(spark, sf_dir))
    assert "Exchange" not in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(entry_mod.multi_hop_enrichment(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_topk_no_global_sort(spark, sf_dir):
    plan = _plan(entry_mod.sort_limit(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_bucketed_join_no_exchange(spark, tmp_path):
    """Bucketed co-located join: the shuffle is paid at write time; the
    join plan itself has NO Exchange (Jet's partition-co-location analog)."""
    from hazelcast_jet_spark.operators.bucketing import bucketed_join, write_bucketed

    left = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    right = spark.range(0, 1000).withColumn("w", F.col("id") % 7)
    write_bucketed(left, "b_left", "id", buckets=8)
    write_bucketed(right, "b_right", "id", buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # the test tables are broadcast-small, which would bypass the bucketed
    # path entirely; disable broadcast to exercise the co-located join the
    # way a fact-fact join at scale would run
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_left", "b_right", "id")
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan, "bucketed join still shuffles"
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_keyed_table_read_prunes_partitions(spark, tmp_path):
    """KeyedParquetTable.read(buckets=[...]) must hit only those bucket
    partitions (PartitionFilters on _kb), not scan the table."""
    from hazelcast_jet_spark.storage import KeyedParquetTable

    t = KeyedParquetTable(str(tmp_path / "pt"), ["id"], num_buckets=8)
    t.overwrite(spark.range(0, 400).select("id", (F.col("id") * 2).alias("v")))
    df = t.read(spark, buckets=[3])
    plan = _plan(df)
    assert re.search(r"PartitionFilters: \[.*_kb.*\]", plan), plan
    # and the scan reads 1 of 8 partition dirs
    assert df.count() < 400


def test_ivf_probe_broadcasts_queries(spark, sf_dir):
    """ivf_topk: the probe set is broadcast; the corpus is never shuffled
    for the candidate join."""
    plan = _plan(entry_mod.ivf_topk_search(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_banded_lsh_shuffles_only_signatures(spark, sf_dir):
    """The LSH candidate self-join shuffles (id, band, sig) rows — the
    embedding arrays must not appear in the bucket-join exchange."""
    from hazelcast_jet_spark.operators.similarity import _banded_buckets, banded_hyperplanes

    e = entry_mod._t(spark, sf_dir, "embeddings")
    b = _banded_buckets(e, banded_hyperplanes(2, 4, 64), "vec_id", "embedding", "id", None)
    plan = _plan(b)
    # the bucketed projection carries no vector column
    assert "embedding" not in b.columns and set(b.columns) == {"id", "band", "sig"}
    assert "ArrowEvalPython" in plan  # vectorized signature path


def test_tpch_q6_pushdown_no_joins(spark, sf_dir):
    """Q6: every predicate reaches the scan; zero joins; one agg."""
    plan = _plan(entry_mod.tpch_q6_forecast_revenue(spark, sf_dir))
    assert "Join" not in plan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(l_discount,0.05)" in plan


def test_tpch_q10_broadcast_dims_and_topk(spark, sf_dir):
    """Q10: nation broadcast; top-20 via TakeOrderedAndProject (no global
    sort materialization)."""
    plan = _plan(entry_mod.tpch_q10_returned_items(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_kmv_sharded_state_bound_plan(spark, sf_dir):
    """KMV sharded build (the 100 TB path): the ONLY collect_set over the
    raw value column is keyed by (group, _kmv_shard) — no aggregation
    state ever accumulates a whole group's distinct hashes; the merge
    level's collect_list sees only the pre-sliced (<= k) shard arrays."""
    from hazelcast_jet_spark.operators.sketch import kmv_distinct_sharded
    e = entry_mod._t(spark, sf_dir, "events")
    df = kmv_distinct_sharded(e, ["event_type"], "user_id", k=32, num_shards=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every collect_set over the raw value column is keyed by BOTH the
    # group and the shard expression (Catalyst names the pmod/xxhash64
    # grouping key `_groupingexpression`), never by the group alone
    partials = [ln for ln in plan.splitlines() if "collect_set" in ln]
    assert partials, plan
    assert all(
        "_groupingexpression" in ln or "_kmv_shard" in ln for ln in partials
    ), partials
    # merge level folds shard sketches (collect_list of arrays), never raw values
    assert "collect_list" in plan


def test_kmv_sharded_equals_unsharded(spark, sf_dir):
    """The sharded two-level sketch is BIT-IDENTICAL to the single-level
    kmv_sketch per group (k smallest of a union == k smallest of the
    union of per-part k smallest)."""
    from pyspark.sql import functions as F
    from hazelcast_jet_spark.operators.sketch import (
        kmv_distinct_sharded, kmv_sketch)
    e = entry_mod._t(spark, sf_dir, "events")
    solo = e.groupBy("event_type").agg(kmv_sketch("user_id", 32).alias("sk"))
    shard = kmv_distinct_sharded(e, ["event_type"], "user_id", k=32, num_shards=8)
    j = solo.alias("a").join(shard.alias("b"), "event_type")
    assert j.filter(F.col("a.sk") != F.col("b.sk")).count() == 0
    assert solo.count() == shard.count()


def test_asof_forward_no_range_join(spark, sf_dir):
    """Forward as-of gate query keeps the backward shape: union + carry
    window — never a range/nested-loop join, and exactly the two keyed
    exchanges (union repartition + window partition)."""
    df = entry_mod.asof_join_forward(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # no join at all — it's a window carry
    assert plan.count("Exchange hashpartitioning") <= 2


def test_nexmark_q7_single_window_shuffle(spark, sf_dir):
    """Q7 argmax-in-window: one exchange for the window partition."""
    df = entry_mod.nexmark_q7_window_max(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tpch_q4_semi_join_shape(spark, sf_dir):
    """Q4: the EXISTS is planned as a LEFT SEMI hash join (lineitem never
    expands the orders side), with the orders date filter pushed to scan."""
    plan = _plan(entry_mod.tpch_q4_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_tpch_q16_broadcast_anti_join(spark, sf_dir):
    """Q16: NOT IN over the tiny excluded-supplier list is a broadcast
    anti-join — the lineitem fact is never shuffled to exclude suppliers."""
    plan = _plan(entry_mod.tpch_q16_supplier_cnt(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "TakeOrderedAndProject" in plan


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    """Decontamination: the benchmark shingle set is broadcast; the corpus
    side reaches the join without a shuffle of its own rows."""
    plan = _plan(entry_mod.decontaminate_docs(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sequence_packing_single_window_shuffle(spark, sf_dir):
    """pack_concat: exactly one hash exchange (the per-source window);
    the occupancy agg reuses that partitioning (partial agg, no second
    wide shuffle of raw rows)."""
    from hazelcast_jet_spark.operators import packing
    from hazelcast_jet_spark.operators import text
    d = entry_mod._t(spark, sf_dir, "documents").select(
        "source", "doc_id", text.token_count("text").alias("tok"))
    packed = packing.pack_concat(d, "tok", 512, "doc_id", ["source"])
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_tpch_q7_dims_shrink_facts(spark, sf_dir):
    """Q7: the two-nation filter flows through broadcast dim joins before
    the single fact-to-fact shuffle join — 4 broadcasts, exactly one
    sort-merge (or broadcast under AQE) join between lineitem and the
    customer-restricted orders."""
    df = entry_mod.tpch_q7_volume_shipping(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_heavy_hitters_shuffles_only_candidates(spark, sf_dir):
    """heavy_hitters (Misra-Gries): the exact re-verify joins the corpus
    against a BROADCAST of the bounded candidate set — the raw item
    stream is never shuffled by item; the only hash exchanges are the
    candidate merge (<= partitions x capacity rows) and the final
    per-group top-k window."""
    plan = _plan(entry_mod.heavy_hitter_terms(spark, sf_dir))
    assert "BroadcastHashJoin" in plan          # verify pass joins broadcast
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # bounded-state summary stage is the pandas mapInPandas lane
    assert "MapInPandas" in plan


def test_percentile_single_buffer(spark, sf_dir):
    """percentile_stats ships ONE percentile buffer (array of fractions)
    through the exchange, not one full value-count map per fraction."""
    plan = _plan(entry_mod.percentile_stats(spark, sf_dir))
    assert plan.count("partial_percentile") == 1, plan


def test_unigram_lm_broadcasts_vocab(spark, sf_dir):
    """unigram_lm_score: the exploded token stream joins the (small) vocab
    probabilities via broadcast — tokens are never shuffled for the join;
    every exchange carries only partial-aggregate rows (vocab counts,
    1-row totals, per-doc partials)."""
    plan = _plan(entry_mod.unigram_lm_quality(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_bloom_semi_join_positions_broadcast(spark, sf_dir):
    """Every Bloom bit-position probe must be a BROADCAST semi join (the
    ≤m-longs summary travels, never the big side), and the plan must
    contain no sort-merge join: the final exact semi join on the pruned
    survivors broadcasts too at this scale."""
    plan = _plan(entry_mod.bloom_semi_join_orders(spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 4  # 3 position probes + exact join
    assert "SortMergeJoin" not in plan
    assert "LeftSemi" in plan


def test_quota_sample_single_exchange_after_prefilter(spark, sf_dir):
    """quota_per_key: exactly one hash exchange on the quota key feeds
    the ranking window (the gate query's presentation orderBy adds one
    range exchange); the map-side pandas prefilter sits below it."""
    body = entry_mod.source_quota_sample(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert body.count("Exchange hashpartitioning") == 1
    assert "MapInPandas" in body


def test_split_by_key_is_map_only(spark, sf_dir):
    from hazelcast_jet_spark.operators.sampling import split_by_key
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = _plan(split_by_key(d, "doc_id", {"train": 0.8, "test": 0.2}))
    assert "Exchange" not in plan  # the split label is a pure projection


def test_event_features_single_window_exchange(spark, sf_dir):
    """One hash exchange on user_id serves seq + lag + gap + all three
    rolling frames (Catalyst collapses same-spec windows)."""
    from hazelcast_jet_spark.operators.timeseries import event_features
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    body = event_features(e)._jdf.queryExecution().executedPlan().toString()
    assert body.count("Exchange hashpartitioning") == 1


def test_semantic_dedup_assignment_is_map_only(spark, sf_dir):
    """SemDeDup: the only exchange is the within-cluster self-join on
    centroid_id — assignment itself (Arrow matmul) adds no shuffle."""
    from hazelcast_jet_spark.operators import similarity
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.semantic_dedup_pairs(
        e, entry_mod._ivf_centroids(), 0.4)
    body = _plan(pairs).split("== Physical Plan ==")[-1]
    assert body.count("Exchange hashpartitioning") <= 2  # the two join sides


def test_dsir_log_ratio_table_broadcasts(spark, sf_dir):
    """dsir_weights: the ≤16^h-row log-ratio table joins back BROADCAST —
    the corpus-side explode is never shuffled for the join; the only
    exchanges are the bucket aggregate and the per-doc sum."""
    from hazelcast_jet_spark.operators.importance import dsir_weights
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = dsir_weights(d, F.col("lang") == "en")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_lm_count_tables_broadcast(spark, sf_dir):
    """bigram_lm_score: the vocabulary-bounded bigram/context/unigram
    tables join back BROADCAST; the gram stream persists across its two
    consumers and shuffles only for the per-doc aggregate."""
    from hazelcast_jet_spark.operators.text import bigram_lm_score
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = bigram_lm_score(d)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # ctx and unigram sides
    assert "SortMergeJoin" not in plan
    assert "InMemoryTableScan" in plan           # persisted gram stream


def test_temperature_sample_rates_broadcast(spark, sf_dir):
    """The per-group rate table joins back by BROADCAST — the corpus is
    never shuffled for the keep decision (the rate derivation's own
    aggregate is over the same scan, output ≤ |groups| rows)."""
    plan = _plan(entry_mod.temperature_sample_counts(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hll_build_single_bounded_exchange(spark, sf_dir):
    """HLL build: ONE hash exchange on (group, register) with a map-side
    partial max — each task ships at most groups-per-task × m register
    rows, never the raw values."""
    from hazelcast_jet_spark.operators.sketch import hll_build
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    df = hll_build(e, "user_id", ["event_type"], p=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan


def test_count_min_single_aggregate_exchange(spark, sf_dir):
    """CMS build: ONE hash exchange on (row, bucket) with a map-side
    partial aggregate before it — the shuffle is bounded by
    tasks × depth × width counters, not corpus size."""
    from hazelcast_jet_spark.operators.sketch import count_min_build
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    toks = d.filter(F.col("text").isNotNull()).select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
    df = count_min_build(toks, "term", width=512, depth=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    # partial_count before the exchange (map-side combine)
    assert "partial_count" in plan


def test_count_min_probe_broadcasts_sketch(spark, sf_dir):
    plan = _plan(entry_mod.count_min_estimates(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_snapshot_diff_single_join(spark, sf_dir):
    """The diff is ONE full outer join on the key — each snapshot
    scanned once, only key + compared columns read."""
    df = entry_mod.table_diff_counts(spark, sf_dir)
    exec_plan = df._jdf.queryExecution().executedPlan().toString()
    assert exec_plan.count("SortMergeJoin") + \
        exec_plan.count("ShuffledHashJoin") == 1
    assert "FullOuter" in exec_plan
    plan = _plan(df)
    read = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "o_comment" not in read and "o_custkey" not in read  # pruned


def test_ngram_novelty_no_pair_join(spark, sf_dir):
    """Novelty never enumerates doc pairs: no nested-loop/cartesian
    anywhere — only gram-keyed hash exchanges."""
    plan = _plan(entry_mod.ngram_novelty_stats(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_grid_join_no_nested_loop(spark, sf_dir):
    """Grid-mode interval join: equi-join on the bin id — a raw theta
    join here would plan BroadcastNestedLoop and go quadratic."""
    df = entry_mod.interval_grid_pairs(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_keyed_join_equi_on_key(spark, sf_dir):
    plan = _plan(entry_mod.interval_overlap_pairs(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_w1_drift_two_exchanges(spark, sf_dir):
    """W1: distinct-value compaction exchange + one group window
    exchange; the final aggregate reuses the window partitioning."""
    df = entry_mod.w1_drift_events(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2


def test_bm25_single_scan_broadcast_stats(spark, sf_dir):
    """bm25: one per-doc token aggregation feeds tf rows, df and corpus
    stats (identical subtrees -> exchange reuse at runtime); the
    stats join back broadcast, never sort-merge."""
    df = entry_mod.bm25_search_docs(spark, sf_dir)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed  # per-doc aggregate built once


def test_hard_negative_anchor_broadcast(spark, sf_dir):
    """hard negatives: anchors broadcast; the corpus scan is map-only up
    to the per-anchor window."""
    plan = _plan(entry_mod.hard_negative_mining(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # theta join, broadcast side
    assert "SortMergeJoin" not in plan


def test_key_skew_reuses_counts_exchange(spark, sf_dir):
    """key_skew: the keyed-count exchange is the only data-sized one;
    the summary and heavy-keys branches REUSE it at runtime instead of
    re-scanning orders."""
    df = entry_mod.key_skew_orders(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed
    assert "CartesianProduct" not in executed


def test_cms_join_size_no_cartesian(spark, sf_dir):
    """cms_join_size: the sketch-vs-sketch join and the 1-row estimate x
    exact cross join must never plan a CartesianProduct over data."""
    plan = _plan(entry_mod.cms_join_size_orders(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan or "est_join_size" in plan


def test_scd2_single_window_exchange(spark, sf_dir):
    """scd2: ONE ordered hash exchange on the key serves lag, lead and
    version numbering (the final presentation sort adds a range
    exchange — not a second hash shuffle)."""
    plan = _plan(entry_mod.scd2_event_type_intervals(spark, sf_dir))
    assert plan.count("hashpartitioning(") == 1


def test_label_centroid_assignment_map_only(spark, sf_dir):
    """label_centroid_confusion's assignment phase: literal centroids
    ride the task binary — no join in the plan; the confusion count is
    the only hash aggregation."""
    from hazelcast_jet_spark.operators.clustering import (
        label_centroid_confusion)
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "embeddings")
    plan = _plan(label_centroid_confusion(e))
    assert "Join" not in plan          # no centroid join — literals only
    assert plan.count("hashpartitioning(") == 1


def test_padding_efficiency_single_aggregate(spark, sf_dir):
    plan = _plan(entry_mod.padding_efficiency_docs(spark, sf_dir))
    assert plan.count("hashpartitioning(") == 1
    # formatted plans mention each node twice (tree + detail section)
    assert plan.count("Scan parquet") <= 2


def test_readability_is_map_only(spark, sf_dir):
    """readability is pure per-row array expressions — no exchange at
    all (the shape that runs at input bandwidth on 100 TB)."""
    from hazelcast_jet_spark.operators.text import readability
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    assert "Exchange" not in _plan(readability(d))


def test_event_transitions_single_stream_exchange(spark, sf_dir):
    """One hash exchange on user_id orders the streams; the pair
    aggregate and row-normalizing window run on the K^2-bounded pair
    table (its exchanges move vocabulary-sized data, not the stream)."""
    from hazelcast_jet_spark.operators.timeseries import event_transitions
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    body = event_transitions(e)._jdf.queryExecution() \
        .executedPlan().toString()
    assert body.count("Exchange hashpartitioning(user_id") == 1


def test_gini_reuses_group_exchange(spark, sf_dir):
    """gini_concentration: the rank window's hash exchange on the group
    key is the ONLY hash exchange — the final aggregate reuses the
    window's partitioning instead of re-shuffling."""
    from hazelcast_jet_spark.operators.profile import gini_concentration
    from hazelcast_jet_spark.session import load_table

    o = load_table(spark, sf_dir, "orders")
    body = gini_concentration(o, ["o_orderpriority"], "o_totalprice") \
        ._jdf.queryExecution().executedPlan().toString()
    assert body.count("Exchange hashpartitioning") == 1


def test_association_rules_broadcasts_supports(spark, sf_dir):
    """association_rules: item supports and the scalar basket count join
    back broadcast — no shuffle join on the rule table; pair enumeration
    is in-task (no self-join of the basket frame)."""
    from hazelcast_jet_spark.operators.graph import association_rules
    from hazelcast_jet_spark.session import load_table

    l = load_table(spark, sf_dir, "lineitem")
    plan = _plan(association_rules(l, "l_orderkey", "l_partkey",
                                   min_pair_count=3, max_basket=64))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_source_overlap_shuffles_units_not_payloads(spark, sf_dir):
    """source_overlap: the only row-volume exchange carries (unit,
    source) pairs; per-source counts join back broadcast; no sort-merge
    join of document payloads."""
    from hazelcast_jet_spark.operators.dedup import source_overlap
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = _plan(source_overlap(d, unit="shingle"))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    read = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "text" in read and "doc_id" not in read  # payload cols pruned


def test_waterfill_touches_corpus_once(spark, sf_dir):
    """waterfill_allocation: the corpus is read by ONE capacity
    aggregate; everything after runs on the groups-bounded table."""
    from hazelcast_jet_spark.operators.sampling import waterfill_allocation
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    plan = _plan(waterfill_allocation(d, "source", "n_chars", 0.6))
    # the capacity aggregate is checkpointed: the theta and allocation
    # branches read the groups-bounded checkpoint, never the parquet
    assert plan.count("Scan parquet") == 0
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_top_mass_single_group_exchange(spark, sf_dir):
    """top_mass_selection: one hash exchange on the group key serves the
    ordering window, the running sum and the final aggregate."""
    from hazelcast_jet_spark.operators.sampling import top_mass_selection
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    body = top_mass_selection(d, "source", "n_chars", "doc_id", 0.5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert body.count("Exchange hashpartitioning") == 1


def test_multi_span_single_docfreq_exchange(spark, sf_dir):
    """dup_span_stats_multi: ALL grains share one (k, hash) document-
    frequency shuffle — the k-fold cost lives in map-side arrays, never
    in extra corpus scans (one parquet scan of documents)."""
    plan = _plan(entry_mod.multi_span_dup_stats(spark, sf_dir))
    # formatted mode mentions each node twice (tree + details): count
    # the numbered detail entries, i.e. distinct scan NODES
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2
    assert "CartesianProduct" not in plan


def test_item_similarity_broadcast_counts(spark, sf_dir):
    """item_similarity_topk: per-item basket counts broadcast back to
    the pair table; no cartesian product anywhere."""
    plan = _plan(entry_mod.item_similarity_parts(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_markov_holdout_broadcast_predictions(spark, sf_dir):
    """markov_holdout_accuracy: the K-bounded prediction table joins
    broadcast; the event stream is exchanged once (the window)."""
    plan = _plan(entry_mod.markov_next_event_accuracy(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantile_bins_single_scan_pair(spark, sf_dir):
    """quantile_bins: one percentile aggregate + one counting pass —
    the single-row edge frame joins as a broadcast nested loop (1 row),
    never a shuffled join."""
    plan = _plan(entry_mod.quantile_bins_orders(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # counting pass is map-only vs literal edges: ONE fact-table scan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 1


def test_kmeans_fit_unrolled_assign_map_only(spark, sf_dir):
    """kmeans_fit_unrolled's final assignment: literal centroids travel
    in the task binary — the returned frame's plan has no join and no
    exchange beyond the source scan."""
    from hazelcast_jet_spark.operators.clustering import kmeans_fit_unrolled
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "embeddings")
    _cent, assigned = kmeans_fit_unrolled(e, k=2, iters=1)
    plan = _plan(assigned)
    assert "Join" not in plan and "Exchange" not in plan


def test_ewma_single_key_exchange(spark, sf_dir):
    """ewma gate: daily aggregation then ONE applyInPandas exchange on
    the key — no extra shuffle between them beyond the two aggregations."""
    plan = _plan(entry_mod.ewma_event_rate(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan or "MapGroups" in plan
    assert "CartesianProduct" not in plan


def test_corpus_data_card_broadcast_small_sides(spark, sf_dir):
    """corpus_data_card: the top-lang table and the 1-row global total
    join back as broadcasts onto ONE materialized per-doc feature frame
    (r12 optimization: per_source, the lang mix and the totals all fold
    off a localCheckpointed narrow frame instead of re-scanning the
    corpus per consumer); no cartesian product; the final plan reads the
    checkpoint, not parquet."""
    plan = _plan(entry_mod.corpus_data_card_docs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin Cross" in plan  # 1-row totals
    # every aggregate folds off the materialized feature frame — the
    # final plan holds NO parquet scan of the corpus at all
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan


def test_shipping_lag_single_join_no_cartesian(spark, sf_dir):
    """shipping_lag: one equi-join on the order key (broadcast at test
    scale, shuffle-joinable at 100 TB) + one percentile aggregate."""
    plan = _plan(entry_mod.shipping_lag_percentiles(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan)


def test_transition_entropy_no_join(spark, sf_dir):
    """transition_entropy: the keyed lead() exchange + the K2-bounded
    pair aggregate — no join anywhere."""
    plan = _plan(entry_mod.transition_entropy_events(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" in plan


def test_holt_linear_single_pandas_exchange(spark, sf_dir):
    """holt gate: daily aggregation then ONE applyInPandas exchange on
    the key (the ewma lane)."""
    plan = _plan(entry_mod.holt_linear_events(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan


def test_chunk_dup_no_join_one_window(spark, sf_dir):
    """chunk_dup: map-side chunk explode + fingerprint window — the
    corpus never self-joins."""
    plan = _plan(entry_mod.chunk_dup_docs(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" in plan


def test_hll_overlap_sketch_cached(spark, sf_dir):
    """hll_pairwise_overlap: the register table persists — its four
    consumers read the cache, not the corpus (pre-fix: 10 parquet
    scans); pair construction is broadcast-sized, never cartesian."""
    plan = _plan(entry_mod.hll_overlap_events(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan


def test_rrf_fusion_no_cartesian(spark, sf_dir):
    """rrf gate: both ranking legs broadcast the query side; fusion is
    a k-bounded full-outer join."""
    plan = _plan(entry_mod.rrf_fusion_emb(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_classifier_lift_broadcast_weights(spark, sf_dir):
    """lift gate: the classifier's weight table joins broadcast; the
    ntile ranking runs on the scored table only."""
    plan = _plan(entry_mod.classifier_lift_docs(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_kaplan_meier_window_after_rollup(spark, sf_dir):
    """kaplan_meier gate: the corpus collapses to the per-user span
    rollup, the horizon is a 1-row broadcast, and the survival/at-risk
    windows run on the tiny duration curve — no real-table self-join."""
    plan = _plan(entry_mod.kaplan_meier_events(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin Cross" in plan  # 1-row horizon
    assert "Window" in plan


def test_pareto_front_no_join_two_windows(spark, sf_dir):
    """pareto_front gate: per-level min window + cumulative-min window
    on the level table — the O(n^2) dominance self-join never appears."""
    plan = _plan(entry_mod.pareto_front_parts(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" in plan


def test_cuped_broadcast_theta(spark, sf_dir):
    """cuped gate: theta/mean(X) is a 1-row broadcast onto the per-arm
    aggregate; the unit rollup is the only full shuffle."""
    plan = _plan(entry_mod.cuped_experiment_orders(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin Cross" in plan  # 1-row theta
    assert plan.count("Location: InMemoryFileIndex") <= 2  # units rollup feeds both aggs


def test_attribution_no_window_no_duplicated_subtree(spark, sf_dir):
    """attribution gate: bookends are conditional min_by/max_by
    aggregates — no Window exec, no per-user sort, and the events
    table is scanned exactly twice (conversion lookup + touch side);
    the first cut's window/full-outer form duplicated the touch
    subtree 5x."""
    plan = _plan(entry_mod.attribution_events(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Location: InMemoryFileIndex") <= 2


def test_isotropy_one_explode_no_cartesian(spark, sf_dir):
    """isotropy gate: one posexplode feeding the (group, dim) aggregate;
    the per-group join is broadcast-sized (|labels| rows)."""
    plan = _plan(entry_mod.isotropy_embeddings(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the posexplode


def test_table_fingerprint_single_aggregate_no_join(spark, sf_dir):
    """fingerprint gate: one map-side hash expression + one per-group
    aggregate — no join, no window, one scan."""
    plan = _plan(entry_mod.table_fingerprint_docs(spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_rake_broadcast_word_stats(spark, sf_dir):
    """rake gate: the vocabulary-sized word-ratio table joins back
    broadcast; phrase assembly is the single keyed window exchange."""
    plan = _plan(entry_mod.rake_keyphrases_docs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan


def test_window_funnel_broadcast_chain(spark, sf_dir):
    """windowed funnel gate: same stage-join chain as the unbounded
    funnel — every join an equi-join on user_id, no cartesian."""
    plan = _plan(entry_mod.window_funnel_events(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_lpa_no_cartesian_bounded_joins(spark, sf_dir):
    """LPA gate: every per-round join is an equi-join on the node key;
    no cartesian, no nested loop."""
    plan = _plan(entry_mod.lpa_communities_parts(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_link_prediction_wedge_never_broadcast(spark, sf_dir):
    """link-prediction: the |edges|-sized wedge self-join must take the
    shuffle path (the static estimator under-sizes the aggregated leg
    and a forced broadcast OOMs a default-memory driver).  The GATE
    query returns an eagerly-materialized top-k (the r9 leak fix:
    localCheckpoint then unpersist — its plan is an ExistingRDD by
    design), so the join shape is pinned on the LAZY form via
    materialize=False."""
    from hazelcast_jet_spark.operators.graph import (
        cooccurrence_edges, jaccard_link_prediction)
    from hazelcast_jet_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                               max_group=entry_mod.LINKPRED_MAX_BASKET)
    plan = _plan(jaccard_link_prediction(edges, top_k=20,
                                         materialize=False))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan  # the hinted wedge join
    # and the gate query's returned plan is the bounded materialization
    gate = _plan(entry_mod.link_prediction_parts(spark, sf_dir))
    assert "ExistingRDD" in gate or "LocalTableScan" in gate


def test_ohlc_single_aggregate_no_window(spark, sf_dir):
    """ohlc gate: conditional min_by/max_by bookends — one aggregate,
    no window, no join, one scan."""
    plan = _plan(entry_mod.ohlc_events(spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_session_bounce_one_window_one_scan(spark, sf_dir):
    """bounce gate: the sessionize lag+cumsum windows share the user
    exchange; bookends are conditional min_by/max_by (no extra window);
    one scan."""
    plan = _plan(entry_mod.session_bounce_events(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_seasonality_strength_broadcast_moments(spark, sf_dir):
    """seasonality gate: daily rollup first; the per-key global moment
    table joins the <=7-row-per-key dow table small-side; no cartesian."""
    plan = _plan(entry_mod.seasonality_strength_events(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("Location: InMemoryFileIndex") <= 2  # dow + global moment aggs


def test_self_repetition_map_side_no_join(spark, sf_dir):
    """self-repetition gate: window assembly is in-row (transform +
    array_distinct); one scan, one rollup, no join/window."""
    plan = _plan(entry_mod.self_repetition_docs(spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_fisher_one_explode_shuffles_once(spark, sf_dir):
    """fisher gate: the corpus shuffles once on (label, dim); the
    global-centroid and total tables are tiny derived joins — no
    cartesian beyond the 1-row totals broadcast."""
    plan = _plan(entry_mod.fisher_separation_emb(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Generate" in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_growth_decomposition_single_rollup(spark, sf_dir):
    """decomposition gate: one monthly rollup + lag window — one scan,
    no join."""
    plan = _plan(entry_mod.growth_decomposition_orders(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_stickiness_one_distinct_base(spark, sf_dir):
    """stickiness gate: DAU and WAU both derive from the one distinct
    (week, day, user) compaction; no cartesian."""
    plan = _plan(entry_mod.stickiness_events(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("Location: InMemoryFileIndex") <= 2


def test_trending_broadcast_ref_no_cartesian_blowup(spark, sf_dir):
    """trending gate: the 1-row reference date broadcasts; the
    fact-fact join is an equi-join; one per-key aggregate."""
    plan = _plan(entry_mod.trending_parts(spark, sf_dir))
    assert "BroadcastNestedLoopJoin Cross" in plan  # 1-row ref date
    assert "CartesianProduct" not in plan


def test_new_vs_returning_two_keyed_aggs(spark, sf_dir):
    """new-vs-returning gate: distinct compaction + per-user min share
    the user partitioning; no cartesian."""
    plan = _plan(entry_mod.new_vs_returning_events(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("Location: InMemoryFileIndex") <= 2


def test_k_anonymity_single_pass_all_ks(spark, sf_dir):
    """k-anonymity gate: one quasi-identifier groupBy; every k is a
    conditional sum over the same class table — one scan, no join."""
    plan = _plan(entry_mod.k_anonymity_customer(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 1


def test_did_orders_returns_local_relation(spark, sf_dir):
    """diff_in_diff executes its 4-cell aggregate exactly once (at
    build time, collected); the RETURNED plan is a local relation over
    the collected cells — zero further scans of orders (the
    ab_proportion_test execute-once discipline)."""
    plan = _plan(entry_mod.did_orders(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_covariate_balance_scans_each_table_once(spark, sf_dir):
    """covariate_balance melts covariates with ONE in-plan explode —
    the covariate count multiplies rows map-side, never parquet scans
    (one of customer + one of orders)."""
    plan = _plan(entry_mod.covariate_balance_customer(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) <= 2
    assert "CartesianProduct" not in plan


def test_fdr_bh_events_single_event_scan(spark, sf_dir):
    """fdr_bh_events: the event log is scanned ONCE — arm totals are
    window sums over the per-type cells and fdr_bh's m is an in-plan
    window count, so neither adds a scan or a job."""
    plan = _plan(entry_mod.fdr_bh_events(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_nelson_aalen_window_after_rollup(spark, sf_dir):
    """nelson_aalen gate: the corpus collapses to the per-user span
    rollup, the horizon is a 1-row broadcast (the kaplan_meier shape),
    and the hazard windows run on the tiny duration curve."""
    plan = _plan(entry_mod.nelson_aalen_events(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin Cross" in plan  # 1-row horizon
    assert "Window" in plan


def test_theilsen_pairs_join_after_daily_rollup(spark, sf_dir):
    """theil_sen gate: the daily rollup is checkpointed (review r9: it
    feeds both pair-join sides AND the medians branch — three upstream
    executions otherwise), so the returned plan reads the bounded
    table with zero parquet scans; the pair join is an equi-join."""
    plan = _plan(entry_mod.theilsen_trend_events(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan \
        or "ShuffledHashJoin" in plan


def test_lead_lag_single_event_scan(spark, sf_dir):
    """lead_lag gate: the bucket rollup (the ONLY event-log pass) is
    checkpointed, so the returned plan's ends/grid/x/y reuses read the
    bounded bucket table — zero parquet scans downstream."""
    plan = _plan(entry_mod.lead_lag_events(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "CartesianProduct" not in plan


def test_dp_noisy_counts_map_side_only(spark, sf_dir):
    """dp release: one customer scan -> partial-agg count; noise is
    row-local arithmetic on the tiny group table (no join)."""
    plan = _plan(entry_mod.dp_noisy_counts_customer(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_automation_screen_takeordered(spark, sf_dir):
    """automation screen: one event scan, per-user window + aggregate,
    top-k via TakeOrdered (no global sort)."""
    plan = _plan(entry_mod.automation_screen_events(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "TakeOrderedAndProject" in plan


def test_zorder_audit_single_scan(spark, sf_dir):
    """layout audit: ONE orders scan feeds the quantization windows;
    the 3-layout explode multiplies rows in-plan, never scans."""
    plan = _plan(entry_mod.zorder_layout_orders(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "CartesianProduct" not in plan


def test_forecast_backtest_single_scan_one_python_stage(spark, sf_dir):
    """backtest gate: one event scan -> daily rollup -> ONE Arrow
    applyInPandas (the Holt recurrence); baselines and scoring are
    plain windows/aggregates on the rollup."""
    plan = _plan(entry_mod.forecast_backtest_events(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert len(re.findall(r"\(\d+\) FlatMapGroupsInPandas", plan)) == 1


def test_ltv_cohorts_broadcast_sizes(spark, sf_dir):
    """ltv gate: one customer-key shuffle; cohort sizes broadcast back;
    the cumulative window runs on the cohort-by-age table."""
    plan = _plan(entry_mod.ltv_cohort_orders(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_offline_policy_single_event_scan(spark, sf_dir):
    """off-policy gate: ONE event scan -> per-user aggregate -> one
    global estimator aggregate; no joins anywhere."""
    plan = _plan(entry_mod.offline_policy_events(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_welch_t_returns_local_relation(spark, sf_dir):
    """welch_t gate: execute-once — the returned plan is a local
    relation (the ab_proportion_test discipline)."""
    plan = _plan(entry_mod.welch_t_orders(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_mann_whitney_returns_local_relation(spark, sf_dir):
    """mann_whitney gate: the distinct-value rollup + window execute
    once at build; the returned plan is a local relation."""
    plan = _plan(entry_mod.mann_whitney_orders(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_qte_single_scan(spark, sf_dir):
    """qte gate: one orders scan; the quantile explode multiplies the
    ranked rows in-plan, never rescans."""
    plan = _plan(entry_mod.qte_orders(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "CartesianProduct" not in plan


def test_median_ci_single_scan_selection(spark, sf_dir):
    """median_ci gate: one orders scan; rank selection per group, no
    joins."""
    plan = _plan(entry_mod.median_ci_orders(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_capture_recapture_broadcast_horizon(spark, sf_dir):
    """capture-recapture gate: the horizon midpoint is a 1-row
    broadcast (the kaplan_meier shape); one distinct compaction."""
    plan = _plan(entry_mod.capture_recapture_events(spark, sf_dir))
    assert "BroadcastNestedLoopJoin Cross" in plan
    assert "CartesianProduct" not in plan


def test_peeking_trace_checkpointed_rollup(spark, sf_dir):
    """peeking gate: the per-user rollup is checkpointed — the
    returned plan's grid/daily/conversion branches read the bounded
    table, zero parquet scans downstream."""
    plan = _plan(entry_mod.peeking_trace_events(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_sample_size_returns_local_relation(spark, sf_dir):
    """sizing gate: execute-once collected aggregate, local-relation
    result."""
    plan = _plan(entry_mod.sample_size_orders(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_hurst_single_scan(spark, sf_dir):
    """hurst gate: the keys-x-levels table is checkpointed (it feeds
    both the OLS branch and the n_points lookup — review r9 removed a
    second source scan), so the returned plan reads the bounded table
    with zero parquet scans."""
    plan = _plan(entry_mod.hurst_events(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "CartesianProduct" not in plan


def test_tail_risk_single_scan_no_join(spark, sf_dir):
    """tail-risk gate: one scan, per-key rank window + one aggregate,
    no joins."""
    plan = _plan(entry_mod.tail_risk_events(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# r10 operator plan pins
# ---------------------------------------------------------------------------

def test_pq_staleness_single_scan(spark, sf_dir):
    """pq staleness gate: one embeddings scan feeds the exploded
    per-subspace aggregate; no joins, no second scan."""
    plan = _plan(entry_mod.pq_staleness_emb(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_msprt_checkpointed_panel(spark, sf_dir):
    """mSPRT shares peeking_trace's checkpointed calendar-bounded
    counter panel: the returned plan reads the checkpoint, never the
    event log."""
    plan = _plan(entry_mod.msprt_events(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_qini_single_scan_one_window_pass(spark, sf_dir):
    """qini gate: one orders scan, the ntile + cumulative windows, no
    joins (the bin table is derived in-plan)."""
    plan = _plan(entry_mod.qini_uplift_orders(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_granger_checkpointed_grid(spark, sf_dir):
    """granger gate: the bucket rollup is checkpointed; the returned
    plan works the bounded grid only."""
    plan = _plan(entry_mod.granger_events(spark, sf_dir))
    assert "Scan parquet" not in plan


def test_shapley_broadcast_v_table(spark, sf_dir):
    """shapley gate: the tiny v(S) table broadcasts into the literal
    pair join — no sort-merge join anywhere in the phi branch."""
    plan = _plan(entry_mod.shapley_attribution_events(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_target_encode_single_scan(spark, sf_dir):
    """target-encoding gate: one orders scan into the (fold, category)
    aggregate; window totals run on that bounded grid."""
    plan = _plan(entry_mod.target_encode_orders(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_conformal_checkpointed_residuals(spark, sf_dir):
    """conformal gate: the calendar-bounded residual table is
    checkpointed (it feeds the q-hat pick, the test count and the
    coverage join), so the returned plan never re-scans the source."""
    plan = _plan(entry_mod.conformal_forecast_events(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_unpivot_single_scan_no_shuffle_after_agg(spark, sf_dir):
    """unpivot gate: melt is map-side on the aggregated table — exactly
    the aggregate's exchange, nothing added by the reshape."""
    plan = _plan(entry_mod.unpivot_nation_metrics(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Expand" in plan or "Generate" in plan or "Unpivot" in plan


def test_khop_reach_shuffle_hinted_wedge(spark, sf_dir, monkeypatch):
    """khop gate AT SCALE (small path disabled): the wedge self-join
    must be a shuffle join (both sides are |edges|-sized — broadcasting
    one OOMs at scale), and no cartesian/BNLJ anywhere."""
    from hazelcast_jet_spark.operators import graph_local

    monkeypatch.setattr(graph_local, "GRAPH_COLLECT_THRESHOLD", 0)
    plan = _plan(entry_mod.khop_reach_parts(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_ppr_checkpointed_iterations(spark, sf_dir):
    """personalized-pagerank gate: each iteration localCheckpoints its
    rank table (the pagerank O(1)-lineage discipline), so the returned
    plan reads the final checkpoint — never a re-derivation of the
    whole iteration chain."""
    plan = _plan(entry_mod.ppr_copurchase(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_spearman_single_scan_one_group_exchange(spark, sf_dir):
    """spearman gate: one lineitem scan; per column the rank and the
    RANGE-frame tie count share one Sort+Window (r12: two Window
    operators total, not four), and the decimal moment aggregate sits
    behind a round-robin repartition so it runs at full parallelism
    instead of inside the |groups|-task window stage."""
    plan = _plan(entry_mod.spearman_lineitem(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 2
    assert "RoundRobinPartitioning" in plan


def test_theil_single_scan_bounded_fold(spark, sf_dir):
    """theil gate: ONE pass builds the checkpointed per-nation cell
    table (positive moments + dropped counter in the same aggregate);
    the returned plan folds bounded checkpointed tables only — the
    source is never re-scanned (the one-row cross joins are broadcast
    nested loops over single rows, which is their correct physical
    form)."""
    plan = _plan(entry_mod.theil_orders(spark, sf_dir))
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_ratio_delta_single_scan_no_join(spark, sf_dir):
    """ratio-delta gate: one orders scan into one moment aggregate —
    the readout is a single row of fixed-order arithmetic."""
    plan = _plan(entry_mod.ratio_delta_orders(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_cvm_two_shrinking_exchanges(spark, sf_dir):
    """cvm gate: same shape as w1 — the two tagged halves are two
    pushed-filter scans of the same parquet (each reads only its
    half), then distinct-value compaction and one group window; no
    join anywhere."""
    plan = _plan(entry_mod.cvm_drift_events(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    assert "Join" not in plan


def test_vocab_richness_single_scan(spark, sf_dir):
    plan = _plan(entry_mod.vocab_richness_docs(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan


def test_ndcg_bounded_rank_list_join(spark, sf_dir):
    """ndcg gate: the fold joins two bounded (queries x k) rank lists —
    no cartesian legs; the brute-force truth leg is the measurement
    baseline (ann_recall convention)."""
    plan = _plan(entry_mod.ndcg_ivf_emb(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_knn_grid_join_never_cartesian(spark, sf_dir):
    """knn gate: the 3x3 cell equi-join + one rank window — no pair
    space, no nested-loop legs; the window is the only per-left state."""
    plan = _plan(entry_mod.knn_supplier_customers(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_grid_clusters_points_shuffle_once(spark, sf_dir):
    """grid-density gate: points aggregate into cells once; every later
    join (adjacency, wcc rounds, label-back) runs on cell tables — the
    customer parquet is scanned exactly twice (cell counts + the
    label-back), never pair-joined."""
    plan = _plan(entry_mod.grid_clusters_customers(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # one parquet scan (the point->cell label-back); the checkpointed
    # cell table folds to ExistingRDD
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_hotspot_affine_offset_join(spark, sf_dir):
    """Gi* gate: neighborhood sums come from the affine cell-key offset
    equi-join on the CELL table; the only nested-loop leg is the 1-row
    broadcast of the global moments (its correct physical form)."""
    plan = _plan(entry_mod.hotspot_cells_customers(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the point source is scanned once, eagerly, into the checkpointed
    # cell table; the returned plan folds that table only
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_plan_audit_and_assert_plan_api(spark, sf_dir):
    """plans.plan_audit / assert_plan: the plan-pin conventions of this
    file packaged as a user API — counts match the shapes this suite
    already pins, and the guardrail raises on a planted cartesian."""
    from hazelcast_jet_spark.plans import assert_plan, plan_audit

    q1 = entry_mod.q1_pricing_summary(spark, sf_dir)
    audit = plan_audit(q1)
    assert audit["scans"] == 1 and audit["pushed_filters"] >= 1
    assert audit["cartesian"] == 0
    # codegen is unknown pre-run under AQE, counted after execution
    assert audit["codegen_spans"] is None
    q1.collect()
    assert plan_audit(q1)["codegen_spans"] >= 1

    # assert_plan returns the audit on success...
    got = assert_plan(entry_mod.q1_pricing_summary(spark, sf_dir),
                      max_scans=1, require_pushed_filters=True)
    assert got["scans"] == 1

    # ...and raises with the counters on a planted scale-killer
    a = spark.range(100)
    b = spark.range(100).withColumnRenamed("id", "id2")
    with pytest.raises(AssertionError, match="plan-shape violations"):
        assert_plan(a.crossJoin(b))
    with pytest.raises(ValueError, match="unknown forbid"):
        assert_plan(a, forbid=("NoSuchOp",))

    # broadcast dim joins audit as broadcast, not SMJ (the multi-hop
    # enrichment pin, through the API)
    e = plan_audit(entry_mod.multi_hop_enrichment(spark, sf_dir))
    assert e["broadcast_joins"] >= 2 and e["sort_merge_joins"] == 0
