"""The in-repo mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf0.01 parquet, and compare row count, column names, and values
(order-insensitive, exact after normalization).

If this passes, the driver's CORRECTNESS_r{N}.json hash compare should
pass for every query that declares an oracle.
"""

from __future__ import annotations

import datetime
import math
import os
import struct
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _lane_params(names, keep_every: int):
    """Split a parametrized sweep between the default pytest lane and the
    ``slow`` lane (pytest.ini): a DETERMINISTIC ~1/keep_every subset
    (md5 of the name — stable across rounds and registry growth) stays
    in the default lane as the smoke check, the rest carries
    ``pytest.mark.slow``.  The r12 driver's bounded `pytest -x -q` run
    timed out mid-suite (VERDICT #1) — the full-registry parity sweeps
    are the bulk of the 63-minute suite, and the driver ALREADY
    hash-checks a 50-query oracle window per round; the full sweeps
    remain enforced by the round-close convention
    (`pytest -m "slow or not slow"`, tally recorded in the round doc)."""
    import hashlib

    out = []
    for n in names:
        h = int(hashlib.md5(n.encode()).hexdigest(), 16)
        out.append(n if h % keep_every == 0
                   else pytest.param(n, marks=pytest.mark.slow))
    return out


def _duck(sql: str, sf_dir: str = SF_DIR):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    # Exact, TYPE-TAGGED comparison: the driver's gate hashes typed values,
    # so int 902 must NOT equal float 902.0 and Decimal must not collapse to
    # float (both masked real driver failures in r1/r2 — scalar_functions'
    # ceil/floor returned BIGINT on Spark, DOUBLE on DuckDB, and the old
    # mirror passed while the driver hash failed).  Anything that needs
    # tolerance must be reformulated bit-exactly in the query itself, not
    # papered over here.
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        # Compare BIT PATTERNS, not == : the r6 driver red row
        # (embedding_standardize_stats) was round() yielding -0.0 on
        # DuckDB and +0.0 on Spark — equal under Python ==, different
        # IEEE bits, different typed driver hash.  struct.pack makes
        # -0.0 != +0.0 here so the mirror catches the class pre-driver.
        return ("float", struct.pack(">d", v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm(x) for x in v))
    return (type(v).__name__, v)


def _sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _normalize(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in idx) for r in rows), key=_sort_key)


def _compare(spark, name, sf_dir):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = _duck(ORACLES[name], sf_dir)

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(d_rows)} (duckdb)"
    )
    sn = _normalize(s_cols, s_rows)
    dn = _normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", _lane_params(sorted(ORACLES), 8))
def test_query_matches_oracle(spark, name):
    _compare(spark, name, SF_DIR)


# Queries registered through r6 were sf0.1-mirrored MANUALLY each round
# (NOTES_r4..r6).  This set is FROZEN — never add to it: every query
# registered after r6 automatically gets an ENFORCED second mirror leg at
# sf0.1 below, so SF-dependent boundary cases (empty groups, quantile cut
# ties, caps that only bind at scale) cannot slip to the driver.
_SF01_GRANDFATHERED = frozenset({
    "acf_events",
    "ann_lsh_search",
    "ann_recall_ivf_pq",
    "anomaly_band_flags",
    "anova_f_per_dim_emb",
    "array_higher_order",
    "asof_join_events",
    "asof_join_forward",
    "asof_join_tolerance",
    "association_rules_lineitem",
    "benford_orders",
    "bigram_lm_quality",
    "bloom_semi_join_orders",
    "bm25_search_docs",
    "bootstrap_ci_orders",
    "bpe_segment_stats",
    "cast_matrix",
    "categorical_assoc_docs",
    "categorical_drift_events",
    "cep_sequence_match",
    "cep_stream_match",
    "changepoint_shift_events",
    "char_entropy_quality",
    "classifier_calibration_docs",
    "cms_join_size_orders",
    "cogroup_orders_lineitem",
    "cohort_retention_counts",
    "collection_aggs",
    "collocation_pmi_docs",
    "containment_dup_pairs",
    "continuous_aggregate_rollup",
    "copurchase_graph_stats",
    "coreset_kcenter_embeddings",
    "corr_covar_aggs",
    "corr_matrix_lineitem",
    "cosine_topk_search",
    "count_min_estimates",
    "custom_udaf_agg",
    "cut_dup_spans_docs",
    "datetime_functions",
    "decontaminate_docs",
    "dedup_group_sizes",
    "dedup_keep_best",
    "distinct_aggregates",
    "distinct_by_key",
    "distinct_op",
    "doc_chunks",
    "dq_checks_orders",
    "dsir_importance_weights",
    "dup_span_stats_docs",
    "embedding_cosine_dedup",
    "embedding_outlier_stats",
    "embedding_quantize_int8",
    "embedding_standardize_stats",
    "event_time_features",
    "event_transition_matrix",
    "exact_dedup_docs",
    "filter_project",
    "filtered_aggs",
    "full_outer_join",
    "funnel_conversion_counts",
    "fuzzy_match_parts",
    "generate_series_agg",
    "gini_value_orders",
    "global_aggregate",
    "gopher_quality_filter",
    "hard_negative_mining",
    "hash_join_enrich",
    "having_filter",
    "heavy_hitter_terms",
    "hill_tail_orders",
    "hll_cardinality_events",
    "incremental_minhash_dedup",
    "interval_grid_pairs",
    "interval_overlap_pairs",
    "ivf_topk_search",
    "join_orders_customer",
    "json_props",
    "key_skew_orders",
    "kfold_split_counts",
    "kmeans_assign_counts",
    "kmv_distinct_sketch",
    "knn_label_noise_emb",
    "ks_drift_events",
    "label_centroid_confusion_emb",
    "left_join_counts",
    "like_and_trim",
    "linear_trend_agg",
    "mad_outlier_stats",
    "map_aggregate",
    "matryoshka_recall_emb",
    "merge_union",
    "min_max_by",
    "minhash_lsh_dedup",
    "mixture_allocation_docs",
    "mmr_diverse_topk",
    "multi_hop_enrichment",
    "multimodal_audio_stats",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_image_stats",
    "negative_samples_lineitem",
    "nexmark_q4_avg_by_category",
    "nexmark_q5_hot_items",
    "nexmark_q6_avg_last10",
    "nexmark_q7_window_max",
    "nexmark_q8_stream_join",
    "ngram_jaccard_dedup",
    "ngram_novelty_stats",
    "padding_efficiency_docs",
    "pagerank_copurchase",
    "pandas_udf_text_metrics",
    "pca_projection_stats",
    "percentile_stats",
    "pii_scrub_stats",
    "pivot_mktsegment",
    "pq_code_dup_pairs",
    "pq_encode_stats",
    "psi_drift_events",
    "q1_pricing_summary",
    "quality_classifier_scores",
    "quality_decile_stats",
    "quantile_sketch_events",
    "range_join_value_bands",
    "rbo_rank_similarity_emb",
    "readability_docs",
    "record_linkage_parts",
    "reducing_agg",
    "repetition_top_ngram",
    "resample_gap_fill",
    "reservoir_sample_events",
    "rolling_aggregate",
    "rollup_agg",
    "salted_aggregate_orders",
    "scalar_functions",
    "scd2_event_type_intervals",
    "scd2_incremental_merge",
    "seasonal_decompose_events",
    "semantic_dedup_docs",
    "semi_anti_join",
    "sequence_packing",
    "session_window_batch",
    "set_operations",
    "simhash_groups",
    "simhash_near_dups",
    "sliding_agg_incremental",
    "sliding_distinct_users",
    "sliding_window_batch",
    "sort_limit",
    "source_divergence_docs",
    "source_overlap_docs",
    "source_quota_sample",
    "stratified_sample_docs",
    "streaming_count_min_sketch",
    "streaming_dedup_count",
    "streaming_event_transitions",
    "streaming_interval_join_flush",
    "streaming_psi_drift_events",
    "streaming_quality_gate",
    "streaming_rolling_count",
    "streaming_session_window",
    "streaming_stateful_count",
    "streaming_tumbling_window",
    "table_diff_counts",
    "table_profile",
    "temperature_sample_counts",
    "temporal_scd2_lookup",
    "text_features",
    "tfidf_top_terms",
    "theta_join",
    "token_stats",
    "tokenize_ids_stats",
    "top_mass_selection_docs",
    "top_n_per_group",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_discounted_revenue",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_missing_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "train_test_split_counts",
    "tumbling_window_batch",
    "unigram_lm_quality",
    "url_dedup_stats",
    "user_sessions",
    "value_histogram",
    "values_inline",
    "w1_drift_events",
    "weekly_value_percentiles",
    "weighted_sample_counts",
    "window_frames",
    "window_rank_functions",
    "winnow_fingerprint_dups",
    "winsorized_value_stats",
    "wordcount",
})

SF1_DIR = os.environ.get("SPARK_GRAFT_TEST_SF1_DIR", "/root/testdata/sf0.1")


@pytest.mark.parametrize(
    "name",
    _lane_params(sorted(set(ORACLES) - _SF01_GRANDFATHERED), 16)
    or ["_none"])
def test_new_query_matches_oracle_at_sf01(spark, name):
    """The sf0.1 leg, enforced for every post-r6 query by construction
    (anything not in the frozen grandfather set)."""
    if name == "_none":
        pytest.skip("no post-r6 queries yet")
    _compare(spark, name, SF1_DIR)


def test_every_query_has_oracle_or_is_declared():
    missing = set(QUERIES) - set(ORACLES)
    # The driver contract has NO rows-only notion (r4 verdict: the declared
    # rows-only kmeans slot produced an error row every round) — every gate
    # query must carry an oracle.  Iterative/non-SQL ops get a
    # deterministic SQL-twinnable gate shape instead (e.g.
    # kmeans_assign_counts) with the full algorithm pinned in pytest.
    allowed_rows_only: set[str] = set()
    assert missing <= allowed_rows_only, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_are_driver_safe(name):
    """Regression for the r4 dq_checks_orders red row: DuckDB widens
    SUM(BIGINT) to HUGEINT, the driver's typed hash then disagrees with
    Spark's BIGINT even for equal values — while this mirror passed,
    because fetchall() collapses HUGEINT to Python int.  DESCRIBE every
    oracle and reject HUGEINT/UHUGEINT outright (cast to BIGINT in the
    oracle instead)."""
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    rows = con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [(r[0], r[1]) for r in rows if "HUGEINT" in str(r[1]).upper()]
    assert not bad, f"{name}: HUGEINT-typed oracle columns {bad}"
    # r5's second typed-representation red row (hll_cardinality_events): a
    # DECIMAL(38,0) output column passed fetchall() (both sides produce
    # decimal.Decimal) but failed the DRIVER's hash, because DuckDB's
    # pandas path coerces >18-precision DECIMAL to float64 while Spark's
    # toPandas keeps decimal.Decimal objects.  Reject any oracle output
    # column of DECIMAL with precision > 18 (cast to BIGINT/DOUBLE in the
    # oracle instead).
    import re as _re
    wide = []
    for cname, ctype in ((r[0], str(r[1]).upper()) for r in rows):
        m = _re.match(r"DECIMAL\((\d+),(\d+)\)", ctype)
        if m and int(m.group(1)) > 18:
            wide.append((cname, ctype))
    assert not wide, (
        f"{name}: oracle columns with DECIMAL precision > 18 are not "
        f"driver-representation-safe: {wide}"
    )


@pytest.mark.parametrize("name", _lane_params(sorted(ORACLES), 8))
def test_gate_output_decimals_are_driver_safe(spark, name):
    """Spark-side twin of the DuckDB check above: reject any gate-output
    column of DecimalType with precision > 18.  Spark's toPandas keeps
    such values as decimal.Decimal objects while DuckDB's pandas path
    coerces them to float64, so the driver's typed hash disagrees even
    when every value is equal (the r5 hll_cardinality_events red row).
    Schema-only: no execution."""
    from pyspark.sql.types import ArrayType, DecimalType, StructType

    def _wide(dt, path):
        if isinstance(dt, DecimalType) and dt.precision > 18:
            yield (path, str(dt))
        elif isinstance(dt, ArrayType):
            yield from _wide(dt.elementType, path + "[]")
        elif isinstance(dt, StructType):
            for f in dt.fields:
                yield from _wide(f.dataType, f"{path}.{f.name}")

    schema = QUERIES[name](spark, SF_DIR).schema
    bad = [b for f in schema.fields for b in _wide(f.dataType, f.name)]
    assert not bad, (
        f"{name}: gate-output columns with DecimalType precision > 18 are "
        f"not driver-representation-safe: {bad}"
    )


def test_mirror_is_typed():
    """Regression: the mirror must distinguish what the driver's typed hash
    distinguishes — a BIGINT column on one side vs DOUBLE on the other with
    equal numeric values has to FAIL the compare (r2 verdict item #3)."""
    assert _norm(902) != _norm(902.0)
    assert _norm(Decimal("902.00")) != _norm(902.0)
    assert _norm(True) != _norm(1)
    assert _norm(0) != _norm(False)
    # and equal typed values still compare equal
    assert _norm(902) == _norm(902)
    assert _norm([1, 2.0]) == _norm([1, 2.0])
    assert _norm([1, 2]) != _norm([1, 2.0])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_no_oracle_is_empty():
    """A 0-row gate query trivially hash-matches and proves nothing (bit
    q22 and q11 during development) — every oracle must select rows at
    the gate scale factors.  At the sf0.001 smoke scale a selective
    filter can legitimately drain (Q7's two-nation restriction finds no
    rows in ~6k lineitem) — the allowlist keeps the cross-SF sweep
    runnable without weakening the sf0.01/sf0.1 guard."""
    tiny_ok = {"tpch_q7_volume_shipping"} if SF_DIR.rstrip("/").endswith("sf0.001") else set()
    for name, sql in ORACLES.items():
        if name in tiny_ok:
            continue
        _, rows = _duck(sql)
        assert len(rows) > 0, f"{name}: oracle returns 0 rows at {SF_DIR}"
