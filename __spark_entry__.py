"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator/query shape from SURVEY.md §2
implemented with hazelcast_jet_spark (Spark-first plans); each
``oracle_sql()`` entry is the equivalent ANSI SQL for DuckDB over the
same parquet tables.  Column names/aliases match on both sides; floats
are rounded identically; timestamps are emitted as formatted strings so
both engines hash the same values.
"""

from __future__ import annotations

import math
import os
import sys
from collections.abc import Callable

# make the package importable regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hazelcast_jet_spark import aggregates as agg
from hazelcast_jet_spark.operators import dedup, joins, similarity, sketch, text
from hazelcast_jet_spark.session import load_table

# ---------------------------------------------------------------------------
# shared constants (keep Spark + SQL sides in sync)
# ---------------------------------------------------------------------------

MINHASH_HASHES = 8
MINHASH_BANDS = 4
SHINGLE_K = 3
LSH_THRESHOLD = 0.5
SIMHASH_BITS = 63  # r3: widened from 16 (VERDICT r2 #4 — 16-bit space goes quadratic at scale)
TOPK = 5
N_QUERY_VECS = 5


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(c) -> F.Column:
    """Order-independent exact sum of a double column, emitted as double:
    accumulate in DECIMAL(18,6) (exact, overflow-widened) then cast back.
    Makes Spark and the DuckDB oracle bit-identical regardless of
    partitioning/combine order.  SQL twin: CAST(SUM(CAST(x AS
    DECIMAL(18,6))) AS DOUBLE)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast("decimal(18,6)")).cast("double")


# ---------------------------------------------------------------------------
# queries (Spark side)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan+filter+grouped multi-aggregate (SURVEY §2.7).
    Filter reaches the parquet scan; partial aggregation is map-side."""
    l = _t(spark, sf_dir, "lineitem")
    n = agg.counting()
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            (dsum("l_quantity") / n).alias("avg_qty"),
            (dsum("l_discount") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map/filter fusion (GeneralStage.java:78-116): expression project
    over a pushed-down filter; stays in one codegen stage."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter((F.col("l_quantity") < 10) & (F.col("l_discount") > 0.05))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charge"),
            F.concat_ws("-", "l_returnflag", "l_linestatus").alias("flag_status"),
        )
    )


def global_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-stage aggregate → 1 row (BatchStage.aggregate, allOf)."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        agg.counting().alias("n_orders"),
        dsum("o_totalprice").alias("total"),
        agg.min_of("o_totalprice").alias("min_price"),
        agg.max_of("o_totalprice").alias("max_price"),
        F.count_distinct(F.col("o_custkey")).alias("n_custs"),
    )


def join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join + grouped agg (SQL join, JoinPhysicalRule.java:46)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            agg.counting().alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


def left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join with unmatched rows (hashJoin's null-padding semantics,
    HashJoinP.java): per-customer order counts, 0 for orderless."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def hash_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashJoin enrichment (GeneralStage.java:774): broadcast the part dim
    into the lineitem scan, then aggregate by brand."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            agg.counting().alias("n_items"),
        )
    )


def theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + non-equi residual (JetJoinInfo.nonEquiCondition,
    impl/JetJoinInfo.java:30-63): orders above their customer's balance."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.o_totalprice > c.c_acctbal), "inner")
        .groupBy("c_mktsegment")
        .agg(agg.counting().alias("n_big_orders"))
    )


def distinct_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BatchStage.distinct (BatchStage.java:221)."""
    c = _t(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


def merge_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge(other) = union-all (BatchStage.java:234) of two filtered scans."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 100000).select("o_orderkey", "o_orderstatus")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey", "o_orderstatus")
    return hi.unionByName(urgent).groupBy("o_orderstatus").agg(agg.counting().alias("n_rows"))


def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (BatchStage.sort + SQL ORDER BY/LIMIT, a Spark
    superset — reference rejects LIMIT, UnsupportedOperationVisitor:340)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def top_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topN aggregate (AggregateOperations.java:279) as whole rows/group."""
    c = _t(spark, sf_dir, "customer")
    return joins.top_n_rows(
        c, 3, ["c_mktsegment"], [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    ).select("c_mktsegment", "c_custkey", "c_acctbal", "rn")


def min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minBy/maxBy (AggregateOperations.java:200,237): per-segment customer
    with the extreme balance (custkey tiebreak for determinism)."""
    c = _t(spark, sf_dir, "customer")
    ordc = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return c.groupBy("c_mktsegment").agg(
        agg.max_by("c_custkey", ordc).alias("richest_cust"),
        agg.min_by("c_custkey", ordc).alias("poorest_cust"),
    )


def cogroup_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-group / aggregate2 (BatchStageWithKey.java:211): orders and
    lineitems grouped by orderkey, aggregated jointly.  Partial aggs
    happen before the join — only (key, acc) pairs shuffle."""
    o = _t(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "orderkey")
    l = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "orderkey")
    out = joins.co_group(
        o, l, "orderkey",
        {"n_orders": agg.counting(), "order_total": dsum("o_totalprice")},
        {"n_items": agg.counting(), "sum_qty": dsum("l_quantity")},
    )
    return out.select(
        "orderkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        "order_total",
        F.coalesce("n_items", F.lit(0)).alias("n_items"),
        "sum_qty",
    )


def rolling_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollingAggregate (StreamStageWithKey.java:296) on a bounded stage:
    running per-user sum in event-time order."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("running_value"),
    )


def distinct_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupingKey(k).distinct() (BatchStageWithKey.java:66) with a
    deterministic winner: first event per (user, type) by time."""
    e = _t(spark, sf_dir, "events")
    return joins.top_n_rows(
        e, 1, ["user_id", "event_type"], [F.col("ts").asc(), F.col("event_id").asc()]
    ).select("user_id", "event_type", "event_id")


def tumbling_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window agg (WindowDefinition.tumbling) on event time."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(agg.counting().alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def sliding_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window agg (WindowDefinition.sliding(2h, 1h)): each event
    lands in size/slide = 2 windows (SlidingWindowP.java frame model)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(agg.counting().alias("n_events"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
        )
    )


def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (SessionWindowDefinition, SessionWindowP.java:79):
    per-user sessions with a 30-minute gap."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(agg.counting().alias("n_events"))
        .select(
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "user_id", "n_events",
        )
    )


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar whitelist coverage (UnsupportedOperationVisitor.java:89-181):
    string + math + CASE in one projection."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_type", 1, 5).alias("sub"),
        F.length("p_name").alias("len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("cat"),
        F.round(F.abs(F.col("p_retailprice") - 1000), 2).alias("absdev"),
        F.ceil("p_retailprice").alias("ceilp"),
        F.floor("p_retailprice").alias("floorp"),
        (F.col("p_size") % 7).alias("modsz"),
        # integer power is exact in IEEE double for these magnitudes, unlike
        # sin/exp which sit on libm-vs-JVM 1-ulp differences (trig coverage
        # lives in tests/test_operators.py::test_transcendental_functions
        # with a tolerance compare instead of the exact-hash gate)
        F.pow(F.col("p_size"), 2).alias("sqsz"),
        F.sqrt(F.col("p_size") * F.col("p_size")).alias("sqrtsz"),
        F.when(F.col("p_size") > 25, F.lit("big")).when(F.col("p_size") > 10, F.lit("mid")).otherwise(F.lit("small")).alias("szclass"),
    )


def generate_series_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE(generate_series(a,b)) (SeriesSqlConnector) — spark.range."""
    from hazelcast_jet_spark.sources import generate_series
    s = generate_series(spark, 1, 100000)
    return s.filter(F.col("v") % 7 == 0).agg(
        agg.counting().alias("n"), agg.summing("v").alias("total")
    )


def json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON handling on the events.props column (Jet: OBJECT/json formats;
    Spark superset via get_json_object)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.select(F.get_json_object("props", "$.k").cast("int").alias("k"), "value")
        .groupBy("k")
        .agg(agg.counting().alias("n"), dsum("value").alias("sum_value"))
    )


def text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token count, stopword ratio, lang-id heuristic,
    quality score, fingerprint (operators/text.py) — all JVM expressions."""
    d = _t(spark, sf_dir, "documents")
    return text.add_text_features(d, "text").select(
        "doc_id", "n_tokens", "stopword_ratio", "lang_pred", "quality", "fp"
    )


def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal (operators/text.char_entropy):
    bits/char of the per-doc character distribution — flags repeated-
    char spam (≈0) and base64/binary junk (high) that token-level
    heuristics miss.  Map-only Column expression; per-char −p·ln p
    terms accumulate in DECIMAL so the value is independent of the
    engine's distinct-char enumeration order."""
    d = _t(spark, sf_dir, "documents")
    out = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        text.char_entropy("text").alias("h_bits"),
    )
    # barrier before the global sort: a map-only plan under an orderBy
    # is executed TWICE (once by the range-partitioner's sampling job,
    # once for real) — materializing the narrow per-doc rows first makes
    # the entropy expression run once (guide §2.4: the sort is the only
    # exchange; don't let it re-run the scan pipeline).
    return out.localCheckpoint().orderBy("doc_id")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (whitespace + BPE-ish regex) per source —
    the training-data token-budget query (operators/text.py)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(text.token_count("text")).alias("ws_tokens"),
        F.sum(text.regex_token_count("text")).alias("bpe_tokens"),
        agg.counting().alias("n_docs"),
    )


def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized-text fingerprint (operators/dedup.py)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d)


def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle→minhash→band→bucket-join→verify."""
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(
        d, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS, k=SHINGLE_K, threshold=LSH_THRESHOLD
    )


def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs via inverted shingle index."""
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(d, k=SHINGLE_K, threshold=LSH_THRESHOLD)


def _pca_fixed_axes(dim: int = 64):
    """Fixed literal mean + two projection axes over exact dyadic
    rationals (…/4, …/8 — exactly representable doubles), so every
    product and the plan-time constant c_j are bit-identical in any
    IEEE engine.  The FITTED path (clustering.pca_fit) is pinned vs
    numpy in pytest; the gate scores against fixed axes because a
    distributed eigendecomposition is float-order-sensitive and the
    driver hash needs bit equality."""
    m = [((i % 5) - 2) / 4.0 for i in range(dim)]
    w1 = [(((i * 7) % 11) - 5) / 8.0 for i in range(dim)]
    w2 = [(((i * 13 + 3) % 11) - 5) / 8.0 for i in range(dim)]
    cs = []
    for w in (w1, w2):
        c = 0.0
        for m_i, w_i in zip(m, w):  # same sequential fold as pca_project
            c += m_i * w_i
        cs.append(c)
    return m, w1, w2, cs


def pca_projection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only PCA scoring (operators/clustering.pca_project): each
    component is Σ v[i]·w[i] − c folded in whole-stage codegen — no
    shuffle, no broadcast, weights in the task binary.  Per-label
    spread of the two components via DECIMAL-exact sums."""
    from hazelcast_jet_spark.operators.clustering import pca_project

    e = _t(spark, sf_dir, "embeddings")
    m, w1, w2, _ = _pca_fixed_axes()
    out = pca_project(e, m, [w1, w2], round_digits=9)

    def dec(c):
        return F.sum(F.col(c).cast("decimal(28,12)")).cast("double")

    return (
        out.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"),
             dec("pc1").alias("sum_pc1"), dec("pc2").alias("sum_pc2"),
             F.min("pc1").alias("min_pc1"), F.max("pc2").alias("max_pc2"))
        .orderBy("label")
    )


CONTAIN_THRESHOLD = 0.6


def containment_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups (operators/dedup.containment_
    pairs): |A∩B| / min(|A|,|B|) flags a short doc embedded in a long
    one — resemblance (Jaccard) structurally misses this (Broder 1997).
    Same one-shuffle inverted shingle index as the Jaccard gate."""
    d = _t(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, k=SHINGLE_K, threshold=CONTAIN_THRESHOLD)


def simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash duplicate buckets (operators/dedup.simhash)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_dup_groups(d, bits=SIMHASH_BITS)


def cosine_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search (operators/similarity.py)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.cosine_topk(e, q, k=TOPK)


def linear_trend_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linearTrend(xFn, yFn) — AggregateOperations.java:471: least-squares
    slope of value over event_id per user, from exact decimal moments
    (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) so both engines agree bit-for-bit."""
    e = _t(spark, sf_dir, "events")
    # per-row products in IEEE double (bit-identical across engines),
    # accumulated exactly via the decimal-sum pattern
    x = F.col("event_id").cast("double")
    y = F.col("value")
    g = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"),
        dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"),
        dsum(x * x).alias("sxx"),
    )
    # moments are exact decimals cast to double; the final combination is
    # the same IEEE expression in both engines → bit-identical slope
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return g.select("user_id", (num / den).alias("slope"))


def collection_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toList/toSet/sorting/concatenating (AggregateOperations.java:500-947)
    with deterministic (sorted) order.  Array-valued aggregates are
    serialized to '|'-joined strings for the gate (the driver's row
    canonicalizer can't sort rows holding Python lists); the operators
    themselves still return real arrays (see aggregates.py)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws("|", agg.sorting("c_mktsegment")).alias("segs_sorted"),
        F.concat_ws("|", F.sort_array(F.collect_set("c_mktsegment"))).alias("segs_set"),
        agg.concatenating_sorted(F.col("c_custkey").cast("string"), ",").alias("keys_csv"),
        F.concat_ws(
            "|",
            F.transform(
                agg.top_n(3, F.col("c_acctbal").cast("decimal(12,2)")),
                lambda x: x.cast("string"),
            ),
        ).alias("top3_bal"),
    )


def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT)/SUM(DISTINCT) — SqlAggregateTest distinct variants
    (impl/aggregate/DistinctSqlAggregation)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct(F.col("l_suppkey")).alias("n_supp"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_d_qty"),
    )


def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (SqlAggregateTest HAVING suite)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(agg.counting().alias("n"), dsum("o_totalprice").alias("spend"))
        .filter(F.col("n") >= 15)
    )


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi/left_anti — rejected by the reference
    (SqlUnsupportedFeaturesTest.java:64-81), native here (extension)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    with_urgent = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
    without_urgent = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    return (
        with_urgent.select("c_custkey", F.lit("has_urgent").alias("bucket"))
        .unionByName(without_urgent.select("c_custkey", F.lit("no_urgent").alias("bucket")))
    )


def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — rejected by the reference
    (UnsupportedOperationVisitor.java:352), native here (extension)."""
    hi_cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000) \
        .select("c_custkey", "c_acctbal")
    big_ord = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000) \
        .groupBy("o_custkey").agg(agg.counting().alias("n_big"))
    j = hi_cust.join(big_ord, hi_cust.c_custkey == big_ord.o_custkey, "full_outer")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.col("c_acctbal"), F.coalesce("n_big", F.lit(0)).alias("n_big"),
    )


def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT — absent in the reference (SURVEY §2.9), native
    here.  Nations appearing among customers but not suppliers, etc."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = c.intersect(s).withColumn("src", F.lit("both"))
    cust_only = c.subtract(s).withColumn("src", F.lit("cust_only"))
    return both.unionByName(cust_only)


def like_and_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / TRIM family / ASCII (whitelist §2.10,
    UnsupportedOperationVisitor.java:123-181)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%r%"))
        .select(
            "p_partkey",
            F.trim(F.lit("  pad  ")).alias("trimmed"),
            F.ltrim(F.lit("  x")).alias("l"),
            F.rtrim(F.lit("x  ")).alias("r"),
            F.ascii(F.substring("p_name", 1, 1)).alias("first_ascii"),
            F.col("p_name").startswith("s").cast("int").alias("starts_s"),
        )
    )


def cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAST across the §1.2 type matrix (ToConverters.java:47-70)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("bigint").alias("i2l"),
        F.col("l_orderkey").cast("string").alias("l2s"),
        F.floor("l_extendedprice").cast("int").alias("d2i"),
        F.col("l_quantity").cast("int").alias("q2i"),
        (F.col("l_linenumber") < 3).alias("b"),
        (F.col("l_linenumber") < 3).cast("int").alias("b2i"),
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd").alias("ts2d"),
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS/ROLLUP — absent in the reference (SURVEY §2.7),
    free Spark extension."""
    c = _t(spark, sf_dir, "customer")
    return c.rollup("c_mktsegment", "c_nationkey").agg(
        agg.counting().alias("n"), dsum("c_acctbal").alias("bal"),
    )


def window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/lag/lead analytics (Spark extension; the reference
    has no window functions outside streaming windows)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderkey", "o_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
    )


def multi_hop_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hashJoin2 / mapUsingIMap chain (GeneralStage.java:864,678): fact →
    supplier → nation → region, all small dims broadcast; revenue per
    region name."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
             agg.counting().alias("n_items"))
    )


def pandas_udf_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python-UDF surface (mapUsingPython, PythonTransforms.java:48):
    Arrow-batched mapInPandas computing per-doc vowel counts, then a
    JVM-side aggregation.  Deterministic integers → oracle-comparable."""
    import pandas as pd

    d = _t(spark, sf_dir, "documents")

    def vowels(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "lang": pdf["lang"],
                "n_vowels": pdf["text"].str.count(r"[aeiou]").astype("int64"),
            })

    mapped = d.mapInPandas(vowels, "lang string, n_vowels long")
    return mapped.groupBy("lang").agg(
        F.sum("n_vowels").alias("total_vowels"), agg.counting().alias("n_docs")
    )


def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES / ROW constructors (UnsupportedOperationVisitor.java:138;
    ValuesReduceRules folding)."""
    return spark.sql(
        "SELECT k, upper(s) AS us, v * 2 AS v2 "
        "FROM (VALUES (1, 'a', 1.5D), (2, 'b', 2.5D), (3, 'c', NULL)) AS t(k, s, v)"
    )


def recursive_cte_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE surface pin (Spark 4 recursive CTE — beyond the
    reference's Calcite surface, which has no recursion): the
    α=0.5 EWMA of yearly gross revenue per order priority computed IN
    SPARK SQL by the same recursive-CTE technique this repo's oracles
    use — a true engine-level recursion (each level reads the previous
    one), not a window rewrite.  Every multiply is an exact binary
    scaling on DECIMAL-exact monthly sums, so Spark's recursion and
    DuckDB's replay are bit-identical with no rounding."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__rcs_orders")
    # The recursion is the surface being pinned; the yearly series it
    # recurses OVER is materialized ONCE (localCheckpoint).  Spark's
    # UnionLoop re-executes every non-recursive relation per level, so
    # inlining `ser` re-ran the scan+aggregate+window chain at each of
    # the ~7 recursion depths (74 jobs, 5.7 s warm at sf0.1 → 1.9 s).
    ser = spark.sql("""
        SELECT pri, yr, rev,
               row_number() OVER (PARTITION BY pri ORDER BY yr) AS idx
        FROM (
            SELECT o_orderpriority AS pri,
                   CAST(date_format(o_orderdate, 'yyyy-01-01') AS DATE)
                       AS yr,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                        AS DOUBLE) AS rev
            FROM __rcs_orders GROUP BY 1, 2
        )
    """).localCheckpoint()
    ser.createOrReplaceTempView("__rcs_ser")
    return spark.sql("""
        WITH RECURSIVE ew AS (
            SELECT pri, yr, rev, idx, rev AS ewma_rev
            FROM __rcs_ser WHERE idx = 1
            UNION ALL
            SELECT s.pri, s.yr, s.rev, s.idx,
                   0.5 * e.ewma_rev + 0.5 * s.rev
            FROM __rcs_ser s JOIN ew e
              ON s.pri = e.pri AND s.idx = e.idx + 1
        )
        SELECT pri, yr, rev, ewma_rev FROM ew ORDER BY pri, yr
    """)


def lateral_topk_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated-subquery surface pin (beyond the reference's
    SQL whitelist): per region, the single top nation by customer
    account balance via a correlated ``LATERAL (... ORDER BY ... LIMIT
    1)`` — the idiom that fuses a per-group top-k into the join without
    a window, planned by Spark as a correlated lateral join.  Both
    engines run the identical text; DECIMAL-exact balance sums,
    deterministic name tie-break."""
    _t(spark, sf_dir, "region").createOrReplaceTempView("__lts_region")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("__lts_nation")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__lts_customer")
    return spark.sql("""
        SELECT r.r_name, x.n_name, x.total_bal
        FROM __lts_region r,
        LATERAL (
            SELECT n.n_name,
                   CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,12)))
                        AS DOUBLE) AS total_bal
            FROM __lts_nation n JOIN __lts_customer c
              ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name
            ORDER BY total_bal DESC, n.n_name
            LIMIT 1
        ) x
        ORDER BY r.r_name
    """)


#: banded hyperplane LSH config for the ANN / embedding-dedup queries
#: (deterministic ±1 plane sets shared with the SQL oracle).  4 bands of 6
#: planes: the OR-construction that keeps recall while each band's 2^6
#: buckets bound within-bucket pairing — at scale, raise planes_per_band
#: to ~log2(n/target_bucket) and add max_bucket (similarity.py docstring).
LSH_NUM_BANDS = 4
LSH_PLANES_PER_BAND = 6
#: hard cap on band-bucket size (degenerate hub/boilerplate buckets are
#: dropped whole).  r3: the gate queries now pass it, so the measured plan
#: IS the production plan (VERDICT r2 "What's wrong" #6); the oracle
#: applies the identical QUALIFY filter.
LSH_MAX_BUCKET = 128
LSH_BANDS = None  # populated below via similarity.banded_hyperplanes


def _lsh_bands():
    global LSH_BANDS
    if LSH_BANDS is None:
        from hazelcast_jet_spark.operators.similarity import banded_hyperplanes
        LSH_BANDS = banded_hyperplanes(LSH_NUM_BANDS, LSH_PLANES_PER_BAND, 64, seed=7)
    return LSH_BANDS


def ann_lsh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH (the 100 TB scale path of
    similarity search): bucket by signature, exact cosine re-rank inside
    the bucket (operators/similarity.ann_lsh_topk)."""
    from hazelcast_jet_spark.operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.ann_lsh_topk(e, q, _lsh_bands(), k=TOPK, max_bucket=LSH_MAX_BUCKET)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing through the correctness gate: documents as
    binary payloads → Arrow-batched feature extraction (md5 fake codec,
    operators/multimodal.extract_features)."""
    from hazelcast_jet_spark.operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("doc").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return extract_features(media).select("media_id", "kind", "n_bytes", "feature")


N_IMAGE_MEDIA, IMG_W, IMG_H = 30, 24, 16


def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the gate (operators/multimodal.
    image_features): binary PPM payloads synthesized from a closed-form
    pixel formula (pure function of media_id, x, y, channel), decoded
    with the native P6 parser, and the oracle recomputes dims + channel
    means from the SAME formula — decode fidelity end to end.  The
    ahash63 fingerprint is pytest-pinned (8×8 resize in SQL is not
    worth the oracle)."""
    import numpy as np
    import pandas as pd

    from hazelcast_jet_spark.operators.multimodal import image_features

    def synth(batches):
        for pdf in batches:
            payloads = []
            for m in pdf["media_id"]:
                mm = int(m)
                img = np.fromfunction(
                    lambda y, x, c: (y * 7 + x * 5 + c * 29 + mm * 13) % 256,
                    (IMG_H, IMG_W, 3)).astype("uint8")
                payloads.append(
                    f"P6\n{IMG_W} {IMG_H}\n255\n".encode() + img.tobytes())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads})

    # 30 synthetic rows: default-parallelism range fans the two Python
    # stages over 32 near-empty tasks (×2: the orderBy range-partitioner
    # samples its child, re-running the chain) — 4 partitions is the
    # right sizing for this row count at ANY cluster size (guide §4:
    # bound Python worker round trips, not a local[32] tune)
    media = (
        spark.range(0, N_IMAGE_MEDIA, 1, 4)
        .withColumnRenamed("id", "media_id")
        .mapInPandas(synth, "media_id long, payload binary")
    )
    return image_features(media).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    ).orderBy("media_id")


PQ_M, PQ_K, PQ_SUBDIM = 8, 4, 8


def _pq_fixed_codebooks():
    """Fixed literal PQ codebooks over exact dyadic rationals (…/8) —
    same rationale as _pca_fixed_axes: the FITTED path (similarity.
    pq_fit) is pytest-pinned; the gate encodes against literals so the
    rounded-argmin is bit-equal in any IEEE engine."""
    return [[[((s * 5 + j * 3 + t * 7) % 9 - 4) / 8.0
              for t in range(PQ_SUBDIM)]
             for j in range(PQ_K)]
            for s in range(PQ_M)]


def pq_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (similarity.pq_encode; Jégou et al.
    2011): per-subspace rounded-L2 argmin codes + total quantization
    error — map-only, the memory arm of the ANN stack (64 float dims →
    8 code bytes).  Per-label code diversity and DECIMAL-exact error
    sums."""
    from hazelcast_jet_spark.operators.similarity import pq_encode

    e = _t(spark, sf_dir, "embeddings")
    out = pq_encode(e, _pq_fixed_codebooks(), err_col="err")
    code_str = F.array_join(
        F.transform("pq_code", lambda x: x.cast("string")), " ")
    return (
        out.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("err").cast("decimal(28,12)"))
            .cast("double").alias("sum_sqerr"),
            F.countDistinct(code_str).alias("n_codes"),
        )
        .orderBy("label")
    )


def ann_recall_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the full IVF-PQ-with-re-rank pipeline against exact
    cosine top-k — the quality metric completing the ANN family
    (similarity.ivf_pq_topk is the throughput path; this measures what
    the approximation costs).  The pipeline under test is the
    production shape: IVF prunes to nprobe cells, ADC over PQ codes
    shortlists RERANK_C candidates (similarity.adc_dist_portable: the
    SQL-portable twin of the Arrow LUT kernel — fixed-order folds,
    round-9 per-subspace terms, left-to-right subspace sum), and an
    exact cosine re-rank of the shortlist picks the final k (a k-row
    lookup per query, never a scan).  Everything uses fixed dyadic
    centroids/codebooks and the (score, id) determinism convention, so
    the oracle replays every float op bit-for-bit and recall is an
    integer intersection count over k."""
    from hazelcast_jet_spark.operators import similarity
    from hazelcast_jet_spark.operators.similarity import (
        _centroid_dists, adc_dist_portable, ivf_assign, pq_encode)

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    exact = similarity.cosine_topk(e, q, k=TOPK).select("query_id", "corpus_id")
    cents = _ivf_centroids()
    books = _pq_fixed_codebooks()
    corp = pq_encode(ivf_assign(e, cents), books).select(
        F.col("vec_id").alias("corpus_id"), "centroid_id", "pq_code")
    qd = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
        F.posexplode(
            _centroid_dists(F.col("embedding").cast("array<double>"), cents)
        ).alias("cidx", "dist"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("cidx").asc())
    probe = (
        qd.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= IVF_NPROBE)
        .select("query_id", "qv", (F.col("cidx") + 1).alias("centroid_id"))
    )
    scored = (
        corp.join(F.broadcast(probe), "centroid_id")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .withColumn("adist",
                    adc_dist_portable(F.col("qv"), F.col("pq_code"), books))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("corpus_id").asc())
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RERANK_C)
        .select("query_id", "qv", "corpus_id")
    )
    cvecs = e.select(F.col("vec_id").alias("corpus_id"),
                     F.col("embedding").cast("array<double>").alias("cv"))
    rr = shortlist.join(cvecs, "corpus_id").withColumn(
        "cos_sim", F.round(similarity.cosine(F.col("qv"), F.col("cv")), 6))
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc())
    ann = (
        rr.withColumn("rrank", F.row_number().over(wr))
        .filter(F.col("rrank") <= TOPK)
        .select("query_id", "corpus_id")
    )
    hits = ann.join(exact, ["query_id", "corpus_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits"))
    base = q.select(F.col("vec_id").alias("query_id"))
    nh = F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint")
    return (
        base.join(hits, "query_id", "left")
        .select("query_id", nh.alias("n_hits"),
                (nh.cast("double") / F.lit(float(TOPK))).alias("recall_at_k"))
        .orderBy("query_id")
    )


def pq_code_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-domain near-dup detection over PQ codes (similarity.
    pq_code_near_dup_pairs): embeddings compressed to m code bytes, then
    pairs differing in <= 1 subspace found via the one-hot-packed
    rotated-band hamming probe — no pairwise scan, the composition of
    pq_encode and dedup.hamming_near_dup_pairs.  Output aggregates the
    pair set (count + id checksum per code distance) so the gate row
    set stays tiny at any SF; the oracle brute-forces the same pair set
    directly on code arrays."""
    from hazelcast_jet_spark.operators.similarity import (
        pq_code_near_dup_pairs, pq_encode)

    e = _t(spark, sf_dir, "embeddings")
    coded = pq_encode(e, _pq_fixed_codebooks())
    pairs = pq_code_near_dup_pairs(coded, k_cb=PQ_K, max_diff_codes=1)
    return (
        pairs.groupBy("n_diff_codes")
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.sum(F.col("id_a") + F.col("id_b")).alias("sum_ids"))
        .orderBy("n_diff_codes")
    )


BM25_TERMS = ("spark", "table", "window")


def bm25_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval scoring (operators/text.bm25_scores;
    Robertson & Zaragoza 2009) of the documents table against a fixed
    3-term query — one corpus scan, query-term-only exchange, tiny
    broadcast stats; idf's ln is correctly-rounded libm on both engines
    (the unigram-LM convention) and per-term contributions accumulate
    in DECIMAL(18,12), so the score hashes exactly."""
    from hazelcast_jet_spark.operators.text import bm25_scores

    d = _t(spark, sf_dir, "documents")
    return bm25_scores(d, list(BM25_TERMS)).orderBy("doc_id")


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-aware hard-negative mining (similarity.
    hard_negative_topk): per anchor, the 5 most-cosine-similar vectors
    with a DIFFERENT label — the contrastive-training companion of the
    random negative sampler (negative_samples_lineitem).  Same
    broadcast-anchor map-only plan as cosine_topk with the label
    predicate pushed into the join."""
    from hazelcast_jet_spark.operators.similarity import hard_negative_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return hard_negative_topk(e, q, k=TOPK)


def label_centroid_confusion_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-class-centroid confusion matrix (clustering.
    label_centroid_confusion) — the class-separability probe of a
    training-data profile: per-label exact-decimal mean prototypes
    (bounded LABELS×DIMS driver collect), then a map-only rounded-L2
    argmin assignment and one count aggregate."""
    from hazelcast_jet_spark.operators.clustering import label_centroid_confusion

    e = _t(spark, sf_dir, "embeddings")
    return label_centroid_confusion(e)


PAD_BOUNDARIES = (16, 32, 64)


def scd2_event_type_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 interval builder (operators/timeseries.scd2_intervals):
    each user's event-type change log collapsed to validity intervals
    [valid_from, valid_to) with NULL = current — one ordered window
    exchange (lag drops no-op repeats, lead closes intervals).  Event
    time enters as tz-free integer epoch seconds so the oracle's
    floor(epoch()) replays it exactly."""
    from hazelcast_jet_spark.operators.timeseries import (
        _epoch_seconds, scd2_intervals)

    e = _t(spark, sf_dir, "events")
    e = e.select("user_id", "event_id", "event_type",
                 _epoch_seconds(e, "ts").alias("sec"))
    return (
        scd2_intervals(e, "user_id", "sec", "event_type", "event_id")
        .orderBy("user_id", "version")
    )


#: split instant for the incremental-SCD2 gate (2024-01-21 00:00:00 —
#: inside the events range at every SF, so both halves are non-empty)
SCD2_SPLIT_SEC = 1705795200


def scd2_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (operators/timeseries.
    scd2_apply_delta): the history table built from the first 20 days
    is merged with the remaining days' changelog, rebuilding ONLY
    delta-touched keys (semi/anti split + bounded per-key replay) —
    and, because a time-split delta is append-only per key, the result
    is provably IDENTICAL to a full rebuild, which is exactly what the
    oracle computes.  The strongest pin an incremental operator can
    have: incremental == batch."""
    from hazelcast_jet_spark.operators.timeseries import (
        _epoch_seconds, scd2_apply_delta, scd2_intervals)

    e = _t(spark, sf_dir, "events")
    e = e.select("user_id", "event_id", "event_type",
                 _epoch_seconds(e, "ts").alias("sec"))
    old_half = e.filter(F.col("sec") < SCD2_SPLIT_SEC)
    delta = e.filter(F.col("sec") >= SCD2_SPLIT_SEC)
    existing = scd2_intervals(old_half, "user_id", "sec", "event_type",
                              "event_id")
    return (
        scd2_apply_delta(existing, delta, "user_id", "sec", "event_type",
                         "event_id")
        .orderBy("user_id", "version")
    )


def categorical_assoc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information + chi-squared + Cramér's V between lang and
    source (operators/profile.categorical_association) — one
    contingency aggregate, margins derived from the cell table, exact
    DECIMAL accumulation of the fixed-order per-cell terms."""
    from hazelcast_jet_spark.operators.profile import categorical_association

    d = _t(spark, sf_dir, "documents")
    return categorical_association(d, "lang", "source")


def padding_efficiency_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste accounting for length-bucketed batching
    (operators/packing.padding_efficiency): documents bucketed by
    whitespace token count into the smallest boundary >= length
    (overflow truncates to the last), per-bucket real-vs-padded token
    volume — the metric that picks bucket boundaries for a training
    run; map-only bucket assignment + one aggregate."""
    from hazelcast_jet_spark.operators.packing import padding_efficiency
    from hazelcast_jet_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    toks = d.select(token_count("text").alias("n_tok"))
    return padding_efficiency(toks, "n_tok", list(PAD_BOUNDARIES))


def cms_join_size_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from two Count-Min sketches (operators/
    sketch.cms_join_size — the AGMS/CM inner product): the
    orders⨝customer output size predicted from two bounded
    depth×width sketches built map-side, next to the exact join count
    — the "plan before you shuffle" probe (estimate ≥ exact always).
    Same md5 hash arithmetic as count_min_estimates, replayed
    bit-for-bit by the oracle."""
    from hazelcast_jet_spark.operators.sketch import (
        cms_join_size, count_min_build)

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    ca = count_min_build(o.select("o_custkey"), "o_custkey",
                         width=CMS_WIDTH, depth=CMS_DEPTH, seed=CMS_SEED)
    cb = count_min_build(c.select("c_custkey"), "c_custkey",
                         width=CMS_WIDTH, depth=CMS_DEPTH, seed=CMS_SEED)
    est = cms_join_size(ca, cb)
    exact = o.join(c, o.o_custkey == c.c_custkey).agg(
        F.count(F.lit(1)).alias("exact_join_size"))
    return est.crossJoin(exact)


def key_skew_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profile of orders.o_custkey (operators/profile.
    key_skew): one keyed count exchange, then scalar skew statistics
    (max/mean ratio — the salt-or-not signal) plus the 5 heaviest keys
    with a deterministic (count desc, key asc) tiebreak."""
    from hazelcast_jet_spark.operators.profile import key_skew

    o = _t(spark, sf_dir, "orders")
    return key_skew(o, "o_custkey", top_n=5)


MMR_K, MMR_POOL, MMR_LAM = 3, 10, 0.7


def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified selection (similarity.
    mmr_select; Carbonell & Goldstein 1998): per query, 3 greedy picks
    from a 10-candidate relevance pool trading cosine relevance
    against redundancy (lam=0.7) — the data-selection step that spends
    a budget on coverage instead of near-identical top hits.  All
    scores are round-6 cosines with fixed-order IEEE arithmetic and
    id-ascending tiebreaks; the oracle unrolls the identical greedy
    steps as chained CTEs."""
    from hazelcast_jet_spark.operators.similarity import mmr_select

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return mmr_select(e, q, k=MMR_K, pool=MMR_POOL, lam=MMR_LAM)


def _mmr_oracle_sql() -> str:
    """Generated CTE chain unrolling mmr_select's greedy steps."""
    lam, inv = repr(float(MMR_LAM)), repr(float(1 - MMR_LAM))
    parts = [f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qvec
                FROM embeddings WHERE vec_id < {N_QUERY_VECS}
            ), scored AS (
                SELECT q.query_id, c.vec_id AS corpus_id,
                       c.embedding AS cvec,
                       {_cos_sql("q.qvec", "c.embedding")} AS rel
                FROM embeddings c, q WHERE c.vec_id <> q.query_id
            ), cand AS (
                SELECT query_id, corpus_id, cvec, rel FROM (
                    SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY rel DESC, corpus_id ASC) AS rn
                    FROM scored
                ) WHERE rn <= {MMR_POOL}
            ), ps AS (
                SELECT a.query_id, a.corpus_id AS id_a, b.corpus_id AS id_b,
                       {_cos_sql("a.cvec", "b.cvec")} AS sim
                FROM cand a JOIN cand b
                  ON a.query_id = b.query_id AND a.corpus_id <> b.corpus_id
            ), selall1 AS (
                SELECT query_id, corpus_id, 1 AS step FROM (
                    SELECT query_id, corpus_id, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY rel DESC, corpus_id ASC) AS rn
                    FROM cand
                ) WHERE rn = 1
            )"""]
    for t in range(2, MMR_K + 1):
        parts.append(f""", rem{t} AS (
                SELECT c.query_id, c.corpus_id, c.rel
                FROM cand c LEFT JOIN selall{t-1} s
                  ON c.query_id = s.query_id AND c.corpus_id = s.corpus_id
                WHERE s.corpus_id IS NULL
            ), sc{t} AS (
                SELECT r.query_id, r.corpus_id,
                       {lam} * r.rel - {inv} * MAX(p.sim) AS score
                FROM rem{t} r
                JOIN selall{t-1} s ON r.query_id = s.query_id
                JOIN ps p ON p.query_id = r.query_id
                         AND p.id_a = r.corpus_id AND p.id_b = s.corpus_id
                GROUP BY r.query_id, r.corpus_id, r.rel
            ), selall{t} AS (
                SELECT * FROM selall{t-1}
                UNION ALL
                SELECT query_id, corpus_id, {t} AS step FROM (
                    SELECT query_id, corpus_id, row_number() OVER (
                        PARTITION BY query_id
                        ORDER BY score DESC, corpus_id ASC) AS rn
                    FROM sc{t}
                ) WHERE rn = 1
            )""")
    parts.append(f"""
            SELECT query_id, corpus_id, step FROM selall{MMR_K}
            ORDER BY query_id, step""")
    return "".join(parts)


MATRYOSHKA_DIMS = 16


def matryoshka_recall_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation recall (similarity.truncated_cosine_topk;
    Kusupati et al. 2022 Matryoshka evaluation): recall@5 of cosine
    top-k over the FIRST 16 of 64 dims against full-vector top-k —
    the sizing decision for prefix-truncated embedding storage (every
    ANN scan's bytes scale with stored dims).  Integer intersection
    counts; both sides use the round-6 (sim, id) convention."""
    from hazelcast_jet_spark.operators import similarity
    from hazelcast_jet_spark.operators.similarity import truncated_cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    full = similarity.cosine_topk(e, q, k=TOPK).select("query_id", "corpus_id")
    trunc = truncated_cosine_topk(e, q, MATRYOSHKA_DIMS, k=TOPK).select(
        "query_id", "corpus_id")
    hits = trunc.join(full, ["query_id", "corpus_id"]).groupBy(
        "query_id").agg(F.count(F.lit(1)).alias("n_hits"))
    base = q.select(F.col("vec_id").alias("query_id"))
    nh = F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint")
    return (
        base.join(hits, "query_id", "left")
        .select("query_id", nh.alias("n_hits"),
                (nh.cast("double") / F.lit(float(TOPK))).alias("recall_at_k"))
        .orderBy("query_id")
    )


def embedding_standardize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization (clustering.
    embedding_standardize): one bounded moment aggregate (DIMS rows to
    the driver), map-only transform with literal constants; the gate
    verifies the standardized distribution per dim — order-free
    DECIMAL sum (~0), rounded extrema — for the first 8 dims."""
    from hazelcast_jet_spark.operators.clustering import embedding_standardize

    e = _t(spark, sf_dir, "embeddings")
    out = embedding_standardize(e)
    per = out.select(F.posexplode("std_embedding").alias("pos", "v")) \
        .filter(F.col("pos") < 8)
    return (
        per.groupBy("pos")
        .agg(F.count(F.lit(1)).alias("n"),
             # + 0.0 normalizes IEEE signed zero: round() may yield -0.0
             # on one engine and +0.0 on the other (equal under ==, but
             # different bit patterns -> different typed driver hash).
             (F.round(F.sum(F.col("v").cast("decimal(18,12)"))
                      .cast("double"), 6) + F.lit(0.0)).alias("sum_std"),
             (F.round(F.min("v"), 6) + F.lit(0.0)).alias("min_std"),
             (F.round(F.max("v"), 6) + F.lit(0.0)).alias("max_std"))
        .orderBy("pos")
    )


N_NOISE_AUDIT = 50


def knn_label_noise_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screening by neighborhood voting (clustering.
    knn_label_disagreement, the confident-learning-style signal): for
    the first 50 vectors, the fraction of their 5 cosine-nearest
    neighbors (full corpus) with a DIFFERENT label — high scores are
    the mislabeled/boundary review queue.  Neighbors use the round-6
    (sim, id) convention; the vote is one bounded aggregate."""
    from hazelcast_jet_spark.operators.clustering import knn_label_disagreement

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_NOISE_AUDIT)
    return knn_label_disagreement(e, k=TOPK, queries=q).orderBy("vec_id")


def anova_f_per_dim_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension one-way ANOVA F against the label (clustering.
    anova_f_per_dim) — which embedding dims actually separate the
    classes; ONE posexplode aggregate bounded at dims·labels rows,
    exact decimal moments, fixed-order F expression.  First 8 dims."""
    from hazelcast_jet_spark.operators.clustering import anova_f_per_dim

    e = _t(spark, sf_dir, "embeddings")
    return anova_f_per_dim(e).filter(F.col("pos") < 8).orderBy("pos")


def temporal_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup against SCD2 history — the query side
    completing the SCD2 story (build: scd2_event_type_intervals;
    maintain: scd2_incremental_merge; query: THIS): each purchase
    event joined to the user's activity state valid AT purchase time
    (``valid_from <= t < valid_to``, open interval NULL-terminated).
    One equi-join on the user with the interval residual — the
    standard warehouse point-in-time enrichment; the dimension side is
    change-points only, so it broadcasts at realistic scales.
    Purchases before any recorded state keep NULL state (left join)."""
    from hazelcast_jet_spark.operators.timeseries import (
        _epoch_seconds, scd2_intervals)

    e = _t(spark, sf_dir, "events")
    e = e.select("user_id", "event_id", "event_type",
                 _epoch_seconds(e, "ts").alias("sec"))
    dim = scd2_intervals(
        e.filter(F.col("event_type") != "purchase"),
        "user_id", "sec", "event_type", "event_id",
    ).select("user_id", F.col("event_type").alias("state"),
             "valid_from", "valid_to", "version")
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"),
        F.col("sec").alias("p_sec"))
    cond = ((facts.user_id == dim.user_id)
            & (dim.valid_from <= facts.p_sec)
            & (dim.valid_to.isNull() | (facts.p_sec < dim.valid_to)))
    return (
        facts.join(dim, cond, "left")
        .select("p_id", facts.user_id.alias("user_id"), "p_sec",
                "state", "version")
        .orderBy("p_id")
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (operators/profile.winsorize): event values clamped
    into their per-type [p5, p95] band (cut points rounded before the
    clamp — the mad_outliers determinism convention), then per-type
    stats of the clamped column: DECIMAL-exact sum + rounded extrema.
    One grouped exact-percentile pass (approx_percentile is the
    documented 100 TB path), broadcast cut points, map-only clamp."""
    from hazelcast_jet_spark.operators.profile import winsorize

    e = _t(spark, sf_dir, "events")
    out = winsorize(e.filter(F.col("value").isNotNull()), "value",
                    WINSOR_LO, WINSOR_HI, group_col="event_type")
    return (
        out.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum(F.col("value_w").cast("decimal(18,6)"))
                     .cast("double"), 4).alias("sum_w"),
             F.round(F.min("value_w"), 6).alias("min_w"),
             F.round(F.max("value_w"), 6).alias("max_w"))
        .orderBy("event_type")
    )


N_BOOT_REPS = 20


def bootstrap_ci_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap (operators/sampling.
    bootstrap_sums; Chamandy et al. 2012): 20 resampled totals of
    orders.o_totalprice in ONE aggregate pass — the error bar for any
    scan-level aggregate without a second scan or engine rand();
    md5-threshold draws make every replicate identical across reruns,
    retries and the SQL oracle."""
    from hazelcast_jet_spark.operators.sampling import bootstrap_sums

    o = _t(spark, sf_dir, "orders")
    return bootstrap_sums(o, "o_totalprice", "o_orderkey",
                          n_reps=N_BOOT_REPS).orderBy("rep")


CPMI_MIN, CPMI_TOPK = 8, 15


def collocation_pmi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by PMI (operators/text.collocations): the
    corpus's most over-represented adjacent word pairs — vocab-bounded
    bigram/unigram aggregates, broadcast joins back, fixed-order
    double quotients of exact counts with correctly-rounded ln."""
    from hazelcast_jet_spark.operators.text import collocations

    d = _t(spark, sf_dir, "documents")
    return collocations(d, min_count=CPMI_MIN, top_k=CPMI_TOPK)


def weekly_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, week) exact value percentiles — the distribution-over-
    time monitoring table (p50/p90 bands per week; the grouped-quantile
    companion of the drift gates).  Week bins are FLOOR(epoch/604800)
    over tz-free NTZ epochs; exact sort-based percentile for the gate
    (approx_percentile is the documented 100 TB path, the
    mad_outliers/winsorize convention), rounded 6dp."""
    from hazelcast_jet_spark.operators.timeseries import _epoch_seconds

    e = _t(spark, sf_dir, "events")
    wk = F.floor(_epoch_seconds(e, "ts") / F.lit(604800))
    return (
        e.filter(F.col("value").isNotNull())
        .select("event_type", wk.alias("week"), "value")
        .groupBy("event_type", "week")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
             F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"))
        .orderBy("event_type", "week")
    )


N_AUDIO_MEDIA = 40


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the gate (operators/multimodal.
    audio_features): WAV payloads are synthesized distributedly from a
    closed-form int16 signal (pure function of media_id), decoded with
    the stdlib wave codec, and the oracle recomputes n_frames/duration/
    rms/peak from the SAME formula via generate_series — equality
    proves encode→decode→feature fidelity end to end."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    from hazelcast_jet_spark.operators.multimodal import audio_features

    def synth(batches):
        for pdf in batches:
            payloads = []
            for m in pdf["media_id"]:
                n = 400 + (int(m) % 5) * 100
                pcm = np.array(
                    [((i * 37 + int(m) * 11) % 201) - 100 for i in range(n)],
                    dtype="<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(pcm.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads})

    # 40 synthetic rows — same right-sizing as multimodal_image_stats:
    # 4 partitions instead of 32 near-empty Python tasks (×2 under the
    # orderBy sampling pass)
    media = (
        spark.range(0, N_AUDIO_MEDIA, 1, 4)
        .withColumnRenamed("id", "media_id")
        .mapInPandas(synth, "media_id long, payload binary")
    )
    return audio_features(media).select(
        "media_id", "n_frames", "duration_ms", "rms", "peak"
    ).orderBy("media_id")


COSINE_DEDUP_THRESHOLD = 0.4


def embedding_cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH buckets + exact cosine
    verify (operators/similarity.cosine_dedup_pairs)."""
    from hazelcast_jet_spark.operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_dedup_pairs(
        e, _lsh_bands(), COSINE_DEDUP_THRESHOLD, max_bucket=LSH_MAX_BUCKET
    )


def filtered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filtering(pred, downstream) composition — AggregateOperations.java:
    653 ≡ SQL FILTER (WHERE): conditional aggregates in one pass."""
    l = _t(spark, sf_dir, "lineitem")
    cheap = F.col("l_extendedprice") < 10000
    return l.groupBy("l_linestatus").agg(
        F.count(agg.filtering(cheap, F.lit(1))).alias("n_cheap"),
        dsum(agg.filtering(cheap, F.col("l_quantity"))).alias("qty_cheap"),
        agg.counting().alias("n_all"),
        agg.pick_any(F.lit(1)).alias("one"),
    )


def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's in-tree benchmark workload (WordCountTest.java:
    76-135): flatMap(split) → groupingKey → counting, over documents."""
    from hazelcast_jet_spark.pipeline import Pipeline

    p = Pipeline.create(spark)
    stage = (
        p.read_from(_t(spark, sf_dir, "documents"))
        .flat_map(F.split(F.trim(F.col("text")), r"\s+"), alias="word", keep=[])
        .filter(F.length("word") > 0)
        .grouping_key("word")
        .aggregate(cnt=agg.counting())
    )
    return stage.df


def nexmark_q5_hot_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXMark Q5 shape — the reference's headline benchmark (BASELINE.md;
    site blog 2021-03-17): hot items per sliding window = count by key per
    window, then top-3 keys per window.  Sliding window via Spark's
    window(size, slide); ranking via one shuffle on window_start."""
    e = _t(spark, sf_dir, "events")
    counts = (
        e.groupBy(F.window("ts", "2 hours", "1 hour"), "user_id")
        .agg(agg.counting().alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id", "n",
        )
    )
    return joins.top_n_rows(
        counts, 3, ["window_start"], [F.col("n").desc(), F.col("user_id").asc()], rank_col="rnk"
    )


def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming: readStream over events → tumbling window
    agg → availableNow to completion (complete mode ⇒ deterministic on
    bounded input).  SURVEY §2.8; run_to_batch in streaming/run.py.
    State bound: one row per hour window — calendar-bounded, and
    watermark-evicted in production append mode."""
    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

    e = read_stream_table(spark, sf_dir, "events")
    windowed = (
        e.groupBy(F.window("ts", "1 hour"))
        .agg(agg.counting().alias("n_events"), dsum("value").alias("sum_value"))
    )
    out = run_to_batch(windowed, "complete")
    return out.select(
        F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events", "sum_value",
    )


def streaming_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed mapStateful on a real stream (applyInPandasWithState, update
    mode): per-user running count; the final (max) emission per key equals
    the total regardless of micro-batch boundaries.
    Reference: TransformStatefulP.java:48-151.  State bound: one counter
    row per user — user-bounded (TTL-evictable via the operator's
    EventTimeTimeout path)."""
    import pandas as pd

    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch
    from hazelcast_jet_spark.streaming.stateful import map_stateful_stream

    e = read_stream_table(spark, sf_dir, "events").select("user_id", "event_id")

    def count_fn(key, pdfs, state):
        (cnt,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            cnt += len(pdf)
        state.update((cnt,))
        yield pd.DataFrame({"user_id": [key[0]], "cnt": [cnt]})

    counted = map_stateful_stream(
        e, ["user_id"], count_fn,
        output_schema="user_id bigint, cnt bigint",
        state_schema="cnt bigint",
        output_mode="update",
    )
    # bound the state-partition count while this query runs: each state
    # partition spawns a Python worker, and a default of 200 partitions
    # for ~150 keys is pure overhead (restored afterwards)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        out = run_to_batch(counted, "update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.groupBy("user_id").agg(F.max("cnt").alias("n_events"))


#: IVF config: 8 deterministic ±1 centroids (seed distinct from the LSH
#: bands), probe the 2 nearest inverted lists per query
IVF_N_CENTROIDS = 8
IVF_NPROBE = 2
RERANK_C = 50  # ADC shortlist size fed to the exact re-rank (ann_recall)
_IVF_CENTROIDS = None


def _ivf_centroids():
    global _IVF_CENTROIDS
    if _IVF_CENTROIDS is None:
        from hazelcast_jet_spark.operators.similarity import banded_hyperplanes
        _IVF_CENTROIDS = banded_hyperplanes(1, IVF_N_CENTROIDS, 64, seed=13)[0]
    return _IVF_CENTROIDS


def ivf_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probe search (operators/similarity.ivf_topk): coarse-quantize
    the corpus to 8 centroids, probe the 2 nearest lists per query, exact
    cosine re-rank inside them."""
    from hazelcast_jet_spark.operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.ivf_topk(e, q, _ivf_centroids(), k=TOPK, nprobe=IVF_NPROBE)


def ndcg_ivf_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k of the IVF probe ranking against exact cosine top-k
    (similarity.ndcg_at_k; Järvelin & Kekäläinen 2002): the order-aware
    companion of q:ann_recall_ivf_pq — recall counts retrieved
    neighbors, NDCG penalizes retrieving them in the wrong order, with
    top positions weighted hardest.  Grades derive from the exact
    ranking (k−rank+1); discounts and ideal-DCG denominators are
    Python-computed literals (no engine logs); per-query DCG terms are
    DECIMAL-accumulated.  The exact leg is the measurement baseline and
    says so (the ann_recall convention)."""
    from hazelcast_jet_spark.operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    truth = similarity.cosine_topk(e, q, k=TOPK)
    cand = similarity.ivf_topk(e, q, _ivf_centroids(), k=TOPK,
                               nprobe=IVF_NPROBE)
    return similarity.ndcg_at_k(cand, truth, k=TOPK)


def ivf_staleness_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index freshness report (similarity.ivf_index_staleness, r8
    verdict #7): per centroid, member count, mean assignment distance
    and the drift of the list's true mean from the stored centroid —
    the recluster-when-needed signal an incrementally-upserted ANN
    index (similarity.ivf_index_upsert) runs instead of a timer.  ONE
    exploded scan folds both statistics; DECIMAL(38,9) accumulation
    keeps the scaled sums under 2^53 so the decimal→double cast is
    engine-stable."""
    from hazelcast_jet_spark.operators.similarity import (
        ivf_assign, ivf_index_staleness)

    e = _t(spark, sf_dir, "embeddings")
    cents = _ivf_centroids()
    return ivf_index_staleness(ivf_assign(e, cents), cents)


def pq_staleness_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook freshness report (similarity.pq_codebook_staleness,
    r9 verdict #4 — the ANN lane's last build-once artifact): per
    subspace, the mean quantization error of training-era vs upserted
    vectors and the re-fit flag at ratio > 1.5 — the "re-fit the
    codebooks or keep upserting?" signal the incremental IVF-PQ index
    (similarity.ivf_pq_upsert) runs instead of a timer.  The upsert
    cohort is the deterministic vec_id % 3 slice; the error expression
    is pq_encode's own rounded-9 L2 argmin, so what is measured is
    exactly the error the index carries.  ONE exploded scan (m·n
    bounded rows), DECIMAL(38,9)-exact sums."""
    from hazelcast_jet_spark.operators.similarity import (
        pq_codebook_staleness)

    e = _t(spark, sf_dir, "embeddings")
    return pq_codebook_staleness(e, _pq_fixed_codebooks(),
                                 F.col("vec_id") % 3 == 0)


#: index_health gated config: retraction predicate + compaction cadence
IDXH_TOMB_MOD = 50
IDXH_COMPACT_EPOCHS = 8
IDXH_N_EPOCHS = 3
#: sf-tags whose health-report indexes this process already built: the
#: health scan is the operator under test; a production health check
#: runs against the EXISTING index, so the deterministic build is
#: once-per-process setup, not part of every (warm-bench) run
_IDXH_READY: set = set()


def index_health_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified index-maintenance health table (operators/index_health.
    index_health, r10 verdict #4): ONE report over a persisted IVF-PQ
    index (built from the 2/3 training cohort, upserted with the
    vec_id%3==0 cohort — the pq_staleness_emb convention) and a
    co-maintained 3-epoch LSH dedup index with a pending retraction —
    per-component drift metric, threshold, and recommended action
    (recluster / refit / compact) in one scan each.  The IVF and PQ
    numbers are the standalone operators' own (pinned equal in
    tests/test_index_health.py); the LSH rows are the epoch-directory
    and pending-tombstone counts the compactor pages on.  The oracle
    replays the drift math from the base tables (index build is a pure
    function of them — the upsert==rebuild pin) and predicts the LSH
    counters from the deterministic construction.  The build itself is
    once-per-process SETUP (a production health check pages against the
    EXISTING index; rebuilding it per check would defeat the point), so
    the warm-bench reading measures the health scan alone."""
    import tempfile

    from hazelcast_jet_spark.operators.index_health import index_health
    from hazelcast_jet_spark.operators.similarity import (ivf_pq_build,
                                                          ivf_pq_upsert)

    e = _t(spark, sf_dir, "embeddings")
    d = _t(spark, sf_dir, "documents")
    tag = os.path.basename(os.path.normpath(sf_dir))
    ann_path = os.path.join(tempfile.gettempdir(),
                            f"spark_graft_annhealth_{tag}")
    lsh_path = os.path.join(tempfile.gettempdir(),
                            f"spark_graft_lshhealth_{tag}")
    cents = _ivf_centroids()
    books = _pq_fixed_codebooks()
    if tag not in _IDXH_READY:
        ivf_pq_build(e.filter(F.col("vec_id") % 3 != 0), cents, books,
                     ann_path)
        ivf_pq_upsert(e.filter(F.col("vec_id") % 3 == 0), cents, books,
                      ann_path)
        for epoch in range(IDXH_N_EPOCHS):
            dedup.minhash_index_build(
                d.filter(F.col("doc_id") % IDXH_N_EPOCHS == epoch), lsh_path,
                num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS, k=SHINGLE_K,
                mode="overwrite", epoch=epoch)
        dedup.minhash_index_retract(
            d.filter(F.col("doc_id") % IDXH_TOMB_MOD == 0).select("doc_id"),
            lsh_path, epoch=IDXH_N_EPOCHS - 1)
        _IDXH_READY.add(tag)
    return index_health(spark, ann_path, cents, books,
                        F.col("vec_id") % 3 == 0,
                        lsh_index_path=lsh_path,
                        lsh_compact_epochs=IDXH_COMPACT_EPOCHS)


def kappa_langid_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (profile.cohen_kappa) between the labeled lang
    column and the stopword-ratio language-ID heuristic — the ONE
    chance-corrected number behind q:langid_confusion_docs' matrix
    (raw agreement flatters a majority-class predictor; kappa doesn't).
    One K×K cell aggregate; po/pe/kappa are fixed-order doubles on
    exact counts."""
    from hazelcast_jet_spark.operators.profile import cohen_kappa
    from hazelcast_jet_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    pred = d.select(F.col("lang").alias("a"),
                    lang_id("text").alias("b"))
    return cohen_kappa(pred, "a", "b")


PW_SEED = "pw1"
#: repr round-trips the exact doubles, so the oracle parses the same bits
from hazelcast_jet_spark.operators.experiment import (  # noqa: E402
    Z_ALPHA_0_05 as _Z_ALPHA, Z_POWER_0_80 as _Z_POWER)
Z_ALPHA_SQL = repr(_Z_ALPHA)
Z_POWER_SQL = repr(_Z_POWER)


def experiment_power_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc power analysis (experiment.ab_power_mde): the minimum
    detectable effect at the realized md5-split arm sizes with
    any-URGENT-order conversion as the metric — the "could this test
    even see the lift we care about?" readout that gates
    q:cuped_experiment_orders / ab z-tests.  One per-customer rollup +
    one collected 2-row aggregate; closed-form MDE on exact counts."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          ab_power_mde)

    o = _t(spark, sf_dir, "orders")
    units = (o.groupBy("o_custkey")
             .agg(F.max((F.col("o_orderpriority") == "1-URGENT")
                        .cast("int")).alias("conv")))
    units = units.withColumn("arm", ab_assign(F.col("o_custkey"), PW_SEED))
    return ab_power_mde(units, "arm", "conv")


def tokenizer_fertility_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per source: BPE-ish subword tokens per
    whitespace word and bytes per subword token — the budgeting curve
    that prices a source in TOKENS before training (fertility >> 1
    flags scripts/markup the tokenizer fragments).  Map-only feature
    extraction (text.regex_token_count / token_count / octet_length),
    one per-source aggregate of exact counts."""
    from hazelcast_jet_spark.operators.text import (regex_token_count,
                                                    token_count)

    d = _t(spark, sf_dir, "documents")
    f = d.select(
        "source",
        token_count("text").cast("bigint").alias("__w"),
        regex_token_count("text").cast("bigint").alias("__s"),
        F.octet_length("text").cast("bigint").alias("__b"))
    r6 = lambda num, den: (F.round(num.cast("double")  # noqa: E731
                                   / den.cast("double"), 6) + F.lit(0.0))
    return (f.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__w").alias("n_words"),
                 F.sum("__s").alias("n_subtokens"),
                 F.sum("__b").alias("n_bytes"))
            .select("source", "n_docs", "n_words", "n_subtokens", "n_bytes",
                    r6(F.col("n_subtokens"),
                       F.col("n_words")).alias("fertility"),
                    r6(F.col("n_bytes"),
                       F.col("n_subtokens")).alias("bytes_per_subtoken"))
            .orderBy("source"))


def dup_rate_by_length_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE dedup bites: exact-duplicate rate per document-length
    decile (fingerprint membership corpus-wide, ntile over (chars,
    doc_id)) — short boilerplate docs dominate dup mass, and this curve
    is the evidence.  ntile runs on the scalar (chars, id) projection
    (the rfm_segments single-pass convention — swap for precomputed
    quantile edges beyond ~10^8 docs)."""
    from hazelcast_jet_spark.operators.text import fingerprint

    d = _t(spark, sf_dir, "documents")
    f = d.select("doc_id", F.length("text").alias("__chars"),
                 fingerprint("text").alias("__fp"))
    fpc = Window.partitionBy("__fp")
    flagged = f.withColumn(
        "__dup", (F.count(F.lit(1)).over(fpc) > 1).cast("int"))
    wd = Window.orderBy("__chars", "doc_id")
    t = flagged.withColumn("decile", F.ntile(10).over(wd))
    n = F.count(F.lit(1))
    return (t.groupBy("decile")
            .agg(n.alias("n_docs"),
                 F.sum("__dup").cast("bigint").alias("n_dups"),
                 (F.round(F.sum("__dup").cast("double")
                          / n.cast("double"), 6)
                  + F.lit(0.0)).alias("dup_rate"),
                 (F.round(F.sum("__chars").cast("double")
                          / n.cast("double"), 6)
                  + F.lit(0.0)).alias("mean_chars"))
            .orderBy("decile"))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (operators/multimodal.frame_sample_plan):
    sample timestamps derive from DURATION METADATA only — column pruning
    keeps the heavy payload column out of the scan until decode."""
    from hazelcast_jet_spark.operators.multimodal import frame_sample_plan

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        (F.col("n_chars") % 5000 + 1000).cast("int").alias("duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000)


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-way join + filtered agg + top-10 —
    the classic join-ordering/pushdown benchmark shape, here with the
    customer filter broadcast and TakeOrdered top-k."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                "o_orderpriority")
    )


def reducing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reducing(emptyAcc, toAcc, combine) — AggregateOperations.java:1209:
    arbitrary fold via F.aggregate over collected items.  Both folds here
    are commutative + associative (int add, xor), so accumulation order —
    nondeterministic in Jet and Spark alike — cannot change the result."""
    l = _t(spark, sf_dir, "lineitem")
    qty_sum = agg.reducing(0, F.col("l_quantity").cast("int"), lambda a, x: a + x)
    key_xor = agg.reducing(
        F.lit(0).cast("bigint"), "l_orderkey", lambda a, x: a.bitwiseXOR(x)
    )
    return l.groupBy("l_returnflag").agg(
        qty_sum.alias("qty_sum"), key_xor.alias("key_xor")
    )


def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ 2 via the rotated-band probe
    (operators/dedup.simhash_near_dup_pairs): pigeonhole over d+1 signature
    bands, bit_count(xor) verify."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_dup_pairs(d, bits=SIMHASH_BITS, hamming=2)


def map_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """toMap(keyFn, valFn) — AggregateOperations.java:844: per-nation map
    of mktsegment → customer count (pre-aggregated per key, so values are
    deterministic), serialized as to_json of the key-sorted map for the
    gate (map columns themselves don't canonicalize)."""
    c = _t(spark, sf_dir, "customer")
    per = c.groupBy("c_nationkey", "c_mktsegment").agg(agg.counting().alias("n"))
    return per.groupBy("c_nationkey").agg(
        F.to_json(agg.to_map_sorted("c_mktsegment", "n")).alias("seg_counts")
    )


def custom_udaf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom AggregateOperation via the builder (AggregateOperation.java:
    87-138, AggregateOperationBuilder.java): a pandas-UDAF alternating key
    sum per nation — exact integer arithmetic so the oracle hash matches."""
    c = _t(spark, sf_dir, "customer")
    op = (
        agg.AggregateOperation.with_create(lambda: 0)
        .and_accumulate(
            lambda acc, pdf: acc
            + int(((pdf["c_custkey"] % 2 * 2 - 1) * pdf["c_custkey"]).sum())
        )
        .and_finish(lambda acc: acc)
    )
    return agg.aggregate_custom(
        c.select("c_nationkey", "c_custkey"), ["c_nationkey"],
        {"alt_sum": op}, "c_nationkey int, alt_sum long",
    )


def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows on a REAL stream (SessionWindowP.java:79 merge
    semantics ≡ Spark's session_window state merge; complete mode on
    bounded input ⇒ deterministic final sessions).  State bound: one
    row per (user, merged session) — user×activity-bounded, and
    watermark-evictable in production append mode."""
    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

    e = read_stream_table(spark, sf_dir, "events")
    # complete mode needs no watermark (every session re-emitted at the
    # end), which also sidesteps watermark-on-NTZ; append-mode sessions
    # would need a true TIMESTAMP event-time column (pipeline.add_timestamps)
    windowed = (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(agg.counting().alias("n_events"))
    )
    out = run_to_batch(windowed, "complete")
    return out.select(
        F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "user_id", "n_events",
    )


def streaming_rolling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rollingAggregate on a real stream, JVM path (StreamStageWithKey.java:
    296): update-mode groupBy().agg(count) — running value in the JVM state
    store, zero Python workers (the scale-safe routing for simple rolling
    aggregates; applyInPandasWithState stays for custom state, see
    streaming_stateful_count).  The last update per key is the total."""
    from hazelcast_jet_spark.pipeline import Pipeline
    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

    e = read_stream_table(spark, sf_dir, "events").select("user_id", "event_id")
    p = Pipeline.create(spark)
    stage = (
        p.read_from(e)
        .grouping_key("user_id")
        .rolling_aggregate(agg.counting(), name="n_events")
    )
    # state-store partitions are per-query fixed at plan time; ~1.5k keys
    # don't need 32 (restored afterwards)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_to_batch(stage.df, "update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/joins.asof_join) — each purchase
    event enriched with the user's most recent click value at-or-before
    the purchase time.  One sort-merge window over (user, ts), no range
    join (the time-series enrichment join Spark lacks natively; DuckDB
    ASOF JOIN is the oracle twin)."""
    from hazelcast_jet_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join(purchases, clicks, "user_id", "ts", value_cols=["value"])
    return out.select(
        "event_id", "user_id",
        F.col("value").alias("purchase_value"),
        F.col("asof_value").alias("last_click_value"),
    )


def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): the 6-table join with the
    customer-and-supplier-in-same-nation equi-constraint — the classic
    join-ordering benchmark.  Dimensions (nation⨝region) broadcast; the
    only real shuffles are the two fact joins + final agg."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def pivot_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): customer counts per nation × market
    segment as columns — Spark's pivot with an EXPLICIT value list (an
    implicit list would add a distinct-scan job and nondeterministic
    column order).  Absent combos coalesce to 0 like SQL FILTER counts."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = _t(spark, sf_dir, "customer")
    p = c.groupBy("c_nationkey").pivot("c_mktsegment", segs).count()
    return p.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in segs],
    )


def corr_covar_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance per event type, built
    from exact decimal-accumulated moments (the linear_trend pattern —
    order-independent, so Spark and the oracle agree bit-for-bit; the
    built-in F.corr would combine doubles in partition order)."""
    e = _t(spark, sf_dir, "events")
    x = (F.col("event_id") % 1000).cast("double")
    y = F.col("value")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"), dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"), dsum(x * x).alias("sxx"), dsum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round((n * sxy - sx * sy)
                / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 6).alias("corr_xy"),
        F.round(sxy / n - (sx / n) * (sy / n), 6).alias("covar_pop_xy"),
    )


def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface (ToConverters/EXTRACT parity): component
    extraction, truncation, day arithmetic — all engine-portable forms."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias("days_since_95"),
    )


def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order-function surface over the embedding column:
    size/element_at/slice/array_max + a transform-aggregate fold (sum of
    squares) — the JVM-side vector-math building blocks the similarity
    operators compose (zip_with/aggregate, SNIPPETS §higher-order)."""
    e = _t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(v, 1).alias("first_elem"),
        F.element_at(v, -1).alias("last_elem"),
        F.array_max(v).alias("max_elem"),
        F.array_min(v).alias("min_elem"),
        F.round(F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6).alias("head8_sum"),
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x), 6).alias("ssq"),
    )


def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame surface beyond rank functions: lag/lead, running and
    sliding frame sums, first_value — per order, line-number order.
    (l_quantity is integral-valued, so double frame sums are exact in any
    accumulation order.  The synthetic lineitem duplicates (orderkey,
    linenumber), so the order key is widened to the unique
    (linenumber, partkey, suppkey, qty) tuple — deterministic frames.)"""
    from pyspark.sql.window import Window as W

    l = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", F.col("l_quantity").cast("bigint")
    )
    wr = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    w3 = w.rowsBetween(-2, W.currentRow)
    return l.select(
        "l_orderkey", "l_linenumber",
        F.lag("l_quantity", 1).over(w).alias("prev_qty"),
        F.lead("l_quantity", 1).over(w).alias("next_qty"),
        F.sum("l_quantity").over(wr).alias("run_qty"),
        F.sum("l_quantity").over(w3).alias("qty3"),
        F.first("l_quantity").over(wr).alias("first_qty"),
    )


def streaming_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication (dropDuplicates on a real stream — the
    watermark-bounded state dedup; reference distinct ≡ DistinctP on a
    stream): distinct (user, event_type) pairs counted per type.  The
    stream result equals the batch DISTINCT regardless of micro-batch
    boundaries because state outlives batches.  State bound: one row
    per distinct (user, event_type) pair — the streaming-exact-dedup
    class, user-bounded (withWatermark + dropDuplicatesWithinWatermark
    is the unbounded-key production variant)."""
    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

    e = read_stream_table(spark, sf_dir, "events").select("user_id", "event_type")
    deduped = e.dropDuplicates(["user_id", "event_type"])
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_to_batch(deduped, "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_user_types"))


def cep_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern match (reference examples/pattern-matching,
    there a keyed-mapStateful state machine): per-user strict-contiguity
    view→view→click within 1 day, as lead() window functions — one
    shuffle, all JVM (operators/cep.py)."""
    from hazelcast_jet_spark.operators.cep import match_sequence

    e = _t(spark, sf_dir, "events")
    out = match_sequence(
        e, ["view", "view", "click"], key="user_id", within="1 DAY"
    )
    return out.select(
        "user_id", "start_event_id", "end_event_id",
        F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format("end_ts", "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-5 terms per document (reference examples/tf-idf, the
    flagship fork/join DAG demo): normalize→explode→two aggs→broadcast
    N join (operators/text.tf_idf); multiplicative idf keeps the score
    IEEE-exact for the hash gate."""
    from pyspark.sql import Window
    from hazelcast_jet_spark.operators.text import tf_idf

    d = _t(spark, sf_dir, "documents")
    scored = tf_idf(d, "doc_id", "text")
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf_idf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tf", "df", "tf_idf")
    )


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sampling (training-data mix
    balancing; operators/sampling.py): md5-keyed membership — map-only,
    reproducible, partitioning-independent, oracle-identical."""
    from hazelcast_jet_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        d, key_col="doc_id", stratum_col="lang",
        rates={"en": 0.25, "de": 0.8, "fr": 0.8, "es": 0.5, "zh": 0.5},
        default_rate=0.1, seed="s42-",
    )
    return out.select("doc_id", "lang", "source", "n_chars")


def reservoir_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k deterministic reservoir per stratum (operators/
    sampling.reservoir_sample): 5 uniform events per event_type, ranked
    by key hash — one shuffle on the stratum."""
    from hazelcast_jet_spark.operators.sampling import reservoir_sample

    e = _t(spark, sf_dir, "events")
    out = reservoir_sample(e, k=5, key_col="event_id",
                           stratum_col="event_type", seed="r7-")
    return out.select("event_type", "event_id", "user_id")


def nexmark_q8_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXMark Q8 shape (monitor new users: persons ⨝ auctions in a
    window) on a REAL stream-stream join: each user's signup events
    joined to their purchases within 12 hours after signup — event-time
    interval join (Spark extension; the reference has no stream-stream
    join).  No watermark: TIMESTAMP_NTZ event time can't carry one, and
    under availableNow on bounded input none is needed (state is dropped
    when the run completes); an unbounded deployment would keep ts as
    TIMESTAMP and add watermarks on both legs for state cleanup.  Result
    is micro-batch-independent: inner interval joins emit exactly the
    rows the batch join would."""
    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

    e = read_stream_table(spark, sf_dir, "events")
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("s_ts"),
        F.col("event_id").alias("s_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 12 HOUR")),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_to_batch(joined, "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select(
        F.col("s_user").alias("user_id"), "s_id", "p_id",
        F.date_format("s_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


def streaming_interval_join_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join with dual event-time
    watermarks (Spark extension; the reference has no stream-stream
    join): signups left-joined to purchases within 12 h, unmatched
    signups flushing as null-extended rows once the watermark passes
    their interval.  Event time is rebuilt as ``timestamp_seconds`` of
    integer epoch seconds derived from the NTZ column with pure
    timestamp arithmetic (``timestampdiff`` against the NTZ epoch), so
    watermarks work on instants and the whole query is
    session-timezone-independent.

    Determinism armor: Spark flushes an unmatched left row when the
    final watermark passes its interval end, and the final watermark of
    a bounded run is min(max event time per leg).  Rows whose interval
    end falls within 1 h of that boundary are excluded on BOTH sides
    (a batch post-filter here, the same arithmetic in the oracle), so
    the result is identical under either strict/non-strict eviction —
    the gate never rides the engine's internal boundary convention.
    State at 100 TB: both legs keyed on user, watermark-bounded state,
    single-shuffle symmetric hash join — the streaming twin of
    operators/joins.interval_overlap_pairs."""
    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

    sec = F.floor(F.expr(
        "timestampdiff(MICROSECOND, "
        "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), ts)") / F.lit(1e6))
    e = read_stream_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", sec.alias("sec"),
        F.timestamp_seconds(sec).alias("ets"))
    signups = (
        e.filter(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"),
                F.col("event_id").alias("s_id"),
                F.col("sec").alias("s_sec"),
                F.col("ets").alias("s_ets"))
        .withWatermark("s_ets", "0 seconds"))
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"),
                F.col("event_id").alias("p_id"),
                F.col("sec").alias("p_sec"),
                F.col("ets").alias("p_ets"))
        .withWatermark("p_ets", "0 seconds"))
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ets") >= F.col("s_ets"))
        & (F.col("p_ets") <= F.col("s_ets") + F.expr("INTERVAL 12 HOUR")),
        "left_outer",
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_to_batch(joined, "append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # final watermark = min over legs of max event time (0 s delay),
    # computed batch-side from the same table
    b = _t(spark, sf_dir, "events")
    bsec = F.floor(F.expr(
        "timestampdiff(MICROSECOND, "
        "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), ts)") / F.lit(1e6))
    wm_row = (
        b.select("event_type", bsec.alias("sec"))
        .filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("event_type").agg(F.max("sec").alias("mx"))
        .agg(F.min("mx").alias("wm")).first())
    wm = int(wm_row["wm"])
    keep = F.col("p_id").isNotNull() | (
        F.col("s_sec") + F.lit(43200) < F.lit(wm - 3600))
    return (
        out.filter(keep)
        .select(F.col("s_user").alias("user_id"), "s_id", "s_sec",
                "p_id", "p_sec")
        .orderBy("s_id", "p_id")
    )


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): HAVING-filtered semi-join of
    a grouped fact against itself — the aggregate-then-join-back
    pattern.  The qualifying-orders set is tiny → broadcast."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey").agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
        .select(F.col("l_orderkey").alias("qual_okey"))
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("qual_okey"))
        .join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice", "total_qty",
        )
    )


def cep_stream_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING event-sequence match (operators/cep.match_sequence_stream
    — the applyInPandasWithState per-key state machine, the reference
    example's actual shape): signup immediately followed by purchase
    within 1 day, on a real stream.  Emits the same rows as the batch
    lead()-window operator (the oracle)."""
    from hazelcast_jet_spark.operators.cep import match_sequence_stream
    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

    e = read_stream_table(spark, sf_dir, "events")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        out = run_to_batch(
            match_sequence_stream(e, ["signup", "purchase"], within="1 DAY"),
            "append",
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select(
        "user_id", "start_event_id", "end_event_id",
        F.date_format("start_ts", "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format("end_ts", "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
    )


def nexmark_q4_avg_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXMark Q4 shape (average closing price per category): per-user
    max purchase value in each 6-hour window, averaged per event-type-
    category — windowed agg feeding a second agg."""
    e = _t(spark, sf_dir, "events")
    closing = (
        e.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.window("ts", "6 hours"), "event_type", "user_id")
        .agg(F.max("value").alias("close_max"))
    )
    return (
        closing.groupBy("event_type")
        .agg(dsum("close_max").alias("sum_close"),
             F.count(F.lit(1)).alias("n_windows"))
        .select("event_type", "sum_close", "n_windows")
    )


def nexmark_q7_window_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXMark Q7 (highest bid per period): the max-value event of every
    1-hour window, with ties broken by event_id — windowed max + join
    back, the classic argmax-in-window."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy(F.window("ts", "1 hour")).orderBy(
        F.col("value").desc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.date_format(F.window("ts", "1 hour").start,
                          "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_id", "user_id", "value",
        )
    )


def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure filter + single
    aggregate — every predicate pushes into the parquet scan, zero
    joins, one partial+final agg."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
             F.count(F.lit(1)).alias("n_rows"))
    )


def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional-aggregate ratio over a
    fact⨝dim join — part is the broadcast side; the CASE folds into the
    same partial aggregation pass."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01"))
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)).alias("promo_rev"),
            dsum(rev).alias("total_rev"),
        )
        .select(
            "promo_rev", "total_rev",
            (F.lit(100.0) * F.col("promo_rev") / F.col("total_rev")).alias("promo_pct"),
        )
    )


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (similarity.quantize_int8):
    4× smaller vectors for ANN candidate stages; map-only JVM
    higher-order functions; explicit floor(+0.5) rounding so the oracle
    agrees bit-for-bit.  Output: per-vector scale + quantized codes."""
    from hazelcast_jet_spark.operators.similarity import quantize_int8

    e = _t(spark, sf_dir, "embeddings")
    qs = quantize_int8(F.col("embedding").cast("array<double>"))
    return e.select(
        "vec_id",
        qs["scale"].alias("scale"),
        F.concat_ws(",", qs["q"]).alias("codes"),
    )


def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/joins.range_join — the interval-containment
    join the brief names): events bucketed into overlapping value bands
    via bin-explode + EQUI-join (never a cartesian/BNLJ; plan pinned in
    tests).  Bands overlap so a point can land in two."""
    from hazelcast_jet_spark.operators.joins import range_join

    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    bands = spark.createDataFrame(
        [(i, float(i * 40), float(i * 40 + 60)) for i in range(13)],
        "band_id int, lo double, hi double",
    )
    out = range_join(e, bands, "value", "lo", "hi", bin_width=40.0)
    return (
        out.groupBy("band_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select("band_id", "n_events", "sum_value")
    )


def continuous_aggregate_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate (streaming/rollup.py): a
    REAL stream materialized incrementally into a keyed parquet table —
    update-mode upserts of only the touched windows per micro-batch —
    then read back.  Oracle: the batch windowed aggregation."""
    import tempfile

    from hazelcast_jet_spark.streaming.rollup import continuous_aggregate, read_rollup
    from hazelcast_jet_spark.streaming.run import read_stream_table

    work = tempfile.mkdtemp(prefix="gate-rollup-")
    stream = read_stream_table(spark, sf_dir, "events")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = continuous_aggregate(
            stream, f"{work}/tbl", "1 day", keys=["event_type"],
            aggs={"n_events": F.count(F.lit(1)), "sum_value": dsum("value")},
            checkpoint=f"{work}/ckpt", num_buckets=8,
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return read_rollup(spark, f"{work}/tbl", ["window_start", "event_type"], 8)


def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): revenue lost to returned
    lineitems per customer over a quarter, top 20 — fact⨝fact join with
    broadcast dims and TakeOrdered top-k."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
    )


def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketch (operators/sketch.py — the brief's 'novel
    sketch'): deterministic md5-based k-minimum-values cardinality
    estimate per event_type, next to the exact count.  Unlike HLL the
    estimate is engine-portable bit-for-bit, so it sits under the exact
    hash gate.  Uses the SHARDED two-level build (the 100 TB path: no
    aggregation state ever holds a whole group's distinct hashes); its
    sketch is bit-identical to the single-level one, so the oracle is
    unchanged."""
    from hazelcast_jet_spark.operators.sketch import (
        kmv_distinct_sharded, kmv_estimate)

    e = _t(spark, sf_dir, "events")
    k = 32
    sk = kmv_distinct_sharded(e, ["event_type"], "user_id", k=k, num_shards=8)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct"))
    return (
        sk.join(exact, "event_type")
        .select(
            "event_type",
            kmv_estimate(F.col("sk"), k).alias("kmv_estimate"),
            "exact_distinct",
        )
    )


def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): EXISTS correlated subquery
    with a non-equi residual — planned as a LEFT SEMI join, so the lineitem
    side is reduced before the agg and no full fact x fact join exists."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01"))
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi")
    return (
        late.groupBy("o_orderpriority")
        .agg(agg.counting().alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    with an ON-clause filter, then a two-level aggregate.  First groupBy
    shuffles on c_custkey; second is over <=200 distinct counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, (c.c_custkey == o.o_custkey)
               & (o.o_orderpriority != "1-URGENT"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(agg.counting().alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): NOT IN anti-join
    against a tiny excluded-supplier list (broadcast anti) + count distinct
    per (brand, type)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    l = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
        .limit(20)
    )


def tpch_q22_missing_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar subquery threshold
    (decimal-exact avg so both engines agree bit-for-bit) + NOT EXISTS
    anti-join, grouped by nation.  The NOT EXISTS side is restricted to
    recent orders so the result is non-trivially populated (classic Q22
    'no orders at all' is empty on this dataset — every rich customer has
    ordered at some point)."""
    c = _t(spark, sf_dir, "customer")
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey"))
    pos = c.filter(F.col("c_acctbal") > 0)
    thresh = pos.agg(
        (dsum("c_acctbal") / F.count(F.lit(1))).alias("ab"))
    rich = c.join(F.broadcast(thresh)).filter(F.col("c_acctbal") > F.col("ab"))
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            agg.counting().alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.decontaminate): corpus
    docs sharing >=3 distinct word 3-shingles with the held-out benchmark
    slice (doc_id % 50 == 0).  Benchmark shingle set is broadcast — the
    corpus is never shuffled to find contamination."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0)
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    return dedup.decontaminate(
        corpus, bench, k=SHINGLE_K, min_overlap=3
    ).orderBy("doc_id")


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.pack_concat): documents laid
    end-to-end per source in doc_id order; a doc belongs to the 512-token
    bin its first token lands in.  Pure integer window arithmetic — one
    shuffle, engine-exact.  Returns per-bin occupancy."""
    from hazelcast_jet_spark.operators import packing

    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", text.token_count("text").alias("tok"))
    packed = packing.pack_concat(
        d, token_col="tok", budget=512, order_col="doc_id",
        partition_cols=["source"])
    return (
        packing.pack_stats(packed, "tok", ["source"])
        .orderBy("source", "bin_id")
    )


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): correlated MIN subquery,
    decorrelated the Spark way — per-(part,supplier) agg, then a window
    MIN over the part and an equality filter.  No partsupp table in this
    dataset, so lineitem serves as the part-supplier relation with unit
    price l_extendedprice/l_quantity (exact per-row double arithmetic)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 30)
    s = _t(spark, sf_dir, "supplier")
    pc = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = (
        pc.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
    )


def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated AVG
    subquery — per-part decimal-exact average joined back, rows below
    20% of their part's average quantity.  The brand filter is applied
    BEFORE the per-part aggregate (only filtered parts' averages are
    computed — semi-join pushdown the classic plan misses)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand").isin("Brand#1", "Brand#2"))
    lp = l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
    avg_qty = (
        lp.groupBy("l_partkey")
        .agg((dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"))
    )
    return (
        lp.join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
             agg.counting().alias("n_rows"))
    )


def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS +
    NOT EXISTS against the same fact with an inequality on the supplier
    key — planned as one semi and one anti join, never a cartesian.
    'Late' is adapted to this schema: shipped >60 days after the order
    date on a finished ('F') order."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    items = l.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    late = items.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    l1 = late.select("l_orderkey", "l_suppkey")
    other = items.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp"))
    other_late = late.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp"))
    waiting = (
        l1.join(other, (l1.l_orderkey == other.o_key)
                & (l1.l_suppkey != other.o_supp), "left_semi")
        .join(other_late, (l1.l_orderkey == other_late.o_key)
              & (l1.l_suppkey != other_late.o_supp), "left_anti")
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(agg.counting().alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): disjunctive OR-of-ANDs
    predicate spanning both join sides — Catalyst pushes the common
    p_brand/p_size disjuncts to the part scan and keeps the mixed
    residual on the join; one broadcast join, one agg."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(10, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(20, 40)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        agg.counting().alias("n_rows"),
    )


def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): nested IN subqueries —
    parts by name pattern → their 1996 lineitems → suppliers moving more
    than a decimal-exact quantity threshold → semi-join back to supplier."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
    red_parts = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")).select("p_partkey")
    movers = (
        l.join(F.broadcast(red_parts), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 200)
    )
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bidirectional nation-pair filter
    via two broadcast nation joins + per-year revenue.  The nation-pair
    disjunction runs after both (tiny) dim joins; the two facts join on
    their keys."""
    pair = ("NATION_1", "NATION_2")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
    # shrink BOTH facts through the two-nation dims before the fact x fact
    # join: suppliers/customers outside the pair never reach the shuffle
    n1 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
    o = _t(spark, sf_dir, "orders").join(
        F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    j = (
        l.join(F.broadcast(s), l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == F.col("o_orderkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    )
    return (
        j.groupBy("supp_nation", "cust_nation",
                  F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): share = one nation's
    revenue over total revenue per year inside a region — a ratio of two
    decimal-exact sums, so the double division is bit-identical across
    engines."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n_c = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_s = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_c), c.c_nationkey == n_c.n_nationkey)
        .join(F.broadcast(r), n_c.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (dsum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(0.0))
             / dsum(vol)).alias("mkt_share"),
            agg.counting().alias("n_rows"),
        )
        .orderBy("o_year")
    )


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier nation
    per year.  No partsupp table, so supply cost is modeled as 10% of
    p_retailprice — the join/agg shape (part-name filter, two facts,
    broadcast dims, year rollup) is Q9's."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    n = _t(spark, sf_dir, "nation")
    j = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * 0.1 * F.col("l_quantity"))
    return (
        j.groupBy(F.col("n_name").alias("nation"),
                  F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value for one nation's
    suppliers, kept when above a scalar-subquery threshold — both sides
    decimal-exact, so the compare is deterministic.  lineitem stands in
    for partsupp (value = shipped extendedprice).  The threshold is 2x
    the MEAN part value (classic Q11's fixed 0.0001 fraction goes empty
    as the part count scales; mean-relative keeps the query meaningful
    at every SF)."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    ls = (
        l.join(F.broadcast(
            s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"), "left_semi")
    )
    per_part = ls.groupBy("l_partkey").agg(dsum("l_extendedprice").alias("part_value"))
    total = per_part.agg(
        (dsum("part_value") * 2.0 / F.count(F.lit(1))).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority classes): CASE-split counts
    of high- vs low-priority orders among late shipments, grouped by line
    status (standing in for l_shipmode, absent here)."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): revenue view over a quarter, then
    suppliers hitting the scalar-subquery MAX — max over decimal-exact
    sums, so the equality is deterministic."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01"))
    s = _t(spark, sf_dir, "supplier")
    rev = (
        l.groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx)).filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


def winnow_fingerprint_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing rolling-hash fingerprints (text.winnow_fingerprints, the
    MOSS algorithm) driving near-dup pair generation: docs sharing >=3
    surviving fingerprints, with boilerplate fingerprints (df > 10)
    dropped before the equi-join.  Finds the same 25 near-dup pairs as
    the MinHash/ngram paths by an entirely different mechanism."""
    d = _t(spark, sf_dir, "documents")
    return (
        dedup.winnow_dup_pairs(d, k=24, w=12, min_shared=3, max_df=10)
        .orderBy("id_a", "id_b")
    )


def repetition_top_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition statistic (text.word_ngrams): each doc's
    most frequent word 2-gram and the fraction of words it covers — the
    'top n-gram fraction' pre-training quality rule.  Staged projections
    (tokens materialized before the gram lambda), explode → count →
    per-doc top-1 window; integer arithmetic until one final division."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(text.normalize_text("text"), " ").alias("t"))
    grams = (
        toks.filter(F.size("t") >= 2)
        .select("doc_id", F.size("t").alias("wc"),
                F.explode(text.word_ngrams("t", 2)).alias("gram"))
        # ONE hash(doc_id) exchange serves both aggregates below
        # (hash(doc_id) satisfies clustering on any superset key —
        # guide §2.4); before r13 the gram count exchanged on
        # (doc_id, wc, gram) and the per-doc top-1 row_number window
        # re-exchanged + sorted on doc_id
        .repartition(F.col("doc_id"))
    )
    counts = grams.groupBy("doc_id", "wc", "gram").agg(
        agg.counting().alias("n"))
    # argmax by (count desc, gram asc) as min_by over struct(-count,
    # gram) — the LPA tie-break idiom; picks exactly the row the old
    # rk==1 filter kept, with no window sort and no third exchange
    top = counts.groupBy("doc_id", "wc").agg(
        F.min_by(F.struct(F.col("gram"), F.col("n")),
                 F.struct((-F.col("n")).alias("__nn"),
                          F.col("gram"))).alias("__tg"))
    return (
        top.select(
            "doc_id",
            F.col("__tg.gram").alias("top_gram"),
            F.col("__tg.n").alias("top_count"),
            (F.col("__tg.n") * 2 / F.col("wc")).alias("coverage"),
        )
        .orderBy("doc_id")
    )


def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/joins.asof_join direction="forward")
    — each click event enriched with the user's NEXT purchase value
    at-or-after the click time; no future purchase → NULL (left-join
    semantics).  Locks DuckDB ASOF parity in the direction the backward
    gate query (asof_join_events) doesn't cover; same one-shuffle
    union + carry shape, just walked over descending time."""
    from hazelcast_jet_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    out = asof_join(clicks, purchases, "user_id", "ts",
                    value_cols=["value"], direction="forward")
    return out.select(
        "event_id", "user_id",
        F.col("value").alias("click_value"),
        F.col("asof_value").alias("next_purchase_value"),
    )


def dedup_group_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pairs → dedup GROUPS (operators/dedup.pairs_to_groups, min-label
    propagation connected components) over the exact n-gram Jaccard near-
    dup pairs: the keep/drop decision step of the whole dedup family,
    oracle-pinned here against a DuckDB recursive-CTE transitive closure.
    Output: each group's min-doc-id label and its member count."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, k=SHINGLE_K, threshold=LSH_THRESHOLD)
    groups = dedup.pairs_to_groups(pairs)
    return (
        groups.groupBy(F.col("group").alias("group_id"))
        .agg(F.count(F.lit(1)).alias("group_size"))
        .orderBy("group_id")
    )


def wcc_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via large-star/small-star contraction
    (operators/graph.wcc; Kiveris, Lattanzi, Mirrokni, Rastogi &
    Vassilvitskii 2014) over the exact n-gram near-dup pairs — the SAME
    keep/drop group decision as q:dedup_group_sizes but through the
    O(log n)-round star algorithm instead of min-label propagation, so
    the two gates must agree row for row (both converge to the
    reachable-minimum labeling) and the oracle is the identical
    recursive-CTE transitive closure.  The substrate choice is
    deliberate: the co-purchase graph is ONE giant component (4·10⁸
    closure pairs at sf0.1 — not DuckDB-replayable), so its wcc ==
    pairs_to_groups equality is pinned in tests/test_graph_fixpoint.py
    while the driver oracle runs on the sparse near-dup graph."""
    from hazelcast_jet_spark.operators.graph import wcc

    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, k=SHINGLE_K, threshold=LSH_THRESHOLD)
    comp = wcc(pairs.select(F.col("id_a").alias("src"),
                            F.col("id_b").alias("dst")))
    return (comp.groupBy(F.col("component").alias("group_id"))
            .agg(F.count(F.lit(1)).alias("group_size"))
            .orderBy("group_id"))


def ra_links_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link prediction
    (graph.resource_allocation_links; Zhou, Lü & Zhang 2009) over the
    SAME small-basket co-purchase substrate as q:link_prediction_parts,
    so the two indices are directly comparable: RA weights each shared
    neighbor by 1/degree instead of Jaccard's set ratio — and involves
    NO transcendental, so the DECIMAL(28,18)-accumulated score is
    engine-exact (the pagerank contribution convention).  Top 20
    never-co-purchased pairs by RA score."""
    from hazelcast_jet_spark.operators.graph import (
        cooccurrence_edges, resource_allocation_links)

    li = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                               max_group=LINKPRED_MAX_BASKET)
    return resource_allocation_links(edges, top_k=20,
                                     max_degree=LINKPRED_MAX_DEGREE)


def assortativity_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (graph.degree_assortativity; Newman 2002)
    of the co-purchase graph — ONE scalar telling you whether hubs
    attach to hubs (assortative, >0) or to leaves (disassortative, <0):
    the skew diagnostic to read BEFORE picking a partition strategy for
    any workload on this graph.  Decimal moment sums over the symmetric
    edge list; one fixed double chain for the correlation."""
    from hazelcast_jet_spark.operators.graph import degree_assortativity

    return degree_assortativity(_copurchase_edges(spark, sf_dir))


THETA_H, THETA_ALPHA = 3, 0.5


def theta_forecast_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (timeseries.theta_forecast; Assimakopoulos
    & Nikolopoulos 2000) of the daily event rate per type, 3 steps
    ahead — the M3-competition baseline completing the forecast family
    (holt trend, hw seasonal, croston intermittent, conformal
    intervals).  Decimal OLS moments + α=0.5 SES (every multiply an
    exact binary scaling), so the recursive-CTE oracle replays the
    bits."""
    from hazelcast_jet_spark.operators.timeseries import theta_forecast

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("event_type").alias("key"),
                       F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).cast("double").alias("n")))
    return (theta_forecast(daily, "key", "day", "n",
                           alpha=THETA_ALPHA, h=THETA_H)
            .withColumnRenamed("key", "event_type")
            .orderBy("event_type", "step"))


SAX_SEGMENTS, SAX_ALPHABET = 8, 4

def _sax_case_sql() -> str:
    """CASE arms mapping a PAA value `p` to its SAX letter — breakpoint
    literals come from operators.timeseries.SAX_BREAKPOINTS (Python
    floats, so neither engine evaluates an inverse CDF)."""
    from hazelcast_jet_spark.operators.timeseries import SAX_BREAKPOINTS

    bps = SAX_BREAKPOINTS[SAX_ALPHABET]
    arms = " ".join(f"WHEN p < {b!r} THEN '{chr(ord('a') + i)}'"
                    for i, b in enumerate(bps))
    # NULL paa (constant series, sd=0) -> NULL symbol, the operator's
    # undefined-series contract
    return f"WHEN p IS NULL THEN NULL {arms} ELSE '{chr(ord('a') + len(bps))}'"


def sax_symbols_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (timeseries.sax_symbols; Lin, Keogh, Lonardi &
    Chiu 2003) of the daily event rate per type: z-norm → 8-segment PAA
    → 4-letter Gaussian-breakpoint alphabet — the discretization that
    lets the sequence/dedup tooling run on telemetry.  Fully
    declarative (rank, integer segment arithmetic, decimal moment sums,
    literal breakpoints); no Python anywhere."""
    from hazelcast_jet_spark.operators.timeseries import sax_symbols

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("event_type").alias("key"),
                       F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).cast("double").alias("n")))
    return (sax_symbols(daily, "key", "day", "n",
                        segments=SAX_SEGMENTS, alphabet=SAX_ALPHABET)
            .withColumnRenamed("key", "event_type"))


FD_CANDIDATES = [(["o_orderkey"], "o_custkey"),
                 (["o_custkey"], "o_orderpriority"),
                 (["o_orderpriority"], "o_orderstatus"),
                 (["o_custkey", "o_orderdate"], "o_totalprice")]


def fd_violations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-functional-dependency profiling
    (profile.fd_violations; Kivinen & Mannila 1995 g₃ / TANE error)
    over four candidate FDs on orders: the key FD (orderkey→custkey,
    must hold), two plausible-but-false business FDs, and a
    near-key composite — the schema-inference / data-contract
    primitive.  Per FD two keyed aggregates on its own pruned columns;
    the g₃ error is the exact minimum row-deletion fraction."""
    from hazelcast_jet_spark.operators.profile import fd_violations

    return fd_violations(_t(spark, sf_dir, "orders"), FD_CANDIDATES)


def dml_ate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partialling-out treatment effect (experiment.
    dml_partial_linear_ate; Chernozhukov et al. 2018 partially-linear
    estimand via Frisch–Waugh–Lovell with exact categorical nuisances)
    of the md5 experiment on per-customer mean order value, market
    segment as the control — the pooled-slope complement to
    q:aipw_ate_orders on the IDENTICAL substrate (same units, same
    seed), so the two estimators' agreement is itself a check.  HC0
    sandwich se; all folds round-9 DECIMAL(38,9)."""
    from hazelcast_jet_spark.operators.experiment import (
        ab_assign, dml_partial_linear_ate)

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    units = (o.groupBy("o_custkey")
             .agg((dsum("o_totalprice")
                   / F.count(F.lit(1)).cast("double")).alias("y"))
             .join(c.select(F.col("c_custkey").alias("o_custkey"),
                            "c_mktsegment"), "o_custkey")
             .withColumn("arm", ab_assign(F.col("o_custkey"), AIPW_SEED)))
    return dml_partial_linear_ate(units, "arm", "y", "c_mktsegment")


GEO_RADIUS, GEO_GRID = 1.0, 0.0625  # 1/16: binary-rational coordinates


def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planar radius join (spatial.radius_join): suppliers × customers
    within distance 1.0 on PLANTED coordinates — the synthetic corpus
    has no geo columns, so both sides get deterministic binary-rational
    points derived from their keys (the pii-plant convention; the 1/16
    grid makes every squared distance a 12-decimal-exact rational, so
    the boundary test is engine-identical).  Executed as a 3×3
    grid-cell equi-join with a squared-distance verify — NEVER a cross
    join (the plan pin asserts no BNLJ/cartesian).  Output: per
    supplier nation, pair count + exact mean squared distance."""
    from hazelcast_jet_spark.operators.spatial import radius_join

    pairs = radius_join(_geo_suppliers(spark, sf_dir),
                        _geo_customers(spark, sf_dir),
                        radius=GEO_RADIUS, round_digits=12)
    return (pairs.groupBy(F.col("s_nationkey_l").alias("nation"))
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 (F.round(
                     F.sum(F.col("dist2").cast("decimal(38,12)"))
                     .cast("double")
                     / F.count(F.lit(1)).cast("double"), 6)
                  + F.lit(0.0)).alias("mean_dist2"))
            .orderBy("nation"))


KNN_K, KNN_RADIUS = 3, 2.0
DBSCAN_CELL, DBSCAN_MIN_PTS = 1.0, 3
HOTSPOT_CELL = 1.0


def _geo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with the planted binary-rational coordinates of
    q:geo_radius_pairs (1/16 grid over a 32×32 extent)."""
    return _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey",
        ((F.col("s_suppkey") % 512) * GEO_GRID).alias("x"),
        (((F.col("s_suppkey") * 11) % 512) * GEO_GRID).alias("y"))


def _geo_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") % 512) * GEO_GRID).alias("x"),
        (((F.col("c_custkey") * 7) % 512) * GEO_GRID).alias("y"))


def knn_supplier_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-radius k-nearest-neighbor join (spatial.knn_join): each
    supplier's 3 nearest customers within distance 2.0 on the planted
    geo coordinates — the spatial twin of the ANN top-k lane, executed
    as the 3×3 grid equi-join + one per-supplier rank window (never a
    cross join; exact-d2 ordering with the customer key as the
    deterministic tie-break).  Readout: per (supplier nation, rank),
    pair count + exact mean squared distance."""
    from hazelcast_jet_spark.operators.spatial import knn_join

    knn = knn_join(_geo_suppliers(spark, sf_dir),
                   _geo_customers(spark, sf_dir),
                   k=KNN_K, radius=KNN_RADIUS,
                   left_id="s_suppkey", right_id="c_custkey",
                   round_digits=12)
    # dist2 is exact at 8 decimals (multiples of 1/256 squared-summed),
    # so the DECIMAL(38,8) sum is exact and small enough that the
    # double cast is 1-ulp-safe; the UNROUNDED quotient of identical
    # doubles is then bit-equal on both engines (round(x, 6) here hits
    # the engines' halfway-rule divergence: 1.0328125 -> .813 vs .812)
    return (knn.groupBy(F.col("s_nationkey_l").alias("nation"), "rank")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 (F.sum(F.col("dist2").cast("decimal(38,8)"))
                  .cast("double")
                  / F.count(F.lit(1)).cast("double")
                  + F.lit(0.0)).alias("mean_dist2"))
            .orderBy("nation", "rank"))


def grid_clusters_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density clustering (spatial.grid_density_clusters, the
    cell-granular DBSCAN): customers on the planted coordinates, cell
    side 1.0, min_pts 3 — points shuffle once into cell counts, core
    cells merge through the wcc star contraction on the CELL graph
    (|cells| ≪ |points|), labels are minimum packed cell keys.  Noise
    reported as cluster −1.  Per-cluster point and cell counts."""
    from hazelcast_jet_spark.operators.spatial import grid_density_clusters

    out = grid_density_clusters(_geo_customers(spark, sf_dir),
                                cell=DBSCAN_CELL, min_pts=DBSCAN_MIN_PTS)
    return (out.groupBy(F.coalesce(F.col("cluster"), F.lit(-1))
                        .alias("cluster"))
            .agg(F.count(F.lit(1)).alias("n_points"),
                 F.countDistinct("cell_id").alias("n_cells"))
            .orderBy("cluster"))


def hotspot_cells_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis–Ord Gi* hot-spot surface (spatial.hotspot_gi) over the
    customer cells: binary 3×3 weights including self, study area = the
    occupied cells, all neighborhood sums integer-exact via the affine
    cell-key offset join; the z chain is fixed-order double arithmetic
    so both engines emit identical bits.  Top 20 cells by z."""
    from hazelcast_jet_spark.operators.spatial import hotspot_gi

    g = hotspot_gi(_geo_customers(spark, sf_dir), cell=HOTSPOT_CELL)
    return (g.filter(F.col("z").isNotNull())
            .select("cx", "cy", "n_points", "w", "g", "z")
            .orderBy(F.col("z").desc(), "cx", "cy").limit(20))


UCC_CANDIDATES = [["l_orderkey"],
                  ["l_orderkey", "l_linenumber"],
                  ["l_partkey", "l_suppkey"],
                  ["l_orderkey", "l_partkey", "l_suppkey"]]


def ucc_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-column-combination verification (profile.ucc_profile;
    the TANE/HyUCC key-discovery primitive) over four lineitem
    candidates: the order key alone (NOT unique — one row per line),
    the true composite key (orderkey, linenumber), a plausible business
    key (partkey, suppkey — collides), and a near-key triple.  Per
    candidate one count aggregate on its own pruned columns."""
    from hazelcast_jet_spark.operators.profile import ucc_profile

    return ucc_profile(_t(spark, sf_dir, "lineitem"), UCC_CANDIDATES)


HITS_ITERS, HITS_TOP = 2, 20


def hits_customer_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (graph.hits; Kleinberg 1999) on the
    bipartite customer→part purchase graph: hub customers buy the
    authoritative parts, authoritative parts are bought by hub
    customers — the mutual-reinforcement co-ranking beside pagerank's
    single-mode prior.  L∞ normalization keeps every score a fixed
    IEEE chain (max is exact; no L2 sqrt of an order-dependent sum),
    contribution sums DECIMAL(28,18); scores rounded at 9 (the
    pagerank convention — the (28,18)->double cast carries 1-ulp
    engine noise that the round absorbs).  Top 20 per side."""
    from hazelcast_jet_spark.operators.graph import hits

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_partkey").isNotNull())
          .select("l_orderkey", "l_partkey"))
    edges = (o.join(li, o["o_orderkey"] == li["l_orderkey"])
             .select(F.col("o_custkey").alias("src"),
                     F.col("l_partkey").alias("dst")))
    scores = hits(edges, iters=HITS_ITERS, round_digits=9)
    w = Window.partitionBy("side").orderBy(F.col("score").desc(), "node")
    return (scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= HITS_TOP)
            .select("side", "node", "score",
                    F.col("rank").cast("int").alias("rank"))
            .orderBy("side", "rank"))


def streaming_cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING one-sided CUSUM (streaming/cusum.stream_cusum_alarms):
    the daily event-rate rollup arrives as a 3-batch ordered feed and a
    keyed stateful detector carries S_t across micro-batches against a
    BATCH-computed per-type reference mean (broadcast stream-static
    join) — the live twin of q:cusum_alarm_events, row-equal to the
    batch detector because the add/sub/max recurrence is
    operation-for-operation identical and state survives batch
    boundaries.  State bound: one double + one ordinal per event_type —
    O(1) per key forever.  The oracle is the batch recursive-CTE replay
    (shared)."""
    import tempfile

    from hazelcast_jet_spark.streaming.cusum import stream_cusum_alarms
    from hazelcast_jet_spark.streaming.run import run_to_batch

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    targets = daily.groupBy("event_type").agg(
        (F.sum(F.col("n").cast("decimal(28,12)")).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("target"))
    days = sorted(r[0] for r in daily.select("day").distinct().collect())
    n_files = 3
    bounds = [days[(len(days) * i) // n_files] for i in range(1, n_files)]
    tag = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(tempfile.gettempdir(), f"spark_graft_cusum_{tag}")
    chunks = [
        daily.filter(F.col("day") < F.lit(bounds[0])),
        daily.filter((F.col("day") >= F.lit(bounds[0]))
                     & (F.col("day") < F.lit(bounds[1]))),
        daily.filter(F.col("day") >= F.lit(bounds[1])),
    ]
    for i, ch in enumerate(chunks):
        ch.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"f{i}"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "f*")))
    alarmed = stream_cusum_alarms(stream, "event_type", "day", "n",
                                  targets, slack=0.0, threshold=10.0)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        out = run_to_batch(alarmed, "update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select("event_type", "day", "n", "target", "cusum",
                      "alarm").orderBy("event_type", "day")


def streaming_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING ordered funnel (streaming/funnel.
    stream_funnel_progress): the view→click→purchase events arrive as
    a 3-batch time-ordered feed and a keyed stateful fold carries each
    user's earliest stage-completion times (integer µs) across
    micro-batches — the live twin of q:funnel_conversion_counts,
    equal to the batch earliest-completion fold because greedy
    in-order advancement IS the batch min-after recurrence.  State
    bound: k+1 longs per user, O(k) forever.  The oracle is the batch
    funnel SQL (shared)."""
    import tempfile

    from hazelcast_jet_spark.streaming.funnel import stream_funnel_progress
    from hazelcast_jet_spark.streaming.run import run_to_batch

    e = (_t(spark, sf_dir, "events")
         .select("user_id", "event_type", "ts")
         .filter(F.col("event_type").isin(FUNNEL_STAGES)))
    days = sorted(r[0] for r in
                  e.select(F.to_date("ts").alias("d")).distinct().collect())
    n_files = 3
    bounds = [days[(len(days) * i) // n_files] for i in range(1, n_files)]
    tag = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(tempfile.gettempdir(), f"spark_graft_funnel_{tag}")
    chunks = [
        e.filter(F.to_date("ts") < F.lit(bounds[0])),
        e.filter((F.to_date("ts") >= F.lit(bounds[0]))
                 & (F.to_date("ts") < F.lit(bounds[1]))),
        e.filter(F.to_date("ts") >= F.lit(bounds[1])),
    ]
    for i, ch in enumerate(chunks):
        ch.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"f{i}"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "f*")))
    prog = stream_funnel_progress(stream, FUNNEL_STAGES)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        out = run_to_batch(prog, "update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    depth = (out.groupBy("user_id")
             .agg(F.max("stage_reached").alias("__depth")))
    legs = [depth.filter(F.col("__depth") >= i + 1).agg(
        F.lit(i + 1).alias("stage"),
        F.lit(s).alias("event_type"),
        F.count(F.lit(1)).alias("n_keys"))
        for i, s in enumerate(FUNNEL_STAGES)]
    res = legs[0]
    for leg in legs[1:]:
        res = res.unionByName(leg)
    return res.orderBy("stage")


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction audit (text.pii_counts / text.scrub_pii,
    the privacy-filter step).  The synthetic corpus carries no PII, so the
    query PLANTS deterministic spans derived from doc_id — an email for
    every doc, an SSN for even ids, an IPv4 for all — with the identical
    construction in the oracle; per-kind hit counts and a post-scrub
    cleanliness flag are then compared engine-to-engine.  All map-only
    chained regex, full-scan speed at 100 TB."""
    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or "),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("123-45-"),
                         F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        ).alias("text"),
    )
    audited = planted.select(
        "doc_id",
        text.pii_counts("text").alias("c"),
        text.pii_counts(text.scrub_pii("text")).alias("after"),
    )
    return audited.select(
        "doc_id",
        F.col("c.email").alias("email_hits"),
        F.col("c.ssn").alias("ssn_hits"),
        F.col("c.ipv4").alias("ipv4_hits"),
        F.col("c.phone").alias("phone_hits"),
        (F.col("after.email") + F.col("after.ssn") + F.col("after.ipv4")
         + F.col("after.phone") == 0).cast("int").alias("clean_after_scrub"),
    ).orderBy("doc_id")


def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality filtering (text.gopher_quality_flags; Rae et
    al. 2021 §A1.1): per-source corpus survival report — how many docs
    each row-local rule keeps, and how many pass all rules.  The rule
    evaluation is map-only JVM expressions (one 100 TB scan, no Python);
    the report is one small groupBy on the 20-source dimension."""
    d = _t(spark, sf_dir, "documents")
    q = d.select(
        "source",
        text.gopher_quality_flags(
            "text", min_words=20, max_words=1000,
            min_mean_word_len=3.0, max_mean_word_len=10.0,
            max_symbol_ratio=0.1, min_stopword_hits=2,
        ).alias("q"),
    )
    return (
        q.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("q.ok_words").cast("bigint")).alias("ok_words"),
            F.sum(F.col("q.ok_mean_word_len").cast("bigint")).alias("ok_mean_word_len"),
            F.sum(F.col("q.ok_symbol_ratio").cast("bigint")).alias("ok_symbol_ratio"),
            F.sum(F.col("q.ok_stopwords").cast("bigint")).alias("ok_stopwords"),
            F.sum(F.col("q.pass").cast("bigint")).alias("n_pass"),
        )
        .orderBy("source")
    )


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (text.chunk_documents): 16-token chunks
    with 4-token overlap — the RAG/pre-training chunking step.  Pure
    map-side explode (zero shuffles; chunks stay co-partitioned with
    their doc); chunk text hashed so the gate compares content without
    hauling strings."""
    d = _t(spark, sf_dir, "documents")
    c = text.chunk_documents(d, chunk_tokens=16, overlap=4)
    return c.select(
        "doc_id", "chunk_id",
        F.md5("chunk_text").alias("chunk_md5"),
        "chunk_n_tokens",
    ).orderBy("doc_id", "chunk_id")


def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (Spark `percentile`, linear interpolation on the
    sorted group — same definition as ANSI percentile_cont / DuckDB
    quantile_cont) of extended price per return flag.  Exact form needs a
    per-group sort, so it is the oracle-gated twin; at 100 TB the scale
    path is approx_percentile (t-digest, mergeable partials, no sort) —
    same call shape, documented divergence."""
    l = _t(spark, sf_dir, "lineitem")
    pcts = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    # ONE percentile buffer carrying all four fractions: four separate
    # percentile() calls each serialize their own full value-count map
    # through the exchange (measured 4x slower at sf0.1)
    ps = F.percentile(
        "l_extendedprice", F.array(*[F.lit(p) for p in pcts.values()]))
    return (
        l.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), ps.alias("_ps"))
        .select(
            "l_returnflag", "n",
            *[F.round(F.element_at("_ps", i + 1), 6).alias(name)
              for i, name in enumerate(pcts)],
        )
        .orderBy("l_returnflag")
    )


def nexmark_q6_avg_last10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXMark Q6 (avg selling price of each seller's last 10 closed
    auctions): purchases as closed auctions, user as seller; a 10-row
    sliding frame per seller, then the latest row per seller.  The frame
    sum accumulates in DECIMAL (exact in any order) and divides once as
    double, so Spark's running-frame evaluation and the oracle's
    segment-tree windowed aggregate cannot diverge in float order."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w10 = w.rowsBetween(-9, Window.currentRow)
    latest = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    return (
        purchases
        .withColumn("s10", F.sum(F.col("value").cast("decimal(18,6)")).over(w10))
        .withColumn("c10", F.count(F.lit(1)).over(w10))
        .withColumn("rn", F.row_number().over(latest))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("seller"),
            F.round(F.col("s10").cast("double") / F.col("c10"), 6).alias("avg_last10"),
            F.col("c10").alias("n_considered"),
        )
        .orderBy("seller")
    )


def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent terms per language via Misra-Gries summaries + exact
    re-verify (sketch.heavy_hitters): per-partition state bounded at
    `capacity` entries instead of the vocabulary, candidates broadcast
    back for exact counts — the heavy-hitter pattern that survives a
    100 TB corpus with a web-scale vocabulary.  Oracle = exact top-10
    (the MG guarantee makes the sketch path provably identical here)."""
    d = _t(spark, sf_dir, "documents")
    words = (
        d.select("lang",
                 F.explode(F.split(text.normalize_text("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    top = sketch.heavy_hitters(words, "term", ["lang"], k=10, capacity=64)
    return top.select(
        "lang", F.col("item").alias("term"), "n", "rank"
    ).orderBy("lang", "rank")


def url_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-canonical-URL (text.canonicalize_url — the C4/web-crawl
    keep-one-per-URL rule).  The synthetic corpus has no URL column, so
    the query PLANTS deterministic messy URLs from doc_id (scheme, www,
    tracking params, fragment, and trailing slash all vary with parity)
    with the identical construction in the oracle — the same planted-
    input pattern as pii_scrub_stats.  Canonicalization is chained
    regexp_replace (map-only, full-scan speed); the dedup itself is one
    groupBy on the canonical key: keep min doc_id, count the collapsed
    variants."""
    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("https://www."))
             .otherwise(F.lit("http://")),
            F.lit("site"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".com/page/"), (F.col("doc_id") % 25).cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("/?utm_source=feed&q="))
             .otherwise(F.lit("?q=")),
            (F.col("doc_id") % 3).cast("string"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("#section"))
             .otherwise(F.lit("")),
        ).alias("url"),
    )
    return (
        planted.select("doc_id", text.canonicalize_url("url").alias("curl"))
        .groupBy("curl")
        .agg(F.min("doc_id").alias("keep_id"),
             F.count(F.lit(1)).alias("n_variants"))
        .orderBy("curl")
    )


def unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM surprisal quality signal (text.unigram_lm_score):
    per-doc mean -ln p(token) under a unigram MLE trained on the corpus
    itself (one explode + two aggregations, tf_idf shape; corpus never
    collected).  ln is bit-identical across engines and token logs are
    accumulated in DECIMAL (order-independent), so the score hashes
    exactly against the oracle."""
    d = _t(spark, sf_dir, "documents")
    return text.unigram_lm_score(d).orderBy("doc_id")


BIGRAM_LAM = 0.75


def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM surprisal with interpolated unigram backoff
    (text.bigram_lm_score): −ln(λ·p(w₂|w₁) + (1−λ)·p(w₂)) per bigram —
    separates common-words-in-impossible-order junk (high) from common
    phrases (low), which the unigram signal cannot.  Vocabulary-bounded
    count tables join back broadcast; DECIMAL-accumulated nll."""
    d = _t(spark, sf_dir, "documents")
    return text.bigram_lm_score(d, lam=BIGRAM_LAM).orderBy("doc_id")


def salted_aggregate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via salting (operators/skew.salted_aggregate):
    groupBy(key, salt) partials → groupBy(key) recombine, so one mega-key
    splits across `salt` reducers instead of melting one.  DECIMAL sum
    keeps the two-phase result bit-identical to the oracle's one-phase
    GROUP BY regardless of how the salt split the rows."""
    from hazelcast_jet_spark.operators.skew import salted_aggregate

    l = _t(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        l, ["l_returnflag"],
        {"cnt": agg.counting(),
         "qty": F.sum(F.col("l_quantity").cast("decimal(18,6)"))},
        {"cnt": F.sum("cnt"),
         "qty": F.sum("qty")},
        salt=16,
    )
    return out.select(
        "l_returnflag", "cnt", F.col("qty").cast("double").alias("sum_qty")
    ).orderBy("l_returnflag")


def kmeans_assign_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means ASSIGNMENT step against fixed literal centroids
    (operators/clustering.l2_assign): map-only rounded-L2 argmin in
    whole-stage codegen, then membership counts — the oracle-able gate
    shape for the k-means family (r4 verdict: the driver contract has no
    rows-only notion, so the iterative `kmeans_fit` gate slot could
    never go green).  The iterative Lloyd's fit itself stays pinned
    bit-for-bit against numpy in tests/test_packing_clustering.py; this
    verifies the assignment kernel those iterations are built from."""
    from hazelcast_jet_spark.operators.clustering import l2_assign

    e = _t(spark, sf_dir, "embeddings")
    out = l2_assign(e, _ivf_centroids(), vec_col="embedding")
    return (
        out.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("cluster")
    )


OUTLIER_DIST = 63.5


def embedding_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space assignment diagnostics (clustering.l2_assign with
    dist_col): per cluster, member count, DECIMAL-exact mean and max of
    the rounded squared-L2 distance to the assigned centroid, and how
    many vectors sit beyond a fixed outlier radius — the corpus-drift /
    junk-embedding monitor.  Map-only scoring; ONE aggregate."""
    from hazelcast_jet_spark.operators.clustering import l2_assign

    e = _t(spark, sf_dir, "embeddings")
    a = l2_assign(e, _ivf_centroids(), vec_col="embedding",
                  dist_col="dist")
    n = F.count(F.lit(1))
    return (
        a.groupBy("cluster")
        .agg(
            n.alias("n_vectors"),
            F.round(
                F.sum(F.col("dist").cast("decimal(28,9)")).cast("double")
                / n, 6).alias("mean_dist"),
            F.max("dist").alias("max_dist"),
            F.sum(F.when(F.col("dist") > OUTLIER_DIST, 1).otherwise(0))
            .alias("n_outliers"),
        )
        .orderBy("cluster")
    )


def cut_dup_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUT step of substring dedup (dedup.cut_duplicated_spans; Lee
    et al. 2022): tokens covered by an 8-token window appearing verbatim
    in another document are REMOVED, the document survives.  Oracle
    replays the same hash/df/mask pipeline in list SQL and fingerprints
    the surviving text."""
    d = _t(spark, sf_dir, "documents")
    out = dedup.cut_duplicated_spans(d, k=8)
    return out.select(
        "doc_id", "n_tokens", "n_kept",
        F.md5("clean_text").alias("clean_fp"),
    ).orderBy("doc_id")


def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING corpus quality gate: the Gopher rules applied on a real
    document stream (readStream → map-only JVM flag expressions →
    complete-mode agg by lang) — the live-ingestion filter shape.
    availableNow on bounded input makes the counts deterministic, so the
    batch SQL twin is the exact oracle.  State bound: one counter row
    per lang — fixed by the language inventory, O(1) in corpus size."""
    from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

    d = read_stream_table(spark, sf_dir, "documents")
    q = d.select(
        "lang",
        text.gopher_quality_flags(
            "text", min_words=20, max_words=1000,
            min_mean_word_len=3.0, max_mean_word_len=10.0,
            max_symbol_ratio=0.1, min_stopword_hits=2,
        ).alias("q"),
    )
    agg_df = q.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("q.pass").cast("bigint")).alias("n_pass"),
    )
    return run_to_batch(agg_df, "complete").orderBy("lang")


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-policy over near-dup groups (operators/dedup.keep_best): each
    exact-Jaccard dup group keeps its highest-quality member (rounded
    text.quality_score, ties → lowest id) instead of blind min-id — the
    keep/drop decision production dedup actually applies.  Labels join
    scored docs once; one group-partitioned window yields argmax + size
    together."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(d, k=SHINGLE_K, threshold=LSH_THRESHOLD)
    out = dedup.keep_best(
        d, pairs, F.round(text.quality_score("text"), 6))
    return out.orderBy("group_id")


QUALITY_BINS = 10


def quality_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile curriculum binning (operators/profile.rank_bins over
    text.quality_score): equal-population deciles by rounded quality with
    doc_id tiebreak, then per-decile count + score range.  Gate runs the
    exact ntile; the approx-edges map-only variant is the documented
    100 TB path (rank_bins docstring)."""
    from hazelcast_jet_spark.operators.profile import rank_bins

    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", F.round(text.quality_score("text"), 6).alias("q"))
    out = rank_bins(scored, "q", QUALITY_BINS, "doc_id", bin_col="decile")
    return (
        out.groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("q").alias("min_q"), F.max("q").alias("max_q"))
        .orderBy("decile")
    )


FUNNEL_STAGES = ["view", "click", "purchase"]


def funnel_conversion_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (operators/timeseries.funnel_counts): users who
    viewed, then clicked strictly after their first view, then purchased
    strictly after that click — earliest-completion product-analytics
    semantics.  Every join keys on user_id (one partitioning serves all
    stages); per-stage counts stack map-only into one row per stage."""
    from hazelcast_jet_spark.operators.timeseries import funnel_counts

    e = _t(spark, sf_dir, "events")
    return funnel_counts(e, FUNNEL_STAGES).orderBy("stage")


DSIR_BUCKET_HEX = 3


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (operators/importance.dsir_weights; Xie et
    al. 2023): score every doc by the hashed-bigram log-likelihood ratio
    of a target model (here: lang='en' docs) vs the raw corpus — the
    data-mixing primitive for 'more like this' selection at corpus
    scale.  One explode + one bucket aggregate + a broadcast log-ratio
    join; DECIMAL-accumulated log sums hash identically on both
    engines."""
    from hazelcast_jet_spark.operators.importance import dsir_weights

    d = _t(spark, sf_dir, "documents")
    out = dsir_weights(d, F.col("lang") == "en", bucket_hex=DSIR_BUCKET_HEX)
    return out.orderBy("doc_id")


CLS_BIAS = -0.5


def _cls_weights():
    """Deterministic stand-in for an offline-trained weight vector: a
    pure function of the bucket hex chars, so the SQL oracle derives
    the identical table inline (ascii arithmetic, exact dyadic /8)."""
    hexd = "0123456789abcdef"
    return {
        a + b + c: ((ord(a) + 3 * ord(b) + 7 * ord(c)) % 13 - 6) / 8.0
        for a in hexd for b in hexd for c in hexd
    }


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear-classifier inference (operators/importance.
    hashed_classifier_score): an offline-trained quality model scored
    over the corpus as bias + Σ w(bucket(bigram)) — one explode, one
    broadcast weight join, DECIMAL-exact per-doc sums; the corpus
    shuffles only for the per-doc aggregate."""
    from hazelcast_jet_spark.operators.importance import (
        hashed_classifier_score)

    d = _t(spark, sf_dir, "documents")
    out = hashed_classifier_score(
        d, _cls_weights(), bucket_hex=DSIR_BUCKET_HEX, bias=CLS_BIAS)
    return out.orderBy("doc_id")


def dup_span_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-long-span statistics (dedup.dup_span_stats; Lee
    et al. 2022 substring-dedup signal): per doc, the fraction of its
    8-token windows appearing verbatim in another document — the basis
    for CUTTING duplicated text rather than dropping whole docs.  The
    oracle hashes windows by the same md5 12-hex prefix, so both engines
    partition spans identically."""
    d = _t(spark, sf_dir, "documents")
    return dedup.dup_span_stats(d, k=8).orderBy("doc_id")


def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-≤1 fuzzy join (operators/joins.fuzzy_join, FastSS
    deletion neighborhoods): deterministic one-char-deletion typos of
    every 20th part name matched back against the part table WITHOUT a
    cross join — candidates equi-join on exploded deletion variants,
    then exact levenshtein re-verify.  The oracle pays the brute-force
    cross join; the engine must reach the identical pair set through
    the neighborhood index."""
    p = _t(spark, sf_dir, "part")
    probes = (
        p.filter(F.col("p_partkey") % 20 == 0)
        .select(
            F.concat(
                F.expr("substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))"),
                F.expr("substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2)"),
            ).alias("probe"))
    )
    matches = joins.fuzzy_join(probes, p.select("p_name"), "probe", "p_name")
    return matches.orderBy("probe", "p_name")


QUOTA_N = 10
SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SEMDEDUP_THRESHOLD = 0.4


def source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (operators/sampling.quota_per_key): keep
    at most N docs per source so no crawl host dominates the mix.  Which
    N survive is a pure function of md5(seed||doc_id) — the oracle's
    row_number over the same md5 picks identical rows.  The map-side
    per-batch top-n prefilter bounds what a hot source ships through the
    one quota shuffle."""
    from hazelcast_jet_spark.operators.sampling import quota_per_key

    d = _t(spark, sf_dir, "documents")
    out = quota_per_key(d, "source", QUOTA_N, "doc_id", seed="quota0")
    return out.select("source", "doc_id").orderBy("source", "doc_id")


def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic group-safe train/val/test split (operators/sampling.
    split_by_key): split membership is a function of the key hash alone
    (map-only CASE over cumulative md5-prefix bands — no shuffle, no
    leakage across splits for rows sharing a key), then counts per
    (split, lang)."""
    from hazelcast_jet_spark.operators.sampling import split_by_key

    d = _t(spark, sf_dir, "documents")
    out = split_by_key(d, "doc_id", SPLIT_FRACTIONS, seed="split0")
    return (
        out.groupBy("split", "lang").agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "lang")
    )


RL_THRESHOLD, RL_W_NAME, RL_W_TYPE = 0.6, 0.7, 0.3


def record_linkage_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-field record linkage (operators/joins.record_linkage):
    even- vs odd-key parts matched on weighted normalized-Levenshtein
    similarity of (name, type), blocked on (brand, first name token) —
    Fellegi–Sunter block→compare→score→threshold without a cross join;
    per-score-band pair counts + DECIMAL score mass."""
    from hazelcast_jet_spark.operators.joins import record_linkage

    p = _t(spark, sf_dir, "part").withColumn(
        "p_first", F.split(F.col("p_name"), " ")[0])
    pl = p.filter(F.col("p_partkey") % 2 == 0) \
        .withColumnRenamed("p_partkey", "left_key")
    pr = p.filter(F.col("p_partkey") % 2 == 1) \
        .withColumnRenamed("p_partkey", "right_key")
    m = record_linkage(
        pl, pr,
        fields=[("p_name", "p_name", RL_W_NAME),
                ("p_type", "p_type", RL_W_TYPE)],
        block_on=[("p_brand", "p_brand"), ("p_first", "p_first")],
        threshold=RL_THRESHOLD, left_id="left_key", right_id="right_key")
    return (
        m.groupBy(F.floor(F.col("score") * 10).cast("int")
                  .alias("score_band"))
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             dsum("score").alias("score_sum"))
        .orderBy("score_band")
    )


FS_SEED, FS_MAX_GROUP = "fs1", 64


def fs_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter m/u probabilities and log2 agreement weights
    (joins.fellegi_sunter_weights; Fellegi & Sunter 1969) for
    (lang, source, length-band) over documents: m from the exact-dup
    fingerprint groups (ground truth by construction), u from the
    deterministic md5-derangement pairing — the calibration that turns
    q:record_linkage_parts' ad-hoc field weights into likelihood
    ratios.  Both legs linear or group-bounded; the only
    transcendental is ln/ln2 under round-6."""
    from hazelcast_jet_spark.operators.joins import fellegi_sunter_weights
    from hazelcast_jet_spark.operators.text import fingerprint

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", fingerprint("text").alias("fp"), "lang", "source",
        F.floor(F.col("n_chars").cast("double") / F.lit(100.0))
        .alias("len_band"))
    return fellegi_sunter_weights(
        d, "doc_id", "fp", ["lang", "len_band", "source"],
        seed=FS_SEED, max_group=FS_MAX_GROUP)


KFOLD_K = 5


def kfold_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment (operators/sampling.kfold_split):
    integer folds from equal md5-prefix hash bands — map-only, group-
    leakage-safe; per-fold sizes plus doc_id/char checksums prove the
    exact membership, not just the counts."""
    from hazelcast_jet_spark.operators.sampling import kfold_split

    d = _t(spark, sf_dir, "documents")
    out = kfold_split(d, "doc_id", KFOLD_K, seed="fold0")
    return (
        out.groupBy("fold").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("doc_id_sum"),
            F.sum("n_chars").alias("n_chars_sum"))
        .orderBy("fold")
    )


WSAMPLE_RATE = 0.5


def weighted_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted Bernoulli sampling (operators/sampling.
    weighted_sample): each doc kept with probability min(1, rate·w) —
    the selection step downstream of DSIR-style importance weights.
    Map-only: the keep decision is a string compare between the row's
    md5-prefix uniform and a hex-rendered per-row threshold, identical
    in any engine (no rand()).  The weight here is an exact-binary
    function of n_chars ((n%7+1)/4 ∈ {{.25…1.75}}) so threshold doubles
    are bit-equal across engines by construction."""
    from hazelcast_jet_spark.operators.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents")
    w = (F.col("n_chars") % 7 + 1) / 4.0
    out = weighted_sample(d, WSAMPLE_RATE, w, "doc_id", seed="w0")
    return (
        out.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.sum("n_chars").alias("chars_kept"))
        .orderBy("source")
    )


def bloom_semi_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned semi join (operators/joins.bloom_semi_join): orders
    of BUILDING-segment customers, pre-filtered by a Bloom whose j=3 bit
    positions probe as broadcast semi joins (≤ m longs broadcast however
    many keys exist — the shape for a key side too big to broadcast
    raw), then an exact semi join drops the false positives.  The oracle
    is the PLAIN semi join — equality proves the Bloom pruning is
    lossless."""
    from hazelcast_jet_spark.operators.joins import bloom_semi_join

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    keys = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    out = bloom_semi_join(o, keys, "o_custkey", "c_custkey", m=1 << 16)
    return out.select("o_orderkey", "o_custkey").orderBy("o_orderkey")


def semantic_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.semantic_dedup_pairs, Abbas et al.
    2023): embeddings cluster to the 8 fixed centroids (map-only Arrow
    matmul — the same coarse quantization the IVF index uses), then
    near-dup pairs are searched WITHIN clusters only — the pruning that
    replaces O(n²) all-pairs cosine at corpus scale.  The oracle
    replicates assignment + within-cluster pairs in SQL."""
    from hazelcast_jet_spark.operators import similarity

    e = _t(spark, sf_dir, "embeddings")
    pairs = similarity.semantic_dedup_pairs(
        e, _ivf_centroids(), SEMDEDUP_THRESHOLD)
    return pairs.select(
        F.col("centroid_id").cast("int").alias("centroid_id"),
        "id_a", "id_b", "cos_sim",
    ).orderBy("id_a", "id_b")


def event_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-series features (operators/timeseries.event_features):
    sequence position, lag value, inter-event gap, and 5-row rolling
    sum/min/max — ONE shuffle on user_id serves every feature (Catalyst
    reuses the window exec).  Rolling sums accumulate in DECIMAL so the
    result is exact and engine-portable; epoch seconds derive from NTZ
    interval arithmetic, never the session timezone."""
    from hazelcast_jet_spark.operators.timeseries import event_features

    e = _t(spark, sf_dir, "events")
    out = event_features(e, "user_id", "ts", "value", "event_id", rolling_n=5)
    return out.select(
        "event_id", "user_id", "seq", "prev_value", "gap_seconds",
        "rolling_sum_5", "rolling_min_5", "rolling_max_5",
    ).orderBy("user_id", "seq")


def incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup (dedup.minhash_index_build/probe): even-id
    docs are 'yesterday's corpus', persisted as a (buckets, shingles)
    parquet index; odd-id docs are the NEW batch, deduped against the
    index with zero recompute of the existing corpus — the daily-ingest
    shape.  The oracle recomputes both sides from scratch and restricts
    pairs to even×odd; equality proves the persisted index loses
    nothing."""
    import tempfile

    d = _t(spark, sf_dir, "documents")
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(tempfile.gettempdir(), f"spark_graft_lsh_index_{tag}")
    dedup.minhash_index_build(
        d.filter(F.col("doc_id") % 2 == 0), path,
        num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS, k=SHINGLE_K)
    out = dedup.minhash_index_probe(
        spark, path, d.filter(F.col("doc_id") % 2 == 1),
        num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS, k=SHINGLE_K,
        threshold=LSH_THRESHOLD)
    return out.orderBy("index_id", "new_id")


PROFILE_COLS = ["doc_id", "lang", "source", "n_chars"]


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profiling (operators/profile.profile_table): rows /
    nulls / exact distinct / extrema for every profiled column in a
    SINGLE aggregate over one scan (partials combine map-side; only
    per-column scalars reach the reduce).  The gate runs exact distinct
    so the oracle agrees; approx (HLL++, no Expand) is the documented
    100 TB default."""
    from hazelcast_jet_spark.operators.profile import profile_table

    d = _t(spark, sf_dir, "documents")
    return profile_table(d, PROFILE_COLS, exact_distinct=True).orderBy("col_name")


HIST_LO, HIST_HI, HIST_BINS = 0.0, 500.0, 20


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (operators/profile.histogram): map-only IEEE
    binning + one groupBy carrying ≤ bins partials per task — the
    distribution-stats primitive.  Bin edges are plain double
    arithmetic so both engines compute identical ids and edges."""
    from hazelcast_jet_spark.operators.profile import histogram

    e = _t(spark, sf_dir, "events")
    return histogram(e, "value", HIST_LO, HIST_HI, HIST_BINS).orderBy("bin")


def sliding_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level sliding windows (operators/windows.sliding_agg — the
    SlidingWindowP.java:393 deductFn cost-model analog): slide-grain
    frame partials first, so the size/slide explode applies to |frames|
    instead of |rows|.  2h window / 1h slide per event_type; DECIMAL-
    exact sums; identical results to F.window (pinned in pytest — the
    oracle here computes windows independently via per-event explode)."""
    from hazelcast_jet_spark.operators.windows import sliding_agg

    e = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    out = sliding_agg(
        e, "ts", 7200, 3600, ["event_type"],
        {"n_events": F.count(F.lit(1)), "s": F.sum(dec)},
        {"n_events": F.sum("n_events"), "s": F.sum("s")},
    )
    return out.select(
        "event_type", "window_start_epoch", "n_events",
        F.col("s").cast("double").alias("sum_value"),
    ).orderBy("event_type", "window_start_epoch")


def dq_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (operators/profile.quality_checks): orphaned
    foreign keys (one anti-join, broadcast-able key projection),
    duplicate-key violations (one groupBy), and null counts (one
    aggregate) — the pre-training sanity report as three bounded
    scalars, never a row-by-row collect."""
    from hazelcast_jet_spark.operators.profile import quality_checks

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return quality_checks(
        o, c, "o_custkey", "c_custkey",
        unique_cols=["o_orderkey"],
        not_null_cols=["o_custkey", "o_totalprice"],
    )


def mad_outlier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier counts (operators/profile.mad_outliers):
    |x − median| > 3·MAD with both statistics rounded before the compare
    — 50% breakdown point, so outliers cannot drag their own threshold.
    Gate runs the exact sort-based percentile; approx_percentile
    (t-digest partials) is the documented 100 TB path in the same call
    shape."""
    from hazelcast_jet_spark.operators.profile import mad_outliers

    e = _t(spark, sf_dir, "events")
    return mad_outliers(e, "value", "event_type", k=3.0).orderBy("event_type")


VOCAB_SIZE = 256


def tokenize_ids_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale tokenization (text.build_vocab + text.tokenize_ids):
    word-level vocab of the 256 most frequent tokens ((freq desc, term)
    ranking — deterministic), docs encoded to ordered id arrays with
    OOV→0.  Fingerprints the id sequence so the oracle proves order-
    exact equality, not just counts."""
    d = _t(spark, sf_dir, "documents")
    vocab = text.build_vocab(d, size=VOCAB_SIZE)
    out = text.tokenize_ids(d, vocab)
    return out.select(
        "doc_id", "n_tokens", "n_unk",
        F.md5(F.array_join(F.transform(
            "ids", lambda x: x.cast("string")), " ")).alias("ids_fp"),
    ).orderBy("doc_id")


def ks_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS drift (operators/profile.ks_drift): value-
    distribution distance between the even- and odd-id halves of each
    event type — the shape-sensitive drift monitor.  One hash exchange
    serves totals, RANGE-framed cumulative counts (tie-order-free), and
    the final max."""
    from hazelcast_jet_spark.operators.profile import ks_drift

    e = _t(spark, sf_dir, "events")
    ref = e.filter(F.col("event_id") % 2 == 0)
    cur = e.filter(F.col("event_id") % 2 == 1)
    return ks_drift(ref, cur, "value", ["event_type"]).orderBy("event_type")


PSI_LO, PSI_HI, PSI_BINS = 0.0, 64.0, 16  # w = 4.0, exact dyadic


def psi_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned PSI drift (operators/profile.psi_drift): the continuously-
    runnable, fully map-side companion of the exact KS gate — fixed
    [0,64]×16 bins with edge clamping, Laplace-smoothed shares, DECIMAL
    term accumulation."""
    from hazelcast_jet_spark.operators.profile import psi_drift

    e = _t(spark, sf_dir, "events")
    ref = e.filter(F.col("event_id") % 2 == 0)
    cur = e.filter(F.col("event_id") % 2 == 1)
    return psi_drift(ref, cur, "value", PSI_LO, PSI_HI, PSI_BINS,
                     ["event_type"]).orderBy("event_type")


def categorical_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift (operators/profile.categorical_drift): chi2 /
    Cramér's V / Jensen–Shannon between the even- and odd-id halves'
    event_type distributions, grouped by [0,64]/16 value band — the
    discrete companion of the ks/psi/w1 numeric drift gates."""
    from hazelcast_jet_spark.operators.profile import categorical_drift

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull()).withColumn(
        "value_band",
        F.greatest(F.least(F.floor(F.col("value").cast("double") / 16),
                           F.lit(3)), F.lit(0)).cast("int"))
    ref = e.filter(F.col("event_id") % 2 == 0)
    cur = e.filter(F.col("event_id") % 2 == 1)
    return categorical_drift(ref, cur, "event_type",
                             ["value_band"]).orderBy("value_band")


COPURCHASE_MAX_GROUP = 64  # order baskets are small; the cap guards hot groups


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hazelcast_jet_spark.operators.graph import cooccurrence_edges

    li = _t(spark, sf_dir, "lineitem")
    return cooccurrence_edges(li, "l_orderkey", "l_partkey",
                              max_group=COPURCHASE_MAX_GROUP)


def copurchase_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural summary (operators/graph.graph_summary) of the
    part co-purchase graph: nodes/edges, degree extremes, wedges,
    triangles (ordered-edge join — each a<b<c once), global clustering
    coefficient.  Edges enumerate in-task from per-order sorted part
    lists (max_group cap = the market-basket hot-group guard)."""
    from hazelcast_jet_spark.operators.graph import graph_summary

    return graph_summary(_copurchase_edges(spark, sf_dir))


PAGERANK_ITERS, PAGERANK_DAMPING = 3, 0.85


def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (operators/graph.pagerank) over the
    co-purchase graph — the link-analysis quality prior (Page et al.
    1999), deterministic by DECIMAL contribution accumulation: top 20
    parts by rank with id tie-break."""
    from hazelcast_jet_spark.operators.graph import pagerank

    pr = pagerank(_copurchase_edges(spark, sf_dir),
                  iters=PAGERANK_ITERS, damping=PAGERANK_DAMPING)
    return (pr.select(F.col("node").alias("part"), "pagerank")
            .orderBy(F.desc("pagerank"), "part").limit(20))


PPR_SEED_MOD = 97


def ppr_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (graph.personalized_pagerank; Page et al.
    1999 §6, Jeh & Widom 2003): teleport restricted to the seed parts
    (partkey % 97 == 0) — rank measures co-purchase proximity TO the
    seed set, the related-items / seed-expansion primitive global
    q:pagerank_copurchase cannot express.  Same DECIMAL-exact iteration
    body; the oracle unrolls the identical 3 rounds with the seeded
    base term."""
    from hazelcast_jet_spark.operators.graph import personalized_pagerank

    # materialize the enumeration ONCE: seeds derive from the same edge
    # table the iteration consumes, and without this the co-occurrence
    # explode executes twice (once for the operator's internal edge
    # checkpoint, once under the seed-distinct subtree)
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    seeds = (edges.select(F.col("src").alias("node"))
             .unionAll(edges.select(F.col("dst").alias("node")))
             .filter(F.col("node") % PPR_SEED_MOD == 0).distinct())
    pr = personalized_pagerank(edges, seeds, iters=PAGERANK_ITERS,
                               damping=PAGERANK_DAMPING)
    return (pr.select(F.col("node").alias("part"), "pagerank")
            .orderBy(F.desc("pagerank"), "part").limit(20))


SLIDING_DISTINCT_K = 4096


def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct-user counts via mergeable KMV sketches
    (operators/windows.sliding_distinct): distinct is NOT decomposable,
    so the two-level frame plan merges per-frame k-minimum-values
    sketches instead of raw values — bounded at k strings per (key,
    frame) where exact distinct would shuffle every user id.  k=4096
    exceeds any window's true cardinality at gate scale, so the sketch
    answer is EXACT and the oracle is plain count(DISTINCT) per
    window."""
    from hazelcast_jet_spark.operators.windows import sliding_distinct

    e = _t(spark, sf_dir, "events")
    out = sliding_distinct(e, "ts", 7200, 3600, ["event_type"], "user_id",
                           k=SLIDING_DISTINCT_K, count_col="n_users")
    return out.orderBy("event_type", "window_start_epoch")


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (operators/timeseries.sessionize — the batch
    twin of session windows, SessionWindowP.java:79, as the lag-gap +
    running-sum composition): per user, number of 30-minute-inactivity
    sessions and events per session — ONE shuffle on the key serves the
    flag and the numbering."""
    from hazelcast_jet_spark.operators.timeseries import sessionize

    e = _t(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", gap="30 minutes", id_col="event_id")
    return (
        s.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id", "session_id")
    )


ASOF_TOLERANCE_S = 3600


def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-staleness bound (operators/joins.asof_join
    tolerance — pandas merge_asof parity): purchases enriched with the
    latest click value, but only when the click is within 1 hour; staler
    matches resolve to NULL.  Same one-window carry plan; the oracle is
    DuckDB's native ASOF JOIN with the matched time selected and the
    bound applied as a post-CASE."""
    from hazelcast_jet_spark.operators.joins import asof_join

    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value")
    out = asof_join(purchases, clicks, "user_id", "ts", ["value"],
                    tolerance=ASOF_TOLERANCE_S)
    return out.select(
        "event_id", "user_id",
        F.col("value").alias("purchase_value"),
        F.col("asof_value").alias("recent_click_value"),
    ).orderBy("event_id")


# -- r5 session 4 -----------------------------------------------------------

CMS_WIDTH = 512
CMS_DEPTH = 4
CMS_SEED = "cm0"
CMS_PROBE_TERMS = ("the", "data", "spark", "value", "row", "zz-absent")


def temperature_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balanced temperature sampling (operators/sampling.
    temperature_sample, UniMax recipe at T=2): per-lang keep rate
    sqrt(n_min/n_g) — division and square root are IEEE correctly
    rounded, so the rate doubles and hex thresholds are bit-identical
    in any engine.  Plan: one tiny per-lang aggregate, rates broadcast
    back, keep decision a map-only string compare — the corpus is never
    shuffled."""
    from hazelcast_jet_spark.operators.sampling import temperature_sample

    d = _t(spark, sf_dir, "documents")
    out = temperature_sample(d, "lang", "doc_id", alpha=0.5, seed="tmp0")
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.sum("n_chars").alias("chars_kept"))
        .orderBy("lang")
    )


def cohort_retention_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix (operators/timeseries.
    cohort_retention): users bucketed by first-activity week, counted in
    each later week they return.  Three strictly-shrinking hash
    exchanges — (user, week) distinct, per-user min, (cohort, offset)
    count — with no count-distinct state anywhere (the distinct step
    makes plain counts exact).  Week bins are FLOOR(epoch/604800) over
    NTZ wall-clock epochs: session-tz-free, so any engine bins
    identically."""
    from hazelcast_jet_spark.operators.timeseries import cohort_retention

    e = _t(spark, sf_dir, "events")
    out = cohort_retention(e, "user_id", "ts", period_seconds=604800)
    return out.orderBy("cohort_period", "period_offset")


def count_min_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point-frequency estimates (operators/sketch.
    count_min_build/estimate, Cormode & Muthukrishnan 2005): word
    frequencies of the document corpus compressed into a 4×512 counter
    grid (bounded shuffle: map-side combine caps each task's output at
    depth×width longs regardless of vocabulary), probed for a fixed
    term watchlist next to the exact counts — estimate ≥ exact always;
    the absent probe shows pure collision mass.  Hashes are md5
    arithmetic an oracle replays bit-for-bit."""
    from hazelcast_jet_spark.operators.sketch import (
        count_min_build, count_min_estimate)

    d = _t(spark, sf_dir, "documents")
    toks = d.filter(F.col("text").isNotNull()).select(
        F.explode(text.tokens(F.col("text"))).alias("term"))
    # ONE tokenize pass: the exact per-term counts feed BOTH the sketch
    # (weight_col build — counter-identical to hashing every occurrence)
    # and the exact comparison column; checkpointed so the corpus scan
    # does not re-execute per consumer (r12, guide §2.3/§2.4 — before:
    # two full explode+aggregate passes over the documents)
    exact = (toks.groupBy("term").agg(F.count(F.lit(1)).alias("_n"))
             .localCheckpoint())
    sk = count_min_build(exact, "term", width=CMS_WIDTH, depth=CMS_DEPTH,
                         seed=CMS_SEED, weight_col="_n")
    probes = spark.createDataFrame(
        [(t,) for t in CMS_PROBE_TERMS], "term: string")
    est = count_min_estimate(sk, probes, "term", depth=CMS_DEPTH,
                             width=CMS_WIDTH, seed=CMS_SEED)
    return (
        est.join(exact, est["key"] == exact["term"], "left")
        .select("key", "cm_estimate",
                F.coalesce("_n", F.lit(0)).alias("exact_n"))
        .orderBy("key")
    )


def table_diff_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (storage.snapshot_diff): two deterministic views of
    orders — 'yesterday' drops keys %3==0, 'today' drops %5==0 and bumps
    o_totalprice on %7==0 — classified added/removed/changed by ONE full
    outer join on the key (NULL-safe value compare).  Counts + key
    checksums per class pin the whole diff."""
    from hazelcast_jet_spark.storage import snapshot_diff

    o = _t(spark, sf_dir, "orders")
    old = (o.filter(F.col("o_orderkey") % 3 != 0)
           .select("o_orderkey", "o_totalprice"))
    new = (o.filter(F.col("o_orderkey") % 5 != 0)
           .select("o_orderkey",
                   F.when(F.col("o_orderkey") % 7 == 0,
                          F.col("o_totalprice") + 1.0)
                   .otherwise(F.col("o_totalprice")).alias("o_totalprice")))
    diff = snapshot_diff(old, new, ["o_orderkey"],
                         compare_cols=["o_totalprice"])
    return (
        diff.groupBy("change")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("o_orderkey").alias("key_sum"))
        .orderBy("change")
    )


def ngram_novelty_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus freshness (operators/text.ngram_novelty): per-doc fraction
    of distinct 3-grams unseen in any LOWER doc_id — aggregated per
    source.  Two bounded shuffles (per-gram MIN(doc_id), then per-doc
    reduce) — linear in gram volume, no pair enumeration however deep
    the duplication."""
    from hazelcast_jet_spark.operators.text import ngram_novelty

    d = _t(spark, sf_dir, "documents")
    nov = ngram_novelty(d, "doc_id", "text", n=3)
    return (
        nov.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_grams").alias("total_grams"),
             F.sum("n_novel").alias("total_novel"))
        .orderBy("source")
    )


def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed interval-overlap join (operators/joins.interval_join):
    lineitems of the SAME order whose discounted-price bands
    ``[price·(1-disc), price)`` intersect (half-open; zero-discount
    degenerate spans dropped) — an equi-join on the order key with the
    overlap predicate as residual, never a nested-loop.  Per-order pair
    counts pin the full pair set; the band arithmetic is one double
    multiply, bit-identical in any engine."""
    from hazelcast_jet_spark.operators.joins import interval_join

    li = _t(spark, sf_dir, "lineitem")
    lo = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
    a = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_linenumber").alias("ln_a"),
                  lo.alias("sa"), F.col("l_extendedprice").alias("ea"))
    b = li.select(F.col("l_orderkey").alias("k"),
                  F.col("l_linenumber").alias("ln_b"),
                  lo.alias("sb"), F.col("l_extendedprice").alias("eb"))
    pairs = interval_join(a, b, ("sa", "ea"), ("sb", "eb"), on=["k"],
                          extra_cond=F.col("ln_a") < F.col("ln_b"))
    return (
        pairs.groupBy(F.col("k").alias("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("o_orderkey")
    )


def interval_grid_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-keyed interval-overlap join in GRID mode (operators/joins.
    interval_join): every (view, purchase) event pair whose 300-second
    windows intersect — both sides explode to 300 s bins, the join is a
    plain equi-join on the bin id, and owner-bin filtering emits each
    pair exactly once.  The oracle is the raw THETA join: equality
    proves the grid decomposition lossless and duplicate-free.  A raw
    Spark theta join here would plan BroadcastNestedLoop; the grid
    shape is shuffle-partitioned and AQE-skew-splittable."""
    from hazelcast_jet_spark.operators.joins import interval_join
    from hazelcast_jet_spark.operators.timeseries import _epoch_seconds

    e = _t(spark, sf_dir, "events")
    ep = _epoch_seconds(e, "ts")
    base = e.select("event_id", "event_type", ep.alias("t"))
    views = base.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"), F.col("t").alias("vs"),
        (F.col("t") + 300).alias("ve"))
    purchases = base.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), F.col("t").alias("ps"),
        (F.col("t") + 300).alias("pe"))
    pairs = interval_join(views, purchases, ("vs", "ve"), ("ps", "pe"),
                          bin_width=300.0)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("vid").alias("vid_sum"),
        F.sum("pid").alias("pid_sum"),
    )


def w1_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Wasserstein-1 drift (operators/profile.w1_drift): the
    integral companion of the KS gate — same even-vs-odd halves per
    event type, answering "how much mass moved how far" in value units
    where KS reports only the supremum.  Two strictly-shrinking
    exchanges: distinct-value compaction absorbs ties, then one group
    window; terms accumulate in DECIMAL so the sum is order-free."""
    from hazelcast_jet_spark.operators.profile import w1_drift

    e = _t(spark, sf_dir, "events")
    ref = e.filter(F.col("event_id") % 2 == 0)
    cur = e.filter(F.col("event_id") % 2 == 1)
    return w1_drift(ref, cur, "value", ["event_type"]).orderBy("event_type")


def spearman_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (profile.spearman_corr; Spearman 1904)
    of quantity vs extended price per return flag — the monotone-
    association companion of q:corr_matrix_lineitem's Pearson; the
    heavy integer ties in quantity exercise the midrank convention
    ((2·rank+t−1)/2) on both engines.  One group exchange serves both
    rank windows; DECIMAL-exact rank moments."""
    from hazelcast_jet_spark.operators.profile import spearman_corr

    li = _t(spark, sf_dir, "lineitem")
    return spearman_corr(
        li.select("l_returnflag",
                  F.col("l_quantity").cast("double").alias("qty"),
                  F.col("l_extendedprice").cast("double").alias("price")),
        "qty", "price", ["l_returnflag"]).orderBy("l_returnflag")


def cvm_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Cramér–von Mises drift (profile.cvm_drift;
    Anderson 1962): the integrated-square statistic completing the
    drift triad on the same even-vs-odd halves — KS gives the supremum
    point, W1 the mass moved, CvM the whole-curve squared discrepancy
    that catches many small deviations a supremum dilutes.  Same
    two-shrinking-exchange plan as q:w1_drift_events; DECIMAL-
    accumulated terms."""
    from hazelcast_jet_spark.operators.profile import cvm_drift

    e = _t(spark, sf_dir, "events")
    ref = e.filter(F.col("event_id") % 2 == 0)
    cur = e.filter(F.col("event_id") % 2 == 1)
    return cvm_drift(ref, cur, "value", ["event_type"]).orderBy("event_type")


SCM_WIDTH = 256
SCM_SEED = "scm"


def streaming_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Count-Min maintenance: the same
    sketch.count_min_build composition applied to readStream — a live
    depth×width frequency summary maintained in complete mode (bounded
    state: ≤ depth·width counters however high the stream rate).
    availableNow on bounded input makes the counters deterministic, so
    the batch SQL replay of the md5 bucket arithmetic is the exact
    oracle.  The full counter grid is returned — the strongest pin."""
    from hazelcast_jet_spark.operators.sketch import count_min_build
    from hazelcast_jet_spark.streaming.run import (
        read_stream_table, run_to_batch)

    e = read_stream_table(spark, sf_dir, "events")
    sk = count_min_build(e, "user_id", width=SCM_WIDTH, depth=CMS_DEPTH,
                         seed=SCM_SEED)
    return run_to_batch(sk, "complete").orderBy("cm_row", "cm_bucket")


def streaming_psi_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING drift monitor: per-day PSI of the live value
    distribution against the full-corpus reference — the live
    data-quality dashboard shape.  The STREAM maintains only the
    per-(day, bin) counts (complete mode; bounded state: days × bins
    cells however high the rate); PSI derives batch-side from the
    final counts with operators/profile.psi_drift's exact conventions
    (clamped [lo,hi] equi-width bins, Laplace alpha=0.5, occupied-bin
    sum, ln terms in DECIMAL(18,12)).  Day buckets come from tz-free
    integer epoch seconds; availableNow on bounded input makes the
    counters deterministic, so the batch SQL replay is the exact
    oracle."""
    from hazelcast_jet_spark.streaming.run import (
        read_stream_table, run_to_batch)

    w = (PSI_HI - PSI_LO) / PSI_BINS
    alpha = 0.5

    def _bin(x):
        return F.greatest(
            F.least(F.floor((x - F.lit(PSI_LO)) / F.lit(w)),
                    F.lit(PSI_BINS - 1)),
            F.lit(0)).cast("int")

    e = read_stream_table(spark, sf_dir, "events")
    sec = F.floor(F.expr(
        "timestampdiff(MICROSECOND, "
        "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), ts)") / F.lit(1e6))
    x = F.col("value").cast("double")
    cur = run_to_batch(
        e.filter(x.isNotNull())
        .select(F.floor(sec / F.lit(86400)).alias("day"),
                _bin(x).alias("bin"))
        .groupBy("day", "bin").agg(F.count(F.lit(1)).alias("c_cur")),
        "complete")
    b = _t(spark, sf_dir, "events")
    bx = F.col("value").cast("double")
    ref = (
        b.filter(bx.isNotNull())
        .select(_bin(bx).alias("bin"))
        .groupBy("bin").agg(F.count(F.lit(1)).alias("c_ref"))
    )
    ref_tot = ref.agg(F.sum("c_ref").alias("n_ref"))
    day_tot = cur.groupBy("day").agg(F.sum("c_cur").alias("n_cur"))
    # the day list is bounded (one row per observed day) and must not
    # share the memory-sink lineage with cur (self-join attribute
    # conflict) — collect it and rebuild a literal frame
    days = spark.createDataFrame(
        [(int(r["day"]),) for r in cur.select("day").distinct().collect()],
        "day bigint")
    grid = ref.crossJoin(days)
    j = (
        grid.join(cur, ["day", "bin"], "left")
        .select("day", "c_ref",
                F.coalesce("c_cur", F.lit(0)).alias("c_cur"))
        .join(F.broadcast(day_tot), "day")
        .crossJoin(F.broadcast(ref_tot))
        .select("day", "n_ref", "n_cur", "c_ref", "c_cur")
    )
    p = (F.col("c_ref") + F.lit(alpha)) / (F.col("n_ref")
                                           + F.lit(alpha * PSI_BINS))
    q = (F.col("c_cur") + F.lit(alpha)) / (F.col("n_cur")
                                           + F.lit(alpha * PSI_BINS))
    term = ((p - q) * F.log(p / q)).cast("decimal(18,12)")
    return (
        j.groupBy("day")
        .agg(F.first("n_ref").alias("n_ref"),
             F.first("n_cur").alias("n_cur"),
             F.round(F.sum(term).cast("double"), 6).alias("psi"))
        .orderBy("day")
    )


#: fixed merge list for the BPE gate — a real hierarchy ("table" built in
#: 4 steps); bpe_fit-learned lists are pinned against the reference
#: implementation in pytest (iterative fit is not SQL-expressible)
BPE_MERGES = [("t", "a"), ("a", "</w>"), ("ta", "b"), ("l", "e"),
              ("tab", "le")]


def bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE segmentation (operators/bpe.bpe_apply_pandas): the corpus
    encoded with a FIXED merge hierarchy — greedy left-to-right
    non-overlapping passes, memoized per DISTINCT word in Arrow batches
    — then symbol frequencies.  The gate runs the production
    (full-size-tokenizer) pandas path; it is equality-pinned against
    the all-JVM :func:`bpe_segments` fold in pytest, whose deep
    per-merge expression tree costs ~10 s of one-time Catalyst codegen
    at gate scale (the r5 bench tail item) while computing the
    identical result.  The oracle replays each fold as a
    delimited-string ``replace`` (provably the same left-to-right
    non-overlapping semantics)."""
    from hazelcast_jet_spark.operators.bpe import bpe_apply_pandas

    d = _t(spark, sf_dir, "documents")
    enc = bpe_apply_pandas(
        d.filter(F.col("text").isNotNull()).select("text"),
        "text", BPE_MERGES)
    return (
        enc.select(F.explode("bpe_syms").alias("sym"))
        .groupBy("sym").agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sym")
    )


def resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series regularization (operators/timeseries.resample): per-type
    hourly means on a MATERIALIZED gap-free grid with forward fill —
    grid rows explode from per-key min/max sequence (never a calendar
    cross join), the rejoin reuses the aggregate's partitioning, and
    the fill is one ordered window (last ignorenulls).  Means are
    DECIMAL-sum/double-count so every engine computes the identical
    double before the 6 dp round."""
    from hazelcast_jet_spark.operators.timeseries import resample

    e = _t(spark, sf_dir, "events")
    out = resample(e, "event_type", "ts", "value", 3600, fill="ffill")
    return out.select(
        "event_type", "period",
        F.round("value", 6).alias("value"), "observed",
    ).orderBy("event_type", "period")


def anomaly_band_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling control-band anomalies (operators/timeseries.
    anomaly_flags): per-user bands from the PRECEDING 10 points
    (current excluded — no self-masking), flag at 2.5 sample stddevs,
    no band below 5 points of history.  One key exchange; count / exact
    DECIMAL sum / sum-of-squares ride a single window frame, so mean
    and std are identical doubles in any engine.  Corpus-level counts +
    an id checksum of the flagged set pin the full flag vector."""
    from hazelcast_jet_spark.operators.timeseries import anomaly_flags

    e = _t(spark, sf_dir, "events")
    out = anomaly_flags(e, "user_id", "ts", "value", "event_id",
                        window_n=10, k=2.5, min_history=5)
    return out.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.count("mean").alias("n_banded"),
        F.sum(F.col("is_anomaly").cast("bigint")).alias("n_anomalies"),
        F.sum(F.when(F.col("is_anomaly"), F.col("event_id")))
        .alias("anomaly_id_sum"),
    )


NEG_K, NEG_SEED = 3, "neg0"


def negative_samples_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling (operators/sampling.
    negative_sample): 3 pseudo-random non-matching parts per sampled
    lineitem — md5-indexed draws from the part table, self-collisions
    dropped; per-draw counts + part-id checksums."""
    from hazelcast_jet_spark.operators.sampling import negative_sample

    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_orderkey") % 100 == 1)
          .withColumn("pair_key", F.concat_ws(
              "-", F.col("l_orderkey"), F.col("l_linenumber"))))
    items = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"))
    out = negative_sample(li, items, NEG_K, "pair_key", "l_partkey",
                          seed=NEG_SEED)
    return (
        out.groupBy("j").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("negative").alias("neg_sum"))
        .orderBy("j")
    )


SEASONAL_PERIOD = 24


def seasonal_decompose_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition (operators/timeseries.
    seasonal_decompose): centered-MA trend (full frames only),
    per-position centered seasonal profile, residuals — summarized per
    (event_type, position) with DECIMAL component sums."""
    from hazelcast_jet_spark.operators.timeseries import seasonal_decompose

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = seasonal_decompose(e, "event_type", "ts", "value", "event_id",
                             period=SEASONAL_PERIOD)
    return (
        out.groupBy("event_type", "pos").agg(
            F.count(F.lit(1)).alias("n"),
            F.count("trend").alias("n_trended"),
            F.min("seasonal").alias("seasonal"),
            dsum("trend").alias("trend_sum"),
            dsum("resid").alias("resid_sum"))
        .orderBy("event_type", "pos")
    )


CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass pairwise Pearson matrix (operators/profile.
    correlation_matrix) over the four lineitem measures: every pair
    from a single scan with DECIMAL-exact sums/cross-products, listwise
    NULL handling."""
    from hazelcast_jet_spark.operators.profile import correlation_matrix

    li = _t(spark, sf_dir, "lineitem")
    return correlation_matrix(li, list(CORR_COLS)).orderBy("col_x", "col_y")


def _corr_matrix_sql(cols) -> str:
    """DuckDB twin of profile.correlation_matrix (same listwise filter,
    DECIMAL accumulation, and fixed-order corr expression)."""
    nn = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    for i, c in enumerate(cols):
        v = f"CAST({c} AS DOUBLE)"
        aggs.append(f"CAST(SUM(CAST({v} AS DECIMAL(28,12))) AS DOUBLE) AS s{i}")
        aggs.append(f"CAST(SUM(CAST({v} * {v} AS DECIMAL(28,12))) AS DOUBLE)"
                    f" AS q{i}")
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            vi, vj = f"CAST({cols[i]} AS DOUBLE)", f"CAST({cols[j]} AS DOUBLE)"
            aggs.append(f"CAST(SUM(CAST({vi} * {vj} AS DECIMAL(28,12)))"
                        f" AS DOUBLE) AS x{i}_{j}")
    sels = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            num = f"(CAST(n AS DOUBLE) * x{i}_{j} - s{i} * s{j})"
            den = (f"(sqrt(CAST(n AS DOUBLE) * q{i} - s{i} * s{i})"
                   f" * sqrt(CAST(n AS DOUBLE) * q{j} - s{j} * s{j}))")
            sels.append(
                f"SELECT '{cols[i]}' AS col_x, '{cols[j]}' AS col_y, n,"
                f" round(CASE WHEN {den} > 0 THEN {num} / {den} END, 6)"
                f" AS corr FROM a")
    return (f"WITH a AS (SELECT {', '.join(aggs)} FROM lineitem WHERE {nn})"
            + " " + " UNION ALL ".join(sels)
            + " ORDER BY col_x, col_y")


KCENTER_K = 5


def coreset_kcenter_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (operators/clustering.
    coreset_kcenter): diversity-maximizing embedding pruning — lowest-id
    seed, then farthest-point iterations with rounded-L2 running
    minima and id tie-breaks, map-only per pass."""
    from hazelcast_jet_spark.operators.clustering import coreset_kcenter

    e = _t(spark, sf_dir, "embeddings")
    return coreset_kcenter(e, KCENTER_K).orderBy("sel_order")


def benford_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit (operators/profile.benford_digits) of
    order totals: string-exact integer-part digit extraction (no
    log/pow ulp risk), full 9-digit grid with zero-fill, per-digit
    Pearson chi2 terms against Python-precomputed log10(1+1/d)
    literals — no engine evaluates a log anywhere."""
    from hazelcast_jet_spark.operators.profile import benford_digits

    o = _t(spark, sf_dir, "orders")
    return benford_digits(o, "o_totalprice").orderBy("digit")


ACF_LAGS = (1, 2, 3)


def acf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (operators/timeseries.acf) of event
    values per type at lags 1-3: full-series-mean ACF with DECIMAL
    cross-product accumulation on ONE key window exchange."""
    from hazelcast_jet_spark.operators.timeseries import acf

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return (acf(e, "event_type", "ts", "value", "event_id",
                lags=list(ACF_LAGS))
            .orderBy("key", "lag"))


CHANGEPOINT_W = 50


def changepoint_shift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift changepoint detection (operators/timeseries.
    changepoint_scores): sliding two-sample mean shift + Welch z over
    full before/after frames of one window exchange; the strongest
    |z| point per event type (id tie-break) — the regime-change
    companion of the anomaly-band gate."""
    from hazelcast_jet_spark.operators.timeseries import changepoint_scores

    e = _t(spark, sf_dir, "events")
    out = changepoint_scores(e, "event_type", "ts", "value", "event_id",
                             window_n=CHANGEPOINT_W)
    # materialization barrier before the rank: without it the rank
    # window re-sorts the scorer's WIDE internal rows (the Window
    # operator's 88 staged struct columns flow into the second sort —
    # multi-KB/row) and the stage measured 4.1 s; ranking the
    # materialized 6-column table runs the same plan in 2.2 s
    # (plans/r12/changepoint_shift_events_*.txt; guide §2.3 "project
    # before the exchange" applied to a window buffer).
    out = out.select("event_type", "event_id", "mean_before", "mean_after",
                     "shift", "zscore").localCheckpoint()
    w = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("zscore")).desc(), "event_id")
    return (
        out.filter(F.col("zscore").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", "event_id", "mean_before", "mean_after",
                "shift", "zscore")
        .orderBy("event_type")
    )


HLL_P = 4


def hll_cardinality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog cardinality sketch (operators/sketch.hll_build/
    hll_estimate; Flajolet et al. 2007 — the Hazelcast
    CardinalityEstimator analog): distinct users per event type through
    a 16-register HLL next to the exact count.  Register index and rho
    are md5 hex-string arithmetic the oracle replays bit-for-bit; the
    harmonic sum is carried integer-exact (absent registers count 2^57)
    so the only floating op is the final correctly-rounded division —
    the estimate is exact-hash-gate safe in this regime (true
    cardinality >> 2.5m keeps the ln correction branch cold).  The gate
    surfaces hll_sum as BIGINT — its maximum is m*2^57 = 2^61 < 2^63,
    and >18-precision decimals are not representation-safe across the
    driver's typed-hash path (r5 red row; tests/test_oracle_parity.py
    now rejects them)."""
    from hazelcast_jet_spark.operators.sketch import hll_build, hll_estimate

    e = _t(spark, sf_dir, "events")
    sk = hll_build(e, "user_id", ["event_type"], p=HLL_P)
    est = hll_estimate(sk, ["event_type"], p=HLL_P)
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"))
    return (
        est.join(exact, "event_type")
        .select("event_type", "hll_registers", "hll_zero_registers",
                F.col("hll_sum").cast("bigint").alias("hll_sum"),
                "hll_estimate", "exact_distinct")
        .orderBy("event_type")
    )


QSK_K = 256


def quantile_sketch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch (sketch.quantile_sketch —
    the 5th mergeable sketch beside KMV/MG/CMS/HLL): per event_type, a
    k=256 bottom-k-by-md5(event_id) uniform row sample; p50/p90 order
    statistics of the sample beside the exact percentiles.  One
    exchange carries sketch AND exact (same groupBy); at 100 TB the
    sharded twin bounds partial state (pytest bit-identity pin)."""
    from hazelcast_jet_spark.operators.sketch import (
        quantile_estimate, quantile_sketch)

    e = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90_exact"),
        quantile_sketch("value", "event_id", k=QSK_K).alias("__sk"),
    )
    return agg.select(
        "event_type", "n_rows",
        F.size("__sk").alias("n_sample"),
        quantile_estimate(F.col("__sk"), 0.5).alias("p50_est"),
        quantile_estimate(F.col("__sk"), 0.9).alias("p90_est"),
        "p50_exact", "p90_exact",
    ).orderBy("event_type")


def streaming_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING quantile-sketch maintenance: the same deterministic
    bottom-k-by-md5 sketch (sketch.quantile_sketch) plus the exact
    percentiles, maintained live in ONE complete-mode aggregation over
    readStream — the order-statistics lane joining the CMS/HLL
    streaming sketch twins.  The bottom-k buffer is mergeable across
    micro-batches by the KMV argument (the global bottom-k of a union
    lives in the union of bottom-ks), so batch boundaries cannot change
    the sketch; availableNow on bounded input makes the batch SQL the
    exact oracle (shared with q:quantile_sketch_events).  State bound:
    one row per event_type, each carrying a ≤k sample buffer plus the
    exact-percentile buffer (values per type — the complete-mode exact
    leg; drop it and keep the sketch for O(k)-state production runs)."""
    from hazelcast_jet_spark.operators.sketch import (
        quantile_estimate, quantile_sketch)
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = (read_stream_table(spark, sf_dir, "events")
         .filter(F.col("value").isNotNull()))
    agg = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90_exact"),
        quantile_sketch("value", "event_id", k=QSK_K).alias("__sk"),
    )
    # bound the state-partition count for the run (5 keys; a default of
    # 200 state stores is pure overhead) — restored afterwards
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        out = run_to_batch(agg, "complete")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select(
        "event_type", "n_rows",
        F.size("__sk").alias("n_sample"),
        quantile_estimate(F.col("__sk"), 0.5).alias("p50_est"),
        quantile_estimate(F.col("__sk"), 0.9).alias("p90_est"),
        "p50_exact", "p90_exact",
    ).orderBy("event_type")


AR_MIN_PAIR, AR_MAX_BASKET, AR_TOPK = 3, 64, 20


def association_rules_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (graph.association_rules) over
    order->part baskets: pair-tier Apriori with support/confidence/lift,
    top-20 by lift.  The rule-mining companion of copurchase_graph_stats
    (same in-task pair enumeration, same hot-basket cap)."""
    from hazelcast_jet_spark.operators.graph import association_rules

    l = _t(spark, sf_dir, "lineitem")
    return association_rules(
        l, "l_orderkey", "l_partkey",
        min_pair_count=AR_MIN_PAIR, max_basket=AR_MAX_BASKET,
        top_k=AR_TOPK)


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event streams
    (timeseries.event_transitions): one key exchange orders the
    streams; the K^2-bounded pair table carries counts + row-normalized
    probabilities."""
    from hazelcast_jet_spark.operators.timeseries import event_transitions

    e = _t(spark, sf_dir, "events")
    return event_transitions(e)


def readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syllable-heuristic readability metrics (text.readability):
    map-only vowel-group counting over the normalized token stream —
    words, syllables, complex-word fraction, Flesch-proxy score."""
    from hazelcast_jet_spark.operators.text import readability

    d = _t(spark, sf_dir, "documents")
    return readability(d).orderBy("doc_id")


def gini_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Gini concentration of order value
    (profile.gini_concentration): exact rank-formula Gini with
    DECIMAL-accumulated terms — one exchange serves rank window and
    final aggregate."""
    from hazelcast_jet_spark.operators.profile import gini_concentration

    o = _t(spark, sf_dir, "orders")
    return gini_concentration(
        o, ["o_orderpriority"], "o_totalprice").orderBy("o_orderpriority")


def theil_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality with between/within-nation decomposition
    (profile.theil_decomposition; Theil 1967, Shorrocks 1980) of
    per-customer spend — the question Gini (q:gini_value_orders)
    cannot answer: does spend concentration live BETWEEN nations
    (rebalance the mix) or WITHIN them (rebalancing won't help)?
    One scan to bounded per-nation decimal moments; per-row x·ln x is
    the only transcendental, absorbed by round-6."""
    from hazelcast_jet_spark.operators.profile import theil_decomposition

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    units = (o.groupBy("o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(28,12)"))
                  .cast("double").alias("spend"))
             .join(c.select(F.col("c_custkey").alias("o_custkey"),
                            "c_nationkey"), "o_custkey"))
    return theil_decomposition(units, "c_nationkey", "spend")


def source_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix (dedup.source_overlap) at the
    shingle grain: shared word 3-shingles + Jaccard overlap per source
    pair — phrase-level contamination, nonzero long before whole
    documents collide.  Payloads never shuffle, only shingles and
    source names."""
    from hazelcast_jet_spark.operators.dedup import source_overlap

    d = _t(spark, sf_dir, "documents")
    return source_overlap(d, unit="shingle", shingle_k=SHINGLE_K)


WFILL_FRAC = 0.6


def mixture_allocation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling training-mixture allocator
    (sampling.waterfill_allocation): 60% of total corpus chars split
    max-min-fair across sources — small sources taken whole, large ones
    capped at the closed-form fill level."""
    from hazelcast_jet_spark.operators.sampling import waterfill_allocation

    d = _t(spark, sf_dir, "documents")
    return waterfill_allocation(d, "source", "n_chars", WFILL_FRAC)


CALIB_BINS, CALIB_LO, CALIB_HI = 10, -15.0, 15.0


def classifier_calibration_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE contributions
    (profile.calibration_bins; Naeini et al. 2015) of the hashed
    quality classifier's raw scores against the lang=='en' label —
    the "is the filter's confidence trustworthy?" audit downstream of
    quality_classifier_scores.  Raw scores, not the sigmoid: prob is
    monotone-but-not-bit-exact across engines (the
    hashed_classifier_score docstring's own caveat)."""
    from hazelcast_jet_spark.operators.importance import (
        hashed_classifier_score)
    from hazelcast_jet_spark.operators.profile import calibration_bins

    d = _t(spark, sf_dir, "documents")
    scored = hashed_classifier_score(
        d, _cls_weights(), bucket_hex=DSIR_BUCKET_HEX, bias=CLS_BIAS)
    labeled = scored.join(d.select("doc_id", "lang"), "doc_id").select(
        "score", (F.col("lang") == "en").alias("is_en"))
    return calibration_bins(labeled, "score", "is_en",
                            n_bins=CALIB_BINS, lo=CALIB_LO, hi=CALIB_HI)


def source_divergence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence of source unigram
    distributions (text.source_term_divergence): the distribution-level
    "which corpora speak the same language?" matrix beside
    source_overlap's shared-unit counts; inner-join-only decomposition,
    DECIMAL-accumulated terms."""
    from hazelcast_jet_spark.operators.text import source_term_divergence

    d = _t(spark, sf_dir, "documents")
    return source_term_divergence(d)


TOPMASS_P = 0.5


def top_mass_selection_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus-style top-p selection (sampling.top_mass_selection): per
    source, the shortest biggest-first prefix of documents carrying 50%
    of the char mass — the concentration-adaptive pruning rule (skewed
    sources keep few docs, flat ones many).  Integer-exact keep
    predicate, one group exchange."""
    from hazelcast_jet_spark.operators.sampling import top_mass_selection

    d = _t(spark, sf_dir, "documents")
    return top_mass_selection(d, "source", "n_chars", "doc_id",
                              p=TOPMASS_P)


HILL_K = 100


def hill_tail_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill power-law tail-index estimate (profile.hill_tail_index) of
    order values per priority — the distributional "will one record
    dominate this aggregate?" audit beside key_skew's observed counts;
    one rank window keeps k+1 rows per group, DECIMAL-accumulated ln
    terms."""
    from hazelcast_jet_spark.operators.profile import hill_tail_index

    o = _t(spark, sf_dir, "orders")
    return hill_tail_index(o, ["o_orderpriority"], "o_totalprice",
                           k=HILL_K)


RBO_DEPTH, RBO_P = 20, 0.9


def _rbo_case_sql(m_expr: str) -> str:
    """DuckDB CASE mapping max(rank) -> the SAME pre-rounded Decimal
    suffix weights the Spark operator looks up (similarity.rbo_weights)."""
    from hazelcast_jet_spark.operators.similarity import rbo_weights

    whens = " ".join(
        f"WHEN {j + 1} THEN CAST('{w}' AS DECIMAL(18,12))"
        for j, w in enumerate(rbo_weights(RBO_DEPTH, RBO_P)))
    return f"CASE {m_expr} {whens} END"


def rbo_rank_similarity_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (similarity.rbo_overlap; Webber et al. 2010)
    between full-vector and 16-dim-prefix cosine top-20 rankings — the
    graded, top-weighted companion of matryoshka_recall_emb (recall@k
    treats rank 1 and rank 20 alike; RBO doesn't).  One depth-bounded
    rank join + literal Decimal suffix weights; corpora never touched
    past the two ranking scans."""
    from hazelcast_jet_spark.operators.similarity import (
        cosine_topk, rbo_overlap, truncated_cosine_topk)

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    full = cosine_topk(e, q, k=RBO_DEPTH)
    trunc = truncated_cosine_topk(e, q, MATRYOSHKA_DIMS, k=RBO_DEPTH)
    return rbo_overlap(full, trunc, RBO_DEPTH, RBO_P)


#: DuckDB twin of timeseries.event_transitions — also the oracle of the
#: STREAMING transition gate (summed stateful deltas == batch matrix)
_TRANSITIONS_SQL = """
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id) AS to_type
        FROM events
    ), pairs AS (
        SELECT from_type, to_type, count(*) AS n_trans
        FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_trans,
           round(CAST(n_trans AS DOUBLE)
                 / CAST(SUM(n_trans) OVER (
                       PARTITION BY from_type) AS DOUBLE), 6)
               AS p_trans
    FROM pairs ORDER BY from_type, to_type
"""


def streaming_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Markov transition matrix (streaming/transitions.py):
    keyed applyInPandasWithState carries ONE event per user (O(1)
    state); each micro-batch emits delta pair counts, summed batch-side
    into the same matrix as the batch operator — the oracle IS the
    batch SQL replay."""
    from hazelcast_jet_spark.streaming.run import (
        read_stream_table, run_to_batch)
    from hazelcast_jet_spark.streaming.transitions import (
        stream_event_transitions)

    e = read_stream_table(spark, sf_dir, "events")
    out = stream_event_transitions(e)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        emitted = run_to_batch(out, "update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    pairs = emitted.groupBy("from_type", "to_type").agg(
        F.sum("cnt").alias("n_trans"))
    tot = Window.partitionBy("from_type")
    p = F.round(F.col("n_trans").cast("double")
                / F.sum("n_trans").over(tot).cast("double"), 6)
    return pairs.select("from_type", "to_type",
                        F.col("n_trans").cast("long").alias("n_trans"),
                        p.alias("p_trans")) \
        .orderBy("from_type", "to_type")


def ewma_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA-smoothed daily event rate per type (timeseries.ewma — the
    recurrence SQL windows cannot express, run through the production
    Arrow applyInPandas path).  alpha=0.5 makes every multiply an exact
    binary scaling, so the pandas recurrence and the oracle's recursive
    CTE replay produce identical bits with no rounding at all; the
    oracle unrolls ``s_t = 0.5*s_{t-1} + 0.5*v_t`` level by level."""
    from hazelcast_jet_spark.operators.timeseries import ewma

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    sm = ewma(daily, key_col="event_type", time_col="day",
              value_col="n", alpha=0.5, out_col="ewma_rate")
    return sm.select("event_type", "day", "n", "ewma_rate") \
        .orderBy("event_type", "day")


CROSTON_QTY = 50


def croston_demand_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston intermittent-demand rate (timeseries.croston; Croston
    1972) of full-pallet shipments (quantity = 50) per brand:
    many zero days between demand epochs break level smoothers — the
    EWMA/Kalman lane's missing sibling smooths demand SIZE and
    inter-demand INTERVAL separately at epochs only, forecast = z/p.
    Dyadic α=0.5 makes every update an exact binary scaling; day
    ordinals are epoch-day integers (session-tz-free), so the
    recursive-CTE oracle replays the bits.  One row per brand: the
    last epoch's state."""
    from hazelcast_jet_spark.operators.timeseries import croston

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    day = F.datediff(F.to_date("l_shipdate"),
                     F.lit("1970-01-01").cast("date"))
    demand = (li.filter(F.col("l_quantity") == CROSTON_QTY)
              .join(p.select(F.col("p_partkey").alias("l_partkey"),
                             "p_brand"), "l_partkey")
              .groupBy("p_brand", day.alias("day"))
              .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)"))
                   .cast("double").alias("qty")))
    fit = croston(demand, "p_brand", "day", "qty", alpha=0.5)
    w = Window.partitionBy("p_brand")
    return (fit.withColumn("__n", F.count(F.lit(1)).over(w))
            .withColumn("__rn", F.row_number().over(
                w.orderBy(F.desc("day"))))
            .filter(F.col("__rn") == 1)
            .select("p_brand", F.col("__n").alias("n_epochs"),
                    (F.col("z") + F.lit(0.0)).alias("z"),
                    (F.col("p") + F.lit(0.0)).alias("p"),
                    (F.col("forecast") + F.lit(0.0)).alias("forecast"))
            .orderBy("p_brand"))


KALMAN_Q, KALMAN_R = 1.0, 4.0


def kalman_level_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter of the daily event rate per type
    (timeseries.kalman_level; Kalman 1960, Harvey 1989): the
    adaptive-gain upgrade of q:ewma_event_rate — the gain recursion
    starts at 1 (trust the first observations) and converges to the
    steady state set by q/r, which fixed-α EWMA only matches
    asymptotically.  Same Arrow applyInPandas recurrence lane; every
    step is a fixed-order double expression, so the recursive-CTE
    oracle replays the filter bit-for-bit (no rounding anywhere)."""
    from hazelcast_jet_spark.operators.timeseries import kalman_level

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    out = kalman_level(daily, key_col="event_type", time_col="day",
                       value_col="n", q=KALMAN_Q, r=KALMAN_R)
    return out.select("event_type", "day", "n", "level", "gain") \
        .orderBy("event_type", "day")


def streaming_kalman_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Kalman filtering (streaming/kalman.
    stream_kalman_level): the daily event-rate rollup arrives as a
    3-batch ordered feed (contiguous day ranges — the daily-CDC shape)
    and a keyed stateful filter carries the posterior (x, P) across
    micro-batches, emitting each day's level/gain as it arrives — the
    live twin of q:kalman_level_events, row-equal to the batch filter
    because the recurrence is operation-for-operation identical and
    state survives batch boundaries.  State bound: two doubles + one
    ordinal per event_type — O(1) per key forever.  The oracle is the
    batch recursive-CTE replay (shared)."""
    import tempfile

    from hazelcast_jet_spark.streaming.kalman import stream_kalman_level
    from hazelcast_jet_spark.streaming.run import run_to_batch

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    days = sorted(r[0] for r in daily.select("day").distinct().collect())
    n_files = 3
    bounds = [days[(len(days) * i) // n_files] for i in range(1, n_files)]
    tag = os.path.basename(os.path.normpath(sf_dir))
    src = os.path.join(tempfile.gettempdir(), f"spark_graft_kal_{tag}")
    chunks = [
        daily.filter(F.col("day") < F.lit(bounds[0])),
        daily.filter((F.col("day") >= F.lit(bounds[0]))
                     & (F.col("day") < F.lit(bounds[1]))),
        daily.filter(F.col("day") >= F.lit(bounds[1])),
    ]
    for i, ch in enumerate(chunks):
        ch.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"f{i}"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(os.path.join(src, "f*")))
    filtered = stream_kalman_level(stream, "event_type", "day", "n",
                                   q=KALMAN_Q, r=KALMAN_R)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        out = run_to_batch(filtered, "update")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return out.select("event_type", "day", "n", "level", "gain") \
        .orderBy("event_type", "day")


PACK_BUDGET = 1500


def greedy_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit greedy packing per source (packing.pack_greedy →
    pack_stats): documents walk in doc_id order per stratum; a doc that
    would overflow the 1500-char budget closes the bin.  All-integer
    arithmetic — the oracle replays the recurrence as a recursive CTE
    per stratum, one level per document (bounded: docs-per-source).
    The 100 TB shape is the operator's documented one: the stratum is
    the parallelism unit (pack per shard/source, never globally)."""
    from hazelcast_jet_spark.operators.packing import pack_greedy, pack_stats

    d = _t(spark, sf_dir, "documents")
    packed = pack_greedy(d.select("doc_id", "source", "n_chars"),
                         token_col="n_chars", budget=PACK_BUDGET,
                         order_col="doc_id", partition_cols=["source"])
    return (pack_stats(packed, "n_chars", ["source"])
            .withColumnRenamed("total_tokens", "total_chars")
            .orderBy("source", "bin_id"))


KMEANS_FIT_K = 4
KMEANS_FIT_ITERS = 2


def kmeans_fit_iter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED-centroid k-means path, oracle-replayed end to end
    (clustering.kmeans_fit_unrolled): 2 full Lloyd iterations seeded
    with the 4 lowest-id vectors — rounded-distance argmin assignment
    (the l2_assign convention) and DECIMAL-exact centroid updates make
    every float op engine-portable, so the oracle unrolls BOTH
    iterations in SQL (closing the r6 honest-non-gate slot where only
    the assignment step of a trained fit was driver-checked).  Output:
    per-cluster membership count + the first 4 centroid dims, rounded,
    signed-zero-normalized."""
    from hazelcast_jet_spark.operators.clustering import kmeans_fit_unrolled

    e = _t(spark, sf_dir, "embeddings")
    cent, assigned = kmeans_fit_unrolled(
        e, k=KMEANS_FIT_K, iters=KMEANS_FIT_ITERS)
    counts = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vectors"))
    rows = [(c, *[float(cent[c, p]) for p in range(4)])
            for c in range(KMEANS_FIT_K)]
    cw = spark.createDataFrame(
        rows, "cluster int, d0 double, d1 double, d2 double, d3 double")
    sel = [F.col("cluster"), F.col("n_vectors")]
    for p in range(4):
        sel.append((F.round(F.col(f"d{p}"), 6) + F.lit(0.0)).alias(f"c{p}"))
    return counts.join(cw, "cluster").select(*sel).orderBy("cluster")


def llm_data_pipeline_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data pipeline as ONE gate query — the
    composition examples/llm_data_pipeline.py runs, with every
    inter-operator contract pinned by a single oracle: exact dedup
    (keep min doc_id per normalized text) → MinHash/LSH near-dup prune
    (connected-component groups, drop non-min members) → benchmark
    decontamination (doc_id%50==0 stands in for the eval set;
    ≥3-shingle overlap drops) → Gopher quality gate → deterministic
    per-language stratified downsample (md5-keyed, seed s42-) →
    sequence packing into 512-token bins per language.  Output: the
    per-language shape of the final packed corpus.  Every stage is JVM
    expressions, a bounded band join, or a broadcast of the tiny eval
    set — the documented 100 TB shape of each operator, now also
    pinned in composition."""
    from hazelcast_jet_spark.operators.dedup import (
        decontaminate, exact_dedup, minhash_lsh_pairs, pairs_to_groups)
    from hazelcast_jet_spark.operators.packing import pack_concat, pack_stats
    from hazelcast_jet_spark.operators.sampling import stratified_sample
    from hazelcast_jet_spark.operators.text import gopher_quality_flags

    docs = _t(spark, sf_dir, "documents")
    groups = exact_dedup(docs, "text", "doc_id")
    # NOTE (r13): a localCheckpoint of `surv` here was built to collapse
    # the before-plan's 10 documents scans and REVERTED on measurement —
    # 4.35 s (lazy, pruned re-scans) vs 7.75 s (materialized full-text
    # rows defeat column pruning for every downstream consumer;
    # interleaved A/B at 8 cores, min-of-2).  The repeated scans are
    # cheap: parquet pushdown projects 2-3 columns each time.
    surv = docs.join(groups.select(F.col("keep_id").alias("doc_id")),
                     "doc_id", "left_semi")
    pairs = minhash_lsh_pairs(surv, "text", "doc_id", threshold=0.7)
    drop = (pairs_to_groups(pairs)
            .filter(F.col("node") != F.col("group"))
            .select(F.col("node").alias("doc_id")))
    surv = surv.join(drop, "doc_id", "left_anti")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    cont = decontaminate(surv, bench, k=3, min_overlap=3)
    surv = surv.join(cont.select("doc_id"), "doc_id", "left_anti")
    surv = surv.filter(gopher_quality_flags("text")["pass"])
    sampled = stratified_sample(
        surv, key_col="doc_id", stratum_col="lang",
        rates={"en": 0.25, "de": 0.8, "fr": 0.8, "es": 0.5, "zh": 0.5},
        default_rate=0.1, seed="s42-")
    toks = sampled.select("lang", "doc_id",
                          text.token_count("text").alias("tok"))
    packed = pack_concat(toks, token_col="tok", budget=512,
                         order_col="doc_id", partition_cols=["lang"])
    stats = pack_stats(packed, "tok", ["lang"])
    return (stats.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_bins"),
                 F.sum("n_docs").cast("bigint").alias("n_docs"),
                 F.sum("total_tokens").cast("bigint").alias("total_tokens"))
            .orderBy("lang"))


HEAPS_CHECKPOINTS = (50, 100, 200, 400)
ZIPF_TOP_N = 100


def lexical_diversity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document type-token lexical diversity (text.
    lexical_diversity): token count, distinct types, TTR, Herdan's C —
    the boilerplate signal the length/symbol gates miss.  Map-only JVM
    expressions; per-row double division and log are bit-identical in
    any engine."""
    from hazelcast_jet_spark.operators.text import lexical_diversity

    d = _t(spark, sf_dir, "documents")
    return lexical_diversity(d).orderBy("doc_id")


def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (text.vocab_growth): distinct
    vocabulary size and cumulative tokens after the first N documents,
    N in a fixed checkpoint ladder — one explode, one per-term
    min-doc aggregate, ONE conditional-sum aggregate for all
    checkpoints."""
    from hazelcast_jet_spark.operators.text import vocab_growth

    d = _t(spark, sf_dir, "documents")
    return vocab_growth(d, checkpoints=HEAPS_CHECKPOINTS)


BURROWS_TOP_WORDS = 20


def burrows_delta_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distances between sources
    (text.burrows_delta; Burrows 2002): z-scored top-20 word shares,
    mean |Δz| per source pair — the style/register divergence monitor
    that catches template farms and machine text where topic stats
    stay flat.  Population moments across sources, absent words at 0,
    σ=0 words excluded; everything after the token count is bounded
    grid work."""
    from hazelcast_jet_spark.operators.text import burrows_delta

    d = _t(spark, sf_dir, "documents")
    return burrows_delta(d, top_words=BURROWS_TOP_WORDS)


def vocab_richness_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 unseen-vocabulary estimate + Good–Turing coverage per
    language (text.vocab_richness; Chao 1984, Good 1953): D observed
    terms, f1/f2 singleton/doubleton counts, the bias-corrected Chao1
    lower bound on true vocabulary and the probability the next token
    is already known — the stop-crawling signal answering
    q:heaps_vocab_growth's question without a checkpoint ladder.  One
    explode → (lang, term) counts → one frequency fold; estimate
    arithmetic is fixed-order doubles on exact counts."""
    from hazelcast_jet_spark.operators.text import vocab_richness

    d = _t(spark, sf_dir, "documents")
    return vocab_richness(d, group_cols=["lang"]).orderBy("lang")


def zipf_slope_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law OLS fit over the top-100 term frequencies (text.
    zipf_fit): ln(freq) on ln(rank), decimal-exact moments (the
    linear_trend convention), deterministic count-desc/term-asc
    ranking.  One row: (n_terms, slope, intercept)."""
    from hazelcast_jet_spark.operators.text import zipf_fit

    d = _t(spark, sf_dir, "documents")
    return zipf_fit(d, top_n=ZIPF_TOP_N)


def hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY as a product surface (sketch.hll_build /
    hll_merge / hll_estimate): per-day HLL register tables of distinct
    users, estimated per day AND rolled up to the full-month total by
    register-wise max — the ad-hoc-total-without-rescan pattern that is
    the reason sketches matter at 100 TB (store 16 registers per day,
    answer any date-range cardinality later).  All register arithmetic
    is md5 hex-string derivation the oracle replays bit-for-bit; every
    scope here sits in the harmonic regime (>> 2.5m)."""
    from hazelcast_jet_spark.operators.sketch import (
        hll_build, hll_estimate, hll_merge)

    e = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = hll_build(e, "user_id", ["day"], p=HLL_P)
    per_day = hll_estimate(daily, ["day"], p=HLL_P).select(
        F.col("day").cast("string").alias("scope"), "hll_estimate")
    merged = hll_merge(daily.select("hll_reg", "hll_rho"), [])
    total = hll_estimate(merged, [], p=HLL_P).select(
        F.lit("ALL").alias("scope"), "hll_estimate")
    exact_day = e.groupBy(F.col("day").cast("string").alias("scope")).agg(
        F.countDistinct("user_id").alias("exact_distinct"))
    exact_all = e.agg(
        F.countDistinct("user_id").alias("exact_distinct")).select(
        F.lit("ALL").alias("scope"), "exact_distinct")
    est = per_day.unionByName(total)
    exact = exact_day.unionByName(exact_all)
    return est.join(exact, "scope").orderBy("scope")


def streaming_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING HLL maintenance: the hll_build register aggregation
    applied to readStream in complete mode — a live distinct-users-per-
    day dashboard whose state is bounded at days × 16 register rows
    however high the stream rate (the streaming twin of
    hll_daily_rollup; estimates derive batch-side from the final
    registers).  availableNow on bounded input makes the registers
    deterministic, so the batch md5 replay is the exact oracle."""
    from hazelcast_jet_spark.operators.sketch import hll_build, hll_estimate
    from hazelcast_jet_spark.streaming.run import (
        read_stream_table, run_to_batch)

    e = read_stream_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts"))
    regs = run_to_batch(hll_build(e, "user_id", ["day"], p=HLL_P),
                        "complete")
    est = hll_estimate(regs, ["day"], p=HLL_P).select(
        F.col("day").cast("string").alias("day"), "hll_estimate")
    exact = _t(spark, sf_dir, "events").groupBy(
        F.to_date("ts").cast("string").alias("day")).agg(
        F.countDistinct("user_id").alias("exact_distinct"))
    return est.join(exact, "day").orderBy("day")


def dedup_group_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Over-merge audit of MinHash/LSH dedup groups (dedup.
    dedup_group_quality): per connected component, the member count,
    verified-edge count and weakest/mean edge Jaccard — the signal that
    a transitive chain is about to false-merge distinct documents.
    Runs on the pair/group tables only; no second corpus pass."""
    from hazelcast_jet_spark.operators.dedup import (
        dedup_group_quality, minhash_lsh_pairs)

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "text", "doc_id", num_hashes=8, bands=4,
                              threshold=0.5)
    return dedup_group_quality(pairs)


def langid_confusion_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic EVALUATION: the stopword-ratio lang_id
    prediction cross-tabulated against the labeled lang column with
    per-label recall share — the confusion audit that tells you where
    the cheap JVM-side heuristic is safe and where a model is needed.
    Map-only prediction + one aggregate."""
    from hazelcast_jet_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    cell = d.groupBy(F.col("lang"), lang_id("text").alias("lang_pred"))         .agg(F.count(F.lit(1)).alias("n_docs"))
    tot = Window.partitionBy("lang")
    share = F.round(F.col("n_docs").cast("double")
                    / F.sum("n_docs").over(tot).cast("double"), 6)
    return cell.select("lang", "lang_pred", "n_docs",
                       share.alias("label_share"))         .orderBy("lang", "lang_pred")


def source_length_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-vs-rest KS statistic per source over document lengths
    (profile.source_ks_matrix): which corpus slice is distributionally
    unlike the rest — one corpus aggregate, the dense source × value
    step grid (bounded, broadcast), rest-side ECDF derived as
    global − source (no row amplification)."""
    from hazelcast_jet_spark.operators.profile import source_ks_matrix

    d = _t(spark, sf_dir, "documents")
    return source_ks_matrix(d, "n_chars", "source")


VOCAB_SIZES = (100, 500, 1000, 2000)


def vocab_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary sizing curve (text.vocab_coverage_curve):
    token-occurrence coverage of the top-N terms for a ladder of
    candidate vocab sizes — one term-count aggregate, every size a
    conditional sum in ONE final aggregate."""
    from hazelcast_jet_spark.operators.text import vocab_coverage_curve

    d = _t(spark, sf_dir, "documents")
    return vocab_coverage_curve(d, sizes=VOCAB_SIZES)


def burstiness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process burstiness (timeseries.burstiness): per-type
    Fano factor (variance/mean of daily counts — 1 = Poisson, >1 =
    bursty).  Tz-free integer day buckets, exact counts, decimal
    moments over the tiny bucketed table."""
    from hazelcast_jet_spark.operators.timeseries import burstiness

    e = _t(spark, sf_dir, "events")
    return burstiness(e, key_col="event_type", bucket_seconds=86400)


def lorenz_curve_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz concentration curve of order values (profile.
    lorenz_curve): cumulative revenue share at each population decile —
    the curve behind the Gini number.  Decimal-exact mass accumulation;
    one ranking exchange + one conditional-sum aggregate."""
    from hazelcast_jet_spark.operators.profile import lorenz_curve

    o = _t(spark, sf_dir, "orders")
    return lorenz_curve(o, "o_totalprice", n_points=10)


QBINS_N = 10


def outlier_ensemble_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-detector outlier ensemble (profile.outlier_ensemble): MAD,
    Tukey-IQR and z-score flags side by side per event type with
    agreement counts — the "is the point the outlier, or is the
    detector?" audit.  Rounded cut points, decimal-exact moments."""
    from hazelcast_jet_spark.operators.profile import outlier_ensemble

    e = _t(spark, sf_dir, "events")
    return outlier_ensemble(e, "value", "event_type")


def quantile_bins_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization of order totals (profile.
    quantile_bins): exact decile cut points + per-bin counts, rounded
    edges, right-closed assignment — the feature-binning primitive
    drift monitors consume."""
    from hazelcast_jet_spark.operators.profile import quantile_bins

    o = _t(spark, sf_dir, "orders")
    return quantile_bins(o, "o_totalprice", n_bins=QBINS_N)


MARKOV_SPLIT = "2024-01-21 00:00:00"


def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out next-event prediction accuracy of the first-order Markov
    model (timeseries.markov_holdout_accuracy): transitions whose
    destination lands before Jan 21 train the argmax predictor; the
    rest score it.  Same single keyed exchange as event_transitions;
    train counts / predictions are K²/K-bounded broadcasts."""
    from hazelcast_jet_spark.operators.timeseries import (
        markov_holdout_accuracy)

    e = _t(spark, sf_dir, "events")
    split = F.expr(f"CAST('{MARKOV_SPLIT}' AS TIMESTAMP_NTZ)")
    return markov_holdout_accuracy(e, split_ts=split)


def item_similarity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item Jaccard top-3 neighbors over order baskets (graph.
    item_similarity_topk — basket-level collaborative filtering):
    co-counts and per-item basket counts share the same ≤64-item
    hot-basket cap so every ratio describes one population; pairs
    explode in-task, ranking runs on the pair table only."""
    from hazelcast_jet_spark.operators.graph import item_similarity_topk

    li = _t(spark, sf_dir, "lineitem")
    return item_similarity_topk(li, "l_orderkey", "l_partkey",
                                k=3, max_group=64, min_co=2)


def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-calibration audit (dedup.minhash_estimate_vs_exact): the
    8-hash MinHash Jaccard estimate vs exact shingle Jaccard on every
    LSH candidate pair — the error profile that decides whether a
    sketch-only threshold is safe when exact verification becomes the
    expensive step at scale."""
    from hazelcast_jet_spark.operators.dedup import minhash_estimate_vs_exact

    d = _t(spark, sf_dir, "documents")
    return minhash_estimate_vs_exact(d, num_hashes=8, bands=4, k=3)


MULTI_SPAN_KS = (4, 8, 16)


def multi_span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain exact-substring duplication (dedup.
    dup_span_stats_multi; Lee et al. 2022 use several span lengths —
    short grains catch boilerplate, long grains catch near-whole-doc
    copies).  One corpus pass + ONE (k, hash) document-frequency
    shuffle covers all three grains; the gate keeps only docs with at
    least one duplicated span at some grain (the actionable minority)."""
    from hazelcast_jet_spark.operators.dedup import dup_span_stats_multi

    d = _t(spark, sf_dir, "documents")
    out = dup_span_stats_multi(d, ks=MULTI_SPAN_KS)
    return (out.filter(F.col("n_dup_spans") > 0)
            .orderBy("doc_id", "k"))


def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which crawl is dirtiest: per-source exact-duplicate and near-
    duplicate rates — the operational dashboard a dedup pipeline feeds
    back to crawling.  Exact dups = docs that are not their normalized-
    text group's keeper; near dups = exact-survivors dropped as non-
    minimum members of an LSH connected component (the llm pipeline's
    own drop sets, so the rates describe exactly what the pipeline
    would remove).  One fingerprint groupBy + the LSH band join; counts
    aggregate per source."""
    from hazelcast_jet_spark.operators.dedup import (
        exact_dedup, minhash_lsh_pairs, pairs_to_groups)

    docs = _t(spark, sf_dir, "documents")
    groups = exact_dedup(docs, "text", "doc_id")
    # the keeper set feeds BOTH the survivor semi-join and the flagged
    # left join — materialize the fingerprint groupBy once (guide §2.4;
    # bounded: one bigint per surviving doc)
    keep = (groups.select(F.col("keep_id").alias("doc_id"))
            .localCheckpoint())
    surv = docs.join(keep, "doc_id", "left_semi")
    pairs = minhash_lsh_pairs(surv, "text", "doc_id", threshold=0.7)
    near_drop = (pairs_to_groups(pairs)
                 .filter(F.col("node") != F.col("group"))
                 .select(F.col("node").alias("doc_id"),
                         F.lit(1).alias("__near")))
    flagged = (docs
               .join(keep.withColumn("__keep", F.lit(1)), "doc_id", "left")
               .join(near_drop, "doc_id", "left"))
    n_exact = F.sum(F.when(F.col("__keep").isNull(), 1).otherwise(0))
    n_near = F.sum(F.coalesce(F.col("__near"), F.lit(0)))
    return (flagged.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 n_exact.cast("bigint").alias("n_exact_dup"),
                 n_near.cast("bigint").alias("n_near_dup"))
            .withColumn(
                "dup_rate",
                F.round((F.col("n_exact_dup") + F.col("n_near_dup"))
                        .cast("double") / F.col("n_docs").cast("double"), 6))
            .orderBy("source"))


BUDGET_SAMPLE_CHARS = 3000


def budget_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget sampling (sampling.budget_sample): walk
    each source in md5 order and keep docs while the running char mass
    before the row is under the budget (crossing row included — the
    pack/top-mass convention).  The selection step that CONSUMES a
    waterfill allocation: uniform content, integer-only keep predicate,
    one stratum exchange."""
    from hazelcast_jet_spark.operators.sampling import budget_sample

    d = _t(spark, sf_dir, "documents")
    kept = budget_sample(d, stratum_col="source", weight_col="n_chars",
                         budget=BUDGET_SAMPLE_CHARS, key_col="doc_id",
                         seed="bs7-")
    return (kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("n_chars").cast("bigint").alias("chars_kept"))
            .orderBy("source"))


def embedding_drift_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift per label (clustering.
    embedding_centroid_drift): L2 distance between the DECIMAL-exact
    mean vectors of the even-id and odd-id halves — the vector twin of
    the scalar drift family.  One bounded (label, half, dim) aggregate
    to the driver; the distance folds squared diffs in dim order so
    the oracle replays it term for term."""
    from hazelcast_jet_spark.operators.clustering import (
        embedding_centroid_drift)

    e = _t(spark, sf_dir, "embeddings")
    return embedding_centroid_drift(e)


def event_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival spacing profile: per event type, exact p50/p90 of
    the seconds since the user's previous event (gap assigned to the
    LATER event's type) — the arrival-latency shape behind alerting
    thresholds.  One keyed window exchange for the gaps; percentiles
    aggregate the tiny (type, gap) projection; tz-free integer-second
    gaps."""
    from hazelcast_jet_spark.operators.timeseries import _epoch_seconds

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = _epoch_seconds(e, "ts")
    gaps = (e.withColumn("__gap", sec - F.lag(sec, 1).over(w))
            .filter(F.col("__gap").isNotNull()))
    return (gaps.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_gaps"),
                 F.round(F.percentile(F.col("__gap"), F.lit(0.5)), 6)
                 .alias("p50_gap_s"),
                 F.round(F.percentile(F.col("__gap"), F.lit(0.9)), 6)
                 .alias("p90_gap_s"),
                 F.max("__gap").cast("bigint").alias("max_gap_s"))
            .orderBy("event_type"))


PREFIX_DUP_CHARS = 24


def prefix_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix duplicate groups (dedup.prefix_dup_stats): docs
    whose normalized text opens with the same 24 chars — boilerplate
    headers and mirrored templates that body-level similarity dilutes.
    One substring groupBy."""
    from hazelcast_jet_spark.operators.dedup import prefix_dup_stats

    d = _t(spark, sf_dir, "documents")
    return prefix_dup_stats(d, prefix_chars=PREFIX_DUP_CHARS,
                            source_col="source")


def user_activity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity distribution in one row: user count and exact
    p50/p90/p99 + max of events-per-user — the engagement-shape /
    bot-screening profile (a heavy top tail with a low median = a few
    hyperactive keys about to skew every per-user aggregate).  One
    keyed count + one percentile aggregate over the tiny per-user
    table."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("__n"))
    x = F.col("__n")
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.percentile(x, F.lit(0.5)), 6).alias("p50_events"),
        F.round(F.percentile(x, F.lit(0.9)), 6).alias("p90_events"),
        F.round(F.percentile(x, F.lit(0.99)), 6).alias("p99_events"),
        F.max(x).cast("bigint").alias("max_events"))


def shipping_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lag distribution per order priority: exact
    p50/p90/p99 + max of (l_shipdate − o_orderdate) in days — the SLA
    percentile report (the relational twin of event_gap_percentiles).
    One equi-join on the order key + one percentile aggregate; the lag
    is a calendar-day difference of NTZ timestamps (tz-free)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").cast("double").alias("__lag"))
    x = F.col("__lag")
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.round(F.percentile(x, F.lit(0.5)), 6) + F.lit(0.0))
        .alias("p50_lag_days"),
        (F.round(F.percentile(x, F.lit(0.9)), 6) + F.lit(0.0))
        .alias("p90_lag_days"),
        (F.round(F.percentile(x, F.lit(0.99)), 6) + F.lit(0.0))
        .alias("p99_lag_days"),
        F.max(x).alias("max_lag_days"),
    ).orderBy("o_orderpriority")


def rfm_segments_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (profile.rfm_segments) over orders:
    recency/frequency/monetary ntile(5) scores per customer (score 1 =
    best, ties break on custkey), populations + decimal-exact mean
    monetary per (r, f, m) cell.  The oracle replays the identical
    ntile windows."""
    from hazelcast_jet_spark.operators.profile import rfm_segments

    o = _t(spark, sf_dir, "orders")
    return rfm_segments(o, key_col="o_custkey", time_col="o_orderdate",
                        value_col="o_totalprice", n_bins=5)


def transition_entropy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-state transition entropy (timeseries.transition_entropy):
    how predictable each event type's successor is — the scalar summary
    of the event_transition_matrix gate.  Entropy terms accumulate as
    exact DECIMAL(18,12) (char_entropy convention) so the oracle may
    enumerate pairs in any order."""
    from hazelcast_jet_spark.operators.timeseries import transition_entropy

    e = _t(spark, sf_dir, "events")
    return transition_entropy(e)


def holt_linear_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear trend smoothing (timeseries.holt_linear) of the
    daily event rate per type — the trend-aware sibling of the ewma
    gate, same Arrow applyInPandas recurrence lane.  alpha=beta=0.5
    makes every multiply an exact binary scaling; the oracle replays
    the coupled (level, trend) recurrence as a recursive CTE."""
    from hazelcast_jet_spark.operators.timeseries import holt_linear

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    sm = holt_linear(daily, key_col="event_type", time_col="day",
                     value_col="n", alpha=0.5, beta=0.5)
    return sm.select("event_type", "day", "n", "level", "trend",
                     "forecast").orderBy("event_type", "day")


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm distribution (similarity.embedding_norm_stats):
    the un-normalized-vector / mixed-encoder-batch sanity check every
    ANN index assumes away.  Map-only norm fold + one aggregate."""
    from hazelcast_jet_spark.operators.similarity import (
        embedding_norm_stats as _norm_stats)

    e = _t(spark, sf_dir, "embeddings")
    return _norm_stats(e)


def dup_lang_confusion_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label consistency over near-dup pairs
    (dedup.near_dup_label_confusion on lang): off-diagonal cells are
    near-identical docs carrying different language tags — annotation
    noise / mirrored-corpus mis-tags.  Confusion aggregate runs on the
    LSH pair table, never the corpus."""
    from hazelcast_jet_spark.operators.dedup import near_dup_label_confusion

    d = _t(spark, sf_dir, "documents")
    return near_dup_label_confusion(
        d, label_col="lang", num_hashes=MINHASH_HASHES,
        bands=MINHASH_BANDS, k=SHINGLE_K, threshold=LSH_THRESHOLD)


def chunk_dup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-grain duplication (dedup.chunk_dup_stats): per source, the
    share of 12-token chunks whose fingerprint repeats corpus-wide —
    boilerplate at the granularity RAG stores and packers consume."""
    from hazelcast_jet_spark.operators.dedup import chunk_dup_stats

    d = _t(spark, sf_dir, "documents")
    return chunk_dup_stats(d, chunk_tokens=12)


def token_len_histogram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token character-length histogram (text.token_length_histogram):
    the tokenizer/vocab budgeting curve, lengths capped into a terminal
    12+ bucket."""
    from hazelcast_jet_spark.operators.text import token_length_histogram

    d = _t(spark, sf_dir, "documents")
    return token_length_histogram(d, max_len=12)


def hll_overlap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap (sketch.hll_pairwise_overlap):
    inclusion-exclusion distinct-user overlap estimates between event
    types from ONE scan of 16-register HLLs, next to the exact overlap
    from a (user, type) self-join.  The union estimate reuses the
    lossless register-wise max merge — no second scan."""
    from hazelcast_jet_spark.operators.sketch import hll_pairwise_overlap

    e = _t(spark, sf_dir, "events")
    est = hll_pairwise_overlap(e, "user_id", "event_type", p=HLL_P)
    ut = e.select("user_id", "event_type").distinct()
    exact = (ut.alias("a")
             .join(ut.alias("b"),
                   (F.col("a.user_id") == F.col("b.user_id"))
                   & (F.col("a.event_type") < F.col("b.event_type")))
             .groupBy(F.col("a.event_type").alias("group_a"),
                      F.col("b.event_type").alias("group_b"))
             .agg(F.count(F.lit(1)).alias("exact_overlap")))
    return (est.join(exact, ["group_a", "group_b"], "left")
            .select("group_a", "group_b", "est_a", "est_b", "est_union",
                    "est_overlap",
                    F.coalesce("exact_overlap", F.lit(0))
                    .alias("exact_overlap"))
            .orderBy("group_a", "group_b"))


def dow_hourly_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-seasonal anomalies
    (timeseries.seasonal_baseline_anomalies): hourly counts z-scored
    against their own (day-of-week, hour) baseline; dow from an
    epoch-day modulus so both engines anchor identically.  Gate
    threshold 1.5 (not the operator's 2.0 default): the synthetic
    stream is smooth — max |z| ≈ 1.78 at both gate SFs — and a 0-row
    gate proves nothing (the no-empty-oracle suite guard)."""
    from hazelcast_jet_spark.operators.timeseries import (
        seasonal_baseline_anomalies)

    e = _t(spark, sf_dir, "events")
    return seasonal_baseline_anomalies(e, z_threshold=1.5)


def sample_audit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling QA composition (sampling.sample_audit over
    sampling.stratified_sample): realized per-language rates and
    full-vs-sample mean doc length of the deterministic md5 stratified
    sample — pins the sampler's membership AND the representativeness
    arithmetic under one oracle."""
    from hazelcast_jet_spark.operators.sampling import (sample_audit,
                                                        stratified_sample)

    d = _t(spark, sf_dir, "documents")
    samp = stratified_sample(
        d, key_col="doc_id", stratum_col="lang",
        rates={"en": 0.25, "de": 0.8, "fr": 0.8, "es": 0.5, "zh": 0.5},
        default_rate=0.1, seed="s42-")
    return sample_audit(d, samp, stratum_col="lang", value_col="n_chars")


def rrf_fusion_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (similarity.rrf_fuse) of the full-vector
    cosine top-k and the Matryoshka 16-dim-prefix top-k — the hybrid
    combiner pattern: fuse a cheap coarse ranking with an expensive
    exact one using only ranks (no score calibration).  Scores round
    before the fused ranking so the order is engine-identical."""
    from hazelcast_jet_spark.operators import similarity
    from hazelcast_jet_spark.operators.similarity import (
        rrf_fuse, truncated_cosine_topk)

    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERY_VECS)
    full = similarity.cosine_topk(e, q, k=TOPK)
    trunc = truncated_cosine_topk(e, q, MATRYOSHKA_DIMS, k=TOPK)
    return rrf_fuse(full, trunc, k=TOPK)


def classifier_lift_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table (importance.lift_table) of the hashed quality
    classifier against Gopher-pass labels: per score decile, positive
    rate, cumulative positive share and lift over base rate — the
    decide-the-threshold curve for classifier-based data selection
    (the selection-efficiency companion of classifier_calibration)."""
    from hazelcast_jet_spark.operators.importance import (
        hashed_classifier_score, lift_table)
    from hazelcast_jet_spark.operators.text import gopher_quality_flags

    d = _t(spark, sf_dir, "documents")
    scores = hashed_classifier_score(
        d, _cls_weights(), bucket_hex=DSIR_BUCKET_HEX,
        bias=CLS_BIAS).select("doc_id", "score")
    flags = d.select(
        "doc_id",
        gopher_quality_flags(
            "text", min_words=20, max_words=1000, min_mean_word_len=3.0,
            max_mean_word_len=10.0, max_symbol_ratio=0.1)["pass"]
        .alias("pos"))
    return lift_table(scores.join(flags, "doc_id"), "score", "pos",
                      n_bins=10)


def conversion_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert (timeseries.conversion_lag_stats): first view →
    first subsequent purchase lag per user, summarized as exact
    percentiles — the funnel gate counts who converts; this measures
    how long conversion takes."""
    from hazelcast_jet_spark.operators.timeseries import conversion_lag_stats

    e = _t(spark, sf_dir, "events")
    return conversion_lag_stats(e, "view", "purchase")


def lsh_band_precision_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band LSH tuning diagnostics (dedup.lsh_band_diagnostics):
    candidate volume and verify precision of each band — the
    measurement behind the (bands, rows-per-band) knob."""
    from hazelcast_jet_spark.operators.dedup import lsh_band_diagnostics

    d = _t(spark, sf_dir, "documents")
    return lsh_band_diagnostics(
        d, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS, k=SHINGLE_K,
        threshold=LSH_THRESHOLD)


def cube_token_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (the one grouping-set shape not yet gated —
    rollup/grouping-sets are): doc and token counts over every
    (source, lang) subset combination with the grouping_id
    disambiguator.  One Expand + one aggregate; the NULL group cells
    pin Spark's and DuckDB's grouping-set NULL conventions against
    each other."""
    from hazelcast_jet_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    return (d.cube("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(token_count("text")).cast("bigint")
                 .alias("n_tokens"),
                 F.grouping_id().cast("int").alias("gid"))
            .orderBy("gid", "source", "lang"))


def weighted_median_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quartiles per return flag
    (profile.weighted_percentiles): the smallest price whose cumulative
    shipped quantity reaches 25/50/75% of the flag's total — what "the
    typical unit shipped costs", not "the typical order line"."""
    from hazelcast_jet_spark.operators.profile import weighted_percentiles

    li = _t(spark, sf_dir, "lineitem")
    return weighted_percentiles(li, value_col="l_extendedprice",
                                weight_col="l_quantity",
                                group_col="l_returnflag")


def referential_integrity_counts(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Cross-table FK orphan audit (profile.fk_orphan_counts) over the
    whole TPC-H-ish join graph in one frame — the first DQ gate after
    any ingest (orphans silently become dropped rows in every
    downstream inner join)."""
    from hazelcast_jet_spark.operators.profile import fk_orphan_counts

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return fk_orphan_counts([
        ("customer.nation", c, "c_nationkey", n, "n_nationkey"),
        ("lineitem.order", li, "l_orderkey", o, "o_orderkey"),
        ("lineitem.part", li, "l_partkey", p, "p_partkey"),
        ("lineitem.supplier", li, "l_suppkey", s, "s_suppkey"),
        ("nation.region", n, "n_regionkey", r, "r_regionkey"),
        ("orders.customer", o, "o_custkey", c, "c_custkey"),
        ("supplier.nation", s, "s_nationkey", n, "n_nationkey"),
    ])


def session_cooccurrence_events(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Session-basket type co-occurrence
    (timeseries.session_type_cooccurrence): which event types happen
    together inside one 30-minute session, with lift over independence
    — market-basket analysis where the basket is time-grouped behavior
    (the oracle replays sessionize's lag+running-sum windows)."""
    from hazelcast_jet_spark.operators.timeseries import (
        session_type_cooccurrence)

    e = _t(spark, sf_dir, "events")
    return session_type_cooccurrence(e, gap="30 minutes")


def top_event_paths_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step event-type paths (timeseries.top_event_paths): the
    common multi-hop flows the one-hop transition matrix can't see —
    one keyed lead() exchange, one K^3-bounded count, deterministic
    top-10."""
    from hazelcast_jet_spark.operators.timeseries import top_event_paths

    e = _t(spark, sf_dir, "events")
    return top_event_paths(e, length=3, k=10)


def corpus_data_card_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus data card (profile.corpus_data_card): per-source docs/
    tokens with corpus shares, length percentiles, exact + MinHash-LSH
    near-dup rates, Gopher quality-pass rate and the language mix — the
    profiling twin of the llm_data_pipeline composition gate: one oracle
    row set pins the contracts of fingerprinting, LSH, Gopher flags and
    the share arithmetic TOGETHER."""
    from hazelcast_jet_spark.operators.profile import corpus_data_card

    d = _t(spark, sf_dir, "documents")
    return corpus_data_card(
        d, num_hashes=MINHASH_HASHES, bands=MINHASH_BANDS, k=SHINGLE_K,
        near_threshold=LSH_THRESHOLD)


def streaming_corpus_card_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS corpus data card (r8 verdict #6): the per-source
    monitoring report a live 100 TB ingest runs alongside the batch
    card — readStream over documents maintains ONE complete-mode
    aggregation at (source, lang, fingerprint) grain (profile.
    corpus_card_stream_counters; state = one row per distinct triple,
    the streaming-exact-dedup state class), then profile.
    corpus_card_fold derives docs/tokens/shares, corpus-wide exact-dup
    rate, Gopher pass rate and the language mix batch-side from the
    final counters.  availableNow on bounded input makes the counters
    deterministic, so the batch SQL replay is the exact oracle."""
    from hazelcast_jet_spark.operators.profile import (
        corpus_card_fold, corpus_card_stream_counters)
    from hazelcast_jet_spark.streaming.run import (
        read_stream_table, run_to_batch)

    d = read_stream_table(spark, sf_dir, "documents")
    counters = run_to_batch(corpus_card_stream_counters(d), "complete")
    # the fold self-joins the counter table (fp totals); break the
    # memory-sink lineage first (bounded: one row per distinct
    # (source, lang, fingerprint) triple)
    return corpus_card_fold(counters.localCheckpoint())


def cusum_alarm_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change detection (timeseries.cusum_alarms; Page
    1954) of the daily event rate per type against each type's own
    exact mean — the small-persistent-shift alarm the mean-shift
    changepoint scan complements.  Pure add/sub/max IEEE arithmetic,
    so the recursive-CTE oracle replays the bits with no rounding."""
    from hazelcast_jet_spark.operators.timeseries import cusum_alarms

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    out = cusum_alarms(daily, key_col="event_type", time_col="day",
                       value_col="n", slack=0.0, threshold=10.0)
    return out.select("event_type", "day", "n", "target", "cusum",
                      "alarm").orderBy("event_type", "day")


def streaming_cohort_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC broadcast join (the one join shape not yet gated
    on a REAL stream): a live event stream enriched with each user's
    precomputed signup-cohort week (batch profile, broadcast), counted
    per cohort in complete mode.  availableNow on bounded input makes
    the counts deterministic, so the batch replay is the exact
    oracle.  State bound: one counter row per cohort week —
    calendar-bounded; the broadcast side is batch-static, not state."""
    from hazelcast_jet_spark.operators.timeseries import _epoch_seconds
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    eb = _t(spark, sf_dir, "events")
    static = (eb.groupBy("user_id")
              .agg(F.floor(F.min(_epoch_seconds(eb, "ts"))
                           / F.lit(604800.0)).cast("bigint")
                   .alias("cohort_week")))
    s = read_stream_table(spark, sf_dir, "events")
    enriched = s.join(F.broadcast(static), "user_id")
    agg = enriched.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        .alias("sum_value"))
    return run_to_batch(agg, "complete").orderBy("cohort_week")


def dup_graph_degree_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the MinHash-LSH near-dup pair graph: how
    many docs have exactly d near-duplicates — the dedup observability
    histogram (a heavy tail = boilerplate hubs that keep-best should
    collapse; mass at degree 1 = simple mirror pairs).  One count over
    the pair table's exploded endpoints, never the corpus."""
    from hazelcast_jet_spark.operators.dedup import minhash_lsh_pairs

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, num_hashes=MINHASH_HASHES,
                              bands=MINHASH_BANDS, k=SHINGLE_K,
                              threshold=LSH_THRESHOLD)
    deg = (pairs.select(F.explode(F.array("id_a", "id_b")).alias("id"))
           .groupBy("id").agg(F.count(F.lit(1)).alias("__d")))
    return (deg.groupBy(F.col("__d").alias("degree"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("degree"))


def monthly_growth_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: exact-decimal monthly totals,
    lag window on the months-bounded rollup, growth = (cur − prev) /
    prev as one rounded double division (NULL for the first month on
    both sides).  The KPI-dashboard primitive."""
    o = _t(spark, sf_dir, "orders")
    monthly = (o.groupBy(F.date_format(F.date_trunc("month", "o_orderdate"),
                                       "yyyy-MM").alias("month"))
               .agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                    .alias("__rev")))
    w = Window.orderBy("month")
    rev = F.col("__rev").cast("double")
    prev = F.lag(F.col("__rev")).over(w).cast("double")
    return monthly.select(
        "month", rev.alias("revenue"),
        (F.round((rev - prev) / prev, 6) + F.lit(0.0)).alias("mom_growth"),
    ).orderBy("month")


KM_CENSOR_DAYS = 7


def kaplan_meier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier user-lifetime survival curve
    (timeseries.kaplan_meier; Kaplan & Meier 1958): duration = days
    between a user's first and last event; users still active in the
    final week of the log are right-censored (their true lifetime is
    longer than observed) — the churn curve cohort retention
    approximates, with censoring handled correctly.  One user rollup,
    then window math on the tiny curve table; the survival product is
    Spark's strictly-sequential running F.product, replayed
    bit-for-bit by the recursive-CTE oracle."""
    from hazelcast_jet_spark.operators.timeseries import kaplan_meier

    e = _t(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"))
    mx = span.agg(F.max("last_day").alias("__mx"))
    subj = span.crossJoin(F.broadcast(mx)).select(
        F.datediff("last_day", "first_day").alias("duration"),
        (F.col("last_day") <= F.date_sub("__mx", KM_CENSOR_DAYS))
        .alias("observed"))
    return kaplan_meier(subj, "duration", "observed")


LOGRANK_SEED = "lr1"


def logrank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample log-rank test (timeseries.logrank_test; Mantel 1966)
    between the md5 experiment arms on TIME TO FIRST HIGH-VALUE
    PURCHASE: duration = days from a user's first event to their first
    ≥95-value purchase, right-censored at their last event when none
    occurred (~15% of users) — the censoring-correct "did the treatment
    speed up conversion?" readout completing the survival lane
    (q:kaplan_meier_events the curve, q:rmst_events the summary, this
    the comparison).  One (group, duration) aggregate, then
    bounded-grid hypergeometric O/E/V sums with round-9 terms in
    DECIMAL(38,9)."""
    from hazelcast_jet_spark.operators.experiment import ab_assign
    from hazelcast_jet_spark.operators.timeseries import logrank_test

    e = _t(spark, sf_dir, "events")
    day = F.to_date("ts")
    span = e.groupBy("user_id").agg(
        F.min(day).alias("first_day"),
        F.max(day).alias("last_day"),
        F.min(F.when((F.col("event_type") == "purchase")
                     & (F.col("value") >= AB_CONV_VALUE), day))
        .alias("conv_day"))
    subj = span.select(
        ab_assign(F.col("user_id"), LOGRANK_SEED).alias("arm"),
        F.datediff(F.coalesce("conv_day", "last_day"), "first_day")
        .alias("duration"),
        F.col("conv_day").isNotNull().alias("observed"))
    return logrank_test(subj, "duration", "observed", "arm")


RMST_HORIZON = 60


def rmst_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time (timeseries.rmst; Uno et al. 2014):
    expected days of user lifetime within the first 60 — the area under
    q:kaplan_meier_events' curve clipped at the horizon, the one-number
    churn summary an LTV model consumes (valid even while the median
    lifetime is still censored).  Same subject table and censoring rule
    as the KM gate; step integral on the tiny curve table with round-9
    terms in DECIMAL(38,9)."""
    from hazelcast_jet_spark.operators.timeseries import rmst

    e = _t(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"))
    mx = span.agg(F.max("last_day").alias("__mx"))
    subj = span.crossJoin(F.broadcast(mx)).select(
        F.datediff("last_day", "first_day").alias("duration"),
        (F.col("last_day") <= F.date_sub("__mx", KM_CENSOR_DAYS))
        .alias("observed"))
    return rmst(subj, "duration", "observed", RMST_HORIZON)


def pareto_front_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/size Pareto frontier over part (profile.pareto_front;
    Börzsönyi et al. 2001 skyline): the sizes whose best retail price
    strictly beats every larger size's best — the undominated
    catalog shortlist.  O(n log n): one per-size rollup, then a
    cumulative-min window over the ~50-row level table; pure
    comparisons, engine-exact by construction."""
    from hazelcast_jet_spark.operators.profile import pareto_front

    p = _t(spark, sf_dir, "part")
    return pareto_front(p, "p_size", "p_retailprice")


CUPED_SEED = "exp42"
CUPED_SPLIT = "1996-01-01"


def cuped_experiment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (experiment.cuped_adjusted_
    means; Deng, Xu, Kohavi & Walker 2013): customers are
    deterministically md5-split into two arms, pre-period spend
    (before 1996) is the covariate, post-period spend the metric;
    theta = cov/var from DECIMAL-exact pooled moments, adjusted arm
    means remove the pre-period variance component.  Two aggregates
    over the per-customer rollup; theta is a broadcast scalar."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          cuped_adjusted_means)

    o = _t(spark, sf_dir, "orders")
    pre = F.when(F.to_date("o_orderdate") < F.lit(CUPED_SPLIT).cast("date"),
                 F.col("o_totalprice"))
    post = F.when(F.to_date("o_orderdate") >= F.lit(CUPED_SPLIT).cast("date"),
                  F.col("o_totalprice"))
    units = o.groupBy("o_custkey").agg(
        F.coalesce(F.sum(pre.cast("decimal(28,12)")).cast("double"),
                   F.lit(0.0)).alias("pre"),
        F.coalesce(F.sum(post.cast("decimal(28,12)")).cast("double"),
                   F.lit(0.0)).alias("post"))
    units = units.withColumn("arm", ab_assign(F.col("o_custkey"), CUPED_SEED))
    return cuped_adjusted_means(units, "arm", "pre", "post")


RD_SEED = "rd1"


def ratio_delta_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method ratio-metric readout (experiment.ratio_metric_delta;
    Deng, Knoblich & Lu 2018): revenue-per-order as Σspend/Σorders over
    md5-arm customers, with the Taylor variance that accounts for the
    within-unit numerator/denominator correlation the naive per-unit
    t-test ignores — the statistic behind every 'revenue per session'
    dashboard.  One DECIMAL-exact moment aggregate; z→p via the shared
    polynomial tail."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          ratio_metric_delta)

    o = _t(spark, sf_dir, "orders")
    units = (o.groupBy("o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(28,12)"))
                  .cast("double").alias("spend"),
                  F.count(F.lit(1)).cast("double").alias("n_orders"))
             .withColumn("arm", ab_assign(F.col("o_custkey"), RD_SEED)))
    return ratio_metric_delta(units, "arm", "spend", "n_orders")


PS_SEED = "ps1"


def post_stratified_ate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified ATE (experiment.post_stratified_ate; Miratrix,
    Sekhon & Yu 2013): md5-arm customers, per-customer total spend as
    the metric, market segment as the post-stratification covariate —
    the analysis-time blocking that removes chance segment imbalance
    from the raw contrast (compare ate_raw vs ate_ps, se_ps carries
    the variance story).  One bounded (segment, arm) cell aggregate
    over the per-customer rollup; DECIMAL-exact moments end to end;
    the z→p tail is the shared fixed-order polynomial."""
    from hazelcast_jet_spark.operators.experiment import (
        ab_assign, post_stratified_ate)

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    units = (o.groupBy("o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(28,12)"))
                  .cast("double").alias("y"))
             .join(c.select(F.col("c_custkey").alias("o_custkey"),
                            "c_mktsegment"), "o_custkey")
             .withColumn("arm", ab_assign(F.col("o_custkey"), PS_SEED)))
    return post_stratified_ate(units, "arm", "y", "c_mktsegment")


def attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- vs last-touch conversion attribution
    (experiment.touch_attribution): per converting user, the first and
    the last non-purchase touch strictly before their first purchase,
    credited per channel — the bookend models whose disagreement
    measures top- vs bottom-of-funnel channels; touchless conversions
    land in '(direct)'.  Two aggregates on the user_id key — the
    bookends are conditional min_by/max_by, no window, no per-user
    sort."""
    from hazelcast_jet_spark.operators.experiment import touch_attribution

    e = _t(spark, sf_dir, "events")
    return touch_attribution(e, conversion_type="purchase")


def isotropy_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding isotropy (similarity.embedding_isotropy;
    Ethayarajh 2019): ||mean vector|| / mean(||vector||) — the
    common-direction diagnostic that flags encoder batches needing
    centering/whitening before ANN indexing.  One posexplode +
    (label, dim) aggregate with DECIMAL coordinate sums; norms reuse
    the l2 fold convention."""
    from hazelcast_jet_spark.operators.similarity import embedding_isotropy

    e = _t(spark, sf_dir, "embeddings")
    return embedding_isotropy(e)


WF_WITHIN_SECONDS = 86400


def window_funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel (timeseries.funnel_counts with
    within_seconds; the ClickHouse-windowFunnel metric): view → click →
    purchase where EVERY later stage completes within 24 h of the
    first view — 'converted within a day', the SLA form of the funnel.
    Same one-partitioning join chain as the unbounded gate; the bound
    is exact NTZ microsecond interval arithmetic on both engines."""
    from hazelcast_jet_spark.operators.timeseries import funnel_counts

    e = _t(spark, sf_dir, "events")
    return funnel_counts(e, FUNNEL_STAGES,
                         within_seconds=WF_WITHIN_SECONDS).orderBy("stage")


FP_COLS = ("doc_id", "lang", "n_chars")


def table_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source reconciliation fingerprint (profile.table_fingerprint):
    count + commutative 48-bit-md5 checksum + min/max hash probes over
    engine-stable column casts — the replica/migration audit.  The gate
    IS the use case: DuckDB recomputes the identical fingerprint from
    its own scan of the same rows."""
    from hazelcast_jet_spark.operators.profile import table_fingerprint

    d = _t(spark, sf_dir, "documents")
    return table_fingerprint(d, list(FP_COLS), group_cols=["source"])


RAKE_TOP_K = 20
RAKE_MAX_WORDS = 4


def rake_keyphrases_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus keyphrase vocabulary (text.rake_keyphrases; Rose et al.
    2010 RAKE): stopword-free token runs scored by summed word
    degree/freq — the 'what is this corpus about' report.  One keyed
    window exchange builds phrases; word stats join back broadcast;
    deterministic (score desc, phrase) top-20."""
    from hazelcast_jet_spark.operators.text import rake_keyphrases

    d = _t(spark, sf_dir, "documents")
    return rake_keyphrases(d, top_k=RAKE_TOP_K, max_words=RAKE_MAX_WORDS)


LPA_ITERS = 2


def lpa_communities_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities (graph.label_propagation; Raghavan
    et al. 2007, deterministic min-label tie-break) over the co-purchase
    graph: top 20 communities by size — the 'product family' clustering
    the association rules slice pair-wise.  Each of the 2 fixed rounds
    is one edge join + two node-keyed aggregates; the oracle unrolls the
    identical rounds."""
    from hazelcast_jet_spark.operators.graph import label_propagation

    labels = label_propagation(_copurchase_edges(spark, sf_dir),
                               iters=LPA_ITERS)
    return (labels.groupBy(F.col("label").alias("community"))
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .orderBy(F.desc("n_nodes"), "community").limit(20))


KCORE_K, KCORE_ITERS = 80, 4


def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core backbone (graph.kcore_peel; Seidman 1983) of the part
    co-purchase graph: the degree histogram of the subgraph surviving 4
    peel rounds at k=80 — the dense always-bought-together backbone the
    LPA communities and association rules sit on (raw degree can be
    faked by one hot order; coreness cannot).  Each round is one degree
    aggregate + two semi-joins with per-round localCheckpoint; the
    oracle unrolls the identical rounds."""
    from hazelcast_jet_spark.operators.graph import kcore_peel

    deg = kcore_peel(_copurchase_edges(spark, sf_dir),
                     k=KCORE_K, iters=KCORE_ITERS)
    return (deg.groupBy("degree")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .orderBy("degree"))


LINKPRED_MAX_DEGREE = 256
LINKPRED_MAX_BASKET = 3


def link_prediction_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link prediction (graph.jaccard_link_prediction;
    Liben-Nowell & Kleinberg 2003) over the SMALL-BASKET co-purchase
    graph (baskets of ≤3 distinct parts): the 20 strongest
    never-co-purchased part pairs — the recommendation candidate list.
    Substrate choice is load-bearing and was measured: the full
    co-purchase graph is dense (median degree ~120 ⇒ 300 M wedges at
    sf0.1 — item-item similarity is the right tool there), and the
    near-dup doc graph has NO open wedges at all (dup clusters are
    cliques, so its oracle returned 0 rows — caught by the
    no-empty-oracle invariant).  Small baskets keep the wedge count
    ~1.3 M at sf0.1 with real predictions; the wedge self-join is
    shuffle-hinted (the static estimator would broadcast the edge
    list)."""
    from hazelcast_jet_spark.operators.graph import (cooccurrence_edges,
                                                     jaccard_link_prediction)

    li = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                               max_group=LINKPRED_MAX_BASKET)
    return jaccard_link_prediction(edges, top_k=20,
                                   max_degree=LINKPRED_MAX_DEGREE)


CORENESS_ITERS = 3


def coreness_hist_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness histogram via the h-index iteration (graph.
    hindex_coreness; Lü et al. 2016): every node starts at its degree
    and 3 rounds of neighbor-h-index converge toward the exact Seidman
    coreness — the PER-NODE core decomposition q:kcore_parts' fixed-k
    peel cannot give.  Small-basket co-purchase substrate; each round
    is one edge join + one in-partition window + one keyed aggregate;
    the oracle unrolls the identical rounds."""
    from hazelcast_jet_spark.operators.graph import (cooccurrence_edges,
                                                     hindex_coreness)

    li = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                               max_group=LINKPRED_MAX_BASKET)
    core = hindex_coreness(edges, iters=CORENESS_ITERS)
    return (core.groupBy("coreness")
            .agg(F.count(F.lit(1)).alias("n_nodes"))
            .orderBy("coreness"))


def khop_reach_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach (graph.khop_reach) over the small-basket
    co-purchase graph: the 20 widest 2-hop neighborhoods with the
    reach2/degree expansion ratio — the blast-radius companion of
    q:link_prediction_parts on the same substrate (bridge parts have
    high expansion; clustered parts low).  Hub-capped middles, one
    distinct over the 2-hop candidate set, shuffle-hinted wedge
    join."""
    from hazelcast_jet_spark.operators.graph import (cooccurrence_edges,
                                                     khop_reach)

    li = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                               max_group=LINKPRED_MAX_BASKET)
    return khop_reach(edges, max_degree=LINKPRED_MAX_DEGREE).limit(20)


def ohlc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles per event type (timeseries.ohlc_resample):
    open/close via conditional min_by/max_by over the (ts, event_id)
    struct — ONE aggregate, no window, no sort; the tick-to-daily
    downsampling every monitoring rollup is."""
    from hazelcast_jet_spark.operators.timeseries import ohlc_resample

    e = _t(spark, sf_dir, "events")
    out = ohlc_resample(e, "event_type", "ts", "value", "event_id")
    return out.withColumnRenamed("key", "event_type")


def session_bounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry/exit/bounce report (timeseries.session_entry_exit): per
    event type, sessions opened / closed / bounced on it — the
    landing-page analysis of web analytics over the 30-min sessionize.
    One sessionize exchange, conditional min_by/max_by bookends, one
    credit-explode aggregate (no full-outer, no second window)."""
    from hazelcast_jet_spark.operators.timeseries import session_entry_exit

    e = _t(spark, sf_dir, "events")
    return session_entry_exit(e)


def seasonality_strength_events(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Weekly-seasonality strength (timeseries.seasonality_strength):
    SS_between_dow / SS_total of daily counts per event type — the
    calendar-drivenness screen that justifies (dow, hour) baselines.
    Exact integer moment sums; dow via epoch-day modulus."""
    from hazelcast_jet_spark.operators.timeseries import seasonality_strength

    e = _t(spark, sf_dir, "events")
    return (seasonality_strength(e, "event_type", "ts")
            .withColumnRenamed("key", "event_type"))


def streaming_ohlc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING daily OHLC: the conditional min_by/max_by bookend lane
    on a real stream (complete mode) — min_by's ordering struct makes
    the bookends commutative across micro-batches, so arrival order
    cannot change the candle; availableNow on bounded input makes the
    batch OHLC SQL the exact oracle.  State bound: one candle row per
    (event_type, day) — calendar×type-bounded."""
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = read_stream_table(spark, sf_dir, "events")
    order = F.struct("ts", "event_id")
    agg = (s.groupBy("event_type", F.to_date("ts").alias("day"))
           .agg(F.min_by("value", order).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", order).alias("close"),
                F.count(F.lit(1)).alias("n_points"),
                (F.round(F.sum(F.col("value").cast("decimal(28,12)"))
                         .cast("double"), 6) + F.lit(0.0))
                .alias("sum_value")))
    return run_to_batch(agg, "complete").orderBy("event_type", "day")


AB_CONV_VALUE = 95.0


def ab_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B readout + SRM guardrail
    (experiment.ab_proportion_test): users md5-split into arms,
    conversion = made a purchase of value >= 95 (every user purchases
    in the synthetic log; an all-converted metric has zero pooled
    variance — the operator raises on that degenerate pool); per-arm rates plus the pooled z
    and the sample-ratio-mismatch z — the binary-metric twin of the
    CUPED gate.  Counts are exact BIGINTs; both statistics are a few
    double ops the oracle replays in the same order."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          ab_proportion_test)

    e = _t(spark, sf_dir, "events")
    big = ((F.col("event_type") == "purchase")
           & (F.col("value") >= AB_CONV_VALUE)).cast("int")
    units = (e.groupBy("user_id")
             .agg(F.max(big).cast("boolean").alias("converted"))
             .withColumn("arm", ab_assign(F.col("user_id"), CUPED_SEED)))
    return ab_proportion_test(units, "arm", "converted")


SELFREP_K = 5
SELFREP_THRESHOLD = 0.2


def self_repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-doc repetition screen (text.self_repetition): per source,
    mean 1−distinct/total token 5-gram windows and the share of
    degenerate docs — the loop/stutter/template-spam metric corpus-wide
    dup-span stats can't see (the repeats never leave the doc).
    Map-side window assembly; one per-source rollup."""
    from hazelcast_jet_spark.operators.text import self_repetition

    d = _t(spark, sf_dir, "documents")
    return self_repetition(d, k=SELFREP_K,
                           degenerate_threshold=SELFREP_THRESHOLD)


def fisher_separation_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separation profile (clustering.fisher_separation): per
    label the within-class scatter and centroid-to-global distance,
    plus the between/within Fisher ratio — the 'are these labels even
    separable' screen run before training any probe.  One posexplode,
    one (label, dim) DECIMAL aggregate; everything after runs on the
    |labels|·dim table."""
    from hazelcast_jet_spark.operators.clustering import fisher_separation

    e = _t(spark, sf_dir, "embeddings")
    return fisher_separation(e)


def growth_decomposition_orders(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """MoM revenue-change decomposition (timeseries.growth_
    decomposition): ΔR split into volume, price and cross effects —
    the 'why did the KPI move' follow-up to q:monthly_growth_orders.
    One monthly rollup + lag-window arithmetic on the months table."""
    from hazelcast_jet_spark.operators.timeseries import growth_decomposition

    o = _t(spark, sf_dir, "orders")
    return growth_decomposition(o, "o_orderdate", "o_totalprice")


def stickiness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly DAU/WAU stickiness (timeseries.stickiness): the
    engagement-depth pulse.  Distinct (week, day, user) compacts
    first; DAU and WAU both derive from that one table; epoch-week
    integer math (no calendar anchors)."""
    from hazelcast_jet_spark.operators.timeseries import stickiness

    e = _t(spark, sf_dir, "events")
    return stickiness(e)


TREND_HALFLIFE_DAYS = 28


def trending_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed part popularity (timeseries.decayed_score): every
    28 days of age halves an order's weight; DYADIC decay (2^−n is an
    exact IEEE power of two) so there is zero libm exp()/pow() rounding
    exposure — the engine-portable trending score.  One broadcast ref
    date, one equi-join to orders, one per-part aggregate."""
    from hazelcast_jet_spark.operators.timeseries import decayed_score

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.select("l_orderkey", "l_partkey").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"))
    out = decayed_score(j, "l_partkey", "o_orderdate",
                        halflife_days=TREND_HALFLIFE_DAYS)
    return out.withColumnRenamed("key", "part")


def new_vs_returning_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting (timeseries.new_vs_returning): per epoch week,
    users in their first-ever active week vs returning — the 'new' leg
    of net growth, complementing cohort retention.  One distinct
    compaction + one per-user min, both keyed on the user."""
    from hazelcast_jet_spark.operators.timeseries import new_vs_returning

    e = _t(spark, sf_dir, "events")
    return new_vs_returning(e)


K_ANON_KS = (2, 5, 10, 20)


def k_anonymity_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (profile.k_anonymity; Sweeney 2002) over the
    customer quasi-identifiers (nation, market segment): rows in
    equivalence classes below k are re-identifiable — the governance
    screen before any extract ships.  One groupBy; every k derives
    from the same class-size table in one pass."""
    from hazelcast_jet_spark.operators.profile import k_anonymity

    c = _t(spark, sf_dir, "customer")
    return k_anonymity(c, ["c_nationkey", "c_mktsegment"], ks=K_ANON_KS)


def streaming_fingerprint_events(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """CONTINUOUS reconciliation (profile.table_fingerprint on a real
    stream): the commutative checksum is micro-batch-order-free by
    construction, so the streaming fingerprint equals the batch one —
    the live replica-audit loop (stream the CDC feed, compare
    checksums downstream).  State bound: ONE global checksum row —
    O(1) regardless of stream size."""
    from hazelcast_jet_spark.operators.profile import table_fingerprint
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = read_stream_table(spark, sf_dir, "events")
    agg = table_fingerprint(s, ["event_id", "user_id", "event_type"],
                            group_cols=["event_type"])
    return run_to_batch(agg, "complete").orderBy("event_type")


def experiment_readout_events(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Composition gate: the full experiment readout in ONE row set —
    per md5 arm: users, high-value-purchase conversion rate, exact mean
    events/user, and the p50 first-view→first-purchase lag in minutes.
    Pins ab_assign, the conversion predicate, per-user rollups and the
    lag bookends against each other the way llm_data_pipeline_counts
    pins the transform chain."""
    from hazelcast_jet_spark.operators.experiment import ab_assign
    from hazelcast_jet_spark.operators.timeseries import _epoch_seconds

    e = _t(spark, sf_dir, "events")
    es = _epoch_seconds(e, "ts")
    per = (e.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("__n"),
                F.max(((F.col("event_type") == "purchase")
                       & (F.col("value") >= AB_CONV_VALUE)).cast("int"))
                .alias("__conv"),
                F.min(F.when(F.col("event_type") == "view", es))
                .alias("__v0"),
                F.min(F.when(F.col("event_type") == "purchase", es))
                .alias("__p0"))
           .withColumn("arm", ab_assign(F.col("user_id"), CUPED_SEED)))
    lag_min = F.when(F.col("__p0") > F.col("__v0"),
                     (F.col("__p0") - F.col("__v0")) / F.lit(60.0))
    return (per.groupBy("arm")
            .agg(F.count(F.lit(1)).alias("n_users"),
                 (F.round(F.sum("__conv").cast("double")
                          / F.count(F.lit(1)).cast("double"), 6)
                  + F.lit(0.0)).alias("conv_rate"),
                 (F.round(F.sum(F.col("__n").cast("decimal(38,0)"))
                          .cast("double")
                          / F.count(F.lit(1)).cast("double"), 6)
                  + F.lit(0.0)).alias("avg_events"),
                 (F.round(F.percentile(lag_min, F.lit(0.5)), 6)
                  + F.lit(0.0)).alias("p50_lag_min"))
            .orderBy("arm"))


L_DIV_LS = (2, 3, 5)


def l_diversity_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (profile.l_diversity; Machanavajjhala et al.
    2007): classes anonymous by size whose sensitive value (market
    segment) is near-constant still disclose it — the homogeneity-
    attack companion to q:k_anonymity_customer, same single-pass
    shape."""
    from hazelcast_jet_spark.operators.profile import l_diversity

    c = _t(spark, sf_dir, "customer")
    return l_diversity(c, ["c_nationkey"], "c_mktsegment", ls=L_DIV_LS)


T_CLOSE_TS = (0.05, 0.1, 0.2)


def t_closeness_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (profile.t_closeness; Li, Li &
    Venkatasubramanian 2007): classes that are l-diverse can still leak
    through a SKEWED sensitive distribution — per nation, the total
    variation distance of the market-segment mix from the table-wide
    mix, thresholded — completing the k-anonymity / l-diversity /
    t-closeness privacy triad over the same quasi-identifier.  One
    cell-table scan; bounded class×value grid; per-class TVD sums
    accumulate in DECIMAL(28,12) (the w1_drift discipline)."""
    from hazelcast_jet_spark.operators.profile import t_closeness

    c = _t(spark, sf_dir, "customer")
    return t_closeness(c, ["c_nationkey"], "c_mktsegment", ts=T_CLOSE_TS)


def rank_semantics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-semantics pin: rank(), dense_rank() and row_number() over
    the same (order count desc) ordering for the top customers — order
    counts collide heavily, so every gap/density/tiebreak convention
    is exercised and must match the oracle exactly (row_number gets
    the deterministic custkey tiebreak; rank/dense_rank deliberately
    rank on the tied key alone)."""
    o = _t(spark, sf_dir, "orders")
    cnt = (o.groupBy("o_custkey")
           .agg(F.count(F.lit(1)).alias("n_orders")))
    w = Window.orderBy(F.desc("n_orders"))
    wd = Window.orderBy(F.desc("n_orders"), "o_custkey")
    return (cnt.select("o_custkey", "n_orders",
                       F.rank().over(w).alias("rnk"),
                       F.dense_rank().over(w).alias("drnk"),
                       F.row_number().over(wd).alias("rn"))
            .orderBy(F.desc("n_orders"), "o_custkey").limit(20))


MARKOV_ITERS = 3


def markov_stationary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Steady-state behavioral mix (timeseries.markov_stationary):
    3-round power method on the row-normalized transition matrix —
    the long-run state-share ranking transition probabilities alone
    can't show.  K²-bounded iterations; oracle unrolls the rounds."""
    from hazelcast_jet_spark.operators.timeseries import markov_stationary

    e = _t(spark, sf_dir, "events")
    return markov_stationary(e, iters=MARKOV_ITERS)


def position_attribution_events(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """U-shaped multi-touch attribution (timeseries.position_
    attribution): 0.4/0.2-split/0.4 fractional credits per channel —
    the marketing-standard compromise between the first/last bookends
    of q:attribution_events.  One user exchange, one Window exec,
    decimal-exact fractional sums."""
    from hazelcast_jet_spark.operators.timeseries import position_attribution

    e = _t(spark, sf_dir, "events")
    return position_attribution(e)


def centroid_distance_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label confusability map (clustering.centroid_distances): pairwise
    centroid distances — WHERE a probe on these embeddings will bleed,
    the per-pair detail behind q:fisher_separation_emb's one number.
    One posexplode + (label, dim) aggregate; the pair join runs on the
    |labels|·dim centroid table."""
    from hazelcast_jet_spark.operators.clustering import centroid_distances

    e = _t(spark, sf_dir, "embeddings")
    return centroid_distances(e)


DID_SEED = "did9"
DID_SPLIT = "1998-01-01"


def did_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout (experiment.diff_in_diff) on a
    simulated staged rollout: customers md5-split into two arms, order
    value compared across the pre/post halves of the order log —
    the quasi-experimental estimator for launches that can't randomize
    per-unit (parallel-trends assumption documented in the operator).
    One customer-period rollup (the only real shuffle), then ONE 4-cell
    conditional aggregate collected once; estimate/SE/t are fixed-order
    doubles on exact DECIMAL sums."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          diff_in_diff)

    o = _t(spark, sf_dir, "orders")
    units = (o.groupBy(
        "o_custkey",
        F.when(F.col("o_orderdate") < DID_SPLIT, F.lit("pre"))
         .otherwise(F.lit("post")).alias("period"))
        .agg((dsum(F.col("o_totalprice"))
              / F.count(F.lit(1)).cast("double")).alias("avg_value"))
        .withColumn("arm", ab_assign(F.col("o_custkey"), DID_SEED)))
    return diff_in_diff(units, "arm", "period", "avg_value")


BAL_SEED = "bal9"


def covariate_balance_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment randomization audit (experiment.covariate_balance):
    standardized mean differences of account balance, order count and
    total spend between the md5-assigned arms — run BEFORE the readout;
    |smd| >= 0.1 flags a broken split.  One orders rollup + broadcast-
    sized melt; moments are DECIMAL-exact."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          covariate_balance)

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("__n_orders"),
        dsum(F.col("o_totalprice")).alias("__spend"))
    units = (c.join(spend, c.c_custkey == spend.o_custkey, "left")
             .select(
                 ab_assign(F.col("c_custkey"), BAL_SEED).alias("arm"),
                 F.col("c_acctbal").alias("acctbal"),
                 F.coalesce("__n_orders", F.lit(0)).cast("double")
                 .alias("n_orders"),
                 F.coalesce("__spend", F.lit(0.0)).alias("total_spend")))
    return covariate_balance(units, "arm",
                             ["acctbal", "n_orders", "total_spend"])


FDR_SEED = "fdr9"
FDR_Q = 0.05


def fdr_bh_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guardrail-metric sweep with FDR control (experiment.fdr_bh;
    Benjamini & Hochberg 1995): one two-proportion z-test per event
    type ("do the md5-split arms differ in the share of users whose
    FIRST event is this type?") and the BH-adjusted p-values that keep
    the family-wise false-alarm budget at q=0.05 — the correction any
    dashboard reading 5+ metrics per experiment needs.  First-event
    composition (min_by with an (ts, event_id) tie-break) is the
    metric because per-type REACH is saturated in this log (every user
    reaches every type → pool=1 → z degenerate).  Plan: one per-user
    min_by, one per-(type, arm) count, arm totals broadcast back; z
    and the A&S two-sided p (experiment.two_sided_p — sub-ulp exp()
    variance absorbed by round-6) run on the tiny per-type table, and
    fdr_bh's windows add no extra scan (m is an in-plan window count)."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign, fdr_bh,
                                                          two_sided_p)

    e = _t(spark, sf_dir, "events")
    first = (e.groupBy("user_id")
             .agg(F.min_by("event_type", F.struct("ts", "event_id"))
                  .alias("event_type"))
             .withColumn("arm", ab_assign(F.col("user_id"), FDR_SEED)))
    # arm totals are the column sums of the tiny per-type table (each
    # user contributes exactly one first-event row), so ONE scan of the
    # event log feeds both the cells and the denominators
    w_all = Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing)
    conv = (first.groupBy("event_type")
            .agg(F.sum((F.col("arm") == "A").cast("bigint")).alias("__ca"),
                 F.sum((F.col("arm") == "B").cast("bigint")).alias("__cb"))
            .withColumn("__na", F.sum("__ca").over(w_all))
            .withColumn("__nb", F.sum("__cb").over(w_all)))
    na, nb = F.col("__na").cast("double"), F.col("__nb").cast("double")
    pa = F.col("__ca").cast("double") / na
    pb = F.col("__cb").cast("double") / nb
    pool = ((F.col("__ca") + F.col("__cb")).cast("double")
            / (F.col("__na") + F.col("__nb")).cast("double"))
    z = (pa - pb) / F.sqrt(pool * (F.lit(1.0) - pool)
                           * (F.lit(1.0) / na + F.lit(1.0) / nb))
    tests = conv.select(F.col("event_type"), two_sided_p(z).alias("__p"))
    out = fdr_bh(tests, "event_type", "__p", q=FDR_Q)
    return out.withColumnRenamed("test", "event_type")


def nelson_aalen_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative user-churn hazard
    (timeseries.nelson_aalen) over the SAME censored subject table as
    q:kaplan_meier_events — the additive twin of the KM curve,
    preferred when hazards are compared or summed.  Unlike KM's
    strictly-sequential product (which forced a recursive-CTE oracle),
    the hazard sum accumulates in DECIMAL — order-free exact, so the
    oracle is a plain windowed decimal SUM."""
    from hazelcast_jet_spark.operators.timeseries import nelson_aalen

    e = _t(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"))
    mx = span.agg(F.max("last_day").alias("__mx"))
    subj = span.crossJoin(F.broadcast(mx)).select(
        F.datediff("last_day", "first_day").alias("duration"),
        (F.col("last_day") <= F.date_sub("__mx", KM_CENSOR_DAYS))
        .alias("observed"))
    return nelson_aalen(subj, "duration", "observed")


def theilsen_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume trend per event type
    (timeseries.theil_sen_trend; Theil 1950, Sen 1968): the median of
    pairwise slopes — the outlier-immune answer to "is this event type
    growing?" that q:linear_trend_agg's OLS gets wrong under one bad
    day (29% breakdown vs 0).  One daily rollup (the only event scan),
    then the calendar-bounded pair join; medians are SELECTION (lower
    median by rank), so every double is engine-exact."""
    from hazelcast_jet_spark.operators.timeseries import theil_sen_trend

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy(
        F.col("event_type").alias("key"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n")))
    return theil_sen_trend(daily, "key", "day", "n")


LEAD_LAG_X = "view"
LEAD_LAG_Y = "purchase"
LEAD_LAG_MAX = 6


def lead_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag discovery (timeseries.lead_lag_corr): Pearson
    cross-correlation between hourly 'view' and 'purchase' volumes at
    lags −6..+6 h on the complete zero-filled hour grid — "does
    browsing volume move before buying volume, and by how much?", the
    causal-direction screen run before any funnel attribution.  One
    event-scan rollup; the lag explode multiplies only the bounded
    hour grid; moments are DECIMAL-exact integer products."""
    from hazelcast_jet_spark.operators.timeseries import lead_lag_corr

    e = _t(spark, sf_dir, "events")
    return lead_lag_corr(e, "ts",
                         F.col("event_type") == LEAD_LAG_X,
                         F.col("event_type") == LEAD_LAG_Y,
                         bucket_seconds=3600, max_lag=LEAD_LAG_MAX)


def granger_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-lag Granger predictive screen (timeseries.granger_screen;
    Granger 1969) between hourly 'view' and 'purchase' volumes: does
    last hour's browsing improve the purchase forecast beyond last
    hour's purchases themselves (and vice versa)?  The inferential
    companion to q:lead_lag_events — closed-form restricted vs
    unrestricted OLS from ONE moment aggregate over the zero-filled
    hour grid; DECIMAL-exact integer products, F and R² as fixed-order
    doubles."""
    from hazelcast_jet_spark.operators.timeseries import granger_screen

    e = _t(spark, sf_dir, "events")
    return granger_screen(e, "ts",
                          F.col("event_type") == LEAD_LAG_X,
                          F.col("event_type") == LEAD_LAG_Y,
                          bucket_seconds=3600)


DP_EPS = 0.5
DP_SEED = "dp9"


def dp_noisy_counts_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private per-nation customer counts
    (profile.dp_noisy_counts; Dwork et al. 2006, ε=0.5) — the
    release-side governance twin of q:k_anonymity_customer: instead of
    suppressing small groups, every count carries seeded Laplace(1/ε)
    noise calibrated to sensitivity 1.  Seeded noise (md5 inverse-CDF)
    is what makes the release testable/replayable here; the operator
    docstring spells out that production releases rotate a secret
    seed.  One map-side aggregate + row-local noise arithmetic."""
    from hazelcast_jet_spark.operators.profile import dp_noisy_counts

    c = _t(spark, sf_dir, "customer")
    return dp_noisy_counts(c, ["c_nationkey"], DP_EPS, seed=DP_SEED)


def automation_screen_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation shortlist (timeseries.automation_screen): the 20
    users most suspicious by events-per-active-minute, with the
    inter-arrival regularity statistic (gap cv ≈ 0 = timer-driven,
    ≈ 1 = human/Poisson) — the traffic-cleaning screen run before any
    engagement metric is trusted.  Threshold-free (ranked shortlist);
    one per-user lag window + one exact-moment aggregate; top-k is
    TakeOrdered."""
    from hazelcast_jet_spark.operators.timeseries import automation_screen

    e = _t(spark, sf_dir, "events")
    return automation_screen(e, "user_id", "ts", top_k=20)


ZORDER_FILES = 64


def zorder_layout_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping layout planner (bucketing.layout_locality_audit;
    Morton 1966): simulate writing orders as 64 files sorted by
    customer, by date, or Z-ORDERED on (customer, date), and report
    per-file min/max span fractions per dimension — x-sort prunes
    customer predicates but scans everything for date ranges; Z-order
    lands ~1/sqrt(files) on BOTH, the evidence needed before paying
    for a 100 TB OPTIMIZE ZORDER rewrite.  Rank-quantization (ntile
    with an o_orderkey tiebreak) keeps engines bit-agreed; the audit
    windows run on a 2-int projection (sample beyond ~10^7 rows — the
    rewrite itself uses repartitionByRange, which scales)."""
    from hazelcast_jet_spark.operators.bucketing import layout_locality_audit

    o = _t(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"),
                     F.lit("1970-01-01").cast("date"))
    base = o.select(F.col("o_custkey").alias("cust"), day.alias("day"),
                    F.col("o_orderkey").alias("okey"))
    return layout_locality_audit(base, "cust", "day", "okey",
                                 n_files=ZORDER_FILES)


def forecast_backtest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead backtest (timeseries.forecast_backtest): naive /
    seasonal-naive / Holt forecasts of the daily event rate per type,
    scored MAE + sMAPE on the shared evaluation window — the "is the
    model better than yesterday's value?" gate behind
    q:holt_linear_events.  Same Arrow recurrence lane (alpha=beta=0.5
    exact binary scalings), lag baselines are windows on the daily
    rollup; the oracle replays Holt as a recursive CTE then scores
    identically."""
    from hazelcast_jet_spark.operators.timeseries import forecast_backtest

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("event_type").alias("key"),
                       F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).cast("double").alias("n")))
    return forecast_backtest(daily, "key", "day", "n")


def ltv_cohort_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves (timeseries.ltv_cohorts): customers
    cohorted by first-order month; per (cohort, month-age) the active
    count, revenue, and CUMULATIVE revenue per cohort member — the LTV
    curve that prices acquisition, the value twin of
    q:cohort_retention_counts.  Integer month arithmetic, DECIMAL money
    end-to-end (the monthly_growth (18,6) convention), one customer
    shuffle."""
    from hazelcast_jet_spark.operators.timeseries import ltv_cohorts

    o = _t(spark, sf_dir, "orders")
    return ltv_cohorts(o, "o_custkey", "o_orderdate", "o_totalprice")


OPS_SEED = "ops9"


def offline_policy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation (experiment.offline_policy_value; Li et
    al. 2011): from the md5-randomized log, estimate the purchase-rate
    a CONTEXTUAL rule ("arm B for users whose first event is a view,
    else A") would have collected — IPS and SNIPS, the counterfactual
    readout that prices a targeting rule without a new experiment.
    One per-user aggregate builds (logged, target, reward); the
    estimator is one more aggregate of exact counts + DECIMAL reward
    sums."""
    from hazelcast_jet_spark.operators.experiment import (
        ab_assign, offline_policy_value)

    e = _t(spark, sf_dir, "events")
    units = (e.groupBy("user_id")
             .agg(F.min_by("event_type", F.struct("ts", "event_id"))
                  .alias("__first"),
                  F.max((F.col("event_type") == "purchase").cast("int"))
                  .cast("double").alias("reward"))
             .select(ab_assign(F.col("user_id"), OPS_SEED).alias("logged"),
                     F.when(F.col("__first") == "view", F.lit("B"))
                     .otherwise(F.lit("A")).alias("target"),
                     "reward"))
    return offline_policy_value(units, "logged", "target", "reward",
                                propensity=0.5)


def streaming_dp_counts_events(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """CONTINUOUS ε-DP count release: the streaming twin of
    q:dp_noisy_counts_customer — per-event-type counts maintained by a
    complete-mode streaming aggregate (bounded state: one row per
    type), with the seeded Laplace noise applied to the RELEASED table
    each emission.  This is how a privacy-preserving live dashboard
    runs: the true counter state never leaves the engine; every
    emission re-perturbs from the same seed so the release is stable
    across micro-batches (a per-emission fresh draw would leak by
    averaging — the composition caveat the operator documents).
    availableNow on bounded input makes the batch release the exact
    oracle."""
    from hazelcast_jet_spark.operators.profile import dp_laplace_noise
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = read_stream_table(spark, sf_dir, "events")
    counts = run_to_batch(
        s.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n")),
        "complete")
    noise = dp_laplace_noise(F.col("event_type"), DP_EPS, DP_SEED)
    return (counts.select(
        "event_type",
        (F.round(F.col("__n").cast("double") + noise, 6)
         + F.lit(0.0)).alias("noisy_count"))
        .orderBy("event_type"))


def streaming_lead_lag_events(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """CONTINUOUS lead-lag monitor: the UNBOUNDED pass of
    q:lead_lag_events — the hourly (view, purchase) bucket rollup —
    runs as a complete-mode streaming aggregate (state: one row per
    hour, calendar-bounded); the grid/lag/Pearson tail is bounded
    batch post-processing on each released counter table.  The
    decomposition is the point: at 100 TB/day only the rollup touches
    the stream, and it is commutative (counts), so arrival order and
    micro-batch boundaries cannot change the correlation."""
    from hazelcast_jet_spark.operators.timeseries import _epoch_seconds
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = read_stream_table(spark, sf_dir, "events")
    hr = F.floor(_epoch_seconds(s, "ts") / F.lit(3600.0))
    from hazelcast_jet_spark.operators.timeseries import (
        lead_lag_from_buckets)

    per = run_to_batch(
        s.select(hr.alias("__h"),
                 (F.col("event_type") == LEAD_LAG_X).cast("bigint")
                 .alias("__fx"),
                 (F.col("event_type") == LEAD_LAG_Y).cast("bigint")
                 .alias("__fy"))
        .groupBy("__h")
        .agg(F.sum("__fx").alias("__x"), F.sum("__fy").alias("__y")),
        "complete")
    # the streamed counter table feeds the SAME bounded tail the batch
    # operator uses — identical arithmetic, shared code
    return lead_lag_from_buckets(per, max_lag=LEAD_LAG_MAX)


WT_SEED = "wt9"


def welch_t_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t readout (experiment.welch_t_test) on per-customer
    total spend across the md5 arms — the CONTINUOUS-metric test the
    two-proportion z (q:ab_conversion_events) cannot give; normal-
    approximation p at experiment-scale df.  One per-arm moment
    aggregate, execute-once local relation."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          welch_t_test)

    o = _t(spark, sf_dir, "orders")
    units = (o.groupBy("o_custkey")
             .agg(dsum(F.col("o_totalprice")).alias("spend"))
             .withColumn("arm", ab_assign(F.col("o_custkey"), WT_SEED)))
    return welch_t_test(units, "arm", "spend")


def mann_whitney_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U readout (experiment.mann_whitney_u) on
    per-customer ORDER COUNT across the md5 arms — the nonparametric
    twin of q:welch_t_orders, on a metric with heavy ties (counts), so
    the tie-corrected variance actually binds.  The metric collapses
    to its distinct-value table; average ranks come from one
    cumulative window over it."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          mann_whitney_u)

    o = _t(spark, sf_dir, "orders")
    units = (o.groupBy("o_custkey")
             .agg(F.count(F.lit(1)).alias("n_orders"))
             .withColumn("arm", ab_assign(F.col("o_custkey"), WT_SEED)))
    return mann_whitney_u(units, "arm", "n_orders", arms=("A", "B"))


def qte_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (experiment.quantile_treatment_effects)
    of per-customer spend across the md5 arms: where in the
    distribution the arms differ — the distributional readout a mean
    lift hides.  Lower-rank selection quantiles (engine-exact), one
    per-arm ordering window over the (arm, spend) projection."""
    from hazelcast_jet_spark.operators.experiment import (
        ab_assign, quantile_treatment_effects)

    o = _t(spark, sf_dir, "orders")
    units = (o.groupBy("o_custkey")
             .agg(dsum(F.col("o_totalprice")).alias("spend"))
             .withColumn("arm", ab_assign(F.col("o_custkey"), WT_SEED)))
    return quantile_treatment_effects(units, "arm", "spend",
                                      arms=("A", "B"))


def median_ci_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free median CI per order priority
    (profile.median_ci): the order-statistic interval that needs no
    variance estimate or normality — the robust companion to
    q:percentile_stats.  Pure rank selection (engine-exact) on one
    per-group ordering window over the (priority, price) projection."""
    from hazelcast_jet_spark.operators.profile import median_ci

    o = _t(spark, sf_dir, "orders")
    return median_ci(o, "o_totalprice", ["o_orderpriority"])


def capture_recapture_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture universe estimate
    (profile.capture_recapture; Chapman 1951): users observed in the
    first vs second half of the log as the two capture windows —
    "how many users exist that we never logged?" — the statistical
    twin of q:hll_overlap_events' sketch arithmetic, with a standard
    error.  Equal-catchability caveat documented (heavy users are in
    both windows, biasing N̂ low).  One distinct compaction + one 1-row
    aggregate; the horizon midpoint is a broadcast scalar."""
    from hazelcast_jet_spark.operators.profile import capture_recapture

    e = _t(spark, sf_dir, "events")
    ends = e.agg(F.min(F.to_date("ts")).alias("__lo"),
                 F.max(F.to_date("ts")).alias("__hi"))
    mid = F.date_add("__lo", F.floor(F.datediff("__hi", "__lo")
                                     / F.lit(2)).cast("int"))
    base = (e.crossJoin(F.broadcast(ends))
            .select("user_id",
                    (F.to_date("ts") <= mid).alias("__a"),
                    (F.to_date("ts") > mid).alias("__b")))
    return capture_recapture(base, "user_id", F.col("__a"), F.col("__b"))


PK_SEED = "pk9"


def peeking_trace_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The peeking curve (experiment.peeking_trace): the two-proportion
    purchase z-statistic recomputed after every day of the md5
    experiment — the visual proof that daily significance checks
    inflate false positives (each ±1.96 crossing is a would-have-
    stopped-early event), the reason q:fdr_bh_events corrects across
    metrics and horizons are pre-registered.  One per-user rollup
    (checkpointed), cumulative windows on the day grid."""
    from hazelcast_jet_spark.operators.experiment import peeking_trace

    e = _t(spark, sf_dir, "events")
    return peeking_trace(e, "user_id", "ts", "event_type", "purchase",
                         seed=PK_SEED)


HW_PERIOD = 7


def hw_seasonal_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive smoothing (timeseries.holt_winters_additive)
    of daily event counts per type with weekly seasonality — the
    seasonal completion of the exponential family (q:ewma_event_rate
    flat, q:holt_linear_events trend, this one trend + period-7
    offsets); the model q:forecast_backtest_events' snaive baseline
    challenges.  One applyInPandas exchange per key over the
    calendar-bounded daily rollup; dyadic α=β=γ=0.5 makes the
    list-carrying recursive-CTE oracle a bit-exact replay."""
    from hazelcast_jet_spark.operators.timeseries import holt_winters_additive

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    out = holt_winters_additive(daily, "event_type", "day", "n",
                                period=HW_PERIOD)
    return (out.select("event_type", "day", "n", "level", "trend",
                       "seasonal", "forecast")
            .orderBy("event_type", "day"))


def textrank_keywords_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords (text.textrank_keywords; Mihalcea & Tarau
    2004): top 20 corpus keywords by PageRank over the word-adjacency
    graph — the graph-centrality complement to q:rake_keyphrases_docs
    and q:tfidf_top_terms, reusing graph.pagerank's DECIMAL-exact
    fixed-iteration machinery over a vocabulary-bounded edge list.
    The oracle unrolls the identical iterations."""
    from hazelcast_jet_spark.operators.text import textrank_keywords

    d = _t(spark, sf_dir, "documents")
    return textrank_keywords(d, top_k=20, iters=PAGERANK_ITERS,
                             damping=PAGERANK_DAMPING)


def mutual_info_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (profile.mutual_information) between market
    segment and nation — the feature-redundancy screen comparable
    across cardinalities (q:categorical_assoc_docs' Cramér's V is
    contingency-shaped; NMI detects any dependence and lands in
    [0,1]).  One K·L cell aggregate, window marginals on the bounded
    grid, round-12 entropy terms in DECIMAL(38,12)."""
    from hazelcast_jet_spark.operators.profile import mutual_information

    c = _t(spark, sf_dir, "customer")
    return mutual_information(c, "c_mktsegment", "c_nationkey")


def source_ablation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out ablation (profile.group_ablation): the
    corpus mean length and token count WITHOUT each source, and the
    delta — the data-mixture ablation a training-data pipeline runs
    per slice ("does dropping this source raise average quality?"),
    costing ONE scan for the whole sweep instead of a re-aggregation
    per source.  Exact DECIMAL arithmetic on one aggregate's sums."""
    from hazelcast_jet_spark.operators.profile import group_ablation
    from hazelcast_jet_spark.operators.text import normalize_text

    d = (_t(spark, sf_dir, "documents")
         .withColumn("n_tokens",
                     F.size(F.split(normalize_text("text"), " "))))
    return group_ablation(d, "source", ["n_chars", "n_tokens"])


AIPW_SEED = "aipw1"


def aipw_ate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust ATE (experiment.aipw_ate; Robins et al. 1994) of
    the md5 experiment on per-customer mean order value, with market
    segment as the outcome-model stratum — the variance-reduced causal
    readout completing the estimator family (q:cuped_experiment_orders
    covariate adjustment, q:did_orders quasi-experimental, this the
    influence-function form with known propensity 0.5).  One per-
    customer rollup, one broadcast (stratum × arm) model join, one ψ
    fold with round-9 terms in DECIMAL(38,9)."""
    from hazelcast_jet_spark.operators.experiment import ab_assign, aipw_ate

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    units = (o.groupBy("o_custkey")
             .agg((dsum("o_totalprice")
                   / F.count(F.lit(1)).cast("double")).alias("y"))
             .join(c.select(F.col("c_custkey").alias("o_custkey"),
                            "c_mktsegment"), "o_custkey")
             .withColumn("arm", ab_assign(F.col("o_custkey"), AIPW_SEED)))
    return aipw_ate(units, "arm", "y", "c_mktsegment")


TE_SEED, TE_FOLDS, TE_SMOOTH = "te1", 5, 20.0


def target_encode_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding (sampling.target_encode_oof;
    Micci-Barreca 2001): order-priority encoded by the leakage-safe
    smoothed mean of order value — each md5 fold's encoding computed
    from the other four folds, shrunk toward the global mean with
    prior weight 20 — the categorical-feature primitive an ML training
    pipeline joins (broadcast) onto its examples.  ONE aggregate to the
    5×5 (fold, category) grid, window totals on that grid,
    DECIMAL-exact label sums."""
    from hazelcast_jet_spark.operators.sampling import target_encode_oof

    o = _t(spark, sf_dir, "orders")
    return target_encode_oof(o, "o_orderpriority", "o_totalprice",
                             "o_orderkey", k=TE_FOLDS, seed=TE_SEED,
                             smoothing=TE_SMOOTH)


SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]


def shapley_attribution_events(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Shapley-value channel attribution (experiment.
    shapley_attribution; Shapley 1953, Zhao et al. 2018): each
    non-purchase event type's fair share of purchase credit, averaging
    marginal contributions over all 2^4 touch-set coalitions — the
    principled answer to q:attribution_events' first/last-touch
    bookends.  One per-user touch-set aggregate, a ≤16-row v(S) table,
    and an in-plan join against the generated (channel, S, S∪i, weight)
    literals with round-12 terms in DECIMAL(38,12) — the oracle shares
    the same generated literals and replays every bit."""
    from hazelcast_jet_spark.operators.experiment import shapley_attribution

    e = _t(spark, sf_dir, "events")
    return shapley_attribution(e, "user_id", "ts", "event_type",
                               "purchase", channels=SHAPLEY_CHANNELS)


def _shapley_pairs_sql(channels: list[str]) -> str:
    """The (channel, S, S∪{i}, weight) literal rows both engines share —
    generated once here so the Spark plan and the DuckDB oracle carry
    bit-identical weights."""
    from itertools import combinations
    from math import factorial

    channels = sorted(channels)
    k = len(channels)
    rows = []
    for ch in channels:
        rest = [c for c in channels if c != ch]
        for size in range(k):
            for sub in combinations(rest, size):
                w = factorial(size) * factorial(k - size - 1) / factorial(k)
                s_wo = ",".join(sorted(sub))
                s_wi = ",".join(sorted(sub + (ch,)))
                rows.append(f"('{ch}', '{s_wo}', '{s_wi}', {w!r})")
    return ", ".join(rows)


CONF_LAG = 7


def conformal_forecast_events(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Split-conformal forecast interval
    (timeseries.conformal_snaive_interval; Vovk et al. 2005, Lei et al.
    2018) per event type: the exact order-statistic half-width q̂ that
    guarantees 90% marginal coverage for the seasonal-naive daily-count
    forecaster, plus the realized test-suffix coverage — the honest
    uncertainty band around q:hw_seasonal_events /
    q:forecast_backtest_events point forecasts, with
    realized-vs-nominal as the drift alarm.  All-integer rank
    arithmetic, row_number order-statistic pick, exact count ratios —
    engine-replayable end to end."""
    from hazelcast_jet_spark.operators.timeseries import (
        conformal_snaive_interval)

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    return conformal_snaive_interval(daily, "event_type", "day", "n",
                                     seasonal_lag=CONF_LAG)


def streaming_conformal_events(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """LIVE forecast certification (the streaming twin of
    q:conformal_forecast_events, the q:streaming_lead_lag_events
    pattern): ONLY the commutative daily rollup streams (complete mode,
    state = one row per (event_type, day) — calendar-bounded), and
    timeseries.conformal_snaive_interval's identical
    split/rank/coverage tail folds the released counter table — the
    continuously-refreshed interval half-width and realized coverage a
    live forecasting dashboard shows next to its point forecasts.
    availableNow on bounded input is deterministic, so the batch SQL
    replay is the exact oracle (shared with conformal_forecast_events).
    """
    from hazelcast_jet_spark.operators.timeseries import (
        conformal_snaive_interval)
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = read_stream_table(spark, sf_dir, "events")
    daily = run_to_batch(
        s.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n")), "complete")
    return conformal_snaive_interval(daily.localCheckpoint(),
                                     "event_type", "day", "n",
                                     seasonal_lag=CONF_LAG)


SBK_SEED, SBK_BUCKETS = "sbk1", 32


def streaming_bucket_sample_events(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Deterministic k-row sample maintained ON A STREAM
    (sampling.bucket_minhash_sample): rows route to 32 hash buckets and
    each keeps its minimum-hash key — reservoir sampling re-expressed
    as count + min_by so it runs as ONE complete-mode streaming
    aggregation with exactly k rows of state (the row_number reservoir
    is not streaming-legal).  min folds exactly across micro-batches,
    so availableNow on bounded input is deterministic and the batch SQL
    replay is the exact oracle."""
    from hazelcast_jet_spark.operators.sampling import bucket_minhash_sample
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = read_stream_table(spark, sf_dir, "events")
    agg = bucket_minhash_sample(s, "event_id", SBK_BUCKETS, SBK_SEED)
    return run_to_batch(agg, "complete").orderBy("bucket")


def unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt surface pin (DataFrame.unpivot ↔ DuckDB UNPIVOT):
    a wide per-nation metrics table (customer count, exact-decimal mean
    and max account balance) melted to (nation, metric, value) rows —
    the inverse of q:pivot_mktsegment, completing the reshape pair the
    SQL surface owes.  Map-side reshape of an already-aggregated table;
    all values cast double so the melted column is single-typed."""
    c = _t(spark, sf_dir, "customer")
    wide = (c.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).cast("double").alias("n_customers"),
                 (F.round(dsum("c_acctbal")
                          / F.count(F.lit(1)).cast("double"), 6)
                  + F.lit(0.0)).alias("avg_acctbal"),
                 F.max(F.col("c_acctbal").cast("double"))
                 .alias("max_acctbal")))
    return (wide.unpivot(
        ["c_nationkey"],
        ["n_customers", "avg_acctbal", "max_acctbal"],
        "metric", "value")
        .orderBy("c_nationkey", "metric"))


QINI_SEED = "qini1"
QINI_BINS = 10


def qini_uplift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift curve (experiment.qini_curve; Radcliffe 2007) for
    the md5 experiment over customers: score = exact-decimal mean order
    value (an engine-stable stand-in for a targeting model's score),
    conversion = any URGENT order; per score decile the cumulative
    treated/control counts, uplift and qini — the "whom should we have
    treated?" readout completing the experimentation lane's evaluation
    side.  One window pass on the unit table, cumulative windows on the
    10-row bin table; ntile determinism via the custkey tiebreak."""
    from hazelcast_jet_spark.operators.experiment import ab_assign, qini_curve

    o = _t(spark, sf_dir, "orders")
    units = (o.groupBy("o_custkey")
             .agg((dsum("o_totalprice")
                   / F.count(F.lit(1)).cast("double")).alias("score"),
                  F.max((F.col("o_orderpriority") == "1-URGENT")
                        .cast("bigint")).alias("conv"))
             .withColumn("arm", ab_assign(F.col("o_custkey"), QINI_SEED)))
    return qini_curve(units, "arm", "score", "conv", "o_custkey",
                      n_bins=QINI_BINS)


MSPRT_TAU = 0.1
#: repr round-trips the exact double product so the oracle replays it
MSPRT_TAU2_SQL = repr(MSPRT_TAU * MSPRT_TAU)


def msprt_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential readout (experiment.msprt_trace; Robbins
    1970 mixture SPRT, Johari et al. 2017): the anytime-valid p-value
    for the md5 purchase experiment, recomputed after every day — the
    FIX for the peeking inflation q:peeking_trace_events visualizes
    (that trace shows the hazard; this is the statistic a dashboard may
    legally refresh).  Running-min 1/Λ on the same checkpointed
    calendar-bounded counter panel; fixed-order doubles on exact
    counts."""
    from hazelcast_jet_spark.operators.experiment import msprt_trace

    e = _t(spark, sf_dir, "events")
    return msprt_trace(e, "user_id", "ts", "event_type", "purchase",
                       seed=PK_SEED, tau=MSPRT_TAU)


def streaming_msprt_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE always-valid readout (experiment.msprt_trace_from_firsts):
    the stream maintains ONLY the complete-mode per-user firsts rollup
    (experiment.user_firsts — two min aggregates, one state row per
    user); the identical checkpointed panel + mixture-SPRT tail folds
    it batch-side, so the continuously-refreshed anytime-valid p equals
    q:msprt_events' batch answer row for row — the one dashboard
    statistic that is LEGAL to refresh every micro-batch (refreshing
    q:streaming_experiment_readout_events' fixed-horizon significance
    flag is peeking; this is the fix, live).  availableNow on bounded
    input is deterministic, so the batch SQL replay is the exact
    oracle (shared with msprt_events)."""
    from hazelcast_jet_spark.operators.experiment import (
        msprt_trace_from_firsts, user_firsts)
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = read_stream_table(spark, sf_dir, "events")
    firsts = run_to_batch(
        user_firsts(s, "user_id", "ts", "event_type", "purchase"),
        "complete")
    return msprt_trace_from_firsts(firsts.localCheckpoint(), "user_id",
                                   seed=PK_SEED, tau=MSPRT_TAU)


def streaming_experiment_readout_events(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """LIVE experiment readout (r9 verdict #5 — the operator a real
    experimentation platform runs continuously): readStream over events
    maintains ONE complete-mode per-unit counter table
    (experiment.experiment_stream_counters; state = one row per user,
    the streaming-exact-dedup state class), then
    experiment.experiment_readout_fold assigns md5 arms batch-side and
    emits the per-arm readout — conversions, rates, exact mean
    events/user — with the pooled two-proportion z, SRM z and the
    significance flag q:peeking_trace_events warns about.  availableNow
    on bounded input makes the counters deterministic, so the batch SQL
    replay is the exact oracle."""
    from hazelcast_jet_spark.operators.experiment import (
        experiment_readout_fold, experiment_stream_counters)
    from hazelcast_jet_spark.streaming.run import (read_stream_table,
                                                   run_to_batch)

    s = read_stream_table(spark, sf_dir, "events")
    counters = run_to_batch(
        experiment_stream_counters(s, "user_id", "ts", "event_type",
                                   "purchase", "value", AB_CONV_VALUE),
        "complete")
    # break the memory-sink lineage before the fold's bounded collect
    # (one row per distinct user)
    return experiment_readout_fold(counters.localCheckpoint(),
                                   seed=CUPED_SEED)


def growth_accounting_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (timeseries.growth_accounting): the
    new/retained/resurrected/churned decomposition behind every DAU
    dashboard — active = new + retained + resurrected and churned(w) =
    active(w−1) − retained(w) by identity; q:new_vs_returning_events
    only splits new/old, this closes the loop with churn and
    resurrection.  One distinct (user, week) compaction, one per-user
    lag window, churn identity on the complete week grid."""
    from hazelcast_jet_spark.operators.timeseries import growth_accounting

    e = _t(spark, sf_dir, "events")
    return growth_accounting(e, "user_id", "ts")


SS_REL_LIFT = 0.05


def sample_size_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-experiment sizing (experiment.required_sample_size): the
    per-arm n needed to detect a 5% relative lift of the observed
    any-URGENT-order conversion baseline at α=.05 / power .80 — the
    inverse of q:experiment_power_orders (that one: what could we see;
    this one: what do we need).  One per-customer rollup + one
    collected 1-row aggregate; closed-form on exact counts."""
    from hazelcast_jet_spark.operators.experiment import required_sample_size

    o = _t(spark, sf_dir, "orders")
    units = (o.groupBy("o_custkey")
             .agg(F.max((F.col("o_orderpriority") == "1-URGENT")
                        .cast("int")).alias("conv")))
    return required_sample_size(units, "conv", SS_REL_LIFT)


def hurst_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-range dependence screen (timeseries.hurst_exponent; Beran
    1994 aggregated-variance method): H of the daily event-count
    series per type — H≈.5 memoryless, H>.5 bursty load that stacks
    up (don't trust a Poisson capacity model), H<.5 mean-reverting.
    One daily rollup, one level explode over the bounded grid, OLS on
    ≤5 points per key."""
    from hazelcast_jet_spark.operators.timeseries import hurst_exponent

    e = _t(spark, sf_dir, "events")
    daily = (e.groupBy(
        F.col("event_type").alias("key"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .alias("day"))
        .agg(F.count(F.lit(1)).cast("double").alias("n")))
    return hurst_exponent(daily, "key", "day", "n")


def tail_risk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-risk report (timeseries.tail_risk): p95 cutoff (VaR shape)
    + expected shortfall of event value per type — the SLO pair a bare
    p95 hides (how bad IS the tail once you're in it).  Cutoff and
    tail membership are rank-based (ties cannot split engines); tail
    mean is a DECIMAL-exact conditional aggregate."""
    from hazelcast_jet_spark.operators.timeseries import tail_risk

    e = _t(spark, sf_dir, "events")
    return tail_risk(e.select(F.col("event_type").alias("key"), "value"),
                     "key", "value", q=0.95)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


#: Queries registered AFTER this round's 50-entry window froze: deferred
#: by tools/window_plan.py to lead the NEXT round's window (the r7/r8
#: session-tail handoff convention, now machine-readable).  Names listed
#: here must sit below the window boundary in ``queries()``.  The 20
#: r11-session leads now occupy window slots 1-20; entries appended
#: below during the r12 session are deferred to lead the r13 window.
NEXT_ROUND_LEADS: tuple[str, ...] = (
    "wcc_dedup_groups",
    "ra_links_parts",
    "assortativity_copurchase",
    "theta_forecast_events",
    "sax_symbols_events",
    "fd_violations_orders",
    "dml_ate_orders",
    "geo_radius_pairs",
    "streaming_cusum_events",
    "knn_supplier_customers",
    "grid_clusters_customers",
    "hotspot_cells_customers",
    "hits_customer_parts",
    "ucc_lineitem",
    "streaming_funnel_counts",
)

#: The round whose driver window the current registry ordering was frozen
#: for.  tools/window_plan.py and tests/test_window_plan.py ignore
#: CORRECTNESS_r{N}.json ledgers with N >= WINDOW_ROUND when re-deriving
#: the plan, so the driver dropping THIS round's ledger mid-round does not
#: retroactively invalidate the frozen window (the r9 verdict's "What's
#: wrong #1" lifecycle defect).
WINDOW_ROUND = 12


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordered so that every query needing driver verification sits inside
    the correctness gate's 50-entry window.  The ordering is GENERATED by
    ``tools/window_plan.py`` (r8 verdict #5) from the CORRECTNESS_r*.json
    ledger -- never-driver-checked queries first in registry order, then
    stalest-green -- and ``tests/test_window_plan.py`` pins registry[:50]
    to the tool's output against the ledgers that existed at freeze time
    (``WINDOW_ROUND``), so neither hand-counting nor the driver's own
    mid-round ledger drop can re-redden the suite (r9 verdict "What's
    wrong #1").  r11 window: the 20 r10-session leads (never
    driver-checked) first, then the 30 stalest green queries (clearing
    the r2 remainder and most of the r3 cohort).  Queries registered
    after this round's window freezes go below the boundary AND into
    ``NEXT_ROUND_LEADS`` so the planner defers them to r12.
    bench.py runs every entry in name order, so perf coverage is
    unaffected by the rotation.
    """
    return {
        # ==== r12 window (first 50 = the driver correctness gate; =====
        # ==== generated by tools/window_plan.py at WINDOW_ROUND=12, ====
        # ==== pinned by tests/test_window_plan.py) =====================
        # -- 20 r11-session leads: never driver-checked ----------------
        "index_health_emb": index_health_emb,
        "t_closeness_customer": t_closeness_customer,
        "kalman_level_events": kalman_level_events,
        "khop_reach_parts": khop_reach_parts,
        "ppr_copurchase": ppr_copurchase,
        "streaming_quantile_sketch": streaming_quantile_sketch,
        "post_stratified_ate_orders": post_stratified_ate_orders,
        "cvm_drift_events": cvm_drift_events,
        "fs_weights_docs": fs_weights_docs,
        "ndcg_ivf_emb": ndcg_ivf_emb,
        "vocab_richness_docs": vocab_richness_docs,
        "streaming_kalman_events": streaming_kalman_events,
        "spearman_lineitem": spearman_lineitem,
        "burrows_delta_docs": burrows_delta_docs,
        "coreness_hist_parts": coreness_hist_parts,
        "ratio_delta_orders": ratio_delta_orders,
        "theil_orders": theil_orders,
        "recursive_cte_surface": recursive_cte_surface,
        "lateral_topk_surface": lateral_topk_surface,
        "croston_demand_lineitem": croston_demand_lineitem,
        # -- 30 stalest-green refreshes (r4/r5 cohort) fill the window -
        "nexmark_q6_avg_last10": nexmark_q6_avg_last10,
        "heavy_hitter_terms": heavy_hitter_terms,
        "url_dedup_stats": url_dedup_stats,
        "unigram_lm_quality": unigram_lm_quality,
        "salted_aggregate_orders": salted_aggregate_orders,
        "dup_span_stats_docs": dup_span_stats_docs,
        "fuzzy_match_parts": fuzzy_match_parts,
        "source_quota_sample": source_quota_sample,
        "train_test_split_counts": train_test_split_counts,
        "bloom_semi_join_orders": bloom_semi_join_orders,
        "semantic_dedup_docs": semantic_dedup_docs,
        "event_time_features": event_time_features,
        "pandas_udf_text_metrics": pandas_udf_text_metrics,
        "token_stats": token_stats,
        "scalar_functions": scalar_functions,
        "asof_join_events": asof_join_events,
        "tpch_q5_local_supplier": tpch_q5_local_supplier,
        "pivot_mktsegment": pivot_mktsegment,
        "corr_covar_aggs": corr_covar_aggs,
        "datetime_functions": datetime_functions,
        "array_higher_order": array_higher_order,
        "window_frames": window_frames,
        "count_min_estimates": count_min_estimates,
        "ngram_novelty_stats": ngram_novelty_stats,
        "interval_overlap_pairs": interval_overlap_pairs,
        "interval_grid_pairs": interval_grid_pairs,
        "w1_drift_events": w1_drift_events,
        "streaming_count_min_sketch": streaming_count_min_sketch,
        "resample_gap_fill": resample_gap_fill,
        "categorical_drift_events": categorical_drift_events,
        # ================== end of r12 driver window ==================
        # -- remainder: stalest-green ascending (window_plan full order)
        "copurchase_graph_stats": copurchase_graph_stats,
        "pagerank_copurchase": pagerank_copurchase,
        "kfold_split_counts": kfold_split_counts,
        "record_linkage_parts": record_linkage_parts,
        "benford_orders": benford_orders,
        "acf_events": acf_events,
        "coreset_kcenter_embeddings": coreset_kcenter_embeddings,
        "seasonal_decompose_events": seasonal_decompose_events,
        "negative_samples_lineitem": negative_samples_lineitem,
        "nexmark_q4_avg_by_category": nexmark_q4_avg_by_category,
        "nexmark_q7_window_max": nexmark_q7_window_max,
        "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
        "hll_cardinality_events": hll_cardinality_events,
        "ann_recall_ivf_pq": ann_recall_ivf_pq,
        "pq_code_dup_pairs": pq_code_dup_pairs,
        "streaming_interval_join_flush": streaming_interval_join_flush,
        "bm25_search_docs": bm25_search_docs,
        "hard_negative_mining": hard_negative_mining,
        "label_centroid_confusion_emb": label_centroid_confusion_emb,
        "scd2_event_type_intervals": scd2_event_type_intervals,
        "scd2_incremental_merge": scd2_incremental_merge,
        "categorical_assoc_docs": categorical_assoc_docs,
        "padding_efficiency_docs": padding_efficiency_docs,
        "cms_join_size_orders": cms_join_size_orders,
        "key_skew_orders": key_skew_orders,
        "mmr_diverse_topk": mmr_diverse_topk,
        "streaming_psi_drift_events": streaming_psi_drift_events,
        "matryoshka_recall_emb": matryoshka_recall_emb,
        "knn_label_noise_emb": knn_label_noise_emb,
        "anova_f_per_dim_emb": anova_f_per_dim_emb,
        "temporal_scd2_lookup": temporal_scd2_lookup,
        "winsorized_value_stats": winsorized_value_stats,
        "bootstrap_ci_orders": bootstrap_ci_orders,
        "collocation_pmi_docs": collocation_pmi_docs,
        "weekly_value_percentiles": weekly_value_percentiles,
        "changepoint_shift_events": changepoint_shift_events,
        "anomaly_band_flags": anomaly_band_flags,
        "bpe_segment_stats": bpe_segment_stats,
        "corr_matrix_lineitem": corr_matrix_lineitem,
        "table_diff_counts": table_diff_counts,
        "tpch_q10_returned_items": tpch_q10_returned_items,
        "range_join_value_bands": range_join_value_bands,
        "continuous_aggregate_rollup": continuous_aggregate_rollup,
        "cep_sequence_match": cep_sequence_match,
        "streaming_dedup_count": streaming_dedup_count,
        "tfidf_top_terms": tfidf_top_terms,
        "reservoir_sample_events": reservoir_sample_events,
        "stratified_sample_docs": stratified_sample_docs,
        "tpch_q4_order_priority": tpch_q4_order_priority,
        "tpch_q13_customer_distribution": tpch_q13_customer_distribution,
        "tpch_q16_supplier_cnt": tpch_q16_supplier_cnt,
        "tpch_q22_missing_customers": tpch_q22_missing_customers,
        "decontaminate_docs": decontaminate_docs,
        "sequence_packing": sequence_packing,
        "kmv_distinct_sketch": kmv_distinct_sketch,
        "winnow_fingerprint_dups": winnow_fingerprint_dups,
        "repetition_top_ngram": repetition_top_ngram,
        "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
        "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
        "tpch_q8_market_share": tpch_q8_market_share,
        "tpch_q9_product_profit": tpch_q9_product_profit,
        "embedding_standardize_stats": embedding_standardize_stats,
        "quantile_sketch_events": quantile_sketch_events,
        "association_rules_lineitem": association_rules_lineitem,
        "event_transition_matrix": event_transition_matrix,
        "readability_docs": readability_docs,
        "gini_value_orders": gini_value_orders,
        "source_overlap_docs": source_overlap_docs,
        "mixture_allocation_docs": mixture_allocation_docs,
        "streaming_event_transitions": streaming_event_transitions,
        "rbo_rank_similarity_emb": rbo_rank_similarity_emb,
        "hill_tail_orders": hill_tail_orders,
        "top_mass_selection_docs": top_mass_selection_docs,
        "source_divergence_docs": source_divergence_docs,
        "classifier_calibration_docs": classifier_calibration_docs,
        "ewma_event_rate": ewma_event_rate,
        "greedy_pack_bins": greedy_pack_bins,
        "kmeans_fit_iter_stats": kmeans_fit_iter_stats,
        "llm_data_pipeline_counts": llm_data_pipeline_counts,
        "multi_span_dup_stats": multi_span_dup_stats,
        "lexical_diversity_docs": lexical_diversity_docs,
        "heaps_vocab_growth": heaps_vocab_growth,
        "zipf_slope_terms": zipf_slope_terms,
        "markov_next_event_accuracy": markov_next_event_accuracy,
        "item_similarity_parts": item_similarity_parts,
        "minhash_estimate_error": minhash_estimate_error,
        "hll_daily_rollup": hll_daily_rollup,
        "outlier_ensemble_events": outlier_ensemble_events,
        "quantile_bins_orders": quantile_bins_orders,
        "streaming_hll_cardinality": streaming_hll_cardinality,
        "dedup_group_quality_docs": dedup_group_quality_docs,
        "vocab_coverage_docs": vocab_coverage_docs,
        "burstiness_events": burstiness_events,
        "lorenz_curve_orders": lorenz_curve_orders,
        "langid_confusion_docs": langid_confusion_docs,
        "source_length_ks": source_length_ks,
        "tpch_q11_important_stock": tpch_q11_important_stock,
        "tpch_q12_priority_shipping": tpch_q12_priority_shipping,
        "tpch_q15_top_supplier": tpch_q15_top_supplier,
        "tpch_q17_small_quantity_revenue": tpch_q17_small_quantity_revenue,
        "tpch_q19_discounted_revenue": tpch_q19_discounted_revenue,
        "tpch_q20_promotion_suppliers": tpch_q20_promotion_suppliers,
        "tpch_q21_waiting_suppliers": tpch_q21_waiting_suppliers,
        "table_profile": table_profile,
        "value_histogram": value_histogram,
        "sliding_agg_incremental": sliding_agg_incremental,
        "sliding_distinct_users": sliding_distinct_users,
        "user_sessions": user_sessions,
        "asof_join_tolerance": asof_join_tolerance,
        "incremental_minhash_dedup": incremental_minhash_dedup,
        "dq_checks_orders": dq_checks_orders,
        "dedup_rate_by_source": dedup_rate_by_source,
        "budget_sample_docs": budget_sample_docs,
        "embedding_drift_labels": embedding_drift_labels,
        "event_gap_percentiles": event_gap_percentiles,
        "prefix_dup_docs": prefix_dup_docs,
        "user_activity_stats": user_activity_stats,
        "corpus_data_card_docs": corpus_data_card_docs,
        "shipping_lag_percentiles": shipping_lag_percentiles,
        "rfm_segments_orders": rfm_segments_orders,
        "transition_entropy_events": transition_entropy_events,
        "holt_linear_events": holt_linear_events,
        "embedding_norm_stats": embedding_norm_stats,
        "dup_lang_confusion_docs": dup_lang_confusion_docs,
        "chunk_dup_docs": chunk_dup_docs,
        "token_len_histogram_docs": token_len_histogram_docs,
        "hll_overlap_events": hll_overlap_events,
        "dow_hourly_anomaly_events": dow_hourly_anomaly_events,
        "sample_audit_docs": sample_audit_docs,
        "rrf_fusion_emb": rrf_fusion_emb,
        "classifier_lift_docs": classifier_lift_docs,
        "conversion_lag_events": conversion_lag_events,
        "lsh_band_precision_docs": lsh_band_precision_docs,
        "cube_token_stats_docs": cube_token_stats_docs,
        "weighted_median_lineitem": weighted_median_lineitem,
        "referential_integrity_counts": referential_integrity_counts,
        "session_cooccurrence_events": session_cooccurrence_events,
        "top_event_paths_events": top_event_paths_events,
        "kmeans_assign_counts": kmeans_assign_counts,
        "dsir_importance_weights": dsir_importance_weights,
        "funnel_conversion_counts": funnel_conversion_counts,
        "quality_decile_stats": quality_decile_stats,
        "dedup_keep_best": dedup_keep_best,
        "embedding_outlier_stats": embedding_outlier_stats,
        "streaming_quality_gate": streaming_quality_gate,
        "cut_dup_spans_docs": cut_dup_spans_docs,
        "weighted_sample_counts": weighted_sample_counts,
        "mad_outlier_stats": mad_outlier_stats,
        "containment_dup_pairs": containment_dup_pairs,
        "pca_projection_stats": pca_projection_stats,
        "char_entropy_quality": char_entropy_quality,
        "quality_classifier_scores": quality_classifier_scores,
        "bigram_lm_quality": bigram_lm_quality,
        "ks_drift_events": ks_drift_events,
        "tokenize_ids_stats": tokenize_ids_stats,
        "psi_drift_events": psi_drift_events,
        "multimodal_audio_stats": multimodal_audio_stats,
        "multimodal_image_stats": multimodal_image_stats,
        "pq_encode_stats": pq_encode_stats,
        "temperature_sample_counts": temperature_sample_counts,
        "cohort_retention_counts": cohort_retention_counts,
        "cusum_alarm_events": cusum_alarm_events,
        "streaming_cohort_enrich": streaming_cohort_enrich,
        "dup_graph_degree_docs": dup_graph_degree_docs,
        "monthly_growth_orders": monthly_growth_orders,
        "kaplan_meier_events": kaplan_meier_events,
        "pareto_front_parts": pareto_front_parts,
        "cuped_experiment_orders": cuped_experiment_orders,
        "attribution_events": attribution_events,
        "isotropy_embeddings": isotropy_embeddings,
        "window_funnel_events": window_funnel_events,
        "table_fingerprint_docs": table_fingerprint_docs,
        "rake_keyphrases_docs": rake_keyphrases_docs,
        "lpa_communities_parts": lpa_communities_parts,
        "link_prediction_parts": link_prediction_parts,
        "ohlc_events": ohlc_events,
        "session_bounce_events": session_bounce_events,
        "seasonality_strength_events": seasonality_strength_events,
        "streaming_ohlc_events": streaming_ohlc_events,
        "ab_conversion_events": ab_conversion_events,
        "self_repetition_docs": self_repetition_docs,
        "fisher_separation_emb": fisher_separation_emb,
        "growth_decomposition_orders": growth_decomposition_orders,
        "stickiness_events": stickiness_events,
        "trending_parts": trending_parts,
        "new_vs_returning_events": new_vs_returning_events,
        "k_anonymity_customer": k_anonymity_customer,
        "streaming_fingerprint_events": streaming_fingerprint_events,
        "experiment_readout_events": experiment_readout_events,
        "l_diversity_customer": l_diversity_customer,
        "rank_semantics_orders": rank_semantics_orders,
        "markov_stationary_events": markov_stationary_events,
        "position_attribution_events": position_attribution_events,
        "centroid_distance_emb": centroid_distance_emb,
        "streaming_corpus_card_docs": streaming_corpus_card_docs,
        "ivf_staleness_emb": ivf_staleness_emb,
        "kappa_langid_docs": kappa_langid_docs,
        "experiment_power_orders": experiment_power_orders,
        "tokenizer_fertility_docs": tokenizer_fertility_docs,
        "dup_rate_by_length_docs": dup_rate_by_length_docs,
        "simhash_groups": simhash_groups,
        "cosine_topk_search": cosine_topk_search,
        "streaming_tumbling_window": streaming_tumbling_window,
        "streaming_stateful_count": streaming_stateful_count,
        "streaming_rolling_count": streaming_rolling_count,
        "linear_trend_agg": linear_trend_agg,
        "distinct_aggregates": distinct_aggregates,
        "having_filter": having_filter,
        "semi_anti_join": semi_anti_join,
        "full_outer_join": full_outer_join,
        "set_operations": set_operations,
        "did_orders": did_orders,
        "covariate_balance_customer": covariate_balance_customer,
        "fdr_bh_events": fdr_bh_events,
        "nelson_aalen_events": nelson_aalen_events,
        "theilsen_trend_events": theilsen_trend_events,
        "lead_lag_events": lead_lag_events,
        "dp_noisy_counts_customer": dp_noisy_counts_customer,
        "automation_screen_events": automation_screen_events,
        "zorder_layout_orders": zorder_layout_orders,
        "forecast_backtest_events": forecast_backtest_events,
        "ltv_cohort_orders": ltv_cohort_orders,
        "offline_policy_events": offline_policy_events,
        "streaming_dp_counts_events": streaming_dp_counts_events,
        "streaming_lead_lag_events": streaming_lead_lag_events,
        "welch_t_orders": welch_t_orders,
        "mann_whitney_orders": mann_whitney_orders,
        "qte_orders": qte_orders,
        "median_ci_orders": median_ci_orders,
        "capture_recapture_events": capture_recapture_events,
        "peeking_trace_events": peeking_trace_events,
        "growth_accounting_events": growth_accounting_events,
        "sample_size_orders": sample_size_orders,
        "hurst_events": hurst_events,
        "tail_risk_events": tail_risk_events,
        "rollup_agg": rollup_agg,
        "multi_hop_enrichment": multi_hop_enrichment,
        "q1_pricing_summary": q1_pricing_summary,
        "rolling_aggregate": rolling_aggregate,
        "text_features": text_features,
        "exact_dedup_docs": exact_dedup_docs,
        "minhash_lsh_dedup": minhash_lsh_dedup,
        "ngram_jaccard_dedup": ngram_jaccard_dedup,
        "filter_project": filter_project,
        "global_aggregate": global_aggregate,
        "join_orders_customer": join_orders_customer,
        "left_join_counts": left_join_counts,
        "hash_join_enrich": hash_join_enrich,
        "theta_join": theta_join,
        "distinct_op": distinct_op,
        "merge_union": merge_union,
        "sort_limit": sort_limit,
        "top_n_per_group": top_n_per_group,
        "min_max_by": min_max_by,
        "cogroup_orders_lineitem": cogroup_orders_lineitem,
        "distinct_by_key": distinct_by_key,
        "tumbling_window_batch": tumbling_window_batch,
        "sliding_window_batch": sliding_window_batch,
        "session_window_batch": session_window_batch,
        "json_props": json_props,
        "like_and_trim": like_and_trim,
        "pq_staleness_emb": pq_staleness_emb,
        "streaming_experiment_readout_events":
            streaming_experiment_readout_events,
        "msprt_events": msprt_events,
        "rmst_events": rmst_events,
        "qini_uplift_orders": qini_uplift_orders,
        "granger_events": granger_events,
        "kcore_parts": kcore_parts,
        "streaming_bucket_sample_events": streaming_bucket_sample_events,
        "unpivot_nation_metrics": unpivot_nation_metrics,
        "hw_seasonal_events": hw_seasonal_events,
        "logrank_events": logrank_events,
        "conformal_forecast_events": conformal_forecast_events,
        "shapley_attribution_events": shapley_attribution_events,
        "target_encode_orders": target_encode_orders,
        "textrank_keywords_docs": textrank_keywords_docs,
        "aipw_ate_orders": aipw_ate_orders,
        "mutual_info_customer": mutual_info_customer,
        "source_ablation_docs": source_ablation_docs,
        "streaming_msprt_events": streaming_msprt_events,
        "streaming_conformal_events": streaming_conformal_events,
        "cast_matrix": cast_matrix,
        "window_rank_functions": window_rank_functions,
        "tpch_q14_promo_revenue": tpch_q14_promo_revenue,
        "embedding_quantize_int8": embedding_quantize_int8,
        "tpch_q18_large_orders": tpch_q18_large_orders,
        "cep_stream_match": cep_stream_match,
        "nexmark_q8_stream_join": nexmark_q8_stream_join,
        "values_inline": values_inline,
        "wordcount": wordcount,
        "nexmark_q5_hot_items": nexmark_q5_hot_items,
        "ann_lsh_search": ann_lsh_search,
        "multimodal_features": multimodal_features,
        "filtered_aggs": filtered_aggs,
        "embedding_cosine_dedup": embedding_cosine_dedup,
        "generate_series_agg": generate_series_agg,
        "collection_aggs": collection_aggs,
        "map_aggregate": map_aggregate,
        "custom_udaf_agg": custom_udaf_agg,
        "simhash_near_dups": simhash_near_dups,
        "ivf_topk_search": ivf_topk_search,
        "reducing_agg": reducing_agg,
        "multimodal_frame_sample": multimodal_frame_sample,
        "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
        "streaming_session_window": streaming_session_window,
        "asof_join_forward": asof_join_forward,
        "dedup_group_sizes": dedup_group_sizes,
        "pii_scrub_stats": pii_scrub_stats,
        "gopher_quality_filter": gopher_quality_filter,
        "doc_chunks": doc_chunks,
        "percentile_stats": percentile_stats,
        # -- r12-session additions (deferred to lead the r13 window) ----
        "wcc_dedup_groups": wcc_dedup_groups,
        "ra_links_parts": ra_links_parts,
        "assortativity_copurchase": assortativity_copurchase,
        "theta_forecast_events": theta_forecast_events,
        "sax_symbols_events": sax_symbols_events,
        "fd_violations_orders": fd_violations_orders,
        "dml_ate_orders": dml_ate_orders,
        "geo_radius_pairs": geo_radius_pairs,
        "streaming_cusum_events": streaming_cusum_events,
        "knn_supplier_customers": knn_supplier_customers,
        "grid_clusters_customers": grid_clusters_customers,
        "hotspot_cells_customers": hotspot_cells_customers,
        "hits_customer_parts": hits_customer_parts,
        "ucc_lineitem": ucc_lineitem,
        "streaming_funnel_counts": streaming_funnel_counts,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_NORM = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\\s+', ' ', 'g'))"
_STOPWORDS_SQL = "['the','a','of','and','to','in','is','it','that','for']"


def _shingle_sql(k: int = SHINGLE_K) -> str:
    """DuckDB expr for distinct word k-shingles of normalized text."""
    return f"""
      list_distinct(
        CASE WHEN len(string_split({_NORM}, ' ')) >= {k}
          THEN list_transform(
            generate_series(1, len(string_split({_NORM}, ' ')) - {k} + 1),
            i -> array_to_string(string_split({_NORM}, ' ')[i:i+{k}-1], ' '))
          ELSE [array_to_string(string_split({_NORM}, ' '), ' ')]
        END)
    """


def _minhash_sql(num_hashes: int = MINHASH_HASHES) -> str:
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> md5('s{j}:' || s)))" for j in range(num_hashes)
    )
    return f"[{mins}]"


#: token→md5 list for the simhash oracle; compute once in a CTE so DuckDB
#: hashes each token once instead of once per signature bit
_SIMHASH_HL = f"list_transform(string_split({_NORM}, ' '), t -> md5(t))"


def _simhash_sql(bits: int = None, hl: str = "hl") -> str:
    """Signature bits from a precomputed md5 list ``hl``.  Bit b reads bit
    (b & 1) of hex nibble (b >> 1) — the dedup._simhash_bit derivation —
    so 63 bits fit the 32-nibble digest with the BIGINT sign clear.
    '13579bdf' = hex digits with bit0 set; '2367abef' = bit1 set."""
    bits = SIMHASH_BITS if bits is None else bits
    terms = []
    for b in range(bits):
        cls = "13579bdf" if (b & 1) == 0 else "2367abef"
        vote = (
            f"list_sum(list_transform({hl}, h -> CASE WHEN "
            f"strpos('{cls}', substr(h, {(b >> 1) + 1}, 1)) > 0 THEN 1 ELSE -1 END))"
        )
        terms.append(f"CASE WHEN {vote} > 0 THEN {2 ** b}::BIGINT ELSE 0::BIGINT END")
    return " + ".join(terms)


def _band_sig_sql(planes, col: str = "embedding") -> str:
    """One band's hyperplane signature as a packed BIGINT (bit i =
    sign(vec · plane_i)) — DuckDB twin of similarity.banded_signatures_udf."""
    return " + ".join(
        "(CASE WHEN list_sum(list_transform(list_zip(" + col + ", "
        + str(p)
        + f"), x -> CAST(x[1] AS DOUBLE) * x[2])) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def _cos_raw_sql(a: str, b: str) -> str:
    return (
        f"(list_sum(list_transform(list_zip({a}, {b}),"
        f" x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({a}, v -> CAST(v AS DOUBLE) * v)))"
        f" * sqrt(list_sum(list_transform({b}, v -> CAST(v AS DOUBLE) * v)))))"
    )


def _cos_sql(a: str, b: str) -> str:
    return f"round({_cos_raw_sql(a, b)}, 6)"


def _l2_sql(a: str, c) -> str:
    """round(squared-L2(a, literal centroid), 9) — DuckDB twin of
    clustering.l2_assign's per-centroid distance (same element-order
    fold, same half-away rounding)."""
    return (
        f"round(list_sum(list_transform(list_zip({a}, {list(c)}),"
        f" x -> (CAST(x[1] AS DOUBLE) - x[2]) * (CAST(x[1] AS DOUBLE) - x[2]))), 9)"
    )


def _split_hex(cum: float) -> str:
    """Cumulative md5-prefix band edge — same arithmetic as
    sampling.split_by_key so the oracle CASE matches bit-for-bit."""
    from hazelcast_jet_spark.operators.sampling import _threshold_hex

    return _threshold_hex(cum)


def _dsum(x: str) -> str:
    """SQL twin of dsum(): exact decimal accumulation emitted as double."""
    return f"CAST(SUM(CAST({x} AS DECIMAL(18,6))) AS DOUBLE)"


def _morton_sql(x: str, y: str, bits: int = 8) -> str:
    """SQL twin of bucketing.zorder_key: bit i of x at position 2i+1,
    bit i of y at 2i — explicit shift/mask terms, engine-exact."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i + 1)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i)})")
    return "(" + " + ".join(terms) + ")"


from hazelcast_jet_spark.operators.experiment import (  # noqa: E402
    two_sided_p_sql as _two_sided_p_sql)
from hazelcast_jet_spark.operators.similarity import (  # noqa: E402
    ndcg_discounts as _ndcg_discounts, ndcg_ideal_prefix as _ndcg_ideal)
from hazelcast_jet_spark.operators.profile import BENFORD_EXPECTED as _BENFORD


def _lev_sim_sql(a: str, b: str) -> str:
    """DuckDB twin of joins.field_similarity — same guard order and the
    same fixed-order double division."""
    return (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL THEN 0.0 "
        f"WHEN greatest(length({a}), length({b})) = 0 THEN 1.0 "
        f"ELSE 1.0 - levenshtein({a}, {b}) "
        f"/ CAST(greatest(length({a}), length({b})) AS DOUBLE) END)"
    )


def _l2_cols_sql(a: str, b: str) -> str:
    """round(squared-L2(a, b), 9) between two vector COLUMNS — the
    column-column twin of _l2_sql (same fold, same rounding)."""
    return (
        f"round(list_sum(list_transform(list_zip({a}, {b}),"
        f" x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))"
        f" * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 9)"
    )


def _kcenter_sql(k: int) -> str:
    """DuckDB twin of clustering.coreset_kcenter on the embeddings
    table: k−1 unrolled farthest-point iterations (rounded-L2 running
    least, NOT-IN exclusion, id tie-break)."""
    parts = ["""sel1 AS (
                SELECT vec_id, embedding FROM embeddings
                WHERE vec_id = (SELECT min(vec_id) FROM embeddings
                                WHERE embedding IS NOT NULL)
            ), d1 AS (
                SELECT e.vec_id, e.embedding,
                       """ + _l2_cols_sql("e.embedding", "s.embedding") + """
                           AS m
                FROM embeddings e CROSS JOIN sel1 s
                WHERE e.embedding IS NOT NULL
            )"""]
    for i in range(2, k + 1):
        excl = " UNION ALL ".join(
            f"SELECT vec_id FROM sel{j}" for j in range(1, i))
        parts.append(f"""sel{i} AS (
                SELECT vec_id, embedding, m FROM d{i - 1}
                WHERE vec_id NOT IN ({excl})
                ORDER BY m DESC, vec_id LIMIT 1
            )""")
        if i < k:
            parts.append(f"""d{i} AS (
                SELECT d.vec_id, d.embedding,
                       least(d.m, {_l2_cols_sql('d.embedding', 's.embedding')})
                           AS m
                FROM d{i - 1} d CROSS JOIN sel{i} s
            )""")
    sels = ["SELECT CAST(1 AS INTEGER) AS sel_order, vec_id, "
            "CAST(NULL AS DOUBLE) AS dist FROM sel1"]
    sels += [f"SELECT CAST({i} AS INTEGER), vec_id, m FROM sel{i}"
             for i in range(2, k + 1)]
    return ("WITH " + ",\n            ".join(parts)
            + "\n            " + "\n            UNION ALL ".join(sels)
            + "\n            ORDER BY sel_order")


def _kfold_case_sql(key_sql: str, k: int, seed: str) -> str:
    """DuckDB twin of sampling.kfold_split's band CASE — reproduces the
    SAME floating cumulative band edges (repeated ``cum + 1/k``
    addition, not ``i/k``) so thresholds match bit-for-bit."""
    pfx = f"substr(md5('{seed}' || CAST({key_sql} AS VARCHAR)), 1, 6)"
    whens, cum = [f"WHEN {key_sql} IS NULL THEN NULL"], 0.0
    for i in range(k - 1):
        cum = cum + 1.0 / k
        whens.append(f"WHEN {pfx} < '{_split_hex(cum)}' THEN {i}")
    return f"CAST(CASE {' '.join(whens)} ELSE {k - 1} END AS INTEGER)"


#: DuckDB twin of graph.cooccurrence_edges over the lineitem co-purchase
#: graph (distinct per-order parts, [2, max_group] basket sizes, src<dst)
_COPURCHASE_EDGES_SQL = f"""nodes AS (
                SELECT DISTINCT l_orderkey AS g, l_partkey AS n
                FROM lineitem WHERE l_partkey IS NOT NULL
            ), gs AS (
                SELECT g FROM nodes GROUP BY g
                HAVING count(*) >= 2 AND count(*) <= {COPURCHASE_MAX_GROUP}
            ), edges AS (
                SELECT DISTINCT a.n AS src, b.n AS dst
                FROM nodes a JOIN gs USING (g) JOIN nodes b USING (g)
                WHERE a.n < b.n
            )"""


def _pagerank_iter_sql(i: int, prev: str) -> str:
    """One unrolled PageRank iteration — the DuckDB twin of the loop body
    in graph.pagerank (same DECIMAL(28,18) contribution accumulation and
    fixed-order double update, so ranks are bit-identical)."""
    omd = repr(1.0 - PAGERANK_DAMPING)
    d = repr(PAGERANK_DAMPING)
    return f"""c{i} AS (
                SELECT dir.dst AS node,
                       CAST(SUM(CAST(r.rank / CAST(r.deg AS DOUBLE)
                            AS DECIMAL(28,18))) AS DOUBLE) AS inr
                FROM dir JOIN {prev} r ON dir.src = r.node
                GROUP BY dir.dst
            ), r{i} AS (
                SELECT d.node, d.deg,
                       CAST('{omd}' AS DOUBLE) / CAST(n AS DOUBLE)
                       + CAST('{d}' AS DOUBLE)
                         * COALESCE(c.inr, CAST('0.0' AS DOUBLE)) AS rank
                FROM deg d CROSS JOIN nn LEFT JOIN c{i} c ON c.node = d.node
            )"""


def _ppr_iter_sql(i: int, prev: str) -> str:
    """One unrolled personalized-PageRank iteration — the seeded-base
    twin of :func:`_pagerank_iter_sql` (same DECIMAL(28,18) contribution
    accumulation; the base term lands only on seed rows)."""
    omd = repr(1.0 - PAGERANK_DAMPING)
    d = repr(PAGERANK_DAMPING)
    return f"""c{i} AS (
                SELECT dir.dst AS node,
                       CAST(SUM(CAST(r.rank / CAST(r.deg AS DOUBLE)
                            AS DECIMAL(28,18))) AS DOUBLE) AS inr
                FROM dir JOIN {prev} r ON dir.src = r.node
                GROUP BY dir.dst
            ), r{i} AS (
                SELECT d.node, d.deg, d.seed,
                       CASE WHEN d.seed
                            THEN CAST('{omd}' AS DOUBLE)
                                 / CAST(ns AS DOUBLE)
                            ELSE CAST('0.0' AS DOUBLE) END
                       + CAST('{d}' AS DOUBLE)
                         * COALESCE(c.inr, CAST('0.0' AS DOUBLE)) AS rank
                FROM sd d CROSS JOIN nseed
                LEFT JOIN c{i} c ON c.node = d.node
            )"""


def _hll_est16_sql(regs: str, groups: str) -> str:
    """DuckDB twin of sketch.hll_estimate at p=4 (m=16) over a CTE
    ``regs(<groups>, hll_reg, mrho)``: per-group ``est`` via the
    integer-exact harmonic sum + one correctly-rounded division (the
    hll_cardinality_events oracle's arithmetic, factored for reuse)."""
    from hazelcast_jet_spark.operators.sketch import _hll_alpha

    alpha = repr(_hll_alpha(16) * 16 * 16 * float(2 ** 57))
    total = ("CAST(CAST(s_present AS HUGEINT) + (16 - hr) "
             "* CAST(144115188075855872 AS HUGEINT) AS DOUBLE)")
    return f"""
        SELECT {groups},
               CASE WHEN CAST('{alpha}' AS DOUBLE) / {total}
                         <= CAST('40.0' AS DOUBLE) AND (16 - hr) > 0
                    THEN CAST('16.0' AS DOUBLE)
                         * ln(CAST('16.0' AS DOUBLE)
                              / CAST(16 - hr AS DOUBLE))
                    ELSE CAST('{alpha}' AS DOUBLE) / {total} END AS est
        FROM (SELECT {groups}, count(*) AS hr,
                     SUM(CAST((CAST(1 AS BIGINT) << (57 - mrho))
                              AS DECIMAL(38,0))) AS s_present
              FROM {regs} GROUP BY {groups})
    """


def oracle_sql() -> dict[str, str]:
    rows_per_band = MINHASH_HASHES // MINHASH_BANDS
    band_entries = ", ".join(
        "md5(" + " || '|' || ".join(f"sig[{b * rows_per_band + r + 1}]" for r in range(rows_per_band)) + ")"
        for b in range(MINHASH_BANDS)
    )
    oracles = {
        "q1_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   {_dsum('l_quantity')} AS sum_qty,
                   {_dsum('l_extendedprice')} AS sum_base_price,
                   {_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
                   {_dsum('l_quantity')} / count(*) AS avg_qty,
                   {_dsum('l_discount')} / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber,
                   l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
                   l_returnflag || '-' || l_linestatus AS flag_status
            FROM lineitem
            WHERE l_quantity < 10 AND l_discount > 0.05
        """,
        "global_aggregate": f"""
            SELECT count(*) AS n_orders,
                   {_dsum('o_totalprice')} AS total,
                   min(o_totalprice) AS min_price,
                   max(o_totalprice) AS max_price,
                   count(DISTINCT o_custkey) AS n_custs
            FROM orders
        """,
        "join_orders_customer": f"""
            SELECT c_mktsegment, count(*) AS n_orders,
                   {_dsum('o_totalprice')} AS revenue
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "left_join_counts": """
            SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        """,
        "hash_join_enrich": f"""
            SELECT p_brand,
                   {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
                   count(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        """,
        "theta_join": """
            SELECT c_mktsegment, count(*) AS n_big_orders
            FROM orders JOIN customer
              ON o_custkey = c_custkey AND o_totalprice > c_acctbal
            GROUP BY c_mktsegment
        """,
        "distinct_op": "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
        "merge_union": """
            SELECT o_orderstatus, count(*) AS n_rows FROM (
                SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
                UNION ALL
                SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
            ) GROUP BY o_orderstatus
        """,
        "sort_limit": """
            SELECT o_orderkey, o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "top_n_per_group": """
            SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
                SELECT c_mktsegment, c_custkey, c_acctbal,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
                FROM customer
            ) WHERE rn <= 3
        """,
        "min_max_by": """
            WITH ranked AS (
                SELECT c_mktsegment, c_custkey,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
                       row_number() OVER (PARTITION BY c_mktsegment
                                          ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
                FROM customer
            )
            SELECT c_mktsegment,
                   max(CASE WHEN rmax = 1 THEN c_custkey END) AS richest_cust,
                   max(CASE WHEN rmin = 1 THEN c_custkey END) AS poorest_cust
            FROM ranked GROUP BY c_mktsegment
        """,
        "cogroup_orders_lineitem": f"""
            WITH oa AS (
                SELECT o_orderkey AS orderkey, count(*) AS n_orders,
                       {_dsum('o_totalprice')} AS order_total
                FROM orders GROUP BY o_orderkey
            ), la AS (
                SELECT l_orderkey AS orderkey, count(*) AS n_items,
                       {_dsum('l_quantity')} AS sum_qty
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT coalesce(oa.orderkey, la.orderkey) AS orderkey,
                   coalesce(n_orders, 0) AS n_orders, order_total,
                   coalesce(n_items, 0) AS n_items, sum_qty
            FROM oa FULL OUTER JOIN la ON oa.orderkey = la.orderkey
        """,
        "rolling_aggregate": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(value AS DECIMAL(18,6)))
                        OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                       AS running_value
            FROM events
        """,
        "distinct_by_key": """
            SELECT user_id, event_type, event_id FROM (
                SELECT user_id, event_type, event_id,
                       row_number() OVER (PARTITION BY user_id, event_type
                                          ORDER BY ts ASC, event_id ASC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "tumbling_window_batch": f"""
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, count(*) AS n_events, {_dsum('value')} AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "sliding_window_batch": """
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, count(*) AS n_events
            FROM (
                SELECT unnest([time_bucket(INTERVAL '1 hour', ts),
                               time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS ws
                FROM events
            ) GROUP BY ws
        """,
        "session_window_batch": """
            WITH marked AS (
                SELECT user_id, ts,
                       -- >= : Spark's session_window closes a session when the
                       -- gap reaches the duration (half-open interval), so two
                       -- events exactly 30 minutes apart are separate sessions
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 >= INTERVAL '30 minutes'
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ), sessions AS (
                SELECT user_id, ts,
                       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM marked
            )
            SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   user_id, count(*) AS n_events
            FROM sessions GROUP BY user_id, sid
        """,
        "scalar_functions": """
            SELECT p_partkey,
                   upper(p_name) AS up,
                   lower(p_brand) AS lo,
                   substr(p_type, 1, 5) AS sub,
                   length(p_name) AS len,
                   p_brand || ':' || p_type AS cat,
                   round(abs(p_retailprice - 1000), 2) AS absdev,
                   -- CAST: Spark's ceil/floor on DOUBLE return BIGINT while
                   -- DuckDB's return DOUBLE; values match but the gate hashes
                   -- typed values, so align the oracle to Spark's BIGINT.
                   CAST(ceil(p_retailprice) AS BIGINT) AS ceilp,
                   CAST(floor(p_retailprice) AS BIGINT) AS floorp,
                   p_size % 7 AS modsz,
                   pow(p_size, 2) AS sqsz,
                   sqrt(p_size * p_size) AS sqrtsz,
                   CASE WHEN p_size > 25 THEN 'big'
                        WHEN p_size > 10 THEN 'mid'
                        ELSE 'small' END AS szclass
            FROM part
        """,
        "generate_series_agg": """
            -- CAST: DuckDB SUM(BIGINT) widens to HUGEINT (int128) which the
            -- gate hashes differently from Spark's BIGINT even when values match
            SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS total
            FROM (SELECT unnest(generate_series(1, 100000)) AS v)
            WHERE v % 7 = 0
        """,
        "json_props": f"""
            SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
                   count(*) AS n, {_dsum('value')} AS sum_value
            FROM events GROUP BY 1
        """,
        "text_features": f"""
            WITH base AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents
            ), feat AS (
                SELECT doc_id, text,
                       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS n_tokens,
                       len(list_filter(toks, t -> list_contains({_STOPWORDS_SQL}, lower(t))))
                           / CAST(len(toks) AS DOUBLE) AS sw_ratio,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(text) AS n_chars
                FROM base
            )
            SELECT doc_id, n_tokens,
                   round(sw_ratio, 6) AS stopword_ratio,
                   CASE WHEN sw_ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS lang_pred,
                   round(
                     least(n_alpha / greatest(n_tokens, 1) / 8.0, 1.0)
                     + n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE)
                     + least(sw_ratio * 10.0, 1.0), 6) AS quality,
                   md5({_NORM}) AS fp
            FROM feat
        """,
        "token_stats": """
            SELECT source,
                   CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT) AS ws_tokens,
                   CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))) AS BIGINT) AS bpe_tokens,
                   count(*) AS n_docs
            FROM documents GROUP BY source
        """,
        "exact_dedup_docs": f"""
            SELECT md5({_NORM}) AS fp, min(doc_id) AS keep_id, count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "fs_weights_docs": (lambda flds: f"""
            WITH base AS (
                SELECT doc_id AS id, md5({_NORM}) AS mk, lang, source,
                       CAST(floor(CAST(n_chars AS DOUBLE) / 100.0)
                            AS BIGINT) AS len_band
                FROM documents
            ), sizes AS (
                SELECT mk, count(*) AS gn FROM base GROUP BY 1
            ), bounded AS (
                SELECT b.* FROM base b JOIN sizes s ON b.mk = s.mk
                WHERE s.gn >= 2 AND s.gn <= {FS_MAX_GROUP}
            ), mp AS (
                SELECT {", ".join(
                    f"CASE WHEN l.{f} IS NOT DISTINCT FROM r.{f} "
                    f"THEN 1 ELSE 0 END AS a_{f}" for f in flds)}
                FROM bounded l JOIN bounded r
                  ON l.mk = r.mk AND l.id < r.id
            ), seq AS (
                SELECT mk, {", ".join(flds)},
                       lead(mk) OVER w AS mk2,
                       {", ".join(f"lead({f}) OVER w AS n_{f}"
                                  for f in flds)}
                FROM base
                WINDOW w AS (ORDER BY md5('{FS_SEED}-'
                                          || CAST(id AS VARCHAR)))
            ), up AS (
                SELECT {", ".join(
                    f"CASE WHEN {f} IS NOT DISTINCT FROM n_{f} "
                    f"THEN 1 ELSE 0 END AS a_{f}" for f in flds)}
                FROM seq WHERE mk2 IS NOT NULL AND mk <> mk2
            ), magg AS (
                SELECT CAST(count(*) AS BIGINT) AS nm,
                       {", ".join(f"CAST(SUM(a_{f}) AS BIGINT) AS m_{f}"
                                  for f in flds)}
                FROM mp
            ), uagg AS (
                SELECT CAST(count(*) AS BIGINT) AS nu,
                       {", ".join(f"CAST(SUM(a_{f}) AS BIGINT) AS u_{f}"
                                  for f in flds)}
                FROM up
            )
            SELECT * FROM ({" UNION ALL ".join(f'''
                SELECT '{f}' AS field, nm AS n_match_pairs,
                       nu AS n_unmatch_pairs,
                       round(CAST(m_{f} AS DOUBLE) / CAST(nm AS DOUBLE),
                             6) + 0.0 AS m_prob,
                       round(CAST(u_{f} AS DOUBLE) / CAST(nu AS DOUBLE),
                             6) + 0.0 AS u_prob,
                       round(CASE WHEN CAST(m_{f} AS DOUBLE)
                                       / CAST(nm AS DOUBLE) > 0.0
                                   AND CAST(u_{f} AS DOUBLE)
                                       / CAST(nu AS DOUBLE) > 0.0
                                  THEN ln((CAST(m_{f} AS DOUBLE)
                                           / CAST(nm AS DOUBLE))
                                          / (CAST(u_{f} AS DOUBLE)
                                             / CAST(nu AS DOUBLE)))
                                       / ln(2.0) END, 6) + 0.0
                           AS w_agree,
                       round(CASE WHEN CAST(m_{f} AS DOUBLE)
                                       / CAST(nm AS DOUBLE) < 1.0
                                   AND CAST(u_{f} AS DOUBLE)
                                       / CAST(nu AS DOUBLE) < 1.0
                                  THEN ln((1.0 - CAST(m_{f} AS DOUBLE)
                                           / CAST(nm AS DOUBLE))
                                          / (1.0 - CAST(u_{f} AS DOUBLE)
                                             / CAST(nu AS DOUBLE)))
                                       / ln(2.0) END, 6) + 0.0
                           AS w_disagree
                FROM magg CROSS JOIN uagg''' for f in flds)})
            ORDER BY field
        """)(["lang", "len_band", "source"]),
        "minhash_lsh_dedup": f"""
            WITH base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([{band_entries}]) AS bucket,
                       unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b, l.sh AS sh_a, r.sh AS sh_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
            )
            SELECT id_a, id_b,
                   round(len(list_intersect(sh_a, sh_b))
                         / CAST(len(list_distinct(list_concat(sh_a, sh_b))) AS DOUBLE), 6)
                       AS jaccard_sim
            FROM cands
            WHERE round(len(list_intersect(sh_a, sh_b))
                        / CAST(len(list_distinct(list_concat(sh_a, sh_b))) AS DOUBLE), 6)
                  >= {LSH_THRESHOLD}
        """,
        "ngram_jaccard_dedup": f"""
            WITH base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sizes AS (
                SELECT id, len(sh) AS n FROM base
            ), inv AS (
                SELECT id, unnest(sh) AS s FROM base
            ), common AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
                FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
                GROUP BY a.id, b.id
            )
            SELECT id_a, id_b,
                   round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) AS jaccard_sim
            FROM common
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) >= {LSH_THRESHOLD}
        """,
        "dedup_group_sizes": f"""
            WITH RECURSIVE base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sizes AS (
                SELECT id, len(sh) AS n FROM base
            ), inv AS (
                SELECT id, unnest(sh) AS s FROM base
            ), common AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
                FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
                GROUP BY a.id, b.id
            ), pairs AS (
                SELECT id_a, id_b
                FROM common
                JOIN sizes sa ON sa.id = id_a
                JOIN sizes sb ON sb.id = id_b
                WHERE round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6)
                      >= {LSH_THRESHOLD}
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach AS (
                -- transitive closure; min reachable id == the min-label
                -- fixpoint pairs_to_groups converges to
                SELECT src AS node, src AS r FROM edges
                UNION
                SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
            ), grp AS (
                SELECT node, min(r) AS group_id FROM reach GROUP BY node
            )
            SELECT group_id, count(*) AS group_size
            FROM grp GROUP BY group_id ORDER BY group_id
        """,
        "asof_join_events": """
            WITH p AS (
                SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'purchase'
            ), c AS (
                -- ties on (user, ts) collapse to max(value), matching the
                -- operator's deterministic pre-aggregation
                SELECT user_id, ts, max(value) AS value FROM events
                WHERE event_type = 'click' GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id,
                   p.value AS purchase_value,
                   c.value AS last_click_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "asof_join_forward": """
            WITH c AS (
                SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'click'
            ), p AS (
                -- ties on (user, ts) collapse to max(value), matching the
                -- operator's deterministic pre-aggregation
                SELECT user_id, ts, max(value) AS value FROM events
                WHERE event_type = 'purchase' GROUP BY user_id, ts
            )
            SELECT c.event_id, c.user_id,
                   c.value AS click_value,
                   p.value AS next_purchase_value
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND c.ts <= p.ts
        """,
        "pii_scrub_stats": f"""
            WITH planted AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or '
                            || CASE WHEN doc_id % 2 = 0
                                    THEN '123-45-' ||
                                         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                                    ELSE '' END
                            || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                           AS text
                FROM documents
            ), scrubbed AS (
                SELECT doc_id, text,
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                           text,
                           '{text.PII_PATTERNS["email"]}', '[EMAIL]', 'g'),
                           '{text.PII_PATTERNS["ssn"]}', '[SSN]', 'g'),
                           '{text.PII_PATTERNS["ipv4"]}', '[IPV4]', 'g'),
                           '{text.PII_PATTERNS["phone"]}', '[PHONE]', 'g') AS sc
                FROM planted
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{text.PII_PATTERNS["email"]}')) AS INTEGER) AS email_hits,
                   CAST(len(regexp_extract_all(text, '{text.PII_PATTERNS["ssn"]}')) AS INTEGER) AS ssn_hits,
                   CAST(len(regexp_extract_all(text, '{text.PII_PATTERNS["ipv4"]}')) AS INTEGER) AS ipv4_hits,
                   CAST(len(regexp_extract_all(text, '{text.PII_PATTERNS["phone"]}')) AS INTEGER) AS phone_hits,
                   CAST(CASE WHEN len(regexp_extract_all(sc, '{text.PII_PATTERNS["email"]}'))
                                + len(regexp_extract_all(sc, '{text.PII_PATTERNS["ssn"]}'))
                                + len(regexp_extract_all(sc, '{text.PII_PATTERNS["ipv4"]}'))
                                + len(regexp_extract_all(sc, '{text.PII_PATTERNS["phone"]}')) = 0
                             THEN 1 ELSE 0 END AS INTEGER) AS clean_after_scrub
            FROM scrubbed ORDER BY doc_id
        """,
        "tpch_q5_local_supplier": """
            SELECT n_name,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
            GROUP BY n_name
            ORDER BY revenue DESC, n_name ASC
        """,
        "pivot_mktsegment": """
            SELECT c_nationkey,
                   count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS automobile,
                   count(*) FILTER (WHERE c_mktsegment = 'BUILDING')   AS building,
                   count(*) FILTER (WHERE c_mktsegment = 'FURNITURE')  AS furniture,
                   count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD')  AS household,
                   count(*) FILTER (WHERE c_mktsegment = 'MACHINERY')  AS machinery
            FROM customer GROUP BY c_nationkey
        """,
        "corr_covar_aggs": f"""
            WITH m AS (
                SELECT event_type,
                       CAST(count(*) AS DOUBLE) AS n,
                       {_dsum("CAST(event_id % 1000 AS DOUBLE)")} AS sx,
                       {_dsum("value")} AS sy,
                       {_dsum("CAST(event_id % 1000 AS DOUBLE) * value")} AS sxy,
                       {_dsum("CAST(event_id % 1000 AS DOUBLE) * CAST(event_id % 1000 AS DOUBLE)")} AS sxx,
                       {_dsum("value * value")} AS syy
                FROM events GROUP BY event_type
            )
            SELECT event_type,
                   CAST(n AS BIGINT) AS n,
                   round((n * sxy - sx * sy)
                         / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_xy,
                   round(sxy / n - (sx / n) * (sy / n), 6) AS covar_pop_xy
            FROM m
        """,
        "datetime_functions": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(quarter(o_orderdate) AS INT) AS qtr,
                   CAST(month(o_orderdate) AS INT) AS mo,
                   CAST(day(o_orderdate) AS INT) AS dom,
                   -- DuckDB dayofweek: Sunday=0; Spark: Sunday=1
                   CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
                   CAST(dayofyear(o_orderdate) AS INT) AS doy,
                   strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
                   strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
                   CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
                       AS days_since_95
            FROM orders
        """,
        "array_higher_order": """
            SELECT vec_id,
                   CAST(len(embedding) AS INT) AS dim,
                   CAST(embedding[1] AS DOUBLE) AS first_elem,
                   CAST(embedding[-1] AS DOUBLE) AS last_elem,
                   CAST(list_max(embedding) AS DOUBLE) AS max_elem,
                   CAST(list_min(embedding) AS DOUBLE) AS min_elem,
                   round(list_sum(list_transform(embedding[1:8],
                                                 v -> CAST(v AS DOUBLE))), 6) AS head8_sum,
                   round(list_sum(list_transform(embedding,
                                                 v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))), 6) AS ssq
            FROM embeddings
        """,
        "window_frames": """
            SELECT l_orderkey, l_linenumber,
                   lag(l_quantity, 1) OVER w AS prev_qty,
                   lead(l_quantity, 1) OVER w AS next_qty,
                   sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS run_qty,
                   sum(l_quantity) OVER (w ROWS BETWEEN 2 PRECEDING
                                         AND CURRENT ROW) AS qty3,
                   first_value(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND CURRENT ROW) AS first_qty
            FROM lineitem
            WINDOW w AS (PARTITION BY l_orderkey
                         ORDER BY l_linenumber, l_partkey, l_suppkey,
                                  CAST(l_quantity AS BIGINT))
        """,
        "streaming_dedup_count": """
            SELECT event_type, count(*) AS n_user_types
            FROM (SELECT DISTINCT user_id, event_type FROM events)
            GROUP BY event_type
        """,
        "cep_sequence_match": """
            WITH seq AS (
                SELECT user_id, event_id, ts, event_type,
                       lead(event_type, 1) OVER w AS t1,
                       lead(event_type, 2) OVER w AS t2,
                       lead(event_id, 2)   OVER w AS eid2,
                       lead(ts, 2)         OVER w AS ts2
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   event_id AS start_event_id,
                   eid2     AS end_event_id,
                   strftime(ts,  '%Y-%m-%d %H:%M:%S') AS start_ts,
                   strftime(ts2, '%Y-%m-%d %H:%M:%S') AS end_ts
            FROM seq
            WHERE event_type = 'view' AND t1 = 'view' AND t2 = 'click'
              AND ts2 <= ts + INTERVAL 1 DAY
        """,
        "kmv_distinct_sketch": """
            WITH sk AS (
                SELECT event_type,
                       list_slice(list_sort(list_distinct(
                           list(md5(CAST(user_id AS VARCHAR))))), 1, 32) AS sk,
                       count(DISTINCT user_id) AS exact_distinct
                FROM events GROUP BY 1
            )
            SELECT event_type,
                   CASE WHEN len(sk) < 32 THEN CAST(len(sk) AS BIGINT)
                        ELSE CAST(floor(31.0 /
                             (CAST(CAST('0x' || substr(sk[32], 1, 12) AS UBIGINT) AS DOUBLE)
                              / 281474976710656.0) + 0.5) AS BIGINT)
                   END AS kmv_estimate,
                   exact_distinct
            FROM sk
        """,
        "continuous_aggregate_rollup": """
            SELECT strftime(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type,
                   count(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "tpch_q10_returned_items": """
            SELECT c_custkey, c_name, c_acctbal, n_name,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
              AND o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
            GROUP BY 1, 2, 3, 4
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "range_join_value_bands": """
            WITH bands AS (
                SELECT CAST(i AS INT) AS band_id, i * 40.0 AS lo, i * 40.0 + 60.0 AS hi
                FROM generate_series(0, 12) AS t(i)
            )
            SELECT band_id,
                   count(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events JOIN bands ON value >= lo AND value < hi
            GROUP BY 1
        """,
        "embedding_quantize_int8": """
            WITH m AS (
                SELECT vec_id,
                       CAST(embedding AS DOUBLE[]) AS e,
                       list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> abs(x))) AS amax
                FROM embeddings
            )
            SELECT vec_id,
                   CASE WHEN amax = 0 THEN 0.0 ELSE amax / 127.0 END AS scale,
                   array_to_string(
                       CASE WHEN amax = 0
                            THEN list_transform(e, x -> 0)
                            ELSE list_transform(e, x ->
                                 CAST(floor(x * 127.0 / amax + 0.5) AS INT))
                       END, ',') AS codes
            FROM m
        """,
        "tpch_q6_forecast_revenue": """
            SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
        """,
        "tpch_q14_promo_revenue": """
            WITH j AS (
                SELECT CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS pr,
                       l_extendedprice * (1 - l_discount) AS r
                FROM lineitem JOIN part ON l_partkey = p_partkey
                WHERE l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'
            )
            SELECT CAST(SUM(CAST(pr AS DECIMAL(18,6))) AS DOUBLE) AS promo_rev,
                   CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) AS total_rev,
                   100.0 * CAST(SUM(CAST(pr AS DECIMAL(18,6))) AS DOUBLE)
                       / CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) AS promo_pct
            FROM j
        """,
        "cep_stream_match": """
            WITH seq AS (
                SELECT user_id, event_id, ts, event_type,
                       lead(event_type, 1) OVER w AS t1,
                       lead(event_id, 1)   OVER w AS eid1,
                       lead(ts, 1)         OVER w AS ts1
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id,
                   event_id AS start_event_id,
                   eid1     AS end_event_id,
                   strftime(ts,  '%Y-%m-%d %H:%M:%S') AS start_ts,
                   strftime(ts1, '%Y-%m-%d %H:%M:%S') AS end_ts
            FROM seq
            WHERE event_type = 'signup' AND t1 = 'purchase'
              AND ts1 <= ts + INTERVAL 1 DAY
        """,
        "nexmark_q4_avg_by_category": """
            WITH closing AS (
                SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart,
                       event_type, user_id, max(value) AS close_max
                FROM events
                WHERE event_type IN ('purchase', 'click')
                GROUP BY 1, 2, 3
            )
            SELECT event_type,
                   CAST(SUM(CAST(close_max AS DECIMAL(18,6))) AS DOUBLE) AS sum_close,
                   count(*) AS n_windows
            FROM closing GROUP BY 1
        """,
        "nexmark_q7_window_max": """
            SELECT window_start, event_id, user_id, value
            FROM (
                SELECT strftime(time_bucket(INTERVAL '1 hour', ts),
                                '%Y-%m-%d %H:%M:%S') AS window_start,
                       event_id, user_id, value,
                       row_number() OVER (
                           PARTITION BY time_bucket(INTERVAL '1 hour', ts)
                           ORDER BY value DESC, event_id) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "nexmark_q8_stream_join": """
            SELECT s.user_id,
                   s.event_id AS s_id,
                   p.event_id AS p_id,
                   strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
                   strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
            FROM events s JOIN events p
              ON s.user_id = p.user_id
             AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 12 HOUR
            WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
        """,
        "tpch_q18_large_orders": """
            SELECT c_name, c_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_totalprice,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem GROUP BY 1
                HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 250)
            GROUP BY 1, 2, 3, 4, 5
        """,
        "stratified_sample_docs": """
            SELECT doc_id, lang, source, n_chars
            FROM documents
            WHERE substr(md5('s42-' || CAST(doc_id AS VARCHAR)), 1, 6) <
                  CASE lang
                      WHEN 'en' THEN '400000'
                      WHEN 'de' THEN 'cccccc'
                      WHEN 'fr' THEN 'cccccc'
                      WHEN 'es' THEN '800000'
                      WHEN 'zh' THEN '800000'
                      ELSE '199999'
                  END
        """,
        "reservoir_sample_events": """
            SELECT event_type, event_id, user_id
            FROM (
                SELECT event_type, event_id, user_id,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY md5('r7-' || CAST(event_id AS VARCHAR)),
                                    event_id) AS rn
                FROM events
            ) WHERE rn <= 5
        """,
        "tfidf_top_terms": r"""
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS nt
                FROM documents
            ), toks AS (
                SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM norm
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM toks WHERE term <> '' GROUP BY 1, 2
            ), dfq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), nd AS (
                SELECT count(DISTINCT doc_id) AS n_docs FROM documents
            ), scored AS (
                SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                       (CAST(tf.tf AS DOUBLE) * CAST(nd.n_docs AS DOUBLE))
                           / CAST(dfq.df AS DOUBLE) AS tf_idf
                FROM tf JOIN dfq USING (term) CROSS JOIN nd
            )
            SELECT doc_id, term, tf, df, tf_idf
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id ORDER BY tf_idf DESC, term) AS rn
                  FROM scored)
            WHERE rn <= 5
        """,
        "simhash_groups": f"""
            WITH hs AS (
                SELECT doc_id, {_SIMHASH_HL} AS hl FROM documents
            ), sh AS (
                SELECT doc_id, {_simhash_sql()} AS sh FROM hs
            )
            SELECT sh, count(*) AS n_docs, min(doc_id) AS keep_id
            FROM sh GROUP BY sh HAVING count(*) > 1
        """,
        "linear_trend_agg": """
            WITH m AS (
                SELECT user_id,
                       CAST(count(*) AS DOUBLE) AS n,
                       CAST(SUM(CAST(CAST(event_id AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
                       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sy,
                       CAST(SUM(CAST(CAST(event_id AS DOUBLE) * value AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
                       CAST(SUM(CAST(CAST(event_id AS DOUBLE) * CAST(event_id AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) AS sxx
                FROM events GROUP BY user_id
            )
            SELECT user_id, (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope FROM m
        """,
        "collection_aggs": """
            SELECT c_nationkey,
                   array_to_string(list_sort(list(c_mktsegment)), '|') AS segs_sorted,
                   array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|') AS segs_set,
                   string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY CAST(c_custkey AS VARCHAR)) AS keys_csv,
                   array_to_string(
                       list_transform(
                           list_sort(list(CAST(c_acctbal AS DECIMAL(12,2))), 'DESC')[1:3],
                           x -> CAST(x AS VARCHAR)), '|') AS top3_bal
            FROM customer GROUP BY c_nationkey
        """,
        "distinct_aggregates": """
            SELECT l_returnflag,
                   count(DISTINCT l_suppkey) AS n_supp,
                   CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_d_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "having_filter": f"""
            SELECT o_custkey, count(*) AS n, {_dsum('o_totalprice')} AS spend
            FROM orders GROUP BY o_custkey HAVING count(*) >= 15
        """,
        "semi_anti_join": """
            SELECT c_custkey, 'has_urgent' AS bucket FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            UNION ALL
            SELECT c_custkey, 'no_urgent' AS bucket FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        """,
        "full_outer_join": """
            WITH hi_cust AS (
                SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000
            ), big_ord AS (
                SELECT o_custkey, count(*) AS n_big FROM orders
                WHERE o_totalprice > 300000 GROUP BY o_custkey
            )
            SELECT coalesce(c_custkey, o_custkey) AS custkey,
                   c_acctbal, coalesce(n_big, 0) AS n_big
            FROM hi_cust FULL OUTER JOIN big_ord ON c_custkey = o_custkey
        """,
        "set_operations": """
            WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
                 s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
            SELECT nk, 'both' AS src FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
            UNION ALL
            SELECT nk, 'cust_only' AS src FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
        """,
        "like_and_trim": """
            SELECT p_partkey,
                   trim('  pad  ') AS trimmed,
                   ltrim('  x') AS l,
                   rtrim('x  ') AS r,
                   ascii(substr(p_name, 1, 1)) AS first_ascii,
                   CAST(p_name LIKE 's%' AS INT) AS starts_s
            FROM part WHERE p_name LIKE '%r%'
        """,
        "cast_matrix": """
            SELECT l_orderkey, l_linenumber,
                   CAST(l_linenumber AS BIGINT) AS i2l,
                   CAST(l_orderkey AS VARCHAR) AS l2s,
                   CAST(floor(l_extendedprice) AS INT) AS d2i,
                   CAST(trunc(l_quantity) AS INT) AS q2i,
                   l_linenumber < 3 AS b,
                   CAST(l_linenumber < 3 AS INT) AS b2i,
                   strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ts2d
            FROM lineitem
        """,
        "rollup_agg": f"""
            SELECT c_mktsegment, c_nationkey, count(*) AS n, {_dsum('c_acctbal')} AS bal
            FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)
        """,
        "window_rank_functions": """
            SELECT o_orderkey, o_custkey,
                   rank() OVER w AS rnk,
                   dense_rank() OVER w AS drnk,
                   lag(o_totalprice, 1) OVER w AS prev_price,
                   lead(o_orderkey, 1) OVER w AS next_key
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        """,
        "multi_hop_enrichment": f"""
            SELECT r_name,
                   {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "pandas_udf_text_metrics": """
            SELECT lang,
                   CAST(SUM(length(regexp_replace(text, '[^aeiou]', '', 'g'))) AS BIGINT) AS total_vowels,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "values_inline": """
            SELECT k, upper(s) AS us, CAST(v AS DOUBLE) * 2 AS v2
            FROM (VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', NULL)) AS t(k, s, v)
        """,
        "embedding_cosine_dedup": f"""
            WITH sig AS (
                SELECT vec_id,
                       [{", ".join(_band_sig_sql(b) for b in _lsh_bands())}] AS sigs
                FROM embeddings
            ), b AS (
                SELECT vec_id, unnest(sigs) AS sig,
                       unnest(generate_series(1, {LSH_NUM_BANDS})) AS band
                FROM sig
            ), bcap AS (
                -- twin of max_bucket: over-sized band buckets dropped whole
                SELECT vec_id, band, sig FROM b
                QUALIFY count(*) OVER (PARTITION BY band, sig) <= {LSH_MAX_BUCKET}
            ), cands AS (
                SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
                FROM bcap l JOIN bcap r
                  ON l.band = r.band AND l.sig = r.sig AND l.vec_id < r.vec_id
            )
            SELECT id_a, id_b, {_cos_sql("ea.embedding", "eb.embedding")} AS cos_sim
            FROM cands
            JOIN embeddings ea ON ea.vec_id = id_a
            JOIN embeddings eb ON eb.vec_id = id_b
            WHERE {_cos_sql("ea.embedding", "eb.embedding")} >= {COSINE_DEDUP_THRESHOLD}
        """,
        "filtered_aggs": """
            SELECT l_linestatus,
                   count(*) FILTER (WHERE l_extendedprice < 10000) AS n_cheap,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                        FILTER (WHERE l_extendedprice < 10000) AS DOUBLE) AS qty_cheap,
                   count(*) AS n_all,
                   1 AS one
            FROM lineitem GROUP BY l_linestatus
        """,
        "ann_lsh_search": f"""
            WITH sig AS (
                SELECT vec_id,
                       [{", ".join(_band_sig_sql(b) for b in _lsh_bands())}] AS sigs
                FROM embeddings
            ), b AS (
                SELECT vec_id, unnest(sigs) AS sig,
                       unnest(generate_series(1, {LSH_NUM_BANDS})) AS band
                FROM sig
            ), bc AS (
                -- corpus-side max_bucket twin: cap counted over the corpus
                SELECT vec_id, band, sig FROM b
                QUALIFY count(*) OVER (PARTITION BY band, sig) <= {LSH_MAX_BUCKET}
            ), bq AS (
                -- query-side cap counted within the query subset only,
                -- matching _banded_buckets on the queries DataFrame
                SELECT vec_id, band, sig FROM b WHERE vec_id < {N_QUERY_VECS}
                QUALIFY count(*) OVER (PARTITION BY band, sig) <= {LSH_MAX_BUCKET}
            ), cands AS (
                SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
                FROM bc c JOIN bq q ON c.band = q.band AND c.sig = q.sig
                WHERE c.vec_id <> q.vec_id
            ), scored AS (
                SELECT query_id, corpus_id,
                       {_cos_sql("qe.embedding", "ce.embedding")} AS cos_sim
                FROM cands
                JOIN embeddings qe ON qe.vec_id = query_id
                JOIN embeddings ce ON ce.vec_id = corpus_id
            )
            SELECT query_id, corpus_id, cos_sim, rank FROM (
                SELECT query_id, corpus_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos_sim DESC, corpus_id ASC) AS rank
                FROM scored
            ) WHERE rank <= {TOPK}
        """,
        "multimodal_features": """
            SELECT doc_id AS media_id, 'doc' AS kind,
                   CAST(length(text) AS BIGINT) AS n_bytes,
                   md5(text) AS feature
            FROM documents
        """,
        "wordcount": """
            SELECT word, count(*) AS cnt FROM (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
                FROM documents
            ) WHERE length(word) > 0 GROUP BY word
        """,
        "nexmark_q5_hot_items": """
            WITH counts AS (
                SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, user_id,
                       count(*) AS n
                FROM (
                    SELECT user_id,
                           unnest([time_bucket(INTERVAL '1 hour', ts),
                                   time_bucket(INTERVAL '1 hour', ts) - INTERVAL '1 hour']) AS ws
                    FROM events
                ) GROUP BY ws, user_id
            )
            SELECT window_start, user_id, n, rnk FROM (
                SELECT window_start, user_id, n,
                       row_number() OVER (PARTITION BY window_start
                                          ORDER BY n DESC, user_id ASC) AS rnk
                FROM counts
            ) WHERE rnk <= 3
        """,
        "streaming_tumbling_window": f"""
            SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   count(*) AS n_events, {_dsum('value')} AS sum_value
            FROM events GROUP BY 1
        """,
        "streaming_stateful_count": """
            SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
        """,
"streaming_session_window": """
            WITH marked AS (
                SELECT user_id, ts,
                       -- >= : Spark's session_window closes a session when the
                       -- gap reaches the duration (half-open interval), so two
                       -- events exactly 30 minutes apart are separate sessions
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 >= INTERVAL '30 minutes'
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ), sessions AS (
                SELECT user_id, ts,
                       sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM marked
            )
            SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   user_id, count(*) AS n_events
            FROM sessions GROUP BY user_id, sid
        """,
        "streaming_rolling_count": """
            SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
        """,
        "multimodal_frame_sample": """
            SELECT doc_id AS media_id,
                   CAST(unnest(generate_series(
                       0, greatest((n_chars % 5000 + 1000) - 1, 0), 1000)) AS INT)
                       AS frame_ts_ms
            FROM documents
        """,
        "tpch_q3_shipping_priority": f"""
            SELECT l_orderkey,
                   {_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   o_orderpriority
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
            LIMIT 10
        """,
        "reducing_agg": """
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS INT)) AS INT) AS qty_sum,
                   CAST(bit_xor(l_orderkey) AS BIGINT) AS key_xor
            FROM lineitem GROUP BY l_returnflag
        """,
        "ivf_topk_search": f"""
            WITH d AS (
                SELECT vec_id, embedding,
                       [{", ".join(
                           f"round(1.0 - {_cos_raw_sql('embedding', str(c))}, 9)"
                           for c in _ivf_centroids()
                       )}] AS dists
                FROM embeddings
            ), corpus AS (
                SELECT vec_id AS corpus_id, embedding AS cvec,
                       list_position(dists, list_min(dists)) AS centroid_id
                FROM d
            ), qd AS (
                SELECT vec_id AS query_id, embedding AS qvec,
                       unnest(dists) AS dist,
                       unnest(generate_series(1, {IVF_N_CENTROIDS})) AS centroid_id
                FROM d WHERE vec_id < {N_QUERY_VECS}
            ), probe AS (
                SELECT query_id, qvec, centroid_id FROM (
                    SELECT query_id, qvec, centroid_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY dist ASC, centroid_id ASC) AS pr
                    FROM qd
                ) WHERE pr <= {IVF_NPROBE}
            ), scored AS (
                SELECT query_id, corpus_id, {_cos_sql("qvec", "cvec")} AS cos_sim
                FROM corpus JOIN probe USING (centroid_id)
                WHERE corpus_id <> query_id
            )
            SELECT query_id, corpus_id, cos_sim, rank FROM (
                SELECT query_id, corpus_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos_sim DESC, corpus_id ASC) AS rank
                FROM scored
            ) WHERE rank <= {TOPK}
        """,
        "ndcg_ivf_emb": (lambda disc, ideal: f"""
            WITH d AS (
                SELECT vec_id, embedding,
                       [{", ".join(
                           f"round(1.0 - {_cos_raw_sql('embedding', str(c))}, 9)"
                           for c in _ivf_centroids()
                       )}] AS dists
                FROM embeddings
            ), corpus AS (
                SELECT vec_id AS corpus_id, embedding AS cvec,
                       list_position(dists, list_min(dists)) AS centroid_id
                FROM d
            ), qd AS (
                SELECT vec_id AS query_id, embedding AS qvec,
                       unnest(dists) AS dist,
                       unnest(generate_series(1, {IVF_N_CENTROIDS}))
                           AS centroid_id
                FROM d WHERE vec_id < {N_QUERY_VECS}
            ), probe AS (
                SELECT query_id, qvec, centroid_id FROM (
                    SELECT query_id, qvec, centroid_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY dist ASC,
                                                       centroid_id ASC)
                               AS pr
                    FROM qd
                ) WHERE pr <= {IVF_NPROBE}
            ), iscored AS (
                SELECT query_id, corpus_id,
                       {_cos_sql("qvec", "cvec")} AS cos_sim
                FROM corpus JOIN probe USING (centroid_id)
                WHERE corpus_id <> query_id
            ), cand AS (
                SELECT query_id, corpus_id, rank FROM (
                    SELECT query_id, corpus_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos_sim DESC,
                                                       corpus_id ASC)
                               AS rank
                    FROM iscored
                ) WHERE rank <= {TOPK}
            ), q AS (
                SELECT vec_id AS query_id, embedding AS qvec
                FROM embeddings WHERE vec_id < {N_QUERY_VECS}
            ), escored AS (
                SELECT q.query_id, c.vec_id AS corpus_id,
                       {_cos_sql("q.qvec", "c.embedding")} AS cos_sim
                FROM embeddings c, q
                WHERE c.vec_id <> q.query_id
            ), truth AS (
                SELECT query_id, corpus_id, rank AS trank FROM (
                    SELECT query_id, corpus_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos_sim DESC,
                                                       corpus_id ASC)
                               AS rank
                    FROM escored
                ) WHERE rank <= {TOPK}
            ), joined AS (
                SELECT c.query_id, c.rank, t.trank
                FROM cand c LEFT JOIN truth t
                  ON c.query_id = t.query_id
                 AND c.corpus_id = t.corpus_id
            ), dcg AS (
                SELECT query_id,
                       CAST(count(trank) AS BIGINT) AS n_hits,
                       COALESCE(CAST(SUM(CAST(
                           CAST({TOPK} - trank + 1 AS DOUBLE)
                           * ([{", ".join(repr(x) for x in disc)}])[rank]
                           AS DECIMAL(28,12))) AS DOUBLE), 0.0) AS dcg
                FROM joined GROUP BY 1
            ), nt AS (
                SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
                FROM truth GROUP BY 1
            )
            SELECT n.query_id, n.n_truth, g.n_hits,
                   round(g.dcg
                         / ([{", ".join(repr(x) for x in ideal)}])
                           [CAST(n.n_truth AS INT)], 6) + 0.0 AS ndcg
            FROM nt n JOIN dcg g USING (query_id)
            ORDER BY n.query_id
        """)(_ndcg_discounts(TOPK), _ndcg_ideal(TOPK)),
        "ivf_staleness_emb": f"""
            WITH d AS (
                SELECT vec_id, embedding,
                       [{", ".join(
                           f"round(1.0 - {_cos_raw_sql('embedding', str(c))}, 9)"
                           for c in _ivf_centroids()
                       )}] AS dists
                FROM embeddings
            ), a AS (
                SELECT CAST(list_position(dists, list_min(dists)) AS BIGINT)
                           AS centroid_id,
                       dists[list_position(dists, list_min(dists))] AS dist,
                       embedding
                FROM d
            ), e AS (
                SELECT centroid_id, dist,
                       CAST(unnest(embedding) AS DOUBLE) AS val,
                       unnest(generate_series(
                           0, {len(_ivf_centroids()[0]) - 1})) AS pos
                FROM a
            ), per AS (
                SELECT centroid_id, pos, count(*) AS n,
                       CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) AS s,
                       CAST(SUM(CASE WHEN pos = 0
                                     THEN CAST(dist AS DECIMAL(38,9))
                                END) AS DOUBLE) AS ds
                FROM e GROUP BY 1, 2
            ), c AS (
                SELECT CAST(cid AS BIGINT) AS centroid_id,
                       unnest(generate_series(
                           0, {len(_ivf_centroids()[0]) - 1})) AS pos,
                       CAST(unnest(cv) AS DOUBLE) AS cval,
                       CAST(csq AS DOUBLE) AS csq
                FROM (VALUES {", ".join(
                    f"({i + 1}, {list(map(float, cc))},"
                    f" {sum(float(y) * float(y) for y in cc)!r})"
                    for i, cc in enumerate(_ivf_centroids())
                )}) AS t(cid, cv, csq)
            ), agg AS (
                SELECT p.centroid_id,
                       MAX(p.n) AS n_vectors,
                       CAST(SUM(CAST((p.s / CAST(p.n AS DOUBLE)) * c.cval
                                     AS DECIMAL(38,9))) AS DOUBLE) AS dot,
                       CAST(SUM(CAST((p.s / CAST(p.n AS DOUBLE))
                                     * (p.s / CAST(p.n AS DOUBLE))
                                     AS DECIMAL(38,9))) AS DOUBLE) AS msq,
                       MAX(p.ds) AS dsum,
                       MAX(c.csq) AS csq
                FROM per p JOIN c USING (centroid_id, pos)
                GROUP BY 1
            )
            SELECT centroid_id, n_vectors,
                   round(dsum / CAST(n_vectors AS DOUBLE), 6) + 0.0
                       AS mean_dist,
                   round(1.0 - dot / (sqrt(msq) * sqrt(csq)), 6) + 0.0
                       AS drift
            FROM agg ORDER BY centroid_id
        """,
        "simhash_near_dups": f"""
            WITH hs AS (
                SELECT doc_id AS id, {_SIMHASH_HL} AS hl FROM documents
            ), sh AS (
                SELECT id, {_simhash_sql()} AS sh FROM hs
            ), b AS (
                SELECT id, sh,
                       unnest([{", ".join(
                           f"(sh >> {lo}) & {(1 << w) - 1}"
                           for lo, w in dedup.simhash_bands(SIMHASH_BITS, 2)
                       )}]) AS bb,
                       unnest(generate_series(0, 2)) AS band
                FROM sh
            ), pairs AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                       CAST(bit_count(xor(l.sh, r.sh)) AS INT) AS hamming_dist
                FROM b l JOIN b r
                  ON l.band = r.band AND l.bb = r.bb AND l.id < r.id
            )
            SELECT id_a, id_b, hamming_dist FROM pairs WHERE hamming_dist <= 2
        """,
        "map_aggregate": """
            SELECT c_nationkey,
                   '{"' || string_agg(c_mktsegment || '":' || n, ',"' ORDER BY c_mktsegment) || '}'
                       AS seg_counts
            FROM (SELECT c_nationkey, c_mktsegment, count(*) AS n
                  FROM customer GROUP BY 1, 2)
            GROUP BY c_nationkey
        """,
        "custom_udaf_agg": """
            SELECT c_nationkey,
                   CAST(SUM(CASE WHEN c_custkey % 2 = 1 THEN c_custkey
                                 ELSE -c_custkey END) AS BIGINT) AS alt_sum
            FROM customer GROUP BY c_nationkey
        """,
        "cosine_topk_search": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
                WHERE vec_id < {N_QUERY_VECS}
            ), scored AS (
                SELECT q.query_id, c.vec_id AS corpus_id,
                       round(
                         list_sum(list_transform(list_zip(q.qvec, c.embedding),
                                                 x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                         / (sqrt(list_sum(list_transform(q.qvec, v -> CAST(v AS DOUBLE) * v)))
                            * sqrt(list_sum(list_transform(c.embedding, v -> CAST(v AS DOUBLE) * v)))),
                         6) AS cos_sim
                FROM embeddings c, q
                WHERE c.vec_id <> q.query_id
            )
            SELECT query_id, corpus_id, cos_sim, rank FROM (
                SELECT query_id, corpus_id, cos_sim,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos_sim DESC, corpus_id ASC) AS rank
                FROM scored
            ) WHERE rank <= {TOPK}
        """,
        "tpch_q4_order_priority": """
            SELECT o_orderpriority, count(*) AS order_count
            FROM orders
            WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1996-04-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate)
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q13_customer_distribution": """
            SELECT c_count, count(*) AS custdist
            FROM (
                SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey
            )
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q16_supplier_cnt": """
            SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_size >= 20
              AND l_suppkey NOT IN
                  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2
            ORDER BY supplier_cnt DESC, p_brand, p_type
            LIMIT 20
        """,
        "tpch_q22_missing_customers": """
            WITH t AS (
                SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
                       / count(*) AS ab
                FROM customer WHERE c_acctbal > 0
            )
            SELECT c_nationkey,
                   count(*) AS numcust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
            FROM customer, t
            WHERE c_acctbal > ab
              AND NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= '1999-01-01')
            GROUP BY 1 ORDER BY 1
        """,
        "decontaminate_docs": f"""
            WITH sh AS (
                SELECT doc_id, unnest({_shingle_sql()}) AS s FROM documents
            ), bench AS (
                SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0
            )
            SELECT doc_id, count(DISTINCT sh.s) AS overlap
            FROM sh JOIN bench ON sh.s = bench.s
            WHERE doc_id % 50 <> 0
            GROUP BY doc_id
            HAVING count(DISTINCT sh.s) >= 3
            ORDER BY doc_id
        """,
        "sequence_packing": """
            WITH t AS (
                SELECT source, doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS tok
                FROM documents
            ), c AS (
                SELECT source, doc_id, tok,
                       COALESCE(SUM(tok) OVER (
                           PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                           AS prior
                FROM t
            )
            SELECT source, CAST(prior // 512 AS BIGINT) AS bin_id,
                   count(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS total_tokens
            FROM c GROUP BY 1, 2
            ORDER BY source, bin_id
        """,
        "tpch_q2_min_cost_supplier": """
            WITH pc AS (
                SELECT l_partkey, l_suppkey,
                       min(l_extendedprice / l_quantity) AS unit_cost
                FROM lineitem GROUP BY 1, 2
            )
            SELECT p_partkey, p_brand, s_name, unit_cost
            FROM pc
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            WHERE p_size >= 30
              AND unit_cost = (SELECT min(l_extendedprice / l_quantity)
                               FROM lineitem WHERE l_partkey = p_partkey)
            ORDER BY p_partkey, s_name
        """,
        "tpch_q17_small_quantity_revenue": """
            WITH lp AS (
                SELECT l_partkey, l_quantity, l_extendedprice
                FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_brand IN ('Brand#1', 'Brand#2'))
            ), a AS (
                SELECT l_partkey,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                       / count(*) AS avg_qty
                FROM lp GROUP BY 1
            )
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   / 7.0 AS avg_yearly,
                   count(*) AS n_rows
            FROM lp JOIN a USING (l_partkey)
            WHERE l_quantity < 0.2 * avg_qty
        """,
        "tpch_q21_waiting_suppliers": """
            WITH items AS (
                SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderstatus = 'F'
            ), late AS (
                SELECT * FROM items
                WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
            )
            SELECT s_name, count(*) AS numwait
            FROM late l1
            JOIN supplier ON l1.l_suppkey = s_suppkey
            WHERE EXISTS (SELECT 1 FROM items l2
                          WHERE l2.l_orderkey = l1.l_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (SELECT 1 FROM late l3
                              WHERE l3.l_orderkey = l1.l_orderkey
                                AND l3.l_suppkey <> l1.l_suppkey)
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 10
        """,
        "tpch_q19_discounted_revenue": """
            SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_rows
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#13' AND p_size BETWEEN 10 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#14' AND p_size BETWEEN 20 AND 40
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "tpch_q20_promotion_suppliers": """
            SELECT s_suppkey, s_name, s_acctbal
            FROM supplier
            WHERE s_suppkey IN (
                SELECT l_suppkey FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_name LIKE '%red%')
                  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
                GROUP BY l_suppkey
                HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                       > 200
            )
            ORDER BY s_name
        """,
        "tpch_q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   EXTRACT(year FROM l_shipdate) AS l_year,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "tpch_q8_market_share": """
            WITH j AS (
                SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                       l_extendedprice * (1 - l_discount) AS vol,
                       ns.n_name AS supp_nation
                FROM lineitem
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation nc ON c_nationkey = nc.n_nationkey
                JOIN region   ON nc.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ns ON s_nationkey = ns.n_nationkey
                WHERE r_name = 'ASIA'
                  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
            )
            SELECT o_year,
                   CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_2'
                                      THEN vol ELSE 0.0 END
                                 AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(SUM(CAST(vol AS DECIMAL(18,6))) AS DOUBLE)
                       AS mkt_share,
                   count(*) AS n_rows
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "tpch_q9_product_profit": """
            SELECT n_name AS nation,
                   EXTRACT(year FROM o_orderdate) AS o_year,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 - p_retailprice * 0.1 * l_quantity
                                 AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%red%'
            GROUP BY 1, 2 ORDER BY nation, o_year DESC
        """,
        "tpch_q11_important_stock": """
            WITH pv AS (
                SELECT l_partkey,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
                            AS DOUBLE) AS part_value
                FROM lineitem
                WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                    JOIN nation ON s_nationkey = n_nationkey
                                    WHERE n_name = 'NATION_3')
                GROUP BY 1
            ), t AS (
                SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,6))) AS DOUBLE)
                       * 2.0 / count(*) AS threshold
                FROM pv
            )
            SELECT l_partkey, part_value
            FROM pv, t WHERE part_value > threshold
            ORDER BY part_value DESC, l_partkey
        """,
        "tpch_q12_priority_shipping": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
              AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        "tpch_q15_top_supplier": """
            WITH revenue AS (
                SELECT l_suppkey,
                       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                     AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
                FROM lineitem
                WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
                GROUP BY 1
            )
            SELECT s_suppkey, s_name, total_rev
            FROM revenue JOIN supplier ON l_suppkey = s_suppkey
            WHERE total_rev = (SELECT max(total_rev) FROM revenue)
            ORDER BY s_suppkey
        """,
        "winnow_fingerprint_dups": f"""
            WITH d0 AS (
                SELECT doc_id, {_NORM} AS norm FROM documents
            ), h AS (
                SELECT doc_id,
                       list_transform(
                           generate_series(1, greatest(length(norm) - 23, 1)),
                           i -> CAST(CAST('0x' || substr(md5(substr(norm, i, 24)), 1, 12)
                                          AS UBIGINT) AS BIGINT)) AS hs
                FROM d0
            ), m AS (
                SELECT doc_id,
                       CASE WHEN len(hs) >= 12
                            THEN list_transform(generate_series(1, len(hs) - 11),
                                                i -> list_min(hs[i:i+11]))
                            ELSE [list_min(hs)] END AS mins
                FROM h
            ), fp1 AS (
                SELECT DISTINCT doc_id, unnest(list_distinct(mins)) AS f FROM m
            ), keep AS (
                SELECT f FROM fp1 GROUP BY f HAVING count(*) <= 10
            ), fp AS (
                SELECT fp1.* FROM fp1 JOIN keep USING (f)
            )
            SELECT l.doc_id AS id_a, r.doc_id AS id_b,
                   count(*) AS shared_fps
            FROM fp l JOIN fp r ON l.f = r.f AND l.doc_id < r.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 3
            ORDER BY id_a, id_b
        """,
        "gopher_quality_filter": f"""
            WITH f AS (
                SELECT source,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_sym,
                       length(text) AS n_chars,
                       len(list_intersect(
                           list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                          t -> lower(t)),
                           {_STOPWORDS_SQL})) AS sw_hits
                FROM documents
            ), r AS (
                SELECT source,
                       (n_tok >= 20 AND n_tok <= 1000) AS ok_w,
                       (n_alpha / greatest(n_tok, 1) >= 3.0
                        AND n_alpha / greatest(n_tok, 1) <= 10.0) AS ok_m,
                       (n_sym / greatest(n_chars, 1) <= 0.1) AS ok_s,
                       (sw_hits >= 2) AS ok_st
                FROM f
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN ok_w THEN 1 ELSE 0 END) AS BIGINT) AS ok_words,
                   CAST(sum(CASE WHEN ok_m THEN 1 ELSE 0 END) AS BIGINT) AS ok_mean_word_len,
                   CAST(sum(CASE WHEN ok_s THEN 1 ELSE 0 END) AS BIGINT) AS ok_symbol_ratio,
                   CAST(sum(CASE WHEN ok_st THEN 1 ELSE 0 END) AS BIGINT) AS ok_stopwords,
                   CAST(sum(CASE WHEN ok_w AND ok_m AND ok_s AND ok_st
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
            FROM r GROUP BY source ORDER BY source
        """,
        "doc_chunks": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
            ), nc AS (
                SELECT doc_id, t,
                       greatest((len(t) - 4 + 11) // 12, 1) AS n_chunks
                FROM toks
            ), c AS (
                SELECT doc_id, t,
                       unnest(generate_series(0, n_chunks - 1)) AS chunk_id
                FROM nc
            )
            SELECT doc_id, chunk_id,
                   md5(array_to_string(t[chunk_id*12 + 1 : chunk_id*12 + 16], ' ')) AS chunk_md5,
                   len(t[chunk_id*12 + 1 : chunk_id*12 + 16]) AS chunk_n_tokens
            FROM c ORDER BY doc_id, chunk_id
        """,
        "percentile_stats": """
            SELECT l_returnflag, count(*) AS n,
                   round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
                   round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
                   round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
                   round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "nexmark_q6_avg_last10": """
            WITH p AS (
                SELECT user_id, ts, event_id, value FROM events
                WHERE event_type = 'purchase'
            ), f AS (
                SELECT user_id,
                       sum(CAST(value AS DECIMAL(18,6))) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS s10,
                       count(*) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS c10,
                       row_number() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM p
            )
            SELECT user_id AS seller,
                   round(CAST(s10 AS DOUBLE) / c10, 6) AS avg_last10,
                   c10 AS n_considered
            FROM f WHERE rn = 1 ORDER BY seller
        """,
        "fuzzy_match_parts": """
            WITH probes AS (
                SELECT substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
                       || substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2)
                           AS probe
                FROM part WHERE p_partkey % 20 = 0
            )
            SELECT DISTINCT probe, p_name
            FROM probes, part
            WHERE levenshtein(probe, p_name) <= 1
            ORDER BY probe, p_name
        """,
        "dup_span_stats_docs": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
            ), g AS (
                SELECT doc_id,
                       CASE WHEN len(t) >= 8 THEN
                           list_transform(generate_series(1, len(t) - 7),
                               i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 12))
                       ELSE [substr(md5(array_to_string(t, ' ')), 1, 12)]
                       END AS hs
                FROM toks
            ), s AS (
                SELECT doc_id, unnest(list_distinct(hs)) AS h FROM g
            ), f AS (
                SELECT h, count(*) AS df FROM s GROUP BY h
            )
            SELECT doc_id, count(*) AS n_spans,
                   CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_spans,
                   round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
                         / count(*), 6) AS dup_fraction
            FROM s JOIN f USING (h)
            GROUP BY doc_id ORDER BY doc_id
        """,
        "salted_aggregate_orders": """
            SELECT l_returnflag, count(*) AS cnt,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "unigram_lm_quality": f"""
            WITH toks AS (
                SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS term
                FROM documents
            ), t AS (
                SELECT * FROM toks WHERE term <> ''
            ), vocab AS (
                SELECT term, count(*) AS c FROM t GROUP BY term
            ), tot AS (
                SELECT sum(c) AS n_total FROM vocab
            ), probs AS (
                SELECT term, (c + 0.0) / (n_total + 0.0) AS p FROM vocab, tot
            ), scored AS (
                SELECT doc_id, CAST(-ln(p) AS DECIMAL(18,12)) AS nll
                FROM t JOIN probs USING (term)
            )
            SELECT doc_id, count(*) AS n_tokens,
                   round(CAST(sum(nll) AS DOUBLE) / count(*), 6) AS mean_nll
            FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        "url_dedup_stats": r"""
            WITH planted AS (
                SELECT doc_id,
                       (CASE WHEN doc_id % 2 = 0 THEN 'https://www.'
                             ELSE 'http://' END)
                       || 'site' || CAST(doc_id % 7 AS VARCHAR)
                       || '.com/page/' || CAST(doc_id % 25 AS VARCHAR)
                       || (CASE WHEN doc_id % 2 = 0 THEN '/?utm_source=feed&q='
                                ELSE '?q=' END)
                       || CAST(doc_id % 3 AS VARCHAR)
                       || (CASE WHEN doc_id % 4 = 0 THEN '#section'
                                ELSE '' END) AS url
                FROM documents
            ), canon AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(
                           lower(trim(url)),
                           '^https?://', ''),
                           '^www\.', ''),
                           '#.*$', ''),
                           '([?&])(utm_[a-z]+|fbclid|gclid|ref|source)=[^&#]*',
                           '\1', 'g'),
                           '\?&+', '?'),
                           '&&+', '&', 'g'),
                           '[?&]$', ''),
                           '/\?', '?'),
                           '/$', ''),
                           '^$', '') AS curl
                FROM planted
            )
            SELECT curl, min(doc_id) AS keep_id, count(*) AS n_variants
            FROM canon GROUP BY curl ORDER BY curl
        """,
        "heavy_hitter_terms": f"""
            WITH w AS (
                SELECT lang, unnest(string_split({_NORM}, ' ')) AS term
                FROM documents
            ), f AS (
                SELECT lang, term, count(*) AS n FROM w
                WHERE term <> '' GROUP BY 1, 2
            ), r AS (
                SELECT lang, term, n,
                       CAST(row_number() OVER (
                           PARTITION BY lang ORDER BY n DESC, term ASC) AS INT) AS rank
                FROM f
            )
            SELECT lang, term, n, rank FROM r WHERE rank <= 10
            ORDER BY lang, rank
        """,
        "repetition_top_ngram": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
            ), g AS (
                SELECT doc_id, len(t) AS wc,
                       unnest(list_transform(generate_series(1, len(t) - 1),
                                             i -> t[i] || ' ' || t[i+1])) AS gram
                FROM toks WHERE len(t) >= 2
            ), c AS (
                SELECT doc_id, wc, gram, count(*) AS n FROM g GROUP BY 1, 2, 3
            ), r AS (
                SELECT doc_id, wc, gram, n,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY n DESC, gram ASC) AS rk
                FROM c
            )
            SELECT doc_id, gram AS top_gram, n AS top_count,
                   n * 2 / wc AS coverage
            FROM r WHERE rk = 1 ORDER BY doc_id
        """,
        "incremental_minhash_dedup": f"""
            WITH base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([{band_entries}]) AS bucket,
                       unnest(generate_series(0, {MINHASH_BANDS - 1})) AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS index_id, r.id AS new_id,
                       l.sh AS sh_i, r.sh AS sh_n
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket
                WHERE l.id % 2 = 0 AND r.id % 2 = 1
            )
            SELECT index_id, new_id,
                   round(len(list_intersect(sh_i, sh_n))
                         / CAST(len(list_distinct(list_concat(sh_i, sh_n))) AS DOUBLE), 6)
                       AS jaccard_sim
            FROM cands
            WHERE round(len(list_intersect(sh_i, sh_n))
                        / CAST(len(list_distinct(list_concat(sh_i, sh_n))) AS DOUBLE), 6)
                  >= {LSH_THRESHOLD}
            ORDER BY index_id, new_id
        """,
        "table_profile": """
            SELECT * FROM (
                SELECT 'doc_id' AS col_name, count(*) AS n_rows,
                       count(*) - count(doc_id) AS n_nulls,
                       count(DISTINCT doc_id) AS n_distinct,
                       CAST(min(doc_id) AS VARCHAR) AS min_value,
                       CAST(max(doc_id) AS VARCHAR) AS max_value
                FROM documents
                UNION ALL
                SELECT 'lang', count(*), count(*) - count(lang),
                       count(DISTINCT lang),
                       CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
                FROM documents
                UNION ALL
                SELECT 'source', count(*), count(*) - count(source),
                       count(DISTINCT source),
                       CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
                FROM documents
                UNION ALL
                SELECT 'n_chars', count(*), count(*) - count(n_chars),
                       count(DISTINCT n_chars),
                       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
                FROM documents
            ) ORDER BY col_name
        """,
        "user_sessions": """
            WITH g AS (
                SELECT user_id, event_id, ts,
                       CAST(floor(epoch(ts)) AS BIGINT)
                         - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                           AS gap_s
                FROM events
            ), f AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN gap_s IS NULL OR gap_s > 1800
                            THEN 1 ELSE 0 END AS new_s
                FROM g
            ), s AS (
                SELECT user_id,
                       CAST(SUM(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
                FROM f
            )
            SELECT user_id, session_id, count(*) AS n_events
            FROM s GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "asof_join_tolerance": f"""
            WITH p AS (
                SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'purchase'
            ), c AS (
                SELECT user_id, ts, max(value) AS value FROM events
                WHERE event_type = 'click' GROUP BY user_id, ts
            )
            SELECT p.event_id, p.user_id,
                   p.value AS purchase_value,
                   CASE WHEN c.ts IS NOT NULL
                             AND CAST(floor(epoch(p.ts - c.ts)) AS BIGINT)
                                 <= {ASOF_TOLERANCE_S}
                        THEN c.value END AS recent_click_value
            FROM p ASOF LEFT JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY p.event_id
        """,
        "sliding_distinct_users": """
            WITH e AS (
                SELECT event_type, user_id,
                       CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS frame
                FROM events
            ), x AS (
                SELECT event_type, user_id, (frame + off - 1) * 3600 AS ws
                FROM e, unnest(generate_series(0, 1)) AS t(off)
            )
            SELECT event_type, ws AS window_start_epoch,
                   count(DISTINCT user_id) AS n_users
            FROM x GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "dq_checks_orders": """
            SELECT
                (SELECT count(*) FROM orders
                 WHERE o_custkey IS NULL
                    OR o_custkey NOT IN (SELECT c_custkey FROM customer
                                         WHERE c_custkey IS NOT NULL))
                    AS n_orphans,
                -- DuckDB SUM(BIGINT) yields HUGEINT; cast back so the typed
                -- driver hash agrees with Spark's BIGINT (r4 red-row fix)
                (SELECT CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) FROM (
                    SELECT count(*) AS n FROM orders
                    GROUP BY o_orderkey HAVING count(*) > 1))
                    AS n_dup_rows,
                (SELECT count(*) - count(o_custkey) FROM orders)
                    AS nulls_o_custkey,
                (SELECT count(*) - count(o_totalprice) FROM orders)
                    AS nulls_o_totalprice
        """,
        "cut_dup_spans_docs": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents
            ), g AS (
                SELECT doc_id, t,
                       CASE WHEN len(t) >= 8 THEN
                           list_transform(generate_series(1, len(t) - 7),
                               i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 12))
                       ELSE CAST([] AS VARCHAR[])
                       END AS hs
                FROM toks
            ), s AS (
                SELECT doc_id, unnest(list_distinct(hs)) AS h FROM g
            ), f AS (
                SELECT h, count(*) AS df FROM s GROUP BY h
            ), d AS (
                SELECT doc_id, list(h) AS dup_hs
                FROM (SELECT s.doc_id, s.h FROM s JOIN f USING (h)
                      WHERE df > 1)
                GROUP BY doc_id
            ), m AS (
                SELECT g.doc_id, g.t,
                       list_transform(g.hs,
                           h -> list_contains(COALESCE(d.dup_hs,
                                                       CAST([] AS VARCHAR[])), h))
                           AS flags,
                       len(g.hs) AS W
                FROM g LEFT JOIN d USING (doc_id)
            ), kept AS (
                SELECT doc_id, t,
                       list_filter(generate_series(1, len(t)),
                           j -> len(list_filter(
                                    flags[greatest(j - 7, 1):least(j, W)],
                                    fl -> fl)) = 0) AS kidx
                FROM m
            )
            SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
                   CAST(len(kidx) AS INT) AS n_kept,
                   -- array_to_string([]) is NULL in DuckDB; a fully-cut doc
                   -- must fingerprint the empty string like Spark concat_ws
                   md5(COALESCE(
                       array_to_string(list_transform(kidx, j -> t[j]), ' '),
                       '')) AS clean_fp
            FROM kept ORDER BY doc_id
        """,
        "streaming_quality_gate": f"""
            WITH f AS (
                SELECT lang,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tok,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_sym,
                       length(text) AS n_chars,
                       len(list_intersect(
                           list_transform(regexp_split_to_array(trim(text), '\\s+'),
                                          t -> lower(t)),
                           {_STOPWORDS_SQL})) AS sw_hits
                FROM documents
            ), r AS (
                SELECT lang,
                       (n_tok >= 20 AND n_tok <= 1000
                        AND n_alpha / greatest(n_tok, 1) >= 3.0
                        AND n_alpha / greatest(n_tok, 1) <= 10.0
                        AND n_sym / greatest(n_chars, 1) <= 0.1
                        AND sw_hits >= 2) AS ok
                FROM f
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
            FROM r GROUP BY lang ORDER BY lang
        """,
        "embedding_outlier_stats": f"""
            WITH d AS (
                SELECT [{", ".join(_l2_sql("embedding", c) for c in _ivf_centroids())}]
                           AS dists
                FROM embeddings
            ), a AS (
                SELECT CAST(list_position(dists, list_min(dists)) - 1 AS INT)
                           AS cluster,
                       list_min(dists) AS dist
                FROM d
            )
            SELECT cluster, count(*) AS n_vectors,
                   round(CAST(SUM(CAST(dist AS DECIMAL(28,9))) AS DOUBLE)
                         / count(*), 6) AS mean_dist,
                   max(dist) AS max_dist,
                   CAST(SUM(CASE WHEN dist > {OUTLIER_DIST} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_outliers
            FROM a GROUP BY 1 ORDER BY 1
        """,
        "dedup_keep_best": f"""
            WITH RECURSIVE base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sizes AS (
                SELECT id, len(sh) AS n FROM base
            ), inv AS (
                SELECT id, unnest(sh) AS s FROM base
            ), common AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
                FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
                GROUP BY a.id, b.id
            ), pairs AS (
                SELECT id_a, id_b
                FROM common
                JOIN sizes sa ON sa.id = id_a
                JOIN sizes sb ON sb.id = id_b
                WHERE round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6)
                      >= {LSH_THRESHOLD}
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach AS (
                SELECT src AS node, src AS r FROM edges
                UNION
                SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
            ), grp AS (
                SELECT node, min(r) AS group_id FROM reach GROUP BY node
            ), tf AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents
            ), feat AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS n_tokens,
                       len(list_filter(toks, t -> list_contains({_STOPWORDS_SQL}, lower(t))))
                           / CAST(len(toks) AS DOUBLE) AS sw_ratio,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(text) AS n_chars
                FROM tf
            ), scored AS (
                SELECT doc_id,
                       round(
                         least(n_alpha / greatest(n_tokens, 1) / 8.0, 1.0)
                         + n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE)
                         + least(sw_ratio * 10.0, 1.0), 6) AS q
                FROM feat
            ), m AS (
                SELECT g.group_id, g.node, s.q,
                       row_number() OVER (PARTITION BY g.group_id
                                          ORDER BY s.q DESC, g.node) AS rn,
                       count(*) OVER (PARTITION BY g.group_id) AS group_size
                FROM grp g JOIN scored s ON s.doc_id = g.node
            )
            SELECT group_id, node AS keep_id, q AS keep_score, group_size
            FROM m WHERE rn = 1 ORDER BY group_id
        """,
        "quality_decile_stats": f"""
            WITH base AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents
            ), feat AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END AS n_tokens,
                       len(list_filter(toks, t -> list_contains({_STOPWORDS_SQL}, lower(t))))
                           / CAST(len(toks) AS DOUBLE) AS sw_ratio,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                       length(text) AS n_chars
                FROM base
            ), scored AS (
                SELECT doc_id,
                       round(
                         least(n_alpha / greatest(n_tokens, 1) / 8.0, 1.0)
                         + n_alpha / CAST(greatest(n_chars, 1) AS DOUBLE)
                         + least(sw_ratio * 10.0, 1.0), 6) AS q
                FROM feat
            ), binned AS (
                SELECT doc_id, q,
                       CAST(ntile({QUALITY_BINS}) OVER (ORDER BY q, doc_id)
                            AS INT) AS decile
                FROM scored
            )
            SELECT decile, count(*) AS n_docs,
                   min(q) AS min_q, max(q) AS max_q
            FROM binned GROUP BY 1 ORDER BY 1
        """,
        "funnel_conversion_counts": f"""
            WITH s0 AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1
            ), s1 AS (
                SELECT e.user_id, min(e.ts) AS t1
                FROM events e JOIN s0 USING (user_id)
                WHERE e.event_type = '{FUNNEL_STAGES[1]}' AND e.ts > s0.t0
                GROUP BY 1
            ), s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = '{FUNNEL_STAGES[2]}' AND e.ts > s1.t1
                GROUP BY 1
            )
            SELECT * FROM (VALUES
                (CAST(1 AS INT), '{FUNNEL_STAGES[0]}',
                 (SELECT count(*) FROM s0)),
                (CAST(2 AS INT), '{FUNNEL_STAGES[1]}',
                 (SELECT count(*) FROM s1)),
                (CAST(3 AS INT), '{FUNNEL_STAGES[2]}',
                 (SELECT count(*) FROM s2))
            ) AS t(stage, event_type, n_keys)
            ORDER BY stage
        """,
        "dsir_importance_weights": f"""
            WITH toks AS (
                SELECT doc_id, (lang = 'en') AS is_t,
                       string_split({_NORM}, ' ') AS t
                FROM documents
            ), g AS (
                SELECT doc_id, is_t,
                       unnest(list_transform(generate_series(1, len(t) - 1),
                                             i -> t[i] || ' ' || t[i+1])) AS gram
                FROM toks WHERE len(t) >= 2
            ), pairs AS (
                SELECT doc_id, is_t,
                       substr(md5(gram), 1, {DSIR_BUCKET_HEX}) AS bucket
                FROM g
            ), counts AS (
                SELECT bucket,
                       CAST(count(*) AS BIGINT) AS c_raw,
                       CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT)
                           AS c_tgt
                FROM pairs GROUP BY 1
            ), lr AS (
                SELECT bucket,
                       (ln(c_tgt + 1)
                        - ln((SELECT SUM(c_tgt) FROM counts)
                             + {16 ** DSIR_BUCKET_HEX}))
                     - (ln(c_raw + 1)
                        - ln((SELECT SUM(c_raw) FROM counts)
                             + {16 ** DSIR_BUCKET_HEX})) AS lr
                FROM counts
            )
            SELECT p.doc_id, count(*) AS n_grams,
                   CAST(SUM(CAST(lr AS DECIMAL(28,12))) AS DOUBLE) AS weight
            FROM pairs p JOIN lr USING (bucket)
            GROUP BY 1 ORDER BY 1
        """,
        "kmeans_assign_counts": f"""
            WITH d AS (
                SELECT [{", ".join(_l2_sql("embedding", c) for c in _ivf_centroids())}]
                           AS dists
                FROM embeddings
            )
            SELECT CAST(list_position(dists, list_min(dists)) - 1 AS INT)
                       AS cluster,
                   count(*) AS n_vectors
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "sliding_agg_incremental": """
            WITH e AS (
                SELECT event_type, value,
                       CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT) AS frame
                FROM events
            ), x AS (
                SELECT event_type, value, (frame + off - 1) * 3600 AS ws
                FROM e, unnest(generate_series(0, 1)) AS t(off)
            )
            SELECT event_type, ws AS window_start_epoch,
                   count(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM x GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "value_histogram": f"""
            SELECT bin,
                   CAST({HIST_LO} AS DOUBLE)
                       + bin * CAST({(HIST_HI - HIST_LO) / HIST_BINS} AS DOUBLE) AS bin_lo,
                   CAST({HIST_LO} AS DOUBLE)
                       + (bin + 1) * CAST({(HIST_HI - HIST_LO) / HIST_BINS} AS DOUBLE) AS bin_hi,
                   n
            FROM (
                SELECT CAST(least(floor((CAST(value AS DOUBLE) - {HIST_LO})
                                        / {(HIST_HI - HIST_LO) / HIST_BINS}),
                                  {HIST_BINS - 1}) AS INT) AS bin,
                       count(*) AS n
                FROM events
                WHERE value IS NOT NULL AND value >= {HIST_LO} AND value <= {HIST_HI}
                GROUP BY 1
            ) ORDER BY bin
        """,
        "source_quota_sample": f"""
            SELECT source, doc_id FROM (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5('quota0' || CAST(doc_id AS VARCHAR)),
                                    doc_id) AS rn
                FROM documents
            ) WHERE rn <= {QUOTA_N}
            ORDER BY source, doc_id
        """,
        "train_test_split_counts": f"""
            WITH s AS (
                SELECT lang,
                       CASE WHEN substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 6)
                                 < '{_split_hex(0.8)}' THEN 'train'
                            WHEN substr(md5('split0' || CAST(doc_id AS VARCHAR)), 1, 6)
                                 < '{_split_hex(0.9)}' THEN 'val'
                            ELSE 'test' END AS split
                FROM documents
            )
            SELECT split, lang, count(*) AS n_docs
            FROM s GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "record_linkage_parts": f"""
            WITH base AS (
                SELECT p_partkey, p_name, p_type, p_brand,
                       string_split(p_name, ' ')[1] AS p_first
                FROM part
            ), l0 AS (
                SELECT * FROM base WHERE p_partkey % 2 = 0
            ), r0 AS (
                SELECT * FROM base WHERE p_partkey % 2 = 1
            ), lok AS (
                SELECT p_brand, p_first FROM l0
                GROUP BY 1, 2 HAVING count(*) <= 10000
            ), rok AS (
                SELECT p_brand, p_first FROM r0
                GROUP BY 1, 2 HAVING count(*) <= 10000
            ), l AS (
                SELECT l0.* FROM l0 JOIN lok USING (p_brand, p_first)
            ), r AS (
                SELECT r0.* FROM r0 JOIN rok USING (p_brand, p_first)
            ), pairs AS (
                SELECT round(
                    (CAST('{RL_W_NAME!r}' AS DOUBLE)
                       * {_lev_sim_sql('l.p_name', 'r.p_name')}
                     + CAST('{RL_W_TYPE!r}' AS DOUBLE)
                       * {_lev_sim_sql('l.p_type', 'r.p_type')})
                    / CAST('{RL_W_NAME + RL_W_TYPE!r}' AS DOUBLE), 6)
                    AS score
                FROM l JOIN r
                  ON l.p_brand = r.p_brand AND l.p_first = r.p_first
            )
            SELECT CAST(floor(score * 10) AS INTEGER) AS score_band,
                   count(*) AS n_pairs,
                   CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                       AS score_sum
            FROM pairs WHERE score >= {RL_THRESHOLD}
            GROUP BY 1 ORDER BY 1
        """,
        "kfold_split_counts": f"""
            WITH s AS (
                SELECT {_kfold_case_sql('doc_id', KFOLD_K, 'fold0')} AS fold,
                       doc_id, n_chars
                FROM documents
            )
            SELECT fold, count(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars_sum
            FROM s GROUP BY fold ORDER BY fold
        """,
        "bloom_semi_join_orders": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey
        """,
        "semantic_dedup_docs": f"""
            WITH d AS (
                SELECT vec_id, embedding,
                       [{", ".join(
                           f"round(1.0 - {_cos_raw_sql('embedding', str(c))}, 9)"
                           for c in _ivf_centroids()
                       )}] AS dists
                FROM embeddings
            ), corpus AS (
                SELECT vec_id, embedding,
                       CAST(list_position(dists, list_min(dists)) AS INT)
                           AS centroid_id
                FROM d
            )
            SELECT a.centroid_id, a.vec_id AS id_a, b.vec_id AS id_b,
                   {_cos_sql("a.embedding", "b.embedding")} AS cos_sim
            FROM corpus a JOIN corpus b
              ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
            WHERE {_cos_sql("a.embedding", "b.embedding")} >= {SEMDEDUP_THRESHOLD}
            ORDER BY id_a, id_b
        """,
        "event_time_features": """
            WITH e AS (
                SELECT event_id, user_id, ts, value,
                       CAST(floor(epoch(ts)) AS BIGINT) AS es
                FROM events
            )
            SELECT event_id, user_id,
                   CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq,
                   lag(value, 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
                   es - lag(es, 1) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_seconds,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
                       AS rolling_sum_5,
                   min(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rolling_min_5,
                   max(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rolling_max_5
            FROM e
            ORDER BY user_id, seq
        """,
        "weighted_sample_counts": f"""
            WITH s AS (
                SELECT source, n_chars,
                       greatest(0.0, least(1.0,
                           ((n_chars % 7 + 1) / 4.0) * {WSAMPLE_RATE})) AS p,
                       substr(md5('w0' || CAST(doc_id AS VARCHAR)), 1, 6) AS u
                FROM documents
            )
            SELECT source,
                   count(*) AS n_kept,
                   CAST(sum(n_chars) AS BIGINT) AS chars_kept
            FROM s
            WHERE p >= 1.0
               OR u < lpad(lower(to_hex(
                       CAST(floor(p * 16777216.0) AS BIGINT))), 6, '0')
            GROUP BY source ORDER BY source
        """,
        "mad_outlier_stats": """
            WITH med AS (
                SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
                FROM events GROUP BY event_type
            ), mad AS (
                SELECT e.event_type,
                       round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
                FROM events e JOIN med m USING (event_type)
                GROUP BY e.event_type
            )
            SELECT e.event_type, count(*) AS n, m.med AS med, d.mad AS mad,
                   CAST(sum(CASE WHEN abs(e.value - m.med) > 3.0 * d.mad
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM events e
            JOIN med m USING (event_type)
            JOIN mad d USING (event_type)
            GROUP BY e.event_type, m.med, d.mad
            ORDER BY e.event_type
        """,
        "containment_dup_pairs": f"""
            WITH base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sizes AS (
                SELECT id, len(sh) AS n FROM base
            ), inv AS (
                SELECT id, unnest(sh) AS s FROM base
            ), common AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
                FROM inv a JOIN inv b ON a.s = b.s AND a.id < b.id
                GROUP BY a.id, b.id
            )
            SELECT id_a, id_b,
                   round(common / CAST(least(sa.n, sb.n) AS DOUBLE), 6)
                       AS containment
            FROM common
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE round(common / CAST(least(sa.n, sb.n) AS DOUBLE), 6)
                  >= {CONTAIN_THRESHOLD}
        """,
        "pca_projection_stats": (lambda m, w1, w2, cs: f"""
            WITH p AS (
                SELECT label,
                       round(list_sum(list_transform(
                           list_zip(embedding, {w1}),
                           x -> CAST(x[1] AS DOUBLE) * x[2])) - ({cs[0]!r}), 9)
                           AS pc1,
                       round(list_sum(list_transform(
                           list_zip(embedding, {w2}),
                           x -> CAST(x[1] AS DOUBLE) * x[2])) - ({cs[1]!r}), 9)
                           AS pc2
                FROM embeddings
            )
            SELECT label, count(*) AS n,
                   CAST(SUM(CAST(pc1 AS DECIMAL(28,12))) AS DOUBLE) AS sum_pc1,
                   CAST(SUM(CAST(pc2 AS DECIMAL(28,12))) AS DOUBLE) AS sum_pc2,
                   min(pc1) AS min_pc1, max(pc2) AS max_pc2
            FROM p GROUP BY label ORDER BY label
        """)(*_pca_fixed_axes()),
        "char_entropy_quality": """
            WITH ch AS (
                SELECT doc_id,
                       CAST(length(text) AS INTEGER) AS n_chars,
                       list_transform(
                           list_distinct(string_split(text, '')),
                           c -> len(list_filter(string_split(text, ''),
                                                x -> x = c))) AS counts
                FROM documents
            )
            SELECT doc_id, n_chars,
                   CASE WHEN n_chars = 0 THEN 0.0 ELSE
                       round(CAST(list_sum(list_transform(counts,
                           cnt -> CAST(-(cnt / CAST(n_chars AS DOUBLE))
                                       * ln(cnt / CAST(n_chars AS DOUBLE))
                                   AS DECIMAL(18,12))))
                           AS DOUBLE) / 0.6931471805599453, 6)
                   END AS h_bits
            FROM ch ORDER BY doc_id
        """,
        "quality_classifier_scores": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(t) - 1),
                                             i -> t[i] || ' ' || t[i+1])) AS gram
                FROM toks WHERE len(t) >= 2
            ), pairs AS (
                SELECT doc_id, substr(md5(gram), 1, {DSIR_BUCKET_HEX}) AS b
                FROM g
            )
            SELECT doc_id, count(*) AS n_grams,
                   CAST(SUM(CAST(
                       ((ascii(substr(b, 1, 1))
                         + 3 * ascii(substr(b, 2, 1))
                         + 7 * ascii(substr(b, 3, 1))) % 13 - 6) / 8.0
                       AS DECIMAL(28,12))) AS DOUBLE) + ({CLS_BIAS}) AS score
            FROM pairs GROUP BY doc_id ORDER BY doc_id
        """,
        "bigram_lm_quality": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(t) - 1),
                                             i -> t[i] || ' ' || t[i+1])) AS gram
                FROM toks WHERE len(t) >= 2
            ), uni AS (
                SELECT w, CAST(count(*) AS BIGINT) AS c_u
                FROM (SELECT unnest(t) AS w FROM toks)
                WHERE w <> '' GROUP BY w
            ), tot AS (
                SELECT SUM(c_u) AS n_total FROM uni
            ), bg AS (
                SELECT gram, CAST(count(*) AS BIGINT) AS c_bg,
                       split_part(gram, ' ', 1) AS w1,
                       split_part(gram, ' ', 2) AS w2
                FROM g GROUP BY gram
            ), ctx AS (
                SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_ctx
                FROM bg GROUP BY w1
            ), probs AS (
                SELECT gram,
                       CAST(-ln({BIGRAM_LAM} * (c_bg / CAST(c_ctx AS DOUBLE))
                                + {1.0 - BIGRAM_LAM}
                                  * (c_u / CAST(n_total AS DOUBLE)))
                            AS DECIMAL(18,12)) AS nll
                FROM bg
                JOIN ctx USING (w1)
                JOIN uni ON uni.w = bg.w2
                CROSS JOIN tot
            )
            SELECT g.doc_id, count(*) AS n_bigrams,
                   round(CAST(SUM(nll) AS DOUBLE) / count(*), 6) AS mean_nll
            FROM g JOIN probs USING (gram)
            GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        "ks_drift_events": """
            WITH t AS (
                SELECT event_type, value AS x,
                       CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src
                FROM events WHERE value IS NOT NULL
            ), s AS (
                SELECT event_type,
                       SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY event_type) AS n_ref,
                       SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY event_type) AS n_cur,
                       SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY event_type ORDER BY x
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS c_ref,
                       SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END)
                           OVER (PARTITION BY event_type ORDER BY x
                                 RANGE BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS c_cur
                FROM t
            )
            SELECT event_type,
                   CAST(n_ref AS BIGINT) AS n_ref,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   round(max(abs(c_ref / CAST(n_ref AS DOUBLE)
                                 - c_cur / CAST(n_cur AS DOUBLE))), 6)
                       AS ks_stat
            FROM s WHERE n_ref > 0 AND n_cur > 0
            GROUP BY event_type, n_ref, n_cur
            ORDER BY event_type
        """,
        "tokenize_ids_stats": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t
                FROM documents
            ), pos AS (
                SELECT doc_id, s.pos AS pos, s.term AS term FROM (
                    SELECT doc_id,
                           unnest(list_transform(
                               generate_series(1, len(t)),
                               i -> struct_pack(pos := i, term := t[i]))) AS s
                    FROM toks)
                WHERE s.term <> ''
            ), vocab AS (
                SELECT term, tid FROM (
                    SELECT term,
                           CAST(row_number() OVER (
                               ORDER BY count(*) DESC, term) AS INTEGER) AS tid
                    FROM pos GROUP BY term
                ) WHERE tid <= {VOCAB_SIZE}
            ), ids AS (
                SELECT p.doc_id, p.pos,
                       COALESCE(v.tid, 0) AS tid,
                       CASE WHEN v.tid IS NULL THEN 1 ELSE 0 END AS unk
                FROM pos p LEFT JOIN vocab v USING (term)
            )
            SELECT doc_id, count(*) AS n_tokens,
                   CAST(SUM(unk) AS BIGINT) AS n_unk,
                   md5(string_agg(CAST(tid AS VARCHAR), ' ' ORDER BY pos))
                       AS ids_fp
            FROM ids GROUP BY doc_id ORDER BY doc_id
        """,
        "psi_drift_events": f"""
            WITH t AS (
                SELECT event_type,
                       CAST(greatest(least(
                           floor((CAST(value AS DOUBLE) - {PSI_LO})
                                 / {(PSI_HI - PSI_LO) / PSI_BINS}),
                           {PSI_BINS - 1}), 0) AS INTEGER) AS b,
                       CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src
                FROM events WHERE value IS NOT NULL
            ), per_bin AS (
                SELECT event_type, b,
                       CAST(SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS c_ref,
                       CAST(SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS c_cur
                FROM t GROUP BY 1, 2
            ), tot AS (
                SELECT event_type,
                       CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                       CAST(SUM(c_cur) AS BIGINT) AS n_cur
                FROM per_bin GROUP BY 1
            )
            SELECT p.event_type, n_ref, n_cur,
                   round(CAST(SUM(CAST(
                       ((c_ref + 0.5) / (n_ref + {0.5 * PSI_BINS})
                        - (c_cur + 0.5) / (n_cur + {0.5 * PSI_BINS}))
                       * ln(((c_ref + 0.5) / (n_ref + {0.5 * PSI_BINS}))
                            / ((c_cur + 0.5) / (n_cur + {0.5 * PSI_BINS})))
                       AS DECIMAL(18,12))) AS DOUBLE), 6) AS psi
            FROM per_bin p JOIN tot USING (event_type)
            WHERE n_ref > 0 AND n_cur > 0
            GROUP BY p.event_type, n_ref, n_cur
            ORDER BY p.event_type
        """,
        "categorical_drift_events": """
            WITH t AS (
                SELECT CAST(greatest(least(
                           floor(CAST(value AS DOUBLE) / 16), 3), 0)
                           AS INTEGER) AS value_band,
                       event_type,
                       CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src
                FROM events
                WHERE value IS NOT NULL AND event_type IS NOT NULL
            ), per_cat AS (
                SELECT value_band, event_type,
                       CAST(SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS c_ref,
                       CAST(SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS c_cur
                FROM t GROUP BY 1, 2
            ), s AS (
                SELECT value_band, c_ref, c_cur,
                       CAST(SUM(c_ref) OVER w AS BIGINT) AS n_ref,
                       CAST(SUM(c_cur) OVER w AS BIGINT) AS n_cur,
                       CAST(count(*) OVER w AS BIGINT) AS k
                FROM per_cat WINDOW w AS (PARTITION BY value_band)
            ), terms AS (
                SELECT value_band, n_ref, n_cur, k,
                       CAST((c_ref - CAST(n_ref AS DOUBLE)
                                 * CAST(c_ref + c_cur AS DOUBLE)
                                 / CAST(n_ref + n_cur AS DOUBLE))
                            * (c_ref - CAST(n_ref AS DOUBLE)
                                 * CAST(c_ref + c_cur AS DOUBLE)
                                 / CAST(n_ref + n_cur AS DOUBLE))
                            / (CAST(n_ref AS DOUBLE)
                                 * CAST(c_ref + c_cur AS DOUBLE)
                                 / CAST(n_ref + n_cur AS DOUBLE))
                            + (c_cur - CAST(n_cur AS DOUBLE)
                                 * CAST(c_ref + c_cur AS DOUBLE)
                                 / CAST(n_ref + n_cur AS DOUBLE))
                            * (c_cur - CAST(n_cur AS DOUBLE)
                                 * CAST(c_ref + c_cur AS DOUBLE)
                                 / CAST(n_ref + n_cur AS DOUBLE))
                            / (CAST(n_cur AS DOUBLE)
                                 * CAST(c_ref + c_cur AS DOUBLE)
                                 / CAST(n_ref + n_cur AS DOUBLE))
                            AS DECIMAL(28,12)) AS chi_term,
                       CAST(CASE WHEN c_ref > 0
                               THEN (c_ref / CAST(n_ref AS DOUBLE))
                                    * ln((c_ref / CAST(n_ref AS DOUBLE))
                                         / ((c_ref / CAST(n_ref AS DOUBLE)
                                             + c_cur / CAST(n_cur AS DOUBLE))
                                            / 2.0))
                               ELSE 0.0 END
                            + CASE WHEN c_cur > 0
                               THEN (c_cur / CAST(n_cur AS DOUBLE))
                                    * ln((c_cur / CAST(n_cur AS DOUBLE))
                                         / ((c_ref / CAST(n_ref AS DOUBLE)
                                             + c_cur / CAST(n_cur AS DOUBLE))
                                            / 2.0))
                               ELSE 0.0 END
                            AS DECIMAL(28,12)) AS js_term
                FROM s WHERE n_ref > 0 AND n_cur > 0
            ), agged AS (
                SELECT value_band, n_ref, n_cur, k AS n_categories,
                       CAST(SUM(chi_term) AS DOUBLE) AS chi2d,
                       CAST(SUM(js_term) AS DOUBLE) AS js2d
                FROM terms GROUP BY value_band, n_ref, n_cur, k
            )
            SELECT value_band, n_ref, n_cur, n_categories,
                   round(chi2d, 6) AS chi2,
                   round(CASE WHEN n_categories > 1 THEN
                       sqrt(chi2d / (CAST(n_ref + n_cur AS DOUBLE)
                                     * CAST(n_categories - 1 AS DOUBLE)))
                       END, 6) AS cramers_v,
                   round(js2d / 2.0, 6) AS js_div
            FROM agged ORDER BY value_band
        """,
        "copurchase_graph_stats": f"""
            WITH {_COPURCHASE_EDGES_SQL},
            ends AS (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges
            ), deg AS (
                SELECT node, CAST(count(*) AS BIGINT) AS degree
                FROM ends GROUP BY node
            ), dstats AS (
                SELECT CAST(count(*) AS BIGINT) AS n_nodes,
                       CAST(max(degree) AS BIGINT) AS max_degree,
                       CAST(SUM(degree) AS BIGINT) AS deg_sum,
                       CAST(SUM(degree * (degree - 1) // 2) AS BIGINT)
                           AS n_wedges
                FROM deg
            ), ec AS (
                SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges
            ), tc AS (
                SELECT CAST(count(*) AS BIGINT) AS n_triangles
                FROM edges e1
                JOIN edges e2 ON e1.dst = e2.src
                JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
            )
            SELECT n_nodes, n_edges, max_degree,
                   round(CAST(deg_sum AS DOUBLE)
                         / CAST(n_nodes AS DOUBLE), 6) AS avg_degree,
                   n_wedges, n_triangles,
                   round(CASE WHEN n_wedges > 0 THEN
                       CAST('3.0' AS DOUBLE) * n_triangles
                       / CAST(n_wedges AS DOUBLE) END, 6)
                       AS clustering_coeff
            FROM dstats, ec, tc
        """,
        "pagerank_copurchase": f"""
            WITH {_COPURCHASE_EDGES_SQL},
            dir AS (
                SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges
            ), deg AS (
                SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
                FROM dir GROUP BY src
            ), nn AS (
                SELECT CAST(count(*) AS BIGINT) AS n FROM deg
            ), r0 AS (
                SELECT node, deg,
                       CAST('1.0' AS DOUBLE) / CAST(n AS DOUBLE) AS rank
                FROM deg, nn
            ),
            {_pagerank_iter_sql(1, 'r0')},
            {_pagerank_iter_sql(2, 'r1')},
            {_pagerank_iter_sql(3, 'r2')}
            SELECT node AS part, round(rank, 9) AS pagerank
            FROM r3
            ORDER BY round(rank, 9) DESC, node LIMIT 20
        """,
        "ppr_copurchase": f"""
            WITH {_COPURCHASE_EDGES_SQL},
            dir AS (
                SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges
            ), deg AS (
                SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
                FROM dir GROUP BY src
            ), sd AS (
                SELECT node, deg, (node % {PPR_SEED_MOD} = 0) AS seed
                FROM deg
            ), nseed AS (
                SELECT CAST(count(*) AS BIGINT) AS ns FROM sd WHERE seed
            ), r0 AS (
                SELECT node, deg, seed,
                       CASE WHEN seed
                            THEN CAST('1.0' AS DOUBLE) / CAST(ns AS DOUBLE)
                            ELSE CAST('0.0' AS DOUBLE) END AS rank
                FROM sd CROSS JOIN nseed
            ),
            {_ppr_iter_sql(1, 'r0')},
            {_ppr_iter_sql(2, 'r1')},
            {_ppr_iter_sql(3, 'r2')}
            SELECT node AS part, round(rank, 9) + 0.0 AS pagerank
            FROM r3
            ORDER BY round(rank, 9) + 0.0 DESC, node LIMIT 20
        """,
        "multimodal_audio_stats": f"""
            WITH m AS (
                SELECT unnest(generate_series(0, {N_AUDIO_MEDIA - 1}))
                           AS media_id
            ), sig AS (
                SELECT media_id,
                       unnest(generate_series(
                           0, 400 + (media_id % 5) * 100 - 1)) AS i
                FROM m
            ), v AS (
                SELECT media_id,
                       ((i * 37 + media_id * 11) % 201) - 100 AS s
                FROM sig
            )
            SELECT media_id,
                   CAST(count(*) AS INTEGER) AS n_frames,
                   CAST((count(*) * 1000) // 8000 AS INTEGER) AS duration_ms,
                   round(sqrt(avg(CAST(s AS DOUBLE) * s)), 6) AS rms,
                   CAST(max(abs(s)) AS INTEGER) AS peak
            FROM v GROUP BY media_id ORDER BY media_id
        """,
        "multimodal_image_stats": f"""
            WITH m AS (
                SELECT unnest(generate_series(0, {N_IMAGE_MEDIA - 1}))
                           AS media_id
            ), px AS (
                SELECT media_id, y, x
                FROM m,
                     unnest(generate_series(0, {IMG_H - 1})) AS t1(y),
                     unnest(generate_series(0, {IMG_W - 1})) AS t2(x)
            )
            SELECT media_id,
                   CAST({IMG_W} AS INTEGER) AS width,
                   CAST({IMG_H} AS INTEGER) AS height,
                   round(avg(CAST((y * 7 + x * 5 + media_id * 13) % 256
                                  AS DOUBLE)), 6) AS mean_r,
                   round(avg(CAST((y * 7 + x * 5 + 29 + media_id * 13) % 256
                                  AS DOUBLE)), 6) AS mean_g,
                   round(avg(CAST((y * 7 + x * 5 + 58 + media_id * 13) % 256
                                  AS DOUBLE)), 6) AS mean_b
            FROM px GROUP BY media_id ORDER BY media_id
        """,
        "pq_encode_stats": (lambda books: f"""
            WITH d AS (
                SELECT label,
                       {", ".join(
                           "[" + ", ".join(
                               _l2_sql(
                                   f"embedding[{s * PQ_SUBDIM + 1}:"
                                   f"{(s + 1) * PQ_SUBDIM}]", c)
                               for c in book) + f"] AS d{s}"
                           for s, book in enumerate(books))}
                FROM embeddings
            ), c AS (
                SELECT label,
                       {", ".join(
                           f"CAST(list_position(d{s}, list_min(d{s})) - 1"
                           f" AS INT) AS c{s}, list_min(d{s}) AS e{s}"
                           for s in range(PQ_M))}
                FROM d
            )
            SELECT label, count(*) AS n,
                   CAST(SUM(CAST({" + ".join(f"e{s}" for s in range(PQ_M))}
                       AS DECIMAL(28,12))) AS DOUBLE) AS sum_sqerr,
                   CAST(count(DISTINCT {" || ' ' || ".join(
                       f"CAST(c{s} AS VARCHAR)" for s in range(PQ_M))})
                       AS BIGINT) AS n_codes
            FROM c GROUP BY label ORDER BY label
        """)(_pq_fixed_codebooks()),
        # -- r10: PQ codebook staleness (per-subspace drift, re-fit flag)
        "pq_staleness_emb": (lambda books: f"""
            WITH e AS (
                SELECT (vec_id % 3 = 0) AS is_new,
                       {", ".join(
                           "list_min([" + ", ".join(
                               _l2_sql(
                                   f"embedding[{s * PQ_SUBDIM + 1}:"
                                   f"{(s + 1) * PQ_SUBDIM}]", c)
                               for c in book) + f"]) AS e{s}"
                           for s, book in enumerate(books))}
                FROM embeddings
            ), m AS (
                {" UNION ALL ".join(
                    f"SELECT CAST({s} AS INT) AS subspace, is_new,"
                    f" e{s} AS err FROM e" for s in range(PQ_M))}
            ), agg AS (
                SELECT subspace,
                       count(*) FILTER (WHERE NOT is_new) AS n_train,
                       count(*) FILTER (WHERE is_new) AS n_new,
                       CAST(SUM(CASE WHEN NOT is_new
                                THEN CAST(err AS DECIMAL(38,9)) END)
                            AS DOUBLE) AS st,
                       CAST(SUM(CASE WHEN is_new
                                THEN CAST(err AS DECIMAL(38,9)) END)
                            AS DOUBLE) AS sn
                FROM m GROUP BY 1
            )
            SELECT subspace, n_train, n_new,
                   CASE WHEN n_train > 0
                        THEN round(st / CAST(n_train AS DOUBLE), 6) + 0.0
                        END AS mean_err_train,
                   CASE WHEN n_new > 0
                        THEN round(sn / CAST(n_new AS DOUBLE), 6) + 0.0
                        END AS mean_err_new,
                   CASE WHEN n_new > 0 AND st > 0.0
                        THEN round((sn / CAST(n_new AS DOUBLE))
                                   / (st / CAST(n_train AS DOUBLE)), 6)
                             + 0.0
                        END AS err_ratio,
                   CASE WHEN n_new = 0 THEN FALSE
                        WHEN st > 0.0
                        THEN (sn / CAST(n_new AS DOUBLE))
                             / (st / CAST(n_train AS DOUBLE)) > 1.5
                        ELSE sn > 0.0 END AS refit
            FROM agg ORDER BY subspace
        """)(_pq_fixed_codebooks()),
        # -- r11: unified index-maintenance health (ivf + pq + lsh) ------
        # the drift math replays the ivf_staleness_emb / pq_staleness_emb
        # oracles from the base tables (index build is a pure function of
        # them — the upsert==rebuild pin); the LSH counters come from the
        # query's deterministic 3-epoch + doc_id%IDXH_TOMB_MOD retraction
        # construction
        "index_health_emb": (lambda cents, books: f"""
            WITH d AS (
                SELECT vec_id, embedding,
                       [{", ".join(
                           f"round(1.0 - {_cos_raw_sql('embedding', str(c))}, 9)"
                           for c in cents)}] AS dists
                FROM embeddings
            ), a AS (
                SELECT CAST(list_position(dists, list_min(dists)) AS BIGINT)
                           AS centroid_id,
                       dists[list_position(dists, list_min(dists))] AS dist,
                       embedding
                FROM d
            ), ev AS (
                SELECT centroid_id, dist,
                       CAST(unnest(embedding) AS DOUBLE) AS val,
                       unnest(generate_series(
                           0, {len(cents[0]) - 1})) AS pos
                FROM a
            ), per AS (
                SELECT centroid_id, pos, count(*) AS n,
                       CAST(SUM(CAST(val AS DECIMAL(38,9))) AS DOUBLE) AS s,
                       CAST(SUM(CASE WHEN pos = 0
                                     THEN CAST(dist AS DECIMAL(38,9))
                                END) AS DOUBLE) AS ds
                FROM ev GROUP BY 1, 2
            ), c AS (
                SELECT CAST(cid AS BIGINT) AS centroid_id,
                       unnest(generate_series(
                           0, {len(cents[0]) - 1})) AS pos,
                       CAST(unnest(cv) AS DOUBLE) AS cval,
                       CAST(csq AS DOUBLE) AS csq
                FROM (VALUES {", ".join(
                    f"({i + 1}, {list(map(float, cc))},"
                    f" {sum(float(y) * float(y) for y in cc)!r})"
                    for i, cc in enumerate(cents))}) AS t(cid, cv, csq)
            ), iagg AS (
                SELECT p.centroid_id, MAX(p.n) AS n_vectors,
                       CAST(SUM(CAST((p.s / CAST(p.n AS DOUBLE)) * c.cval
                                     AS DECIMAL(38,9))) AS DOUBLE) AS dot,
                       CAST(SUM(CAST((p.s / CAST(p.n AS DOUBLE))
                                     * (p.s / CAST(p.n AS DOUBLE))
                                     AS DECIMAL(38,9))) AS DOUBLE) AS msq,
                       MAX(p.ds) AS dsum, MAX(c.csq) AS csq
                FROM per p JOIN c USING (centroid_id, pos) GROUP BY 1
            ), ivf AS (
                SELECT centroid_id,
                       round(dsum / CAST(n_vectors AS DOUBLE), 6) + 0.0
                           AS mean_dist,
                       round(1.0 - dot / (sqrt(msq) * sqrt(csq)), 6) + 0.0
                           AS drift
                FROM iagg
            ), med AS (
                SELECT mean_dist AS m FROM (
                    SELECT mean_dist,
                           row_number() OVER (ORDER BY mean_dist,
                                              centroid_id) AS rn,
                           count(*) OVER () AS cnt
                    FROM ivf
                ) WHERE rn = (cnt + 1) // 2
            ), pe AS (
                SELECT (vec_id % 3 = 0) AS is_new,
                       {", ".join(
                           "list_min([" + ", ".join(
                               _l2_sql(
                                   f"embedding[{s * PQ_SUBDIM + 1}:"
                                   f"{(s + 1) * PQ_SUBDIM}]", c)
                               for c in book) + f"]) AS e{s}"
                           for s, book in enumerate(books))}
                FROM embeddings
            ), pm AS (
                {" UNION ALL ".join(
                    f"SELECT CAST({s} AS INT) AS subspace, is_new,"
                    f" e{s} AS err FROM pe" for s in range(PQ_M))}
            ), pagg AS (
                SELECT subspace,
                       count(*) FILTER (WHERE NOT is_new) AS n_train,
                       count(*) FILTER (WHERE is_new) AS n_new,
                       CAST(SUM(CASE WHEN NOT is_new
                                THEN CAST(err AS DECIMAL(38,9)) END)
                            AS DOUBLE) AS st,
                       CAST(SUM(CASE WHEN is_new
                                THEN CAST(err AS DECIMAL(38,9)) END)
                            AS DOUBLE) AS sn
                FROM pm GROUP BY 1
            ), pq AS (
                SELECT subspace,
                       CASE WHEN n_new > 0 AND st > 0.0
                            THEN round((sn / CAST(n_new AS DOUBLE))
                                       / (st / CAST(n_train AS DOUBLE)), 6)
                                 + 0.0
                            END AS err_ratio,
                       CASE WHEN n_new = 0 THEN FALSE
                            WHEN st > 0.0
                            THEN (sn / CAST(n_new AS DOUBLE))
                                 / (st / CAST(n_train AS DOUBLE)) > 1.5
                            ELSE sn > 0.0 END AS refit
                FROM pagg
            ), uni AS (
                SELECT 'ivf' AS component,
                       CAST(centroid_id AS VARCHAR) AS key,
                       'drift' AS metric, drift AS value,
                       CAST(0.5 AS DOUBLE) * (SELECT m FROM med)
                           AS threshold,
                       drift > CAST(0.5 AS DOUBLE) * (SELECT m FROM med)
                           AS breached,
                       'recluster' AS action
                FROM ivf
                UNION ALL
                SELECT 'pq', CAST(subspace AS VARCHAR), 'err_ratio',
                       err_ratio, CAST(1.5 AS DOUBLE), refit, 'refit'
                FROM pq
                UNION ALL
                SELECT 'lsh', 'buckets', 'epochs',
                       CAST({IDXH_N_EPOCHS} AS DOUBLE),
                       CAST({IDXH_COMPACT_EPOCHS} AS DOUBLE),
                       {IDXH_N_EPOCHS} > {IDXH_COMPACT_EPOCHS}, 'compact'
                UNION ALL
                SELECT 'lsh', 'tombstones', 'tombstoned_ids',
                       CAST((SELECT count(DISTINCT doc_id) FROM documents
                             WHERE doc_id % {IDXH_TOMB_MOD} = 0)
                            AS DOUBLE),
                       CAST(0 AS DOUBLE),
                       (SELECT count(*) FROM documents
                        WHERE doc_id % {IDXH_TOMB_MOD} = 0) > 0, 'compact'
            )
            SELECT * FROM uni ORDER BY component, metric, key
        """)(_ivf_centroids(), _pq_fixed_codebooks()),
        # -- r6: ANN recall probe + PQ-code dedup + streaming interval join
        "ann_recall_ivf_pq": (lambda cents, books: f"""
            WITH d AS (
                SELECT vec_id, embedding,
                       [{", ".join(
                           f"round(1.0 - {_cos_raw_sql('embedding', str(c))}, 9)"
                           for c in cents)}] AS cd,
                       {", ".join(
                           "[" + ", ".join(
                               _l2_sql(
                                   f"embedding[{s * PQ_SUBDIM + 1}:"
                                   f"{(s + 1) * PQ_SUBDIM}]", c)
                               for c in book) + f"] AS d{s}"
                           for s, book in enumerate(books))}
                FROM embeddings
            ), corp AS (
                SELECT vec_id AS corpus_id,
                       list_position(cd, list_min(cd)) AS centroid_id,
                       {", ".join(
                           f"CAST(list_position(d{s}, list_min(d{s}))"
                           f" AS INT) AS c{s}"
                           for s in range(PQ_M))}
                FROM d
            ), qc AS (
                SELECT vec_id AS query_id, embedding AS qv,
                       unnest(cd) AS dist,
                       unnest(generate_series(1, {IVF_N_CENTROIDS}))
                           AS centroid_id
                FROM d WHERE vec_id < {N_QUERY_VECS}
            ), probe AS (
                SELECT query_id, qv, centroid_id FROM (
                    SELECT query_id, qv, centroid_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY dist ASC,
                                                       centroid_id ASC) AS pr
                    FROM qc
                ) WHERE pr <= {IVF_NPROBE}
            ), scored AS (
                SELECT p.query_id, p.qv, c.corpus_id,
                       ({" + ".join(
                           "[" + ", ".join(
                               _l2_sql(
                                   f"p.qv[{s * PQ_SUBDIM + 1}:"
                                   f"{(s + 1) * PQ_SUBDIM}]", cw)
                               for cw in book) + f"][c.c{s}]"
                           for s, book in enumerate(books))}) AS adist
                FROM corp c JOIN probe p USING (centroid_id)
                WHERE c.corpus_id <> p.query_id
            ), shortlist AS (
                SELECT query_id, qv, corpus_id FROM (
                    SELECT query_id, qv, corpus_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY adist ASC,
                                                       corpus_id ASC) AS rnk
                    FROM scored
                ) WHERE rnk <= {RERANK_C}
            ), rr AS (
                SELECT sl.query_id, sl.corpus_id,
                       {_cos_sql("sl.qv", "cv.embedding")} AS cos_sim
                FROM shortlist sl
                JOIN embeddings cv ON cv.vec_id = sl.corpus_id
            ), ann AS (
                SELECT query_id, corpus_id FROM (
                    SELECT query_id, corpus_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos_sim DESC,
                                                       corpus_id ASC) AS rrank
                    FROM rr
                ) WHERE rrank <= {TOPK}
            ), ex_scored AS (
                SELECT q.vec_id AS query_id, cp.vec_id AS corpus_id,
                       {_cos_sql("q.embedding", "cp.embedding")} AS cos_sim
                FROM embeddings cp, embeddings q
                WHERE q.vec_id < {N_QUERY_VECS} AND cp.vec_id <> q.vec_id
            ), ex AS (
                SELECT query_id, corpus_id FROM (
                    SELECT query_id, corpus_id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY cos_sim DESC,
                                                       corpus_id ASC) AS rnk
                    FROM ex_scored
                ) WHERE rnk <= {TOPK}
            ), hits AS (
                SELECT query_id, count(*) AS n_hits
                FROM ann JOIN ex USING (query_id, corpus_id)
                GROUP BY 1
            )
            SELECT qq.query_id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(coalesce(h.n_hits, 0) AS DOUBLE) / {float(TOPK)}
                       AS recall_at_k
            FROM (SELECT vec_id AS query_id FROM embeddings
                  WHERE vec_id < {N_QUERY_VECS}) qq
            LEFT JOIN hits h USING (query_id)
            ORDER BY qq.query_id
        """)(_ivf_centroids(), _pq_fixed_codebooks()),
        "pq_code_dup_pairs": (lambda books: f"""
            WITH d AS (
                SELECT vec_id,
                       {", ".join(
                           "[" + ", ".join(
                               _l2_sql(
                                   f"embedding[{s * PQ_SUBDIM + 1}:"
                                   f"{(s + 1) * PQ_SUBDIM}]", c)
                               for c in book) + f"] AS d{s}"
                           for s, book in enumerate(books))}
                FROM embeddings
            ), c AS (
                SELECT vec_id,
                       {", ".join(
                           f"CAST(list_position(d{s}, list_min(d{s})) - 1"
                           f" AS INT) AS c{s}"
                           for s in range(PQ_M))}
                FROM d
            ), pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       ({" + ".join(
                           f"CASE WHEN a.c{s} <> b.c{s} THEN 1 ELSE 0 END"
                           for s in range(PQ_M))}) AS n_diff_codes
                FROM c a JOIN c b ON a.vec_id < b.vec_id
            )
            SELECT n_diff_codes,
                   count(*) AS n_pairs,
                   CAST(SUM(id_a + id_b) AS BIGINT) AS sum_ids
            FROM pairs WHERE n_diff_codes <= 1
            GROUP BY 1 ORDER BY 1
        """)(_pq_fixed_codebooks()),
        "bm25_search_docs": (lambda terms: r"""
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS nt
                FROM documents
            ), toks AS (
                SELECT doc_id, unnest(string_split(nt, ' ')) AS term
                FROM norm
            ), tk AS (
                SELECT doc_id, term FROM toks WHERE term <> ''
            ), dl AS (
                SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1
            ), corpus AS (
                SELECT count(*) AS n_docs,
                       SUM(CAST(dl AS DECIMAL(18,6))) AS sum_dl
                FROM dl
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM tk WHERE term IN ({terms})
                GROUP BY 1, 2
            ), dfq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), sc AS (
                SELECT tf.doc_id,
                       ln(1.0 + (corpus.n_docs - dfq.df + 0.5)
                                / (dfq.df + 0.5))
                       * tf.tf
                       / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                          / (CAST(corpus.sum_dl AS DOUBLE) / corpus.n_docs)))
                           AS c
                FROM tf JOIN dl USING (doc_id)
                        JOIN dfq USING (term)
                        CROSS JOIN corpus
            )
            SELECT doc_id, count(*) AS n_hits,
                   CAST(SUM(CAST(c AS DECIMAL(18,12))) AS DOUBLE) AS bm25
            FROM sc GROUP BY doc_id ORDER BY doc_id
        """.replace("{terms}", terms))(
            ", ".join(f"'{t}'" for t in sorted(set(BM25_TERMS)))),
        "hard_negative_mining": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qvec,
                       label AS anchor_label
                FROM embeddings WHERE vec_id < {N_QUERY_VECS}
            ), scored AS (
                SELECT q.query_id, c.vec_id AS corpus_id,
                       q.anchor_label, c.label AS negative_label,
                       {_cos_sql("q.qvec", "c.embedding")} AS cos_sim
                FROM embeddings c, q
                WHERE c.vec_id <> q.query_id
                  AND c.label <> q.anchor_label
            )
            SELECT query_id, corpus_id, anchor_label, negative_label,
                   cos_sim, rank
            FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, corpus_id ASC) AS rank
                FROM scored
            ) WHERE rank <= {TOPK}
        """,
        "label_centroid_confusion_emb": """
            WITH per AS (
                SELECT label, unnest(embedding) AS v,
                       unnest(generate_series(1, len(embedding))) AS pos
                FROM embeddings
            ), cent AS (
                SELECT label, pos,
                       CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,12)))
                            AS DOUBLE) / count(*) AS cv
                FROM per GROUP BY 1, 2
            ), cl AS (
                SELECT label AS clabel, list(cv ORDER BY pos) AS cvec
                FROM cent GROUP BY 1
            ), d AS (
                SELECT e.vec_id, e.label, cl.clabel,
                       round(list_sum(list_transform(
                           list_zip(e.embedding, cl.cvec),
                           x -> (CAST(x[1] AS DOUBLE) - x[2])
                                * (CAST(x[1] AS DOUBLE) - x[2]))), 9) AS dist
                FROM embeddings e CROSS JOIN cl
            ), a AS (
                SELECT vec_id, label, clabel AS assigned_label FROM (
                    SELECT vec_id, label, clabel,
                           row_number() OVER (PARTITION BY vec_id
                               ORDER BY dist ASC, clabel ASC) AS rn
                    FROM d
                ) WHERE rn = 1
            )
            SELECT label, assigned_label, count(*) AS n_vectors
            FROM a GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "scd2_event_type_intervals": """
            WITH ev AS (
                SELECT user_id, event_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events
            ), ch AS (
                SELECT user_id, event_type, sec, event_id,
                       lag(event_type) OVER w AS prev,
                       row_number() OVER w AS rn
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
            ), kept AS (
                SELECT user_id, event_type, sec, event_id FROM ch
                WHERE rn = 1 OR prev IS DISTINCT FROM event_type
            )
            SELECT user_id, event_type, sec AS valid_from,
                   lead(sec) OVER w2 AS valid_to,
                   event_id AS open_id,
                   CAST(row_number() OVER w2 AS INT) AS version
            FROM kept
            WINDOW w2 AS (PARTITION BY user_id ORDER BY sec, event_id)
            ORDER BY user_id, version
        """,
        "scd2_incremental_merge": """
            WITH ev AS (
                SELECT user_id, event_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events
            ), ch AS (
                SELECT user_id, event_type, sec, event_id,
                       lag(event_type) OVER w AS prev,
                       row_number() OVER w AS rn
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
            ), kept AS (
                SELECT user_id, event_type, sec, event_id FROM ch
                WHERE rn = 1 OR prev IS DISTINCT FROM event_type
            )
            SELECT user_id, event_type, sec AS valid_from,
                   lead(sec) OVER w2 AS valid_to,
                   event_id AS open_id,
                   CAST(row_number() OVER w2 AS INT) AS version
            FROM kept
            WINDOW w2 AS (PARTITION BY user_id ORDER BY sec, event_id)
            ORDER BY user_id, version
        """,
        "matryoshka_recall_emb": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qvec
                FROM embeddings WHERE vec_id < {N_QUERY_VECS}
            ), full_s AS (
                SELECT q.query_id, c.vec_id AS corpus_id,
                       {_cos_sql("q.qvec", "c.embedding")} AS cs
                FROM embeddings c, q WHERE c.vec_id <> q.query_id
            ), full_k AS (
                SELECT query_id, corpus_id FROM (
                    SELECT query_id, corpus_id, row_number() OVER (
                        PARTITION BY query_id ORDER BY cs DESC,
                        corpus_id ASC) AS rnk
                    FROM full_s) WHERE rnk <= {TOPK}
            ), tr_s AS (
                SELECT q.query_id, c.vec_id AS corpus_id,
                       {_cos_sql(f"q.qvec[1:{MATRYOSHKA_DIMS}]",
                                 f"c.embedding[1:{MATRYOSHKA_DIMS}]")} AS cs
                FROM embeddings c, q WHERE c.vec_id <> q.query_id
            ), tr_k AS (
                SELECT query_id, corpus_id FROM (
                    SELECT query_id, corpus_id, row_number() OVER (
                        PARTITION BY query_id ORDER BY cs DESC,
                        corpus_id ASC) AS rnk
                    FROM tr_s) WHERE rnk <= {TOPK}
            ), hits AS (
                SELECT query_id, count(*) AS n_hits
                FROM tr_k JOIN full_k USING (query_id, corpus_id)
                GROUP BY 1
            )
            SELECT qq.query_id,
                   CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                   CAST(coalesce(h.n_hits, 0) AS DOUBLE) / {float(TOPK)}
                       AS recall_at_k
            FROM (SELECT vec_id AS query_id FROM embeddings
                  WHERE vec_id < {N_QUERY_VECS}) qq
            LEFT JOIN hits h USING (query_id)
            ORDER BY qq.query_id
        """,
        "embedding_standardize_stats": """
            WITH per AS (
                SELECT CAST(v AS DOUBLE) AS v, pos FROM (
                    SELECT unnest(embedding) AS v,
                           unnest(generate_series(0, len(embedding) - 1))
                               AS pos
                    FROM embeddings)
            ), stats AS (
                SELECT pos,
                       CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                           / count(*) AS mean,
                       sqrt(greatest(
                           CAST(SUM(CAST(v * v AS DECIMAL(38,12)))
                                AS DOUBLE) / count(*)
                           - (CAST(SUM(CAST(v AS DECIMAL(38,12)))
                                   AS DOUBLE) / count(*))
                             * (CAST(SUM(CAST(v AS DECIMAL(38,12)))
                                     AS DOUBLE) / count(*)),
                           0.0)) AS std
                FROM per GROUP BY 1
            ), z AS (
                SELECT p.pos,
                       CASE WHEN s.std > 1e-9
                            THEN (p.v - s.mean) / s.std
                            ELSE p.v - s.mean END AS v
                FROM per p JOIN stats s USING (pos)
                WHERE p.pos < 8
            )
            SELECT pos, count(*) AS n,
                   round(CAST(SUM(CAST(v AS DECIMAL(18,12))) AS DOUBLE), 6)
                       + 0.0 AS sum_std,
                   round(MIN(v), 6) + 0.0 AS min_std,
                   round(MAX(v), 6) + 0.0 AS max_std
            FROM z GROUP BY pos ORDER BY pos
        """,
        "ewma_event_rate": """
            WITH RECURSIVE daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), ser AS (
                SELECT event_type, day, n,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY day) AS idx
                FROM daily
            ), ew AS (
                SELECT event_type, day, n, idx,
                       CAST(n AS DOUBLE) AS ewma_rate
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT s.event_type, s.day, s.n, s.idx,
                       0.5 * e.ewma_rate + 0.5 * CAST(s.n AS DOUBLE)
                FROM ser s JOIN ew e
                  ON s.event_type = e.event_type AND s.idx = e.idx + 1
            )
            SELECT event_type, day, n, ewma_rate
            FROM ew ORDER BY event_type, day
        """,
        "recursive_cte_surface": """
            WITH RECURSIVE yearly AS (
                SELECT o_orderpriority AS pri,
                       CAST(date_trunc('year', CAST(o_orderdate AS DATE))
                            AS DATE) AS yr,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                            AS DOUBLE) AS rev
                FROM orders GROUP BY 1, 2
            ), ser AS (
                SELECT pri, yr, rev,
                       row_number() OVER (PARTITION BY pri ORDER BY yr)
                           AS idx
                FROM yearly
            ), ew AS (
                SELECT pri, yr, rev, idx, rev AS ewma_rev
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT s.pri, s.yr, s.rev, s.idx,
                       0.5 * e.ewma_rev + 0.5 * s.rev
                FROM ser s JOIN ew e
                  ON s.pri = e.pri AND s.idx = e.idx + 1
            )
            SELECT pri, yr, rev, ewma_rev FROM ew ORDER BY pri, yr
        """,
        "lateral_topk_surface": """
            SELECT r.r_name, x.n_name, x.total_bal
            FROM region r,
            LATERAL (
                SELECT n.n_name,
                       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,12)))
                            AS DOUBLE) AS total_bal
                FROM nation n JOIN customer c
                  ON c.c_nationkey = n.n_nationkey
                WHERE n.n_regionkey = r.r_regionkey
                GROUP BY n.n_name
                ORDER BY total_bal DESC, n.n_name
                LIMIT 1
            ) x
            ORDER BY r.r_name
        """,
        "croston_demand_lineitem": f"""
            WITH RECURSIVE demand AS MATERIALIZED (
                SELECT p.p_brand AS cont,
                       CAST(date_diff('day', DATE '1970-01-01',
                                      CAST(l.l_shipdate AS DATE))
                            AS BIGINT) AS day,
                       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6)))
                            AS DOUBLE) AS qty
                FROM lineitem l JOIN part p
                  ON l.l_partkey = p.p_partkey
                WHERE l.l_quantity = {CROSTON_QTY}
                GROUP BY 1, 2
            ), ser AS MATERIALIZED (
                SELECT cont, day, qty,
                       row_number() OVER (PARTITION BY cont ORDER BY day)
                           AS idx,
                       day - lag(day) OVER (PARTITION BY cont
                                            ORDER BY day) AS gap
                FROM demand
            ), cr AS (
                SELECT cont, day, qty, idx,
                       qty AS z, CAST(1.0 AS DOUBLE) AS p
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT s.cont, s.day, s.qty, s.idx,
                       0.5 * s.qty + 0.5 * c.z,
                       0.5 * CAST(s.gap AS DOUBLE) + 0.5 * c.p
                FROM ser s JOIN cr c
                  ON s.cont = c.cont AND s.idx = c.idx + 1
            ), lastrow AS (
                SELECT cont, CAST(max(idx) AS BIGINT) AS n_epochs
                FROM cr GROUP BY 1
            )
            SELECT c.cont AS p_brand, l.n_epochs,
                   c.z + 0.0 AS z, c.p + 0.0 AS p,
                   c.z / c.p + 0.0 AS forecast
            FROM cr c JOIN lastrow l
              ON c.cont = l.cont AND c.idx = l.n_epochs
            ORDER BY p_brand
        """,
        "kalman_level_events": f"""
            WITH RECURSIVE daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), ser AS (
                SELECT event_type, day, n,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY day) AS idx
                FROM daily
            ), kf AS (
                SELECT event_type, day, n, idx,
                       CAST(n AS DOUBLE) AS level,
                       CAST(1.0 AS DOUBLE) AS gain,
                       CAST({KALMAN_R!r} AS DOUBLE) AS p
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT s.event_type, s.day, s.n, s.idx,
                       -- mirror the operator's op order exactly:
                       -- pp = p+q; k = pp/(pp+r); x += k*(v-x);
                       -- p = (1-k)*pp
                       e.level + ((e.p + {KALMAN_Q!r})
                                  / ((e.p + {KALMAN_Q!r}) + {KALMAN_R!r}))
                               * (CAST(s.n AS DOUBLE) - e.level),
                       (e.p + {KALMAN_Q!r})
                           / ((e.p + {KALMAN_Q!r}) + {KALMAN_R!r}),
                       (1.0 - (e.p + {KALMAN_Q!r})
                              / ((e.p + {KALMAN_Q!r}) + {KALMAN_R!r}))
                           * (e.p + {KALMAN_Q!r})
                FROM ser s JOIN kf e
                  ON s.event_type = e.event_type AND s.idx = e.idx + 1
            )
            SELECT event_type, day, n, level, gain
            FROM kf ORDER BY event_type, day
        """,
        "greedy_pack_bins": """
            WITH RECURSIVE ser AS (
                SELECT source, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY source ORDER BY doc_id) AS idx
                FROM documents
            ), packed AS (
                SELECT source, idx, n_chars,
                       CAST(0 AS BIGINT) AS bin_id, n_chars AS cur
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT s.source, s.idx, s.n_chars,
                       CASE WHEN p.cur + s.n_chars > {PACK_BUDGET}
                            THEN p.bin_id + 1 ELSE p.bin_id END,
                       CASE WHEN p.cur + s.n_chars > {PACK_BUDGET}
                            THEN s.n_chars ELSE p.cur + s.n_chars END
                FROM ser s JOIN packed p
                  ON s.source = p.source AND s.idx = p.idx + 1
            )
            SELECT source, bin_id, count(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM packed GROUP BY 1, 2 ORDER BY 1, 2
        """.replace("{PACK_BUDGET}", str(PACK_BUDGET)),
        "kmeans_fit_iter_stats": """
            WITH seedv AS (
                SELECT vec_id, embedding FROM embeddings
                ORDER BY vec_id LIMIT {K}
            ), seed AS (
                SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
                           AS cluster, embedding
                FROM seedv
            ), cent0 AS (
                SELECT cluster, CAST(pos AS INT) AS pos, CAST(v AS DOUBLE) AS v
                FROM (SELECT cluster, unnest(embedding) AS v,
                             unnest(generate_series(0, len(embedding) - 1))
                                 AS pos
                      FROM seed)
            ), lst0 AS (
                SELECT cluster, list(v ORDER BY pos) AS cvec
                FROM cent0 GROUP BY 1
            ), ex AS (
                SELECT vec_id, CAST(pos AS INT) AS pos, CAST(v AS DOUBLE) AS v
                FROM (SELECT vec_id, unnest(embedding) AS v,
                             unnest(generate_series(0, len(embedding) - 1))
                                 AS pos
                      FROM embeddings)
            ),
            a1 AS (
                SELECT e.vec_id, c.cluster, round(list_sum(list_transform(list_zip(e.embedding, c.cvec), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 9) AS dist
                FROM embeddings e CROSS JOIN lst0 c
            ), p1 AS (
                SELECT vec_id, cluster FROM (
                    SELECT vec_id, cluster,
                           row_number() OVER (
                               PARTITION BY vec_id
                               ORDER BY dist, cluster) AS rn
                    FROM a1) WHERE rn = 1
            ),
            s1 AS (
                SELECT p.cluster, x.pos,
                       CAST(SUM(CAST(x.v AS DECIMAL(38,12))) AS DOUBLE)
                           / count(*) AS v
                FROM p1 p JOIN ex x USING (vec_id)
                GROUP BY 1, 2
            ), cent1 AS (
                SELECT b.cluster, b.pos, COALESCE(s.v, b.v) AS v
                FROM cent0 b LEFT JOIN s1 s
                  ON b.cluster = s.cluster AND b.pos = s.pos
            ), lst1 AS (
                SELECT cluster, list(v ORDER BY pos) AS cvec
                FROM cent1 GROUP BY 1
            ),
            a2 AS (
                SELECT e.vec_id, c.cluster, round(list_sum(list_transform(list_zip(e.embedding, c.cvec), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 9) AS dist
                FROM embeddings e CROSS JOIN lst1 c
            ), p2 AS (
                SELECT vec_id, cluster FROM (
                    SELECT vec_id, cluster,
                           row_number() OVER (
                               PARTITION BY vec_id
                               ORDER BY dist, cluster) AS rn
                    FROM a2) WHERE rn = 1
            ),
            s2 AS (
                SELECT p.cluster, x.pos,
                       CAST(SUM(CAST(x.v AS DECIMAL(38,12))) AS DOUBLE)
                           / count(*) AS v
                FROM p2 p JOIN ex x USING (vec_id)
                GROUP BY 1, 2
            ), cent2 AS (
                SELECT b.cluster, b.pos, COALESCE(s.v, b.v) AS v
                FROM cent1 b LEFT JOIN s2 s
                  ON b.cluster = s.cluster AND b.pos = s.pos
            ), lst2 AS (
                SELECT cluster, list(v ORDER BY pos) AS cvec
                FROM cent2 GROUP BY 1
            ),
            a3 AS (
                SELECT e.vec_id, c.cluster, round(list_sum(list_transform(list_zip(e.embedding, c.cvec), x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)))), 9) AS dist
                FROM embeddings e CROSS JOIN lst2 c
            ), p3 AS (
                SELECT vec_id, cluster FROM (
                    SELECT vec_id, cluster,
                           row_number() OVER (
                               PARTITION BY vec_id
                               ORDER BY dist, cluster) AS rn
                    FROM a3) WHERE rn = 1
            ),
            cnt AS (
                SELECT cluster, count(*) AS n_vectors FROM p3 GROUP BY 1
            )
            SELECT c.cluster, n.n_vectors,
                   round(MAX(CASE WHEN pos = 0 THEN v END), 6) + 0.0 AS c0,
                   round(MAX(CASE WHEN pos = 1 THEN v END), 6) + 0.0 AS c1,
                   round(MAX(CASE WHEN pos = 2 THEN v END), 6) + 0.0 AS c2,
                   round(MAX(CASE WHEN pos = 3 THEN v END), 6) + 0.0 AS c3
            FROM cent2 c JOIN cnt n USING (cluster)
            WHERE c.pos < 4
            GROUP BY c.cluster, n.n_vectors
            ORDER BY c.cluster
        """.replace("{K}", str(KMEANS_FIT_K)),
        "llm_data_pipeline_counts": f"""
            WITH RECURSIVE d1 AS (
                SELECT d.doc_id, d.lang, d.text FROM documents d
                JOIN (SELECT md5({_NORM}) AS fp, min(doc_id) AS keep_id
                      FROM documents GROUP BY 1) k
                  ON d.doc_id = k.keep_id
            ), base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM d1
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([md5(sig[1] || '|' || sig[2]),
                                       md5(sig[3] || '|' || sig[4]),
                                       md5(sig[5] || '|' || sig[6]),
                                       md5(sig[7] || '|' || sig[8])]) AS bucket,
                       unnest(generate_series(0, 3)) AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                       l.sh AS sh_a, r.sh AS sh_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
            ), pairs AS (
                SELECT id_a, id_b FROM cands
                WHERE round(len(list_intersect(sh_a, sh_b))
                            / CAST(len(list_distinct(list_concat(sh_a, sh_b)))
                                   AS DOUBLE), 6) >= 0.7
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs
            ), reach AS (
                SELECT src AS node, src AS r FROM edges
                UNION
                SELECT reach.node, e.dst FROM reach
                JOIN edges e ON reach.r = e.src
            ), drop2 AS (
                SELECT node AS doc_id FROM (
                    SELECT node, min(r) AS grp FROM reach GROUP BY node)
                WHERE node <> grp
            ), d2 AS (
                SELECT * FROM d1
                WHERE doc_id NOT IN (SELECT doc_id FROM drop2)
            ), bset AS (
                SELECT DISTINCT s FROM (
                    SELECT unnest({_shingle_sql()}) AS s FROM documents
                    WHERE doc_id % 50 = 0)
            ), cont AS (
                SELECT b.id AS doc_id FROM (
                    SELECT id, unnest(sh) AS s FROM base
                    WHERE id IN (SELECT doc_id FROM d2)) b
                JOIN bset ON b.s = bset.s
                GROUP BY b.id HAVING count(DISTINCT b.s) >= 3
            ), d3 AS (
                SELECT * FROM d2
                WHERE doc_id NOT IN (SELECT doc_id FROM cont)
            ), g AS (
                SELECT doc_id, lang, text,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tok,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           AS n_alpha,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                           AS n_sym,
                       length(text) AS n_chars,
                       len(list_intersect(
                           list_transform(
                               regexp_split_to_array(trim(text), '\\s+'),
                               t -> lower(t)),
                           {_STOPWORDS_SQL})) AS sw_hits
                FROM d3
            ), d4 AS (
                SELECT doc_id, lang, n_tok FROM g
                WHERE n_tok >= 20 AND n_tok <= 1000
                  AND n_alpha / greatest(n_tok, 1) >= 3.0
                  AND n_alpha / greatest(n_tok, 1) <= 10.0
                  AND n_sym / greatest(n_chars, 1) <= 0.1
                  AND sw_hits >= 2
            ), samp AS (
                SELECT doc_id, lang, n_tok AS tok FROM d4
                WHERE substr(md5('s42-' || CAST(doc_id AS VARCHAR)), 1, 6) <
                      CASE lang
                          WHEN 'en' THEN '400000'
                          WHEN 'de' THEN 'cccccc'
                          WHEN 'fr' THEN 'cccccc'
                          WHEN 'es' THEN '800000'
                          WHEN 'zh' THEN '800000'
                          ELSE '199999'
                      END
            ), c AS (
                SELECT lang, doc_id, tok,
                       COALESCE(SUM(tok) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           0) AS prior
                FROM samp
            ), bins AS (
                SELECT lang, CAST(prior // 512 AS BIGINT) AS bin_id,
                       count(*) AS n_docs, CAST(SUM(tok) AS BIGINT)
                           AS total_tokens
                FROM c GROUP BY 1, 2
            )
            SELECT lang, count(*) AS n_bins,
                   CAST(SUM(n_docs) AS BIGINT) AS n_docs,
                   CAST(SUM(total_tokens) AS BIGINT) AS total_tokens
            FROM bins GROUP BY lang ORDER BY lang
        """,
        "multi_span_dup_stats": """
            WITH toks AS (
                SELECT doc_id, string_split({NORM_PLACEHOLDER}, ' ') AS t FROM documents
            )
            SELECT * FROM (
            SELECT doc_id, CAST(4 AS INT) AS k, count(*) AS n_spans,
                   CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_spans,
                   round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
                         / count(*), 6) AS dup_fraction
            FROM (
                SELECT doc_id, unnest(list_distinct(
                    CASE WHEN len(t) >= 4 THEN
                        list_transform(generate_series(1, len(t) - 3),
                            i -> substr(md5(array_to_string(t[i:i+3], ' ')), 1, 12))
                    ELSE [substr(md5(array_to_string(t, ' ')), 1, 12)]
                    END)) AS h
                FROM toks
            ) s
            JOIN (
                SELECT h, count(*) AS df FROM (
                    SELECT doc_id, unnest(list_distinct(
                        CASE WHEN len(t) >= 4 THEN
                            list_transform(generate_series(1, len(t) - 3),
                                i -> substr(md5(array_to_string(t[i:i+3], ' ')), 1, 12))
                        ELSE [substr(md5(array_to_string(t, ' ')), 1, 12)]
                        END)) AS h
                    FROM toks
                ) GROUP BY h
            ) f USING (h)
            GROUP BY doc_id
            HAVING sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) > 0
            UNION ALL
            SELECT doc_id, CAST(8 AS INT) AS k, count(*) AS n_spans,
                   CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_spans,
                   round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
                         / count(*), 6) AS dup_fraction
            FROM (
                SELECT doc_id, unnest(list_distinct(
                    CASE WHEN len(t) >= 8 THEN
                        list_transform(generate_series(1, len(t) - 7),
                            i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 12))
                    ELSE [substr(md5(array_to_string(t, ' ')), 1, 12)]
                    END)) AS h
                FROM toks
            ) s
            JOIN (
                SELECT h, count(*) AS df FROM (
                    SELECT doc_id, unnest(list_distinct(
                        CASE WHEN len(t) >= 8 THEN
                            list_transform(generate_series(1, len(t) - 7),
                                i -> substr(md5(array_to_string(t[i:i+7], ' ')), 1, 12))
                        ELSE [substr(md5(array_to_string(t, ' ')), 1, 12)]
                        END)) AS h
                    FROM toks
                ) GROUP BY h
            ) f USING (h)
            GROUP BY doc_id
            HAVING sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) > 0
            UNION ALL
            SELECT doc_id, CAST(16 AS INT) AS k, count(*) AS n_spans,
                   CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_spans,
                   round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
                         / count(*), 6) AS dup_fraction
            FROM (
                SELECT doc_id, unnest(list_distinct(
                    CASE WHEN len(t) >= 16 THEN
                        list_transform(generate_series(1, len(t) - 15),
                            i -> substr(md5(array_to_string(t[i:i+15], ' ')), 1, 12))
                    ELSE [substr(md5(array_to_string(t, ' ')), 1, 12)]
                    END)) AS h
                FROM toks
            ) s
            JOIN (
                SELECT h, count(*) AS df FROM (
                    SELECT doc_id, unnest(list_distinct(
                        CASE WHEN len(t) >= 16 THEN
                            list_transform(generate_series(1, len(t) - 15),
                                i -> substr(md5(array_to_string(t[i:i+15], ' ')), 1, 12))
                        ELSE [substr(md5(array_to_string(t, ' ')), 1, 12)]
                        END)) AS h
                    FROM toks
                ) GROUP BY h
            ) f USING (h)
            GROUP BY doc_id
            HAVING sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) > 0
            ) ORDER BY doc_id, k
        """.replace("{NORM_PLACEHOLDER}", _NORM),
        "lexical_diversity_docs": f"""
            WITH t AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS toks
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(toks) AS INT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS INT) AS n_types,
                   round(CAST(len(list_distinct(toks)) AS DOUBLE)
                         / CAST(len(toks) AS DOUBLE), 6) AS ttr,
                   CASE WHEN len(toks) > 1 AND len(list_distinct(toks)) > 0
                        THEN round(ln(CAST(len(list_distinct(toks)) AS DOUBLE))
                                   / ln(CAST(len(toks) AS DOUBLE)), 6)
                   END AS herdan_c
            FROM t ORDER BY doc_id
        """,
        "burrows_delta_docs": f"""
            WITH toks AS (
                SELECT source AS g,
                       unnest(string_split({_NORM}, ' ')) AS w
                FROM documents
            ), gw AS (
                SELECT g, w, count(*) AS n FROM toks GROUP BY 1, 2
            ), totals AS (
                SELECT g, CAST(SUM(n) AS BIGINT) AS tot FROM gw GROUP BY 1
            ), top AS (
                SELECT w FROM (
                    SELECT w, SUM(n) AS cn FROM gw GROUP BY 1
                ) ORDER BY cn DESC, w LIMIT {BURROWS_TOP_WORDS}
            ), grid AS (
                SELECT t.g, p.w,
                       CAST(COALESCE(gw.n, 0) AS DOUBLE)
                           / CAST(t.tot AS DOUBLE) AS f
                FROM totals t CROSS JOIN top p
                LEFT JOIN gw ON gw.g = t.g AND gw.w = p.w
            ), stats AS (
                SELECT w, CAST(count(*) AS BIGINT) AS k,
                       CAST(SUM(CAST(f AS DECIMAL(38,12))) AS DOUBLE)
                           AS sf,
                       CAST(SUM(CAST(f * f AS DECIMAL(38,12))) AS DOUBLE)
                           AS sff
                FROM grid GROUP BY 1
            ), z AS (
                SELECT g.g, g.w,
                       (g.f - s.sf / CAST(s.k AS DOUBLE))
                       / sqrt(s.sff / CAST(s.k AS DOUBLE)
                              - (s.sf / CAST(s.k AS DOUBLE))
                                * (s.sf / CAST(s.k AS DOUBLE))) AS z
                FROM grid g JOIN stats s ON g.w = s.w
                WHERE s.sff / CAST(s.k AS DOUBLE)
                      - (s.sf / CAST(s.k AS DOUBLE))
                        * (s.sf / CAST(s.k AS DOUBLE)) > 0.0
            )
            SELECT a.g AS group_a, b.g AS group_b,
                   CAST(count(*) AS BIGINT) AS n_words,
                   round(CAST(SUM(CAST(abs(a.z - b.z) AS DECIMAL(38,12)))
                              AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
                       + 0.0 AS delta
            FROM z a JOIN z b ON a.w = b.w AND a.g < b.g
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "vocab_richness_docs": f"""
            WITH toks AS (
                SELECT lang, unnest(string_split({_NORM}, ' ')) AS t
                FROM documents
            ), per_term AS (
                SELECT lang, t, count(*) AS n FROM toks GROUP BY 1, 2
            ), agg AS (
                SELECT lang,
                       CAST(SUM(n) AS BIGINT) AS n_tokens,
                       CAST(count(*) AS BIGINT) AS d_obs,
                       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS f1,
                       CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS f2
                FROM per_term GROUP BY 1
            )
            SELECT lang, n_tokens, d_obs, f1, f2,
                   round(CAST(d_obs AS DOUBLE)
                         + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
                           / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) + 0.0
                       AS chao1,
                   round(1.0 - CAST(f1 AS DOUBLE)
                         / CAST(n_tokens AS DOUBLE), 6) + 0.0 AS coverage
            FROM agg ORDER BY lang
        """,
        "heaps_vocab_growth": f"""
            WITH ranks AS (
                SELECT doc_id AS id,
                       row_number() OVER (ORDER BY doc_id) AS r
                FROM documents
            ), first_t AS (
                SELECT min(doc_id) AS id FROM (
                    SELECT doc_id, unnest(string_split({_NORM}, ' ')) AS t
                    FROM documents)
                GROUP BY t
            ), fr AS (
                SELECT r FROM first_t JOIN ranks USING (id)
            ), tok AS (
                SELECT ranks.r,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n
                FROM documents JOIN ranks ON documents.doc_id = ranks.id
            ), cp AS (
                SELECT unnest([{", ".join(str(n) for n in HEAPS_CHECKPOINTS)}])
                           AS checkpoint
            )
            SELECT CAST(checkpoint AS INT) AS checkpoint,
                   (SELECT CAST(sum(CASE WHEN r <= checkpoint THEN 1 ELSE 0 END)
                        AS BIGINT) FROM tok) AS n_docs,
                   (SELECT CAST(sum(CASE WHEN r <= checkpoint THEN 1 ELSE 0 END)
                        AS BIGINT) FROM fr) AS vocab_size,
                   (SELECT CAST(sum(CASE WHEN r <= checkpoint THEN n ELSE 0 END)
                        AS BIGINT) FROM tok) AS cum_tokens
            FROM cp ORDER BY checkpoint
        """,
        "zipf_slope_terms": f"""
            WITH counts AS (
                SELECT t, count(*) AS n FROM (
                    SELECT unnest(string_split({_NORM}, ' ')) AS t
                    FROM documents)
                WHERE t <> '' GROUP BY t
            ), ranked AS (
                SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, t) AS DOUBLE))
                           AS x,
                       ln(CAST(n AS DOUBLE)) AS y
                FROM counts
                ORDER BY n DESC, t LIMIT {ZIPF_TOP_N}
            ), m AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
                       CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                       CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
                       CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
                FROM ranked
            )
            SELECT CAST(n AS BIGINT) AS n_terms,
                   CASE WHEN n > 1 THEN
                       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
                       + 0.0 END AS slope,
                   CASE WHEN n > 1 THEN
                       round((sy - ((n * sxy - sx * sy)
                                    / (n * sxx - sx * sx)) * sx)
                             / n, 6) + 0.0 END AS intercept
            FROM m
        """,
        "markov_next_event_accuracy": f"""
            WITH p AS (
                SELECT event_type AS from_type,
                       lead(event_type) OVER w AS to_type,
                       lead(ts) OVER w AS dest_ts
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), pp AS (
                SELECT * FROM p WHERE to_type IS NOT NULL
            ), tr AS (
                SELECT from_type, to_type, count(*) AS n FROM pp
                WHERE dest_ts < TIMESTAMP '{MARKOV_SPLIT}'
                GROUP BY 1, 2
            ), pred AS (
                SELECT from_type, to_type AS predicted FROM (
                    SELECT from_type, to_type,
                           row_number() OVER (
                               PARTITION BY from_type
                               ORDER BY n DESC, to_type) AS rn
                    FROM tr) WHERE rn = 1
            )
            SELECT t.from_type, pred.predicted, count(*) AS n_test,
                   CAST(sum(CASE WHEN t.to_type = pred.predicted
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
                   round(CAST(sum(CASE WHEN t.to_type = pred.predicted
                              THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS accuracy
            FROM pp t LEFT JOIN pred USING (from_type)
            WHERE t.dest_ts >= TIMESTAMP '{MARKOV_SPLIT}'
            GROUP BY 1, 2 ORDER BY t.from_type
        """,
        "item_similarity_parts": """
            WITH nodes AS (
                SELECT DISTINCT l_orderkey AS g, l_partkey AS n
                FROM lineitem WHERE l_partkey IS NOT NULL
            ), gs AS (
                SELECT g FROM nodes GROUP BY g
                HAVING count(*) >= 2 AND count(*) <= 64
            ), kept AS (
                SELECT nodes.g, nodes.n FROM nodes JOIN gs USING (g)
            ), item_n AS (
                SELECT n, count(*) AS ng FROM kept GROUP BY n
            ), co AS (
                SELECT a.n AS a, b.n AS b, count(*) AS n_co
                FROM kept a JOIN kept b ON a.g = b.g AND a.n < b.n
                GROUP BY 1, 2 HAVING count(*) >= 2
            ), directed AS (
                SELECT a, b, n_co FROM co
                UNION ALL SELECT b, a, n_co FROM co
            ), sim AS (
                SELECT d.a AS item, d.b AS neighbor, d.n_co,
                       round(CAST(d.n_co AS DOUBLE)
                             / CAST(na.ng + nb.ng - d.n_co AS DOUBLE), 6)
                           AS sim
                FROM directed d
                JOIN item_n na ON na.n = d.a
                JOIN item_n nb ON nb.n = d.b
            )
            SELECT item, neighbor, n_co, sim, CAST(rank AS INT) AS rank
            FROM (
                SELECT item, neighbor, n_co, sim,
                       row_number() OVER (
                           PARTITION BY item
                           ORDER BY sim DESC, neighbor) AS rank
                FROM sim)
            WHERE rank <= 3 ORDER BY item, rank
        """,
        "minhash_estimate_error": f"""
            WITH base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, unnest([md5(sig[1] || '|' || sig[2]),
                                   md5(sig[3] || '|' || sig[4]),
                                   md5(sig[5] || '|' || sig[6]),
                                   md5(sig[7] || '|' || sig[8])]) AS bucket,
                       unnest(generate_series(0, 3)) AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
            ), j AS (
                SELECT c.id_a, c.id_b,
                       round(len(list_filter(list_zip(a.sig, b.sig),
                                             x -> x[1] = x[2])) / 8.0, 6)
                           AS est_sim,
                       round(len(list_intersect(a.sh, b.sh))
                             / CAST(len(list_distinct(
                                   list_concat(a.sh, b.sh))) AS DOUBLE), 6)
                           AS exact_sim
                FROM cands c
                JOIN sigs a ON a.id = c.id_a
                JOIN sigs b ON b.id = c.id_b
            )
            SELECT id_a, id_b, est_sim, exact_sim,
                   round(abs(est_sim - exact_sim), 6) + 0.0 AS abs_err
            FROM j ORDER BY id_a, id_b
        """,
        "hll_daily_rollup": """
            WITH h AS (
                SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS scope,
                       md5(CAST(user_id AS VARCHAR)) AS hx,
                       user_id
                FROM events WHERE user_id IS NOT NULL
            ), rr AS (
                SELECT scope,
                       CAST(CAST(('0x' || substr(hx, 1, 1)) AS UBIGINT) AS INT)
                           AS hll_reg,
                       regexp_replace(substr(hx, 2, 14), '^0+', '') AS t
                FROM h
            ), rho AS (
                SELECT scope, hll_reg,
                       CASE WHEN t = '' THEN 57
                            ELSE 4 * (14 - length(t))
                                 + CASE WHEN substr(t, 1, 1) IN
                                          ('8','9','a','b','c','d','e','f')
                                        THEN 0
                                        WHEN substr(t, 1, 1) IN
                                          ('4','5','6','7') THEN 1
                                        WHEN substr(t, 1, 1) IN ('2','3')
                                        THEN 2 ELSE 3 END
                                 + 1 END AS rho
                FROM rr
            ), regs AS (
                SELECT scope, hll_reg, MAX(rho) AS mrho
                FROM rho GROUP BY 1, 2
                UNION ALL
                SELECT 'ALL' AS scope, hll_reg, MAX(rho) AS mrho
                FROM rho GROUP BY 'ALL', hll_reg
            ), agg AS (
                SELECT scope,
                       count(*) AS hll_registers,
                       CAST(SUM(CAST((CAST(1 AS BIGINT) << (57 - mrho))
                                     AS DECIMAL(38,0)))
                            AS DECIMAL(38,0)) AS s_present
                FROM regs GROUP BY 1
            ), est AS (
                SELECT scope,
                       16 - hll_registers AS zr,
                       CAST(CAST(s_present AS HUGEINT)
                            + (16 - hll_registers)
                              * CAST(144115188075855872 AS HUGEINT)
                            AS BIGINT) AS hll_sum
                FROM agg
            ), ex AS (
                SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS scope,
                       count(DISTINCT user_id) AS exact_distinct
                FROM events GROUP BY 1
                UNION ALL
                SELECT 'ALL', count(DISTINCT user_id) FROM events
            )
            SELECT e.scope,
                   CASE WHEN CAST('2.482931752321306e+19' AS DOUBLE)
                             / CAST(e.hll_sum AS DOUBLE)
                             <= CAST('40.0' AS DOUBLE)
                             AND e.zr > 0
                        THEN CAST('16.0' AS DOUBLE)
                             * ln(CAST('16.0' AS DOUBLE)
                                  / CAST(e.zr AS DOUBLE))
                        ELSE CAST('2.482931752321306e+19' AS DOUBLE)
                             / CAST(e.hll_sum AS DOUBLE) END AS hll_estimate,
                   x.exact_distinct
            FROM est e JOIN ex x USING (scope)
            ORDER BY e.scope
        """,
        "outlier_ensemble_events": """
            WITH stats AS (
                SELECT event_type,
                       round(quantile_cont(value, 0.5), 6) AS med,
                       round(quantile_cont(value, 0.25), 6) AS q1,
                       round(quantile_cont(value, 0.75), 6) AS q3,
                       count(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)
                           AS s,
                       CAST(SUM(CAST(value * value AS DECIMAL(28,12)))
                            AS DOUBLE) AS s2
                FROM events GROUP BY 1
            ), mad AS (
                SELECT e.event_type,
                       round(quantile_cont(abs(e.value - t.med), 0.5), 6)
                           AS mad
                FROM events e JOIN stats t USING (event_type)
                GROUP BY 1
            ), f AS (
                SELECT e.event_type,
                       (abs(e.value - t.med) > 3.0 * d.mad) AS f_mad,
                       (e.value < t.q1 - 1.5 * (t.q3 - t.q1)
                        OR e.value > t.q3 + 1.5 * (t.q3 - t.q1)) AS f_iqr,
                       (t.n > 1 AND
                        abs(e.value - round(t.s / CAST(t.n AS DOUBLE), 6))
                        > 3.0 * round(sqrt(greatest(
                              (t.s2 - t.s * t.s / CAST(t.n AS DOUBLE))
                              / (CAST(t.n AS DOUBLE) - 1.0), 0.0)), 6))
                           AS f_z
                FROM events e
                JOIN stats t USING (event_type)
                JOIN mad d USING (event_type)
            )
            SELECT event_type, count(*) AS n,
                   CAST(sum(CASE WHEN f_mad THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_mad,
                   CAST(sum(CASE WHEN f_iqr THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_iqr,
                   CAST(sum(CASE WHEN f_z THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_z,
                   CAST(sum(CASE WHEN f_mad OR f_iqr OR f_z
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_any,
                   CAST(sum(CASE WHEN f_mad AND f_iqr AND f_z
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_all
            FROM f GROUP BY event_type ORDER BY event_type
        """,
        "quantile_bins_orders": """
            WITH e AS (
                SELECT """ + ", ".join(
                    f"round(quantile_cont(o_totalprice, {i}/10.0), 6) AS e{i}"
                    for i in range(1, 10)) + """
                FROM orders
            ), assigned AS (
                SELECT CASE
                           WHEN o_totalprice >= e9 THEN 9
                           WHEN o_totalprice >= e8 THEN 8
                           WHEN o_totalprice >= e7 THEN 7
                           WHEN o_totalprice >= e6 THEN 6
                           WHEN o_totalprice >= e5 THEN 5
                           WHEN o_totalprice >= e4 THEN 4
                           WHEN o_totalprice >= e3 THEN 3
                           WHEN o_totalprice >= e2 THEN 2
                           WHEN o_totalprice >= e1 THEN 1
                           ELSE 0 END AS bin
                FROM orders CROSS JOIN e
            ), counts AS (
                SELECT bin, count(*) AS n_rows FROM assigned GROUP BY bin
            ), bins AS (
                SELECT CAST(i AS INT) AS bin,
                       CASE i WHEN 1 THEN e1 WHEN 2 THEN e2 WHEN 3 THEN e3
                              WHEN 4 THEN e4 WHEN 5 THEN e5 WHEN 6 THEN e6
                              WHEN 7 THEN e7 WHEN 8 THEN e8 WHEN 9 THEN e9
                       END AS lo,
                       CASE i WHEN 0 THEN e1 WHEN 1 THEN e2 WHEN 2 THEN e3
                              WHEN 3 THEN e4 WHEN 4 THEN e5 WHEN 5 THEN e6
                              WHEN 6 THEN e7 WHEN 7 THEN e8 WHEN 8 THEN e9
                       END AS hi
                FROM generate_series(0, 9) AS t(i) CROSS JOIN e
            )
            SELECT b.bin, b.lo, b.hi,
                   CAST(COALESCE(c.n_rows, 0) AS BIGINT) AS n_rows
            FROM bins b LEFT JOIN counts c USING (bin)
            ORDER BY b.bin
        """,
        "streaming_hll_cardinality": """
            WITH h AS (
                SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                       md5(CAST(user_id AS VARCHAR)) AS hx
                FROM events WHERE user_id IS NOT NULL
            ), rr AS (
                SELECT day,
                       CAST(CAST(('0x' || substr(hx, 1, 1)) AS UBIGINT) AS INT)
                           AS hll_reg,
                       regexp_replace(substr(hx, 2, 14), '^0+', '') AS t
                FROM h
            ), rho AS (
                SELECT day, hll_reg,
                       CASE WHEN t = '' THEN 57
                            ELSE 4 * (14 - length(t))
                                 + CASE WHEN substr(t, 1, 1) IN
                                          ('8','9','a','b','c','d','e','f')
                                        THEN 0
                                        WHEN substr(t, 1, 1) IN
                                          ('4','5','6','7') THEN 1
                                        WHEN substr(t, 1, 1) IN ('2','3')
                                        THEN 2 ELSE 3 END
                                 + 1 END AS rho
                FROM rr
            ), regs AS (
                SELECT day, hll_reg, MAX(rho) AS mrho
                FROM rho GROUP BY 1, 2
            ), agg AS (
                SELECT day, count(*) AS hll_registers,
                       CAST(SUM(CAST((CAST(1 AS BIGINT) << (57 - mrho))
                                     AS DECIMAL(38,0)))
                            AS DECIMAL(38,0)) AS s_present
                FROM regs GROUP BY 1
            ), est AS (
                SELECT day, 16 - hll_registers AS zr,
                       CAST(CAST(s_present AS HUGEINT)
                            + (16 - hll_registers)
                              * CAST(144115188075855872 AS HUGEINT)
                            AS BIGINT) AS hll_sum
                FROM agg
            ), ex AS (
                SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                       count(DISTINCT user_id) AS exact_distinct
                FROM events GROUP BY 1
            )
            SELECT e.day,
                   CASE WHEN CAST('2.482931752321306e+19' AS DOUBLE)
                             / CAST(e.hll_sum AS DOUBLE)
                             <= CAST('40.0' AS DOUBLE)
                             AND e.zr > 0
                        THEN CAST('16.0' AS DOUBLE)
                             * ln(CAST('16.0' AS DOUBLE)
                                  / CAST(e.zr AS DOUBLE))
                        ELSE CAST('2.482931752321306e+19' AS DOUBLE)
                             / CAST(e.hll_sum AS DOUBLE) END AS hll_estimate,
                   x.exact_distinct
            FROM est e JOIN ex x USING (day)
            ORDER BY e.day
        """,
        "dedup_group_quality_docs": f"""
            WITH RECURSIVE base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([md5(sig[1] || '|' || sig[2]),
                                       md5(sig[3] || '|' || sig[4]),
                                       md5(sig[5] || '|' || sig[6]),
                                       md5(sig[7] || '|' || sig[8])]) AS bucket,
                       unnest(generate_series(0, 3)) AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                       l.sh AS sh_a, r.sh AS sh_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
            ), pairs AS (
                SELECT id_a, id_b,
                       round(len(list_intersect(sh_a, sh_b))
                             / CAST(len(list_distinct(
                                   list_concat(sh_a, sh_b))) AS DOUBLE), 6)
                           AS sim
                FROM cands
                WHERE round(len(list_intersect(sh_a, sh_b))
                            / CAST(len(list_distinct(list_concat(sh_a, sh_b)))
                                   AS DOUBLE), 6) >= 0.5
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ), reach AS (
                SELECT src AS node, src AS r FROM edges
                UNION
                SELECT reach.node, e.dst FROM reach
                JOIN edges e ON reach.r = e.src
            ), grp AS (
                SELECT node, min(r) AS group_id FROM reach GROUP BY node
            ), sizes AS (
                SELECT group_id, count(*) AS group_size FROM grp GROUP BY 1
            ), estats AS (
                SELECT g.group_id, count(*) AS n_edges,
                       min(p.sim) AS min_sim,
                       round(CAST(SUM(CAST(p.sim AS DECIMAL(18,12)))
                                  AS DOUBLE) / count(*), 6) AS mean_sim
                FROM pairs p JOIN grp g ON p.id_a = g.node
                GROUP BY 1
            )
            SELECT s.group_id, s.group_size, e.n_edges, e.min_sim, e.mean_sim
            FROM sizes s JOIN estats e USING (group_id)
            ORDER BY s.group_id
        """,
        "vocab_coverage_docs": f"""
            WITH counts AS (
                SELECT t, count(*) AS n FROM (
                    SELECT unnest(string_split({_NORM}, ' ')) AS t
                    FROM documents)
                WHERE t <> '' GROUP BY t
            ), ranked AS (
                SELECT n, row_number() OVER (ORDER BY n DESC, t) AS r
                FROM counts
            ), agg AS (
                SELECT CAST(SUM(n) AS BIGINT) AS tot,
                       {", ".join(
                           f"CAST(SUM(CASE WHEN r <= {s} THEN n ELSE 0 END)"
                           f" AS BIGINT) AS c{s},"
                           f" CAST(SUM(CASE WHEN r <= {s} THEN 1 ELSE 0 END)"
                           f" AS BIGINT) AS k{s}"
                           for s in VOCAB_SIZES)}
                FROM ranked
            ), cp AS (
                {" UNION ALL ".join(
                    f"SELECT CAST({s} AS INT) AS vocab_size, k{s} AS n_terms,"
                    f" c{s} AS covered_tokens, tot AS total_tokens FROM agg"
                    for s in VOCAB_SIZES)}
            )
            SELECT vocab_size, n_terms, covered_tokens, total_tokens,
                   round(CAST(covered_tokens AS DOUBLE)
                         / CAST(total_tokens AS DOUBLE), 6) AS coverage
            FROM cp ORDER BY vocab_size
        """,
        "burstiness_events": """
            WITH b AS (
                SELECT event_type AS key,
                       CAST(floor(CAST(floor(epoch(ts)) AS BIGINT)
                                  / 86400.0) AS BIGINT) AS bk,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), g AS (
                SELECT key, count(*) AS n_buckets,
                       CAST(SUM(CAST(n AS DECIMAL(28,12))) AS DOUBLE) AS s,
                       CAST(SUM(CAST(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                     AS DECIMAL(28,12))) AS DOUBLE) AS s2
                FROM b GROUP BY 1
            )
            SELECT key, n_buckets,
                   round(s / CAST(n_buckets AS DOUBLE), 6) AS mean_count,
                   CASE WHEN n_buckets > 1
                        THEN round(greatest(
                                 (s2 - s * s / CAST(n_buckets AS DOUBLE))
                                 / (CAST(n_buckets AS DOUBLE) - 1.0), 0.0),
                                 6) + 0.0
                   END AS var_count,
                   CASE WHEN n_buckets > 1
                             AND s / CAST(n_buckets AS DOUBLE) > 0
                        THEN round(greatest(
                                 (s2 - s * s / CAST(n_buckets AS DOUBLE))
                                 / (CAST(n_buckets AS DOUBLE) - 1.0), 0.0)
                                 / (s / CAST(n_buckets AS DOUBLE)), 6) + 0.0
                   END AS fano
            FROM g ORDER BY key
        """,
        "lorenz_curve_orders": """
            WITH ranked AS (
                SELECT o_totalprice AS v,
                       row_number() OVER (ORDER BY o_totalprice) AS r
                FROM orders
            ), tot AS (
                SELECT count(*) AS n,
                       SUM(CAST(v AS DECIMAL(28,12))) AS t
                FROM ranked
            ), agg AS (
                SELECT """ + ", ".join(
                    f"SUM(CASE WHEN r <= n * {i} / 10 THEN"
                    f" CAST(v AS DECIMAL(28,12))"
                    f" ELSE CAST(0 AS DECIMAL(28,12)) END) AS c{i}"
                    for i in range(1, 11)) + """,
                       any_value(n) AS n_total, any_value(t) AS tsum
                FROM ranked CROSS JOIN tot
            )
            SELECT * FROM (
            """ + " UNION ALL ".join(
                    f"SELECT CAST({i * 10} AS INT) AS pctile,"
                    f" CAST(n_total * {i} // 10 AS BIGINT) AS n_rows,"
                    f" round(CAST(c{i} AS DOUBLE) / CAST(tsum AS DOUBLE), 6)"
                    f" AS cum_value_share FROM agg"
                    for i in range(1, 11)) + """
            ) ORDER BY pctile
        """,
        "langid_confusion_docs": f"""
            WITH t AS (
                SELECT lang,
                       CASE WHEN len(list_filter(
                                list_transform(
                                    regexp_split_to_array(trim(text), '\\s+'),
                                    t -> lower(t)),
                                t -> list_contains({_STOPWORDS_SQL}, t)))
                            / CAST(len(regexp_split_to_array(trim(text),
                                                             '\\s+'))
                                   AS DOUBLE) >= 0.05
                            THEN 'en' ELSE 'unknown' END AS lang_pred
                FROM documents
            ), cell AS (
                SELECT lang, lang_pred, count(*) AS n_docs
                FROM t GROUP BY 1, 2
            )
            SELECT lang, lang_pred, n_docs,
                   round(CAST(n_docs AS DOUBLE)
                         / CAST(SUM(n_docs) OVER (PARTITION BY lang)
                                AS DOUBLE), 6) AS label_share
            FROM cell ORDER BY lang, lang_pred
        """,
        "kappa_langid_docs": f"""
            WITH cell AS (
                SELECT lang AS a,
                       CASE WHEN len(list_filter(
                                list_transform(
                                    regexp_split_to_array(trim(text), '\\s+'),
                                    t -> lower(t)),
                                t -> list_contains({_STOPWORDS_SQL}, t)))
                            / CAST(len(regexp_split_to_array(trim(text),
                                                             '\\s+'))
                                   AS DOUBLE) >= 0.05
                            THEN 'en' ELSE 'unknown' END AS b,
                       count(*) AS n
                FROM documents GROUP BY 1, 2
            ), rw AS (
                SELECT a, SUM(n) AS ra FROM cell GROUP BY a
            ), cl AS (
                SELECT b, SUM(n) AS cb FROM cell GROUP BY b
            ), pe_num AS (
                SELECT CAST(SUM(CAST(CAST(ra * cb AS DOUBLE)
                                     AS DECIMAL(38,2))) AS DOUBLE)
                           AS pe_num
                FROM rw JOIN cl ON rw.a = cl.b
            ), base AS (
                SELECT CAST(SUM(n) AS BIGINT) AS n_items,
                       CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END)
                            AS BIGINT) AS diag
                FROM cell
            )
            SELECT n_items,
                   round(CAST(diag AS DOUBLE)
                         / CAST(n_items AS DOUBLE), 6) + 0.0 AS po,
                   round(pe_num / CAST(n_items AS DOUBLE)
                                / CAST(n_items AS DOUBLE), 6) + 0.0 AS pe,
                   round((CAST(diag AS DOUBLE) / CAST(n_items AS DOUBLE)
                          - pe_num / CAST(n_items AS DOUBLE)
                                   / CAST(n_items AS DOUBLE))
                         / (1.0 - pe_num / CAST(n_items AS DOUBLE)
                                         / CAST(n_items AS DOUBLE)), 6)
                       + 0.0 AS kappa
            FROM base CROSS JOIN pe_num
        """,
        "experiment_power_orders": f"""
            WITH u AS (
                SELECT o_custkey,
                       CASE WHEN substr(md5('{PW_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       MAX(CASE WHEN o_orderpriority = '1-URGENT'
                                THEN 1 ELSE 0 END) AS conv
                FROM orders GROUP BY 1
            ), per AS (
                SELECT arm, count(*) AS n, SUM(conv) AS c
                FROM u GROUP BY arm
            ), ab AS (
                SELECT CAST(MAX(CASE WHEN arm = 'A' THEN n END) AS BIGINT)
                           AS na,
                       CAST(MAX(CASE WHEN arm = 'A' THEN c END) AS BIGINT)
                           AS ca,
                       CAST(MAX(CASE WHEN arm = 'B' THEN n END) AS BIGINT)
                           AS nb,
                       CAST(MAX(CASE WHEN arm = 'B' THEN c END) AS BIGINT)
                           AS cb
                FROM per
            ), s AS (
                SELECT na, nb,
                       CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE)
                           AS pool
                FROM ab
            ), m AS (
                SELECT na, nb, pool,
                       ({Z_ALPHA_SQL} + {Z_POWER_SQL})
                       * sqrt((pool * (1.0 - pool))
                              * ((1.0 / CAST(na AS DOUBLE))
                                 + (1.0 / CAST(nb AS DOUBLE)))) AS mde
                FROM s
            )
            SELECT na AS n_a, nb AS n_b,
                   round(pool, 6) + 0.0 AS pooled_rate,
                   round(mde, 6) + 0.0 AS mde_abs,
                   round(mde / pool, 6) + 0.0 AS mde_rel
            FROM m
        """,
        "tokenizer_fertility_docs": f"""
            WITH f AS (
                SELECT source,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+')) END
                           AS w,
                       len(regexp_extract_all(text,
                           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS s,
                       octet_length(encode(text)) AS b
                FROM documents
            )
            SELECT source,
                   count(*) AS n_docs,
                   CAST(SUM(w) AS BIGINT) AS n_words,
                   CAST(SUM(s) AS BIGINT) AS n_subtokens,
                   CAST(SUM(b) AS BIGINT) AS n_bytes,
                   round(CAST(SUM(s) AS DOUBLE)
                         / CAST(SUM(w) AS DOUBLE), 6) + 0.0 AS fertility,
                   round(CAST(SUM(b) AS DOUBLE)
                         / CAST(SUM(s) AS DOUBLE), 6) + 0.0
                       AS bytes_per_subtoken
            FROM f GROUP BY source ORDER BY source
        """,
        "dup_rate_by_length_docs": f"""
            WITH f AS (
                SELECT doc_id, length(text) AS chars,
                       md5({_NORM}) AS fp
                FROM documents
            ), fpc AS (
                SELECT fp, count(*) AS c FROM f GROUP BY fp
            ), t AS (
                SELECT CAST(ntile(10) OVER (ORDER BY chars, doc_id)
                            AS INT) AS decile,
                       chars,
                       CASE WHEN fpc.c > 1 THEN 1 ELSE 0 END AS isdup
                FROM f JOIN fpc USING (fp)
            )
            SELECT decile, count(*) AS n_docs,
                   CAST(SUM(isdup) AS BIGINT) AS n_dups,
                   round(CAST(SUM(isdup) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS dup_rate,
                   round(CAST(SUM(chars) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS mean_chars
            FROM t GROUP BY decile ORDER BY decile
        """,
        "source_length_ks": """
            WITH c AS (
                SELECT source AS s, n_chars AS x, count(*) AS n
                FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2
            ), grid AS (
                SELECT s, x FROM (SELECT DISTINCT s FROM c)
                CROSS JOIN (SELECT DISTINCT x FROM c)
            ), filled AS (
                SELECT g.s, g.x, COALESCE(c.n, 0) AS n
                FROM grid g LEFT JOIN c ON c.s = g.s AND c.x = g.x
            ), stepped AS (
                SELECT s, x,
                       SUM(n) OVER (PARTITION BY s ORDER BY x
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS c_s,
                       SUM(n) OVER (PARTITION BY s) AS n_s
                FROM filled
            ), g0 AS (
                SELECT n_chars AS x, count(*) AS gn FROM documents
                WHERE n_chars IS NOT NULL GROUP BY 1
            ), gcum AS (
                SELECT x, SUM(gn) OVER (ORDER BY x
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS c_all
                FROM g0
            ), tot AS (
                SELECT count(*) AS t FROM documents WHERE n_chars IS NOT NULL
            )
            SELECT s AS source,
                   CAST(any_value(n_s) AS BIGINT) AS n_source,
                   CAST(any_value(t - n_s) AS BIGINT) AS n_rest,
                   round(MAX(abs(CAST(c_s AS DOUBLE) / CAST(n_s AS DOUBLE)
                                 - CAST(c_all - c_s AS DOUBLE)
                                   / CAST(t - n_s AS DOUBLE))), 6)
                       AS ks_stat
            FROM stepped JOIN gcum USING (x) CROSS JOIN tot
            WHERE n_s > 0 AND t - n_s > 0
            GROUP BY s ORDER BY s
        """,
        "dedup_rate_by_source": f"""
            WITH RECURSIVE keep AS (
                SELECT min(doc_id) AS doc_id FROM (
                    SELECT doc_id, md5({_NORM}) AS fp FROM documents)
                GROUP BY fp
            ), base AS (
                SELECT d.doc_id AS id, {_shingle_sql()} AS sh
                FROM documents d JOIN keep k ON d.doc_id = k.doc_id
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([md5(sig[1] || '|' || sig[2]),
                                       md5(sig[3] || '|' || sig[4]),
                                       md5(sig[5] || '|' || sig[6]),
                                       md5(sig[7] || '|' || sig[8])]) AS bucket,
                       unnest(generate_series(0, 3)) AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                       l.sh AS sh_a, r.sh AS sh_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
            ), pairs AS (
                SELECT id_a, id_b FROM cands
                WHERE round(len(list_intersect(sh_a, sh_b))
                            / CAST(len(list_distinct(list_concat(sh_a, sh_b)))
                                   AS DOUBLE), 6) >= 0.7
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ), reach AS (
                SELECT src AS node, src AS r FROM edges
                UNION
                SELECT reach.node, e.dst FROM reach
                JOIN edges e ON reach.r = e.src
            ), near_drop AS (
                SELECT node AS doc_id FROM (
                    SELECT node, min(r) AS grp FROM reach GROUP BY node)
                WHERE node <> grp
            )
            SELECT d.source, count(*) AS n_docs,
                   CAST(sum(CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_exact_dup,
                   CAST(sum(CASE WHEN n.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_near_dup,
                   round(CAST(sum(CASE WHEN k.doc_id IS NULL THEN 1 ELSE 0 END)
                              + sum(CASE WHEN n.doc_id IS NOT NULL
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS dup_rate
            FROM documents d
            LEFT JOIN keep k ON d.doc_id = k.doc_id
            LEFT JOIN near_drop n ON d.doc_id = n.doc_id
            GROUP BY d.source ORDER BY d.source
        """,
        "budget_sample_docs": """
            WITH r AS (
                SELECT source, doc_id, n_chars,
                       substr(md5('bs7-' || CAST(doc_id AS VARCHAR)), 1, 6)
                           AS h
                FROM documents
            ), c AS (
                SELECT source, n_chars,
                       COALESCE(SUM(n_chars) OVER (
                           PARTITION BY source ORDER BY h, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS prior
                FROM r
            )
            SELECT source, count(*) AS n_kept,
                   CAST(SUM(n_chars) AS BIGINT) AS chars_kept
            FROM c WHERE prior < 3000
            GROUP BY source ORDER BY source
        """,
        "embedding_drift_labels": """
            WITH ex AS (
                SELECT label, CAST(vec_id % 2 = 0 AS INT) AS ev,
                       CAST(pos AS INT) AS pos, CAST(v AS DOUBLE) AS v
                FROM (SELECT vec_id, label, unnest(embedding) AS v,
                             unnest(generate_series(0, len(embedding) - 1))
                                 AS pos
                      FROM embeddings)
            ), s AS (
                SELECT label, ev, pos,
                       CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                           / count(*) AS m,
                       count(*) AS n
                FROM ex GROUP BY 1, 2, 3
            ), lists AS (
                SELECT label,
                       list(m ORDER BY pos) FILTER (WHERE ev = 1) AS la,
                       list(m ORDER BY pos) FILTER (WHERE ev = 0) AS lb,
                       any_value(n) FILTER (WHERE ev = 1) AS n_even,
                       any_value(n) FILTER (WHERE ev = 0) AS n_odd
                FROM s GROUP BY label
            )
            SELECT label,
                   CAST(COALESCE(n_even, 0) AS BIGINT) AS n_even,
                   CAST(COALESCE(n_odd, 0) AS BIGINT) AS n_odd,
                   CASE WHEN n_even IS NOT NULL AND n_odd IS NOT NULL THEN
                       round(sqrt(list_sum(list_transform(
                           list_zip(la, lb),
                           x -> (x[1] - x[2]) * (x[1] - x[2])))), 6) + 0.0
                   END AS drift
            FROM lists ORDER BY label
        """,
        "event_gap_percentiles": """
            WITH g AS (
                SELECT event_type,
                       CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id)
                           AS gap
                FROM events
            )
            SELECT event_type, count(*) AS n_gaps,
                   round(quantile_cont(gap, 0.5), 6) AS p50_gap_s,
                   round(quantile_cont(gap, 0.9), 6) AS p90_gap_s,
                   CAST(max(gap) AS BIGINT) AS max_gap_s
            FROM g WHERE gap IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "prefix_dup_docs": f"""
            SELECT substr({_NORM}, 1, 24) AS prefix,
                   count(*) AS n_docs,
                   count(DISTINCT source) AS n_sources
            FROM documents
            GROUP BY 1 HAVING count(*) > 1
            ORDER BY prefix
        """,
        "user_activity_stats": """
            WITH per_user AS (
                SELECT user_id, count(*) AS n FROM events GROUP BY 1
            )
            SELECT count(*) AS n_users,
                   round(quantile_cont(n, 0.5), 6) AS p50_events,
                   round(quantile_cont(n, 0.9), 6) AS p90_events,
                   round(quantile_cont(n, 0.99), 6) AS p99_events,
                   CAST(max(n) AS BIGINT) AS max_events
            FROM per_user
        """,
        "shipping_lag_percentiles": """
            WITH j AS (
                SELECT o.o_orderpriority,
                       CAST(CAST(l.l_shipdate AS DATE)
                            - CAST(o.o_orderdate AS DATE) AS DOUBLE) AS lag
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            )
            SELECT o_orderpriority, count(*) AS n_lines,
                   round(quantile_cont(lag, 0.5), 6) + 0.0 AS p50_lag_days,
                   round(quantile_cont(lag, 0.9), 6) + 0.0 AS p90_lag_days,
                   round(quantile_cont(lag, 0.99), 6) + 0.0 AS p99_lag_days,
                   max(lag) AS max_lag_days
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "rfm_segments_orders": """
            WITH per AS (
                SELECT o_custkey,
                       max(o_orderdate) AS last_t,
                       count(*) AS freq,
                       SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS mon_dec
                FROM orders GROUP BY 1
            ), anch AS (
                SELECT max(o_orderdate) AS anchor FROM orders
            ), scored AS (
                SELECT o_custkey, mon_dec,
                       ntile(5) OVER (ORDER BY
                           CAST(anchor AS DATE) - CAST(last_t AS DATE) ASC,
                           o_custkey) AS r_score,
                       ntile(5) OVER (ORDER BY freq DESC, o_custkey)
                           AS f_score,
                       ntile(5) OVER (ORDER BY CAST(mon_dec AS DOUBLE) DESC,
                                      o_custkey) AS m_score
                FROM per CROSS JOIN anch
            )
            SELECT CAST(r_score AS INT) AS r_score,
                   CAST(f_score AS INT) AS f_score,
                   CAST(m_score AS INT) AS m_score,
                   count(*) AS n_keys,
                   round(CAST(SUM(mon_dec) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0
                       AS avg_monetary
            FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "transition_entropy_events": """
            WITH p AS (
                SELECT event_type AS from_type,
                       lead(event_type) OVER w AS to_type
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), cnt AS (
                SELECT from_type, to_type, count(*) AS n FROM p
                WHERE to_type IS NOT NULL GROUP BY 1, 2
            ), terms AS (
                SELECT from_type, n,
                       CAST(-((CAST(n AS DOUBLE)
                               / CAST(SUM(n) OVER (PARTITION BY from_type)
                                      AS DOUBLE))
                              * ln(CAST(n AS DOUBLE)
                                   / CAST(SUM(n) OVER (
                                         PARTITION BY from_type)
                                         AS DOUBLE)))
                            AS DECIMAL(18,12)) AS term
                FROM cnt
            ), g AS (
                SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_trans_total,
                       count(*) AS n_next_types, SUM(term) AS h
                FROM terms GROUP BY 1
            )
            SELECT from_type, n_trans_total, n_next_types,
                   round(CAST(h AS DOUBLE), 6) + 0.0 AS entropy_nats,
                   CASE WHEN n_next_types > 1
                        THEN round(CAST(h AS DOUBLE)
                                   / ln(CAST(n_next_types AS DOUBLE)), 6)
                             + 0.0
                        ELSE 0.0 END AS norm_entropy
            FROM g ORDER BY from_type
        """,
        "holt_linear_events": """
            WITH RECURSIVE daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), ser AS (
                SELECT event_type, day, n,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY day) AS idx
                FROM daily
            ), h AS (
                SELECT event_type, day, n, idx,
                       CAST(n AS DOUBLE) AS level,
                       CAST(0.0 AS DOUBLE) AS trend
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT s.event_type, s.day, s.n, s.idx,
                       0.5 * CAST(s.n AS DOUBLE)
                           + 0.5 * (p.level + p.trend),
                       0.5 * ((0.5 * CAST(s.n AS DOUBLE)
                               + 0.5 * (p.level + p.trend)) - p.level)
                           + 0.5 * p.trend
                FROM ser s JOIN h p
                  ON s.event_type = p.event_type AND s.idx = p.idx + 1
            )
            SELECT event_type, day, n, level, trend,
                   level + trend AS forecast
            FROM h ORDER BY event_type, day
        """,
        "embedding_norm_stats": """
            WITH b AS (
                SELECT label AS "group",
                       round(sqrt(round(list_sum(list_transform(embedding,
                           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
                           9)), 6) AS nrm
                FROM embeddings WHERE embedding IS NOT NULL
            )
            SELECT "group", count(*) AS n_vecs,
                   round(quantile_cont(nrm, 0.5), 6) + 0.0 AS p50_norm,
                   round(quantile_cont(nrm, 0.9), 6) + 0.0 AS p90_norm,
                   min(nrm) AS min_norm,
                   max(nrm) AS max_norm,
                   round(CAST(SUM(CAST(nrm AS DECIMAL(18,12))) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS mean_norm
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "dup_lang_confusion_docs": f"""
            WITH base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([{band_entries}]) AS bucket,
                       unnest(generate_series(0, {MINHASH_BANDS - 1}))
                           AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                       l.sh AS sh_a, r.sh AS sh_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket
                     AND l.id < r.id
            ), prs AS (
                SELECT id_a, id_b,
                       round(len(list_intersect(sh_a, sh_b))
                             / CAST(len(list_distinct(
                                   list_concat(sh_a, sh_b))) AS DOUBLE),
                             6) AS sim
                FROM cands
                WHERE round(len(list_intersect(sh_a, sh_b))
                            / CAST(len(list_distinct(
                                  list_concat(sh_a, sh_b))) AS DOUBLE), 6)
                      >= {LSH_THRESHOLD}
            ), lab AS (
                SELECT doc_id AS id, lang FROM documents
            ), j AS (
                SELECT least(a.lang, b.lang) AS label_a,
                       greatest(a.lang, b.lang) AS label_b, sim
                FROM prs
                JOIN lab a ON a.id = prs.id_a
                JOIN lab b ON b.id = prs.id_b
            )
            SELECT label_a, label_b, count(*) AS n_pairs,
                   round(CAST(SUM(CAST(sim AS DECIMAL(18,12))) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS mean_sim
            FROM j GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "chunk_dup_docs": f"""
            WITH toks AS (
                SELECT doc_id, source, string_split({_NORM}, ' ') AS t
                FROM documents
            ), nc AS (
                SELECT doc_id, source, t,
                       greatest((len(t) + 11) // 12, 1) AS n_chunks
                FROM toks
            ), c AS (
                SELECT source,
                       md5(array_to_string(
                           t[ci * 12 + 1 : ci * 12 + 12], ' ')) AS fp
                FROM (SELECT source, t,
                             unnest(generate_series(0, n_chunks - 1)) AS ci
                      FROM nc)
            ), fc AS (
                SELECT fp, count(*) AS c FROM c GROUP BY fp
            )
            SELECT source, count(*) AS n_chunks,
                   CAST(SUM(CASE WHEN fc.c > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_dup_chunks,
                   round(CAST(SUM(CASE WHEN fc.c > 1 THEN 1 ELSE 0 END)
                              AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0
                       AS dup_chunk_rate
            FROM c JOIN fc USING (fp) GROUP BY source ORDER BY source
        """,
        "token_len_histogram_docs": f"""
            WITH toks AS (
                SELECT unnest(string_split({_NORM}, ' ')) AS t
                FROM documents
            ), g AS (
                SELECT CAST(least(length(t), 12) AS INT) AS token_len,
                       count(*) AS n_tokens
                FROM toks WHERE t <> '' GROUP BY 1
            )
            SELECT token_len, n_tokens,
                   round(CAST(n_tokens AS DOUBLE)
                         / CAST(SUM(n_tokens) OVER () AS DOUBLE), 6) + 0.0
                       AS share
            FROM g ORDER BY token_len
        """,
        "hll_overlap_events": f"""
            WITH h AS (
                SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
                FROM events WHERE user_id IS NOT NULL
            ), rr AS (
                SELECT event_type,
                       CAST(CAST(('0x' || substr(hx, 1, 1)) AS UBIGINT)
                            AS INT) AS hll_reg,
                       regexp_replace(substr(hx, 2, 14), '^0+', '') AS t
                FROM h
            ), rho AS (
                SELECT event_type, hll_reg,
                       CASE WHEN t = '' THEN 57
                            ELSE 4 * (14 - length(t))
                                 + CASE WHEN substr(t, 1, 1) IN
                                          ('8','9','a','b','c','d','e','f')
                                        THEN 0
                                        WHEN substr(t, 1, 1) IN
                                          ('4','5','6','7') THEN 1
                                        WHEN substr(t, 1, 1) IN ('2','3')
                                        THEN 2 ELSE 3 END
                                 + 1 END AS rho
                FROM rr
            ), regs AS (
                SELECT event_type, hll_reg, MAX(rho) AS mrho
                FROM rho GROUP BY 1, 2
            ), e1 AS ({_hll_est16_sql("regs", "event_type")}
            ), tp AS (
                SELECT a.event_type AS group_a, b.event_type AS group_b
                FROM (SELECT DISTINCT event_type FROM regs) a
                JOIN (SELECT DISTINCT event_type FROM regs) b
                  ON a.event_type < b.event_type
            ), pregs AS (
                SELECT tp.group_a, tp.group_b, r.hll_reg,
                       MAX(r.mrho) AS mrho
                FROM tp JOIN regs r
                  ON r.event_type = tp.group_a
                     OR r.event_type = tp.group_b
                GROUP BY 1, 2, 3
            ), eu AS ({_hll_est16_sql("pregs", "group_a, group_b")}
            ), ex AS (
                SELECT a.event_type AS group_a, b.event_type AS group_b,
                       count(*) AS n
                FROM (SELECT DISTINCT user_id, event_type FROM events) a
                JOIN (SELECT DISTINCT user_id, event_type FROM events) b
                  ON a.user_id = b.user_id
                     AND a.event_type < b.event_type
                GROUP BY 1, 2
            )
            SELECT tp.group_a, tp.group_b,
                   round(ea.est, 6) + 0.0 AS est_a,
                   round(eb.est, 6) + 0.0 AS est_b,
                   round(eu.est, 6) + 0.0 AS est_union,
                   round(ea.est + eb.est - eu.est, 6) + 0.0
                       AS est_overlap,
                   COALESCE(ex.n, 0) AS exact_overlap
            FROM tp
            JOIN e1 ea ON ea.event_type = tp.group_a
            JOIN e1 eb ON eb.event_type = tp.group_b
            JOIN eu ON eu.group_a = tp.group_a
                   AND eu.group_b = tp.group_b
            LEFT JOIN ex ON ex.group_a = tp.group_a
                        AND ex.group_b = tp.group_b
            ORDER BY 1, 2
        """,
        "dow_hourly_anomaly_events": """
            WITH hourly AS (
                SELECT CAST(ts AS DATE) AS day,
                       CAST(hour(ts) AS INT) AS hour, count(*) AS n
                FROM events GROUP BY 1, 2
            ), hb AS (
                SELECT day, hour, n,
                       (day - DATE '1970-01-01') % 7 AS dw
                FROM hourly
            ), base AS (
                SELECT dw, hour, count(*) AS cells,
                       CAST(SUM(CAST(n AS DECIMAL(28,12))) AS DOUBLE) AS s,
                       CAST(SUM(CAST(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                     AS DECIMAL(28,12))) AS DOUBLE) AS s2
                FROM hb GROUP BY 1, 2
            ), scored AS (
                SELECT hb.day, hb.hour, hb.n,
                       round(s / CAST(cells AS DOUBLE), 6) + 0.0
                           AS mean_count,
                       CASE WHEN cells > 1
                                 AND sqrt(greatest(
                                     (s2 - s * s / CAST(cells AS DOUBLE))
                                     / (CAST(cells AS DOUBLE) - 1.0),
                                     0.0)) > 0
                            THEN round((CAST(hb.n AS DOUBLE)
                                        - s / CAST(cells AS DOUBLE))
                                       / sqrt(greatest(
                                           (s2 - s * s
                                            / CAST(cells AS DOUBLE))
                                           / (CAST(cells AS DOUBLE) - 1.0),
                                           0.0)), 6) + 0.0
                       END AS z
                FROM hb JOIN base USING (dw, hour)
            )
            SELECT day, hour, n, mean_count, z FROM scored
            WHERE abs(z) > 1.5 ORDER BY day, hour
        """,
        "sample_audit_docs": """
            WITH samp AS (
                SELECT lang, n_chars FROM documents
                WHERE substr(md5('s42-' || CAST(doc_id AS VARCHAR)), 1, 6) <
                      CASE lang
                          WHEN 'en' THEN '400000'
                          WHEN 'de' THEN 'cccccc'
                          WHEN 'fr' THEN 'cccccc'
                          WHEN 'es' THEN '800000'
                          WHEN 'zh' THEN '800000'
                          ELSE '199999'
                      END
            ), f AS (
                SELECT lang AS stratum, count(*) AS n_full,
                       round(CAST(SUM(CAST(n_chars AS DECIMAL(28,12)))
                                  AS DOUBLE)
                             / CAST(count(*) AS DOUBLE), 6) + 0.0
                           AS mean_value_full
                FROM documents GROUP BY 1
            ), s AS (
                SELECT lang AS stratum, count(*) AS n_s,
                       round(CAST(SUM(CAST(n_chars AS DECIMAL(28,12)))
                                  AS DOUBLE)
                             / CAST(count(*) AS DOUBLE), 6) + 0.0
                           AS mean_value_sample
                FROM samp GROUP BY 1
            )
            SELECT f.stratum, f.n_full,
                   COALESCE(s.n_s, 0) AS n_sample,
                   round(CAST(COALESCE(s.n_s, 0) AS DOUBLE)
                         / CAST(f.n_full AS DOUBLE), 6) + 0.0
                       AS observed_rate,
                   f.mean_value_full, s.mean_value_sample,
                   round(abs(f.mean_value_full - s.mean_value_sample), 6)
                       + 0.0 AS mean_abs_diff
            FROM f LEFT JOIN s USING (stratum) ORDER BY f.stratum
        """,
        "rrf_fusion_emb": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qvec
                FROM embeddings WHERE vec_id < {N_QUERY_VECS}
            ), full_k AS (
                SELECT query_id, corpus_id, rnk FROM (
                    SELECT q.query_id, c.vec_id AS corpus_id,
                           row_number() OVER (
                               PARTITION BY q.query_id
                               ORDER BY {_cos_sql("q.qvec", "c.embedding")}
                                   DESC, c.vec_id ASC) AS rnk
                    FROM embeddings c, q WHERE c.vec_id <> q.query_id)
                WHERE rnk <= {TOPK}
            ), tr_k AS (
                SELECT query_id, corpus_id, rnk FROM (
                    SELECT q.query_id, c.vec_id AS corpus_id,
                           row_number() OVER (
                               PARTITION BY q.query_id
                               ORDER BY {_cos_sql(
                                   f"q.qvec[1:{MATRYOSHKA_DIMS}]",
                                   f"c.embedding[1:{MATRYOSHKA_DIMS}]")}
                                   DESC, c.vec_id ASC) AS rnk
                    FROM embeddings c, q WHERE c.vec_id <> q.query_id)
                WHERE rnk <= {TOPK}
            ), fused AS (
                SELECT COALESCE(a.query_id, b.query_id) AS query_id,
                       COALESCE(a.corpus_id, b.corpus_id) AS corpus_id,
                       round(COALESCE(1.0 / (60.0 + CAST(a.rnk AS DOUBLE)),
                                      0.0)
                             + COALESCE(1.0
                                        / (60.0 + CAST(b.rnk AS DOUBLE)),
                                        0.0), 6) + 0.0 AS rrf_score
                FROM full_k a
                FULL OUTER JOIN tr_k b
                  ON a.query_id = b.query_id
                     AND a.corpus_id = b.corpus_id
            )
            SELECT query_id, corpus_id, rrf_score,
                   CAST(fused_rank AS INT) AS fused_rank
            FROM (
                SELECT query_id, corpus_id, rrf_score,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY rrf_score DESC, corpus_id ASC)
                           AS fused_rank
                FROM fused)
            WHERE fused_rank <= {TOPK}
            ORDER BY query_id, fused_rank
        """,
        "classifier_lift_docs": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(t) - 1),
                                             i -> t[i] || ' ' || t[i+1]))
                           AS gram
                FROM toks WHERE len(t) >= 2
            ), prs AS (
                SELECT doc_id, substr(md5(gram), 1, {DSIR_BUCKET_HEX}) AS b
                FROM g
            ), scores AS (
                SELECT doc_id,
                       CAST(SUM(CAST(
                           ((ascii(substr(b, 1, 1))
                             + 3 * ascii(substr(b, 2, 1))
                             + 7 * ascii(substr(b, 3, 1))) % 13 - 6) / 8.0
                           AS DECIMAL(28,12))) AS DOUBLE) + ({CLS_BIAS})
                           AS score
                FROM prs GROUP BY doc_id
            ), q AS (
                SELECT doc_id,
                       (n_tok >= 20 AND n_tok <= 1000
                        AND n_alpha / greatest(n_tok, 1) >= 3.0
                        AND n_alpha / greatest(n_tok, 1) <= 10.0
                        AND n_sym / greatest(n_chars_t, 1) <= 0.1
                        AND sw_hits >= 2) AS q_pass
                FROM (
                    SELECT doc_id,
                           CASE WHEN length(trim(text)) = 0 THEN 0
                                ELSE len(regexp_split_to_array(trim(text),
                                                               '\\s+')) END
                               AS n_tok,
                           length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                               AS n_alpha,
                           length(regexp_replace(text, '[A-Za-z0-9\\s]', '',
                                                 'g')) AS n_sym,
                           length(text) AS n_chars_t,
                           len(list_intersect(
                               list_transform(
                                   regexp_split_to_array(trim(text),
                                                         '\\s+'),
                                   t -> lower(t)),
                               {_STOPWORDS_SQL})) AS sw_hits
                    FROM documents)
            ), ranked AS (
                SELECT CASE WHEN q.q_pass THEN 1 ELSE 0 END AS pos,
                       ntile(10) OVER (ORDER BY s.score DESC, s.doc_id)
                           AS bin
                FROM scores s JOIN q USING (doc_id)
            ), gg AS (
                SELECT bin, count(*) AS n_rows,
                       CAST(SUM(pos) AS BIGINT) AS n_pos
                FROM ranked GROUP BY bin
            )
            SELECT CAST(bin AS INT) AS bin, n_rows, n_pos,
                   round(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
                       + 0.0 AS pos_rate,
                   CASE WHEN SUM(n_pos) OVER () > 0 THEN
                       round(CAST(SUM(n_pos) OVER (ORDER BY bin
                                       ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                             / CAST(SUM(n_pos) OVER () AS DOUBLE), 6) + 0.0
                   END AS cum_pos_share,
                   CASE WHEN SUM(n_pos) OVER () > 0 THEN
                       round((CAST(n_pos AS DOUBLE)
                              / CAST(n_rows AS DOUBLE))
                             / (CAST(SUM(n_pos) OVER () AS DOUBLE)
                                / CAST(SUM(n_rows) OVER () AS DOUBLE)), 6)
                       + 0.0
                   END AS lift
            FROM gg ORDER BY bin
        """,
        "conversion_lag_events": """
            WITH b AS (
                SELECT user_id AS k, event_type AS ty,
                       CAST(floor(epoch(ts)) AS BIGINT) AS es
                FROM events
            ), f AS (
                SELECT k, min(es) AS t0 FROM b WHERE ty = 'view'
                GROUP BY 1
            ), c AS (
                SELECT b.k, f.t0, min(b.es) AS t1
                FROM b JOIN f ON b.k = f.k
                WHERE b.ty = 'purchase' AND b.es > f.t0
                GROUP BY 1, 2
            ), l AS (
                SELECT t1 - t0 AS lag FROM c
            ), nf AS (
                SELECT count(*) AS n FROM f
            )
            SELECT nf.n AS n_from_keys, count(*) AS n_converted,
                   round(CAST(count(*) AS DOUBLE) / CAST(nf.n AS DOUBLE), 6)
                       + 0.0 AS conversion_rate,
                   round(quantile_cont(CAST(lag AS DOUBLE), 0.5), 6) + 0.0
                       AS p50_lag_s,
                   round(quantile_cont(CAST(lag AS DOUBLE), 0.9), 6) + 0.0
                       AS p90_lag_s,
                   max(lag) AS max_lag_s
            FROM l CROSS JOIN nf GROUP BY nf.n
        """,
        "lsh_band_precision_docs": f"""
            WITH base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([{band_entries}]) AS bucket,
                       unnest(generate_series(0, {MINHASH_BANDS - 1}))
                           AS band
                FROM sigs
            ), candsb AS (
                SELECT DISTINCT l.band, l.id AS id_a, r.id AS id_b,
                       l.sh AS sh_a, r.sh AS sh_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket
                     AND l.id < r.id
            ), v AS (
                SELECT band,
                       CASE WHEN round(len(list_intersect(sh_a, sh_b))
                                 / CAST(len(list_distinct(
                                       list_concat(sh_a, sh_b)))
                                        AS DOUBLE), 6) >= {LSH_THRESHOLD}
                            THEN 1 ELSE 0 END AS ok
                FROM candsb
            )
            SELECT CAST(band AS INT) AS band,
                   count(*) AS n_candidate_pairs,
                   CAST(SUM(ok) AS BIGINT) AS n_verified,
                   round(CAST(SUM(ok) AS DOUBLE) / CAST(count(*) AS DOUBLE),
                         6) + 0.0 AS "precision"
            FROM v GROUP BY band ORDER BY band
        """,
        "cube_token_stats_docs": f"""
            SELECT source, lang, count(*) AS n_docs,
                   CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+')) END)
                        AS BIGINT) AS n_tokens,
                   CAST(GROUPING(source, lang) AS INT) AS gid
            FROM documents
            GROUP BY CUBE (source, lang)
            ORDER BY gid, source, lang
        """,
        "weighted_median_lineitem": """
            WITH per_val AS (
                SELECT l_returnflag AS "group", l_extendedprice AS v,
                       SUM(CAST(l_quantity AS DECIMAL(18,6))) AS w
                FROM lineitem GROUP BY 1, 2
            ), scored AS (
                SELECT "group", v,
                       CAST(SUM(w) OVER (PARTITION BY "group" ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                           AS cum,
                       CAST(SUM(w) OVER (PARTITION BY "group") AS DOUBLE)
                           AS tot
                FROM per_val
            )
            SELECT "group", round(max(tot), 6) AS total_weight,
                   min(CASE WHEN cum >= 0.25 * tot THEN v END) AS wp_0_25,
                   min(CASE WHEN cum >= 0.5 * tot THEN v END) AS wp_0_5,
                   min(CASE WHEN cum >= 0.75 * tot THEN v END) AS wp_0_75
            FROM scored GROUP BY 1 ORDER BY 1
        """,
        "referential_integrity_counts": """
            WITH rel AS (
                SELECT 'customer.nation' AS relation,
                       (SELECT count(*) FROM customer) AS n_child,
                       (SELECT count(*) FROM customer WHERE c_nationkey IS NOT NULL
                        AND c_nationkey NOT IN (SELECT n_nationkey FROM nation
                                WHERE n_nationkey IS NOT NULL))
                           AS n_orphans
                UNION ALL
                SELECT 'lineitem.order',
                       (SELECT count(*) FROM lineitem),
                       (SELECT count(*) FROM lineitem WHERE l_orderkey IS NOT NULL
                        AND l_orderkey NOT IN (SELECT o_orderkey FROM orders
                                WHERE o_orderkey IS NOT NULL))
                UNION ALL
                SELECT 'lineitem.part',
                       (SELECT count(*) FROM lineitem),
                       (SELECT count(*) FROM lineitem WHERE l_partkey IS NOT NULL
                        AND l_partkey NOT IN (SELECT p_partkey FROM part
                                WHERE p_partkey IS NOT NULL))
                UNION ALL
                SELECT 'lineitem.supplier',
                       (SELECT count(*) FROM lineitem),
                       (SELECT count(*) FROM lineitem WHERE l_suppkey IS NOT NULL
                        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_suppkey IS NOT NULL))
                UNION ALL
                SELECT 'nation.region',
                       (SELECT count(*) FROM nation),
                       (SELECT count(*) FROM nation WHERE n_regionkey IS NOT NULL
                        AND n_regionkey NOT IN (SELECT r_regionkey FROM region
                                WHERE r_regionkey IS NOT NULL))
                UNION ALL
                SELECT 'orders.customer',
                       (SELECT count(*) FROM orders),
                       (SELECT count(*) FROM orders WHERE o_custkey IS NOT NULL
                        AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_custkey IS NOT NULL))
                UNION ALL
                SELECT 'supplier.nation',
                       (SELECT count(*) FROM supplier),
                       (SELECT count(*) FROM supplier WHERE s_nationkey IS NOT NULL
                        AND s_nationkey NOT IN (SELECT n_nationkey FROM nation
                                WHERE n_nationkey IS NOT NULL))
            )
            SELECT relation, n_child, n_orphans,
                   round(CAST(n_orphans AS DOUBLE)
                         / CAST(n_child AS DOUBLE), 6) + 0.0
                       AS orphan_rate
            FROM rel ORDER BY relation
        """,
        "session_cooccurrence_events": """
            WITH ord AS (
                SELECT user_id, event_type, ts, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS es
                FROM events
            ), flg AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(es) OVER w IS NULL
                                 OR es - lag(es) OVER w > 1800
                            THEN 1 ELSE 0 END AS nw
                FROM ord
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), ses AS (
                SELECT user_id, event_type,
                       SUM(nw) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
                FROM flg
            ), baskets AS (
                SELECT DISTINCT user_id AS k, sid, event_type AS ty
                FROM ses
            ), nses AS (
                SELECT count(*) AS n FROM (
                    SELECT DISTINCT k, sid FROM baskets)
            ), pt AS (
                SELECT ty, count(*) AS n_ty FROM baskets GROUP BY 1
            ), co AS (
                SELECT a.ty AS type_a, b.ty AS type_b, count(*) AS n_co
                FROM baskets a JOIN baskets b
                  ON a.k = b.k AND a.sid = b.sid AND a.ty < b.ty
                GROUP BY 1, 2
            )
            SELECT type_a, type_b, n_co AS n_co_sessions,
                   na.n_ty AS n_a_sessions, nb.n_ty AS n_b_sessions,
                   round(CAST(n_co AS DOUBLE) * CAST(nses.n AS DOUBLE)
                         / (CAST(na.n_ty AS DOUBLE)
                            * CAST(nb.n_ty AS DOUBLE)), 6) + 0.0 AS lift
            FROM co
            JOIN pt na ON na.ty = type_a
            JOIN pt nb ON nb.ty = type_b
            CROSS JOIN nses
            ORDER BY type_a, type_b
        """,
        "top_event_paths_events": """
            WITH p AS (
                SELECT event_type AS t0,
                       lead(event_type, 1) OVER w AS t1,
                       lead(event_type, 2) OVER w AS t2
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), g AS (
                SELECT t0 || '>' || t1 || '>' || t2 AS path,
                       count(*) AS n_paths
                FROM p WHERE t2 IS NOT NULL GROUP BY 1
            )
            SELECT CAST(rank AS INT) AS rank, path, n_paths FROM (
                SELECT path, n_paths,
                       row_number() OVER (ORDER BY n_paths DESC, path)
                           AS rank
                FROM g)
            WHERE rank <= 10 ORDER BY rank
        """,
        "dup_graph_degree_docs": f"""
            WITH base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([{band_entries}]) AS bucket,
                       unnest(generate_series(0, {MINHASH_BANDS - 1}))
                           AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                       l.sh AS sh_a, r.sh AS sh_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket
                     AND l.id < r.id
            ), prs AS (
                SELECT id_a, id_b FROM cands
                WHERE round(len(list_intersect(sh_a, sh_b))
                            / CAST(len(list_distinct(
                                  list_concat(sh_a, sh_b))) AS DOUBLE), 6)
                      >= {LSH_THRESHOLD}
            ), deg AS (
                SELECT id, count(*) AS d FROM (
                    SELECT id_a AS id FROM prs
                    UNION ALL SELECT id_b AS id FROM prs)
                GROUP BY id
            )
            SELECT d AS degree, count(*) AS n_docs
            FROM deg GROUP BY d ORDER BY degree
        """,
        "monthly_growth_orders": """
            WITH monthly AS (
                SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                           AS month,
                       SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
                FROM orders GROUP BY 1
            )
            SELECT month, CAST(rev AS DOUBLE) AS revenue,
                   round((CAST(rev AS DOUBLE)
                          - CAST(lag(rev) OVER (ORDER BY month)
                                 AS DOUBLE))
                         / CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE),
                         6) + 0.0 AS mom_growth
            FROM monthly ORDER BY month
        """,
        "cusum_alarm_events": """
            WITH RECURSIVE daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), m AS (
                SELECT event_type,
                       CAST(SUM(CAST(n AS DECIMAL(28,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS target
                FROM daily GROUP BY 1
            ), ser AS (
                SELECT d.event_type, d.day, d.n, m.target,
                       row_number() OVER (
                           PARTITION BY d.event_type ORDER BY d.day)
                           AS idx
                FROM daily d JOIN m USING (event_type)
            ), c AS (
                SELECT event_type, day, n, target, idx,
                       greatest(CAST(0.0 AS DOUBLE),
                                CAST(n AS DOUBLE) - target) AS cusum
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT s.event_type, s.day, s.n, s.target, s.idx,
                       greatest(CAST(0.0 AS DOUBLE),
                                p.cusum + (CAST(s.n AS DOUBLE)
                                           - s.target))
                FROM ser s JOIN c p
                  ON s.event_type = p.event_type AND s.idx = p.idx + 1
            )
            SELECT event_type, day, n, target, cusum,
                   cusum > 10.0 AS alarm
            FROM c ORDER BY event_type, day
        """,
        "streaming_cohort_enrich": """
            WITH es AS (
                SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
                       value
                FROM events
            ), coh AS (
                SELECT user_id,
                       CAST(floor(min(es) / 604800.0) AS BIGINT)
                           AS cohort_week
                FROM es GROUP BY 1
            )
            SELECT c.cohort_week, count(*) AS n_events,
                   CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE)
                       AS sum_value
            FROM es e JOIN coh c USING (user_id)
            GROUP BY 1 ORDER BY 1
        """,
        "corpus_data_card_docs": f"""
            WITH feats AS (
                SELECT doc_id AS id, source, lang,
                       length(text) AS chars,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+')) END
                           AS tok,
                       md5({_NORM}) AS fp,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           AS n_alpha,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                           AS n_sym,
                       len(list_intersect(
                           list_transform(
                               regexp_split_to_array(trim(text), '\\s+'),
                               t -> lower(t)),
                           {_STOPWORDS_SQL})) AS sw_hits
                FROM documents
            ), quality AS (
                SELECT id,
                       (tok >= 20 AND tok <= 1000
                        AND n_alpha / greatest(tok, 1) >= 3.0
                        AND n_alpha / greatest(tok, 1) <= 10.0
                        AND n_sym / greatest(chars, 1) <= 0.1
                        AND sw_hits >= 2) AS q_pass
                FROM feats
            ), fp_counts AS (
                SELECT fp, count(*) AS c FROM feats GROUP BY fp
            ), base AS (
                SELECT doc_id AS id, {_shingle_sql()} AS sh FROM documents
            ), sigs AS (
                SELECT id, sh, {_minhash_sql()} AS sig FROM base
            ), buckets AS (
                SELECT id, sh, unnest([{band_entries}]) AS bucket,
                       unnest(generate_series(0, {MINHASH_BANDS - 1}))
                           AS band
                FROM sigs
            ), cands AS (
                SELECT DISTINCT l.id AS id_a, r.id AS id_b,
                       l.sh AS sh_a, r.sh AS sh_b
                FROM buckets l JOIN buckets r
                  ON l.band = r.band AND l.bucket = r.bucket
                     AND l.id < r.id
            ), prs AS (
                SELECT id_a, id_b FROM cands
                WHERE round(len(list_intersect(sh_a, sh_b))
                            / CAST(len(list_distinct(list_concat(sh_a, sh_b)))
                                   AS DOUBLE), 6) >= {LSH_THRESHOLD}
            ), near AS (
                SELECT DISTINCT id FROM (
                    SELECT id_a AS id FROM prs
                    UNION ALL SELECT id_b AS id FROM prs)
            ), per_src AS (
                SELECT f.source,
                       count(*) AS n_docs,
                       CAST(SUM(f.tok) AS BIGINT) AS n_tokens,
                       round(quantile_cont(f.chars, 0.5), 6) AS p50_chars,
                       round(quantile_cont(f.chars, 0.9), 6) AS p90_chars,
                       SUM(CASE WHEN fc.c > 1 THEN 1 ELSE 0 END) AS n_exact,
                       SUM(CASE WHEN near.id IS NOT NULL
                                THEN 1 ELSE 0 END) AS n_near,
                       SUM(CASE WHEN q.q_pass THEN 1 ELSE 0 END) AS n_pass,
                       CAST(count(DISTINCT f.lang) AS BIGINT) AS n_langs
                FROM feats f
                JOIN fp_counts fc USING (fp)
                JOIN quality q ON q.id = f.id
                LEFT JOIN near ON near.id = f.id
                GROUP BY f.source
            ), lang_counts AS (
                SELECT source, lang, count(*) AS n FROM feats GROUP BY 1, 2
            ), top_lang AS (
                SELECT source, lang AS top_lang, n AS top_n FROM (
                    SELECT source, lang, n, row_number() OVER (
                        PARTITION BY source ORDER BY n DESC, lang) AS rn
                    FROM lang_counts) WHERE rn = 1
            ), tot AS (
                SELECT count(*) AS tot_docs,
                       CAST(SUM(tok) AS BIGINT) AS tot_tokens
                FROM feats
            )
            SELECT p.source, p.n_docs,
                   round(CAST(p.n_docs AS DOUBLE)
                         / CAST(t.tot_docs AS DOUBLE), 6) + 0.0 AS doc_share,
                   p.n_tokens,
                   round(CAST(p.n_tokens AS DOUBLE)
                         / CAST(t.tot_tokens AS DOUBLE), 6) + 0.0
                       AS token_share,
                   p.p50_chars + 0.0 AS p50_chars,
                   p.p90_chars + 0.0 AS p90_chars,
                   round(CAST(p.n_exact AS DOUBLE)
                         / CAST(p.n_docs AS DOUBLE), 6) + 0.0
                       AS exact_dup_rate,
                   round(CAST(p.n_near AS DOUBLE)
                         / CAST(p.n_docs AS DOUBLE), 6) + 0.0
                       AS near_dup_rate,
                   round(CAST(p.n_pass AS DOUBLE)
                         / CAST(p.n_docs AS DOUBLE), 6) + 0.0
                       AS quality_pass_rate,
                   p.n_langs, tl.top_lang,
                   round(CAST(tl.top_n AS DOUBLE)
                         / CAST(p.n_docs AS DOUBLE), 6) + 0.0
                       AS top_lang_share
            FROM per_src p
            JOIN top_lang tl USING (source)
            CROSS JOIN tot t
            ORDER BY p.source
        """,
        "streaming_corpus_card_docs": f"""
            WITH feats AS (
                SELECT source, lang,
                       md5({_NORM}) AS fp,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text),
                                                           '\\s+')) END
                           AS tok,
                       length(text) AS chars,
                       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                           AS n_alpha,
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                           AS n_sym,
                       len(list_intersect(
                           list_transform(
                               regexp_split_to_array(trim(text), '\\s+'),
                               t -> lower(t)),
                           {_STOPWORDS_SQL})) AS sw_hits
                FROM documents
            ), counters AS (
                SELECT source, lang, fp,
                       count(*) AS n_docs,
                       CAST(SUM(tok) AS BIGINT) AS n_tokens,
                       SUM(CASE WHEN tok >= 20 AND tok <= 1000
                                 AND n_alpha / greatest(tok, 1) >= 3.0
                                 AND n_alpha / greatest(tok, 1) <= 10.0
                                 AND n_sym / greatest(chars, 1) <= 0.1
                                 AND sw_hits >= 2
                                THEN 1 ELSE 0 END) AS n_pass
                FROM feats GROUP BY 1, 2, 3
            ), fp_tot AS (
                SELECT fp, SUM(n_docs) AS fp_n FROM counters GROUP BY fp
            ), per_src AS (
                SELECT c.source,
                       CAST(SUM(c.n_docs) AS BIGINT) AS n_docs,
                       CAST(SUM(c.n_tokens) AS BIGINT) AS n_tokens,
                       CAST(SUM(CASE WHEN ft.fp_n > 1 THEN c.n_docs
                                     ELSE 0 END) AS BIGINT) AS n_exact,
                       CAST(SUM(c.n_pass) AS BIGINT) AS n_pass,
                       CAST(count(DISTINCT c.lang) AS BIGINT) AS n_langs
                FROM counters c JOIN fp_tot ft USING (fp)
                GROUP BY c.source
            ), lang_counts AS (
                SELECT source, lang, SUM(n_docs) AS n
                FROM counters GROUP BY 1, 2
            ), top_lang AS (
                SELECT source, lang AS top_lang, n AS top_n FROM (
                    SELECT source, lang, n, row_number() OVER (
                        PARTITION BY source ORDER BY n DESC, lang) AS rn
                    FROM lang_counts) WHERE rn = 1
            ), tot AS (
                SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
                       CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
                FROM counters
            )
            SELECT p.source, p.n_docs,
                   round(CAST(p.n_docs AS DOUBLE)
                         / CAST(t.tot_docs AS DOUBLE), 6) + 0.0 AS doc_share,
                   p.n_tokens,
                   round(CAST(p.n_tokens AS DOUBLE)
                         / CAST(t.tot_tokens AS DOUBLE), 6) + 0.0
                       AS token_share,
                   round(CAST(p.n_exact AS DOUBLE)
                         / CAST(p.n_docs AS DOUBLE), 6) + 0.0
                       AS exact_dup_rate,
                   round(CAST(p.n_pass AS DOUBLE)
                         / CAST(p.n_docs AS DOUBLE), 6) + 0.0
                       AS quality_pass_rate,
                   p.n_langs, tl.top_lang,
                   round(CAST(tl.top_n AS DOUBLE)
                         / CAST(p.n_docs AS DOUBLE), 6) + 0.0
                       AS top_lang_share
            FROM per_src p
            JOIN top_lang tl USING (source)
            CROSS JOIN tot t
            ORDER BY p.source
        """,
        "knn_label_noise_emb": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qvec,
                       label AS ql
                FROM embeddings WHERE vec_id < {N_NOISE_AUDIT}
            ), scored AS (
                SELECT q.query_id, q.ql, c.vec_id AS corpus_id,
                       c.label AS cl,
                       {_cos_sql("q.qvec", "c.embedding")} AS cs
                FROM embeddings c, q WHERE c.vec_id <> q.query_id
            ), nn AS (
                SELECT query_id, ql, cl FROM (
                    SELECT query_id, ql, cl, row_number() OVER (
                        PARTITION BY query_id ORDER BY cs DESC,
                        corpus_id ASC) AS rnk
                    FROM scored) WHERE rnk <= {TOPK}
            )
            SELECT query_id AS vec_id, MIN(ql) AS label,
                   CAST(SUM(CASE WHEN cl IS DISTINCT FROM ql
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_diff,
                   CAST(SUM(CASE WHEN cl IS DISTINCT FROM ql
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                       / {float(TOPK)} AS disagreement
            FROM nn GROUP BY query_id ORDER BY query_id
        """,
        "anova_f_per_dim_emb": """
            WITH per AS (
                SELECT label AS lab, CAST(v AS DOUBLE) AS v, pos FROM (
                    SELECT label, unnest(embedding) AS v,
                           unnest(generate_series(0, len(embedding) - 1))
                               AS pos
                    FROM embeddings)
            ), cells AS (
                SELECT pos, lab,
                       SUM(CAST(v AS DECIMAL(38,12))) AS s,
                       SUM(CAST(v * v AS DECIMAL(38,12))) AS s2,
                       count(*) AS n
                FROM per GROUP BY 1, 2
            ), tot AS (
                SELECT pos, SUM(s) AS ts, SUM(s2) AS ts2,
                       CAST(SUM(n) AS BIGINT) AS tn, count(*) AS g
                FROM cells GROUP BY 1
            ), ssb AS (
                SELECT c.pos,
                       CAST(SUM(CAST(
                           c.n * (CAST(c.s AS DOUBLE) / c.n
                                  - CAST(t.ts AS DOUBLE) / t.tn)
                               * (CAST(c.s AS DOUBLE) / c.n
                                  - CAST(t.ts AS DOUBLE) / t.tn)
                           AS DECIMAL(38,12))) AS DOUBLE) AS ssb,
                       MIN(CAST(t.ts2 AS DOUBLE)) AS ts2,
                       MIN(CAST(t.ts AS DOUBLE)) AS ts,
                       MIN(t.tn) AS n, MIN(t.g) AS g
                FROM cells c JOIN tot t USING (pos)
                GROUP BY c.pos
            )
            SELECT pos, n, g,
                   round(CASE WHEN (ts2 - n * (ts / n) * (ts / n)) - ssb > 0
                        THEN (ssb / (g - 1))
                             / (((ts2 - n * (ts / n) * (ts / n)) - ssb)
                                / (n - g)) END, 6) AS f_stat
            FROM ssb WHERE pos < 8 ORDER BY pos
        """,
        "temporal_scd2_lookup": """
            WITH ev AS (
                SELECT user_id, event_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events
            ), ch AS (
                SELECT user_id, event_type, sec, event_id,
                       lag(event_type) OVER w AS prev,
                       row_number() OVER w AS rn
                FROM ev WHERE event_type <> 'purchase'
                WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
            ), kept AS (
                SELECT user_id, event_type, sec, event_id FROM ch
                WHERE rn = 1 OR prev IS DISTINCT FROM event_type
            ), dim AS (
                SELECT user_id, event_type AS state, sec AS valid_from,
                       lead(sec) OVER w2 AS valid_to,
                       CAST(row_number() OVER w2 AS INT) AS version
                FROM kept
                WINDOW w2 AS (PARTITION BY user_id ORDER BY sec, event_id)
            ), p AS (
                SELECT user_id, event_id AS p_id, sec AS p_sec
                FROM ev WHERE event_type = 'purchase'
            )
            SELECT p.p_id, p.user_id, p.p_sec, d.state, d.version
            FROM p LEFT JOIN dim d
              ON p.user_id = d.user_id AND d.valid_from <= p.p_sec
                 AND (d.valid_to IS NULL OR p.p_sec < d.valid_to)
            ORDER BY p.p_id
        """,
        "winsorized_value_stats": f"""
            WITH ev AS (
                SELECT event_type, CAST(value AS DOUBLE) AS v
                FROM events WHERE value IS NOT NULL
            ), cuts AS (
                SELECT event_type,
                       round(quantile_cont(v, {WINSOR_LO}), 6) AS lo,
                       round(quantile_cont(v, {WINSOR_HI}), 6) AS hi
                FROM ev GROUP BY 1
            ), w AS (
                SELECT ev.event_type,
                       least(greatest(ev.v, cuts.lo), cuts.hi) AS vw
                FROM ev JOIN cuts USING (event_type)
            )
            SELECT event_type, count(*) AS n,
                   round(CAST(SUM(CAST(vw AS DECIMAL(18,6))) AS DOUBLE), 4)
                       AS sum_w,
                   round(MIN(vw), 6) AS min_w,
                   round(MAX(vw), 6) AS max_w
            FROM w GROUP BY event_type ORDER BY event_type
        """,
        "bootstrap_ci_orders": """
            WITH agg AS (
                SELECT CAST(SUM((CASE WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n0,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:0:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s0,
                   CAST(SUM((CASE WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n1,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:1:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s1,
                   CAST(SUM((CASE WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n2,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:2:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s2,
                   CAST(SUM((CASE WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n3,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:3:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s3,
                   CAST(SUM((CASE WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n4,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:4:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s4,
                   CAST(SUM((CASE WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n5,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:5:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s5,
                   CAST(SUM((CASE WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n6,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:6:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s6,
                   CAST(SUM((CASE WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n7,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:7:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s7,
                   CAST(SUM((CASE WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n8,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:8:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s8,
                   CAST(SUM((CASE WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n9,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:9:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s9,
                   CAST(SUM((CASE WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n10,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:10:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s10,
                   CAST(SUM((CASE WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n11,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:11:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s11,
                   CAST(SUM((CASE WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n12,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:12:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s12,
                   CAST(SUM((CASE WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n13,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:13:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s13,
                   CAST(SUM((CASE WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n14,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:14:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s14,
                   CAST(SUM((CASE WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n15,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:15:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s15,
                   CAST(SUM((CASE WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n16,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:16:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s16,
                   CAST(SUM((CASE WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n17,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:17:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s17,
                   CAST(SUM((CASE WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n18,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:18:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s18,
                   CAST(SUM((CASE WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END)) AS BIGINT) AS n19,
                   CAST(SUM(CAST((CASE WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < '5e2d58' THEN 0 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'bc5ab1' THEN 1 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'eb715e' THEN 2 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fb2397' THEN 3 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ff1025' THEN 4 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffd90f' THEN 5 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'fffa8b' THEN 6 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffff54' THEN 7 WHEN substr(md5('boot:19:' || CAST(o_orderkey AS VARCHAR)), 1, 6) < 'ffffed' THEN 8 ELSE 8 END) * CAST(o_totalprice AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE) AS s19
                FROM orders
            )
            SELECT 0 AS rep, n0 AS n_eff, s0 AS sum_v FROM agg
            UNION ALL SELECT 1 AS rep, n1 AS n_eff, s1 AS sum_v FROM agg
            UNION ALL SELECT 2 AS rep, n2 AS n_eff, s2 AS sum_v FROM agg
            UNION ALL SELECT 3 AS rep, n3 AS n_eff, s3 AS sum_v FROM agg
            UNION ALL SELECT 4 AS rep, n4 AS n_eff, s4 AS sum_v FROM agg
            UNION ALL SELECT 5 AS rep, n5 AS n_eff, s5 AS sum_v FROM agg
            UNION ALL SELECT 6 AS rep, n6 AS n_eff, s6 AS sum_v FROM agg
            UNION ALL SELECT 7 AS rep, n7 AS n_eff, s7 AS sum_v FROM agg
            UNION ALL SELECT 8 AS rep, n8 AS n_eff, s8 AS sum_v FROM agg
            UNION ALL SELECT 9 AS rep, n9 AS n_eff, s9 AS sum_v FROM agg
            UNION ALL SELECT 10 AS rep, n10 AS n_eff, s10 AS sum_v FROM agg
            UNION ALL SELECT 11 AS rep, n11 AS n_eff, s11 AS sum_v FROM agg
            UNION ALL SELECT 12 AS rep, n12 AS n_eff, s12 AS sum_v FROM agg
            UNION ALL SELECT 13 AS rep, n13 AS n_eff, s13 AS sum_v FROM agg
            UNION ALL SELECT 14 AS rep, n14 AS n_eff, s14 AS sum_v FROM agg
            UNION ALL SELECT 15 AS rep, n15 AS n_eff, s15 AS sum_v FROM agg
            UNION ALL SELECT 16 AS rep, n16 AS n_eff, s16 AS sum_v FROM agg
            UNION ALL SELECT 17 AS rep, n17 AS n_eff, s17 AS sum_v FROM agg
            UNION ALL SELECT 18 AS rep, n18 AS n_eff, s18 AS sum_v FROM agg
            UNION ALL SELECT 19 AS rep, n19 AS n_eff, s19 AS sum_v FROM agg
            ORDER BY rep
        """,
        "collocation_pmi_docs": (lambda mc, tk: r"""
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS nt
                FROM documents
            ), tk0 AS (
                SELECT doc_id,
                       unnest(string_split(nt, ' ')) AS term,
                       unnest(generate_series(1, len(string_split(nt, ' '))))
                           AS p
                FROM norm
            ), tks AS (
                SELECT * FROM tk0 WHERE term <> ''
            ), adj AS (
                SELECT term AS a,
                       lead(term) OVER (PARTITION BY doc_id ORDER BY p) AS b
                FROM tks
            ), pc AS (
                SELECT a AS term_a, b AS term_b, count(*) AS n_pair
                FROM adj WHERE b IS NOT NULL
                GROUP BY 1, 2 HAVING count(*) >= {MC}
            ), uni AS (
                SELECT term, count(*) AS n FROM tks GROUP BY 1
            ), tot AS (
                SELECT CAST(SUM(n) AS BIGINT) AS n_tok FROM uni
            ), pt AS (
                SELECT CAST(SUM(n_pair) AS BIGINT) AS n_pair_tot FROM pc
            ), j AS (
                SELECT pc.term_a, pc.term_b, pc.n_pair,
                       round(ln((CAST(pc.n_pair AS DOUBLE) / pt.n_pair_tot)
                             / ((CAST(ua.n AS DOUBLE) / tot.n_tok)
                                * (CAST(ub.n AS DOUBLE) / tot.n_tok))), 6)
                           AS pmi
                FROM pc
                JOIN uni ua ON ua.term = pc.term_a
                JOIN uni ub ON ub.term = pc.term_b
                CROSS JOIN tot CROSS JOIN pt
            )
            SELECT term_a, term_b, n_pair, pmi FROM (
                SELECT *, row_number() OVER (
                    ORDER BY pmi DESC, term_a, term_b) AS r
                FROM j
            ) WHERE r <= {TK}
        """.replace("{MC}", str(mc)).replace("{TK}", str(tk)))(
            CPMI_MIN, CPMI_TOPK),
        "weekly_value_percentiles": """
            SELECT event_type,
                   CAST(floor(floor(epoch(ts)) / 604800) AS BIGINT) AS week,
                   count(*) AS n,
                   round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
                   round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "categorical_assoc_docs": """
            WITH cells AS (
                SELECT coalesce(CAST(lang AS VARCHAR), chr(0) || 'NULL') AS a,
                       coalesce(CAST(source AS VARCHAR), chr(0) || 'NULL') AS b,
                       count(*) AS nxy
                FROM documents GROUP BY 1, 2
            ), ma AS (
                SELECT a, CAST(SUM(nxy) AS BIGINT) AS nx FROM cells GROUP BY 1
            ), mb AS (
                SELECT b, CAST(SUM(nxy) AS BIGINT) AS ny FROM cells GROUP BY 1
            ), tot AS (
                SELECT CAST(SUM(nxy) AS BIGINT) AS n,
                       count(DISTINCT a) AS r, count(DISTINCT b) AS c
                FROM cells
            ), j AS (
                SELECT CAST(cells.nxy AS DOUBLE) AS nxy,
                       CAST(ma.nx AS DOUBLE) AS nx,
                       CAST(mb.ny AS DOUBLE) AS ny,
                       CAST(tot.n AS DOUBLE) AS nd,
                       tot.n AS n, tot.r AS r, tot.c AS c
                FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN tot
            ), agg AS (
                SELECT MAX(n) AS n, count(*) AS n_cells,
                       CAST(SUM(CAST(nxy / nd * ln(nxy * nd / (nx * ny))
                                AS DECIMAL(18,12))) AS DOUBLE) AS mi,
                       CAST(SUM(CAST((nxy - nx * ny / nd)
                                     * (nxy - nx * ny / nd)
                                     / (nx * ny / nd)
                                AS DECIMAL(18,12))) AS DOUBLE) AS chi2,
                       MAX(r) AS r, MAX(c) AS c
                FROM j
            )
            SELECT n, n_cells, mi, chi2,
                   CASE WHEN CAST(n AS DOUBLE)
                             * (CAST(least(r, c) AS DOUBLE) - 1.0) > 0
                        THEN sqrt(chi2 / (CAST(n AS DOUBLE)
                             * (CAST(least(r, c) AS DOUBLE) - 1.0)))
                   END AS cramers_v
            FROM agg
        """,
        "padding_efficiency_docs": (lambda bs: f"""
            WITH t AS (
                SELECT CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS l
                FROM documents
            ), b AS (
                SELECT l,
                       CASE {' '.join(f"WHEN l <= {x} THEN {x}" for x in bs)}
                            ELSE {bs[-1]} END AS bucket_len,
                       least(l, {bs[-1]}) AS real
                FROM t
            )
            SELECT bucket_len, count(*) AS n_seqs,
                   CAST(SUM(l) AS BIGINT) AS sum_len,
                   CAST(count(*) * bucket_len AS BIGINT) AS padded,
                   1.0 - CAST(CAST(SUM(real) AS BIGINT) AS DOUBLE)
                         / CAST(count(*) * bucket_len AS DOUBLE) AS waste_frac
            FROM b GROUP BY bucket_len ORDER BY bucket_len
        """)(PAD_BOUNDARIES),
        "cms_join_size_orders": f"""
            WITH js AS (
                SELECT unnest([{", ".join(str(j) for j in range(CMS_DEPTH))}]) AS j
            ), ca AS (
                SELECT j,
                       CAST(CAST(CAST('0x' || substr(md5('{CMS_SEED}'
                             || CAST(j AS VARCHAR) || ':'
                             || CAST(o_custkey AS VARCHAR)), 1, 12)
                           AS UBIGINT) AS BIGINT) % {CMS_WIDTH} AS INT) AS b,
                       count(*) AS n
                FROM orders CROSS JOIN js
                WHERE o_custkey IS NOT NULL GROUP BY 1, 2
            ), cb AS (
                SELECT j,
                       CAST(CAST(CAST('0x' || substr(md5('{CMS_SEED}'
                             || CAST(j AS VARCHAR) || ':'
                             || CAST(c_custkey AS VARCHAR)), 1, 12)
                           AS UBIGINT) AS BIGINT) % {CMS_WIDTH} AS INT) AS b,
                       count(*) AS n
                FROM customer CROSS JOIN js
                WHERE c_custkey IS NOT NULL GROUP BY 1, 2
            ), pr AS (
                SELECT ca.j, CAST(SUM(ca.n * cb.n) AS BIGINT) AS ip
                FROM ca JOIN cb ON ca.j = cb.j AND ca.b = cb.b
                GROUP BY 1
            ), fullr AS (
                SELECT js.j, coalesce(pr.ip, 0) AS ip
                FROM js LEFT JOIN pr USING (j)
            ), est AS (
                SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size FROM fullr
            ), ex AS (
                SELECT count(*) AS exact_join_size
                FROM orders JOIN customer ON o_custkey = c_custkey
            )
            SELECT est.est_join_size, ex.exact_join_size
            FROM est CROSS JOIN ex
        """,
        "key_skew_orders": """
            WITH counts AS (
                SELECT coalesce(CAST(o_custkey AS VARCHAR),
                                chr(0) || 'NULL') AS key,
                       count(*) AS n
                FROM orders GROUP BY 1
            ), s AS (
                SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                       count(*) AS n_keys,
                       CAST(MAX(n) AS BIGINT) AS max_n
                FROM counts
            ), summary AS (
                SELECT CAST(NULL AS VARCHAR) AS key, 0 AS rank,
                       n_rows, n_keys, max_n,
                       CAST(n_rows AS DOUBLE) / n_keys AS mean_n,
                       CAST(max_n AS DOUBLE)
                           / (CAST(n_rows AS DOUBLE) / n_keys) AS skew_ratio
                FROM s
            ), heavy AS (
                SELECT key, rank,
                       CAST(NULL AS BIGINT) AS n_rows,
                       n AS n_keys,
                       CAST(NULL AS BIGINT) AS max_n,
                       CAST(NULL AS DOUBLE) AS mean_n,
                       CAST(NULL AS DOUBLE) AS skew_ratio
                FROM (SELECT key, n, CAST(row_number() OVER (
                          ORDER BY n DESC, key ASC) AS INT) AS rank
                      FROM counts)
                WHERE rank <= 5
            )
            SELECT * FROM summary UNION ALL SELECT * FROM heavy
            ORDER BY rank
        """,
        "mmr_diverse_topk": _mmr_oracle_sql(),
        "streaming_psi_drift_events": f"""
            WITH ev AS (
                SELECT CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT)
                           AS day,
                       CAST(greatest(least(
                            floor((CAST(value AS DOUBLE) - {PSI_LO})
                                  / {(PSI_HI - PSI_LO) / PSI_BINS}),
                            {PSI_BINS - 1}), 0) AS INT) AS bin
                FROM events WHERE value IS NOT NULL
            ), cur AS (
                SELECT day, bin, count(*) AS c_cur FROM ev GROUP BY 1, 2
            ), ref AS (
                SELECT bin, count(*) AS c_ref FROM ev GROUP BY 1
            ), ref_tot AS (
                SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref FROM ref
            ), day_tot AS (
                SELECT day, CAST(SUM(c_cur) AS BIGINT) AS n_cur
                FROM cur GROUP BY 1
            ), grid AS (
                SELECT d.day, r.bin, r.c_ref FROM ref r
                CROSS JOIN (SELECT DISTINCT day FROM cur) d
            ), j AS (
                SELECT g.day, rt.n_ref, dt.n_cur, g.c_ref,
                       coalesce(c.c_cur, 0) AS c_cur
                FROM grid g
                LEFT JOIN cur c ON g.day = c.day AND g.bin = c.bin
                JOIN day_tot dt ON g.day = dt.day
                CROSS JOIN ref_tot rt
            )
            SELECT day, MIN(n_ref) AS n_ref, MIN(n_cur) AS n_cur,
                   round(CAST(SUM(CAST(
                       ((c_ref + 0.5) / (n_ref + {0.5 * PSI_BINS})
                        - (c_cur + 0.5) / (n_cur + {0.5 * PSI_BINS}))
                       * ln(((c_ref + 0.5) / (n_ref + {0.5 * PSI_BINS}))
                            / ((c_cur + 0.5) / (n_cur + {0.5 * PSI_BINS})))
                       AS DECIMAL(18,12))) AS DOUBLE), 6) AS psi
            FROM j GROUP BY day ORDER BY day
        """,
        "streaming_interval_join_flush": """
            WITH ev AS (
                SELECT event_id, user_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events
            ), s AS (
                SELECT user_id AS u, event_id AS s_id, sec AS s_sec
                FROM ev WHERE event_type = 'signup'
            ), p AS (
                SELECT user_id AS u, event_id AS p_id, sec AS p_sec
                FROM ev WHERE event_type = 'purchase'
            ), wm AS (
                SELECT least((SELECT max(s_sec) FROM s),
                             (SELECT max(p_sec) FROM p)) AS w
            )
            SELECT s.u AS user_id, s.s_id, s.s_sec, p.p_id, p.p_sec
            FROM s CROSS JOIN wm
            LEFT JOIN p ON s.u = p.u AND p.p_sec >= s.s_sec
                        AND p.p_sec <= s.s_sec + 43200
            WHERE p.p_id IS NOT NULL OR s.s_sec + 43200 < wm.w - 3600
            ORDER BY s.s_id, p.p_id
        """,
        # -- r5 session 4 --------------------------------------------------
        "temperature_sample_counts": """
            WITH c AS (
                SELECT lang, count(*) AS n FROM documents GROUP BY lang
            ), r AS (
                SELECT lang,
                       sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE)
                            / CAST(n AS DOUBLE)) AS rate
                FROM c
            )
            SELECT d.lang, count(*) AS n_kept,
                   CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
            FROM documents d JOIN r USING (lang)
            WHERE r.rate >= 1.0
               OR substr(md5('tmp0' || CAST(d.doc_id AS VARCHAR)), 1, 6)
                  < lpad(lower(to_hex(
                        CAST(floor(r.rate * 16777216.0) AS BIGINT))), 6, '0')
            GROUP BY d.lang ORDER BY d.lang
        """,
        "cohort_retention_counts": """
            WITH act AS (
                SELECT DISTINCT user_id,
                       CAST(floor(floor(epoch(ts)) / 604800.0) AS BIGINT) AS p
                FROM events
            ), coh AS (
                SELECT user_id, min(p) AS c FROM act GROUP BY user_id
            )
            SELECT c.c AS cohort_period, a.p - c.c AS period_offset,
                   count(*) AS n_active
            FROM act a JOIN coh c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "count_min_estimates": f"""
            WITH toks AS (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
                FROM documents WHERE text IS NOT NULL
            ), js AS (
                SELECT unnest([{", ".join(str(j) for j in range(CMS_DEPTH))}]) AS j
            ), cms AS (
                SELECT j,
                       CAST(CAST(CAST('0x' || substr(md5('{CMS_SEED}'
                             || CAST(j AS VARCHAR) || ':' || term), 1, 12)
                           AS UBIGINT) AS BIGINT) % {CMS_WIDTH} AS INT) AS b,
                       count(*) AS cnt
                FROM toks CROSS JOIN js GROUP BY 1, 2
            ), probes AS (
                SELECT unnest([{", ".join("'" + t + "'" for t in CMS_PROBE_TERMS)}]) AS key
            ), coords AS (
                SELECT key, j,
                       CAST(CAST(CAST('0x' || substr(md5('{CMS_SEED}'
                             || CAST(j AS VARCHAR) || ':' || key), 1, 12)
                           AS UBIGINT) AS BIGINT) % {CMS_WIDTH} AS INT) AS b
                FROM probes CROSS JOIN js
            ), est AS (
                SELECT key, min(coalesce(cnt, 0)) AS cm_estimate
                FROM coords LEFT JOIN cms USING (j, b) GROUP BY key
            ), exact AS (
                SELECT term, count(*) AS n FROM toks GROUP BY term
            )
            SELECT e.key, e.cm_estimate, coalesce(x.n, 0) AS exact_n
            FROM est e LEFT JOIN exact x ON e.key = x.term
            ORDER BY e.key
        """,
        "hll_cardinality_events": """
            WITH h AS (
                SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx
                FROM events WHERE user_id IS NOT NULL
            ), rr AS (
                SELECT event_type,
                       CAST(CAST(('0x' || substr(hx, 1, 1)) AS UBIGINT) AS INT)
                           AS hll_reg,
                       regexp_replace(substr(hx, 2, 14), '^0+', '') AS t
                FROM h
            ), rho AS (
                SELECT event_type, hll_reg,
                       CASE WHEN t = '' THEN 57
                            ELSE 4 * (14 - length(t))
                                 + CASE WHEN substr(t, 1, 1) IN
                                          ('8','9','a','b','c','d','e','f')
                                        THEN 0
                                        WHEN substr(t, 1, 1) IN
                                          ('4','5','6','7') THEN 1
                                        WHEN substr(t, 1, 1) IN ('2','3')
                                        THEN 2 ELSE 3 END
                                 + 1 END AS rho
                FROM rr
            ), regs AS (
                SELECT event_type, hll_reg, MAX(rho) AS mrho
                FROM rho GROUP BY 1, 2
            ), agg AS (
                SELECT event_type,
                       count(*) AS hll_registers,
                       CAST(SUM(CAST((CAST(1 AS BIGINT) << (57 - mrho))
                                     AS DECIMAL(38,0)))
                            AS DECIMAL(38,0)) AS s_present
                FROM regs GROUP BY 1
            ), est AS (
                SELECT event_type, hll_registers,
                       16 - hll_registers AS hll_zero_registers,
                       CAST(CAST(s_present AS HUGEINT)
                            + (16 - hll_registers)
                              * CAST(144115188075855872 AS HUGEINT)
                            AS BIGINT) AS hll_sum
                FROM agg
            ), ex AS (
                SELECT event_type, count(DISTINCT user_id) AS exact_distinct
                FROM events GROUP BY 1
            )
            SELECT e.event_type, e.hll_registers, e.hll_zero_registers,
                   e.hll_sum,
                   CASE WHEN CAST('2.482931752321306e+19' AS DOUBLE)
                             / CAST(e.hll_sum AS DOUBLE)
                             <= CAST('40.0' AS DOUBLE)
                             AND e.hll_zero_registers > 0
                        THEN CAST('16.0' AS DOUBLE)
                             * ln(CAST('16.0' AS DOUBLE)
                                  / CAST(e.hll_zero_registers AS DOUBLE))
                        ELSE CAST('2.482931752321306e+19' AS DOUBLE)
                             / CAST(e.hll_sum AS DOUBLE) END AS hll_estimate,
                   x.exact_distinct
            FROM est e JOIN ex x USING (event_type)
            ORDER BY e.event_type
        """,
        "table_diff_counts": """
            WITH old AS (
                SELECT o_orderkey, o_totalprice FROM orders
                WHERE o_orderkey % 3 <> 0
            ), new AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                            ELSE o_totalprice END AS o_totalprice
                FROM orders WHERE o_orderkey % 5 <> 0
            ), d AS (
                SELECT coalesce(n.o_orderkey, o.o_orderkey) AS k,
                       CASE WHEN o.o_orderkey IS NULL THEN 'added'
                            WHEN n.o_orderkey IS NULL THEN 'removed'
                            WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                                 THEN 'changed' END AS change
                FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
            )
            SELECT change, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum
            FROM d WHERE change IS NOT NULL
            GROUP BY change ORDER BY change
        """,
        "ngram_novelty_stats": """
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
                FROM documents WHERE text IS NOT NULL
            ), g AS (
                SELECT DISTINCT doc_id, gram FROM (
                    SELECT doc_id,
                           unnest(CASE WHEN len(tk) >= 3
                               THEN list_transform(
                                   generate_series(1, len(tk) - 2),
                                   i -> array_to_string(tk[i:i+2], ' '))
                               ELSE [] END) AS gram
                    FROM toks)
            ), fs AS (
                SELECT gram, min(doc_id) AS first_id FROM g GROUP BY gram
            ), per AS (
                SELECT g.doc_id, count(*) AS n_grams,
                       sum(CASE WHEN g.doc_id = fs.first_id THEN 1 ELSE 0 END)
                           AS n_novel
                FROM g JOIN fs USING (gram) GROUP BY g.doc_id
            )
            SELECT d.source, count(*) AS n_docs,
                   CAST(sum(coalesce(per.n_grams, 0)) AS BIGINT) AS total_grams,
                   CAST(sum(coalesce(per.n_novel, 0)) AS BIGINT) AS total_novel
            FROM documents d LEFT JOIN per USING (doc_id)
            GROUP BY d.source ORDER BY d.source
        """,
        "interval_overlap_pairs": """
            WITH l AS (
                SELECT l_orderkey AS k, l_linenumber AS ln,
                       l_extendedprice * (1.0 - l_discount) AS s,
                       l_extendedprice AS e
                FROM lineitem
                WHERE l_extendedprice * (1.0 - l_discount) < l_extendedprice
            )
            SELECT a.k AS o_orderkey, count(*) AS n_pairs
            FROM l a JOIN l b
              ON a.k = b.k AND a.ln < b.ln AND a.s < b.e AND b.s < a.e
            GROUP BY a.k ORDER BY a.k
        """,
        "anomaly_band_flags": """
            WITH s AS (
                SELECT event_id, value AS v,
                       count(value) OVER w AS n,
                       CAST(SUM(CAST(value AS DECIMAL(28,12))) OVER w
                            AS DOUBLE) AS sm,
                       CAST(SUM(CAST(value * value AS DECIMAL(28,12))) OVER w
                            AS DOUBLE) AS s2
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
            ), b AS (
                SELECT event_id, v,
                       CASE WHEN n >= 5 THEN sm / n END AS mean,
                       CASE WHEN n >= 5 THEN sqrt(greatest(
                           (s2 - sm * sm / n) / (n - 1), 0.0)) END AS std,
                       n
                FROM s
            ), f AS (
                SELECT event_id, mean,
                       CASE WHEN n >= 5 AND std IS NOT NULL
                            THEN abs(v - mean) > 2.5 * std
                            ELSE false END AS is_anomaly
                FROM b
            )
            SELECT count(*) AS n_points,
                   count(mean) AS n_banded,
                   CAST(sum(CASE WHEN is_anomaly THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_anomalies,
                   CAST(sum(CASE WHEN is_anomaly THEN event_id END)
                        AS BIGINT) AS anomaly_id_sum
            FROM f
        """,
        "coreset_kcenter_embeddings": _kcenter_sql(KCENTER_K),
        "corr_matrix_lineitem": _corr_matrix_sql(CORR_COLS),
        "negative_samples_lineitem": f"""
            WITH pos AS (
                SELECT CAST(l_orderkey AS VARCHAR) || '-'
                           || CAST(l_linenumber AS VARCHAR) AS pair_key,
                       l_partkey
                FROM lineitem WHERE l_orderkey % 100 = 1
            ), items AS (
                SELECT item,
                       row_number() OVER (ORDER BY item) - 1 AS idx
                FROM (SELECT DISTINCT p_partkey AS item FROM part)
            ), cnt AS (
                SELECT count(*) AS n FROM items
            ), probes AS (
                SELECT pair_key, l_partkey, j,
                       (CAST(CAST('0x' || substr(md5('{NEG_SEED}'
                               || CAST(j AS VARCHAR) || ':' || pair_key),
                               1, 12) AS UBIGINT) AS BIGINT) % n) AS idx
                FROM pos
                CROSS JOIN cnt
                CROSS JOIN (SELECT unnest([{", ".join(
                    str(j) for j in range(NEG_K))}]) AS j)
            )
            SELECT j, count(*) AS n_rows,
                   CAST(SUM(i.item) AS BIGINT) AS neg_sum
            FROM probes p JOIN items i USING (idx)
            WHERE i.item <> p.l_partkey
            GROUP BY j ORDER BY j
        """,
        "seasonal_decompose_events": f"""
            WITH e AS (
                SELECT event_type AS k, event_id, ts,
                       CAST(value AS DOUBLE) AS v
                FROM events WHERE value IS NOT NULL
            ), w1 AS (
                SELECT k, event_id, v,
                       CAST((row_number() OVER wo - 1) % {SEASONAL_PERIOD}
                            AS INTEGER) AS pos,
                       count(v) OVER wt AS nt,
                       CAST(SUM(CAST(v AS DECIMAL(28,12))) OVER wt
                            AS DOUBLE) AS st
                FROM e
                WINDOW wo AS (PARTITION BY k ORDER BY ts, event_id),
                       wt AS (PARTITION BY k ORDER BY ts, event_id
                              ROWS BETWEEN {SEASONAL_PERIOD // 2} PRECEDING
                                       AND {SEASONAL_PERIOD // 2} FOLLOWING)
            ), w2 AS (
                SELECT k, event_id, v, pos,
                       CASE WHEN nt = {SEASONAL_PERIOD + 1}
                            THEN st / nt END AS trend
                FROM w1
            ), sm AS (
                SELECT k, pos,
                       CAST(SUM(CAST(v - trend AS DECIMAL(28,12)))
                            AS DOUBLE) / count(v - trend) AS s_raw
                FROM w2 GROUP BY k, pos
            ), sc AS (
                SELECT k, pos,
                       s_raw
                       - CAST(SUM(CAST(s_raw AS DECIMAL(28,12))) OVER wk
                              AS DOUBLE) / count(s_raw) OVER wk AS seasonal
                FROM sm WINDOW wk AS (PARTITION BY k)
            ), r AS (
                SELECT w2.k, w2.pos,
                       round(w2.trend, 6) AS trend,
                       round(sc.seasonal, 6) AS seasonal,
                       round(w2.v - w2.trend - sc.seasonal, 6) AS resid
                FROM w2 JOIN sc ON w2.k = sc.k AND w2.pos = sc.pos
            )
            SELECT k AS event_type, pos,
                   count(*) AS n,
                   CAST(count(trend) AS BIGINT) AS n_trended,
                   min(seasonal) AS seasonal,
                   CAST(SUM(CAST(trend AS DECIMAL(18,6))) AS DOUBLE)
                       AS trend_sum,
                   CAST(SUM(CAST(resid AS DECIMAL(18,6))) AS DOUBLE)
                       AS resid_sum
            FROM r GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "benford_orders": f"""
            WITH c AS (
                SELECT CAST(substr(CAST(CAST(floor(abs(o_totalprice))
                           AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER)
                           AS digit,
                       CAST(count(*) AS BIGINT) AS n0
                FROM orders
                WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) >= 1
                GROUP BY 1
            ), tot AS (
                SELECT CAST(SUM(n0) AS BIGINT) AS N FROM c
            ), grid AS (
                SELECT * FROM (VALUES {", ".join(
                    f"({d}, CAST('{_BENFORD[d]!r}' AS DOUBLE))"
                    for d in range(1, 10))}) AS t(digit, exp_share)
            )
            SELECT g.digit,
                   CAST(COALESCE(c.n0, 0) AS BIGINT) AS n,
                   round(COALESCE(c.n0, 0) / CAST(N AS DOUBLE), 6)
                       AS obs_share,
                   round(g.exp_share, 6) AS exp_share,
                   round((COALESCE(c.n0, 0) - CAST(N AS DOUBLE) * g.exp_share)
                         * (COALESCE(c.n0, 0) - CAST(N AS DOUBLE) * g.exp_share)
                         / (CAST(N AS DOUBLE) * g.exp_share), 6)
                       AS chi2_term
            FROM grid g CROSS JOIN tot LEFT JOIN c USING (digit)
            ORDER BY g.digit
        """,
        "acf_events": f"""
            WITH e AS (
                SELECT event_type, event_id, ts, CAST(value AS DOUBLE) AS v
                FROM events WHERE value IS NOT NULL
            ), s AS (
                SELECT event_type,
                       count(v) OVER wk AS n,
                       CAST(SUM(CAST(v AS DECIMAL(28,12))) OVER wk
                            AS DOUBLE) AS sm,
                       v,
                       lead(v, 1) OVER wo AS l1,
                       lead(v, 2) OVER wo AS l2,
                       lead(v, 3) OVER wo AS l3
                FROM e
                WINDOW wk AS (PARTITION BY event_type),
                       wo AS (PARTITION BY event_type ORDER BY ts, event_id)
            ), t AS (
                SELECT event_type, n,
                       CAST((v - sm / n) * (v - sm / n)
                            AS DECIMAL(28,12)) AS den,
                       CAST((v - sm / n) * (l1 - sm / n)
                            AS DECIMAL(28,12)) AS p1,
                       CAST((v - sm / n) * (l2 - sm / n)
                            AS DECIMAL(28,12)) AS p2,
                       CAST((v - sm / n) * (l3 - sm / n)
                            AS DECIMAL(28,12)) AS p3
                FROM s
            ), agged AS (
                SELECT event_type, max(n) AS n,
                       CAST(SUM(den) AS DOUBLE) AS d,
                       CAST(SUM(p1) AS DOUBLE) AS s1,
                       CAST(SUM(p2) AS DOUBLE) AS s2,
                       CAST(SUM(p3) AS DOUBLE) AS s3
                FROM t GROUP BY event_type
            )
            SELECT * FROM (
                SELECT event_type AS key, 1 AS lag, n,
                       round(CASE WHEN d > 0 THEN s1 / d END, 6) AS acf
                FROM agged
                UNION ALL
                SELECT event_type, 2, n,
                       round(CASE WHEN d > 0 THEN s2 / d END, 6) FROM agged
                UNION ALL
                SELECT event_type, 3, n,
                       round(CASE WHEN d > 0 THEN s3 / d END, 6) FROM agged
            ) ORDER BY key, lag
        """,
        "changepoint_shift_events": f"""
            WITH s AS (
                SELECT event_type, event_id,
                       count(value) OVER wb AS nb,
                       CAST(SUM(CAST(value AS DECIMAL(28,12))) OVER wb
                            AS DOUBLE) AS sb,
                       CAST(SUM(CAST(value * value AS DECIMAL(28,12))) OVER wb
                            AS DOUBLE) AS sb2,
                       count(value) OVER wa AS na,
                       CAST(SUM(CAST(value AS DECIMAL(28,12))) OVER wa
                            AS DOUBLE) AS sa,
                       CAST(SUM(CAST(value * value AS DECIMAL(28,12))) OVER wa
                            AS DOUBLE) AS sa2
                FROM events
                WINDOW wb AS (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN {CHANGEPOINT_W} PRECEDING
                                       AND 1 PRECEDING),
                       wa AS (PARTITION BY event_type ORDER BY ts, event_id
                              ROWS BETWEEN CURRENT ROW
                                       AND {CHANGEPOINT_W - 1} FOLLOWING)
            ), c AS (
                SELECT event_type, event_id, nb, na,
                       nb = {CHANGEPOINT_W} AND na = {CHANGEPOINT_W} AS isfull,
                       sb / nb AS mb, sa / na AS ma,
                       greatest((sb2 - sb * sb / nb) / (nb - 1), 0.0) AS vb,
                       greatest((sa2 - sa * sa / na) / (na - 1), 0.0) AS va
                FROM s
            ), z AS (
                SELECT event_type, event_id,
                       round(CASE WHEN isfull THEN mb END, 6) AS mean_before,
                       round(CASE WHEN isfull THEN ma END, 6) AS mean_after,
                       round(CASE WHEN isfull THEN ma - mb END, 6) AS shift,
                       round(CASE WHEN isfull
                                   AND sqrt(vb / nb + va / na) > 0
                             THEN (ma - mb) / sqrt(vb / nb + va / na)
                             END, 6) AS zscore
                FROM c
            ), r AS (
                SELECT *, row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY abs(zscore) DESC, event_id) AS rn
                FROM z WHERE zscore IS NOT NULL
            )
            SELECT event_type, event_id, mean_before, mean_after,
                   shift, zscore
            FROM r WHERE rn = 1 ORDER BY event_type
        """,
        "resample_gap_fill": """
            WITH per AS (
                SELECT event_type AS k,
                       CAST(floor(floor(epoch(ts)) / 3600.0) AS BIGINT) AS p,
                       CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS mean
                FROM events WHERE value IS NOT NULL
                GROUP BY 1, 2
            ), bounds AS (
                SELECT k, min(p) AS lo, max(p) AS hi FROM per GROUP BY k
            ), grid AS (
                SELECT k, unnest(generate_series(lo, hi)) AS p FROM bounds
            ), j AS (
                SELECT g.k, g.p, per.mean
                FROM grid g LEFT JOIN per ON g.k = per.k AND g.p = per.p
            )
            SELECT k AS event_type, p AS period,
                   round(last_value(mean IGNORE NULLS) OVER (
                       PARTITION BY k ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                       AS value,
                   mean IS NOT NULL AS observed
            FROM j ORDER BY event_type, period
        """,
        "bpe_segment_stats": (lambda reps: f"""
            WITH w AS (
                SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                FROM documents WHERE text IS NOT NULL
            ), nz AS (
                SELECT w FROM w WHERE length(w) > 0
            ), ds AS (
                SELECT '  ' || array_to_string(list_append(
                           list_transform(generate_series(1, length(w)),
                                          i -> w[i]), '</w>'), '  ')
                       || '  ' AS s
                FROM nz
            ), m AS (
                SELECT {reps} AS s FROM ds
            )
            SELECT sym, count(*) AS n FROM (
                SELECT unnest(list_filter(string_split(s, '  '),
                                          x -> x <> '')) AS sym
                FROM m
            ) GROUP BY sym ORDER BY sym
        """)("".join(
            f"replace(" for _ in BPE_MERGES) + "s" + "".join(
            f", ' {a}  {b} ', ' {a}{b} ')" for a, b in BPE_MERGES)),
        "w1_drift_events": """
            WITH t AS (
                SELECT event_type, value AS x,
                       CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src
                FROM events WHERE value IS NOT NULL
            ), px AS (
                SELECT event_type, x,
                       SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END) AS r,
                       SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS c
                FROM t GROUP BY event_type, x
            ), s AS (
                SELECT event_type,
                       SUM(r) OVER (PARTITION BY event_type) AS n_ref,
                       SUM(c) OVER (PARTITION BY event_type) AS n_cur,
                       SUM(r) OVER (PARTITION BY event_type ORDER BY x
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS c_ref,
                       SUM(c) OVER (PARTITION BY event_type ORDER BY x
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS c_cur,
                       lead(x) OVER (PARTITION BY event_type ORDER BY x) - x
                           AS gap
                FROM px
            )
            SELECT event_type,
                   CAST(n_ref AS BIGINT) AS n_ref,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   round(CAST(SUM(CAST(
                       abs(c_ref / CAST(n_ref AS DOUBLE)
                           - c_cur / CAST(n_cur AS DOUBLE))
                       * coalesce(gap, 0.0) AS DECIMAL(28,12)))
                       AS DOUBLE), 6) AS w1
            FROM s WHERE n_ref > 0 AND n_cur > 0
            GROUP BY event_type, n_ref, n_cur
            ORDER BY event_type
        """,
        "spearman_lineitem": """
            WITH base AS (
                SELECT l_returnflag AS g,
                       CAST(l_quantity AS DOUBLE) AS x,
                       CAST(l_extendedprice AS DOUBLE) AS y
                FROM lineitem
                WHERE l_quantity IS NOT NULL
                  AND l_extendedprice IS NOT NULL
            ), ranked AS (
                SELECT g,
                       CAST(2 * rank() OVER (PARTITION BY g ORDER BY x)
                            + count(*) OVER (PARTITION BY g, x)
                            - 1 AS DOUBLE) / 2.0 AS rx,
                       CAST(2 * rank() OVER (PARTITION BY g ORDER BY y)
                            + count(*) OVER (PARTITION BY g, y)
                            - 1 AS DOUBLE) / 2.0 AS ry
                FROM base
            ), agg AS (
                SELECT g, CAST(count(*) AS BIGINT) AS n,
                       CAST(SUM(CAST(rx AS DECIMAL(38,12))) AS DOUBLE)
                           AS sx,
                       CAST(SUM(CAST(ry AS DECIMAL(38,12))) AS DOUBLE)
                           AS sy,
                       CAST(SUM(CAST(rx * ry AS DECIMAL(38,12)))
                            AS DOUBLE) AS sxy,
                       CAST(SUM(CAST(rx * rx AS DECIMAL(38,12)))
                            AS DOUBLE) AS sxx,
                       CAST(SUM(CAST(ry * ry AS DECIMAL(38,12)))
                            AS DOUBLE) AS syy
                FROM ranked GROUP BY 1
            )
            SELECT g AS l_returnflag, n,
                   round(CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
                               AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0
                              THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                                   / (sqrt(CAST(n AS DOUBLE) * sxx
                                           - sx * sx)
                                      * sqrt(CAST(n AS DOUBLE) * syy
                                             - sy * sy)) END, 6) + 0.0
                       AS spearman
            FROM agg ORDER BY l_returnflag
        """,
        "cvm_drift_events": """
            WITH t AS (
                SELECT event_type, value AS x,
                       CASE WHEN event_id % 2 = 0 THEN 0 ELSE 1 END AS src
                FROM events WHERE value IS NOT NULL
            ), px AS (
                SELECT event_type, x,
                       SUM(CASE WHEN src = 0 THEN 1 ELSE 0 END) AS r,
                       SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS c
                FROM t GROUP BY event_type, x
            ), s AS (
                SELECT event_type, r, c,
                       SUM(r) OVER (PARTITION BY event_type) AS n_ref,
                       SUM(c) OVER (PARTITION BY event_type) AS n_cur,
                       SUM(r) OVER (PARTITION BY event_type ORDER BY x
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS c_ref,
                       SUM(c) OVER (PARTITION BY event_type ORDER BY x
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS c_cur
                FROM px
            )
            SELECT event_type,
                   CAST(n_ref AS BIGINT) AS n_ref,
                   CAST(n_cur AS BIGINT) AS n_cur,
                   round((CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE))
                         / ((CAST(n_ref AS DOUBLE) + CAST(n_cur AS DOUBLE))
                            * (CAST(n_ref AS DOUBLE)
                               + CAST(n_cur AS DOUBLE)))
                         * CAST(SUM(CAST(
                             CAST(r + c AS DOUBLE)
                             * ((c_ref / CAST(n_ref AS DOUBLE)
                                 - c_cur / CAST(n_cur AS DOUBLE))
                                * (c_ref / CAST(n_ref AS DOUBLE)
                                   - c_cur / CAST(n_cur AS DOUBLE)))
                             AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0
                       AS cvm_stat
            FROM s WHERE n_ref > 0 AND n_cur > 0
            GROUP BY event_type, n_ref, n_cur
            ORDER BY event_type
        """,
        "streaming_count_min_sketch": f"""
            WITH js AS (
                SELECT unnest([{", ".join(str(j) for j in range(CMS_DEPTH))}]) AS j
            )
            SELECT j AS cm_row,
                   CAST(CAST(CAST('0x' || substr(md5('{SCM_SEED}'
                         || CAST(j AS VARCHAR) || ':'
                         || CAST(user_id AS VARCHAR)), 1, 12)
                       AS UBIGINT) AS BIGINT) % {SCM_WIDTH} AS INT) AS cm_bucket,
                   count(*) AS cm_count
            FROM events CROSS JOIN js
            WHERE user_id IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "interval_grid_pairs": """
            WITH ev AS (
                SELECT event_id, event_type,
                       CAST(floor(epoch(ts)) AS BIGINT) AS t
                FROM events
            ), v AS (
                SELECT event_id AS vid, t AS vs, t + 300 AS ve
                FROM ev WHERE event_type = 'view'
            ), p AS (
                SELECT event_id AS pid, t AS ps, t + 300 AS pe
                FROM ev WHERE event_type = 'purchase'
            )
            SELECT count(*) AS n_pairs,
                   CAST(sum(vid) AS BIGINT) AS vid_sum,
                   CAST(sum(pid) AS BIGINT) AS pid_sum
            FROM v JOIN p ON v.vs < p.pe AND p.ps < v.ve
        """,
        "quantile_sketch_events": f"""
            WITH h AS (
                SELECT event_type, value,
                       md5(CAST(event_id AS VARCHAR)) AS hsh
                FROM events WHERE value IS NOT NULL
            ), r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY event_type ORDER BY hsh) AS rn
                FROM h
            ), sk AS (
                SELECT event_type,
                       list_sort(list(value)) AS vals,
                       count(*) AS n_sample
                FROM r WHERE rn <= {QSK_K} GROUP BY 1
            ), ex AS (
                SELECT event_type, count(*) AS n_rows,
                       round(quantile_cont(value, 0.5), 6) AS p50_exact,
                       round(quantile_cont(value, 0.9), 6) AS p90_exact
                FROM events WHERE value IS NOT NULL GROUP BY 1
            )
            SELECT ex.event_type, ex.n_rows, sk.n_sample,
                   vals[CAST(floor(0.5 * (n_sample - 1)) AS BIGINT) + 1]
                       AS p50_est,
                   vals[CAST(floor(0.9 * (n_sample - 1)) AS BIGINT) + 1]
                       AS p90_est,
                   ex.p50_exact, ex.p90_exact
            FROM ex JOIN sk USING (event_type)
            ORDER BY event_type
        """,
        "association_rules_lineitem": f"""
            WITH bi AS (
                SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                FROM lineitem WHERE l_partkey IS NOT NULL
            ), keep AS (
                SELECT b FROM bi GROUP BY b
                HAVING count(*) <= {AR_MAX_BASKET}
            ), kb AS (
                SELECT bi.b, bi.i FROM bi JOIN keep USING (b)
            ), nb AS (
                SELECT count(DISTINCT b) AS n_baskets FROM kb
            ), itc AS (
                SELECT i, count(*) AS n FROM kb GROUP BY 1
            ), pr AS (
                SELECT x.i AS a, y.i AS c, count(*) AS n_pair
                FROM kb x JOIN kb y ON x.b = y.b AND x.i < y.i
                GROUP BY 1, 2 HAVING count(*) >= {AR_MIN_PAIR}
            ), dr AS (
                SELECT a AS ante, c AS cons, n_pair FROM pr
                UNION ALL
                SELECT c AS ante, a AS cons, n_pair FROM pr
            ), rules AS (
                SELECT dr.ante AS antecedent, dr.cons AS consequent,
                       dr.n_pair,
                       ia.n AS n_ante, ic.n AS n_cons,
                       round(CAST(dr.n_pair AS DOUBLE)
                             / CAST(nb.n_baskets AS DOUBLE), 6) AS support,
                       round(CAST(dr.n_pair AS DOUBLE)
                             / CAST(ia.n AS DOUBLE), 6) AS confidence,
                       round(CAST(dr.n_pair AS DOUBLE)
                             * CAST(nb.n_baskets AS DOUBLE)
                             / (CAST(ia.n AS DOUBLE)
                                * CAST(ic.n AS DOUBLE)), 6) AS lift
                FROM dr
                JOIN itc ia ON ia.i = dr.ante
                JOIN itc ic ON ic.i = dr.cons
                CROSS JOIN nb
            )
            SELECT antecedent, consequent, n_pair, n_ante, n_cons,
                   support, confidence, lift
            FROM (
                SELECT *, row_number() OVER (
                    ORDER BY lift DESC, confidence DESC,
                             antecedent, consequent) AS rk
                FROM rules
            ) WHERE rk <= {AR_TOPK}
        """,
        "event_transition_matrix": _TRANSITIONS_SQL,
        # the streaming stateful counter's summed deltas equal the batch
        # matrix — the oracle IS the batch SQL replay
        "streaming_event_transitions": _TRANSITIONS_SQL,
        "readability_docs": r"""
            WITH norm AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')) AS nt
                FROM documents
            ), syl AS (
                SELECT doc_id,
                       list_transform(
                           list_filter(string_split(nt, ' '),
                                       t -> t <> ''),
                           t -> greatest(len(regexp_extract_all(
                                    t, '[aeiouy]+')), 1)) AS s
                FROM norm
            ), m AS (
                SELECT doc_id,
                       len(s) AS n_words,
                       CAST(coalesce(list_sum(s), 0) AS BIGINT)
                           AS n_syllables,
                       len(list_filter(s, x -> x >= 3)) AS n_complex
                FROM syl
            )
            SELECT doc_id, n_words, n_syllables,
                   round(CAST(n_syllables AS DOUBLE)
                         / CAST(n_words AS DOUBLE), 6) AS avg_syllables,
                   round(CAST(n_complex AS DOUBLE)
                         / CAST(n_words AS DOUBLE), 6) AS pct_complex,
                   round(206.835 - 84.6
                         * (CAST(n_syllables AS DOUBLE)
                            / CAST(n_words AS DOUBLE)), 6) AS flesch_proxy
            FROM m WHERE n_words > 0
            ORDER BY doc_id
        """,
        "gini_value_orders": """
            WITH r AS (
                SELECT o_orderpriority,
                       CAST(o_totalprice AS DECIMAL(18,6)) AS x,
                       CAST(row_number() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice) AS DECIMAL(12,0)) AS i
                FROM orders WHERE o_totalprice IS NOT NULL
            ), agg AS (
                SELECT o_orderpriority,
                       count(*) AS n,
                       CAST(SUM(x) AS DOUBLE) AS sx,
                       CAST(SUM(i * x) AS DOUBLE) AS six
                FROM r GROUP BY 1
            )
            SELECT o_orderpriority, n,
                   round(sx, 2) AS total,
                   CASE WHEN n > 0 AND sx <> 0.0 THEN
                       round((2.0 * six - (CAST(n AS DOUBLE) + 1.0) * sx)
                             / (CAST(n AS DOUBLE) * sx), 6)
                   END AS gini
            FROM agg ORDER BY o_orderpriority
        """,
        "source_overlap_docs": f"""
            WITH fs AS (
                SELECT DISTINCT source AS s, unnest({_shingle_sql()}) AS fp
                FROM documents
                WHERE text IS NOT NULL AND source IS NOT NULL
            ), ps AS (
                SELECT s, count(*) AS n FROM fs GROUP BY 1
            ), sh AS (
                SELECT a.s AS source_a, b.s AS source_b,
                       count(*) AS n_shared
                FROM fs a JOIN fs b ON a.fp = b.fp AND a.s < b.s
                GROUP BY 1, 2
            )
            SELECT source_a, source_b, n_shared,
                   pa.n AS n_a, pb.n AS n_b,
                   round(CAST(n_shared AS DOUBLE)
                         / CAST(pa.n + pb.n - n_shared AS DOUBLE), 6)
                       AS jaccard
            FROM sh
            JOIN ps pa ON pa.s = sh.source_a
            JOIN ps pb ON pb.s = sh.source_b
            ORDER BY source_a, source_b
        """,
        "mixture_allocation_docs": f"""
            WITH caps AS (
                SELECT source, CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT)
                           AS capacity
                FROM documents GROUP BY 1
            ), r AS (
                SELECT source, capacity,
                       row_number() OVER (ORDER BY capacity, source) AS i,
                       coalesce(SUM(capacity) OVER (
                           ORDER BY capacity, source
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS pfx,
                       count(*) OVER () AS n,
                       SUM(capacity) OVER () AS tot
                FROM caps
            ), c AS (
                SELECT *,
                       (CAST(tot AS DOUBLE) * {WFILL_FRAC}
                        - CAST(pfx AS DOUBLE))
                       / CAST(n - i + 1 AS DOUBLE) AS cand
                FROM r
            ), th AS (
                SELECT min_by(cand, i) AS theta FROM c
                WHERE cand <= CAST(capacity AS DOUBLE)
            )
            SELECT source, capacity,
                   round(CASE WHEN theta IS NULL
                              THEN CAST(capacity AS DOUBLE)
                              ELSE least(CAST(capacity AS DOUBLE), theta)
                         END, 6) AS alloc,
                   CASE WHEN capacity > 0 THEN
                       round(CASE WHEN theta IS NULL
                                  THEN CAST(capacity AS DOUBLE)
                                  ELSE least(CAST(capacity AS DOUBLE),
                                             theta)
                             END / CAST(capacity AS DOUBLE), 6)
                   END AS rate
            FROM c CROSS JOIN th ORDER BY source
        """,
        "rbo_rank_similarity_emb": f"""
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qvec
                FROM embeddings WHERE vec_id < {N_QUERY_VECS}
            ), full_k AS (
                SELECT query_id, corpus_id, rnk FROM (
                    SELECT q.query_id, c.vec_id AS corpus_id,
                           row_number() OVER (
                               PARTITION BY q.query_id
                               ORDER BY {_cos_sql("q.qvec", "c.embedding")}
                                   DESC, c.vec_id ASC) AS rnk
                    FROM embeddings c, q WHERE c.vec_id <> q.query_id
                ) WHERE rnk <= {RBO_DEPTH}
            ), tr_k AS (
                SELECT query_id, corpus_id, rnk FROM (
                    SELECT q.query_id, c.vec_id AS corpus_id,
                           row_number() OVER (
                               PARTITION BY q.query_id
                               ORDER BY {_cos_sql(
                                   f"q.qvec[1:{MATRYOSHKA_DIMS}]",
                                   f"c.embedding[1:{MATRYOSHKA_DIMS}]")}
                                   DESC, c.vec_id ASC) AS rnk
                    FROM embeddings c, q WHERE c.vec_id <> q.query_id
                ) WHERE rnk <= {RBO_DEPTH}
            ), m AS (
                SELECT a.query_id,
                       {_rbo_case_sql("greatest(a.rnk, b.rnk)")} AS w
                FROM full_k a
                JOIN tr_k b USING (query_id, corpus_id)
            ), per_q AS (
                SELECT query_id, count(*) AS n_common, SUM(w) AS ws
                FROM m GROUP BY 1
            )
            SELECT qq.query_id,
                   CAST(coalesce(p.n_common, 0) AS BIGINT) AS n_common,
                   round({repr(1.0 - RBO_P)}
                         * coalesce(CAST(p.ws AS DOUBLE), 0.0), 6) AS rbo
            FROM (SELECT vec_id AS query_id FROM embeddings
                  WHERE vec_id < {N_QUERY_VECS}) qq
            LEFT JOIN per_q p USING (query_id)
            ORDER BY qq.query_id
        """,
        "hill_tail_orders": f"""
            WITH pos AS (
                SELECT o_orderpriority AS g, o_totalprice AS v
                FROM orders WHERE o_totalprice > 0
            ), cnt AS (
                SELECT g, count(*) AS n_pos FROM pos GROUP BY 1
            ), r AS (
                SELECT g, CAST(v AS DOUBLE) AS v,
                       row_number() OVER (
                           PARTITION BY g ORDER BY v DESC) AS rn
                FROM pos
            ), kept AS (
                SELECT * FROM r WHERE rn <= {HILL_K + 1}
            ), agg AS (
                SELECT g, min(v) AS x_kth,
                       SUM(CASE WHEN rn <= {HILL_K}
                           THEN CAST(ln(v) AS DECIMAL(18,12)) END) AS sl,
                       count(*) AS nk
                FROM kept GROUP BY 1
            )
            SELECT c.g AS o_orderpriority, c.n_pos,
                   round(a.x_kth, 6) AS x_kth,
                   CASE WHEN a.nk = {HILL_K + 1} THEN
                       round((CAST(a.sl AS DOUBLE)
                              - {float(HILL_K)} * ln(a.x_kth))
                             / {float(HILL_K)}, 6)
                   END AS alpha_inv,
                   CASE WHEN a.nk = {HILL_K + 1}
                        AND (CAST(a.sl AS DOUBLE)
                             - {float(HILL_K)} * ln(a.x_kth))
                            / {float(HILL_K)} > 0.0 THEN
                       round(1.0 / ((CAST(a.sl AS DOUBLE)
                                     - {float(HILL_K)} * ln(a.x_kth))
                                    / {float(HILL_K)}), 6)
                   END AS alpha
            FROM agg a JOIN cnt c USING (g) ORDER BY o_orderpriority
        """,
        "top_mass_selection_docs": """
            WITH r AS (
                SELECT source, CAST(n_chars AS BIGINT) AS w,
                       coalesce(SUM(CAST(n_chars AS BIGINT)) OVER (
                           PARTITION BY source
                           ORDER BY n_chars DESC, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS before,
                       SUM(CAST(n_chars AS BIGINT)) OVER (
                           PARTITION BY source) AS tot
                FROM documents WHERE n_chars IS NOT NULL
            ), agg AS (
                SELECT source,
                       count(*) AS n_rows,
                       CAST(SUM(CASE WHEN before * 2 < tot
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_kept,
                       CAST(max(tot) AS BIGINT) AS total_w,
                       CAST(SUM(CASE WHEN before * 2 < tot
                                     THEN w ELSE 0 END) AS BIGINT)
                           AS kept_w
                FROM r GROUP BY 1
            )
            SELECT source, n_rows, n_kept, total_w, kept_w,
                   round(CAST(kept_w AS DOUBLE)
                         / CAST(total_w AS DOUBLE), 6) AS kept_frac
            FROM agg ORDER BY source
        """,
        "classifier_calibration_docs": f"""
            WITH toks AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS t
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(generate_series(1, len(t) - 1),
                                             i -> t[i] || ' ' || t[i+1]))
                           AS gram
                FROM toks WHERE len(t) >= 2
            ), pairs AS (
                SELECT doc_id, substr(md5(gram), 1, {DSIR_BUCKET_HEX}) AS b
                FROM g
            ), scored AS (
                SELECT doc_id,
                       CAST(SUM(CAST(
                           ((ascii(substr(b, 1, 1))
                             + 3 * ascii(substr(b, 2, 1))
                             + 7 * ascii(substr(b, 3, 1))) % 13 - 6) / 8.0
                           AS DECIMAL(28,12))) AS DOUBLE) + ({CLS_BIAS})
                           AS score
                FROM pairs GROUP BY doc_id
            ), lab AS (
                SELECT s.score,
                       CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
                FROM scored s JOIN documents d USING (doc_id)
            ), binned AS (
                SELECT CAST(greatest(least(
                           floor((score - ({CALIB_LO})) / 3.0),
                           {CALIB_BINS - 1}), 0) AS INTEGER) AS bin,
                       score, y
                FROM lab WHERE score IS NOT NULL
            ), agg AS (
                SELECT bin, count(*) AS n,
                       SUM(CAST(score AS DECIMAL(18,12))) AS ss,
                       CAST(SUM(y) AS BIGINT) AS np
                FROM binned GROUP BY 1
            )
            SELECT bin,
                   CAST(({CALIB_LO}) + bin * 3.0 AS DOUBLE) AS bin_lo,
                   CAST(({CALIB_LO}) + (bin + 1) * 3.0 AS DOUBLE) AS bin_hi,
                   n,
                   round(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE), 6)
                       AS avg_score,
                   round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6)
                       AS frac_pos,
                   round((CAST(n AS DOUBLE)
                          / CAST(SUM(n) OVER () AS DOUBLE))
                         * abs(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
                               - CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)),
                         6) AS w_abs_gap
            FROM agg ORDER BY bin
        """,
        "source_divergence_docs": r"""
            WITH toks AS (
                SELECT source AS s,
                       unnest(string_split(trim(regexp_replace(
                           regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                          'g'), '\s+', ' ', 'g')), ' '))
                           AS t
                FROM documents
                WHERE text IS NOT NULL AND source IS NOT NULL
            ), uni AS (
                SELECT s, t, count(*) AS n FROM toks
                WHERE t <> '' GROUP BY 1, 2
            ), tot AS (
                SELECT s, SUM(n) AS ns FROM uni GROUP BY 1
            ), u AS (
                SELECT uni.s, uni.t,
                       CAST(uni.n AS DOUBLE) / CAST(tot.ns AS DOUBLE) AS p
                FROM uni JOIN tot USING (s)
            ), pairs AS (
                SELECT a.s AS source_a, b.s AS source_b,
                       a.p AS pa, b.p AS pb
                FROM u a JOIN u b ON a.t = b.t AND a.s < b.s
            ), agg AS (
                SELECT source_a, source_b,
                       count(*) AS n_shared_terms,
                       SUM(CAST((pa / 2.0) * ln(2.0 * pa / (pa + pb))
                                + (pb / 2.0) * ln(2.0 * pb / (pa + pb))
                                AS DECIMAL(18,12))) AS c,
                       SUM(CAST(pa AS DECIMAL(18,12))) AS pm,
                       SUM(CAST(pb AS DECIMAL(18,12))) AS qm
                FROM pairs GROUP BY 1, 2
            )
            SELECT source_a, source_b, n_shared_terms,
                   round(CAST(c AS DOUBLE)
                         + (1.0 - CAST(pm AS DOUBLE)) / 2.0 * {LN2}
                         + (1.0 - CAST(qm AS DOUBLE)) / 2.0 * {LN2}, 6)
                       AS jsd
            FROM agg ORDER BY source_a, source_b
        """.replace("{LN2}", repr(__import__("math").log(2.0))),
        "rmst_events": f"""
            WITH RECURSIVE span AS (
                SELECT user_id, CAST(min(ts) AS DATE) AS f,
                       CAST(max(ts) AS DATE) AS l
                FROM events GROUP BY 1
            ), mx AS (
                SELECT max(l) AS m FROM span
            ), subj AS (
                SELECT datediff('day', f, l) AS duration,
                       (l <= m - {KM_CENSOR_DAYS}) AS obs
                FROM span, mx
            ), g AS (
                SELECT duration,
                       CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_events,
                       count(*) AS c
                FROM subj GROUP BY 1
            ), ser AS (
                SELECT duration, n_events, c,
                       SUM(c) OVER (ORDER BY duration
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS n_risk,
                       row_number() OVER (ORDER BY duration) AS idx
                FROM g
            ), km AS (
                SELECT idx, duration, n_risk, n_events, c,
                       CAST(1 AS DOUBLE)
                       - CAST(n_events AS DOUBLE)
                         / CAST(n_risk AS DOUBLE) AS s
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT r.idx, r.duration, r.n_risk, r.n_events, r.c,
                       km.s * (CAST(1 AS DOUBLE)
                               - CAST(r.n_events AS DOUBLE)
                                 / CAST(r.n_risk AS DOUBLE))
                FROM ser r JOIN km ON r.idx = km.idx + 1
            ), stp AS (
                SELECT duration, round(s, 6) + 0.0 AS s6,
                       lead(duration) OVER (ORDER BY duration) AS nxt
                FROM km
            ), terms AS (
                SELECT round(s6 * (least(CAST(COALESCE(nxt,
                                  {RMST_HORIZON}) AS DOUBLE),
                                  CAST({RMST_HORIZON} AS DOUBLE))
                             - least(CAST(duration AS DOUBLE),
                                     CAST({RMST_HORIZON} AS DOUBLE))), 9)
                           AS term
                FROM stp
            )
            SELECT CAST((SELECT max(n_risk) FROM ser) AS BIGINT)
                       AS n_subjects,
                   CAST({RMST_HORIZON} AS INT) AS horizon,
                   round((SELECT least(CAST(min(duration) AS DOUBLE),
                                       CAST({RMST_HORIZON} AS DOUBLE))
                          FROM km)
                         + CAST(SUM(CAST(term AS DECIMAL(38,9)))
                                AS DOUBLE), 6) + 0.0 AS rmst
            FROM terms
        """,
        "kaplan_meier_events": f"""
            WITH RECURSIVE span AS (
                SELECT user_id, CAST(min(ts) AS DATE) AS f,
                       CAST(max(ts) AS DATE) AS l
                FROM events GROUP BY 1
            ), mx AS (
                SELECT max(l) AS m FROM span
            ), subj AS (
                SELECT datediff('day', f, l) AS duration,
                       (l <= m - {KM_CENSOR_DAYS}) AS obs
                FROM span, mx
            ), g AS (
                SELECT duration,
                       CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_events,
                       count(*) AS c
                FROM subj GROUP BY 1
            ), ser AS (
                SELECT duration, n_events, c,
                       SUM(c) OVER (ORDER BY duration
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS n_risk,
                       row_number() OVER (ORDER BY duration) AS idx
                FROM g
            ), km AS (
                SELECT idx, duration, n_risk, n_events, c,
                       CAST(1 AS DOUBLE)
                       - CAST(n_events AS DOUBLE)
                         / CAST(n_risk AS DOUBLE) AS s
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT r.idx, r.duration, r.n_risk, r.n_events, r.c,
                       km.s * (CAST(1 AS DOUBLE)
                               - CAST(r.n_events AS DOUBLE)
                                 / CAST(r.n_risk AS DOUBLE))
                FROM ser r JOIN km ON r.idx = km.idx + 1
            )
            SELECT duration, CAST(n_risk AS BIGINT) AS n_risk, n_events,
                   CAST(c - n_events AS BIGINT) AS n_censored,
                   round(s, 6) + 0.0 AS survival
            FROM km ORDER BY duration
        """,
        "pareto_front_parts": """
            WITH m AS (
                SELECT p_size, min(p_retailprice) AS best
                FROM part GROUP BY 1
            ), lev AS (
                SELECT p.p_size, m.best AS best_p_retailprice,
                       count(*) AS n_best
                FROM part p JOIN m ON p.p_size = m.p_size
                                   AND p.p_retailprice = m.best
                GROUP BY 1, 2
            ), fr AS (
                SELECT p_size, best_p_retailprice, n_best,
                       min(best_p_retailprice) OVER (
                           ORDER BY p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prior
                FROM lev
            )
            SELECT p_size, best_p_retailprice, n_best
            FROM fr
            WHERE prior IS NULL OR best_p_retailprice < prior
            ORDER BY p_size DESC
        """,
        "theil_orders": """
            WITH u AS (
                SELECT c.c_nationkey AS g,
                       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,12)))
                            AS DOUBLE) AS x
                FROM orders o JOIN customer c
                  ON o.o_custkey = c.c_custkey
                GROUP BY o.o_custkey, c.c_nationkey
            ), pos AS (
                SELECT g, x FROM u WHERE x > 0.0
            ), groups AS (
                SELECT g, CAST(count(*) AS BIGINT) AS n,
                       CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS s,
                       CAST(SUM(CAST(x * ln(x) AS DECIMAL(38,12)))
                            AS DOUBLE) AS sxl
                FROM pos GROUP BY 1
            ), dropped AS (
                SELECT CAST(SUM(CASE WHEN x > 0.0 THEN 0 ELSE 1 END)
                            AS BIGINT) AS n_dropped
                FROM u
            ), tot AS (
                SELECT CAST(SUM(n) AS BIGINT) AS n,
                       CAST(count(*) AS BIGINT) AS n_groups,
                       CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE)
                           AS ts,
                       CAST(SUM(CAST(sxl AS DECIMAL(38,12))) AS DOUBLE)
                           AS tsxl
                FROM groups
            ), per AS (
                SELECT (g.s / t.ts)
                           * ln((g.s / CAST(g.n AS DOUBLE))
                                / (t.ts / CAST(t.n AS DOUBLE))) AS tb,
                       (g.s / t.ts)
                           * (g.sxl / (CAST(g.n AS DOUBLE)
                                       * (g.s / CAST(g.n AS DOUBLE)))
                              - ln(g.s / CAST(g.n AS DOUBLE))) AS tw
                FROM groups g CROSS JOIN tot t
            ), folded AS (
                SELECT CAST(SUM(CAST(tb AS DECIMAL(38,12))) AS DOUBLE)
                           AS theil_between,
                       CAST(SUM(CAST(tw AS DECIMAL(38,12))) AS DOUBLE)
                           AS theil_within
                FROM per
            )
            SELECT t.n, d.n_dropped, t.n_groups,
                   round(t.tsxl / (CAST(t.n AS DOUBLE)
                                   * (t.ts / CAST(t.n AS DOUBLE)))
                         - ln(t.ts / CAST(t.n AS DOUBLE)), 6) + 0.0
                       AS theil_total,
                   round(f.theil_between, 6) + 0.0 AS theil_between,
                   round(f.theil_within, 6) + 0.0 AS theil_within
            FROM tot t CROSS JOIN folded f CROSS JOIN dropped d
        """,
        "ratio_delta_orders": (lambda arm_agg, ratio, var: f"""
            WITH u AS (
                SELECT o_custkey,
                       CASE WHEN substr(md5('{RD_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,12)))
                            AS DOUBLE) AS x,
                       CAST(count(*) AS DOUBLE) AS y
                FROM orders GROUP BY 1, 2
            ), agg AS (
                SELECT {arm_agg('a', 'A')},
                       {arm_agg('b', 'B')}
                FROM u
            ), dv AS (
                SELECT n_a, n_b,
                       {ratio('a')} AS ra, {ratio('b')} AS rb,
                       {var('a')} AS va, {var('b')} AS vb
                FROM agg
            )
            SELECT n_a, n_b,
                   round(ra, 6) + 0.0 AS ratio_a,
                   round(rb, 6) + 0.0 AS ratio_b,
                   round(rb - ra, 6) + 0.0 AS diff,
                   round(sqrt(va + vb), 6) + 0.0 AS se,
                   round(CASE WHEN sqrt(va + vb) > 0.0
                              THEN (rb - ra) / sqrt(va + vb) END, 6) + 0.0
                       AS z,
                   round(CASE WHEN sqrt(va + vb) > 0.0 THEN
                       {_two_sided_p_sql('(rb - ra) / sqrt(va + vb)')}
                       END, 6) + 0.0 AS p_value
            FROM dv
        """)(
            lambda t, a: (
                f"CAST(SUM(CASE WHEN arm = '{a}' THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS n_{t}, "
                + ", ".join(
                    f"COALESCE(CAST(SUM(CASE WHEN arm = '{a}' THEN "
                    f"CAST({e} AS DECIMAL(38,12)) END) AS DOUBLE), 0.0)"
                    f" AS {n}_{t}"
                    for n, e in (("sx", "x"), ("sy", "y"), ("sxx", "x * x"),
                                 ("sxy", "x * y"), ("syy", "y * y")))),
            lambda t: (f"(CASE WHEN sy_{t} <> 0.0 "
                       f"THEN sx_{t} / sy_{t} END)"),
            lambda t: (
                f"(CASE WHEN n_{t} >= 2 AND sy_{t}"
                f" / CAST(n_{t} AS DOUBLE) <> 0.0 THEN"
                f" ((sxx_{t} - sx_{t} * sx_{t} / CAST(n_{t} AS DOUBLE))"
                f" / (CAST(n_{t} AS DOUBLE) - 1.0)"
                f" - 2.0 * (CASE WHEN sy_{t} <> 0.0 THEN sx_{t} / sy_{t}"
                f" END)"
                f" * ((sxy_{t} - sx_{t} * sy_{t} / CAST(n_{t} AS DOUBLE))"
                f" / (CAST(n_{t} AS DOUBLE) - 1.0))"
                f" + (CASE WHEN sy_{t} <> 0.0 THEN sx_{t} / sy_{t} END)"
                f" * (CASE WHEN sy_{t} <> 0.0 THEN sx_{t} / sy_{t} END)"
                f" * ((syy_{t} - sy_{t} * sy_{t} / CAST(n_{t} AS DOUBLE))"
                f" / (CAST(n_{t} AS DOUBLE) - 1.0)))"
                f" / (CAST(n_{t} AS DOUBLE)"
                f" * (sy_{t} / CAST(n_{t} AS DOUBLE))"
                f" * (sy_{t} / CAST(n_{t} AS DOUBLE))) END)")),
        "post_stratified_ate_orders": f"""
            WITH u AS (
                SELECT o.o_custkey,
                       CASE WHEN substr(md5('{PS_SEED}-'
                                 || CAST(o.o_custkey AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       c.c_mktsegment AS s,
                       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,12)))
                            AS DOUBLE) AS y
                FROM orders o JOIN customer c
                  ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2, 3
            ), cells AS (
                SELECT s,
                       CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                            AS BIGINT) AS na,
                       CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
                            AS BIGINT) AS nb,
                       COALESCE(CAST(SUM(CASE WHEN arm = 'A'
                           THEN CAST(y AS DECIMAL(38,12)) END)
                           AS DOUBLE), 0.0) AS sa,
                       COALESCE(CAST(SUM(CASE WHEN arm = 'B'
                           THEN CAST(y AS DECIMAL(38,12)) END)
                           AS DOUBLE), 0.0) AS sb,
                       COALESCE(CAST(SUM(CASE WHEN arm = 'A'
                           THEN CAST(y * y AS DECIMAL(38,12)) END)
                           AS DOUBLE), 0.0) AS qa,
                       COALESCE(CAST(SUM(CASE WHEN arm = 'B'
                           THEN CAST(y * y AS DECIMAL(38,12)) END)
                           AS DOUBLE), 0.0) AS qb
                FROM u GROUP BY 1
            ), raw AS (
                SELECT CAST(SUM(na + nb) AS BIGINT) AS n_units,
                       COALESCE(CAST(SUM(CAST(sa AS DECIMAL(38,12)))
                           AS DOUBLE), 0.0) AS ta,
                       COALESCE(CAST(SUM(CAST(sb AS DECIMAL(38,12)))
                           AS DOUBLE), 0.0) AS tb,
                       CAST(SUM(na) AS BIGINT) AS tna,
                       CAST(SUM(nb) AS BIGINT) AS tnb
                FROM cells
            ), inc AS (
                SELECT * FROM cells WHERE na >= 2 AND nb >= 2
            ), tot AS (
                SELECT CAST(SUM(na + nb) AS BIGINT) AS nt FROM inc
            ), terms AS (
                SELECT i.na, i.nb,
                       (CAST(i.na AS DOUBLE) + CAST(i.nb AS DOUBLE))
                           / CAST(t.nt AS DOUBLE) AS w,
                       i.sb / CAST(i.nb AS DOUBLE)
                           - i.sa / CAST(i.na AS DOUBLE) AS dlt,
                       (i.qa - i.sa * i.sa / CAST(i.na AS DOUBLE))
                           / (CAST(i.na AS DOUBLE) - 1.0) AS va,
                       (i.qb - i.sb * i.sb / CAST(i.nb AS DOUBLE))
                           / (CAST(i.nb AS DOUBLE) - 1.0) AS vb
                FROM inc i CROSS JOIN tot t
            ), folded AS (
                SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
                       CAST(SUM(na + nb) AS BIGINT) AS n_units_used,
                       COALESCE(CAST(SUM(CAST(w * dlt AS DECIMAL(38,12)))
                           AS DOUBLE), 0.0) AS ate,
                       COALESCE(CAST(SUM(CAST(w * w
                           * (va / CAST(na AS DOUBLE)
                              + vb / CAST(nb AS DOUBLE))
                           AS DECIMAL(38,12))) AS DOUBLE), 0.0) AS var
                FROM terms
            )
            SELECT r.n_units, f.n_strata_used, f.n_units_used,
                   round(r.tb / CAST(r.tnb AS DOUBLE)
                         - r.ta / CAST(r.tna AS DOUBLE), 6) + 0.0
                       AS ate_raw,
                   round(f.ate, 6) + 0.0 AS ate_ps,
                   round(sqrt(f.var), 6) + 0.0 AS se_ps,
                   round(CASE WHEN sqrt(f.var) > 0.0
                              THEN f.ate / sqrt(f.var) END, 6) + 0.0
                       AS z,
                   round(CASE WHEN sqrt(f.var) > 0.0 THEN
                       {_two_sided_p_sql('f.ate / sqrt(f.var)')}
                       END, 6) + 0.0 AS p_value
            FROM raw r CROSS JOIN folded f
        """,
        "cuped_experiment_orders": f"""
            WITH u AS (
                SELECT o_custkey,
                       CASE WHEN substr(md5('{CUPED_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       COALESCE(CAST(SUM(CASE
                           WHEN CAST(o_orderdate AS DATE)
                                < DATE '{CUPED_SPLIT}'
                           THEN CAST(o_totalprice AS DECIMAL(28,12))
                           END) AS DOUBLE), 0.0) AS pre,
                       COALESCE(CAST(SUM(CASE
                           WHEN CAST(o_orderdate AS DATE)
                                >= DATE '{CUPED_SPLIT}'
                           THEN CAST(o_totalprice AS DECIMAL(28,12))
                           END) AS DOUBLE), 0.0) AS post
                FROM orders GROUP BY 1
            ), g AS (
                SELECT CAST(count(*) AS DOUBLE) AS n,
                       CAST(SUM(CAST(pre AS DECIMAL(38,12)))
                            AS DOUBLE) AS sx,
                       CAST(SUM(CAST(post AS DECIMAL(38,12)))
                            AS DOUBLE) AS sy,
                       CAST(SUM(CAST(pre * post AS DECIMAL(38,12)))
                            AS DOUBLE) AS sxy,
                       CAST(SUM(CAST(pre * pre AS DECIMAL(38,12)))
                            AS DOUBLE) AS sxx
                FROM u
            ), t AS (
                SELECT (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
                       sx / n AS mx
                FROM g
            ), a AS (
                SELECT arm, count(*) AS n_units,
                       CAST(SUM(CAST(pre AS DECIMAL(38,12)))
                            AS DOUBLE) AS ax,
                       CAST(SUM(CAST(post AS DECIMAL(38,12)))
                            AS DOUBLE) AS ay
                FROM u GROUP BY 1
            )
            SELECT arm, n_units,
                   round(ax / CAST(n_units AS DOUBLE), 6) + 0.0
                       AS mean_pre,
                   round(ay / CAST(n_units AS DOUBLE), 6) + 0.0
                       AS mean_post,
                   round(ay / CAST(n_units AS DOUBLE)
                         - t.theta * (ax / CAST(n_units AS DOUBLE)
                                      - t.mx), 6) + 0.0 AS mean_adj,
                   round(t.theta, 6) + 0.0 AS theta
            FROM a, t ORDER BY arm
        """,
        "attribution_events": """
            WITH conv AS (
                SELECT user_id, ts AS cts, event_id AS cid FROM (
                    SELECT user_id, ts, event_id,
                           row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
                    FROM events WHERE event_type = 'purchase')
                WHERE rn = 1
            ), tch AS (
                SELECT e.user_id, e.event_type, e.ts, e.event_id
                FROM events e JOIN conv c ON e.user_id = c.user_id
                WHERE e.event_type <> 'purchase'
                  AND (e.ts < c.cts
                       OR (e.ts = c.cts AND e.event_id < c.cid))
            ), ranked AS (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rf,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rl
                FROM tch
            ), pu AS (
                SELECT user_id,
                       MAX(CASE WHEN rf = 1 THEN event_type END)
                           AS first_t,
                       MAX(CASE WHEN rl = 1 THEN event_type END)
                           AS last_t
                FROM ranked GROUP BY 1
            ), cf AS (
                SELECT first_t AS channel, count(*) AS n_first_touch
                FROM pu GROUP BY 1
            ), cl AS (
                SELECT last_t AS channel, count(*) AS n_last_touch
                FROM pu GROUP BY 1
            ), direct AS (
                SELECT '(direct)' AS channel,
                       count(*) AS n_first_touch,
                       count(*) AS n_last_touch
                FROM conv c LEFT JOIN pu ON c.user_id = pu.user_id
                WHERE pu.user_id IS NULL
                HAVING count(*) > 0
            )
            SELECT channel,
                   COALESCE(n_first_touch, 0) AS n_first_touch,
                   COALESCE(n_last_touch, 0) AS n_last_touch
            FROM cf FULL OUTER JOIN cl USING (channel)
            UNION ALL
            SELECT * FROM direct
            ORDER BY channel
        """,
        "isotropy_embeddings": """
            WITH base AS (
                SELECT label AS grp, embedding
                FROM embeddings WHERE embedding IS NOT NULL
            ), nrm AS (
                SELECT grp,
                       round(sqrt(round(list_sum(list_transform(embedding,
                           v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
                           9)), 6) AS nrm
                FROM base
            ), pg AS (
                SELECT grp, count(*) AS n_vecs,
                       CAST(SUM(CAST(nrm AS DECIMAL(28,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS mean_norm
                FROM nrm GROUP BY 1
            ), per AS (
                SELECT grp, CAST(v AS DOUBLE) AS v, pos FROM (
                    SELECT grp, unnest(embedding) AS v,
                           unnest(generate_series(0, len(embedding) - 1))
                               AS pos
                    FROM base)
            ), dims AS (
                SELECT grp, pos,
                       CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS m
                FROM per GROUP BY 1, 2
            ), mv AS (
                SELECT grp, count(*) AS dim,
                       CAST(SUM(CAST(m * m AS DECIMAL(38,12)))
                            AS DOUBLE) AS msq
                FROM dims GROUP BY 1
            )
            SELECT pg.grp AS "group", pg.n_vecs, mv.dim,
                   round(sqrt(round(mv.msq, 9)), 6) + 0.0
                       AS mean_vec_norm,
                   round(pg.mean_norm, 6) + 0.0 AS mean_norm,
                   round(round(sqrt(round(mv.msq, 9)), 6) / pg.mean_norm,
                         6) + 0.0 AS anisotropy
            FROM pg JOIN mv USING (grp) ORDER BY 1
        """,
        "window_funnel_events": f"""
            WITH s0 AS (
                SELECT user_id, min(ts) AS t0 FROM events
                WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY 1
            ), s1 AS (
                SELECT e.user_id, min(e.ts) AS t1, min(s0.t0) AS t0
                FROM events e JOIN s0 USING (user_id)
                WHERE e.event_type = '{FUNNEL_STAGES[1]}'
                  AND e.ts > s0.t0
                  AND e.ts <= s0.t0 + INTERVAL {WF_WITHIN_SECONDS} SECOND
                GROUP BY 1
            ), s2 AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = '{FUNNEL_STAGES[2]}'
                  AND e.ts > s1.t1
                  AND e.ts <= s1.t0 + INTERVAL {WF_WITHIN_SECONDS} SECOND
                GROUP BY 1
            )
            SELECT * FROM (VALUES
                (CAST(1 AS INT), '{FUNNEL_STAGES[0]}',
                 (SELECT count(*) FROM s0)),
                (CAST(2 AS INT), '{FUNNEL_STAGES[1]}',
                 (SELECT count(*) FROM s1)),
                (CAST(3 AS INT), '{FUNNEL_STAGES[2]}',
                 (SELECT count(*) FROM s2))
            ) AS t(stage, event_type, n_keys)
            ORDER BY stage
        """,
        "table_fingerprint_docs": """
            WITH h AS (
                SELECT source, substr(md5(concat_ws(chr(31),
                           COALESCE(CAST(doc_id AS VARCHAR), '<NULL>'),
                           COALESCE(lang, '<NULL>'),
                           COALESCE(CAST(n_chars AS VARCHAR), '<NULL>'))),
                           1, 12) AS hh
                FROM documents
            )
            SELECT source, count(*) AS n_rows,
                   CAST(SUM(CAST(CAST('0x' || hh AS UBIGINT)
                            AS DECIMAL(38,0)))
                        % 2305843009213693951 AS BIGINT) AS checksum,
                   min(hh) AS min_hash, max(hh) AS max_hash
            FROM h GROUP BY 1 ORDER BY 1
        """,
        "rake_keyphrases_docs": f"""
            WITH nt AS (
                SELECT doc_id, string_split({_NORM}, ' ') AS ts
                FROM documents
            ), toks AS (
                SELECT doc_id, tok, pos FROM (
                    SELECT doc_id, unnest(ts) AS tok,
                           unnest(generate_series(1, len(ts))) AS pos
                    FROM nt)
                WHERE tok <> ''
            ), grp AS (
                SELECT doc_id, tok, pos,
                       SUM(CASE WHEN list_contains({_STOPWORDS_SQL}, tok)
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS g
                FROM toks
            ), phr AS (
                SELECT doc_id, g,
                       string_agg(tok, ' ' ORDER BY pos) AS phrase,
                       count(*) AS n_words
                FROM grp
                WHERE NOT list_contains({_STOPWORDS_SQL}, tok)
                GROUP BY 1, 2
                HAVING count(*) <= {RAKE_MAX_WORDS}
            ), iw AS (
                SELECT n_words, unnest(string_split(phrase, ' ')) AS word
                FROM phr
            ), stats AS (
                SELECT word,
                       CAST(SUM(n_words) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS r
                FROM iw GROUP BY 1
            ), dph AS (
                SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
                       count(*) AS n_occurrences
                FROM phr GROUP BY 1, 2
            ), pwords AS (
                SELECT phrase, unnest(string_split(phrase, ' ')) AS word
                FROM dph
            ), scored AS (
                SELECT p.phrase,
                       round(CAST(SUM(CAST(s.r AS DECIMAL(28,12)))
                                  AS DOUBLE), 6) + 0.0 AS score
                FROM pwords p JOIN stats s USING (word)
                GROUP BY 1
            )
            SELECT d.phrase, d.n_words, d.n_occurrences, s.score
            FROM dph d JOIN scored s USING (phrase)
            ORDER BY s.score DESC, d.phrase
            LIMIT {RAKE_TOP_K}
        """,
        "lpa_communities_parts": f"""
            WITH {_COPURCHASE_EDGES_SQL}, bt AS (
                SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges
            ), lab0 AS (
                SELECT DISTINCT src AS node, src AS label FROM bt
            ), c1 AS (
                SELECT b.src AS node, l.label, count(*) AS c
                FROM bt b JOIN lab0 l ON b.dst = l.node GROUP BY 1, 2
            ), lab1 AS (
                SELECT node, label FROM (
                    SELECT node, label, row_number() OVER (
                        PARTITION BY node ORDER BY c DESC, label ASC) AS rn
                    FROM c1) WHERE rn = 1
            ), c2 AS (
                SELECT b.src AS node, l.label, count(*) AS c
                FROM bt b JOIN lab1 l ON b.dst = l.node GROUP BY 1, 2
            ), lab2 AS (
                SELECT node, label FROM (
                    SELECT node, label, row_number() OVER (
                        PARTITION BY node ORDER BY c DESC, label ASC) AS rn
                    FROM c2) WHERE rn = 1
            )
            SELECT label AS community, count(*) AS n_nodes
            FROM lab2 GROUP BY 1
            ORDER BY n_nodes DESC, community LIMIT 20
        """,
        "link_prediction_parts": f"""
            WITH nodes AS (
                SELECT DISTINCT l_orderkey AS g, l_partkey AS n
                FROM lineitem WHERE l_partkey IS NOT NULL
            ), gs AS (
                SELECT g FROM nodes GROUP BY g
                HAVING count(*) >= 2
                   AND count(*) <= {LINKPRED_MAX_BASKET}
            ), edges AS (
                SELECT DISTINCT a.n AS src, b.n AS dst
                FROM nodes a JOIN gs USING (g) JOIN nodes b USING (g)
                WHERE a.n < b.n
            ), bt AS (
                SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges
            ), deg AS (
                SELECT src AS node, count(*) AS degree FROM bt GROUP BY 1
            ), ctr AS (
                SELECT b.src, b.dst FROM bt b JOIN deg d ON b.src = d.node
                WHERE d.degree <= {LINKPRED_MAX_DEGREE}
            ), common AS (
                SELECT x.dst AS a, y.dst AS b, count(*) AS n_common
                FROM ctr x JOIN ctr y
                  ON x.src = y.src AND x.dst < y.dst
                GROUP BY 1, 2
            ), cand AS (
                SELECT c.a, c.b, c.n_common
                FROM common c LEFT JOIN edges e
                  ON c.a = e.src AND c.b = e.dst
                WHERE e.src IS NULL
            )
            SELECT c.a AS src, c.b AS dst,
                   CAST(c.n_common AS BIGINT) AS n_common,
                   round(CAST(c.n_common AS DOUBLE)
                         / CAST(da.degree + db.degree - c.n_common
                                AS DOUBLE), 6) + 0.0 AS jaccard
            FROM cand c JOIN deg da ON c.a = da.node
                        JOIN deg db ON c.b = db.node
            ORDER BY jaccard DESC, src, dst LIMIT 20
        """,
        "coreness_hist_parts": (lambda iter_sql: f"""
            WITH nodes AS (
                SELECT DISTINCT l_orderkey AS g, l_partkey AS n
                FROM lineitem WHERE l_partkey IS NOT NULL
            ), gs AS (
                SELECT g FROM nodes GROUP BY g
                HAVING count(*) >= 2
                   AND count(*) <= {LINKPRED_MAX_BASKET}
            ), edges AS (
                SELECT DISTINCT a.n AS src, b.n AS dst
                FROM nodes a JOIN gs USING (g) JOIN nodes b USING (g)
                WHERE a.n < b.n
            ), bt AS (
                SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges
            ), v0 AS (
                SELECT src AS node, CAST(count(*) AS BIGINT) AS val
                FROM bt GROUP BY 1
            ),
            {", ".join(iter_sql(i) for i in range(1, CORENESS_ITERS + 1))}
            SELECT val AS coreness, CAST(count(*) AS BIGINT) AS n_nodes
            FROM v{CORENESS_ITERS} GROUP BY 1 ORDER BY 1
        """)(lambda i: f"""v{i} AS (
                SELECT src AS node,
                       MAX(LEAST(CAST(rn AS BIGINT), nv)) AS val
                FROM (
                    SELECT b.src, v.val AS nv,
                           row_number() OVER (PARTITION BY b.src
                                              ORDER BY v.val DESC, b.dst)
                               AS rn
                    FROM bt b JOIN v{i - 1} v ON b.dst = v.node
                ) GROUP BY 1
            )"""),
        "khop_reach_parts": f"""
            WITH nodes AS (
                SELECT DISTINCT l_orderkey AS g, l_partkey AS n
                FROM lineitem WHERE l_partkey IS NOT NULL
            ), gs AS (
                SELECT g FROM nodes GROUP BY g
                HAVING count(*) >= 2
                   AND count(*) <= {LINKPRED_MAX_BASKET}
            ), edges AS (
                SELECT DISTINCT a.n AS src, b.n AS dst
                FROM nodes a JOIN gs USING (g) JOIN nodes b USING (g)
                WHERE a.n < b.n
            ), bt AS (
                SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges
            ), deg AS (
                SELECT src AS node, count(*) AS degree FROM bt GROUP BY 1
            ), ctr AS (
                SELECT b.src, b.dst FROM bt b JOIN deg d ON b.src = d.node
                WHERE d.degree <= {LINKPRED_MAX_DEGREE}
            ), uni AS (
                SELECT DISTINCT node, reached FROM (
                    SELECT x.dst AS node, y.dst AS reached
                    FROM ctr x JOIN ctr y ON x.src = y.src
                    WHERE x.dst <> y.dst
                    UNION ALL
                    SELECT src AS node, dst AS reached FROM bt
                )
            ), reach AS (
                SELECT node, count(*) AS reach2 FROM uni GROUP BY 1
            )
            SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
                   CAST(r.reach2 AS BIGINT) AS reach2,
                   round(CAST(r.reach2 AS DOUBLE)
                         / CAST(d.degree AS DOUBLE), 6) + 0.0
                       AS expansion
            FROM deg d JOIN reach r USING (node)
            ORDER BY reach2 DESC, node LIMIT 20
        """,
        "ohlc_events": """
            WITH r AS (
                SELECT event_type, CAST(ts AS DATE) AS day, value,
                       row_number() OVER (
                           PARTITION BY event_type, CAST(ts AS DATE)
                           ORDER BY ts, event_id) AS rf,
                       row_number() OVER (
                           PARTITION BY event_type, CAST(ts AS DATE)
                           ORDER BY ts DESC, event_id DESC) AS rl
                FROM events
            )
            SELECT event_type, day,
                   MAX(CASE WHEN rf = 1 THEN value END) AS open,
                   MAX(value) AS high, MIN(value) AS low,
                   MAX(CASE WHEN rl = 1 THEN value END) AS close,
                   count(*) AS n_points,
                   round(CAST(SUM(CAST(value AS DECIMAL(28,12)))
                              AS DOUBLE), 6) + 0.0 AS sum_value
            FROM r GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "session_bounce_events": """
            WITH ord AS (
                SELECT user_id, event_type, ts, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS es
                FROM events
            ), flg AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(es) OVER w IS NULL
                                 OR es - lag(es) OVER w > 1800
                            THEN 1 ELSE 0 END AS nw
                FROM ord
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), ses AS (
                SELECT user_id, event_type, ts, event_id,
                       SUM(nw) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
                FROM flg
            ), rk AS (
                SELECT user_id, sid, event_type,
                       row_number() OVER (PARTITION BY user_id, sid
                           ORDER BY ts, event_id) AS rf,
                       row_number() OVER (PARTITION BY user_id, sid
                           ORDER BY ts DESC, event_id DESC) AS rl
                FROM ses
            ), per AS (
                SELECT user_id, sid,
                       MAX(CASE WHEN rf = 1 THEN event_type END) AS entry,
                       MAX(CASE WHEN rl = 1 THEN event_type END) AS exit,
                       count(*) AS n
                FROM rk GROUP BY 1, 2
            ), credits AS (
                SELECT entry AS t, 1 AS e, 0 AS x,
                       CASE WHEN n = 1 THEN 1 ELSE 0 END AS b FROM per
                UNION ALL
                SELECT exit AS t, 0 AS e, 1 AS x, 0 AS b FROM per
            ), agg AS (
                SELECT t AS event_type,
                       CAST(SUM(e) AS BIGINT) AS n_entries,
                       CAST(SUM(x) AS BIGINT) AS n_exits,
                       CAST(SUM(b) AS BIGINT) AS n_bounces
                FROM credits GROUP BY 1
            )
            SELECT event_type, n_entries, n_exits, n_bounces,
                   CASE WHEN n_entries > 0
                        THEN round(CAST(n_bounces AS DOUBLE)
                                   / CAST(n_entries AS DOUBLE), 6) + 0.0
                        END AS bounce_rate
            FROM agg ORDER BY event_type
        """,
        "seasonality_strength_events": """
            WITH daily AS (
                SELECT event_type AS key, CAST(ts AS DATE) AS d,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), pd AS (
                SELECT key,
                       ((CAST(d AS DATE) - DATE '1970-01-05') % 7 + 7) % 7
                           AS dow,
                       count(*) AS c,
                       CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DOUBLE) AS s
                FROM daily GROUP BY 1, 2
            ), g AS (
                SELECT key, count(*) AS n_days,
                       CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DOUBLE) AS S,
                       CAST(SUM(CAST(n * n AS DECIMAL(38,0))) AS DOUBLE)
                           AS Q
                FROM daily GROUP BY 1
            ), bt AS (
                SELECT p.key,
                       CAST(SUM(CAST(
                           CAST(p.c AS DOUBLE)
                           * (p.s / CAST(p.c AS DOUBLE)
                              - g.S / CAST(g.n_days AS DOUBLE))
                           * (p.s / CAST(p.c AS DOUBLE)
                              - g.S / CAST(g.n_days AS DOUBLE))
                           AS DECIMAL(38,12))) AS DOUBLE) AS ssb
                FROM pd p JOIN g USING (key) GROUP BY 1
            )
            SELECT g.key AS event_type, g.n_days,
                   CASE WHEN g.Q - g.S * g.S / CAST(g.n_days AS DOUBLE)
                             > 0.0
                        THEN round(bt.ssb
                                   / (g.Q - g.S * g.S
                                      / CAST(g.n_days AS DOUBLE)), 6)
                             + 0.0
                        END AS strength
            FROM g JOIN bt USING (key) ORDER BY 1
        """,
        "streaming_ohlc_events": """
            WITH r AS (
                SELECT event_type, CAST(ts AS DATE) AS day, value,
                       row_number() OVER (
                           PARTITION BY event_type, CAST(ts AS DATE)
                           ORDER BY ts, event_id) AS rf,
                       row_number() OVER (
                           PARTITION BY event_type, CAST(ts AS DATE)
                           ORDER BY ts DESC, event_id DESC) AS rl
                FROM events
            )
            SELECT event_type, day,
                   MAX(CASE WHEN rf = 1 THEN value END) AS open,
                   MAX(value) AS high, MIN(value) AS low,
                   MAX(CASE WHEN rl = 1 THEN value END) AS close,
                   count(*) AS n_points,
                   round(CAST(SUM(CAST(value AS DECIMAL(28,12)))
                              AS DOUBLE), 6) + 0.0 AS sum_value
            FROM r GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "ab_conversion_events": f"""
            WITH u AS (
                SELECT user_id,
                       CASE WHEN substr(md5('{CUPED_SEED}-'
                                 || CAST(user_id AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       MAX(CASE WHEN event_type = 'purchase'
                                     AND value >= 95.0
                                THEN 1 ELSE 0 END) AS conv
                FROM events GROUP BY 1
            ), per AS (
                SELECT arm, count(*) AS n_units,
                       CAST(SUM(conv) AS BIGINT) AS n_converted
                FROM u GROUP BY 1
            ), ab AS (
                SELECT max(CASE WHEN arm = 'A' THEN n_units END) AS na,
                       max(CASE WHEN arm = 'A' THEN n_converted END)
                           AS ca,
                       max(CASE WHEN arm = 'B' THEN n_units END) AS nb,
                       max(CASE WHEN arm = 'B' THEN n_converted END)
                           AS cb
                FROM per
            ), st AS (
                SELECT
                    round((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                           - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                          / sqrt((CAST(ca + cb AS DOUBLE)
                                  / CAST(na + nb AS DOUBLE))
                                 * (1.0 - CAST(ca + cb AS DOUBLE)
                                          / CAST(na + nb AS DOUBLE))
                                 * (1.0 / CAST(na AS DOUBLE)
                                    + 1.0 / CAST(nb AS DOUBLE))), 6)
                        + 0.0 AS z,
                    round((CAST(na AS DOUBLE)
                           - CAST(na + nb AS DOUBLE) / 2.0)
                          / sqrt(CAST(na + nb AS DOUBLE) / 4.0), 6)
                        + 0.0 AS srm_z
                FROM ab
            )
            SELECT p.arm, p.n_units, p.n_converted,
                   round(CAST(p.n_converted AS DOUBLE)
                         / CAST(p.n_units AS DOUBLE), 6) + 0.0 AS rate,
                   st.z, st.srm_z
            FROM per p, st ORDER BY p.arm
        """,
        # -- r10: live experiment readout over the streamed counters ---
        "streaming_experiment_readout_events": f"""
            WITH u AS (
                SELECT user_id,
                       CASE WHEN substr(md5('{CUPED_SEED}-'
                                 || CAST(user_id AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       count(*) AS n_events,
                       MAX(CASE WHEN event_type = 'purchase'
                                     AND value >= 95.0
                                THEN 1 ELSE 0 END) AS conv
                FROM events GROUP BY 1
            ), per AS (
                SELECT arm, count(*) AS n_users,
                       CAST(SUM(conv) AS BIGINT) AS n_converted,
                       CAST(SUM(CAST(n_events AS DECIMAL(38,0)))
                            AS DOUBLE) AS sum_events
                FROM u GROUP BY 1
            ), ab AS (
                SELECT max(CASE WHEN arm = 'A' THEN n_users END) AS na,
                       max(CASE WHEN arm = 'A' THEN n_converted END)
                           AS ca,
                       max(CASE WHEN arm = 'B' THEN n_users END) AS nb,
                       max(CASE WHEN arm = 'B' THEN n_converted END)
                           AS cb
                FROM per
            ), st AS (
                SELECT
                    (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                     - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                    / sqrt((CAST(ca + cb AS DOUBLE)
                            / CAST(na + nb AS DOUBLE))
                           * (1.0 - CAST(ca + cb AS DOUBLE)
                                    / CAST(na + nb AS DOUBLE))
                           * (1.0 / CAST(na AS DOUBLE)
                              + 1.0 / CAST(nb AS DOUBLE))) AS z_raw,
                    round((CAST(na AS DOUBLE)
                           - CAST(na + nb AS DOUBLE) / 2.0)
                          / sqrt(CAST(na + nb AS DOUBLE) / 4.0), 6)
                        + 0.0 AS srm_z
                FROM ab
            )
            SELECT p.arm, p.n_users, p.n_converted,
                   round(CAST(p.n_converted AS DOUBLE)
                         / CAST(p.n_users AS DOUBLE), 6) + 0.0
                       AS conv_rate,
                   round(p.sum_events / CAST(p.n_users AS DOUBLE), 6)
                       + 0.0 AS avg_events,
                   round(st.z_raw, 6) + 0.0 AS z,
                   st.srm_z,
                   abs(st.z_raw) > 1.96 AS significant
            FROM per p, st ORDER BY p.arm
        """,
        "self_repetition_docs": f"""
            WITH toks AS (
                SELECT source, string_split({_NORM}, ' ') AS t
                FROM documents
            ), pd AS (
                SELECT source,
                       len(g) AS total,
                       1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                             / CAST(len(g) AS DOUBLE) AS rep
                FROM (
                    SELECT source,
                           list_transform(
                               generate_series(1, len(t) - {SELFREP_K - 1}),
                               i -> array_to_string(
                                   list_slice(t, i, i + {SELFREP_K - 1}),
                                   ' ')) AS g
                    FROM toks)
                WHERE len(g) >= 1
            )
            SELECT source, count(*) AS n_docs,
                   round(CAST(SUM(CAST(rep AS DECIMAL(28,12))) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0
                       AS mean_repetition,
                   round(CAST(SUM(CASE WHEN rep >= {SELFREP_THRESHOLD}
                                       THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0
                       AS share_degenerate
            FROM pd GROUP BY 1 ORDER BY 1
        """,
        "fisher_separation_emb": """
            WITH per AS (
                SELECT label, CAST(v AS DOUBLE) AS v, pos FROM (
                    SELECT label, unnest(embedding) AS v,
                           unnest(generate_series(0, len(embedding) - 1))
                               AS pos
                    FROM embeddings WHERE embedding IS NOT NULL)
            ), dims AS (
                SELECT label, pos, count(*) AS n,
                       CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                           AS s,
                       CAST(SUM(CAST(v * v AS DECIMAL(38,12))) AS DOUBLE)
                           AS q
                FROM per GROUP BY 1, 2
            ), gdims AS (
                SELECT pos,
                       CAST(SUM(CAST(s AS DECIMAL(38,12))) AS DOUBLE)
                           AS gs,
                       SUM(n) AS gn
                FROM dims GROUP BY 1
            ), per_label AS (
                SELECT d.label, max(d.n) AS n_vecs,
                       CAST(SUM(CAST(d.q - d.s * d.s
                                     / CAST(d.n AS DOUBLE)
                                AS DECIMAL(38,12))) AS DOUBLE) AS ssw,
                       CAST(SUM(CAST(
                           (d.s / CAST(d.n AS DOUBLE)
                            - g.gs / CAST(g.gn AS DOUBLE))
                           * (d.s / CAST(d.n AS DOUBLE)
                              - g.gs / CAST(g.gn AS DOUBLE))
                           AS DECIMAL(38,12))) AS DOUBLE) AS d2
                FROM dims d JOIN gdims g USING (pos) GROUP BY 1
            ), tot AS (
                SELECT
                    CAST(SUM(CAST(CAST(n_vecs AS DOUBLE) * d2
                             AS DECIMAL(38,12))) AS DOUBLE) AS ssb,
                    CAST(SUM(CAST(ssw AS DECIMAL(38,12))) AS DOUBLE)
                        AS ssw_all
                FROM per_label
            )
            SELECT p.label, CAST(p.n_vecs AS BIGINT) AS n_vecs,
                   round(p.ssw / CAST(p.n_vecs AS DOUBLE), 6) + 0.0
                       AS mean_within,
                   round(sqrt(round(p.d2, 9)), 6) + 0.0
                       AS centroid_dist,
                   round(t.ssb / t.ssw_all, 6) + 0.0 AS fisher_ratio
            FROM per_label p, tot t ORDER BY p.label
        """,
        "growth_decomposition_orders": """
            WITH monthly AS (
                SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m')
                           AS month,
                       count(*) AS n,
                       SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
                FROM orders GROUP BY 1
            ), lagged AS (
                SELECT month, n, CAST(rev AS DOUBLE) AS rev,
                       CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE)
                           AS prev_rev,
                       CAST(lag(n) OVER (ORDER BY month) AS DOUBLE)
                           AS prev_n
                FROM monthly
            )
            SELECT month, n,
                   rev + 0.0 AS revenue,
                   rev - prev_rev + 0.0 AS d_revenue,
                   (CAST(n AS DOUBLE) - prev_n)
                       * (prev_rev / prev_n) + 0.0 AS volume_effect,
                   (rev / CAST(n AS DOUBLE) - prev_rev / prev_n)
                       * prev_n + 0.0 AS price_effect,
                   (CAST(n AS DOUBLE) - prev_n)
                       * (rev / CAST(n AS DOUBLE)
                          - prev_rev / prev_n) + 0.0 AS cross_effect
            FROM lagged ORDER BY month
        """,
        "stickiness_events": """
            WITH base AS (
                SELECT DISTINCT
                       CAST(floor((CAST(ts AS DATE) - DATE '1970-01-01')
                                  / 7.0) AS BIGINT) AS week,
                       CAST(ts AS DATE) AS d, user_id
                FROM events
            ), dau AS (
                SELECT week, d, count(*) AS dau FROM base GROUP BY 1, 2
            ), wau AS (
                SELECT week, count(DISTINCT user_id) AS wau
                FROM base GROUP BY 1
            ), pw AS (
                SELECT week,
                       CAST(SUM(CAST(dau AS DECIMAL(38,0))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS ad
                FROM dau GROUP BY 1
            )
            SELECT w.week, w.wau, round(p.ad, 6) + 0.0 AS avg_dau,
                   round(p.ad / CAST(w.wau AS DOUBLE), 6) + 0.0
                       AS stickiness
            FROM wau w JOIN pw p USING (week) ORDER BY w.week
        """,
        "trending_parts": f"""
            WITH mx AS (
                SELECT max(CAST(o_orderdate AS DATE)) AS ref FROM orders
            ), j AS (
                SELECT l.l_partkey AS key,
                       datediff('day', CAST(o.o_orderdate AS DATE),
                                mx.ref) AS age
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey, mx
            )
            SELECT key AS part, count(*) AS n_events,
                   round(CAST(SUM(CAST(
                       pow(2.0, -CAST(floor(age
                                 / {TREND_HALFLIFE_DAYS}.0) AS DOUBLE))
                       AS DECIMAL(38,18))) AS DOUBLE), 6) + 0.0 AS score
            FROM j GROUP BY 1
            ORDER BY score DESC, part LIMIT 20
        """,
        "new_vs_returning_events": """
            WITH base AS (
                SELECT DISTINCT
                       CAST(floor((CAST(ts AS DATE) - DATE '1970-01-01')
                                  / 7.0) AS BIGINT) AS week,
                       user_id
                FROM events
            ), fw AS (
                SELECT user_id, min(week) AS fw FROM base GROUP BY 1
            )
            SELECT b.week,
                   CAST(SUM(CASE WHEN b.week = f.fw THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_new,
                   CAST(SUM(CASE WHEN b.week <> f.fw THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_returning
            FROM base b JOIN fw f USING (user_id)
            GROUP BY 1 ORDER BY 1
        """,
        "k_anonymity_customer": """
            WITH cls AS (
                SELECT c_nationkey, c_mktsegment, count(*) AS n
                FROM customer GROUP BY 1, 2
            )
            SELECT * FROM (
                SELECT 2 AS k,
                       CAST(SUM(CASE WHEN n < 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_risky_classes,
                       CAST(SUM(CASE WHEN n < 2 THEN n ELSE 0 END)
                            AS BIGINT) AS n_risky_rows,
                       round(CAST(SUM(CASE WHEN n < 2 THEN n ELSE 0
                                      END) AS DOUBLE)
                             / CAST(SUM(n) AS DOUBLE), 6) + 0.0
                           AS risky_share
                FROM cls
                UNION ALL
                SELECT 5 AS k,
                       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_risky_classes,
                       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END)
                            AS BIGINT) AS n_risky_rows,
                       round(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0
                                      END) AS DOUBLE)
                             / CAST(SUM(n) AS DOUBLE), 6) + 0.0
                           AS risky_share
                FROM cls
                UNION ALL
                SELECT 10 AS k,
                       CAST(SUM(CASE WHEN n < 10 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_risky_classes,
                       CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0 END)
                            AS BIGINT) AS n_risky_rows,
                       round(CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0
                                      END) AS DOUBLE)
                             / CAST(SUM(n) AS DOUBLE), 6) + 0.0
                           AS risky_share
                FROM cls
                UNION ALL
                SELECT 20 AS k,
                       CAST(SUM(CASE WHEN n < 20 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_risky_classes,
                       CAST(SUM(CASE WHEN n < 20 THEN n ELSE 0 END)
                            AS BIGINT) AS n_risky_rows,
                       round(CAST(SUM(CASE WHEN n < 20 THEN n ELSE 0
                                      END) AS DOUBLE)
                             / CAST(SUM(n) AS DOUBLE), 6) + 0.0
                           AS risky_share
                FROM cls
            ) ORDER BY k
        """,
        "streaming_fingerprint_events": """
            WITH h AS (
                SELECT event_type, substr(md5(concat_ws(chr(31),
                           COALESCE(CAST(event_id AS VARCHAR), '<NULL>'),
                           COALESCE(CAST(user_id AS VARCHAR), '<NULL>'),
                           COALESCE(event_type, '<NULL>'))),
                           1, 12) AS hh
                FROM events
            )
            SELECT event_type, count(*) AS n_rows,
                   CAST(SUM(CAST(CAST('0x' || hh AS UBIGINT)
                            AS DECIMAL(38,0)))
                        % 2305843009213693951 AS BIGINT) AS checksum,
                   min(hh) AS min_hash, max(hh) AS max_hash
            FROM h GROUP BY 1 ORDER BY 1
        """,
        "experiment_readout_events": """
            WITH per AS (
                SELECT user_id, count(*) AS n,
                       MAX(CASE WHEN event_type = 'purchase'
                                     AND value >= 95.0
                                THEN 1 ELSE 0 END) AS conv,
                       min(CASE WHEN event_type = 'view'
                                THEN CAST(floor(epoch(ts)) AS BIGINT)
                           END) AS v0,
                       min(CASE WHEN event_type = 'purchase'
                                THEN CAST(floor(epoch(ts)) AS BIGINT)
                           END) AS p0,
                       CASE WHEN substr(md5('exp42-'
                                 || CAST(user_id AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 'A' ELSE 'B' END AS arm
                FROM events GROUP BY user_id
            )
            SELECT arm, count(*) AS n_users,
                   round(CAST(SUM(conv) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0
                       AS conv_rate,
                   round(CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0
                       AS avg_events,
                   round(quantile_cont(CASE WHEN p0 > v0
                             THEN (p0 - v0) / 60.0 END, 0.5), 6) + 0.0
                       AS p50_lag_min
            FROM per GROUP BY arm ORDER BY arm
        """,
        "l_diversity_customer": """
            WITH cls AS (
                SELECT c_nationkey, count(*) AS n,
                       count(DISTINCT c_mktsegment) AS d
                FROM customer GROUP BY 1
            )
            SELECT * FROM (
                SELECT 2 AS l,
                       CAST(SUM(CASE WHEN d < 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_weak_classes,
                       CAST(SUM(CASE WHEN d < 2 THEN n ELSE 0 END)
                            AS BIGINT) AS n_weak_rows,
                       round(CAST(SUM(CASE WHEN d < 2 THEN n ELSE 0
                                      END) AS DOUBLE)
                             / CAST(SUM(n) AS DOUBLE), 6) + 0.0
                           AS weak_share
                FROM cls
                UNION ALL
                SELECT 3 AS l,
                       CAST(SUM(CASE WHEN d < 3 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_weak_classes,
                       CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END)
                            AS BIGINT) AS n_weak_rows,
                       round(CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0
                                      END) AS DOUBLE)
                             / CAST(SUM(n) AS DOUBLE), 6) + 0.0
                           AS weak_share
                FROM cls
                UNION ALL
                SELECT 5 AS l,
                       CAST(SUM(CASE WHEN d < 5 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_weak_classes,
                       CAST(SUM(CASE WHEN d < 5 THEN n ELSE 0 END)
                            AS BIGINT) AS n_weak_rows,
                       round(CAST(SUM(CASE WHEN d < 5 THEN n ELSE 0
                                      END) AS DOUBLE)
                             / CAST(SUM(n) AS DOUBLE), 6) + 0.0
                           AS weak_share
                FROM cls
            ) ORDER BY l
        """,
        "t_closeness_customer": (lambda ts: f"""
            WITH cells AS (
                SELECT c_nationkey AS ck, c_mktsegment AS sv,
                       count(*) AS ncv
                FROM customer GROUP BY 1, 2
            ), cls AS (
                SELECT ck, CAST(SUM(ncv) AS BIGINT) AS nc
                FROM cells GROUP BY 1
            ), vals AS (
                SELECT sv, CAST(SUM(ncv) AS BIGINT) AS nv
                FROM cells GROUP BY 1
            ), tot AS (
                SELECT CAST(SUM(ncv) AS BIGINT) AS n FROM cells
            ), terms AS (
                SELECT c.ck, c.nc,
                       abs(CAST(COALESCE(ce.ncv, 0) AS DOUBLE)
                           / CAST(c.nc AS DOUBLE)
                           - CAST(v.nv AS DOUBLE)
                           / CAST((SELECT n FROM tot) AS DOUBLE)) AS term
                FROM cls c CROSS JOIN vals v
                LEFT JOIN cells ce ON ce.ck = c.ck AND ce.sv = v.sv
            ), tvd AS (
                SELECT ck, MAX(nc) AS nc,
                       CAST(0.5 AS DOUBLE)
                       * CAST(SUM(CAST(term AS DECIMAL(28,12)))
                              AS DOUBLE) AS tvd
                FROM terms GROUP BY 1
            )
            SELECT * FROM (
                {" UNION ALL ".join(f'''
                SELECT CAST({t!r} AS DOUBLE) AS t,
                       CAST(SUM(CASE WHEN tvd > CAST({t!r} AS DOUBLE)
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_weak_classes,
                       CAST(SUM(CASE WHEN tvd > CAST({t!r} AS DOUBLE)
                                     THEN nc ELSE 0 END) AS BIGINT)
                           AS n_weak_rows,
                       round(CAST(SUM(CASE WHEN tvd > CAST({t!r} AS DOUBLE)
                                      THEN nc ELSE 0 END) AS DOUBLE)
                             / CAST(SUM(nc) AS DOUBLE), 6) + 0.0
                           AS weak_share
                FROM tvd''' for t in ts)}
            ) ORDER BY t
        """)(T_CLOSE_TS),
        "rank_semantics_orders": """
            WITH cnt AS (
                SELECT o_custkey, count(*) AS n_orders
                FROM orders GROUP BY 1
            )
            SELECT o_custkey, n_orders,
                   CAST(rank() OVER (ORDER BY n_orders DESC) AS INT)
                       AS rnk,
                   CAST(dense_rank() OVER (ORDER BY n_orders DESC)
                        AS INT) AS drnk,
                   CAST(row_number() OVER (ORDER BY n_orders DESC,
                                           o_custkey) AS INT) AS rn
            FROM cnt
            ORDER BY n_orders DESC, o_custkey LIMIT 20
        """,
        "markov_stationary_events": """
            WITH pr AS (
                SELECT event_type AS f,
                       lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS t
                FROM events
            ), pairs AS (
                SELECT f, t, count(*) AS n FROM pr
                WHERE t IS NOT NULL GROUP BY 1, 2
            ), P AS (
                SELECT f, t,
                       CAST(n AS DOUBLE)
                       / CAST(SUM(n) OVER (PARTITION BY f) AS DOUBLE)
                           AS p
                FROM pairs
            ), states AS (
                SELECT DISTINCT f AS state FROM P
            ), kk AS (
                SELECT count(*) AS k FROM states
            ), p0 AS (
                SELECT state, CAST(1 AS DOUBLE) / CAST(kk.k AS DOUBLE)
                           AS prob
                FROM states, kk
            ), p1 AS (
                SELECT P.t AS state,
                       CAST(SUM(CAST(p0.prob * P.p
                                AS DECIMAL(38,18))) AS DOUBLE) AS prob
                FROM P JOIN p0 ON P.f = p0.state GROUP BY 1
            ), p2 AS (
                SELECT P.t AS state,
                       CAST(SUM(CAST(p1.prob * P.p
                                AS DECIMAL(38,18))) AS DOUBLE) AS prob
                FROM P JOIN p1 ON P.f = p1.state GROUP BY 1
            ), p3 AS (
                SELECT P.t AS state,
                       CAST(SUM(CAST(p2.prob * P.p
                                AS DECIMAL(38,18))) AS DOUBLE) AS prob
                FROM P JOIN p2 ON P.f = p2.state GROUP BY 1
            )
            SELECT state AS event_type,
                   round(prob, 6) + 0.0 AS stationary_prob
            FROM p3 ORDER BY 1
        """,
        "position_attribution_events": """
            WITH conv AS (
                SELECT user_id, ts AS cts, event_id AS cid FROM (
                    SELECT user_id, ts, event_id,
                           row_number() OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS rn
                    FROM events WHERE event_type = 'purchase')
                WHERE rn = 1
            ), tch AS (
                SELECT e.user_id, e.event_type, e.ts, e.event_id
                FROM events e JOIN conv c ON e.user_id = c.user_id
                WHERE e.event_type <> 'purchase'
                  AND (e.ts < c.cts
                       OR (e.ts = c.cts AND e.event_id < c.cid))
            ), t AS (
                SELECT event_type,
                       row_number() OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS rn,
                       count(*) OVER (PARTITION BY user_id) AS m
                FROM tch
            )
            SELECT event_type AS channel,
                   round(CAST(SUM(CAST(
                       CASE WHEN m = 1 THEN CAST(1 AS DOUBLE)
                            WHEN m = 2 THEN CAST(0.5 AS DOUBLE)
                            WHEN rn = 1 THEN CAST(0.4 AS DOUBLE)
                            WHEN rn = m THEN CAST(0.4 AS DOUBLE)
                            ELSE CAST(0.2 AS DOUBLE)
                                 / CAST(m - 2 AS DOUBLE)
                       END AS DECIMAL(28,12))) AS DOUBLE), 6) + 0.0
                       AS credit,
                   count(*) AS n_touches
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "centroid_distance_emb": """
            WITH per AS (
                SELECT label, CAST(v AS DOUBLE) AS v, pos FROM (
                    SELECT label, unnest(embedding) AS v,
                           unnest(generate_series(0, len(embedding) - 1))
                               AS pos
                    FROM embeddings WHERE embedding IS NOT NULL)
            ), dims AS (
                SELECT label, pos,
                       CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS m
                FROM per GROUP BY 1, 2
            )
            SELECT a.label AS label_a, b.label AS label_b,
                   round(sqrt(round(CAST(SUM(CAST(
                       (a.m - b.m) * (a.m - b.m)
                       AS DECIMAL(38,12))) AS DOUBLE), 9)), 6) + 0.0
                       AS dist
            FROM dims a JOIN dims b
              ON a.pos = b.pos AND a.label < b.label
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "did_orders": f"""
            WITH u AS (
                SELECT CASE WHEN substr(md5('{DID_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       CASE WHEN o_orderdate
                                 < TIMESTAMP '{DID_SPLIT} 00:00:00'
                            THEN 'pre' ELSE 'post' END AS period,
                       {_dsum('o_totalprice')}
                           / CAST(count(*) AS DOUBLE) AS avg_value
                FROM orders GROUP BY o_custkey, 2, 1
            ), cell AS (
                SELECT arm, period, count(*) AS n_units,
                       CAST(SUM(CAST(avg_value AS DECIMAL(38,12)))
                            AS DOUBLE) AS s,
                       CAST(SUM(CAST(avg_value * avg_value
                                     AS DECIMAL(38,12)))
                            AS DOUBLE) AS ss
                FROM u GROUP BY 1, 2
            ), st AS (
                SELECT arm, period,
                       CASE WHEN n_units > 1
                            THEN (ss - s * s / CAST(n_units AS DOUBLE))
                                 / CAST(n_units - 1 AS DOUBLE)
                            ELSE 0.0 END AS vr,
                       s / CAST(n_units AS DOUBLE) AS mean,
                       CAST(n_units AS DOUBLE) AS nd
                FROM cell
            ), wide AS (
                SELECT MAX(CASE WHEN arm = 'A' AND period = 'pre'
                                THEN mean END) AS ma0,
                       MAX(CASE WHEN arm = 'A' AND period = 'post'
                                THEN mean END) AS ma1,
                       MAX(CASE WHEN arm = 'B' AND period = 'pre'
                                THEN mean END) AS mb0,
                       MAX(CASE WHEN arm = 'B' AND period = 'post'
                                THEN mean END) AS mb1,
                       MAX(CASE WHEN arm = 'A' AND period = 'pre'
                                THEN vr / nd END) AS q_a0,
                       MAX(CASE WHEN arm = 'A' AND period = 'post'
                                THEN vr / nd END) AS q_a1,
                       MAX(CASE WHEN arm = 'B' AND period = 'pre'
                                THEN vr / nd END) AS q_b0,
                       MAX(CASE WHEN arm = 'B' AND period = 'post'
                                THEN vr / nd END) AS q_b1
                FROM st
            ), eff AS (
                SELECT (mb1 - mb0) - (ma1 - ma0) AS did,
                       sqrt(q_a0 + q_a1 + q_b0 + q_b1) AS se
                FROM wide
            )
            SELECT arm, period, n_units,
                   round(s / CAST(n_units AS DOUBLE), 6) + 0.0 AS mean_y,
                   round(did, 6) + 0.0 AS did,
                   round(se, 6) + 0.0 AS se,
                   CASE WHEN se > 0.0 THEN round(did / se, 6) + 0.0
                        ELSE CAST('NaN' AS DOUBLE) END AS t
            FROM cell CROSS JOIN eff
            ORDER BY arm ASC, period DESC
        """,
        "covariate_balance_customer": f"""
            WITH sp AS (
                SELECT o_custkey, count(*) AS n_orders,
                       {_dsum('o_totalprice')} AS spend
                FROM orders GROUP BY 1
            ), u AS (
                SELECT CASE WHEN substr(md5('{BAL_SEED}-'
                                 || CAST(c_custkey AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       CAST(c_acctbal AS DOUBLE) AS acctbal,
                       CAST(COALESCE(n_orders, 0) AS DOUBLE) AS n_orders,
                       COALESCE(spend, 0.0) AS total_spend
                FROM customer LEFT JOIN sp ON c_custkey = o_custkey
            ), m AS (
                SELECT arm, 'acctbal' AS covariate, acctbal AS v FROM u
                UNION ALL
                SELECT arm, 'n_orders', n_orders FROM u
                UNION ALL
                SELECT arm, 'total_spend', total_spend FROM u
            ), per AS (
                SELECT covariate, arm, count(*) AS n,
                       CAST(SUM(CAST(v AS DECIMAL(38,12))) AS DOUBLE) AS s,
                       CAST(SUM(CAST(v * v AS DECIMAL(38,12)))
                            AS DOUBLE) AS ss
                FROM m GROUP BY 1, 2
            ), wide AS (
                SELECT covariate,
                       MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
                       MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
                       MAX(CASE WHEN arm = 'A' THEN s END) AS sa,
                       MAX(CASE WHEN arm = 'B' THEN s END) AS sb,
                       MAX(CASE WHEN arm = 'A' THEN ss END) AS ssa,
                       MAX(CASE WHEN arm = 'B' THEN ss END) AS ssb
                FROM per GROUP BY 1
            ), stats AS (
                SELECT covariate, n_a, n_b,
                       sa / CAST(n_a AS DOUBLE) AS ma,
                       sb / CAST(n_b AS DOUBLE) AS mb,
                       sqrt(((CASE WHEN n_a > 1
                                   THEN (ssa - sa * sa / CAST(n_a AS DOUBLE))
                                        / (CAST(n_a AS DOUBLE) - 1) END)
                             + (CASE WHEN n_b > 1
                                   THEN (ssb - sb * sb / CAST(n_b AS DOUBLE))
                                        / (CAST(n_b AS DOUBLE) - 1) END))
                            / 2.0) AS pooled
                FROM wide
            )
            SELECT covariate, n_a, n_b,
                   round(ma, 6) + 0.0 AS mean_a,
                   round(mb, 6) + 0.0 AS mean_b,
                   round(CASE WHEN pooled > 0.0
                              THEN (ma - mb) / pooled END, 6) + 0.0 AS smd,
                   CASE WHEN pooled > 0.0
                        THEN abs((ma - mb) / pooled) >= 0.1
                        ELSE ma <> mb END AS imbalanced
            FROM stats ORDER BY covariate
        """,
        "fdr_bh_events": f"""
            WITH first AS (
                SELECT user_id, event_type,
                       CASE WHEN substr(md5('{FDR_SEED}-'
                                 || CAST(user_id AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm
                FROM (SELECT user_id, event_type,
                             row_number() OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                                 AS rn
                      FROM events)
                WHERE rn = 1
            ), cells AS (
                SELECT event_type,
                       SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS cb
                FROM first GROUP BY 1
            ), conv AS (
                SELECT event_type, ca, cb,
                       SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
                FROM cells
            ), zz AS (
                SELECT event_type,
                       (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                        - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                       / sqrt((CAST(ca + cb AS DOUBLE)
                               / CAST(na + nb AS DOUBLE)
                               * (1.0 - CAST(ca + cb AS DOUBLE)
                                        / CAST(na + nb AS DOUBLE)))
                              * (1.0 / CAST(na AS DOUBLE)
                                 + 1.0 / CAST(nb AS DOUBLE))) AS z
                FROM conv
            ), tests AS (
                SELECT event_type,
                       {{p_expr}} AS p
                FROM zz
            ), ranked AS (
                SELECT event_type, p,
                       row_number() OVER (ORDER BY p ASC, event_type ASC)
                           AS rank,
                       count(*) OVER () AS m
                FROM tests
            ), adj AS (
                SELECT event_type, p, rank,
                       MIN(least(1.0, CAST(m AS DOUBLE) * p
                                      / CAST(rank AS DOUBLE)))
                           OVER (ORDER BY rank DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS p_adj
                FROM ranked
            )
            SELECT event_type, round(p, 6) + 0.0 AS p_value, rank,
                   round(p_adj, 6) + 0.0 AS p_adj,
                   p_adj <= {FDR_Q} AS rejected
            FROM adj ORDER BY event_type
        """.replace("{p_expr}", _two_sided_p_sql("z")),
        "nelson_aalen_events": f"""
            WITH span AS (
                SELECT user_id, CAST(min(ts) AS DATE) AS f,
                       CAST(max(ts) AS DATE) AS l
                FROM events GROUP BY 1
            ), mx AS (
                SELECT max(l) AS m FROM span
            ), subj AS (
                SELECT datediff('day', f, l) AS duration,
                       (l <= m - {KM_CENSOR_DAYS}) AS obs
                FROM span, mx
            ), g AS (
                SELECT duration,
                       CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_events,
                       count(*) AS c
                FROM subj GROUP BY 1
            ), ser AS (
                SELECT duration, n_events, c,
                       SUM(c) OVER (ORDER BY duration
                           ROWS BETWEEN CURRENT ROW
                           AND UNBOUNDED FOLLOWING) AS n_risk
                FROM g
            )
            SELECT duration, CAST(n_risk AS BIGINT) AS n_risk, n_events,
                   CAST(c - n_events AS BIGINT) AS n_censored,
                   round(CAST(SUM(CAST(
                       CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)
                       AS DECIMAL(38,12))) OVER (ORDER BY duration
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS DOUBLE), 6) + 0.0
                       AS cum_hazard
            FROM ser ORDER BY duration
        """,
        "theilsen_trend_events": """
            WITH daily AS (
                SELECT event_type AS key,
                       CAST(datediff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) AS DOUBLE) AS x,
                       CAST(count(*) AS DOUBLE) AS y
                FROM events GROUP BY 1, 2
            ), pairs AS (
                SELECT a.key, (b.y - a.y) / (b.x - a.x) AS s
                FROM daily a JOIN daily b
                  ON a.key = b.key AND b.x > a.x
            ), ps AS (
                SELECT key, s,
                       row_number() OVER (PARTITION BY key ORDER BY s)
                           AS rn,
                       count(*) OVER (PARTITION BY key) AS np
                FROM pairs
            ), slope AS (
                SELECT key, np AS n_pairs, s AS slope
                FROM ps WHERE rn = CAST(ceil(CAST(np AS DOUBLE) / 2)
                                        AS BIGINT)
            ), ds AS (
                SELECT key, x, y,
                       row_number() OVER (PARTITION BY key ORDER BY x)
                           AS rx,
                       row_number() OVER (PARTITION BY key ORDER BY y)
                           AS ry,
                       count(*) OVER (PARTITION BY key) AS n
                FROM daily
            ), meds AS (
                SELECT key, MAX(n) AS n_points,
                       MAX(CASE WHEN rx = CAST(ceil(CAST(n AS DOUBLE) / 2)
                                           AS BIGINT)
                                THEN x END) AS mx,
                       MAX(CASE WHEN ry = CAST(ceil(CAST(n AS DOUBLE) / 2)
                                           AS BIGINT)
                                THEN y END) AS my
                FROM ds GROUP BY key
            )
            SELECT s.key, CAST(m.n_points AS BIGINT) AS n_points,
                   CAST(s.n_pairs AS BIGINT) AS n_pairs,
                   round(s.slope, 6) + 0.0 AS slope,
                   round(m.my - s.slope * m.mx, 6) + 0.0 AS intercept
            FROM slope s JOIN meds m ON s.key = m.key
            ORDER BY s.key
        """,
        "lead_lag_events": f"""
            WITH per AS (
                SELECT CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT)
                           AS h,
                       SUM(CASE WHEN event_type = '{LEAD_LAG_X}'
                                THEN 1 ELSE 0 END) AS x,
                       SUM(CASE WHEN event_type = '{LEAD_LAG_Y}'
                                THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY 1
            ), ends AS (
                SELECT min(h) AS lo, max(h) AS hi FROM per
            ), grid AS (
                SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                           AS h
                FROM ends
            ), full_g AS (
                SELECT g.h,
                       CAST(COALESCE(p.x, 0) AS DOUBLE) AS x,
                       CAST(COALESCE(p.y, 0) AS DOUBLE) AS y
                FROM grid g LEFT JOIN per p ON g.h = p.h
            ), lagged AS (
                SELECT CAST(l AS BIGINT) AS lag, a.x, b.y
                FROM full_g a
                CROSS JOIN (SELECT unnest(generate_series(
                    -{LEAD_LAG_MAX}, {LEAD_LAG_MAX})) AS l)
                JOIN full_g b ON a.h + l = b.h
            ), m AS (
                SELECT lag, count(*) AS n,
                       CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)
                           AS sx,
                       CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE)
                           AS sy,
                       CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE)
                           AS sxy,
                       CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE)
                           AS sxx,
                       CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE)
                           AS syy
                FROM lagged GROUP BY 1
            )
            SELECT lag, n,
                   round(CASE WHEN
                           CAST(n AS DOUBLE) * sxx - sx * sx > 0.0
                           AND CAST(n AS DOUBLE) * syy - sy * sy > 0.0
                         THEN (CAST(n AS DOUBLE) * sxy - sx * sy)
                              / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                                     * (CAST(n AS DOUBLE) * syy
                                        - sy * sy))
                         END, 6) + 0.0 AS corr
            FROM m ORDER BY lag
        """,
        "dp_noisy_counts_customer": f"""
            WITH per AS (
                SELECT c_nationkey, count(*) AS n FROM customer GROUP BY 1
            ), noise AS (
                SELECT c_nationkey, n,
                       (CAST(CAST('0x' || substr(md5('{DP_SEED}-'
                            || CAST(c_nationkey AS VARCHAR)), 1, 12)
                            AS UBIGINT) AS BIGINT) + 0.5)
                           / {float(1 << 48)!r} - 0.5 AS c
                FROM per
            )
            SELECT c_nationkey,
                   round(CAST(n AS DOUBLE)
                         + ({-1.0 / DP_EPS!r} * sign(c))
                           * ln(1.0 - 2.0 * abs(c)), 6) + 0.0
                       AS noisy_count
            FROM noise ORDER BY c_nationkey
        """,
        "automation_screen_events": """
            WITH g AS (
                SELECT user_id AS key,
                       CAST(floor(epoch(ts)) AS BIGINT) AS ep,
                       CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT))
                         OVER (PARTITION BY user_id
                               ORDER BY CAST(floor(epoch(ts)) AS BIGINT))
                           AS gap
                FROM events
            ), per AS (
                SELECT key, count(*) AS n_events,
                       max(ep) - min(ep) AS span_s,
                       count(gap) AS m,
                       CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE)
                           AS s,
                       CAST(SUM(CAST(gap * gap AS DECIMAL(38,0)))
                            AS DOUBLE) AS ss
                FROM g GROUP BY 1
                HAVING count(*) >= 5
            )
            SELECT key, n_events, CAST(span_s AS BIGINT) AS span_s,
                   round(CAST(n_events AS DOUBLE)
                         / (CAST(greatest(span_s, 1) AS DOUBLE) / 60.0),
                         6) + 0.0
                       AS events_per_min,
                   round(CASE WHEN s > 0.0
                         THEN sqrt(CAST(m AS DOUBLE) * ss - s * s) / s
                         END, 6) + 0.0 AS gap_cv
            FROM per
            ORDER BY events_per_min DESC, key
            LIMIT 20
        """,
        "zorder_layout_orders": f"""
            WITH q AS (
                SELECT CAST(ntile(256) OVER (ORDER BY o_custkey,
                                             o_orderkey) - 1
                            AS BIGINT) AS qx,
                       CAST(ntile(256) OVER (
                            ORDER BY datediff('day', DATE '1970-01-01',
                                              CAST(o_orderdate AS DATE)),
                                     o_orderkey) - 1
                            AS BIGINT) AS qy
                FROM orders
            ), layouts AS (
                SELECT qx, qy, 'x_sorted' AS layout,
                       qx * {1 << 32} AS k FROM q
                UNION ALL
                SELECT qx, qy, 'y_sorted', qy * {1 << 32} FROM q
                UNION ALL
                SELECT qx, qy, 'zorder',
                       {_morton_sql('qx', 'qy')} FROM q
            ), files AS (
                SELECT layout,
                       ntile({ZORDER_FILES}) OVER (
                           PARTITION BY layout
                           ORDER BY k, qx, qy) AS f,
                       qx, qy
                FROM layouts
            ), spans AS (
                SELECT layout, f,
                       CAST(max(qx) - min(qx) + 1 AS DOUBLE) / 256.0
                           AS span_x,
                       CAST(max(qy) - min(qy) + 1 AS DOUBLE) / 256.0
                           AS span_y
                FROM files GROUP BY 1, 2
            ), per_dim AS (
                SELECT layout, 'x' AS dim, span_x AS span FROM spans
                UNION ALL
                SELECT layout, 'y', span_y FROM spans
            )
            SELECT layout, dim,
                   round(CAST(SUM(CAST(span AS DECIMAL(38,12)))
                              AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0
                       AS mean_span,
                   round(max(span), 6) + 0.0 AS max_span
            FROM per_dim GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "forecast_backtest_events": """
            WITH RECURSIVE daily AS (
                SELECT event_type AS key, CAST(ts AS DATE) AS day,
                       CAST(count(*) AS DOUBLE) AS n
                FROM events GROUP BY 1, 2
            ), ser AS (
                SELECT key, day, n,
                       row_number() OVER (
                           PARTITION BY key ORDER BY day) AS idx
                FROM daily
            ), h AS (
                SELECT key, day, n, idx, n AS level,
                       CAST(0.0 AS DOUBLE) AS trend
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT s.key, s.day, s.n, s.idx,
                       0.5 * s.n + 0.5 * (p.level + p.trend),
                       0.5 * ((0.5 * s.n + 0.5 * (p.level + p.trend))
                              - p.level) + 0.5 * p.trend
                FROM ser s JOIN h p
                  ON s.key = p.key AND s.idx = p.idx + 1
            ), preds AS (
                SELECT key, n,
                       lag(n, 1) OVER w AS naive,
                       lag(n, 7) OVER w AS snaive,
                       lag(level + trend, 1) OVER w AS holt
                FROM h
                WINDOW w AS (PARTITION BY key ORDER BY day)
            ), m AS (
                SELECT key, n, f.model, f.fc
                FROM preds, LATERAL (SELECT * FROM (VALUES
                    ('naive', naive), ('snaive', snaive),
                    ('holt', holt)) AS v(model, fc)) f
                WHERE snaive IS NOT NULL
            )
            SELECT key, model, count(*) AS n,
                   round(CAST(SUM(CAST(abs(fc - n) AS DECIMAL(38,9)))
                              AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS mae,
                   round(CAST(SUM(CAST(
                       CASE WHEN abs(fc) + abs(n) > 0.0
                            THEN 2.0 * abs(fc - n)
                                 / (abs(fc) + abs(n))
                            ELSE 0.0 END AS DECIMAL(38,9))) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) + 0.0 AS smape
            FROM m GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "ltv_cohort_orders": """
            WITH base AS (
                SELECT o_custkey AS k,
                       CAST(year(CAST(o_orderdate AS DATE)) * 12
                            + month(CAST(o_orderdate AS DATE)) - 1
                            AS BIGINT) AS m,
                       o_totalprice AS v
                FROM orders
            ), first AS (
                SELECT k, min(m) AS cm FROM base GROUP BY 1
            ), sizes AS (
                SELECT cm, count(*) AS cohort_size FROM first GROUP BY 1
            ), cells AS (
                SELECT f.cm, b.m - f.cm AS age_months,
                       count(DISTINCT b.k) AS n_active,
                       SUM(CAST(b.v AS DECIMAL(18,6))) AS rev
                FROM base b JOIN first f ON b.k = f.k
                GROUP BY 1, 2
            ), cum AS (
                SELECT cm, age_months, n_active, rev,
                       SUM(rev) OVER (PARTITION BY cm ORDER BY age_months
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS crev
                FROM cells
            )
            SELECT make_date(CAST(cm // 12 AS INT),
                             CAST(cm % 12 + 1 AS INT), 1)
                       AS cohort_month,
                   age_months, n_active,
                   round(CAST(rev AS DOUBLE), 6) + 0.0 AS revenue,
                   round(CAST(crev AS DOUBLE)
                         / CAST(s.cohort_size AS DOUBLE), 6) + 0.0
                       AS cum_value_per_member
            FROM cum JOIN sizes s USING (cm)
            ORDER BY cohort_month, age_months
        """,
        "offline_policy_events": f"""
            WITH fu AS (
                SELECT user_id, event_type AS first_type, has_p
                FROM (SELECT user_id, event_type,
                             row_number() OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                                 AS rn,
                             max(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END)
                                 OVER (PARTITION BY user_id) AS has_p
                      FROM events)
                WHERE rn = 1
            ), u AS (
                SELECT CASE WHEN substr(md5('{OPS_SEED}-'
                                 || CAST(user_id AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS logged,
                       CASE WHEN first_type = 'view'
                            THEN 'B' ELSE 'A' END AS target,
                       CAST(has_p AS DOUBLE) AS r
                FROM fu
            ), agg AS (
                SELECT count(*) AS n_units,
                       CAST(SUM(CASE WHEN logged = target
                                     THEN 1 ELSE 0 END) AS BIGINT) AS nm,
                       CAST(SUM(CAST(r AS DECIMAL(38,9))) AS DOUBLE)
                           AS sr,
                       CAST(SUM(CAST(CASE WHEN logged = target THEN r
                                          ELSE 0.0 END AS DECIMAL(38,9)))
                            AS DOUBLE) AS smr
                FROM u
            )
            SELECT n_units,
                   round(CAST(nm AS DOUBLE)
                         / CAST(n_units AS DOUBLE), 6) + 0.0
                       AS match_rate,
                   round(sr / CAST(n_units AS DOUBLE), 6) + 0.0
                       AS mean_reward_logged,
                   round(smr * 2.0 / CAST(n_units AS DOUBLE), 6) + 0.0
                       AS ips_value,
                   round(CASE WHEN nm > 0
                              THEN smr / CAST(nm AS DOUBLE) END, 6) + 0.0
                       AS snips_value
            FROM agg
        """,
        "streaming_dp_counts_events": f"""
            WITH per AS (
                SELECT event_type, count(*) AS n FROM events GROUP BY 1
            ), noise AS (
                SELECT event_type, n,
                       (CAST(CAST('0x' || substr(md5('{DP_SEED}-'
                            || event_type), 1, 12)
                            AS UBIGINT) AS BIGINT) + 0.5)
                           / {float(1 << 48)!r} - 0.5 AS c
                FROM per
            )
            SELECT event_type,
                   round(CAST(n AS DOUBLE)
                         + ({-1.0 / DP_EPS!r} * sign(c))
                           * ln(1.0 - 2.0 * abs(c)), 6) + 0.0
                       AS noisy_count
            FROM noise ORDER BY event_type
        """,
        "welch_t_orders": f"""
            WITH u AS (
                SELECT CASE WHEN substr(md5('{WT_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       {_dsum('o_totalprice')} AS y
                FROM orders GROUP BY o_custkey
            ), per AS (
                SELECT arm, count(*) AS n,
                       CAST(SUM(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS s,
                       CAST(SUM(CAST(y * y AS DECIMAL(38,9))) AS DOUBLE)
                           AS ss
                FROM u GROUP BY 1
            ), wide AS (
                SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
                       MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
                       MAX(CASE WHEN arm = 'A' THEN s END) AS sa,
                       MAX(CASE WHEN arm = 'B' THEN s END) AS sb,
                       MAX(CASE WHEN arm = 'A' THEN ss END) AS ssa,
                       MAX(CASE WHEN arm = 'B' THEN ss END) AS ssb
                FROM per
            ), st AS (
                SELECT na, nb,
                       sa / CAST(na AS DOUBLE) AS ma,
                       sb / CAST(nb AS DOUBLE) AS mb,
                       ((ssa - sa * sa / CAST(na AS DOUBLE))
                        / CAST(na - 1 AS DOUBLE)) / CAST(na AS DOUBLE)
                           AS qa,
                       ((ssb - sb * sb / CAST(nb AS DOUBLE))
                        / CAST(nb - 1 AS DOUBLE)) / CAST(nb AS DOUBLE)
                           AS qb
                FROM wide
            ), tt AS (
                SELECT na, nb, ma, mb,
                       (ma - mb) / sqrt(qa + qb) AS t,
                       ((qa + qb) * (qa + qb))
                       / (qa * qa / CAST(na - 1 AS DOUBLE)
                          + qb * qb / CAST(nb - 1 AS DOUBLE)) AS dof
                FROM st
            )
            SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                   round(ma, 6) + 0.0 AS mean_a,
                   round(mb, 6) + 0.0 AS mean_b,
                   round(t, 6) + 0.0 AS t,
                   round(dof, 6) + 0.0 AS df,
                   round({{p_expr}}, 6) + 0.0 AS p_approx
            FROM tt
        """.replace("{p_expr}", _two_sided_p_sql("t")),
        "mann_whitney_orders": f"""
            WITH u AS (
                SELECT CASE WHEN substr(md5('{WT_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       CAST(count(*) AS DOUBLE) AS y
                FROM orders GROUP BY o_custkey
            ), vals AS (
                SELECT y AS v, count(*) AS t,
                       CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
                            AS BIGINT) AS ta
                FROM u GROUP BY 1
            ), ranked AS (
                SELECT v, t, ta,
                       SUM(t) OVER (ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS c
                FROM vals
            ), agg AS (
                SELECT CAST(SUM(ta) AS BIGINT) AS na,
                       CAST(SUM(t) - SUM(ta) AS BIGINT) AS nb,
                       CAST(SUM(CAST(CAST(ta AS DOUBLE)
                           * (CAST(c AS DOUBLE)
                              - (CAST(t AS DOUBLE) - 1.0) / 2.0)
                           AS DECIMAL(38,1))) AS DOUBLE) AS ra,
                       CAST(SUM(t * t * t - t) AS BIGINT) AS ties
                FROM ranked
            ), st AS (
                SELECT na, nb,
                       ra - CAST(na * (na + 1) AS DOUBLE) / 2.0 AS ua,
                       CAST(na + nb AS BIGINT) AS n
                FROM agg
            ), zz AS (
                SELECT na, nb, ua,
                       (ua - CAST(na * nb AS DOUBLE) / 2.0)
                       / sqrt((CAST(na * nb AS DOUBLE) / 12.0)
                              * (CAST(n + 1 AS DOUBLE)
                                 - CAST((SELECT ties FROM agg) AS DOUBLE)
                                   / (CAST(n AS DOUBLE)
                                      * (CAST(n AS DOUBLE) - 1.0)))) AS z
                FROM st
            )
            SELECT na AS n_a, nb AS n_b,
                   round(ua, 6) + 0.0 AS u_a,
                   round(ua / CAST(na * nb AS DOUBLE), 6) + 0.0 AS auc,
                   round(z, 6) + 0.0 AS z,
                   round({{p_expr}}, 6) + 0.0 AS p_approx
            FROM zz
        """.replace("{p_expr}", _two_sided_p_sql("z")),
        "qte_orders": f"""
            WITH u AS (
                SELECT CASE WHEN substr(md5('{WT_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm,
                       {_dsum('o_totalprice')} AS y
                FROM orders GROUP BY o_custkey
            ), ranked AS (
                SELECT arm, y,
                       row_number() OVER (PARTITION BY arm ORDER BY y)
                           AS rn,
                       count(*) OVER (PARTITION BY arm) AS n
                FROM u
            ), picks AS (
                SELECT arm, y, q.q
                FROM ranked
                CROSS JOIN (SELECT CAST(unnest([0.1, 0.25, 0.5,
                                                0.75, 0.9]) AS DOUBLE)
                                AS q) q
                WHERE rn = greatest(1, CAST(ceil(q.q * CAST(n AS DOUBLE))
                                            AS INT))
            )
            SELECT q,
                   round(MAX(CASE WHEN arm = 'A' THEN y END), 6) + 0.0
                       AS y_a,
                   round(MAX(CASE WHEN arm = 'B' THEN y END), 6) + 0.0
                       AS y_b,
                   round(MAX(CASE WHEN arm = 'B' THEN y END)
                         - MAX(CASE WHEN arm = 'A' THEN y END), 6) + 0.0
                       AS qte
            FROM picks GROUP BY q ORDER BY q
        """,
        "median_ci_orders": """
            WITH ranked AS (
                SELECT o_orderpriority AS g,
                       CAST(o_totalprice AS DOUBLE) AS v,
                       row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY CAST(o_totalprice AS DOUBLE)) AS rn,
                       count(*) OVER (PARTITION BY o_orderpriority) AS n
                FROM orders
            ), bounds AS (
                SELECT g, v, rn, n,
                       greatest(CAST(1 AS BIGINT),
                           CAST(floor(CAST(n AS DOUBLE) / 2.0
                               - 1.9599639845400545
                                 * sqrt(CAST(n AS DOUBLE)) / 2.0)
                               AS BIGINT)) AS lo_rank,
                       least(n,
                           CAST(ceil(CAST(n AS DOUBLE) / 2.0
                               + 1.9599639845400545
                                 * sqrt(CAST(n AS DOUBLE)) / 2.0)
                               AS BIGINT) + 1) AS hi_rank,
                       CAST(ceil(CAST(n AS DOUBLE) / 2.0) AS BIGINT)
                           AS med_rank
                FROM ranked
            )
            SELECT g AS o_orderpriority, MAX(n) AS n,
                   round(MAX(CASE WHEN rn = med_rank THEN v END), 6)
                       + 0.0 AS median,
                   round(MAX(CASE WHEN rn = lo_rank THEN v END), 6)
                       + 0.0 AS ci_lo,
                   round(MAX(CASE WHEN rn = hi_rank THEN v END), 6)
                       + 0.0 AS ci_hi
            FROM bounds GROUP BY 1 ORDER BY 1
        """,
        "capture_recapture_events": """
            WITH ends AS (
                SELECT CAST(min(ts) AS DATE) AS lo,
                       CAST(max(ts) AS DATE) AS hi
                FROM events
            ), base AS (
                SELECT user_id,
                       CAST(ts AS DATE)
                           <= lo + CAST(floor(
                               CAST(datediff('day', lo, hi) AS DOUBLE)
                               / 2.0) AS INT) AS a,
                       CAST(ts AS DATE)
                           > lo + CAST(floor(
                               CAST(datediff('day', lo, hi) AS DOUBLE)
                               / 2.0) AS INT) AS b
                FROM events CROSS JOIN ends
            ), per AS (
                SELECT user_id, max(a) AS ia, max(b) AS ib
                FROM base GROUP BY 1
                HAVING max(a) OR max(b)
            ), agg AS (
                SELECT CAST(SUM(CASE WHEN ia THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_a,
                       CAST(SUM(CASE WHEN ib THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_b,
                       CAST(SUM(CASE WHEN ia AND ib THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_both,
                       count(*) AS n_observed
                FROM per
            )
            SELECT n_a, n_b, n_both, n_observed,
                   round((CAST(n_a AS DOUBLE) + 1.0)
                         * (CAST(n_b AS DOUBLE) + 1.0)
                         / (CAST(n_both AS DOUBLE) + 1.0) - 1.0, 6)
                       + 0.0 AS n_hat,
                   round(sqrt((CAST(n_a AS DOUBLE) + 1.0)
                         * (CAST(n_b AS DOUBLE) + 1.0)
                         * (CAST(n_a AS DOUBLE)
                            - CAST(n_both AS DOUBLE))
                         * (CAST(n_b AS DOUBLE)
                            - CAST(n_both AS DOUBLE))
                         / ((CAST(n_both AS DOUBLE) + 1.0)
                            * (CAST(n_both AS DOUBLE) + 1.0)
                            * (CAST(n_both AS DOUBLE) + 2.0))), 6)
                       + 0.0 AS se
            FROM agg
        """,
        "mutual_info_customer": """
            WITH cells AS (
                SELECT c_mktsegment AS a, c_nationkey AS b,
                       count(*) AS c
                FROM customer GROUP BY 1, 2
            ), w AS (
                SELECT a, b, c,
                       SUM(c) OVER () AS n,
                       SUM(c) OVER (PARTITION BY a) AS na,
                       SUM(c) OVER (PARTITION BY b) AS nb,
                       row_number() OVER (PARTITION BY a ORDER BY b)
                           AS ra,
                       row_number() OVER (PARTITION BY b ORDER BY a)
                           AS rb
                FROM cells
            ), t AS (
                SELECT a, b, n,
                       round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                             * ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
                                  / (CAST(na AS DOUBLE)
                                     * CAST(nb AS DOUBLE))), 12) AS mt,
                       CASE WHEN ra = 1 THEN
                            round(-(CAST(na AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                  * ln(CAST(na AS DOUBLE)
                                       / CAST(n AS DOUBLE)), 12) END
                           AS hat,
                       CASE WHEN rb = 1 THEN
                            round(-(CAST(nb AS DOUBLE)
                                    / CAST(n AS DOUBLE))
                                  * ln(CAST(nb AS DOUBLE)
                                       / CAST(n AS DOUBLE)), 12) END
                           AS hbt
                FROM w
            ), agg AS (
                SELECT CAST(max(n) AS BIGINT) AS n,
                       count(DISTINCT a) AS k_a,
                       count(DISTINCT b) AS k_b,
                       CAST(SUM(CAST(mt AS DECIMAL(38,12))) AS DOUBLE)
                           AS mi,
                       CAST(SUM(CAST(hat AS DECIMAL(38,12))) AS DOUBLE)
                           AS ha,
                       CAST(SUM(CAST(hbt AS DECIMAL(38,12))) AS DOUBLE)
                           AS hb
                FROM t
            )
            SELECT n, k_a, k_b,
                   round(mi, 6) + 0.0 AS mi,
                   round(ha, 6) + 0.0 AS h_a,
                   round(hb, 6) + 0.0 AS h_b,
                   round(CASE WHEN ha > 0.0 AND hb > 0.0
                         THEN mi / sqrt(ha * hb) END, 6) + 0.0 AS nmi
            FROM agg
        """,
        "source_ablation_docs": f"""
            WITH m AS (
                SELECT source AS g, 'n_chars' AS metric,
                       CAST(n_chars AS DOUBLE) AS v
                FROM documents
                UNION ALL
                SELECT source, 'n_tokens',
                       CAST(len(string_split({_NORM}, ' ')) AS DOUBLE)
                FROM documents
            ), per AS (
                SELECT g, metric, count(v) AS n_group,
                       SUM(CAST(v AS DECIMAL(38,12))) AS s
                FROM m GROUP BY 1, 2
            ), w AS (
                SELECT g, metric, n_group, s,
                       SUM(n_group) OVER (PARTITION BY metric) AS tn,
                       SUM(s) OVER (PARTITION BY metric) AS ts
                FROM per
            )
            SELECT g AS "group", metric, n_group,
                   round(ts / CAST(tn AS DOUBLE), 6) + 0.0
                       AS mean_overall,
                   CASE WHEN CAST(tn - n_group AS DOUBLE) > 0.0
                        THEN round((ts - s)
                                   / CAST(tn - n_group AS DOUBLE), 6)
                             + 0.0 END AS mean_without,
                   CASE WHEN CAST(tn - n_group AS DOUBLE) > 0.0
                        THEN round((ts - s)
                                   / CAST(tn - n_group AS DOUBLE)
                                   - ts / CAST(tn AS DOUBLE), 6) + 0.0
                        END AS delta
            FROM w ORDER BY "group", metric
        """,
        "aipw_ate_orders": f"""
            WITH u AS (
                SELECT o_custkey,
                       {_dsum('o_totalprice')}
                           / CAST(count(*) AS DOUBLE) AS y
                FROM orders GROUP BY 1
            ), b AS (
                SELECT c_mktsegment AS x, u.y,
                       CASE WHEN substr(md5('{AIPW_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 0.0 ELSE 1.0 END AS t
                FROM u JOIN customer ON o_custkey = c_custkey
            ), model AS (
                SELECT x,
                       SUM(CASE WHEN t = 1.0 THEN 1 ELSE 0 END) AS nt,
                       SUM(CASE WHEN t = 0.0 THEN 1 ELSE 0 END) AS nc,
                       CAST(SUM(CASE WHEN t = 1.0
                                THEN CAST(y AS DECIMAL(38,12)) END)
                            AS DOUBLE) AS st,
                       CAST(SUM(CASE WHEN t = 0.0
                                THEN CAST(y AS DECIMAL(38,12)) END)
                            AS DOUBLE) AS sc
                FROM b GROUP BY 1
            ), mm AS (
                SELECT x,
                       CASE WHEN nt > 0 THEN st / CAST(nt AS DOUBLE) END
                           AS m1,
                       CASE WHEN nc > 0 THEN sc / CAST(nc AS DOUBLE) END
                           AS m0
                FROM model
            ), j AS (
                SELECT b.y, b.t, m.m1, m.m0,
                       (m.m1 IS NOT NULL AND m.m0 IS NOT NULL) AS ok,
                       m.m1 - m.m0 + b.t * (b.y - m.m1) / 0.5
                       - (1.0 - b.t) * (b.y - m.m0) / (1.0 - 0.5) AS psi
                FROM b JOIN mm m USING (x)
            ), agg AS (
                SELECT CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END)
                            AS BIGINT) AS n,
                       CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END)
                            AS BIGINT) AS nd,
                       CAST(SUM(CASE WHEN ok
                                THEN CAST(round(psi, 9)
                                          AS DECIMAL(38,9)) END)
                            AS DOUBLE) AS sp,
                       CAST(SUM(CASE WHEN ok
                                THEN CAST(round(psi * psi, 9)
                                          AS DECIMAL(38,9)) END)
                            AS DOUBLE) AS spp,
                       SUM(CASE WHEN ok AND t = 1.0 THEN 1 ELSE 0 END)
                           AS jnt,
                       SUM(CASE WHEN ok AND t = 0.0 THEN 1 ELSE 0 END)
                           AS jnc,
                       CAST(SUM(CASE WHEN ok AND t = 1.0
                                THEN CAST(y AS DECIMAL(38,9)) END)
                            AS DOUBLE) AS syt,
                       CAST(SUM(CASE WHEN ok AND t = 0.0
                                THEN CAST(y AS DECIMAL(38,9)) END)
                            AS DOUBLE) AS syc
                FROM j
            )
            SELECT n AS n_units, nd AS n_dropped,
                   round(sp / n, 6) + 0.0 AS ate_aipw,
                   round(CASE WHEN n > 1
                              AND (spp - sp * sp / n) / (n - 1) > 0.0
                         THEN sqrt(((spp - sp * sp / n) / (n - 1)) / n)
                         ELSE 0.0 END, 6) + 0.0 AS se_aipw,
                   round(syt / jnt - syc / jnc, 6) + 0.0
                       AS ate_diff_means
            FROM agg
        """,
        "textrank_keywords_docs": f"""
            WITH toks AS (
                SELECT string_split({_NORM}, ' ') AS sp FROM documents
            ), pairs AS (
                SELECT unnest(list_zip(sp[1:len(sp) - 1],
                                       sp[2:len(sp)])) AS p
                FROM toks
            ), edges AS (
                SELECT DISTINCT least(p[1], p[2]) AS src,
                       greatest(p[1], p[2]) AS dst
                FROM pairs
                WHERE p[1] <> p[2] AND p[1] <> '' AND p[2] <> ''
            ), dir AS (
                SELECT src, dst FROM edges
                UNION ALL SELECT dst AS src, src AS dst FROM edges
            ), deg AS (
                SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
                FROM dir GROUP BY src
            ), nn AS (
                SELECT CAST(count(*) AS BIGINT) AS n FROM deg
            ), r0 AS (
                SELECT node, deg,
                       CAST('1.0' AS DOUBLE) / CAST(n AS DOUBLE) AS rank
                FROM deg, nn
            ),
            {_pagerank_iter_sql(1, 'r0')},
            {_pagerank_iter_sql(2, 'r1')},
            {_pagerank_iter_sql(3, 'r2')}
            SELECT node AS word, round(rank, 9) AS pagerank
            FROM r3
            ORDER BY round(rank, 9) DESC, node LIMIT 20
        """,
        "target_encode_orders": f"""
            WITH fo AS (
                SELECT {_kfold_case_sql('o_orderkey', TE_FOLDS, TE_SEED)}
                           AS fold,
                       o_orderpriority AS category,
                       CAST(o_totalprice AS DOUBLE) AS y
                FROM orders
            ), cells AS (
                SELECT fold, category, count(y) AS n_fold,
                       SUM(CAST(y AS DECIMAL(18,6))) AS s
                FROM fo GROUP BY 1, 2
            ), w AS (
                SELECT fold, category, n_fold, s,
                       SUM(n_fold) OVER (PARTITION BY category) AS tn,
                       SUM(s) OVER (PARTITION BY category) AS ts,
                       SUM(n_fold) OVER () AS gn,
                       SUM(s) OVER () AS gs
                FROM cells
            )
            SELECT fold, category, n_fold,
                   CAST(tn - n_fold AS BIGINT) AS n_oof,
                   round(CASE WHEN CAST(tn - n_fold AS DOUBLE)
                                   + {TE_SMOOTH!r} > 0.0
                         THEN (CAST(ts - s AS DOUBLE)
                               + {TE_SMOOTH!r}
                                 * (CAST(gs AS DOUBLE)
                                    / CAST(gn AS DOUBLE)))
                              / (CAST(tn - n_fold AS DOUBLE)
                                 + {TE_SMOOTH!r})
                         END, 6) + 0.0 AS encoding
            FROM w ORDER BY fold, category
        """,
        "shapley_attribution_events": f"""
            WITH firsts AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'purchase'
                                THEN ts END) AS fc
                FROM events GROUP BY 1
            ), users AS (
                SELECT e.user_id,
                       COALESCE(array_to_string(list_sort(
                           list(DISTINCT e.event_type)
                           FILTER (WHERE e.event_type <> 'purchase'
                                   AND (f.fc IS NULL OR e.ts < f.fc))),
                           ','), '') AS s,
                       MAX(CASE WHEN f.fc IS NOT NULL
                                THEN 1 ELSE 0 END) AS conv
                FROM events e JOIN firsts f ON e.user_id = f.user_id
                GROUP BY 1, f.fc
            ), v AS (
                SELECT s, count(*) AS n,
                       CAST(SUM(conv) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS v
                FROM users GROUP BY 1
            ), pairs(channel, s_wo, s_wi, weight) AS (
                VALUES {_shapley_pairs_sql(SHAPLEY_CHANNELS)}
            ), phi AS (
                SELECT p.channel,
                       CAST(SUM(CAST(round(p.weight
                            * (COALESCE(vw.v, 0.0)
                               - COALESCE(vo.v, 0.0)), 12)
                            AS DECIMAL(38,12))) AS DOUBLE) AS phi
                FROM pairs p
                LEFT JOIN v vo ON vo.s = p.s_wo
                LEFT JOIN v vw ON vw.s = p.s_wi
                GROUP BY 1
            ), touched AS (
                SELECT ch AS channel, count(*) AS touched_users,
                       CAST(SUM(conv) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS tr
                FROM (SELECT unnest(string_split(s, ',')) AS ch, conv
                      FROM users)
                WHERE ch <> ''
                GROUP BY 1
            )
            SELECT p.channel, round(p.phi, 6) + 0.0 AS shapley,
                   COALESCE(t.touched_users, 0) AS touched_users,
                   round(t.tr, 6) + 0.0 AS touched_conv_rate
            FROM phi p LEFT JOIN touched t ON p.channel = t.channel
            ORDER BY p.channel
        """,
        "streaming_conformal_events": f"""
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), sc AS (
                SELECT event_type, day,
                       abs(CAST(n AS DOUBLE)
                           - lag(CAST(n AS DOUBLE), {CONF_LAG}) OVER (
                               PARTITION BY event_type ORDER BY day))
                           AS resid
                FROM daily
            ), scf AS (
                SELECT event_type, day, resid,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY day) AS idx,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM sc WHERE resid IS NOT NULL
            ), pl AS (
                SELECT event_type, day, resid, idx,
                       CAST(floor((n * 7 + 9) / 10) AS BIGINT) AS ncal,
                       CAST(floor(((CAST(floor((n * 7 + 9) / 10)
                                    AS BIGINT) + 1) * 900 + 999)
                                  / 1000) AS BIGINT) AS need
                FROM scf
            ), calib AS (
                SELECT event_type, resid, need, ncal,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY resid, day) AS r
                FROM pl WHERE idx <= ncal
            ), q AS (
                SELECT event_type,
                       max(CASE WHEN r = need THEN resid END) AS q_hat,
                       max(ncal) AS n_calib, max(need) AS need
                FROM calib GROUP BY 1
            ), tst AS (
                SELECT p.event_type, count(*) AS n_test,
                       SUM(CASE WHEN p.resid <= q.q_hat
                                THEN 1 ELSE 0 END) AS hits
                FROM pl p JOIN q ON p.event_type = q.event_type
                WHERE p.idx > p.ncal GROUP BY 1
            )
            SELECT q.event_type AS key, q.n_calib,
                   COALESCE(t.n_test, 0) AS n_test,
                   CASE WHEN q.need <= q.n_calib THEN q.q_hat END
                       AS q_hat,
                   CASE WHEN q.need <= q.n_calib
                        THEN round(CAST(t.hits AS DOUBLE)
                                   / CAST(t.n_test AS DOUBLE), 6) + 0.0
                        END AS coverage,
                   CAST(0.9 AS DOUBLE) AS nominal
            FROM q LEFT JOIN tst t ON q.event_type = t.event_type
            ORDER BY key
        """,
        "conformal_forecast_events": f"""
            WITH daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), sc AS (
                SELECT event_type, day,
                       abs(CAST(n AS DOUBLE)
                           - lag(CAST(n AS DOUBLE), {CONF_LAG}) OVER (
                               PARTITION BY event_type ORDER BY day))
                           AS resid
                FROM daily
            ), scf AS (
                SELECT event_type, day, resid,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY day) AS idx,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM sc WHERE resid IS NOT NULL
            ), pl AS (
                SELECT event_type, day, resid, idx,
                       CAST(floor((n * 7 + 9) / 10) AS BIGINT) AS ncal,
                       CAST(floor(((CAST(floor((n * 7 + 9) / 10)
                                    AS BIGINT) + 1) * 900 + 999)
                                  / 1000) AS BIGINT) AS need
                FROM scf
            ), calib AS (
                SELECT event_type, resid, need, ncal,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY resid, day) AS r
                FROM pl WHERE idx <= ncal
            ), q AS (
                SELECT event_type,
                       max(CASE WHEN r = need THEN resid END) AS q_hat,
                       max(ncal) AS n_calib, max(need) AS need
                FROM calib GROUP BY 1
            ), tst AS (
                SELECT p.event_type, count(*) AS n_test,
                       SUM(CASE WHEN p.resid <= q.q_hat
                                THEN 1 ELSE 0 END) AS hits
                FROM pl p JOIN q ON p.event_type = q.event_type
                WHERE p.idx > p.ncal GROUP BY 1
            )
            SELECT q.event_type AS key, q.n_calib,
                   COALESCE(t.n_test, 0) AS n_test,
                   CASE WHEN q.need <= q.n_calib THEN q.q_hat END
                       AS q_hat,
                   CASE WHEN q.need <= q.n_calib
                        THEN round(CAST(t.hits AS DOUBLE)
                                   / CAST(t.n_test AS DOUBLE), 6) + 0.0
                        END AS coverage,
                   CAST(0.9 AS DOUBLE) AS nominal
            FROM q LEFT JOIN tst t ON q.event_type = t.event_type
            ORDER BY key
        """,
        "logrank_events": f"""
            WITH span AS (
                SELECT user_id, CAST(min(ts) AS DATE) AS f,
                       CAST(max(ts) AS DATE) AS l,
                       min(CASE WHEN event_type = 'purchase'
                                     AND value >= 95.0
                                THEN CAST(ts AS DATE) END) AS p
                FROM events GROUP BY 1
            ), subj AS (
                SELECT CASE WHEN substr(md5('{LOGRANK_SEED}-'
                                 || CAST(user_id AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS g,
                       CAST(datediff('day', f, COALESCE(p, l))
                            AS BIGINT) AS t,
                       (p IS NOT NULL) AS obs
                FROM span
            ), per AS (
                SELECT g, t,
                       CAST(SUM(CASE WHEN obs THEN 1 ELSE 0 END)
                            AS BIGINT) AS d,
                       count(*) AS c
                FROM subj GROUP BY 1, 2
            ), grid AS (
                SELECT t FROM per GROUP BY t HAVING SUM(d) > 0
            ), cells AS (
                SELECT gr.t,
                       SUM(CASE WHEN p.g = 'A' THEN p.c ELSE 0 END) AS na,
                       SUM(CASE WHEN p.g = 'B' THEN p.c ELSE 0 END) AS nb,
                       SUM(CASE WHEN p.g = 'A' AND p.t = gr.t
                                THEN p.d ELSE 0 END) AS da,
                       SUM(CASE WHEN p.g = 'B' AND p.t = gr.t
                                THEN p.d ELSE 0 END) AS db
                FROM grid gr JOIN per p ON p.t >= gr.t
                GROUP BY gr.t
            ), terms AS (
                SELECT da,
                       round(CAST(da + db AS DOUBLE)
                             * CAST(na AS DOUBLE)
                             / CAST(na + nb AS DOUBLE), 9) AS e1,
                       round(CASE WHEN na + nb > 1
                             THEN CAST(da + db AS DOUBLE)
                                  * (CAST(na AS DOUBLE)
                                     / CAST(na + nb AS DOUBLE))
                                  * (1.0 - CAST(na AS DOUBLE)
                                           / CAST(na + nb AS DOUBLE))
                                  * (CAST(na + nb AS DOUBLE)
                                     - CAST(da + db AS DOUBLE))
                                  / (CAST(na + nb AS DOUBLE) - 1.0)
                             ELSE 0.0 END, 9) AS v
                FROM cells
            ), agg AS (
                SELECT CAST(SUM(da) AS BIGINT) AS o1,
                       CAST(SUM(CAST(e1 AS DECIMAL(38,9))) AS DOUBLE)
                           AS e1s,
                       CAST(SUM(CAST(v AS DECIMAL(38,9))) AS DOUBLE)
                           AS vs
                FROM terms
            ), tot AS (
                SELECT
                    CAST(SUM(CASE WHEN g = 'A' THEN c ELSE 0 END)
                         AS BIGINT) AS n_a,
                    CAST(SUM(CASE WHEN g = 'B' THEN c ELSE 0 END)
                         AS BIGINT) AS n_b,
                    CAST(SUM(CASE WHEN g = 'A' THEN d ELSE 0 END)
                         AS BIGINT) AS events_a,
                    CAST(SUM(CASE WHEN g = 'B' THEN d ELSE 0 END)
                         AS BIGINT) AS events_b
                FROM per
            )
            SELECT 'A' AS group_a, 'B' AS group_b,
                   t.n_a, t.n_b, t.events_a, t.events_b,
                   a.o1 AS observed_a,
                   round(a.e1s, 6) + 0.0 AS expected_a,
                   CASE WHEN a.vs > 0.0
                        THEN round((CAST(a.o1 AS DOUBLE) - a.e1s)
                                   / sqrt(a.vs), 6) + 0.0 END AS z,
                   CASE WHEN a.vs > 0.0
                        THEN round(((CAST(a.o1 AS DOUBLE) - a.e1s)
                                    / sqrt(a.vs))
                                   * ((CAST(a.o1 AS DOUBLE) - a.e1s)
                                      / sqrt(a.vs)), 6) + 0.0
                        END AS chi2
            FROM agg a, tot t
        """,
        "hw_seasonal_events": f"""
            WITH RECURSIVE daily AS (
                SELECT event_type, CAST(ts AS DATE) AS day,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), ser AS (
                SELECT event_type, day, n,
                       row_number() OVER (
                           PARTITION BY event_type ORDER BY day) AS idx
                FROM daily
            ), h AS (
                SELECT event_type, day, n, idx,
                       CAST(n AS DOUBLE) AS level,
                       CAST(0.0 AS DOUBLE) AS trend,
                       CAST(0.0 AS DOUBLE) AS seasonal,
                       [CAST(0.0 AS DOUBLE)] AS sl
                FROM ser WHERE idx = 1
                UNION ALL
                SELECT event_type, day, n, idx,
                       l_new AS level,
                       0.5 * (l_new - p_level) + 0.5 * p_trend AS trend,
                       0.5 * (CAST(n AS DOUBLE) - l_new) + 0.5 * s_prev
                           AS seasonal,
                       list_append(CASE WHEN len(sl0) >= {HW_PERIOD}
                                        THEN sl0[2:{HW_PERIOD}]
                                        ELSE sl0 END,
                                   0.5 * (CAST(n AS DOUBLE) - l_new)
                                   + 0.5 * s_prev) AS sl
                FROM (
                    SELECT q.*, 0.5 * (CAST(q.n AS DOUBLE) - q.s_prev)
                                + 0.5 * (q.p_level + q.p_trend) AS l_new
                    FROM (
                        SELECT s.event_type, s.day, s.n, s.idx,
                               p.level AS p_level, p.trend AS p_trend,
                               p.sl AS sl0,
                               CASE WHEN len(p.sl) >= {HW_PERIOD}
                                    THEN p.sl[1]
                                    ELSE CAST(0.0 AS DOUBLE) END AS s_prev
                        FROM ser s JOIN h p
                          ON s.event_type = p.event_type
                             AND s.idx = p.idx + 1
                    ) q
                )
            )
            SELECT event_type, day, n, level, trend, seasonal,
                   level + trend + (CASE WHEN len(sl) >= {HW_PERIOD}
                                         THEN sl[1]
                                         ELSE CAST(0.0 AS DOUBLE) END)
                       AS forecast
            FROM h ORDER BY event_type, day
        """,
        "streaming_bucket_sample_events": f"""
            WITH h AS (
                SELECT CAST(CAST('0x' || substr(md5('{SBK_SEED}'
                            || CAST(event_id AS VARCHAR)), 1, 6)
                            AS UBIGINT) AS BIGINT) % {SBK_BUCKETS}
                           AS bucket,
                       md5('{SBK_SEED}' || CAST(event_id AS VARCHAR))
                           AS hh,
                       event_id
                FROM events
            ), rn AS (
                SELECT bucket, event_id,
                       row_number() OVER (PARTITION BY bucket
                                          ORDER BY hh, event_id) AS rn,
                       count(*) OVER (PARTITION BY bucket) AS n_rows
                FROM h
            )
            SELECT bucket, CAST(n_rows AS BIGINT) AS n_rows,
                   event_id AS sample_key
            FROM rn WHERE rn = 1 ORDER BY bucket
        """,
        "unpivot_nation_metrics": f"""
            WITH wide AS (
                SELECT c_nationkey,
                       CAST(count(*) AS DOUBLE) AS n_customers,
                       round({_dsum('c_acctbal')}
                             / CAST(count(*) AS DOUBLE), 6) + 0.0
                           AS avg_acctbal,
                       CAST(max(c_acctbal) AS DOUBLE) AS max_acctbal
                FROM customer GROUP BY 1
            )
            SELECT c_nationkey, metric, value
            FROM (UNPIVOT wide ON n_customers, avg_acctbal, max_acctbal
                  INTO NAME metric VALUE value)
            ORDER BY c_nationkey, metric
        """,
        "kcore_parts": (lambda k, iters: f"""
            WITH {_COPURCHASE_EDGES_SQL},
            -- MATERIALIZED: the chained peel references each round's
            -- CTE ~3x; DuckDB inlines plain CTEs per reference, which
            -- re-evaluates the edge build 3^rounds times (measured
            -- 259 s -> 0.1 s at sf0.01)
            e0 AS MATERIALIZED (SELECT src, dst FROM edges),
            {", ".join(
                f"d{r} AS MATERIALIZED (SELECT node, count(*) AS deg FROM "
                f"(SELECT src AS node FROM e{r} "
                f"UNION ALL SELECT dst FROM e{r}) GROUP BY 1), "
                f"s{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}), "
                f"e{r + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r} e "
                f"JOIN s{r} a ON e.src = a.node "
                f"JOIN s{r} b ON e.dst = b.node)"
                for r in range(iters))}
            SELECT deg AS degree, count(*) AS n_nodes
            FROM (SELECT node, count(*) AS deg FROM
                  (SELECT src AS node FROM e{iters}
                   UNION ALL SELECT dst FROM e{iters}) GROUP BY 1)
            GROUP BY 1 ORDER BY degree
        """)(KCORE_K, KCORE_ITERS),
        "granger_events": f"""
            WITH per AS (
                SELECT CAST(floor(floor(epoch(ts)) / 3600) AS BIGINT)
                           AS h,
                       SUM(CASE WHEN event_type = '{LEAD_LAG_X}'
                                THEN 1 ELSE 0 END) AS x,
                       SUM(CASE WHEN event_type = '{LEAD_LAG_Y}'
                                THEN 1 ELSE 0 END) AS y
                FROM events GROUP BY 1
            ), ends AS (
                SELECT min(h) AS lo, max(h) AS hi FROM per
            ), grid AS (
                SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                           AS h
                FROM ends
            ), full_g AS (
                SELECT g.h,
                       CAST(COALESCE(p.x, 0) AS DOUBLE) AS x,
                       CAST(COALESCE(p.y, 0) AS DOUBLE) AS y
                FROM grid g LEFT JOIN per p ON g.h = p.h
            ), lagged AS (
                SELECT x, y,
                       lag(x) OVER (ORDER BY h) AS lx,
                       lag(y) OVER (ORDER BY h) AS ly
                FROM full_g
            ), m AS (
                SELECT 'x_leads_y' AS direction, y AS t, ly AS u, lx AS v
                FROM lagged WHERE lx IS NOT NULL
                UNION ALL
                SELECT 'y_leads_x', x, lx, ly
                FROM lagged WHERE lx IS NOT NULL
            ), mm AS (
                SELECT direction, count(*) AS n,
                       CAST(SUM(CAST(t AS DECIMAL(38,6))) AS DOUBLE) AS st,
                       CAST(SUM(CAST(u AS DECIMAL(38,6))) AS DOUBLE) AS su,
                       CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sv,
                       CAST(SUM(CAST(t * t AS DECIMAL(38,6))) AS DOUBLE)
                           AS stt,
                       CAST(SUM(CAST(u * u AS DECIMAL(38,6))) AS DOUBLE)
                           AS suu,
                       CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE)
                           AS svv,
                       CAST(SUM(CAST(u * t AS DECIMAL(38,6))) AS DOUBLE)
                           AS sut,
                       CAST(SUM(CAST(v * t AS DECIMAL(38,6))) AS DOUBLE)
                           AS svt,
                       CAST(SUM(CAST(u * v AS DECIMAL(38,6))) AS DOUBLE)
                           AS suv
                FROM m GROUP BY 1
            ), cen AS (
                SELECT direction, n,
                       stt - st * st / CAST(n AS DOUBLE) AS cstt,
                       suu - su * su / CAST(n AS DOUBLE) AS csuu,
                       svv - sv * sv / CAST(n AS DOUBLE) AS csvv,
                       sut - su * st / CAST(n AS DOUBLE) AS csut,
                       svt - sv * st / CAST(n AS DOUBLE) AS csvt,
                       suv - su * sv / CAST(n AS DOUBLE) AS csuv
                FROM mm
            ), fit AS (
                SELECT direction, n, cstt, csuu,
                       cstt - csut * csut / csuu AS rss_r,
                       csuu * csvv - csuv * csuv AS det,
                       (csut * csvv - csvt * csuv)
                           / (csuu * csvv - csuv * csuv) AS b,
                       (csvt * csuu - csut * csuv)
                           / (csuu * csvv - csuv * csuv) AS c,
                       csut, csvt
                FROM cen
            ), ff AS (
                SELECT direction, n, cstt, csuu, det, rss_r,
                       cstt - b * csut - c * csvt AS rss_u
                FROM fit
            )
            SELECT direction, n,
                   round(CASE WHEN n > 3 AND csuu > 0.0 AND det > 0.0
                                   AND cstt > 0.0 AND rss_u > 0.0
                         THEN (rss_r - rss_u)
                              / (rss_u / (CAST(n AS DOUBLE) - 3.0))
                         END, 6) + 0.0 AS f_stat,
                   round(CASE WHEN n > 3 AND csuu > 0.0 AND det > 0.0
                                   AND cstt > 0.0
                         THEN 1.0 - rss_r / cstt END, 6) + 0.0
                       AS r2_restricted,
                   round(CASE WHEN n > 3 AND csuu > 0.0 AND det > 0.0
                                   AND cstt > 0.0
                         THEN 1.0 - rss_u / cstt END, 6) + 0.0
                       AS r2_unrestricted
            FROM ff ORDER BY direction
        """,
        "qini_uplift_orders": f"""
            WITH u AS (
                SELECT o_custkey,
                       {_dsum('o_totalprice')}
                           / CAST(count(*) AS DOUBLE) AS score,
                       max(CASE WHEN o_orderpriority = '1-URGENT'
                                THEN 1 ELSE 0 END) AS conv,
                       CASE WHEN substr(md5('{QINI_SEED}-'
                                 || CAST(o_custkey AS VARCHAR)), 1, 1)
                                 < '8'
                            THEN 'A' ELSE 'B' END AS arm
                FROM orders GROUP BY 1
            ), b AS (
                SELECT arm, conv,
                       CAST(ntile({QINI_BINS}) OVER (
                           ORDER BY score DESC, o_custkey ASC) AS INT)
                           AS bin
                FROM u
            ), per AS (
                SELECT bin,
                       SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nt,
                       SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS nc,
                       SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END)
                           AS ct,
                       SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END)
                           AS cc
                FROM b GROUP BY 1
            ), cum AS (
                SELECT bin,
                       CAST(SUM(nt) OVER w AS BIGINT) AS cum_n_treated,
                       CAST(SUM(nc) OVER w AS BIGINT) AS cum_n_control,
                       CAST(SUM(ct) OVER w AS BIGINT)
                           AS cum_conv_treated,
                       CAST(SUM(cc) OVER w AS BIGINT)
                           AS cum_conv_control
                FROM per
                WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW)
            )
            SELECT bin, cum_n_treated, cum_n_control, cum_conv_treated,
                   cum_conv_control,
                   round(CASE WHEN cum_n_treated > 0 AND cum_n_control > 0
                         THEN CAST(cum_conv_treated AS DOUBLE)
                              / CAST(cum_n_treated AS DOUBLE)
                              - CAST(cum_conv_control AS DOUBLE)
                                / CAST(cum_n_control AS DOUBLE)
                         END, 6) + 0.0 AS uplift,
                   round(CASE WHEN cum_n_control > 0
                         THEN CAST(cum_conv_treated AS DOUBLE)
                              - CAST(cum_conv_control AS DOUBLE)
                                * CAST(cum_n_treated AS DOUBLE)
                                / CAST(cum_n_control AS DOUBLE)
                         END, 6) + 0.0 AS qini
            FROM cum ORDER BY bin
        """,
        "streaming_msprt_events": f"""
            WITH pu AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS fa,
                       min(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END) AS fc
                FROM events GROUP BY 1
            ), au AS (
                SELECT fa, fc,
                       CASE WHEN substr(md5('{PK_SEED}-'
                                 || CAST(user_id AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm
                FROM pu
            ), ends AS (
                SELECT min(fa) AS lo,
                       max(greatest(fa, COALESCE(fc, fa))) AS hi
                FROM au
            ), grid AS (
                SELECT CAST(unnest(generate_series(lo, hi,
                            INTERVAL 1 DAY)) AS DATE) AS day
                FROM ends
            ), daily AS (
                SELECT fa AS day,
                       SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ea,
                       SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS eb
                FROM au GROUP BY 1
            ), convs AS (
                SELECT fc AS day,
                       SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS cb
                FROM au WHERE fc IS NOT NULL GROUP BY 1
            ), cum AS (
                SELECT g.day,
                       CAST(SUM(COALESCE(d.ea, 0)) OVER w AS BIGINT)
                           AS n_a,
                       CAST(SUM(COALESCE(d.eb, 0)) OVER w AS BIGINT)
                           AS n_b,
                       CAST(SUM(COALESCE(c.ca, 0)) OVER w AS BIGINT)
                           AS conv_a,
                       CAST(SUM(COALESCE(c.cb, 0)) OVER w AS BIGINT)
                           AS conv_b
                FROM grid g
                LEFT JOIN daily d ON g.day = d.day
                LEFT JOIN convs c ON g.day = c.day
                WINDOW w AS (ORDER BY g.day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
            ), vv AS (
                SELECT day, n_a, n_b, conv_a, conv_b,
                       CAST(conv_a + conv_b AS DOUBLE)
                           / CAST(n_a + n_b AS DOUBLE) AS pool,
                       CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                       - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                           AS d
                FROM cum
            ), vw AS (
                SELECT day, n_a, n_b, conv_a, conv_b, d, pool,
                       pool * (1.0 - pool)
                       * (1.0 / CAST(n_a AS DOUBLE)
                          + 1.0 / CAST(n_b AS DOUBLE)) AS v
                FROM vv
            ), pr AS (
                SELECT day, n_a, n_b, conv_a, conv_b,
                       CASE WHEN n_a > 0 AND n_b > 0
                                 AND pool > 0.0 AND pool < 1.0
                            THEN least(1.0, 1.0
                                 / (sqrt(v / (v + {MSPRT_TAU2_SQL}))
                                    * exp(d * d * {MSPRT_TAU2_SQL}
                                          / (2.0 * v
                                             * (v + {MSPRT_TAU2_SQL})))))
                            ELSE 1.0 END AS p_raw
                FROM vw
            )
            SELECT day, n_a, n_b, conv_a, conv_b,
                   round(min(p_raw) OVER w, 6) + 0.0 AS always_valid_p,
                   min(p_raw) OVER w <= 0.05 AS rejected
            FROM pr
            WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW)
            ORDER BY day
        """,
        "msprt_events": f"""
            WITH pu AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS fa,
                       min(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END) AS fc
                FROM events GROUP BY 1
            ), au AS (
                SELECT fa, fc,
                       CASE WHEN substr(md5('{PK_SEED}-'
                                 || CAST(user_id AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm
                FROM pu
            ), ends AS (
                SELECT min(fa) AS lo,
                       max(greatest(fa, COALESCE(fc, fa))) AS hi
                FROM au
            ), grid AS (
                SELECT CAST(unnest(generate_series(lo, hi,
                            INTERVAL 1 DAY)) AS DATE) AS day
                FROM ends
            ), daily AS (
                SELECT fa AS day,
                       SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ea,
                       SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS eb
                FROM au GROUP BY 1
            ), convs AS (
                SELECT fc AS day,
                       SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS cb
                FROM au WHERE fc IS NOT NULL GROUP BY 1
            ), cum AS (
                SELECT g.day,
                       CAST(SUM(COALESCE(d.ea, 0)) OVER w AS BIGINT)
                           AS n_a,
                       CAST(SUM(COALESCE(d.eb, 0)) OVER w AS BIGINT)
                           AS n_b,
                       CAST(SUM(COALESCE(c.ca, 0)) OVER w AS BIGINT)
                           AS conv_a,
                       CAST(SUM(COALESCE(c.cb, 0)) OVER w AS BIGINT)
                           AS conv_b
                FROM grid g
                LEFT JOIN daily d ON g.day = d.day
                LEFT JOIN convs c ON g.day = c.day
                WINDOW w AS (ORDER BY g.day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
            ), vv AS (
                SELECT day, n_a, n_b, conv_a, conv_b,
                       CAST(conv_a + conv_b AS DOUBLE)
                           / CAST(n_a + n_b AS DOUBLE) AS pool,
                       CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                       - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
                           AS d
                FROM cum
            ), vw AS (
                SELECT day, n_a, n_b, conv_a, conv_b, d, pool,
                       pool * (1.0 - pool)
                       * (1.0 / CAST(n_a AS DOUBLE)
                          + 1.0 / CAST(n_b AS DOUBLE)) AS v
                FROM vv
            ), pr AS (
                SELECT day, n_a, n_b, conv_a, conv_b,
                       CASE WHEN n_a > 0 AND n_b > 0
                                 AND pool > 0.0 AND pool < 1.0
                            THEN least(1.0, 1.0
                                 / (sqrt(v / (v + {MSPRT_TAU2_SQL}))
                                    * exp(d * d * {MSPRT_TAU2_SQL}
                                          / (2.0 * v
                                             * (v + {MSPRT_TAU2_SQL})))))
                            ELSE 1.0 END AS p_raw
                FROM vw
            )
            SELECT day, n_a, n_b, conv_a, conv_b,
                   round(min(p_raw) OVER w, 6) + 0.0 AS always_valid_p,
                   min(p_raw) OVER w <= 0.05 AS rejected
            FROM pr
            WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND CURRENT ROW)
            ORDER BY day
        """,
        "peeking_trace_events": f"""
            WITH pu AS (
                SELECT user_id, min(CAST(ts AS DATE)) AS fa,
                       min(CASE WHEN event_type = 'purchase'
                                THEN CAST(ts AS DATE) END) AS fc
                FROM events GROUP BY 1
            ), au AS (
                SELECT fa, fc,
                       CASE WHEN substr(md5('{PK_SEED}-'
                                 || CAST(user_id AS VARCHAR)), 1, 1) < '8'
                            THEN 'A' ELSE 'B' END AS arm
                FROM pu
            ), ends AS (
                SELECT min(fa) AS lo,
                       max(greatest(fa, COALESCE(fc, fa))) AS hi
                FROM au
            ), grid AS (
                SELECT CAST(unnest(generate_series(lo, hi,
                            INTERVAL 1 DAY)) AS DATE) AS day
                FROM ends
            ), daily AS (
                SELECT fa AS day,
                       SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ea,
                       SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS eb
                FROM au GROUP BY 1
            ), convs AS (
                SELECT fc AS day,
                       SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
                       SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS cb
                FROM au WHERE fc IS NOT NULL GROUP BY 1
            ), cum AS (
                SELECT g.day,
                       CAST(SUM(COALESCE(d.ea, 0)) OVER w AS BIGINT)
                           AS n_a,
                       CAST(SUM(COALESCE(d.eb, 0)) OVER w AS BIGINT)
                           AS n_b,
                       CAST(SUM(COALESCE(c.ca, 0)) OVER w AS BIGINT)
                           AS conv_a,
                       CAST(SUM(COALESCE(c.cb, 0)) OVER w AS BIGINT)
                           AS conv_b
                FROM grid g
                LEFT JOIN daily d ON g.day = d.day
                LEFT JOIN convs c ON g.day = c.day
                WINDOW w AS (ORDER BY g.day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
            ), zz AS (
                SELECT day, n_a, n_b, conv_a, conv_b,
                       CASE WHEN n_a > 0 AND n_b > 0
                                 AND CAST(conv_a + conv_b AS DOUBLE)
                                     / CAST(n_a + n_b AS DOUBLE) > 0.0
                                 AND CAST(conv_a + conv_b AS DOUBLE)
                                     / CAST(n_a + n_b AS DOUBLE) < 1.0
                            THEN (CAST(conv_a AS DOUBLE)
                                  / CAST(n_a AS DOUBLE)
                                  - CAST(conv_b AS DOUBLE)
                                    / CAST(n_b AS DOUBLE))
                                 / sqrt((CAST(conv_a + conv_b AS DOUBLE)
                                         / CAST(n_a + n_b AS DOUBLE)
                                         * (1.0 - CAST(conv_a + conv_b
                                                       AS DOUBLE)
                                            / CAST(n_a + n_b AS DOUBLE)))
                                        * (1.0 / CAST(n_a AS DOUBLE)
                                           + 1.0 / CAST(n_b AS DOUBLE)))
                       END AS z
                FROM cum
            )
            SELECT day, n_a, n_b, conv_a, conv_b,
                   round(z, 6) + 0.0 AS z,
                   COALESCE(abs(z) > 1.96, false) AS significant
            FROM zz ORDER BY day
        """,
        "growth_accounting_events": """
            WITH base AS (
                SELECT DISTINCT
                       CAST(floor(CAST(datediff('day', DATE '1970-01-01',
                           CAST(ts AS DATE)) AS DOUBLE) / 7.0) AS BIGINT)
                           AS week,
                       user_id AS u
                FROM events
            ), flagged AS (
                SELECT week, u,
                       lag(week) OVER (PARTITION BY u ORDER BY week)
                           AS prev
                FROM base
            ), weekly AS (
                SELECT week, count(*) AS n_active,
                       CAST(SUM(CASE WHEN prev IS NULL
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_new,
                       CAST(SUM(CASE WHEN prev = week - 1
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS n_retained
                FROM flagged GROUP BY 1
            ), ends AS (
                SELECT min(week) AS lo, max(week) AS hi FROM weekly
            ), grid AS (
                SELECT CAST(unnest(generate_series(lo, hi)) AS BIGINT)
                           AS week
                FROM ends
            ), full_g AS (
                SELECT g.week,
                       COALESCE(w.n_active, 0) AS n_active,
                       COALESCE(w.n_new, 0) AS n_new,
                       COALESCE(w.n_retained, 0) AS n_retained,
                       COALESCE(w.n_active, 0) - COALESCE(w.n_new, 0)
                           - COALESCE(w.n_retained, 0) AS n_resurrected
                FROM grid g LEFT JOIN weekly w ON g.week = w.week
            )
            SELECT week, CAST(n_active AS BIGINT) AS n_active,
                   n_new, n_retained,
                   CAST(n_resurrected AS BIGINT) AS n_resurrected,
                   CAST(COALESCE(lag(n_active) OVER (ORDER BY week), 0)
                        - n_retained AS BIGINT) AS n_churned
            FROM full_g ORDER BY week
        """,
        "sample_size_orders": f"""
            WITH u AS (
                SELECT o_custkey,
                       max(CASE WHEN o_orderpriority = '1-URGENT'
                                THEN 1 ELSE 0 END) AS conv
                FROM orders GROUP BY 1
            ), agg AS (
                SELECT count(*) AS n,
                       CAST(SUM(conv) AS BIGINT) AS c
                FROM u
            ), st AS (
                SELECT n,
                       CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                       ({Z_ALPHA_SQL} + {Z_POWER_SQL})
                       / (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                          * {SS_REL_LIFT!r}) AS ratio
                FROM agg
            )
            SELECT n AS n_units,
                   round(p, 6) + 0.0 AS baseline_rate,
                   round(p * (1.0 + {SS_REL_LIFT!r}), 6) + 0.0
                       AS target_rate,
                   CAST(ceil(2.0 * p * (1.0 - p) * (ratio * ratio))
                        AS BIGINT) AS n_per_arm_required,
                   CAST(NULL AS BIGINT) AS days_required
            FROM st
        """,
        "hurst_events": f"""
            WITH daily AS (
                SELECT event_type AS key,
                       CAST(datediff('day', DATE '1970-01-01',
                                     CAST(ts AS DATE)) AS BIGINT) AS x,
                       CAST(count(*) AS DOUBLE) AS y
                FROM events GROUP BY 1, 2
            ), lev AS (
                SELECT CAST(unnest([1, 2, 4, 8, 16]) AS BIGINT) AS m
            ), blocks AS (
                SELECT d.key, l.m,
                       CAST(floor(CAST(d.x AS DOUBLE)
                                  / CAST(l.m AS DOUBLE)) AS BIGINT)
                           AS b,
                       CAST(SUM(CAST(d.y AS DECIMAL(38,12))) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE) AS bm
                FROM daily d CROSS JOIN lev l
                GROUP BY 1, 2, 3
            ), per_level AS (
                SELECT key, m, count(*) AS k,
                       CAST(SUM(CAST(bm AS DECIMAL(38,12))) AS DOUBLE)
                           AS s,
                       CAST(SUM(CAST(bm * bm AS DECIMAL(38,12)))
                            AS DOUBLE) AS ss
                FROM blocks GROUP BY 1, 2
            ), pts AS (
                SELECT key,
                       ln(CAST(m AS DOUBLE))
                           / {math.log(2.0)!r} AS lx,
                       CASE WHEN (ss - s * s / CAST(k AS DOUBLE))
                                 / (CAST(k AS DOUBLE) - 1) > 0.0
                            THEN ln((ss - s * s / CAST(k AS DOUBLE))
                                    / (CAST(k AS DOUBLE) - 1))
                                 / {math.log(2.0)!r}
                       END AS ly
                FROM per_level WHERE k >= 2
            ), ols AS (
                SELECT key, count(*) AS np,
                       CAST(SUM(CAST(lx AS DECIMAL(38,12))) AS DOUBLE)
                           AS sx,
                       CAST(SUM(CAST(ly AS DECIMAL(38,12))) AS DOUBLE)
                           AS sy,
                       CAST(SUM(CAST(lx * ly AS DECIMAL(38,12)))
                            AS DOUBLE) AS sxy,
                       CAST(SUM(CAST(lx * lx AS DECIMAL(38,12)))
                            AS DOUBLE) AS sxx
                FROM pts WHERE ly IS NOT NULL GROUP BY 1
            ), counts AS (
                SELECT key, count(*) AS n_points FROM daily GROUP BY 1
            )
            SELECT c.key, c.n_points,
                   round(1.0 + (CASE WHEN o.np >= 2
                                AND CAST(o.np AS DOUBLE) * o.sxx
                                    - o.sx * o.sx > 0.0
                           THEN (CAST(o.np AS DOUBLE) * o.sxy
                                 - o.sx * o.sy)
                                / (CAST(o.np AS DOUBLE) * o.sxx
                                   - o.sx * o.sx) END) / 2.0, 6) + 0.0
                       AS hurst
            FROM counts c LEFT JOIN ols o ON c.key = o.key
            ORDER BY c.key
        """,
        "tail_risk_events": """
            WITH ranked AS (
                SELECT event_type AS key, CAST(value AS DOUBLE) AS v,
                       row_number() OVER (PARTITION BY event_type
                           ORDER BY CAST(value AS DOUBLE)) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM events
            ), cut AS (
                SELECT key, v, rn, n,
                       greatest(CAST(1 AS BIGINT),
                           CAST(ceil(0.95 * CAST(n AS DOUBLE))
                                AS BIGINT)) AS c
                FROM ranked
            )
            SELECT key, MAX(n) AS n,
                   round(MAX(CASE WHEN rn = c THEN v END), 6) + 0.0
                       AS var_q,
                   round(CAST(SUM(CASE WHEN rn >= c
                                  THEN CAST(v AS DECIMAL(38,9)) END)
                              AS DOUBLE)
                         / CAST(SUM(CASE WHEN rn >= c THEN 1 ELSE 0 END)
                                AS DOUBLE), 6) + 0.0 AS es_q,
                   CAST(SUM(CASE WHEN rn >= c THEN 1 ELSE 0 END)
                        AS BIGINT) AS tail_n
            FROM cut GROUP BY 1 ORDER BY 1
        """,
    }
    # the streaming lead-lag twin shares the batch tail arithmetic, so
    # the bounded-input (availableNow) result IS the batch result
    oracles["streaming_lead_lag_events"] = oracles["lead_lag_events"]
    # the streaming quantile-sketch twin maintains the identical
    # bottom-k buffer (mergeable across micro-batches by the KMV
    # argument), so the batch sketch SQL is its exact oracle too
    oracles["streaming_quantile_sketch"] = oracles["quantile_sketch_events"]
    # the streaming Kalman twin replays the identical fixed-order
    # recurrence with state carried across batches, so the batch
    # recursive-CTE filter is its exact oracle
    oracles["streaming_kalman_events"] = oracles["kalman_level_events"]
    # star-contraction WCC converges to the same reachable-minimum
    # labeling as pairs_to_groups, so the group-size oracle is the
    # identical transitive closure
    oracles["wcc_dedup_groups"] = oracles["dedup_group_sizes"]

    # ---- r12-session oracles -------------------------------------------
    oracles["assortativity_copurchase"] = f"""
        WITH {_COPURCHASE_EDGES_SQL}, bt AS (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges
        ), deg AS (
            SELECT src AS node, count(*) AS degree FROM bt GROUP BY 1
        ), p AS (
            SELECT dx.degree AS a, dy.degree AS b
            FROM bt JOIN deg dx ON bt.src = dx.node
                    JOIN deg dy ON bt.dst = dy.node
        ), m AS (
            SELECT count(*) AS m,
                   CAST(SUM(CAST(a AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(b AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(a * b AS DECIMAL(38,6))) AS DOUBLE)
                       AS sxy,
                   CAST(SUM(CAST(a * a AS DECIMAL(38,6))) AS DOUBLE)
                       AS sxx,
                   CAST(SUM(CAST(b * b AS DECIMAL(38,6))) AS DOUBLE)
                       AS syy
            FROM p
        ), nn AS (
            SELECT count(*) AS n_nodes FROM (
                SELECT src FROM edges UNION SELECT dst FROM edges)
        )
        SELECT CAST(m / 2 AS BIGINT) AS n_edges,
               CAST(n_nodes AS BIGINT) AS n_nodes,
               round((sxy - sx * sy / CAST(m AS DOUBLE))
                     / sqrt((sxx - sx * sx / CAST(m AS DOUBLE))
                            * (syy - sy * sy / CAST(m AS DOUBLE))),
                     6) + 0.0 AS assortativity
        FROM m CROSS JOIN nn
    """
    oracles["ra_links_parts"] = f"""
        WITH nodes AS (
            SELECT DISTINCT l_orderkey AS g, l_partkey AS n
            FROM lineitem WHERE l_partkey IS NOT NULL
        ), gs AS (
            SELECT g FROM nodes GROUP BY g
            HAVING count(*) >= 2 AND count(*) <= {LINKPRED_MAX_BASKET}
        ), edges AS (
            SELECT DISTINCT a.n AS src, b.n AS dst
            FROM nodes a JOIN gs USING (g) JOIN nodes b USING (g)
            WHERE a.n < b.n
        ), bt AS (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges
        ), deg AS (
            SELECT src AS node, count(*) AS degree FROM bt GROUP BY 1
        ), ctr AS (
            SELECT b.src, b.dst, d.degree FROM bt b
            JOIN deg d ON b.src = d.node
            WHERE d.degree <= {LINKPRED_MAX_DEGREE}
        ), common AS (
            SELECT x.dst AS a, y.dst AS b,
                   CAST(count(*) AS BIGINT) AS n_common,
                   CAST(SUM(CAST(1.0 / CAST(x.degree AS DOUBLE)
                                 AS DECIMAL(28,18))) AS DOUBLE) AS ra
            FROM ctr x JOIN ctr y
              ON x.src = y.src AND x.dst < y.dst
            GROUP BY 1, 2
        ), cand AS (
            SELECT c.a, c.b, c.n_common, c.ra
            FROM common c LEFT JOIN edges e
              ON c.a = e.src AND c.b = e.dst
            WHERE e.src IS NULL
        )
        SELECT a AS src, b AS dst, n_common,
               round(ra, 6) + 0.0 AS ra_score
        FROM cand ORDER BY ra_score DESC, src, dst LIMIT 20
    """
    oracles["theta_forecast_events"] = f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS DOUBLE) AS n
            FROM events GROUP BY 1, 2
        ), ser AS (
            SELECT event_type, day, n,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY day) AS idx
            FROM daily
        ), mom AS (
            SELECT event_type, count(*) AS nr,
                   CAST(SUM(CAST(idx AS DECIMAL(28,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(n AS DECIMAL(28,6))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(CAST(idx AS DOUBLE) * n
                                 AS DECIMAL(28,6))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(CAST(idx AS DOUBLE)
                                 * CAST(idx AS DOUBLE)
                                 AS DECIMAL(28,6))) AS DOUBLE) AS sxx
            FROM ser GROUP BY 1
        ), fitb AS (
            SELECT event_type, nr,
                   (CAST(nr AS DOUBLE) * sxy - sx * sy)
                   / (CAST(nr AS DOUBLE) * sxx - sx * sx) AS b,
                   sy, sx
            FROM mom
        ), fit AS (
            SELECT event_type, nr, b,
                   (sy - b * sx) / CAST(nr AS DOUBLE) AS a
            FROM fitb
        ), ses AS (
            SELECT s.event_type, s.idx, f.nr, f.a, f.b,
                   2.0 * s.n - (f.a + f.b * CAST(s.idx AS DOUBLE)) AS sv
            FROM ser s JOIN fit f USING (event_type) WHERE s.idx = 1
            UNION ALL
            SELECT s.event_type, s.idx, p.nr, p.a, p.b,
                   {THETA_ALPHA} * (2.0 * s.n
                       - (p.a + p.b * CAST(s.idx AS DOUBLE)))
                   + (1.0 - {THETA_ALPHA}) * p.sv
            FROM ser s JOIN ses p
              ON s.event_type = p.event_type AND s.idx = p.idx + 1
        ), last AS (
            SELECT event_type, nr, a, b, sv
            FROM ses WHERE idx = nr
        ), steps AS (
            SELECT CAST(k AS INT) AS step
            FROM generate_series(1, {THETA_H}) t(k)
        )
        SELECT event_type, step, CAST(nr AS BIGINT) AS n,
               round(b, 6) + 0.0 AS slope,
               round(sv, 6) + 0.0 AS ses_level,
               round(0.5 * sv + 0.5 * (a + b * CAST(nr + step AS DOUBLE)),
                     6) + 0.0 AS forecast
        FROM last CROSS JOIN steps
        ORDER BY event_type, step
    """
    sax_bps = _sax_case_sql()
    oracles["sax_symbols_events"] = f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS DOUBLE) AS n
            FROM events GROUP BY 1, 2
        ), ser AS (
            SELECT event_type, n,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY day) AS idx
            FROM daily
        ), mom AS (
            SELECT event_type, count(*) AS nr,
                   CAST(SUM(CAST(n AS DECIMAL(28,6))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(n * n AS DECIMAL(28,6))) AS DOUBLE)
                       AS ss
            FROM ser GROUP BY 1
        ), st AS (
            SELECT event_type, nr, s / CAST(nr AS DOUBLE) AS mu,
                   sqrt(ss / CAST(nr AS DOUBLE)
                        - (s / CAST(nr AS DOUBLE))
                          * (s / CAST(nr AS DOUBLE))) AS sd
            FROM mom
        ), seg AS (
            SELECT r.event_type,
                   CAST(floor(CAST((r.idx - 1) * {SAX_SEGMENTS} AS DOUBLE)
                              / CAST(t.nr AS DOUBLE)) AS BIGINT)
                       AS segment,
                   CASE WHEN t.sd <> 0
                        THEN (r.n - t.mu) / t.sd END AS z
            FROM ser r JOIN st t USING (event_type)
        ), paa AS (
            SELECT event_type, segment,
                   CAST(SUM(CAST(round(z, 9) AS DECIMAL(28,12)))
                        AS DOUBLE) / CAST(count(*) AS DOUBLE) AS p
            FROM seg GROUP BY 1, 2
        )
        SELECT event_type, segment, round(p, 6) + 0.0 AS paa,
               CASE {sax_bps} END AS symbol
        FROM paa ORDER BY event_type, segment
    """
    fd_legs = []
    for lhs, rhs in FD_CANDIDATES:
        lhs = [lhs] if isinstance(lhs, str) else list(lhs)
        name = ",".join(lhs) + "->" + rhs
        lcols = ", ".join(lhs)
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in [*lhs, rhs])
        fd_legs.append(f"""
            SELECT '{name}' AS fd,
                   CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violating,
                   round(CAST(SUM(n) - SUM(keep) AS DOUBLE)
                         / CAST(SUM(n) AS DOUBLE), 6) + 0.0 AS g3_error
            FROM (
                SELECT {lcols}, SUM(c) AS n, MAX(c) AS keep,
                       count(*) AS nv
                FROM (SELECT {lcols}, {rhs}, count(*) AS c
                      FROM orders WHERE {notnull}
                      GROUP BY {lcols}, {rhs})
                GROUP BY {lcols})""")
    oracles["fd_violations_orders"] = (
        " UNION ALL ".join(fd_legs) + " ORDER BY fd")
    oracles["dml_ate_orders"] = f"""
        WITH u AS (
            SELECT o_custkey,
                   {_dsum('o_totalprice')}
                       / CAST(count(*) AS DOUBLE) AS y
            FROM orders GROUP BY 1
        ), b AS (
            SELECT c_mktsegment AS x, u.y,
                   CASE WHEN substr(md5('{AIPW_SEED}-'
                             || CAST(o_custkey AS VARCHAR)), 1, 1)
                             < '8'
                        THEN 0.0 ELSE 1.0 END AS t
            FROM u JOIN customer ON o_custkey = c_custkey
        ), nuis AS (
            SELECT x,
                   CAST(SUM(CAST(y AS DECIMAL(38,9))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS my,
                   CAST(SUM(CAST(t AS DECIMAL(38,9))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS mt
            FROM b GROUP BY 1
        ), res AS (
            SELECT b.y - n.my AS ry, b.t - n.mt AS rt
            FROM b JOIN nuis n USING (x)
        ), mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n_units,
                   CAST(SUM(CAST(round(ry * rt, 9) AS DECIMAL(38,9)))
                        AS DOUBLE) AS syd,
                   CAST(SUM(CAST(round(rt * rt, 9) AS DECIMAL(38,9)))
                        AS DOUBLE) AS sdd
            FROM res
        ), th AS (
            SELECT n_units, sdd, syd / sdd AS theta FROM mom
        ), sand AS (
            SELECT t.n_units, t.theta, t.sdd,
                   CAST(SUM(CAST(round(r.rt * r.rt
                                       * (r.ry - t.theta * r.rt)
                                       * (r.ry - t.theta * r.rt), 9)
                                 AS DECIMAL(38,9))) AS DOUBLE) AS meat
            FROM res r CROSS JOIN th t
            GROUP BY 1, 2, 3
        ), ns AS (SELECT CAST(count(*) AS BIGINT) AS n_strata FROM nuis)
        SELECT n_units, n_strata,
               round(theta, 6) + 0.0 AS theta,
               round(sqrt(meat) / sdd, 6) + 0.0 AS se
        FROM sand CROSS JOIN ns
    """
    oracles["geo_radius_pairs"] = f"""
        WITH s AS (
            SELECT s_suppkey, s_nationkey,
                   (s_suppkey % 512) * {GEO_GRID!r} AS x,
                   ((s_suppkey * 11) % 512) * {GEO_GRID!r} AS y
            FROM supplier
        ), c AS (
            SELECT c_custkey,
                   (c_custkey % 512) * {GEO_GRID!r} AS x,
                   ((c_custkey * 7) % 512) * {GEO_GRID!r} AS y
            FROM customer
        ), p AS (
            SELECT s.s_nationkey,
                   round((s.x - c.x) * (s.x - c.x)
                         + (s.y - c.y) * (s.y - c.y), 12) AS d2
            FROM s CROSS JOIN c
            WHERE (s.x - c.x) * (s.x - c.x)
                  + (s.y - c.y) * (s.y - c.y)
                  <= {GEO_RADIUS!r} * {GEO_RADIUS!r}
        )
        SELECT s_nationkey AS nation,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(CAST(SUM(CAST(d2 AS DECIMAL(38,12))) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) + 0.0 AS mean_dist2
        FROM p GROUP BY 1 ORDER BY 1
    """
    # the streaming CUSUM twin replays the identical fixed-order
    # recurrence with state carried across batches, so the batch
    # recursive-CTE detector is its exact oracle
    oracles["streaming_cusum_events"] = oracles["cusum_alarm_events"]
    _GEO_PTS_SQL = f"""
        s AS (
            SELECT s_suppkey, s_nationkey,
                   (s_suppkey % 512) * {GEO_GRID!r} AS x,
                   ((s_suppkey * 11) % 512) * {GEO_GRID!r} AS y
            FROM supplier
        ), c AS (
            SELECT c_custkey,
                   (c_custkey % 512) * {GEO_GRID!r} AS x,
                   ((c_custkey * 7) % 512) * {GEO_GRID!r} AS y
            FROM customer
        )"""
    oracles["knn_supplier_customers"] = f"""
        WITH {_GEO_PTS_SQL}, p AS (
            SELECT s.s_suppkey, s.s_nationkey, c.c_custkey,
                   round((s.x - c.x) * (s.x - c.x)
                         + (s.y - c.y) * (s.y - c.y), 12) AS d2
            FROM s CROSS JOIN c
            WHERE (s.x - c.x) * (s.x - c.x)
                  + (s.y - c.y) * (s.y - c.y)
                  <= {KNN_RADIUS!r} * {KNN_RADIUS!r}
        ), r AS (
            SELECT s_nationkey, d2,
                   row_number() OVER (
                       PARTITION BY s_suppkey
                       ORDER BY d2, c_custkey) AS rnk
            FROM p
        )
        SELECT s_nationkey AS nation, CAST(rnk AS INT) AS rank,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CAST(d2 AS DECIMAL(38,8))) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE) + 0.0 AS mean_dist2
        FROM r WHERE rnk <= {KNN_K}
        GROUP BY 1, 2 ORDER BY 1, 2
    """
    # packed cell key must mirror spatial.cell_key exactly
    _CK = "(cx + 1048576) * 2097152 + (cy + 1048576)"
    oracles["grid_clusters_customers"] = f"""
        WITH RECURSIVE {_GEO_PTS_SQL}, cl AS (
            SELECT CAST(floor(x / {DBSCAN_CELL!r}) AS BIGINT) AS cx,
                   CAST(floor(y / {DBSCAN_CELL!r}) AS BIGINT) AS cy,
                   count(*) AS n
            FROM c GROUP BY 1, 2
        ), cells AS (
            SELECT {_CK} AS k, cx, cy, n FROM cl
        ), core AS (
            SELECT k, cx, cy FROM cells WHERE n >= {DBSCAN_MIN_PTS}
        ), adj AS (
            SELECT a.k AS src, b.k AS dst FROM core a JOIN core b
              ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        ), reach(k, r) AS (
            SELECT k, k FROM core
            UNION
            SELECT a.src, reach.r FROM adj a JOIN reach ON a.dst = reach.k
        ), comp AS (
            SELECT k, min(r) AS cluster FROM reach GROUP BY k
        ), pts AS (
            SELECT {_CK} AS k FROM (
                SELECT CAST(floor(x / {DBSCAN_CELL!r}) AS BIGINT) AS cx,
                       CAST(floor(y / {DBSCAN_CELL!r}) AS BIGINT) AS cy
                FROM c)
        )
        SELECT COALESCE(comp.cluster, CAST(-1 AS BIGINT)) AS cluster,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(count(DISTINCT pts.k) AS BIGINT) AS n_cells
        FROM pts LEFT JOIN comp USING (k)
        GROUP BY 1 ORDER BY 1
    """
    oracles["hotspot_cells_customers"] = f"""
        WITH {_GEO_PTS_SQL}, cl AS (
            SELECT CAST(floor(x / {HOTSPOT_CELL!r}) AS BIGINT) AS cx,
                   CAST(floor(y / {HOTSPOT_CELL!r}) AS BIGINT) AS cy,
                   CAST(count(*) AS BIGINT) AS n
            FROM c GROUP BY 1, 2
        ), hood AS (
            SELECT a.cx, a.cy, CAST(count(*) AS BIGINT) AS w,
                   CAST(SUM(b.n) AS BIGINT) AS g
            FROM cl a JOIN cl b
              ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
            GROUP BY 1, 2
        ), mom AS (
            SELECT CAST(count(*) AS DOUBLE) AS nn,
                   CAST(SUM(n) AS DOUBLE) AS sx,
                   CAST(SUM(n * n) AS DOUBLE) AS sxx
            FROM cl
        )
        SELECT cl.cx, cl.cy, cl.n AS n_points, hood.w, hood.g,
               round((CAST(hood.g AS DOUBLE)
                      - (mom.sx / mom.nn) * CAST(hood.w AS DOUBLE))
                     / (sqrt(mom.sxx / mom.nn
                             - (mom.sx / mom.nn) * (mom.sx / mom.nn))
                        * sqrt((mom.nn * CAST(hood.w AS DOUBLE)
                                - CAST(hood.w AS DOUBLE)
                                  * CAST(hood.w AS DOUBLE))
                               / (mom.nn - 1.0))), 6) + 0.0 AS z
        FROM cl JOIN hood ON cl.cx = hood.cx AND cl.cy = hood.cy
        CROSS JOIN mom
        WHERE mom.nn > 1
          AND sqrt(mom.sxx / mom.nn
                   - (mom.sx / mom.nn) * (mom.sx / mom.nn))
              * sqrt((mom.nn * CAST(hood.w AS DOUBLE)
                      - CAST(hood.w AS DOUBLE) * CAST(hood.w AS DOUBLE))
                     / (mom.nn - 1.0)) > 0
        ORDER BY z DESC, cl.cx, cl.cy LIMIT 20
    """
    oracles["hits_customer_parts"] = f"""
        WITH e AS (
            SELECT DISTINCT o_custkey AS src, l_partkey AS dst
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            WHERE l_partkey IS NOT NULL
        ), a1r AS (
            SELECT dst, CAST(SUM(CAST(1.0 AS DECIMAL(28,18)))
                             AS DOUBLE) AS raw
            FROM e GROUP BY dst
        ), a1 AS (
            SELECT dst, raw / (SELECT MAX(raw) FROM a1r) AS s FROM a1r
        ), h1r AS (
            SELECT e.src, CAST(SUM(CAST(a1.s AS DECIMAL(28,18)))
                               AS DOUBLE) AS raw
            FROM e JOIN a1 USING (dst) GROUP BY e.src
        ), h1 AS (
            SELECT src, raw / (SELECT MAX(raw) FROM h1r) AS s FROM h1r
        ), a2r AS (
            SELECT e.dst, CAST(SUM(CAST(h1.s AS DECIMAL(28,18)))
                               AS DOUBLE) AS raw
            FROM e JOIN h1 USING (src) GROUP BY e.dst
        ), a2 AS (
            SELECT dst, raw / (SELECT MAX(raw) FROM a2r) AS s FROM a2r
        ), h2r AS (
            SELECT e.src, CAST(SUM(CAST(a2.s AS DECIMAL(28,18)))
                               AS DOUBLE) AS raw
            FROM e JOIN a2 USING (dst) GROUP BY e.src
        ), h2 AS (
            SELECT src, raw / (SELECT MAX(raw) FROM h2r) AS s FROM h2r
        ), u AS (
            SELECT 'hub' AS side, src AS node,
                   round(s, 9) + 0.0 AS score FROM h2
            UNION ALL
            SELECT 'auth' AS side, dst AS node,
                   round(s, 9) + 0.0 AS score FROM a2
        ), r AS (
            SELECT side, node, score,
                   row_number() OVER (
                       PARTITION BY side
                       ORDER BY score DESC, node) AS rnk
            FROM u
        )
        SELECT side, node, score, CAST(rnk AS INT) AS rank
        FROM r WHERE rnk <= {HITS_TOP}
        ORDER BY side, rank
    """
    ucc_legs = []
    for cols in UCC_CANDIDATES:
        cols = [cols] if isinstance(cols, str) else list(cols)
        name = ",".join(cols)
        csel = ", ".join(cols)
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        ucc_legs.append(f"""
            SELECT '{name}' AS ucc,
                   CAST(SUM(c) AS BIGINT) AS n_rows,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(MAX(c) AS BIGINT) AS max_mult,
                   MAX(c) = 1 AS is_unique,
                   round(CAST(SUM(c) - count(*) AS DOUBLE)
                         / CAST(SUM(c) AS DOUBLE), 6) + 0.0
                       AS dup_fraction
            FROM (SELECT {csel}, count(*) AS c
                  FROM lineitem WHERE {notnull}
                  GROUP BY {csel})""")
    oracles["ucc_lineitem"] = (
        " UNION ALL ".join(ucc_legs) + " ORDER BY ucc")
    # the streaming funnel twin carries earliest-completion state across
    # batches; greedy in-order advancement equals the batch min-after
    # fold, so the batch funnel SQL is its exact oracle
    oracles["streaming_funnel_counts"] = oracles["funnel_conversion_counts"]
    return oracles
