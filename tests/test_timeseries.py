"""Per-key time-series features (operators/timeseries.py) — verified
against independent pandas models, plus Bloom-join equivalence tests
(operators/joins.bloom_*)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators.timeseries import (
    event_features,
    ewma,
    sessionize,
)


@pytest.fixture(scope="module")
def ev(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in range(5):
        t = base
        for i in range(40):
            # deterministic irregular gaps, incl. one > 30 min per user
            step = 60 * ((uid + i) % 7 + 1) + (1800 if i == 20 else 0)
            t = t + dt.timedelta(seconds=step)
            rows.append((uid * 1000 + i, uid, t, float((i * 37 + uid) % 100)))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, value double")


def test_event_features_vs_pandas(spark, ev):
    out = event_features(ev, rolling_n=5).toPandas()
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    g = pdf.groupby("user_id")
    pdf["seq"] = g.cumcount() + 1
    pdf["prev_value"] = g["value"].shift(1)
    es = pdf["ts"].astype("int64") // 1_000_000_000
    pdf["gap_seconds"] = es.groupby(pdf["user_id"]).diff()
    pdf["rolling_sum_5"] = g["value"].transform(
        lambda s: s.rolling(5, min_periods=1).sum())
    pdf["rolling_min_5"] = g["value"].transform(
        lambda s: s.rolling(5, min_periods=1).min())
    pdf["rolling_max_5"] = g["value"].transform(
        lambda s: s.rolling(5, min_periods=1).max())
    merged = out.sort_values(["user_id", "seq"]).reset_index(drop=True)
    expect = pdf.sort_values(["user_id", "seq"]).reset_index(drop=True)
    for col in ["seq", "prev_value", "gap_seconds", "rolling_sum_5",
                "rolling_min_5", "rolling_max_5"]:
        pd.testing.assert_series_equal(
            merged[col].astype("float64"), expect[col].astype("float64"),
            check_names=False, obj=col)


def test_event_features_one_shuffle(spark, ev):
    plan = event_features(ev, rolling_n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") <= 2  # one key exchange (+LocalTableScan prep)
    assert "Window" in plan


def test_sessionize_gap_splits(spark, ev):
    out = sessionize(ev, gap="30 minutes", id_col="event_id")
    # each user has exactly one forced >30min gap (i==20) → 2 sessions
    per_user = out.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("k")).collect()
    assert all(r["k"] == 2 for r in per_user)
    # session ids are contiguous starting at 1
    assert out.agg(F.min("session_id"), F.max("session_id")).first() == (1, 2)


def test_ewma_vs_pandas(spark, ev):
    out = ewma(ev, "user_id", "ts", "value", alpha=0.3, id_col="event_id")
    got = out.toPandas().sort_values(["user_id", "ts", "event_id"])
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    expect = pdf.groupby("user_id")["value"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean())
    assert (abs(got["ewma"].to_numpy() - expect.to_numpy()) < 1e-12).all()


# ---------------------------------------------------------------------------
# Bloom semi join (operators/joins.bloom_prune / bloom_semi_join)
# ---------------------------------------------------------------------------

def test_bloom_prune_never_drops_matches(spark, sf_dir):
    from hazelcast_jet_spark.operators.joins import bloom_prune
    from hazelcast_jet_spark.session import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    pruned = set(r[0] for r in bloom_prune(
        o, c, "o_custkey", "c_custkey", m=1 << 14).select("o_orderkey").collect())
    true = set(r[0] for r in o.join(
        c, o.o_custkey == c.c_custkey, "left_semi").select("o_orderkey").collect())
    assert true <= pruned  # no false negatives, ever


def test_bloom_semi_join_equals_plain_semi_join(spark, sf_dir):
    from hazelcast_jet_spark.operators.joins import bloom_semi_join
    from hazelcast_jet_spark.session import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    got = sorted(r[0] for r in bloom_semi_join(
        o, c, "o_custkey", "c_custkey", m=1 << 16).select("o_orderkey").collect())
    want = sorted(r[0] for r in o.join(
        c, o.o_custkey == c.c_custkey, "left_semi").select("o_orderkey").collect())
    assert got == want


def test_bloom_tiny_m_still_exact(spark, sf_dir):
    """A deliberately undersized filter (m=64 → FP-saturated) must still
    return the exact result — the final semi join owns correctness; m
    only tunes how much pruning happens."""
    from hazelcast_jet_spark.operators.joins import bloom_semi_join
    from hazelcast_jet_spark.session import load_table

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 97 == 0).select("c_custkey")
    got = bloom_semi_join(o, c, "o_custkey", "c_custkey", m=64).count()
    want = o.join(c, o.o_custkey == c.c_custkey, "left_semi").count()
    assert got == want
