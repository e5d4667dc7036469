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


# ---------------------------------------------------------------------------
# Two-level sliding windows (operators/windows.sliding_agg)
# ---------------------------------------------------------------------------

def test_sliding_agg_equals_builtin_window(spark, sf_dir):
    """The frame-partial formulation must produce exactly the rows
    F.window(size, slide) produces — same windows, same counts, same
    decimal-exact sums."""
    from hazelcast_jet_spark.operators.windows import sliding_agg
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    got = {
        (r["event_type"], r["window_start_epoch"]): (r["n"], r["s"])
        for r in sliding_agg(
            e, "ts", 7200, 3600, ["event_type"],
            {"n": F.count(F.lit(1)), "s": F.sum(dec)},
            {"n": F.sum("n"), "s": F.sum("s")},
        ).collect()
    }
    want = {
        (r["event_type"], r["ws"]): (r["n"], r["s"])
        for r in (
            e.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(dec).alias("s"))
            .select(
                "event_type", "n", "s",
                F.expr("CAST(window.start - CAST('1970-01-01 00:00:00'"
                       " AS TIMESTAMP_NTZ) AS BIGINT)").alias("ws"))
        ).collect()
    }
    assert got == want and len(got) > 0


def test_sliding_agg_explodes_frames_not_rows(spark, sf_dir):
    """The cost-model claim, pinned: the partial aggregation sits BELOW
    the explode (generate/explode consumes the frame-grouped partials,
    never the raw scan) — so the size/slide factor applies to |frames|."""
    from hazelcast_jet_spark.operators.windows import sliding_agg
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    plan = sliding_agg(
        e, "ts", 7200, 3600, ["event_type"],
        {"n": F.count(F.lit(1))}, {"n": F.sum("n")},
    )._jdf.queryExecution().executedPlan().toString()
    gen = plan.index("Generate explode")
    # some HashAggregate (the frame partial) must appear BELOW the explode
    below = plan[gen:]
    assert "HashAggregate" in below and "__frame" in below
    with __import__("pytest").raises(ValueError):
        sliding_agg(e, "ts", 7000, 3600, [], {}, {})


def test_asof_join_tolerance_matches_pandas(spark):
    """asof_join(tolerance=...) == pandas merge_asof(tolerance=...) for
    both numeric and timestamp time columns, both directions."""
    import numpy as np
    from hazelcast_jet_spark.operators.joins import asof_join

    rng = np.random.RandomState(7)
    lrows = [(int(k), float(t)) for k in range(4)
             for t in sorted(rng.randint(0, 400, size=15))]
    rrows = [(int(k), float(t), float(k * 1000 + t)) for k in range(4)
             for t in sorted(rng.choice(np.arange(0, 400), size=10,
                                        replace=False))]
    left = spark.createDataFrame(lrows, "k long, t double")
    right = spark.createDataFrame(rrows, "k long, t double, rv double")

    for direction in ("backward", "forward"):
        got = asof_join(left, right, "k", "t", ["rv"],
                        direction=direction, tolerance=25).toPandas()
        lp = pd.DataFrame(lrows, columns=["k", "t"]).sort_values("t")
        rp = pd.DataFrame(rrows, columns=["k", "t", "rv"]).sort_values("t")
        want = pd.merge_asof(lp, rp, on="t", by="k",
                             direction=direction, tolerance=25)
        g = got.sort_values(["k", "t"]).reset_index(drop=True)
        w = want.sort_values(["k", "t"]).reset_index(drop=True)
        pd.testing.assert_series_equal(g["rv"], w["rv"], check_names=False,
                                       obj=f"rv-{direction}")


def test_asof_join_tolerance_timestamp_seconds(spark, ev):
    """Timestamp time columns: tolerance is in seconds; matches farther
    than the bound resolve to NULL, closer ones keep their value."""
    from hazelcast_jet_spark.operators.joins import asof_join

    left = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id",
                                                        "ts")
    right = ev.filter(F.col("event_id") % 2 == 1).select("user_id", "ts",
                                                         "value")
    tol = asof_join(left, right, "user_id", "ts", ["value"],
                    tolerance=120).collect()
    free = {(r["event_id"]): r["value"]
            for r in asof_join(left, right, "user_id", "ts",
                               ["value"]).collect()}
    # tolerance only ever REMOVES matches, never changes or adds one
    for r in tol:
        if r["value"] is not None:
            assert free[r["event_id"]] == r["value"]
    assert any(r["value"] is None for r in tol)  # the bound actually bites


def test_sliding_distinct_exact_below_k(spark, sf_dir):
    """KMV-merged sliding distinct == built-in window + countDistinct
    while every window's cardinality stays below k (all hashes kept)."""
    from hazelcast_jet_spark.operators.windows import sliding_distinct
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    got = {
        (r["event_type"], r["window_start_epoch"]): r["n"]
        for r in sliding_distinct(e, "ts", 7200, 3600, ["event_type"],
                                  "user_id", k=4096, count_col="n").collect()
    }
    want = {
        (r["event_type"], r["ws"]): r["n"]
        for r in (
            e.groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .select("event_type", "n",
                    F.expr("CAST(window.start - CAST('1970-01-01 00:00:00'"
                           " AS TIMESTAMP_NTZ) AS BIGINT)").alias("ws"))
        ).collect()
    }
    assert got == want and len(got) > 0


def test_sliding_distinct_estimates_above_k(spark, sf_dir):
    """Tiny k forces the estimator regime: every window's answer must be
    within ~3/sqrt(k) of the truth (KMV standard error ~1/sqrt(k))."""
    from hazelcast_jet_spark.operators.windows import sliding_distinct
    from hazelcast_jet_spark.session import load_table

    k = 64
    e = load_table(spark, sf_dir, "events")
    week, day = 7 * 86400, 86400
    est = {
        r["window_start_epoch"]: r["n"]
        for r in sliding_distinct(e, "ts", week, day, [],
                                  "event_id", k=k, count_col="n").collect()
    }
    truth = {
        r["ws"]: r["n"]
        for r in (
            e.groupBy(F.window("ts", "7 days", "1 day"))
            .agg(F.countDistinct("event_id").alias("n"))
            .select("n",
                    F.expr("CAST(window.start - CAST('1970-01-01 00:00:00'"
                           " AS TIMESTAMP_NTZ) AS BIGINT)").alias("ws"))
        ).collect()
    }
    assert set(est) == set(truth)
    big = [kk for kk, v in truth.items() if v > 2 * k]
    assert big, "fixture should have windows above the sketch size"
    for kk in big:
        rel = abs(est[kk] - truth[kk]) / truth[kk]
        assert rel < 3.0 / (k ** 0.5) + 0.05, (kk, est[kk], truth[kk])


def test_epoch_seconds_floor_semantics(spark):
    """_epoch_seconds must FLOOR, not truncate toward zero: sub-second
    fractions and pre-1970 (negative) times have to bin/gap exactly like
    F.window and the floor-based oracles (ADVICE r4: the old
    cast-to-bigint rounded negative epochs the other way)."""
    from hazelcast_jet_spark.operators.timeseries import _epoch_seconds

    rows = [
        ("1969-12-31 23:59:59.25", -1),   # floor(-0.75) = -1 (trunc gives 0)
        ("1969-12-31 23:59:58.5", -2),
        ("1970-01-01 00:00:00.75", 0),
        ("1970-01-01 00:00:01.5", 1),
        ("2024-03-10 07:00:00.999999", 1710054000),  # across a US DST jump
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "s string") \
        .select(F.col("s").cast("timestamp_ntz").alias("ts"))
    got = [r[0] for r in df.select(_epoch_seconds(df, "ts")).collect()]
    assert got == [e for _, e in rows]

    # instant-typed TIMESTAMP branch floors the double epoch the same way
    df2 = spark.createDataFrame([(-0.75,), (1.5,)], "e double") \
        .select(F.timestamp_seconds("e").alias("ts"))
    got2 = [r[0] for r in df2.select(_epoch_seconds(df2, "ts")).collect()]
    assert got2 == [-1, 1]


def test_sliding_distinct_fold_equals_flatten_form(spark, sf_dir):
    """The k-bounded kmv_merge fold must equal the old flatten-sort-slice
    merge bit-for-bit (k smallest of a union == k smallest of (k smallest
    of a prefix) ∪ next) — in the ESTIMATOR regime (k small), where a
    wrong merge would actually change the kth hash."""
    from hazelcast_jet_spark.operators.sketch import kmv_estimate, kmv_sketch
    from hazelcast_jet_spark.operators.timeseries import _epoch_seconds
    from hazelcast_jet_spark.operators.windows import sliding_distinct
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    k = 32  # far below per-window distinct users → estimator regime
    got = {
        (r["event_type"], r["window_start_epoch"]): r["n_users"]
        for r in sliding_distinct(e, "ts", 7200, 3600, ["event_type"],
                                  "user_id", k=k,
                                  count_col="n_users").collect()
    }
    # independent: the old one-shot flatten merge over the same frames
    es = _epoch_seconds(e, "ts")
    frame = F.floor(es / F.lit(3600)).cast("bigint")
    partial = (e.withColumn("__frame", frame)
               .groupBy("event_type", "__frame")
               .agg(kmv_sketch(F.col("user_id"), k).alias("__sk")))
    anchored = partial.withColumn(
        "__anchor", F.explode(F.sequence(F.col("__frame"), F.col("__frame") + 1)))
    old_merged = F.slice(
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("__sk")))), 1, k)
    exp = {
        (r["event_type"], r["ws"]): r["n_users"]
        for r in anchored.groupBy("event_type", "__anchor")
        .agg(old_merged.alias("__msk"))
        .select("event_type",
                ((F.col("__anchor") - 1) * 3600).cast("bigint").alias("ws"),
                kmv_estimate(F.col("__msk"), k).alias("n_users"))
        .collect()
    }
    assert got == exp and len(got) > 0


def test_funnel_counts_ordering_semantics(spark):
    """funnel_counts: a stage only counts when it happens STRICTLY after
    the previous stage's earliest completion."""
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import funnel_counts

    t = lambda s: dt.datetime(2024, 1, 1, 10, 0, s)
    rows = [
        # u1: full ordered funnel
        (1, "view", t(0)), (1, "click", t(10)), (1, "purchase", t(20)),
        # u2: click BEFORE view → stops at view
        (2, "click", t(0)), (2, "view", t(10)),
        # u3: click at the SAME time as view (not strictly after) → view only
        (3, "view", t(5)), (3, "click", t(5)),
        # u4: view+click ordered, purchase before click → stops at click
        (4, "view", t(0)), (4, "purchase", t(5)), (4, "click", t(10)),
        # u5: never viewed
        (5, "purchase", t(0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {(r["stage"], r["event_type"]): r["n_keys"]
           for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert got == {(1, "view"): 4, (2, "click"): 2, (3, "purchase"): 1}


def test_funnel_counts_within_horizon(spark):
    """within_seconds bounds the WHOLE conversion relative to stage-0
    completion; the unbounded funnel still counts it."""
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import funnel_counts

    t = lambda s: dt.datetime(2024, 1, 1, 10, 0, 0) + dt.timedelta(seconds=s)
    rows = [
        (1, "view", t(0)), (1, "click", t(5)), (1, "purchase", t(9)),   # in
        (2, "view", t(0)), (2, "click", t(5)), (2, "purchase", t(60)),  # late purchase
        (3, "view", t(0)), (3, "click", t(40)), (3, "purchase", t(50)), # late click
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["stage"]: r["n_keys"]
           for r in funnel_counts(df, ["view", "click", "purchase"],
                                  within_seconds=10).collect()}
    assert got == {1: 3, 2: 2, 3: 1}
    unbounded = {r["stage"]: r["n_keys"]
                 for r in funnel_counts(df, ["view", "click", "purchase"]).collect()}
    assert unbounded == {1: 3, 2: 3, 3: 3}


def test_cohort_retention_hand_computed(spark):
    from hazelcast_jet_spark.operators.timeseries import cohort_retention

    day = 86400
    t = lambda d, h=0: dt.datetime(1970, 1, 1 + d, h, 0, 0)
    rows = [
        # user 1: first day 0; active days 0, 1, 3 (twice on day 1)
        (1, t(0)), (1, t(1)), (1, t(1, 5)), (1, t(3)),
        # user 2: first day 0; active day 0 only
        (2, t(0, 12)),
        # user 3: first day 1; active days 1 and 3
        (3, t(1)), (3, t(3, 23)),
    ]
    # NTZ so day binning is wall-clock under the hostile session tz
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    got = {(r["cohort_period"], r["period_offset"]): r["n_active"]
           for r in cohort_retention(df, "user_id", "ts",
                                     period_seconds=day).collect()}
    assert got == {
        (0, 0): 2,  # users 1, 2 in day-0 cohort
        (0, 1): 1,  # user 1 back on day 1
        (0, 3): 1,  # user 1 back on day 3
        (1, 0): 1,  # user 3 in day-1 cohort
        (1, 2): 1,  # user 3 back on day 3
    }


def test_cohort_retention_offset0_is_cohort_size(spark, sf_dir):
    from hazelcast_jet_spark.operators.timeseries import cohort_retention
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events")
    out = cohort_retention(e, "user_id", "ts").cache()
    try:
        # every cohort has an offset-0 row and it is the max of its column
        per = {r["cohort_period"]: r for r in
               out.groupBy("cohort_period")
                  .agg(F.max(F.when(F.col("period_offset") == 0,
                                    F.col("n_active"))).alias("size"),
                       F.max("n_active").alias("peak"),
                       F.min("period_offset").alias("min_off")).collect()}
        assert per
        for r in per.values():
            assert r["min_off"] == 0
            assert r["size"] == r["peak"]
        # total cohort sizes == distinct users
        total = out.filter("period_offset = 0").agg(
            F.sum("n_active")).collect()[0][0]
        assert total == e.select("user_id").distinct().count()
    finally:
        out.unpersist()


def test_resample_gap_fill_hand_computed(spark):
    from hazelcast_jet_spark.operators.timeseries import resample

    t = lambda s: dt.datetime(1970, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)
    rows = [
        # key A: periods 0 (two values -> mean 2.0), 3 (5.0); gaps 1, 2
        ("A", t(10), 1.0), ("A", t(50), 3.0), ("A", t(190), 5.0),
        # key B: single period
        ("B", t(70), 7.0),
        # NULL values are ignored
        ("A", t(15), None),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp_ntz, v double")
    got = {(r["k"], r["period"]): (r["value"], r["observed"])
           for r in resample(df, "k", "ts", "v", 60).collect()}
    assert got == {
        ("A", 0): (2.0, True),
        ("A", 1): (2.0, False),   # ffill
        ("A", 2): (2.0, False),
        ("A", 3): (5.0, True),
        ("B", 1): (7.0, True),
    }
    null_fill = {(r["k"], r["period"]): r["value"]
                 for r in resample(df, "k", "ts", "v", 60,
                                   fill="null").collect()}
    assert null_fill[("A", 1)] is None and null_fill[("A", 0)] == 2.0
    zero_fill = {(r["k"], r["period"]): r["value"]
                 for r in resample(df, "k", "ts", "v", 60,
                                   fill="zero").collect()}
    assert zero_fill[("A", 2)] == 0.0


def test_resample_no_gaps_identity_and_validation(spark):
    import pytest

    from hazelcast_jet_spark.operators.timeseries import resample

    t = lambda s: dt.datetime(1970, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)
    df = spark.createDataFrame(
        [("A", t(i * 60), float(i)) for i in range(5)],
        "k string, ts timestamp_ntz, v double")
    out = resample(df, "k", "ts", "v", 60).collect()
    assert len(out) == 5 and all(r["observed"] for r in out)
    with pytest.raises(ValueError):
        resample(df, "k", "ts", "v", 60, fill="bogus")


def test_anomaly_flags_vs_python_model(spark):
    import math

    from hazelcast_jet_spark.operators.timeseries import anomaly_flags

    t0 = dt.datetime(2024, 1, 1)
    vals = [float((i * 37) % 10) for i in range(60)]
    vals[40] = 500.0                      # planted spike
    rows = [(i, "k", t0 + dt.timedelta(seconds=60 * i), v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp_ntz, v double")
    got = {r["event_id"]: (r["is_anomaly"], r["mean"], r["std"])
           for r in anomaly_flags(df, "k", "ts", "v", "event_id",
                                  window_n=10, k=3.0,
                                  min_history=5).collect()}
    for i, v in enumerate(vals):
        hist = vals[max(0, i - 10):i]
        if len(hist) < 5:
            assert got[i] == (False, None, None), i
            continue
        n = len(hist)
        mean = sum(hist) / n
        var = max((sum(x * x for x in hist) - sum(hist) ** 2 / n) / (n - 1), 0.0)
        std = math.sqrt(var)
        exp_flag = abs(v - mean) > 3.0 * std
        assert got[i][0] == exp_flag, (i, got[i], mean, std)
        assert abs(got[i][1] - mean) < 1e-9 and abs(got[i][2] - std) < 1e-9
    # the spike itself is flagged (excluded from its own band) and the
    # points after it are NOT all flagged (band widens, by design)
    assert got[40][0] is True


def test_anomaly_flags_validation(spark):
    from hazelcast_jet_spark.operators.timeseries import anomaly_flags

    df = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 1, 1), 1.0)],
        "event_id long, k string, ts timestamp_ntz, v double")
    with pytest.raises(ValueError):
        anomaly_flags(df, "k", "ts", "v", "event_id", window_n=1)


def test_changepoint_scores_match_python_model(spark):
    """Shift/z equal an independent model; the planted level shift is
    the strongest point; partial frames give NULL."""
    import math

    from hazelcast_jet_spark.operators.timeseries import changepoint_scores

    vals = [10.0] * 30 + [20.0 + (i % 3) for i in range(30)]  # shift at 30
    rows = [(i, "k", float(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, k string, t double, v double")
    out = {r.id: r for r in changepoint_scores(
        df, "k", "t", "v", "id", window_n=10).collect()}

    def model(i):
        b, a = vals[max(0, i - 10):i], vals[i:i + 10]
        if len(b) < 10 or len(a) < 10:
            return None
        mb, ma = sum(b) / 10, sum(a) / 10
        vb = sum((x - mb) ** 2 for x in b) / 9
        va = sum((x - ma) ** 2 for x in a) / 9
        se = math.sqrt(vb / 10 + va / 10)
        return (round(ma - mb, 6),
                round((ma - mb) / se, 6) if se > 0 else None)

    for i in range(60):
        m = model(i)
        r = out[i]
        if m is None:
            assert r.shift is None and r.zscore is None, i
        else:
            assert r.shift == m[0], i
            assert r.zscore == m[1], (i, r.zscore, m[1])
    # strongest |z| is exactly at the plant
    best = max((r for r in out.values() if r.zscore is not None),
               key=lambda r: abs(r.zscore))
    assert best.id == 30
    # flat-flat regime: shift present, z NULL (se == 0)
    flat = [(i, "f", float(i), 1.0) for i in range(25)]
    f = spark.createDataFrame(flat, "id long, k string, t double, v double")
    mid = [r for r in changepoint_scores(f, "k", "t", "v", "id",
                                         window_n=10).collect() if r.id == 12][0]
    assert mid.shift == 0.0 and mid.zscore is None
    import pytest as _pt
    with _pt.raises(ValueError):
        changepoint_scores(f, "k", "t", "v", "id", window_n=1)


def test_changepoint_single_exchange(spark):
    import re as _re

    from hazelcast_jet_spark.operators.timeseries import changepoint_scores

    df = spark.range(100).selectExpr("id", "pmod(id, 2) k", "id t",
                                     "id * 1.0 v")
    plan = changepoint_scores(df, "k", "t", "v", "id")._jdf \
        .queryExecution().executedPlan().toString()
    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_seasonal_decompose_recovers_planted_components(spark):
    """Planted trend+seasonal signal: recovered seasonal profile matches
    the plant up to centering, trend is NULL at edges, resid ≈ 0, and
    value == trend + seasonal + resid wherever trend exists."""
    import math

    from hazelcast_jet_spark.operators.timeseries import seasonal_decompose

    period = 4
    seas = [3.0, -1.0, -2.0, 0.0]  # already centered
    rows = [(i, "k", float(i), 0.5 * i + seas[i % period])
            for i in range(48)]
    df = spark.createDataFrame(rows, "id long, k string, t double, v double")
    out = {r.id: r for r in seasonal_decompose(
        df, "k", "t", "v", "id", period=period).collect()}
    h = (period + 1) // 2  # tw = 5, h = 2
    for i in range(48):
        r = out[i]
        assert r.pos == i % period
        if i < 2 or i >= 46:
            assert r.trend is None and r.resid is None
        else:
            # centered MA of linear trend = exact trend; seasonal avg
            # over a full window of period+1 rows leaves seas[i%p]/5 bias
            assert r.resid is not None
            assert abs(r.v - (r.trend + r.seasonal + r.resid)) < 1e-6
    # seasonal profile sums to ~0 per key and is position-constant
    prof = {}
    for r in out.values():
        prof.setdefault(r.pos, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in prof.values())
    assert abs(sum(next(iter(v)) for v in prof.values())) < 1e-3
    # relative ordering of the plant survives decomposition
    got = [next(iter(prof[p])) for p in range(period)]
    assert sorted(range(4), key=lambda p: got[p]) == \
        sorted(range(4), key=lambda p: seas[p])
    import pytest as _pt
    with _pt.raises(ValueError):
        seasonal_decompose(df, "k", "t", "v", "id", period=1)


def test_holt_linear_matches_python_model(spark):
    """holt_linear replays the coupled (level, trend) recurrence exactly
    (alpha=beta=0.5 binary scaling — bit-comparable to the model)."""
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import holt_linear

    t0 = dt.date(2024, 1, 1)
    xs = [10.0, 14.0, 13.0, 20.0, 18.0, 25.0]
    rows = [("a", t0 + dt.timedelta(days=i), float(v))
            for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    got = {r["day"]: (r["level"], r["trend"], r["forecast"])
           for r in holt_linear(df, "k", "day", "v").collect()}
    l_prev = b_prev = 0.0
    for i, x in enumerate(xs):
        if i == 0:
            l_cur, b_cur = x, 0.0
        else:
            l_cur = 0.5 * x + 0.5 * (l_prev + b_prev)
            b_cur = 0.5 * (l_cur - l_prev) + 0.5 * b_prev
        day = t0 + dt.timedelta(days=i)
        assert got[day] == (l_cur, b_cur, l_cur + b_cur)
        l_prev, b_prev = l_cur, b_cur
    # trend tracks the upward drift where flat EWMA would lag
    assert got[t0 + dt.timedelta(days=5)][1] > 0


def test_transition_entropy_planted(spark):
    """Deterministic successor -> entropy 0 (norm 0 by the explicit
    single-successor guard); 2-way uniform successor -> ln(2), norm 1."""
    import datetime as dt
    import math

    from hazelcast_jet_spark.operators.timeseries import transition_entropy

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    # user 1: a->b, a->b (deterministic from a)
    for seq in (["a", "b", "a", "b"],):
        for ty in seq:
            rows.append((i, t0 + dt.timedelta(minutes=i), 1, ty))
            i += 1
    # user 2: c->x, c->y (uniform 2-way from c)
    for seq in (["c", "x", "c", "y"],):
        for ty in seq:
            rows.append((i, t0 + dt.timedelta(minutes=i), 2, ty))
            i += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string")
    out = {r["from_type"]: r for r in transition_entropy(df).collect()}
    assert out["a"]["n_next_types"] == 1
    assert out["a"]["entropy_nats"] == 0.0
    assert out["a"]["norm_entropy"] == 0.0
    assert out["c"]["n_next_types"] == 2
    assert abs(out["c"]["entropy_nats"] - math.log(2)) < 1e-6
    assert out["c"]["norm_entropy"] == 1.0


def test_session_type_cooccurrence_planted(spark):
    """Two types in one session co-occur with lift > 1 when they always
    travel together; types in separate sessions never pair."""
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import (
        session_type_cooccurrence)

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):                    # session per user: {a, b}
        for i, ty in enumerate(("a", "b")):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, ty))
            eid += 1
        # a second, far-later session: {c} alone
        rows.append((eid, t0 + dt.timedelta(hours=5), u, "c"))
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string")
    out = {(r["type_a"], r["type_b"]): r for r in
           session_type_cooccurrence(df).collect()}
    ab = out[("a", "b")]
    assert ab["n_co_sessions"] == 2
    # N=4 sessions, na=nb=2 -> lift = 2*4/(2*2) = 2
    assert ab["lift"] == 2.0
    assert ("a", "c") not in out and ("b", "c") not in out


def test_top_event_paths_planted(spark):
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import top_event_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(3):                       # a>b>c three times
        for i, ty in enumerate(("a", "b", "c")):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, ty))
            eid += 1
    rows.append((eid, t0, 99, "x"))          # too short: no 3-path
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string")
    out = top_event_paths(df, length=3, k=5).collect()
    assert len(out) == 1
    assert out[0]["path"] == "a>b>c" and out[0]["n_paths"] == 3
    assert out[0]["rank"] == 1


def test_cusum_alarms_detects_persistent_shift(spark):
    """A small persistent upward shift accumulates into an alarm that a
    per-point z-test would never fire; the pre-shift regime stays
    quiet."""
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import cusum_alarms

    t0 = dt.date(2024, 1, 1)
    xs = [10.0] * 10 + [12.0] * 10        # +2 shift halfway
    rows = [("a", t0 + dt.timedelta(days=i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, day date, v double")
    out = {r["day"]: r for r in
           cusum_alarms(df, "k", "day", "v", threshold=5.0).collect()}
    # target = 11; pre-shift drifts down to 0, post-shift climbs +1/day
    assert out[t0]["target"] == 11.0
    assert out[t0 + dt.timedelta(days=9)]["cusum"] == 0.0
    assert not out[t0 + dt.timedelta(days=9)]["alarm"]
    assert out[t0 + dt.timedelta(days=19)]["cusum"] == 10.0
    assert out[t0 + dt.timedelta(days=15)]["alarm"]      # crossed 5 by day 16


# ---------------------------------------------------------------------------
# nelson_aalen
# ---------------------------------------------------------------------------

def test_nelson_aalen_textbook_example(spark):
    """H(t) accumulates d_i/n_i only at observed-event times; censored
    subjects reduce at-risk without increments (hand-computed)."""
    from hazelcast_jet_spark.operators.timeseries import nelson_aalen

    # durations: 1(event), 2(censored), 3(event), 3(event), 4(censored)
    rows = [(1, True), (2, False), (3, True), (3, True), (4, False)]
    df = spark.createDataFrame(rows, "duration int, observed boolean")
    out = {r["duration"]: r for r in
           nelson_aalen(df, "duration", "observed").collect()}
    # t=1: n=5, d=1 -> 1/5 = .2 ; t=2: censored only, H unchanged
    # t=3: n=3, d=2 -> +2/3 ; t=4: censored only
    assert out[1]["n_risk"] == 5 and out[1]["cum_hazard"] == 0.2
    assert out[2]["n_events"] == 0 and out[2]["cum_hazard"] == 0.2
    assert out[3]["n_risk"] == 3
    assert abs(out[3]["cum_hazard"] - round(0.2 + 2.0 / 3.0, 6)) < 1e-9
    assert out[4]["cum_hazard"] == out[3]["cum_hazard"]
    assert out[4]["n_censored"] == 1


def test_nelson_aalen_grouped(spark):
    from hazelcast_jet_spark.operators.timeseries import nelson_aalen

    rows = [("a", 1, True), ("a", 2, True), ("b", 1, True)]
    df = spark.createDataFrame(rows, "g string, duration int, observed boolean")
    out = {(r["g"], r["duration"]): r["cum_hazard"] for r in
           nelson_aalen(df, "duration", "observed", ["g"]).collect()}
    assert out[("a", 1)] == 0.5 and out[("a", 2)] == 1.5
    assert out[("b", 1)] == 1.0


# ---------------------------------------------------------------------------
# theil_sen_trend
# ---------------------------------------------------------------------------

def test_theil_sen_matches_numpy_pairwise_median(spark):
    """Slope equals the lower median of all pairwise slopes; an
    injected outlier barely moves it (robustness), unlike OLS."""
    import numpy as np

    from hazelcast_jet_spark.operators.timeseries import theil_sen_trend

    xs = list(range(13))
    ys = [2.0 * x + 1.0 + (100.0 if x == 6 else 0.0) for x in xs]
    df = spark.createDataFrame([("k", float(x), y) for x, y in zip(xs, ys)],
                               "key string, x double, y double")
    r = theil_sen_trend(df, "key", "x", "y").collect()[0]
    slopes = sorted((ys[j] - ys[i]) / (xs[j] - xs[i])
                    for i in range(len(xs)) for j in range(i + 1, len(xs)))
    lower_median = slopes[(len(slopes) + 1) // 2 - 1]
    assert r["n_points"] == 13
    assert r["n_pairs"] == 13 * 12 // 2
    assert abs(r["slope"] - round(lower_median, 6)) < 1e-9
    assert abs(r["slope"] - 2.0) < 0.2          # outlier-robust
    mx = sorted(xs)[(len(xs) + 1) // 2 - 1]
    my = sorted(ys)[(len(ys) + 1) // 2 - 1]
    assert abs(r["intercept"] - round(my - lower_median * mx, 6)) < 1e-9


def test_theil_sen_drops_singleton_keys(spark):
    from hazelcast_jet_spark.operators.timeseries import theil_sen_trend

    df = spark.createDataFrame(
        [("a", 0.0, 1.0), ("a", 1.0, 3.0), ("solo", 5.0, 5.0)],
        "key string, x double, y double")
    out = theil_sen_trend(df, "key", "x", "y").collect()
    assert [r["key"] for r in out] == ["a"]
    assert out[0]["slope"] == 2.0


# ---------------------------------------------------------------------------
# lead_lag_corr
# ---------------------------------------------------------------------------

def test_lead_lag_recovers_known_shift(spark):
    """y is x shifted by +2 buckets -> corr peaks (exactly 1.0) at
    lag=+2, with the overlap shrinking by |lag|."""
    import numpy as np

    from hazelcast_jet_spark.operators.timeseries import lead_lag_corr

    base = dt.datetime(2024, 1, 1)
    rows = []
    xcounts = [(h * 7) % 5 + 1 for h in range(24)]
    for h, c in enumerate(xcounts):
        for i in range(c):
            rows.append((base + dt.timedelta(hours=h, seconds=i), "x"))
        if 0 <= h + 2 < 24:
            for i in range(c):
                rows.append((base + dt.timedelta(hours=h + 2, seconds=30 + i),
                             "y"))
    df = spark.createDataFrame(rows, "ts timestamp, kind string")
    out = {r["lag"]: r for r in
           lead_lag_corr(df, "ts", F.col("kind") == "x",
                         F.col("kind") == "y", 3600, 3).collect()}
    assert len(out) == 7
    assert out[2]["corr"] == 1.0                      # x leads y by 2
    assert out[2]["n"] == 22                          # 24-grid minus |2|
    assert out[0]["n"] == 24
    best = max(out.values(), key=lambda r: (r["corr"] is not None
                                            and r["corr"]))
    assert best["lag"] == 2
    # numpy cross-check at lag 0 on the zero-filled grid
    x = np.array(xcounts, dtype=float)
    y = np.zeros(24)
    for h, c in enumerate(xcounts):
        if 0 <= h + 2 < 24:
            y[h + 2] = c
    expected = np.corrcoef(x, y)[0, 1]
    assert abs(out[0]["corr"] - round(expected, 6)) < 1e-6


# ---------------------------------------------------------------------------
# automation_screen
# ---------------------------------------------------------------------------

def test_automation_screen_ranks_scripted_traffic_first(spark):
    """A timer-driven key (constant 10 s gaps) outranks a bursty human
    on rate and shows gap_cv == 0; a sub-min_events key is excluded."""
    from hazelcast_jet_spark.operators.timeseries import automation_screen

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(60):                       # bot: every 10 s
        rows.append(("bot", base + dt.timedelta(seconds=10 * i)))
    for i, g in enumerate([0, 300, 320, 2000, 2040, 5000, 5002, 9000]):
        rows.append(("human", base + dt.timedelta(seconds=g)))
    rows.append(("drive_by", base))           # 1 event -> excluded
    for i in range(8):                        # 8 events in ONE second
        rows.append(("burst", base + dt.timedelta(microseconds=i)))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = automation_screen(df, "user_id", "ts", top_k=10, min_events=5)
    got = out.collect()
    # the one-second burst is the MOST suspicious (rate over the
    # clamped 1 s span), then the timer bot, then the human
    assert [r["key"] for r in got] == ["burst", "bot", "human"]
    burst = got[0]
    assert burst["span_s"] == 0
    assert burst["events_per_min"] == round(8 / (1 / 60.0), 6)
    got = got[1:]
    bot = got[0]
    assert bot["n_events"] == 60 and bot["span_s"] == 590
    assert abs(bot["events_per_min"] - round(60 / (590 / 60.0), 6)) < 1e-9
    assert bot["gap_cv"] == 0.0               # perfectly regular
    human = got[1]
    gaps = [300, 20, 1680, 40, 2960, 2, 3998]
    m = len(gaps)
    mean = sum(gaps) / m
    sd = (sum(g * g for g in gaps) / m - mean ** 2) ** 0.5
    assert abs(human["gap_cv"] - round(sd / mean, 6)) < 1e-6


# ---------------------------------------------------------------------------
# forecast_backtest
# ---------------------------------------------------------------------------

def test_forecast_backtest_matches_python_replica(spark):
    """MAE/sMAPE per model equal a pure-Python replay of the Holt
    recurrence + lag baselines on the shared evaluation window; on a
    clean linear trend Holt beats naive, and snaive is worst."""
    from hazelcast_jet_spark.operators.timeseries import forecast_backtest

    xs = [10.0 + 2.0 * i for i in range(20)]            # linear trend
    rows = [("k", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, t int, n double")
    out = {r["model"]: r for r in
           forecast_backtest(df, "key", "t", "n").collect()}

    level, trend, fc = [], [], []
    lp = bp = 0.0
    for i, x in enumerate(xs):
        if i == 0:
            lc, bc = x, 0.0
        else:
            lc = 0.5 * x + 0.5 * (lp + bp)
            bc = 0.5 * (lc - lp) + 0.5 * bp
        level.append(lc); trend.append(bc); fc.append(lc + bc)
        lp, bp = lc, bc
    models = {
        "naive": lambda t: xs[t - 1],
        "snaive": lambda t: xs[t - 7],
        "holt": lambda t: fc[t - 1],
    }
    for name, f in models.items():
        errs = [abs(f(t) - xs[t]) for t in range(7, len(xs))]
        sm = [2.0 * abs(f(t) - xs[t]) / (abs(f(t)) + abs(xs[t]))
              for t in range(7, len(xs))]
        r = out[name]
        assert r["n"] == len(errs)
        assert abs(r["mae"] - round(sum(errs) / len(errs), 6)) < 1e-6
        assert abs(r["smape"] - round(sum(sm) / len(sm), 6)) < 1e-6
    assert out["holt"]["mae"] < out["naive"]["mae"] < out["snaive"]["mae"]


# ---------------------------------------------------------------------------
# ltv_cohorts
# ---------------------------------------------------------------------------

def test_ltv_cohorts_hand_example(spark):
    from hazelcast_jet_spark.operators.timeseries import ltv_cohorts

    rows = [
        # cohort 2024-01: u1 spends 10 in m0, 20 in m1; u2 spends 30 in m0
        (1, dt.datetime(2024, 1, 5), 10.0),
        (1, dt.datetime(2024, 2, 7), 20.0),
        (2, dt.datetime(2024, 1, 20), 30.0),
        # cohort 2024-02: u3 spends 5 in m0
        (3, dt.datetime(2024, 2, 1), 5.0),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp_ntz, v double")
    out = {(str(r["cohort_month"]), r["age_months"]): r for r in
           ltv_cohorts(df, "uid", "ts", "v").collect()}
    a0 = out[("2024-01-01", 0)]
    assert a0["n_active"] == 2 and a0["revenue"] == 40.0
    assert a0["cum_value_per_member"] == 20.0            # 40 / 2 members
    a1 = out[("2024-01-01", 1)]
    assert a1["n_active"] == 1 and a1["revenue"] == 20.0
    assert a1["cum_value_per_member"] == 30.0            # 60 / 2
    b0 = out[("2024-02-01", 0)]
    assert b0["n_active"] == 1 and b0["cum_value_per_member"] == 5.0


# ---------------------------------------------------------------------------
# growth_accounting
# ---------------------------------------------------------------------------

def test_growth_accounting_hand_example(spark):
    """u1 active wks 0,1,3 (new, retained, resurrected); u2 active wk 0
    only (new, then churned); u3 enters wk 1 (new). Identity
    active = new + retained + resurrected holds; churn matches."""
    from hazelcast_jet_spark.operators.timeseries import growth_accounting

    t0 = dt.datetime(1970, 1, 1)

    def ts(week, dow=0):
        return t0 + dt.timedelta(days=week * 7 + dow)

    rows = [(1, ts(0)), (1, ts(1)), (1, ts(3)),
            (2, ts(0, 2)),
            (3, ts(1))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = {r["week"]: r for r in
           growth_accounting(df, "user_id", "ts").collect()}
    assert len(out) == 4                                  # weeks 0..3
    w0, w1, w2, w3 = (out[i] for i in range(4))
    assert (w0["n_active"], w0["n_new"], w0["n_churned"]) == (2, 2, 0)
    # wk1: u1 retained, u3 new; u2 churned (active w0, not w1-retained)
    assert (w1["n_active"], w1["n_new"], w1["n_retained"],
            w1["n_resurrected"], w1["n_churned"]) == (2, 1, 1, 0, 1)
    # wk2: nobody active; churned = active(w1) - retained(w2) = 2
    assert (w2["n_active"], w2["n_churned"]) == (0, 2)
    # wk3: u1 resurrected (seen before, not last week)
    assert (w3["n_active"], w3["n_new"], w3["n_retained"],
            w3["n_resurrected"], w3["n_churned"]) == (1, 0, 0, 1, 0)
    for r in out.values():
        assert r["n_active"] == (r["n_new"] + r["n_retained"]
                                 + r["n_resurrected"])


# ---------------------------------------------------------------------------
# hurst_exponent / tail_risk
# ---------------------------------------------------------------------------

def test_hurst_exponent_matches_numpy_and_separates_regimes(spark):
    """H equals a numpy replay of the aggregated-variance OLS; a
    cumulative (trending) series reads higher than an alternating
    (mean-reverting) one."""
    import numpy as np

    from hazelcast_jet_spark.operators.timeseries import hurst_exponent

    n = 256
    trend = np.cumsum([1.0 if (i * 2654435761) % 4 < 2.2 else -1.0
                       for i in range(n)])
    # amplitude-modulated alternation: mean-reverting but with nonzero
    # block-mean variance at every level (pure +-1 collapses to exact
    # zeros at m=2, leaving a single OLS point -> NULL H by contract)
    alt = np.array([(1.0 + (i % 7) / 10.0) * (1.0 if i % 2 == 0 else -1.0)
                    for i in range(n)])
    rows = [("trend", i, float(trend[i])) for i in range(n)] + \
           [("alt", i, float(alt[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "key string, x int, y double")
    out = {r["key"]: r for r in
           hurst_exponent(df, "key", "x", "y").collect()}

    def h_numpy(series):
        xs, ys = [], []
        for lev in range(5):
            m = 1 << lev
            means = [series[i * m:(i + 1) * m].mean()
                     for i in range(len(series) // m)]
            v = np.var(means, ddof=1)
            if len(means) >= 2 and v > 0:
                xs.append(np.log2(m)); ys.append(np.log2(v))
        slope = np.polyfit(xs, ys, 1)[0]
        return 1.0 + slope / 2.0

    for key, series in (("trend", trend), ("alt", alt)):
        assert abs(out[key]["hurst"] - round(h_numpy(series), 6)) < 1e-4
    assert out["trend"]["hurst"] > 0.8        # long-range dependent
    assert out["alt"]["hurst"] < 0.2          # mean-reverting
    assert out["trend"]["n_points"] == n


def test_tail_risk_selection_and_shortfall(spark):
    from hazelcast_jet_spark.operators.timeseries import tail_risk

    vals = [float(v) for v in range(1, 101)]           # 1..100
    df = spark.createDataFrame([("k", v) for v in vals],
                               "key string, v double")
    r = tail_risk(df, "key", "v", q=0.95).collect()[0]
    import math as m
    cut_rank = max(1, m.ceil(0.95 * 100))              # 95
    tail = vals[cut_rank - 1:]                         # 95..100
    assert r["n"] == 100 and r["tail_n"] == len(tail)
    assert r["var_q"] == float(cut_rank)
    assert abs(r["es_q"] - round(sum(tail) / len(tail), 6)) < 1e-9


def test_forecast_backtest_rejects_nonpositive_seasonal_lag(spark):
    """seasonal_lag < 1 would leave lag-1 naive/holt predictions NULL
    inside the snaive-keyed evaluation window, silently deflating the
    DECIMAL error sums while count(*) keeps all rows (ADVICE r9)."""
    import pytest

    from hazelcast_jet_spark.operators.timeseries import forecast_backtest

    df = spark.createDataFrame(
        [("k", i, float(i)) for i in range(10)],
        "key string, t int, v double")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="seasonal_lag"):
            forecast_backtest(df, "key", "t", "v", seasonal_lag=bad)


def test_rmst_matches_step_integral(spark):
    """RMST equals the hand-computed KM step integral; a horizon past
    the last event returns the full area, a tiny horizon returns the
    horizon itself (S=1 before the first event time)."""
    import pytest

    from hazelcast_jet_spark.operators.timeseries import kaplan_meier, rmst

    # durations 2,2,4,6 with one censor at 4
    rows = [(2, True), (2, True), (4, False), (6, True), (6, True)]
    df = spark.createDataFrame(rows, "duration int, observed boolean")
    H = 5
    out = rmst(df, "duration", "observed", H).collect()[0]
    curve = {r["duration"]: r["survival"]
             for r in kaplan_meier(df, "duration", "observed").collect()}
    # integral: [0,2) S=1; [2,4) S(2); [4,5] S(4)
    want = round(2.0 + curve[2] * 2.0 + curve[4] * 1.0, 6)
    assert abs(out["rmst"] - want) < 1e-9
    assert out["n_subjects"] == 5 and out["horizon"] == H

    # horizon below the first event time: rmst == horizon
    tiny = rmst(df, "duration", "observed", 1).collect()[0]
    assert tiny["rmst"] == 1.0
    with pytest.raises(ValueError, match="horizon"):
        rmst(df, "duration", "observed", 0)


def test_rmst_grouped(spark):
    from hazelcast_jet_spark.operators.timeseries import rmst

    rows = [("a", 2, True), ("a", 4, True), ("b", 1, True), ("b", 1, True)]
    df = spark.createDataFrame(rows, "g string, duration int, observed boolean")
    out = {r["g"]: r for r in
           rmst(df, "duration", "observed", 10, ["g"]).collect()}
    # group a: [0,2) 1.0 ; [2,4) 0.5 ; [4,10] 0.0 -> 3.0
    assert abs(out["a"]["rmst"] - 3.0) < 1e-9
    # group b: [0,1) 1.0 ; [1,10] 0.0 -> 1.0
    assert abs(out["b"]["rmst"] - 1.0) < 1e-9


def test_granger_screen_matches_numpy_ols(spark):
    """The closed-form F equals numpy's lstsq residual computation, and
    a series constructed as y_t = x_{t-1} flags x_leads_y with a huge F
    while y_leads_x stays small."""
    import datetime as _dt

    import numpy as np

    from hazelcast_jet_spark.operators.timeseries import granger_screen

    # x: pseudo-random counts; y copies x one hour later (plus noise)
    base = _dt.datetime(2024, 1, 1)
    rows = []
    xs = [(i * 7 + 3) % 11 for i in range(96)]
    for i, n in enumerate(xs):
        t = base + _dt.timedelta(hours=i)
        rows += [(t, "view")] * n
        if i > 0:
            rows += [(t, "purchase")] * (xs[i - 1] + i % 2)
    df = spark.createDataFrame(rows, "ts timestamp_ntz, event_type string")
    out = {r["direction"]: r for r in granger_screen(
        df, "ts", F.col("event_type") == "view",
        F.col("event_type") == "purchase").collect()}
    assert out["x_leads_y"]["f_stat"] > 100.0
    assert out["x_leads_y"]["f_stat"] > 10 * (out["y_leads_x"]["f_stat"]
                                              or 0.0)

    # numpy replica for the x_leads_y direction
    x = np.array(xs, dtype=float)
    y = np.array([0.0] + [xs[i - 1] + i % 2 for i in range(1, 96)])
    t, u, v = y[1:], y[:-1], x[:-1]
    n = len(t)
    A_r = np.column_stack([np.ones(n), u])
    A_u = np.column_stack([np.ones(n), u, v])
    rss = lambda A: float(((t - A @ np.linalg.lstsq(A, t, rcond=None)[0])
                           ** 2).sum())
    f = (rss(A_r) - rss(A_u)) / (rss(A_u) / (n - 3))
    assert abs(out["x_leads_y"]["f_stat"] - round(f, 6)) < 1e-3
    assert out["x_leads_y"]["n"] == n


def test_granger_screen_degenerate_is_null(spark):
    import datetime as _dt

    from hazelcast_jet_spark.operators.timeseries import granger_screen

    # constant series in both lanes -> every fit degenerate -> NULLs
    base = _dt.datetime(2024, 1, 1)
    rows = []
    for i in range(10):
        t = base + _dt.timedelta(hours=i)
        rows += [(t, "view"), (t, "purchase")]
    df = spark.createDataFrame(rows, "ts timestamp_ntz, event_type string")
    out = granger_screen(df, "ts", F.col("event_type") == "view",
                         F.col("event_type") == "purchase").collect()
    assert len(out) == 2
    assert all(r["f_stat"] is None and r["r2_unrestricted"] is None
               for r in out)


def test_holt_winters_additive_learns_pure_seasonality(spark):
    """On a pure period-m signal the seasonal offsets converge toward
    the true offsets and the trend toward 0; forecasts beat the flat
    holt_linear ones on the same series; replica matches exactly."""
    import pytest

    from hazelcast_jet_spark.operators.timeseries import (
        holt_linear, holt_winters_additive)

    m = 4
    pattern = [10.0, 20.0, 30.0, 0.0]
    rows = [("k", i, pattern[i % m]) for i in range(40)]
    df = spark.createDataFrame(rows, "key string, t int, v double")
    out = holt_winters_additive(df, "key", "t", "v", period=m).collect()
    out = sorted(out, key=lambda r: r["t"])

    # python replica (same recurrence) must match bit-for-bit
    from collections import deque
    ring, l, b = deque(), 0.0, 0.0
    for i, r in enumerate(out):
        x = pattern[i % m]
        s_prev = ring[0] if len(ring) == m else 0.0
        if i == 0:
            l_new, b_new = x, 0.0
        else:
            l_new = 0.5 * (x - s_prev) + 0.5 * (l + b)
            b_new = 0.5 * (l_new - l) + 0.5 * b
        s_new = 0.5 * (x - l_new) + 0.5 * s_prev
        if len(ring) == m:
            ring.popleft()
        ring.append(s_new)
        fc = l_new + b_new + (ring[0] if len(ring) == m else 0.0)
        assert (r["level"], r["trend"], r["seasonal"], r["forecast"]) == \
            (l_new, b_new, s_new, fc)
        l, b = l_new, b_new

    # converged tail: trend ~0 and one-step forecasts near the truth
    tail = out[-m:]
    assert all(abs(r["trend"]) < 1.0 for r in tail)
    hw_err = sum(abs(out[i]["forecast"] - pattern[(i + 1) % m])
                 for i in range(30, 39))
    hl = sorted(holt_linear(df, "key", "t", "v").collect(),
                key=lambda r: r["t"])
    hl_err = sum(abs(hl[i]["forecast"] - pattern[(i + 1) % m])
                 for i in range(30, 39))
    assert hw_err < 0.2 * hl_err
    with pytest.raises(ValueError, match="period"):
        holt_winters_additive(df, "key", "t", "v", period=1)


def test_logrank_matches_hand_computation(spark):
    """O/E/V terms equal the hypergeometric hand computation on a tiny
    curve; identical groups give z ~ 0; separated groups a large |z|."""
    import pytest

    from hazelcast_jet_spark.operators.timeseries import logrank_test

    rows = [("a", 2, True), ("a", 4, True), ("a", 6, False),
            ("b", 2, True), ("b", 5, True), ("b", 7, True)]
    df = spark.createDataFrame(rows, "g string, d int, obs boolean")
    out = logrank_test(df, "d", "obs", "g").collect()[0]
    # event times: 2 (da=1,db=1,na=3,nb=3), 4 (da=1,na=2,nb=2),
    # 5 (db=1,na=1,nb=2), 7 (db=1,na=0,nb=1)
    import math as m
    terms = [(2, 3, 3, 1, 1), (4, 2, 2, 1, 0), (5, 1, 2, 0, 1),
             (7, 0, 1, 0, 1)]
    e1 = v = 0.0
    for _, na, nb, da, db in terms:
        nt, dt = na + nb, da + db
        e1 += round(dt * na / nt, 9)
        v += round(dt * (na / nt) * (1 - na / nt) * (nt - dt) / (nt - 1), 9) \
            if nt > 1 else 0.0
    z = (2 - e1) / m.sqrt(v)
    assert out["observed_a"] == 2 and (out["n_a"], out["n_b"]) == (3, 3)
    assert (out["events_a"], out["events_b"]) == (2, 3)
    assert abs(out["expected_a"] - round(e1, 6)) < 1e-9
    assert abs(out["z"] - round(z, 6)) < 1e-9
    assert abs(out["chi2"] - round(z * z, 6)) < 1e-9

    # separated curves: every 'a' dies at 1, every 'b' survives to 9
    sep = spark.createDataFrame(
        [("a", 1, True)] * 8 + [("b", 9, True)] * 8,
        "g string, d int, obs boolean")
    s = logrank_test(sep, "d", "obs", "g").collect()[0]
    # group a dies first: observed_a > expected_a -> positive z
    assert s["z"] > 2.5

    with pytest.raises(ValueError, match="2 groups"):
        logrank_test(df.withColumn("g", F.lit("x")), "d", "obs", "g")


def test_conformal_snaive_matches_python_replica(spark):
    """q_hat equals the exact split-conformal order statistic, coverage
    the exact test hit rate; rank overflow yields NULL certification."""
    import math as m

    import pytest

    from hazelcast_jet_spark.operators.timeseries import (
        conformal_snaive_interval)

    lag = 3
    xs = [float((i * 13 + 5) % 17) for i in range(40)]
    rows = [("k", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key string, t int, v double")
    out = conformal_snaive_interval(df, "key", "t", "v",
                                    seasonal_lag=lag).collect()[0]

    resid = [abs(xs[i] - xs[i - lag]) for i in range(lag, len(xs))]
    n = len(resid)
    n_cal = -(-n * 7 // 10)
    cal, test = resid[:n_cal], resid[n_cal:]
    need = m.ceil((n_cal + 1) * 0.9)
    q = sorted(cal)[need - 1]
    cov = sum(1 for r in test if r <= q) / len(test)
    assert (out["n_calib"], out["n_test"]) == (n_cal, len(test))
    assert out["q_hat"] == q
    assert abs(out["coverage"] - round(cov, 6)) < 1e-9
    assert out["nominal"] == 0.9

    # too few rows for alpha=0.1: need = ceil((n_cal+1)*.9) > n_cal
    tiny = spark.createDataFrame(
        [("k", i, float(i % 3)) for i in range(8)],
        "key string, t int, v double")
    t = conformal_snaive_interval(tiny, "key", "t", "v",
                                  seasonal_lag=3).collect()[0]
    assert t["q_hat"] is None and t["coverage"] is None

    with pytest.raises(ValueError, match="alpha"):
        conformal_snaive_interval(df, "key", "t", "v", alpha=1.5)
    with pytest.raises(ValueError, match="seasonal_lag"):
        conformal_snaive_interval(df, "key", "t", "v", seasonal_lag=0)
