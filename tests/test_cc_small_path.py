"""The size-adaptive connected-components small path (bounded
driver-side union-find) must be ROW-IDENTICAL to the distributed
iteration it replaces below the threshold — the equality pin that keeps
the r12 optimization from being a semantic fork."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pair_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


PAIRS = (
    # two chains (diameter > 1 exercises multi-round convergence),
    # one triangle with a cross-link, one isolated pair, duplicate and
    # reversed entries
    [(i, i + 1) for i in range(10, 18)]
    + [(30, 31), (31, 32), (32, 30), (32, 33)]
    + [(50, 51), (51, 50), (50, 51)]
    + [(70, 71)]
)


def test_pairs_to_groups_small_path_equals_distributed(spark, monkeypatch):
    from hazelcast_jet_spark.operators import dedup

    df = _pair_df(spark, PAIRS)
    small = sorted(
        (r["node"], r["group"]) for r in dedup.pairs_to_groups(df).collect())
    monkeypatch.setattr(dedup, "_PAIRS_COLLECT_THRESHOLD", 0)
    dist = sorted(
        (r["node"], r["group"]) for r in dedup.pairs_to_groups(df).collect())
    assert small == dist and len(small) > 0
    # min-reachable-label spot check: the 10..18 chain collapses to 10
    assert (17, 10) in small


def test_wcc_small_path_equals_distributed(spark):
    from hazelcast_jet_spark.operators.graph import wcc

    edges = _pair_df(spark, PAIRS).selectExpr(
        "id_a AS src", "id_b AS dst")
    small = sorted(
        (r["node"], r["component"]) for r in wcc(edges).collect())
    # rounds_out requests the distributed star-contraction contract
    rounds: list = []
    dist = sorted(
        (r["node"], r["component"])
        for r in wcc(edges, rounds_out=rounds).collect())
    assert small == dist and len(small) > 0
    assert rounds and rounds[0] >= 1
    assert (17, 10) in small


def test_pairs_to_groups_small_path_string_ids(spark, monkeypatch):
    from hazelcast_jet_spark.operators import dedup

    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "id_a string, id_b string")
    small = sorted(
        (r["node"], r["group"]) for r in dedup.pairs_to_groups(df).collect())
    monkeypatch.setattr(dedup, "_PAIRS_COLLECT_THRESHOLD", 0)
    dist = sorted(
        (r["node"], r["group"]) for r in dedup.pairs_to_groups(df).collect())
    assert small == dist
    assert ("c", "a") in small and ("y", "x") in small
