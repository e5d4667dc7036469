"""The size-adaptive iterative-graph small paths (bounded driver-side
replay, operators/graph_local.py) must be ROW- and BIT-IDENTICAL to the
distributed loops they replace below the threshold — the equality pins
that keep the r13 optimization from being a semantic fork.  Float
outputs (pagerank/ppr/hits) compare by exact equality of the collected
Python floats, i.e. IEEE bit patterns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators import graph_local
from hazelcast_jet_spark.operators.graph import (hindex_coreness, hits,
                                                 kcore_peel,
                                                 label_propagation,
                                                 pagerank,
                                                 personalized_pagerank)


@pytest.fixture(scope="module")
def edges(spark):
    # two dense-ish communities joined by a bridge, a chain, a hub, a
    # duplicate edge (multiplicity counts toward degree in pagerank),
    # and asymmetric degrees so L-inf normalizers and h-indexes move
    rows = (
        [(1, 2), (1, 3), (2, 3), (3, 4), (2, 4), (1, 4)]        # K4
        + [(10, 11), (10, 12), (11, 12), (12, 13), (11, 13)]    # dense-5
        + [(4, 10)]                                             # bridge
        + [(20, 21), (21, 22), (22, 23), (23, 24)]              # chain
        + [(30, i) for i in range(31, 40)]                      # hub
        + [(1, 2)]                                              # dup row
    )
    return spark.createDataFrame(rows, "src long, dst long")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _both_paths(monkeypatch, fn):
    small = _rows(fn())
    monkeypatch.setattr(graph_local, "GRAPH_COLLECT_THRESHOLD", 0)
    dist = _rows(fn())
    monkeypatch.setattr(graph_local, "GRAPH_COLLECT_THRESHOLD", 2_000_000)
    assert len(small) > 0
    return small, dist


def test_pagerank_small_equals_distributed(spark, edges, monkeypatch):
    small, dist = _both_paths(
        monkeypatch, lambda: pagerank(edges, iters=3))
    assert small == dist
    total = sum(r[1] for r in small)
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_fixpoint_small_equals_distributed(spark, edges,
                                                    monkeypatch):
    small, dist = _both_paths(
        monkeypatch,
        lambda: pagerank(edges, until_fixpoint=True, max_rounds=256))
    assert small == dist


def test_ppr_small_equals_distributed(spark, edges, monkeypatch):
    seeds = spark.createDataFrame([(1,), (10,), (999,)], "node long")
    small, dist = _both_paths(
        monkeypatch,
        lambda: personalized_pagerank(edges, seeds, iters=3))
    assert small == dist
    # unreachable chain/hub nodes keep rank rows (possibly 0.0)
    assert {r[0] for r in small} >= {20, 24, 30, 39}


def test_lpa_small_equals_distributed(spark, edges, monkeypatch):
    small, dist = _both_paths(
        monkeypatch, lambda: label_propagation(edges, iters=2))
    assert small == dist


def test_kcore_small_equals_distributed(spark, edges, monkeypatch):
    for k in (2, 3):
        small, dist = _both_paths(
            monkeypatch, lambda: kcore_peel(edges, k=k, iters=4))
        assert small == dist
    # k high enough to peel everything: both paths return 0 rows
    assert kcore_peel(edges, k=50, iters=4).count() == 0
    monkeypatch.setattr(graph_local, "GRAPH_COLLECT_THRESHOLD", 0)
    assert kcore_peel(edges, k=50, iters=4).count() == 0


def test_hindex_small_equals_distributed(spark, edges, monkeypatch):
    small, dist = _both_paths(
        monkeypatch, lambda: hindex_coreness(edges, iters=3))
    assert small == dist
    # hub center's neighbors are leaves: coreness 1 everywhere there
    d = dict(small)
    assert d[31] == 1


def test_hits_small_equals_distributed(spark, edges, monkeypatch):
    # directed bipartite-ish view: the raw edge rows as src->dst
    small, dist = _both_paths(
        monkeypatch, lambda: hits(edges, iters=2, round_digits=9))
    assert small == dist
    # top hub and top authority pinned at exactly 1.0 by L-inf
    assert max(r[2] for r in small if r[0] == "hub") == 1.0
    assert max(r[2] for r in small if r[0] == "auth") == 1.0


def test_hits_unrounded_small_equals_distributed(spark, edges,
                                                 monkeypatch):
    small, dist = _both_paths(
        monkeypatch, lambda: hits(edges, iters=2, round_digits=None))
    assert small == dist


def test_khop_small_equals_distributed(spark, edges, monkeypatch):
    from hazelcast_jet_spark.operators.graph import khop_reach

    for md in (3, 256):
        small, dist = _both_paths(
            monkeypatch, lambda: khop_reach(edges, max_degree=md))
        assert small == dist


def test_small_path_declines_non_integral(spark, monkeypatch):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string")
    assert graph_local.collect_int_edges(df) is None
    # string-keyed graphs still work via the distributed loop
    out = _rows(label_propagation(df, iters=2))
    assert len(out) == 3


def test_small_path_declines_nulls(spark):
    df = spark.createDataFrame(
        [(1, 2), (None, 3)], "src long, dst long")
    assert graph_local.collect_int_edges(df) is None
