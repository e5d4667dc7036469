"""Pins for the unified index_health table (r10 verdict "Next round #4"):
each component's rows must equal the standalone staleness operator it
unifies — no second source of truth — and the gated construction's LSH
counters must match the index tree on disk.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators.dedup import _list_epochs, _load_tombstones
from hazelcast_jet_spark.operators.index_health import index_health
from hazelcast_jet_spark.operators.similarity import (ivf_index_staleness,
                                                      pq_codebook_staleness)


@pytest.fixture(scope="module")
def health_setup(spark, sf_dir):
    """Build the gated query's persisted indexes once and return
    (health_df_rows, ann_path, lsh_path, cents, books, is_new)."""
    import __spark_entry__ as m

    out = m.index_health_emb(spark, sf_dir)
    tag = os.path.basename(os.path.normpath(sf_dir))
    ann = os.path.join(tempfile.gettempdir(), f"spark_graft_annhealth_{tag}")
    lsh = os.path.join(tempfile.gettempdir(), f"spark_graft_lshhealth_{tag}")
    rows = {(r.component, r.key, r.metric): r for r in out.collect()}
    return rows, ann, lsh


def test_schema_and_actions(health_setup):
    rows, _, _ = health_setup
    comps = {c for c, _, _ in rows}
    assert comps == {"ivf", "pq", "lsh"}
    actions = {r.action for r in rows.values()}
    assert actions == {"recluster", "refit", "compact"}


def test_ivf_rows_equal_standalone_twin(spark, health_setup):
    """('ivf', cid, 'drift') rows == ivf_index_staleness over the same
    persisted index, with the documented 0.5×median(mean_dist)
    threshold (lower median, rank-based)."""
    import __spark_entry__ as m

    rows, ann, _ = health_setup
    assigned = spark.read.option("basePath", ann).parquet(ann)
    twin = ivf_index_staleness(assigned, m._ivf_centroids()).collect()
    meds = sorted((t.mean_dist, t.centroid_id) for t in twin)
    med = meds[(len(meds) + 1) // 2 - 1][0]
    for t in twin:
        r = rows[("ivf", str(t.centroid_id), "drift")]
        assert r.value == t.drift
        assert r.threshold == 0.5 * med
        assert r.breached == (t.drift > 0.5 * med)
    n_ivf = sum(1 for c, _, _ in rows if c == "ivf")
    assert n_ivf == len(twin)


def test_pq_rows_equal_standalone_twin(spark, health_setup):
    import __spark_entry__ as m

    rows, ann, _ = health_setup
    assigned = spark.read.option("basePath", ann).parquet(ann)
    twin = pq_codebook_staleness(assigned, m._pq_fixed_codebooks(),
                                 F.col("vec_id") % 3 == 0).collect()
    assert len(twin) == m.PQ_M
    for t in twin:
        r = rows[("pq", str(t.subspace), "err_ratio")]
        assert r.value == t.err_ratio
        assert r.threshold == 1.5
        assert r.breached == t.refit


def test_lsh_rows_match_index_tree(spark, health_setup):
    rows, _, lsh = health_setup
    ep = rows[("lsh", "buckets", "epochs")]
    assert ep.value == float(len(_list_epochs(spark, f"{lsh}/buckets")))
    assert ep.breached == (ep.value > ep.threshold)
    tomb = _load_tombstones(spark, lsh)
    n_tomb = 0 if tomb is None else tomb.count()
    tr = rows[("lsh", "tombstones", "tombstoned_ids")]
    assert tr.value == float(n_tomb)
    assert n_tomb > 0 and tr.breached  # the gated construction retracts
    assert tr.action == "compact"


def test_lsh_leg_optional(spark, sf_dir, health_setup):
    """Without an LSH index the report is just the ANN components."""
    import __spark_entry__ as m

    _, ann, _ = health_setup
    out = index_health(spark, ann, m._ivf_centroids(),
                       m._pq_fixed_codebooks(),
                       F.col("vec_id") % 3 == 0)
    comps = {r.component for r in out.select("component").distinct()
             .collect()}
    assert comps == {"ivf", "pq"}
