"""Spatial grid operators — planar radius joins without a cross join.

The 100 TB primitive: a distance-threshold join between two point sets
(stores×customers, cell-towers×events, near-duplicate detections on a
2-D projection) executed as a GRID EQUI-JOIN.  Both sides bucket into
square cells of side = radius; every true pair within ``radius`` lies
in the same cell or one of its 8 neighbors, so exploding the probe side
to its 3×3 neighborhood and equi-joining on the cell id is an EXACT
candidate filter (the pigeonhole argument of the LSH band probe, in
geometry).  The verify step compares SQUARED distance to radius² — no
sqrt, no transcendental, engine-exact on binary-rational coordinates.

Shuffle shape: cells are the join key, so the pair space never
materializes; a 9× row amplification on ONE side buys the equi-join.
Skewed cells (urban cores) are AQE-split like any hot key; callers with
a known hot cell can cap it the way the LSH lane caps hot buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_cell(x: Column, y: Column, cell: float) -> Column:
    """Integer grid-cell id struct ``(cx, cy)`` for a planar point at
    cell side ``cell`` — ``floor`` bucketing, the geohash-equivalent for
    equi-join bucketing (prefix-truncatable the same way: halving the
    cell side splits every cell in four)."""
    return F.struct(
        F.floor(x / F.lit(cell)).alias("cx"),
        F.floor(y / F.lit(cell)).alias("cy"))


def _grid_candidates(left: DataFrame, right: DataFrame, radius: float,
                     x_col: str, y_col: str,
                     suffixes: tuple) -> tuple[DataFrame, Column]:
    """The shared exact-recall candidate join of :func:`radius_join`
    and :func:`knn_join`: the left side buckets once, the right side
    explodes to its 3×3 cell neighborhood, candidates meet on the
    exact ``(cx, cy)`` key and are filtered to ``d² ≤ radius²``.
    Returns the candidate frame (EVERY column of both sides suffixed)
    and the exact squared-distance Column over it."""
    lx, ly = F.col(x_col), F.col(y_col)
    lcell = grid_cell(lx, ly, radius)
    lt = left.select(
        *[F.col(c).alias(c + suffixes[0]) for c in left.columns],
        lcell["cx"].alias("__cx"), lcell["cy"].alias("__cy"))
    off = F.explode(F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("__o")
    rcell = grid_cell(F.col(x_col), F.col(y_col), radius)
    rt = (right.select(
        *[F.col(c).alias(c + suffixes[1]) for c in right.columns],
        rcell["cx"].alias("__rcx"), rcell["cy"].alias("__rcy"))
        .select("*", off)
        .select(
            *[F.col(c + suffixes[1]) for c in right.columns],
            (F.col("__rcx") + F.col("__o.dx")).alias("__cx"),
            (F.col("__rcy") + F.col("__o.dy")).alias("__cy")))
    dx = F.col(x_col + suffixes[0]) - F.col(x_col + suffixes[1])
    dy = F.col(y_col + suffixes[0]) - F.col(y_col + suffixes[1])
    d2 = dx * dx + dy * dy
    # no dropDuplicates needed: a pair meets on exactly ONE cell (the
    # left point's), whichever of the 9 right offsets lands there
    cand = (lt.join(rt, ["__cx", "__cy"])
            .filter(d2 <= F.lit(float(radius) * float(radius))))
    return cand, d2


def radius_join(left: DataFrame, right: DataFrame, radius: float,
                x_col: str = "x", y_col: str = "y",
                suffixes: tuple = ("_l", "_r"),
                round_digits: int = 6) -> DataFrame:
    """All pairs (left row, right row) with planar Euclidean distance
    ≤ ``radius``, as a grid equi-join — never a cross join.

    The LEFT side buckets once; the RIGHT side explodes to its 3×3 cell
    neighborhood (9 rows) so every candidate pair meets on an exact
    ``(cx, cy)`` key.  Exactness: for cell side = radius, two points
    within ``radius`` differ by < 1 cell index on each axis, so the
    neighborhood probe has recall 1; the squared-distance verify
    (``dx² + dy² ≤ r²``) then gives precision 1 with no square root —
    on coordinates that are exact binary rationals the comparison is
    bit-identical across engines.

    Returns EVERY column of both sides, each suffixed with its side's
    suffix (coordinates included — callers read ``x_l``/``x_r``), plus
    ``dist2``.  Plan: two scans, one 9×-amplified shuffle on the cell
    key, zero pair-space blowup.
    """
    cand, d2 = _grid_candidates(left, right, radius, x_col, y_col,
                                suffixes)
    return cand.select(
        *[F.col(c + suffixes[0]) for c in left.columns],
        *[F.col(c + suffixes[1]) for c in right.columns],
        (F.round(d2, round_digits) + F.lit(0.0)).alias("dist2"))

def knn_join(left: DataFrame, right: DataFrame, k: int, radius: float,
             left_id: str = "id_l", right_id: str = "id_r",
             x_col: str = "x", y_col: str = "y",
             suffixes: tuple = ("_l", "_r"),
             round_digits: int = 6) -> DataFrame:
    """Bounded-radius k-nearest-neighbor join: for each left row, its
    ``k`` nearest right rows WITHIN ``radius`` (the scalable kNN
    formulation — an unbounded kNN degenerates to an all-pairs scan for
    isolated probes, so the radius cap is the contract, exactly like
    the LSH lane caps hot buckets).  Lefts with fewer than ``k``
    in-radius neighbors yield fewer rows, never padding.

    Candidates come from the same 3×3 grid equi-join as
    :func:`radius_join` (recall 1 inside the radius, no cross join);
    ranking is a per-left window ordered by EXACT squared distance with
    the right id as the deterministic tie-break, so the result is
    engine-reproducible on binary-rational coordinates.  Shuffle shape:
    one 9×-amplified cell equi-join + one window partitioned by the
    left id — both keyed, no pair-space blowup.

    ``left_id`` must UNIQUELY identify left rows (it is the rank
    window's partition key — rows sharing an id would pool their
    candidate sets); ``right_id`` is the deterministic tie-break and
    should be unique on the right.

    Returns EVERY column of both sides (each suffixed with its side's
    suffix), ``dist2`` (rounded, signed-zero-normalized) and ``rank``
    (1-based).
    """
    if left_id not in left.columns or right_id not in right.columns:
        raise ValueError("left_id/right_id must name columns of their "
                         "respective inputs (pre-suffix names)")
    cand, d2 = _grid_candidates(left, right, radius, x_col, y_col,
                                suffixes)
    from pyspark.sql import Window
    w = (Window.partitionBy(left_id + suffixes[0])
         .orderBy(F.col("__d2").asc(), F.col(right_id + suffixes[1]).asc()))
    return (cand.withColumn("__d2", d2)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                *[F.col(c + suffixes[0]) for c in left.columns],
                *[F.col(c + suffixes[1]) for c in right.columns],
                (F.round(F.col("__d2"), round_digits)
                 + F.lit(0.0)).alias("dist2"),
                F.col("rank").cast("int").alias("rank")))


#: Cell-index bound for the single-long cell encoding below: indexes
#: must lie in (-2^20, 2^20) — at a 1 m cell that is a ±1000 km extent,
#: far beyond any planar-approximation use.
CELL_OFF = 1 << 20
CELL_SPAN = 1 << 21


def cell_key(cx: Column, cy: Column) -> Column:
    """Pack a (cx, cy) cell index pair into one non-negative long —
    the node id fed to the graph lane (``(cx+2^20)·2^21 + cy+2^20``).
    Indexes outside (-2^20, 2^20) would alias into OTHER cells' keys,
    so they raise instead of silently corrupting labels."""
    in_bounds = ((F.abs(cx) < F.lit(CELL_OFF))
                 & (F.abs(cy) < F.lit(CELL_OFF)))
    packed = ((cx + F.lit(CELL_OFF)) * F.lit(CELL_SPAN)
              + (cy + F.lit(CELL_OFF))).cast("long")
    return F.when(in_bounds, packed).otherwise(
        F.raise_error(F.concat(
            F.lit("cell_key: cell index out of the +/-2^20 packing "
                  "bound (cx="), cx.cast("string"),
            F.lit(", cy="), cy.cast("string"),
            F.lit(") - use a larger cell size"))))


def grid_density_clusters(df: DataFrame, cell: float, min_pts: int,
                          x_col: str = "x", y_col: str = "y",
                          max_rounds: int = 50) -> DataFrame:
    """Grid-density clustering (the cell-granular DBSCAN of CLIQUE /
    STING lineage): a cell of side ``cell`` holding at least
    ``min_pts`` points is CORE; core cells that touch (8-neighborhood)
    belong to one cluster; points in non-core cells are noise.

    The 100 TB shape: points shuffle ONCE into cell counts; the cluster
    merge then runs entirely on the CELL graph (|occupied cells| ≪
    |points|) via :func:`~..operators.graph.wcc`'s large-star/small-star
    contraction — O(log n) rounds, never a point-level pair join.  The
    cluster label is the minimum packed cell key (:func:`cell_key`) in
    the component, so the labeling is deterministic and
    engine-replayable.

    Returns the input rows plus ``cell_id`` (packed long) and
    ``cluster`` (long; NULL = noise).
    """
    from .graph import wcc

    c = grid_cell(F.col(x_col), F.col(y_col), cell)
    pts = df.withColumn("cell_id", cell_key(c["cx"], c["cy"]))
    # one point shuffle into the cell table, materialized ONCE (it is
    # referenced by the adjacency probe, its join target, and the
    # label-back) — |occupied cells| rows, O(1) lineage
    counts = (pts.groupBy("cell_id").agg(F.count(F.lit(1)).alias("__n"))
              .localCheckpoint())
    core = counts.filter(F.col("__n") >= min_pts).select("cell_id")
    # core-cell adjacency: explode each core cell to its 8 neighbors and
    # equi-join back against the core set (cell_key is affine, so the
    # neighbor's key is key + dx*SPAN + dy — no unpack needed)
    nbr = F.explode(F.array(*[
        F.lit(dx * CELL_SPAN + dy) for dx in (-1, 0, 1)
        for dy in (-1, 0, 1) if (dx, dy) != (0, 0)])).alias("__off")
    cand = (core.select("cell_id", nbr)
            .select(F.col("cell_id").alias("src"),
                    (F.col("cell_id") + F.col("__off")).alias("dst")))
    edges = cand.join(core.select(F.col("cell_id").alias("dst")), "dst")
    comp = wcc(edges, max_rounds=max_rounds)
    labels = (core.join(comp.select(F.col("node").alias("cell_id"),
                                    "component"), "cell_id", "left")
              .select("cell_id",
                      F.coalesce("component", "cell_id").alias("cluster")))
    # no broadcast hint: |core cells| is usually tiny (AQE will pick the
    # broadcast) but an unbounded extent must not OOM the driver
    return pts.join(labels, "cell_id", "left")


def hotspot_gi(df: DataFrame, cell: float,
               x_col: str = "x", y_col: str = "y",
               round_digits: int = 6) -> DataFrame:
    """Getis–Ord Gi* hot-spot statistic per occupied grid cell (Getis &
    Ord 1992; binary weights over the 3×3 neighborhood INCLUDING self,
    study area = the occupied cells): ``z = (G_i − x̄·W_i) /
    (S·sqrt((n·W_i − W_i²)/(n−1)))`` where ``G_i`` is the neighborhood
    point-count sum and ``W_i`` the occupied-neighbor count.

    All neighborhood sums are integer counts gathered by the same
    affine cell-key offset join as the density clusterer (one keyed
    self-join on |cells|, never on points); the global moments are one
    broadcast row; the z chain is fixed-order double arithmetic on
    exact integers, so the statistic is engine-identical.  Cells with
    ``n ≤ 1`` or zero variance return NULL z.

    Returns ``(cell_id, cx, cy, n_points, w, g, z)``.
    """
    c = grid_cell(F.col(x_col), F.col(y_col), cell)
    # materialize the cell table ONCE (localCheckpoint: |occupied cells|
    # rows, O(1) lineage) — it is referenced four times below and each
    # un-checkpointed reference would re-scan the point source
    cells = (df.select(c["cx"].alias("cx"), c["cy"].alias("cy"))
             .groupBy("cx", "cy")
             .agg(F.count(F.lit(1)).alias("n_points"))
             .withColumn("cell_id", cell_key(F.col("cx"), F.col("cy")))
             .localCheckpoint())
    nbr = F.explode(F.array(*[
        F.lit(dx * CELL_SPAN + dy) for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)])).alias("__off")
    probes = (cells.select("cell_id", nbr)
              .select(F.col("cell_id").alias("__at"),
                      (F.col("cell_id") + F.col("__off")).alias("cell_id")))
    hood = (probes.join(cells.select("cell_id", "n_points"), "cell_id")
            .groupBy(F.col("__at").alias("cell_id"))
            .agg(F.count(F.lit(1)).alias("w"),
                 F.sum("n_points").alias("g")))
    mom = cells.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("n_points").alias("__sx"),
        F.sum(F.col("n_points") * F.col("n_points")).alias("__sxx"))
    nn = F.col("__n").cast("double")
    xbar = F.col("__sx").cast("double") / nn
    s = F.sqrt(F.col("__sxx").cast("double") / nn - xbar * xbar)
    wd = F.col("w").cast("double")
    denom = s * F.sqrt((nn * wd - wd * wd) / (nn - F.lit(1.0)))
    z = ((F.col("g").cast("double") - xbar * wd) / denom)
    return (cells.join(hood, "cell_id")
            .crossJoin(F.broadcast(mom))  # one-row global moments
            .select("cell_id", "cx", "cy", "n_points", "w", "g",
                    F.when((F.col("__n") > 1) & (denom > 0),
                           F.round(z, round_digits) + F.lit(0.0))
                    .alias("z")))
