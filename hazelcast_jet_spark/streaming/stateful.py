"""Stateful record-at-a-time transforms.

Reference: keyed mapStateful with TTL + eviction callback —
hazelcast-jet-core/.../pipeline/StreamStageWithKey.java:116-320 and
impl/processor/TransformStatefulP.java:48-151 (TTL at :56, eviction at
:100-151); global variant GeneralStage.java:156.

Batch shape: ``applyInPandas`` — the whole key's history arrives as one
pandas DataFrame (ordered by ``order_col`` when given), and the user fn
folds it.  Streaming shape: ``applyInPandasWithState`` — per-key state
object + ``GroupStateTimeout.EventTimeTimeout`` reproduces Jet's
watermark-driven TTL eviction (onEvict ≡ the ``state.hasTimedOut`` branch).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def map_stateful_batch(df: DataFrame, keys: list, fn: Callable, schema,
                       order_col: str | None = None) -> DataFrame:
    """Keyed mapStateful on a bounded stage.

    ``fn(pdf) -> pdf`` receives all rows of one key (sorted by
    ``order_col``) — the batch analog of folding items through per-key
    state in arrival order.
    """
    key_cols = [k if isinstance(k, str) else str(k) for k in keys]

    def run(pdf):
        if order_col is not None:
            pdf = pdf.sort_values(order_col)
        return fn(pdf)

    return df.groupBy(*[F.col(k) for k in key_cols]).applyInPandas(run, schema)


def map_stateful_batch_global(df: DataFrame, fn: Callable, schema,
                              order_col: str | None = None) -> DataFrame:
    """Global mapStateful — GeneralStage.java:156: one state object, all
    items through a single processor.  Single-group applyInPandas; like
    Jet's GlobalMapStatefulTransform this is deliberately non-parallel."""
    tagged = df.withColumn("__g", F.lit(1))

    def run(pdf):
        pdf = pdf.drop(columns="__g")
        if order_col is not None:
            pdf = pdf.sort_values(order_col)
        return fn(pdf)

    return tagged.groupBy("__g").applyInPandas(run, schema)


def filter_stateful_batch(df: DataFrame, keys: list, pred_fn: Callable,
                          order_col: str | None = None) -> DataFrame:
    """Keyed filterStateful (GeneralStage.java:188; StreamStageWithKey
    filterStateful): keep the rows a stateful predicate passes.

    ``pred_fn(pdf) -> pdf-subset`` sees one key's rows in ``order_col``
    order and returns the rows to KEEP (same columns) — e.g. "first
    occurrence per key", "rows whose value exceeds the running max".
    Output schema is the input schema by construction.
    """
    return map_stateful_batch(df, keys, pred_fn, df.schema, order_col)


def flat_map_stateful_batch(df: DataFrame, keys: list, fn: Callable, schema,
                            order_col: str | None = None) -> DataFrame:
    """Keyed flatMapStateful (GeneralStage.java:226): 0..n output rows per
    input row, driven by per-key state — same applyInPandas shape as
    mapStateful but the output schema (and row count) is the caller's.
    """
    return map_stateful_batch(df, keys, fn, schema, order_col)


def map_stateful_stream(df: DataFrame, keys: list[str], fn: Callable,
                        output_schema, state_schema,
                        ttl: str | None = None,
                        output_mode: str = "append") -> DataFrame:
    """Keyed mapStateful on a stream with TTL eviction.

    ``fn(key, pdf_iter, state) -> iter[pdf]`` is the
    applyInPandasWithState contract; when ``state.hasTimedOut`` the fn is
    invoked with an empty iterator — that branch is Jet's onEvictFn
    (TransformStatefulP.java:100-151).  ``ttl`` must be handled by the fn
    calling ``state.setTimeoutTimestamp(state.getCurrentWatermarkMs() +
    ttl_ms)``; pass it via closure.  The input df must already have a
    watermark (add_timestamps) for EventTimeTimeout to fire.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = GroupStateTimeout.EventTimeTimeout if ttl else GroupStateTimeout.NoTimeout
    return df.groupBy(*keys).applyInPandasWithState(
        fn, output_schema, state_schema, output_mode, timeout
    )
