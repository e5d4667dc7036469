"""Continuous aggregates — the hypertable-rollup shape (a TimescaleDB-
style materialized time rollup; no Jet analog — Phase-5 extension named
in the build brief).

A streaming windowed aggregation is materialized INCREMENTALLY into a
:class:`~hazelcast_jet_spark.storage.KeyedParquetTable` keyed by
``(window_start, *keys)``: each micro-batch upserts only the windows it
touched (update-mode semantics → O(changed windows) table writes per
batch, never a full rewrite), and the table equals the batch aggregation
of everything ingested so far — queryable at any time with plain
``spark.read.parquet`` while the stream keeps running.

Scale shape: state lives in Spark's windowed-agg state store (bounded
by watermark), the table write path is the same O(changed-buckets)
keyed-upsert the CDC sink uses, and reads prune by bucket.  Restart =
checkpoint replay × idempotent keyed upsert (exactly-once table state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def continuous_aggregate(
    stream: DataFrame,
    table_path: str,
    window: str,
    time_col: str = "ts",
    keys: list[str] | None = None,
    aggs: dict[str, F.Column] | None = None,
    checkpoint: str | None = None,
    num_buckets: int = 64,
    commit_mode: str = "rename",
):
    """Start a query materializing ``stream``'s windowed aggregation.

    ``aggs`` maps output column name → aggregate Column (as in
    ``.agg``).  The rollup table's key is ``window_start`` (formatted
    string, timezone-independent) plus ``keys``.  Returns the
    StreamingQuery; await it (or use Job) and read the table with
    :func:`read_rollup`.
    """
    from hazelcast_jet_spark.storage import KeyedParquetTable

    keys = list(keys or [])
    aggs = aggs or {"n": F.count(F.lit(1)).alias("n")}
    key_cols = ["window_start", *keys]
    table = KeyedParquetTable(table_path, key_cols, num_buckets,
                              commit_mode=commit_mode)

    windowed = (
        stream.groupBy(F.window(time_col, window), *keys)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *keys, *aggs.keys(),
        )
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # update mode: the batch carries the NEW TOTAL of every window the
        # micro-batch touched — a pure keyed upsert, no read-modify-merge
        table.apply(batch_df, batch_df.select(*key_cols))

    w = windowed.writeStream.outputMode("update").foreachBatch(upsert)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.trigger(availableNow=True).start()


def read_rollup(spark, table_path: str, key_cols: list[str],
                num_buckets: int = 64, commit_mode: str = "rename") -> DataFrame:
    """Read the materialized rollup (bucket-pruned keyed-table read)."""
    from hazelcast_jet_spark.storage import KeyedParquetTable

    return KeyedParquetTable(table_path, key_cols, num_buckets,
                             commit_mode=commit_mode).read(spark)
