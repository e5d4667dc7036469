"""CDC ingestion — the Debezium connector family re-expressed on Spark.

Reference: extensions/cdc-debezium/src/main/java/com/hazelcast/jet/cdc/
(DebeziumCdcSources.java:62-90, ChangeRecord.java, Operation.java,
CdcSinks.java) and the MySQL/Postgres variants.

Jet embeds Debezium and emits ``ChangeRecord{op, key, value}``; the
idiomatic Spark shape is: Debezium writes to Kafka/files as JSON →
``readStream`` + ``from_json`` → normalized change rows →
``foreachBatch`` applies them to a keyed table (CdcSinks.map analog).

Operation mapping (Operation.java): c/r → INSERT/SYNC, u → UPDATE,
d → DELETE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Debezium envelope → Operation.java names
OP_MAP = {"c": "INSERT", "r": "SYNC", "u": "UPDATE", "d": "DELETE"}


def op_name(op_col: Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in OP_MAP.items() for x in kv])
    return m[op_col]


def parse_debezium(df: DataFrame, payload_schema: str, value_col: str = "value") -> DataFrame:
    """Parse Debezium JSON envelopes into ChangeRecord-shaped rows.

    ``payload_schema`` is the DDL schema of the row images, e.g.
    ``"id bigint, name string"``.  Output columns: op (INSERT/SYNC/
    UPDATE/DELETE), ts_ms, before, after (structs) — ChangeRecord.java's
    operation()/key()/value() surface.
    """
    env = F.from_json(
        F.col(value_col).cast("string"),
        f"op string, ts_ms bigint, before struct<{payload_schema}>, after struct<{payload_schema}>",
    )
    return df.select(
        op_name(env["op"]).alias("op"),
        env["ts_ms"].alias("ts_ms"),
        env["before"].alias("before"),
        env["after"].alias("after"),
    )


def cdc_apply(changes: DataFrame, table_path: str, key_cols: list[str],
              checkpoint: str | None = None, num_buckets: int = 64,
              commit_mode: str = "rename"):
    """Apply a stream of ChangeRecords to a keyed parquet table —
    ``CdcSinks.map(name, keyFn, valueFn)`` (CdcSinks.java): last-writer-
    wins upsert, DELETE removes the key.

    Batch semantics inside ``foreachBatch``: take the latest change per
    key in the batch (ts_ms order) and hand it to
    :class:`~hazelcast_jet_spark.storage.KeyedParquetTable`, which
    rewrites only the O(changed-keys) bucket partitions with durable
    staging + atomic per-bucket swap — never the whole table, and never
    an in-place overwrite of files still being read.  Exactly-once table
    state = checkpointed batch replay × idempotent keyed apply (see
    storage.py for the crash-recovery argument).  ``num_buckets`` sizes
    the partition grain: pick table_size / few-GB at scale.
    """
    from pyspark.sql.window import Window

    from hazelcast_jet_spark.storage import KeyedParquetTable

    table = KeyedParquetTable(table_path, key_cols, num_buckets, commit_mode=commit_mode)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(*key_cols).orderBy(F.col("ts_ms").desc())
        latest = (
            batch_df.select(
                "op", "ts_ms",
                *[F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(k) for k in key_cols],
                F.col("after").alias("row"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
        )
        upserts = latest.filter(F.col("op") != "DELETE").select("row.*")
        changed_keys = latest.select(*key_cols)
        table.apply(upserts, changed_keys)

    if changes.isStreaming:
        w = changes.writeStream.foreachBatch(apply_batch)
        if checkpoint:
            w = w.option("checkpointLocation", checkpoint)
        return w.trigger(availableNow=True).start()
    apply_batch(changes, 0)
    return None
