"""Bucketed (co-located) joins — the shuffle-free repeated-join lever.

Jet co-locates IMap partitions by key so joins/lookups are partition-local
(impl/execution/init/PartitionArrangement.java, IMapJoiner point-lookups).
The Spark-native equivalent: bucketed tables — both sides pre-hashed into
the same number of buckets on the join key, so joins and aggregations on
that key run with NO Exchange at all (the shuffle is paid once at write
time, then amortized over every subsequent query — the right trade at
100 TB for fact tables joined daily on the same key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort: bool = True) -> None:
    """Persist as a bucketed managed table (hash(key) → bucket file;
    optional per-bucket sort enables merge-join without sorting)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key: Catalyst elides
    both exchanges (verify with explain() — no Exchange below the join)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
