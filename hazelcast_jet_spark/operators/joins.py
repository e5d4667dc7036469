"""Join-adjacent helpers: co-group and per-group top-N.

Reference: co-group `BatchStageWithKey.aggregate2/aggregate3` —
hazelcast-jet-core/.../pipeline/BatchStageWithKey.java:211-346 and
examples/co-group/.../BatchCoGroup.java; topN aggregate —
aggregate/AggregateOperations.java:279.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def co_group(left: DataFrame, right: DataFrame, key: str,
             left_aggs: dict[str, Column], right_aggs: dict[str, Column],
             how: str = "full_outer") -> DataFrame:
    """aggregate2: group two stages by one key, aggregate jointly.

    Spark-first shape: per-stage partial aggregation *before* the join —
    each side shuffles only its (key, acc) pairs, never raw rows, exactly
    matching Jet's two-stage accumulate/combine split
    (Processors.java:323-425).  Missing keys on either side yield nulls
    (Jet: empty accumulator) — fill with the op's identity downstream if
    needed.
    """
    la = left.groupBy(key).agg(*(c.alias(n) for n, c in left_aggs.items()))
    ra = right.groupBy(key).agg(*(c.alias(n) for n, c in right_aggs.items()))
    return la.join(ra, key, how)


def co_group3(s1: DataFrame, s2: DataFrame, s3: DataFrame, key: str,
              aggs1: dict[str, Column], aggs2: dict[str, Column],
              aggs3: dict[str, Column], how: str = "full_outer") -> DataFrame:
    """aggregate3 — BatchStageWithKey.java:282."""
    a1 = s1.groupBy(key).agg(*(c.alias(n) for n, c in aggs1.items()))
    a2 = s2.groupBy(key).agg(*(c.alias(n) for n, c in aggs2.items()))
    a3 = s3.groupBy(key).agg(*(c.alias(n) for n, c in aggs3.items()))
    return a1.join(a2, key, how).join(a3, key, how)


def top_n_rows(df: DataFrame, n: int, partition_by: list, order_by: list,
               rank_col: str = "rn") -> DataFrame:
    """topN as whole rows per group: window row_number ≤ n.

    Scale note: row_number over (partition, order) shuffles once by the
    partition keys and sorts within — no global sort, no driver collect;
    survives arbitrary group counts.  Order columns must break ties
    deterministically (append a unique id).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= n)
