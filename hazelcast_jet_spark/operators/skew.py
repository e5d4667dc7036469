"""Skew-handling helpers: salting for hot keys (SURVEY 'Partitioning &
shuffle' mandate).

AQE's skew-join splitting (on in `session.get_spark`) handles most skew at
runtime; these explicit helpers are for the cases AQE can't fix:
aggregations with one mega-key, and joins where the skewed side must pair
with a replicated build side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, keys: list[str], aggs: dict[str, Column],
                     reaggs: dict[str, Column], salt: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed keys: groupBy(key, salt) partial →
    groupBy(key) final.  ``aggs`` produce the salted partials; ``reaggs``
    re-combine them (e.g. count → sum of counts).

    Example::

        salted_aggregate(df, ["k"],
                         {"cnt": F.count(F.lit(1)), "s": F.sum("v")},
                         {"cnt": F.sum("cnt"),      "s": F.sum("s")})
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *(c.alias(n) for n, c in aggs.items())
    )
    return partial.groupBy(*keys).agg(*(c.alias(n) for n, c in reaggs.items()))


def salted_join(skewed: DataFrame, small: DataFrame, key: str,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Skewed-fact ⋈ small-dim join without one hot shuffle partition:
    salt the fact side, replicate the dim side across all salt values,
    join on (key, salt).  The dim side is replicated ``salt`` times —
    only suitable when it is broadcast-size anyway but the optimizer
    refused (e.g. disabled broadcast) or when pinning a shuffle join."""
    salted_fact = skewed.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_fact.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")
