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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


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


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton/Z-order interleave of two pre-quantized bucket indexes in
    ``[0, 2^bits)``: bit i of ``x`` lands at position 2i+1, bit i of
    ``y`` at 2i — the space-filling-curve sort key multi-dimensional
    data-skipping layouts cluster by (Morton 1966; the technique behind
    Delta/Iceberg OPTIMIZE ZORDER).

    Pure integer shift/mask arithmetic (2·bits terms, whole-stage
    codegen'd, engine-exact); quantize each dimension first — rank
    buckets (ntile) for skew-immunity or fixed-width bins when the
    domain is known.
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(x.cast("bigint"), i)
                           .bitwiseAND(F.lit(1)), 2 * i + 1)
             + F.shiftleft(F.shiftright(y.cast("bigint"), i)
                           .bitwiseAND(F.lit(1)), 2 * i))
    return z


def layout_locality_audit(df: DataFrame, x_col: str, y_col: str,
                          tiebreak_col: str, n_files: int = 64,
                          bits: int = 8,
                          round_digits: int = 6) -> DataFrame:
    """Data-skipping planner: would Z-ORDERING this table beat sorting
    it by one column?  Simulates writing the table as ``n_files``
    equal-row files under three layouts — sorted by x, sorted by y,
    and Z-ordered on (x, y) — and reports each file's per-dimension
    min/max span as a fraction of the domain.  A zone-map (parquet
    row-group stats) prunes a file iff the predicate misses its span,
    so MEAN SPAN ≈ expected fraction of files scanned by a random
    point/range predicate on that dimension: x-sort gives ~1/n_files
    on x but ~1 on y; Z-order gives ~1/sqrt(n_files) on BOTH — the
    number this audit surfaces before an expensive table rewrite.

    Both dimensions are rank-quantized to ``2^bits`` buckets (ntile
    with a ``tiebreak_col`` total order, so engines agree bit-for-bit
    and skew cannot collapse buckets).  The audit runs single-task
    windows over a 2-int projection — a planning tool: run it on a
    sample beyond ~10^7 rows (the rfm_segments ntile convention); the
    REWRITE itself would use repartitionByRange(zorder_key) which
    scales, and this audit is how you justify paying for it.

    Returns one row per (layout, dimension): ``(layout, dim,
    mean_span, max_span)`` ordered by (layout, dim) — span the
    bucket-range fraction of that dimension covered by an average /
    worst file.
    """
    n_buckets = 1 << bits
    w_x = Window.orderBy(F.col("__x"), F.col("__t"))
    w_y = Window.orderBy(F.col("__y"), F.col("__t"))
    q = (df.select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"),
                   F.col(tiebreak_col).alias("__t"))
         .withColumn("__qx", F.ntile(n_buckets).over(w_x) - F.lit(1))
         .withColumn("__qy", F.ntile(n_buckets).over(w_y) - F.lit(1)))
    z = zorder_key(F.col("__qx"), F.col("__qy"), bits)
    layouts = q.select(
        "__qx", "__qy",
        F.explode(F.array(
            F.struct(F.lit("x_sorted").alias("layout"),
                     (F.col("__qx").cast("bigint") * F.lit(1 << 32)).alias("k")),
            F.struct(F.lit("y_sorted").alias("layout"),
                     (F.col("__qy").cast("bigint") * F.lit(1 << 32)).alias("k")),
            F.struct(F.lit("zorder").alias("layout"), z.alias("k")),
        )).alias("l")
    ).select("__qx", "__qy", "l.layout", "l.k")
    w_file = Window.partitionBy("layout").orderBy("k", "__qx", "__qy")
    files = (layouts
             .withColumn("__file", F.ntile(n_files).over(w_file))
             .groupBy("layout", "__file")
             .agg(F.min("__qx").alias("x_lo"), F.max("__qx").alias("x_hi"),
                  F.min("__qy").alias("y_lo"), F.max("__qy").alias("y_hi")))
    span = lambda lo, hi: ((F.col(hi) - F.col(lo) + F.lit(1))  # noqa: E731
                           .cast("double") / F.lit(float(n_buckets)))
    per_dim = files.select(
        "layout",
        F.explode(F.array(
            F.struct(F.lit("x").alias("dim"),
                     span("x_lo", "x_hi").alias("span")),
            F.struct(F.lit("y").alias("dim"),
                     span("y_lo", "y_hi").alias("span")),
        )).alias("d")
    ).select("layout", "d.dim", "d.span")
    d38 = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (per_dim.groupBy("layout", "dim")
            .agg(r6(d38(F.col("span"))
                    / F.count(F.lit(1)).cast("double")).alias("mean_span"),
                 r6(F.max("span")).alias("max_span"))
            .orderBy("layout", "dim"))
