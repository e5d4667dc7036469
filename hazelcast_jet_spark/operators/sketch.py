"""KMV (k-minimum-values) distinct-count sketch — the "novel sketch"
slot in the build brief's custom-operator list (no Jet analog; Jet's
only cardinality tool is exact distinct).

A KMV sketch keeps the k smallest hash values of a set; the fraction of
the hash space they span estimates cardinality as ``(k-1) / frac(kth
smallest)`` (Bar-Yossef et al. 2002).  Unlike HLL
(``approx_count_distinct``), the sketch here is

- **deterministic and engine-portable**: md5 hashing + pure arithmetic,
  so DuckDB/Trino running the same SQL produce the SAME estimate
  bit-for-bit — it can sit under the exact-hash correctness gate, which
  no randomized sketch can;
- **mergeable**: union two sketches and re-take the k smallest — the
  partial/final split Spark's aggregation needs is just
  ``collect_set → sort → slice`` composed twice;
- **exact below k**: fewer than k distinct values → the sketch IS the
  distinct set.

All JVM expressions (collect_set + sort_array + slice + conv).

State bounds, honestly: :func:`kmv_sketch` is ``slice(sort(collect_set))``
— the ``collect_set`` accumulates EVERY distinct hash of the group before
the k-slice, so its aggregation state is O(distinct-per-group), fine for
moderate cardinalities but exactly the blow-up sketches exist to avoid on
a 100 TB high-cardinality group.  For that regime use
:func:`kmv_distinct_sharded`: it shards each group's values by hash,
sketches per (group, shard) — each partial holds only its shard's
distinct hashes — and folds the shard sketches, producing a sketch
BIT-IDENTICAL to the unsharded one (the global k smallest hashes are a
subset of the union of per-shard k smallest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-space fraction of an md5 prefix: first 12 hex chars / 16^12
_SPACE = float(16 ** 12)


def kmv_sketch(col: Column | str, k: int = 64) -> Column:
    """Aggregate: the k smallest md5 hashes of the column's values
    (array<string>, sorted ascending) — a mergeable distinct sketch.

    Aggregation state is O(distinct-per-group) (collect_set accumulates
    before the slice); for high-cardinality groups at scale use
    :func:`kmv_distinct_sharded`, which bounds each partial to one hash
    shard and yields the identical sketch."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(F.sort_array(F.collect_set(F.md5(c.cast("string")))), 1, k)


def kmv_distinct_sharded(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    k: int = 64,
    num_shards: int = 16,
    sketch_col: str = "sk",
) -> DataFrame:
    """Two-level KMV: ``groupBy(group_cols, hash(v) % num_shards)`` bottom-k
    partial sketches, folded per group into the final sketch.

    The result column is bit-identical to ``groupBy(group_cols)
    .agg(kmv_sketch(col, k))`` — the k smallest hashes of a union are
    contained in the union of each part's k smallest — but no single
    aggregation state ever holds more than one shard's distinct hashes:
    per-partial state is O(distinct/num_shards), and the merge level's
    collect_list state is bounded at num_shards * k strings.  Size
    ``num_shards`` so distinct/num_shards comfortably fits executor
    memory (it only needs to be within ~1000x of optimal; shards are
    re-merged exactly).  The non-oracle alternative for pure cardinality
    is Spark's ``approx_count_distinct`` (HLL, O(1) state, but neither
    deterministic across engines nor exact below k).
    """
    c = F.col(col)
    shard = F.pmod(F.xxhash64(c.cast("string")), F.lit(num_shards))
    partial = df.groupBy(*group_cols, shard.alias("_kmv_shard")).agg(
        kmv_sketch(c, k).alias("_psk"))
    return partial.groupBy(*group_cols).agg(
        F.slice(
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("_psk")))),
            1, k,
        ).alias(sketch_col)
    )


def kmv_estimate(sketch: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a :func:`kmv_sketch` column: exact
    when the sketch holds fewer than k hashes, else ``(k-1)/frac(kth)``
    rounded to the nearest integer (floor(+0.5) — engine-identical)."""
    kth_frac = (
        F.conv(F.substring(F.element_at(sketch, k), 1, 12), 16, 10).cast("double")
        / F.lit(_SPACE)
    )
    return F.when(F.size(sketch) < k, F.size(sketch).cast("long")).otherwise(
        F.floor(F.lit(float(k - 1)) / kth_frac + F.lit(0.5)).cast("long")
    )


def kmv_merge(a: Column, b: Column, k: int = 64) -> Column:
    """Merge two sketches: union, dedup, re-take the k smallest."""
    return F.slice(F.sort_array(F.array_distinct(F.concat(a, b))), 1, k)
