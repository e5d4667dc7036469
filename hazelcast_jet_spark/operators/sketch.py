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

All JVM expressions (collect_set + sort_array + slice + conv); the
per-group state is bounded at k strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: hash-space fraction of an md5 prefix: first 12 hex chars / 16^12
_SPACE = float(16 ** 12)


def kmv_sketch(col: Column | str, k: int = 64) -> Column:
    """Aggregate: the k smallest md5 hashes of the column's values
    (array<string>, sorted ascending) — a mergeable distinct sketch."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(F.sort_array(F.collect_set(F.md5(c.cast("string")))), 1, k)


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
