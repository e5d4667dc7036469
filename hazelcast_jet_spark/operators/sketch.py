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


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    k: int = 10,
    capacity: int = 256,
    verify: bool = True,
) -> DataFrame:
    """Frequent items via Misra-Gries summaries (Misra & Gries 1982;
    merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012) —
    the heavy-hitter sketch of the family, alongside KMV's cardinality.

    Why not just ``groupBy(item).count()``: exact counting's map-side
    hash-agg state is O(distinct-per-partition) — on a 100 TB corpus with
    a URL/n-gram-sized vocabulary that spills every partition.  Here each
    partition keeps a BOUNDED ``capacity``-entry summary (the one
    genuinely per-partition-imperative step, a documented mapInPandas
    exception), so the shuffle carries at most ``partitions × capacity``
    candidate rows per group instead of the whole vocabulary.

    Guarantees (n = group's item count): every item with true frequency
    > n/(capacity+1) appears among the candidates, and each candidate's
    summed summary count understates its true count by at most
    n/(capacity+1).  With ``verify=True`` (default) a second pass
    re-counts ONLY the candidates exactly (broadcast semi-join — the
    candidate set is small by construction) and returns exact counts;
    the top-k is then provably exact whenever the k-th item's frequency
    clears n/(capacity+1) — size ``capacity`` accordingly.  With
    ``verify=False`` you get one pass and lower-bound counts.

    Returns ``(group_cols..., item, n, rank)`` with rank ≤ k per group,
    ties broken by item ascending; ``item`` is the string form of
    ``item_col`` (hashable across engines).  NULL items are ignored
    (pandas value_counts drops them in the summary and a null never
    equi-joins in the verify pass) — filter or coalesce first if nulls
    should count.

    State bound, honestly: each partition holds one ``capacity``-entry
    summary PER GROUP it sees — O(groups-per-partition × capacity).
    That is the right shape for heavy-hitter reports (few groups, huge
    vocabulary); for high-cardinality ``group_cols`` repartition by
    group first so each partition sees few groups, or drop the grouping
    and filter instead.
    """
    from pyspark.sql.types import LongType, StructField, StructType
    from pyspark.sql.window import Window

    group_cols = list(group_cols or [])
    items = df.select(
        *group_cols, F.col(item_col).cast("string").alias("item"))
    summary_schema = StructType(
        [items.schema[c] for c in group_cols]
        + [items.schema["item"], StructField("mg_count", LongType())])

    def mg_partition(batches):
        from collections import Counter

        import pandas as pd

        state: dict[tuple, Counter] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            if group_cols:
                grouped = pdf.groupby(group_cols, dropna=False, sort=False)["item"]
                per_group = {
                    (g if isinstance(g, tuple) else (g,)): s.value_counts()
                    for g, s in grouped
                }
            else:
                per_group = {(): pdf["item"].value_counts()}
            for g, counts in per_group.items():
                c = state.setdefault(g, Counter())
                c.update(counts.to_dict())
                if len(c) > capacity:
                    # mergeable-summaries rule: subtract the (capacity+1)-th
                    # largest count, drop non-positive — state stays bounded
                    sub = sorted(c.values(), reverse=True)[capacity]
                    state[g] = Counter(
                        {i: v - sub for i, v in c.items() if v > sub})
        rows = [
            g + (item, int(cnt))
            for g, c in state.items() for item, cnt in c.items()
        ]
        if rows:
            yield pd.DataFrame(rows, columns=group_cols + ["item", "mg_count"])

    cands = items.mapInPandas(mg_partition, summary_schema)
    merged = cands.groupBy(*group_cols, "item").agg(
        F.sum("mg_count").alias("n"))
    if verify:
        cand_keys = merged.select(*group_cols, "item")
        merged = (
            items.join(F.broadcast(cand_keys), group_cols + ["item"], "inner")
            .groupBy(*group_cols, "item")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    w = Window.partitionBy(*group_cols) if group_cols else Window.partitionBy()
    w = w.orderBy(F.col("n").desc(), F.col("item").asc())
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant for m registers."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


#: rho ceiling: 14 hex chars (56 bits) of suffix are examined, so the
#: all-zero suffix scores 56 + 1.
_HLL_MAX_RHO = 57


def hll_build(
    df: DataFrame,
    item_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    seed: str = "",
) -> DataFrame:
    """HyperLogLog registers (Flajolet, Fusy, Gandouet, Meunier 2007) —
    the constant-state cardinality sketch, mirroring Hazelcast's
    ``CardinalityEstimator`` (the IMDG-side HLL the reference exposes
    next to Jet; hazelcast/cardinality/CardinalityEstimator.java).

    Where KMV (:func:`kmv_sketch`) keeps k hashes and is exact below k,
    HLL keeps ``m = 2**p`` 6-bit registers and estimates any cardinality
    with ~1.04/sqrt(m) relative error — the right trade at 100 TB where
    even the k-hash set per group is too many distinct states.

    Deterministic and engine-portable, like every sketch in this module:
    the register index is the first ``p/4`` hex chars of
    ``md5(seed || value)``; rho is the leading-zero count of the next 14
    hex chars (56 bits) plus one, derived purely by string ops
    (``regexp_replace('^0+')`` + a 4-way CASE on the first surviving hex
    digit) — DuckDB/Trino replay it bit-for-bit, so HLL register tables
    can sit under the exact-hash correctness gate.

    Plan at scale: one map-side projection then ONE hash aggregation on
    ``(group, register)`` with partial ``max`` combine — each task's
    shuffle output is capped at ``groups-per-task × m`` rows regardless
    of input size.  Returns sparse rows ``(group_cols..., hll_reg INT,
    hll_rho INT)`` with at most ``m`` rows per group; merging sketches
    from different days/partitions is ``union`` + :func:`hll_merge`.
    NULL values are skipped (md5(NULL) is NULL).

    ``p`` must be a multiple of 4 (whole hex chars), 4..16.
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(f"p must be a multiple of 4 in 4..16, got {p}")
    group_cols = list(group_cols or [])
    v = F.col(item_col).cast("string")
    hx = F.md5(F.concat(F.lit(seed), v)) if seed else F.md5(v)
    nreg_hex = p // 4
    reg = F.conv(F.substring(hx, 1, nreg_hex), 16, 10).cast("int")
    rest = F.substring(hx, nreg_hex + 1, 14)
    trimmed = F.regexp_replace(rest, "^0+", "")
    first = F.substring(trimmed, 1, 1)
    clz = (
        F.when(first.isin(*"89abcdef"), F.lit(0))
        .when(first.isin(*"4567"), F.lit(1))
        .when(first.isin("2", "3"), F.lit(2))
        .otherwise(F.lit(3))
    )
    rho = F.when(trimmed == "", F.lit(_HLL_MAX_RHO)).otherwise(
        (F.lit(14) - F.length(trimmed)) * 4 + clz + 1
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, reg.alias("hll_reg"), rho.alias("hll_rho"))
        .groupBy(*group_cols, "hll_reg")
        .agg(F.max("hll_rho").alias("hll_rho"))
    )


def hll_merge(sketches: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Merge unioned :func:`hll_build` register tables: register-wise
    ``max`` — the HLL merge is lossless (sketch of a union ==
    merge of the sketches, bit-for-bit)."""
    group_cols = list(group_cols or [])
    return sketches.groupBy(*group_cols, "hll_reg").agg(
        F.max("hll_rho").alias("hll_rho"))


def hll_estimate(
    sketch: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """Cardinality estimates from a :func:`hll_build` register table.

    Emits per group: ``hll_registers`` (occupied registers),
    ``hll_zero_registers``, ``hll_sum`` (DECIMAL(38,0) —
    ``sum(2^(57-rho))`` over all m registers with absent registers
    counting ``2^57``; the integer-exact reformulation of the harmonic
    mean, portable because the term order never matters), and
    ``hll_estimate`` (DOUBLE): ``alpha_m * m^2 * 2^57 / hll_sum`` with
    Flajolet's small-range linear-counting correction ``m * ln(m/V)``
    when the raw estimate is <= 2.5m and V zero registers exist.

    Everything up to the final division is integer/DECIMAL-exact; the
    division itself is one correctly-rounded IEEE op, so the estimate is
    bit-identical across engines in the harmonic regime.  The
    linear-counting branch uses ``ln``, whose last-ulp behaviour is not
    formally pinned across engines — exact-hash gates should stay in the
    harmonic regime (true cardinality comfortably above 2.5m).
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(f"p must be a multiple of 4 in 4..16, got {p}")
    group_cols = list(group_cols or [])
    m = 2 ** p
    big = F.lit(2 ** _HLL_MAX_RHO).cast("decimal(38,0)")
    alpha_num = _hll_alpha(m) * m * m * float(2 ** _HLL_MAX_RHO)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("hll_registers"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_MAX_RHO} - hll_rho)")
            .cast("decimal(38,0)")
        ).alias("_s_present"),
        F.max("hll_reg").alias("_max_reg"),
    )
    # Nothing in the register table records the p used by hll_build, so a
    # mismatched p would silently skew m and alpha; fail loudly instead:
    # any register index >= 2**p proves the sketch was built with a larger
    # p.  The guard is woven into hll_registers (not a dropped side column,
    # which Catalyst would prune away unevaluated).
    agg = agg.withColumn(
        "hll_registers",
        F.when(
            F.col("_max_reg") >= F.lit(m),
            F.raise_error(F.lit(
                f"hll_estimate: register index >= m={m}; sketch was built "
                f"with a larger p than the p={p} passed here")
            ).cast("long"),
        ).otherwise(F.col("hll_registers")),
    ).drop("_max_reg")
    total = (
        F.col("_s_present")
        + (F.lit(m) - F.col("hll_registers")) * big
    ).cast("decimal(38,0)")
    raw = F.lit(alpha_num) / total.cast("double")
    zeros = (F.lit(m) - F.col("hll_registers")).cast("bigint")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), lc).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("hll_registers"),
        zeros.alias("hll_zero_registers"),
        total.alias("hll_sum"),
        est.alias("hll_estimate"),
    )


def count_min_build(df: DataFrame, item_col: str, width: int = 1024,
                    depth: int = 4, seed: str = "cm",
                    weight_col: str | None = None) -> DataFrame:
    """Build a Count-Min sketch (Cormode & Muthukrishnan 2005) of the
    column's value frequencies: ``depth`` independent hash rows of
    ``width`` counters; estimates overcount (never undercount) by at
    most the collision mass of the best row.

    Third member of the mergeable-sketch family here (KMV cardinality,
    Misra-Gries heavy hitters, CMS point frequencies): the returned
    frame has AT MOST ``depth × width`` rows regardless of input size
    or cardinality — ship it, store it, or union+re-aggregate sketches
    from different days to merge them (counter-wise addition IS the
    merge).

    Determinism and portability: row ``j``'s hash is the first 12 hex
    chars of ``md5(seed || j || ':' || value)`` mod ``width`` — pure
    integer arithmetic an oracle replays bit-for-bit (no murmur seeds,
    no engine-private hash).

    Plan at scale: the ``depth`` hash rows explode map-side, then ONE
    hash aggregation on ``(row, bucket)`` — partial (map-side) combine
    caps each task's output at ``depth × width`` counters, so the
    shuffle is bounded by ``tasks × depth × width`` longs, independent
    of the corpus.  NULL values are skipped (md5(NULL) is NULL and a
    NULL bucket row would pollute row 0).

    ``weight_col`` (optional, integer) makes each row count as that many
    occurrences: building from a pre-aggregated ``(item, n)`` frequency
    table yields counter-for-counter the sketch of the raw stream (the
    bucket counter is the exact integer sum of its members' counts
    either way) while hashing each DISTINCT item once — the cheap path
    when an exact per-item aggregate exists anyway (r12 optimization:
    count_min_estimates tokenized the corpus twice, once for the sketch
    and once for the exact comparison column; guide §2.3 "aggregate
    before you shuffle").

    Returns ``(cm_row INT, cm_bucket INT, cm_count BIGINT)``.
    """
    if width <= 0 or depth <= 0:
        raise ValueError(f"width/depth must be > 0, got {width}/{depth}")
    v = F.col(item_col).cast("string")
    rows = F.array(*[
        F.struct(
            F.lit(j).alias("cm_row"),
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{seed}{j}:"), v)), 1, 12), 16, 10)
             .cast("bigint") % width).cast("int").alias("cm_bucket"),
        )
        for j in range(depth)
    ])
    if weight_col is None:
        agg = F.count(F.lit(1)).alias("cm_count")
        exploded = df.filter(v.isNotNull()).select(F.explode(rows).alias("h"))
    else:
        agg = F.sum(F.col("__w")).cast("bigint").alias("cm_count")
        exploded = (df.filter(v.isNotNull())
                    .select(F.col(weight_col).cast("bigint").alias("__w"),
                            F.explode(rows).alias("h")))
    return (
        exploded
        .groupBy(F.col("h.cm_row").alias("cm_row"),
                 F.col("h.cm_bucket").alias("cm_bucket"))
        .agg(agg)
    )


def count_min_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                       depth: int = 4, width: int = 1024,
                       seed: str = "cm") -> DataFrame:
    """Point-frequency estimates from a :func:`count_min_build` sketch:
    for each probe key, ``min`` over the ``depth`` rows of the counter
    its hash lands in (0 if a row's counter is absent — the key was
    never seen by that hash row).

    The probe set is usually small (a watchlist, a vocabulary slice):
    each key expands to its ``depth`` (row, bucket) coordinates and
    equi-joins the ≤ depth×width-row sketch — Spark broadcasts the
    sketch side, so probing is shuffle-free over the keys.  Guarantee:
    ``estimate ≥ true count``, and with prob ≥ 1-(1/2)^depth the excess
    is ≤ 2n/width (standard CMS bound with these row counts).

    Returns ``(key STRING, cm_estimate BIGINT)``.
    """
    from pyspark.sql.functions import broadcast

    v = F.col(key_col).cast("string")
    rows = F.array(*[
        F.struct(
            F.lit(j).alias("cm_row"),
            (F.conv(F.substring(
                F.md5(F.concat(F.lit(f"{seed}{j}:"), v)), 1, 12), 16, 10)
             .cast("bigint") % width).cast("int").alias("cm_bucket"),
        )
        for j in range(depth)
    ])
    probes = (
        keys.filter(v.isNotNull())
        .select(v.alias("key"), F.explode(rows).alias("h"))
        .select("key", F.col("h.cm_row").alias("cm_row"),
                F.col("h.cm_bucket").alias("cm_bucket"))
    )
    return (
        probes.join(broadcast(sketch), ["cm_row", "cm_bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cm_count"), F.lit(0)))
             .alias("cm_estimate"))
    )


def cms_join_size(cms_a: DataFrame, cms_b: DataFrame) -> DataFrame:
    """Equi-join output-size estimate from two Count-Min sketches built
    with the SAME (width, depth, seed): the classic sketch inner
    product (Alon-Gibbons-Matias-Szegedy / Cormode-Muthukrishnan) —

        |A join B| <= min over rows r of sum_w a[r][w] * b[r][w]

    with equality in expectation minus collision bias (the estimate
    never UNDERcounts).  This is the "plan before you shuffle" probe:
    two bounded sketches (depth x width counters each, built map-side)
    answer "how big would this join be?" without moving either table —
    at 100 TB the difference between a key-skew surprise mid-shuffle
    and a salting decision made up front.  Pair it with
    :func:`~hazelcast_jet_spark.operators.profile.key_skew` for the
    per-key view.

    Plan: one (row, bucket) equi-join of two sketch tables (each at
    most depth x width rows), one per-row sum, one min.  Missing
    buckets contribute 0 (inner join drops them — a bucket absent from
    either sketch has a zero counter).

    Returns one row ``(est_join_size BIGINT)``.
    """
    a = cms_a.select("cm_row", "cm_bucket",
                     F.col("cm_count").alias("__ca"))
    b = cms_b.select("cm_row", "cm_bucket",
                     F.col("cm_count").alias("__cb"))
    per_row = (
        a.join(b, ["cm_row", "cm_bucket"])
        .groupBy("cm_row")
        .agg(F.sum(F.col("__ca") * F.col("__cb")).alias("__ip"))
    )
    # a hash row with NO overlapping buckets has inner product 0 — it must
    # drive the min to 0, so left-join the sketch's full row set back in
    rows = cms_a.select("cm_row").distinct()
    full = rows.join(per_row, "cm_row", "left").select(
        F.coalesce("__ip", F.lit(0)).alias("__ip"))
    return full.agg(F.min("__ip").cast("bigint").alias("est_join_size"))


# ---------------------------------------------------------------------------
# Deterministic mergeable quantile sketch (bottom-k uniform row sample)
# ---------------------------------------------------------------------------

def quantile_sketch(value_col: Column | str, key_col: Column | str,
                    k: int = 256) -> Column:
    """Aggregate: a deterministic, mergeable QUANTILE sketch — the k rows
    whose md5(key) hashes are smallest, stored as sorted
    ``array<struct<h: string, v: double>>``.

    Hashing a unique row key uniformly at random (md5 is the same
    "fixed public randomness" used by every sampler in this repo)
    makes the kept rows a uniform-without-replacement size-k sample of
    the group, so order statistics of the sample estimate the group's
    quantiles with the standard ~1/sqrt(k) error — the same regime as
    GK/KLL sketches (Greenwald-Khanna 2001) but, unlike them,

    - **deterministic and engine-portable**: md5 + array ops only, so a
      SQL oracle replays the sketch bit-for-bit (no randomized sketch
      can sit under an exact-hash gate);
    - **mergeable**: union two sketches and re-take the k smallest by
      hash — the global bottom-k of a union is contained in the union
      of per-part bottom-ks (the KMV argument, applied to row hashes);
    - **exact below k**: fewer than k rows -> the sketch IS the group.

    Aggregation state is O(rows-per-group) before the slice (the
    collect_list caveat shared with :func:`kmv_sketch`); at 100 TB use
    :func:`quantile_sketch_sharded`, which bounds each partial to one
    hash shard and folds to the identical sketch.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    pair = F.struct(F.md5(key.cast("string")).alias("h"),
                    v.cast("double").alias("v"))
    return F.slice(F.sort_array(F.collect_list(pair)), 1, k)


def quantile_sketch_sharded(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_col: str,
    k: int = 256,
    num_shards: int = 16,
    sketch_col: str = "qsk",
) -> DataFrame:
    """Two-level :func:`quantile_sketch`: bottom-k per (group, hash
    shard), folded per group — bit-identical to the unsharded sketch
    (the global k smallest row hashes are a subset of the union of the
    per-shard k smallest) with per-partial state bounded at one shard's
    rows and merge state at num_shards * k structs."""
    key = F.col(key_col)
    shard = F.pmod(F.xxhash64(key.cast("string")), F.lit(num_shards))
    partial = df.groupBy(*group_cols, shard.alias("_qs_shard")).agg(
        quantile_sketch(value_col, key_col, k).alias("_pqs"))
    return partial.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.flatten(F.collect_list("_pqs"))), 1, k)
        .alias(sketch_col)
    )


def quantile_estimate(sketch: Column, q: float) -> Column:
    """Quantile-q estimate from a :func:`quantile_sketch` column: the
    lower-index order statistic ``sorted_values[floor(q * (n-1)) + 1]``
    of the sampled values (1-based; no interpolation, so the estimate
    is always an actual data value and replays exactly in SQL)."""
    vals = F.sort_array(F.transform(sketch, lambda s: s["v"]))
    n = F.size(vals)
    idx = F.floor(F.lit(float(q)) * (n - F.lit(1)).cast("double")) + F.lit(1)
    return F.element_at(vals, idx.cast("int"))


def hll_pairwise_overlap(
    df: DataFrame,
    item_col: str,
    group_col: str,
    p: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Pairwise distinct-overlap estimates between groups from ONE pass
    of HLL sketches, via inclusion-exclusion::

        |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)

    where ``est(A ∪ B)`` is the estimate of the register-wise max merge
    (lossless, so the union estimate costs no second scan).  This is
    the audience-overlap / cross-segment-reach primitive: at 100 TB the
    exact answer needs a (user, group) self-join, while this reads the
    corpus once, keeps ``m = 2**p`` registers per group, and derives
    ALL O(G²) pair overlaps from the G sketch tables.

    Same determinism contract as :func:`hll_build`/:func:`hll_estimate`
    (md5 registers, integer-exact harmonic sum, one correctly-rounded
    division) — exact-hash-gate safe in the harmonic regime.

    Returns ``(group_a, group_b, est_a, est_b, est_union, est_overlap)``
    with ``group_a < group_b``, ordered; estimates rounded.
    """
    # the register table feeds four consumers (single estimates, the
    # group list, both pair sides): persist it so the corpus is scanned
    # ONCE — the sketch is bounded at groups x m rows, the whole point
    # of sketching (unpersisted, each consumer would re-scan the input;
    # measured 10 parquet scans at sf0.01 pre-fix)
    sk = hll_build(df, item_col, [group_col], p=p).persist()
    singles = hll_estimate(sk, [group_col], p=p).select(
        group_col, "hll_estimate")
    groups = sk.select(group_col).distinct()
    pairs = (groups.alias("ga")
             .join(groups.alias("gb"),
                   F.col(f"ga.{group_col}") < F.col(f"gb.{group_col}"))
             .select(F.col(f"ga.{group_col}").alias("group_a"),
                     F.col(f"gb.{group_col}").alias("group_b")))
    # union registers: each pair collects both sides' registers (two
    # broadcast joins of the tiny pair list against the sketch table),
    # then the lossless register-wise max merge
    side_a = (pairs.join(sk, F.col(group_col) == F.col("group_a"))
              .select("group_a", "group_b", "hll_reg", "hll_rho"))
    side_b = (pairs.join(sk, F.col(group_col) == F.col("group_b"))
              .select("group_a", "group_b", "hll_reg", "hll_rho"))
    pair_regs = hll_merge(side_a.unionByName(side_b),
                          ["group_a", "group_b"])
    union_est = hll_estimate(pair_regs, ["group_a", "group_b"], p=p) \
        .select("group_a", "group_b",
                F.col("hll_estimate").alias("__u"))
    ea = singles.select(F.col(group_col).alias("group_a"),
                        F.col("hll_estimate").alias("__ea"))
    eb = singles.select(F.col(group_col).alias("group_b"),
                        F.col("hll_estimate").alias("__eb"))
    rd = round_digits
    return (union_est
            .join(F.broadcast(ea), "group_a")
            .join(F.broadcast(eb), "group_b")
            .select(
                "group_a", "group_b",
                (F.round(F.col("__ea"), rd) + F.lit(0.0)).alias("est_a"),
                (F.round(F.col("__eb"), rd) + F.lit(0.0)).alias("est_b"),
                (F.round(F.col("__u"), rd) + F.lit(0.0)).alias("est_union"),
                (F.round(F.col("__ea") + F.col("__eb") - F.col("__u"), rd)
                 + F.lit(0.0)).alias("est_overlap"))
            .orderBy("group_a", "group_b"))
