"""Deterministic sampling for training-data pipelines (no reference
analog — Jet has no sampling operators; extension alongside dedup/
similarity per the Phase-5 brief).

Everything here is *deterministic and engine-portable*: the sampling
decision is a pure function of the row key via md5 (not Spark's
``rand()``/``TABLESAMPLE``, whose streams are engine- and
partitioning-dependent), so

- re-running the pipeline reproduces the same sample (training-data
  lineage),
- adding executors / repartitioning does not change membership,
- a DuckDB/Trino oracle running the same SQL selects the same rows.

Mechanics: ``md5(seed || key)`` is uniform on [0, 16^6) over its first 6
hex chars; keeping rows whose prefix sorts below ``hex(rate * 16^6)``
keeps an expected ``rate`` fraction.  String comparison on the hex
prefix is identical in every engine (ASCII order).  All map-only — no
shuffle, no driver round-trip; the filter pushes into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 6
_SPACE = 16 ** _HEX_DIGITS


def _hash_prefix(key: Column, seed: str) -> Column:
    return F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, _HEX_DIGITS)


def _threshold_hex(rate: float) -> str:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * _SPACE), _SPACE - 1), f"0{_HEX_DIGITS}x")


def deterministic_sample(df: DataFrame, rate: float, key_col: str,
                         seed: str = "s0") -> DataFrame:
    """Keep an expected ``rate`` fraction of rows, decided per-key by
    hash — map-only, reproducible, partitioning-independent."""
    return df.filter(
        _hash_prefix(F.col(key_col), seed) < F.lit(_threshold_hex(rate))
    )


def stratified_sample(df: DataFrame, key_col: str, stratum_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      seed: str = "s0") -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample boilerplate 'web'
    docs to 1%, keep 'books' at 50%) — the class-balancing primitive of
    a training-data mix.  Still map-only: the stratum→threshold map
    compiles to a CASE expression, no join."""
    thr = F.lit(_threshold_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == stratum,
                     F.lit(_threshold_hex(rate))).otherwise(thr)
    return df.filter(_hash_prefix(F.col(key_col), seed) < thr)


def reservoir_sample(df: DataFrame, k: int, key_col: str,
                     stratum_col: str | None = None,
                     seed: str = "s0") -> DataFrame:
    """Exactly-k uniform sample (per stratum, if given) — deterministic
    reservoir: rank rows by their key hash and keep the k smallest.
    One shuffle on the stratum; with no stratum a two-level rank (local
    top-k per partition would also work, Spark's TakeOrderedAndProject
    already does that for the global case)."""
    order = (F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))),
             F.col(key_col))  # hash ties broken by key: total order
    if stratum_col is None:
        w = Window.orderBy(*order)
    else:
        w = Window.partitionBy(stratum_col).orderBy(*order)
    return (
        df.withColumn("__rs", F.row_number().over(w))
        .filter(F.col("__rs") <= k)
        .drop("__rs")
    )


def bucket_minhash_sample(df: DataFrame, key_col: str, k: int,
                          seed: str = "s0") -> DataFrame:
    """Deterministic k-row sample legal on a STREAM: rows route to one
    of ``k`` buckets by their key hash and each bucket keeps its
    MINIMUM-hash key — the bottom-k-sketch form of reservoir sampling
    re-expressed as a plain aggregation (count + min_by), so it runs
    unchanged as a complete-mode streaming aggregation with exactly k
    rows of state (:func:`reservoir_sample`'s global row_number window
    is not streaming-legal; this is the 100 TB/streaming shape).

    Uniformity: md5 is uniform per key, the bucket split is uniform,
    and within a bucket every key is equally likely to hold the
    minimum — so the k champions are a uniform-without-replacement
    sample of distinct keys, merge-associative across partitions AND
    micro-batches (min folds exactly).  Deterministic by (seed, key
    set): reruns, retries and SQL oracles replay the identical sample.

    Returns ``(bucket, n_rows, sample_key)`` ordered by bucket —
    ``n_rows`` the bucket's row count (the k counts also give an
    unbiased total estimate); join champions back to the table for
    payloads (a k-row lookup, never a scan).  NULL keys are dropped
    (md5 of NULL is NULL — they can neither bucket nor win; the
    split_by_key NULL-policy, applied eagerly here because a NULL
    champion row would masquerade as a real sample).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    df = df.filter(F.col(key_col).isNotNull())
    key = F.col(key_col)
    h = F.md5(F.concat(F.lit(seed), key.cast("string")))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("bigint"),
        F.lit(k))
    return (df.select(bucket.alias("bucket"), h.alias("__h"),
                      key.alias("__k"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min_by("__k", F.struct(F.col("__h"), F.col("__k")))
                 .alias("sample_key"))
            .orderBy("bucket"))


def deterministic_shuffle(df: DataFrame, key_col: str, seed: str = "s0",
                          num_shards: int | None = None) -> DataFrame:
    """Reproducible global shuffle for training-data sharding: every row
    gets a content-independent pseudo-random position md5(seed||key),
    rows land in ``num_shards`` hash shards sorted by that position
    within each shard.

    Properties a training run needs, all by construction:

    - **reproducible** — same (seed, keys) → identical shard contents
      and order, on any cluster size or input partitioning;
    - **epoch reshuffle** — change ``seed`` and the order is a fresh
      permutation, no data movement logic to rewrite;
    - **scale-safe** — one hash-partition exchange + in-partition sort
      (sortWithinPartitions); there is NO global sort barrier, because
      inter-shard order is irrelevant to a sharded reader.

    Returns the input columns plus ``shard``.  Write with
    ``.write.partitionBy("shard")`` (or directly, one file per shard) to
    produce the consumable training shards.
    """
    # coalesce NULL keys to a sentinel: md5(NULL) is NULL, which would send
    # the row to a NULL shard (outside the 0..n-1 contract) and, under
    # partitionBy writes, into a silent hive default partition
    h = F.md5(F.concat(
        F.lit(seed),
        F.coalesce(F.col(key_col).cast("string"), F.lit("\x00<null-key>"))))
    n = num_shards or df.sparkSession.sparkContext.defaultParallelism
    with_pos = df.withColumn("_pos", h).withColumn(
        "shard",
        F.pmod(F.conv(F.substring("_pos", 1, 12), 16, 10).cast("bigint"),
               F.lit(n)).cast("int"),
    )
    return (
        with_pos.repartition(n, "shard")
        .sortWithinPartitions("shard", "_pos")
        .drop("_pos")
    )


def quota_per_key(df: DataFrame, quota_col: str, n: int, key_col: str,
                  seed: str = "s0", local_prefilter: bool = True) -> DataFrame:
    """Cap rows per ``quota_col`` value at ``n`` — the per-domain /
    per-source quota step of a corpus mix (keep at most n docs per
    domain so one crawl host cannot dominate the training set).

    Which n survive is deterministic: rows rank by ``md5(seed || key)``
    (ties broken by the key itself), so membership is a pure function of
    (seed, key) — reproducible on any cluster size / partitioning, and
    a DuckDB oracle running row_number over the same md5 picks the same
    rows.

    Scale: the exact rank needs one shuffle on ``quota_col``.  Before
    it, ``local_prefilter`` runs a map-side per-batch top-n (Arrow
    batches, vectorized pandas nsmallest) — every batch forwards at most
    n rows per quota value it contains, so a hot domain with 10M rows
    ships O(n × batches-touching-it) rows through the exchange instead
    of 10M.  The prefilter is lossless: the global n smallest hashes
    within a key are each among the n smallest of their own batch.
    """
    rank_src = F.md5(F.concat(
        F.lit(seed), F.coalesce(F.col(key_col).cast("string"), F.lit("\x00"))))
    staged = df.withColumn("__qh", rank_src)
    if local_prefilter:
        import pandas as pd  # noqa: F401

        schema = staged.schema

        def _local_topn(batches):
            for pdf in batches:
                if len(pdf) > n:
                    # dropna=False: pandas groupby silently DROPS the NaN
                    # group by default — NULL quota keys are a legitimate
                    # group (the exact window ranks them too) and must
                    # survive the prefilter
                    pdf = (pdf.sort_values(["__qh", key_col], kind="mergesort")
                              .groupby(quota_col, sort=False,
                                       dropna=False).head(n))
                yield pdf

        staged = staged.mapInPandas(_local_topn, schema)
    w = Window.partitionBy(quota_col).orderBy(F.col("__qh"), F.col(key_col))
    return (
        staged.withColumn("__qr", F.row_number().over(w))
        .filter(F.col("__qr") <= n)
        .drop("__qh", "__qr")
    )


def split_by_key(df: DataFrame, key_col: str, fractions: dict[str, float],
                 seed: str = "s0", split_col: str = "split") -> DataFrame:
    """Deterministic train/validation/test split: label every row with a
    split name, decided by which cumulative band of the [0, 16^6) hash
    space ``md5(seed || key)``'s prefix falls in.

    Group-leakage-safe by construction: all rows sharing ``key_col``
    (e.g. a URL host, a user id) land in the SAME split, because the
    decision is a function of the key alone — the property a training
    pipeline needs so near-identical group members never straddle
    train/test.  Map-only, no shuffle; fractions must sum to ≤ 1 (any
    remainder gets NULL, i.e. "held out entirely").  A NULL key also
    yields a NULL split (md5 of NULL is NULL — both engines agree);
    coalesce upstream if NULL-keyed rows must be assigned.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    prefix = _hash_prefix(F.col(key_col), seed)
    expr = F.lit(None).cast("string")
    cum = 0.0
    bands = []
    for name, frac in fractions.items():
        lo, cum = cum, cum + frac
        # 'g' sorts after every hex digit: a band reaching 1.0 is all-inclusive
        hi_hex = "g" if cum >= 1.0 - 1e-12 else _threshold_hex(cum)
        bands.append((name, _threshold_hex(lo), hi_hex))
    for name, lo_hex, hi_hex in reversed(bands):
        expr = F.when((prefix >= F.lit(lo_hex)) & (prefix < F.lit(hi_hex)),
                      F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def kfold_split(df: DataFrame, key_col: str, k: int,
                seed: str = "s0", fold_col: str = "fold") -> DataFrame:
    """Deterministic k-fold cross-validation assignment: label every row
    with an INTEGER fold in ``[0, k)`` from equal cumulative bands of
    the ``md5(seed || key)`` hash space — the k-way generalization of
    :func:`split_by_key` (same arithmetic, same hex-band compare, so a
    SQL oracle reproduces it bit-for-bit).

    Group-leakage-safe like split_by_key: all rows sharing the key land
    in the same fold, so grouped examples never straddle a fold
    boundary during cross-validation.  Map-only — the CASE chain pushes
    into the scan; NULL keys get a NULL fold.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    named = split_by_key(
        df, key_col, {str(i): 1.0 / k for i in range(k)},
        seed=seed, split_col=fold_col)
    return named.withColumn(fold_col, F.col(fold_col).cast("int"))


def target_encode_oof(df: DataFrame, category_col: str, label_col: str,
                      key_col: str, k: int = 5, seed: str = "s0",
                      smoothing: float = 20.0,
                      round_digits: int = 6) -> DataFrame:
    """Out-of-fold target encoding (the leakage-controlled categorical
    feature: Micci-Barreca 2001 smoothing + the k-fold discipline): for
    each (fold, category) cell, the label mean computed from EVERY FOLD
    BUT THIS ONE, shrunk toward the global mean,

        enc(f, c) = (Σ_{oof} y + m · ȳ) / (n_{oof} + m)

    — a fold's rows never see their own labels, so the encoding can be
    joined onto training data without target leakage (the naive
    per-category mean leaks each row's own label and overfits rare
    categories; ``m`` is the prior weight that protects them).  Folds
    come from :func:`kfold_split` (md5-banded, group-leakage-safe,
    engine-replayable).

    Scale shape: ONE aggregate over the table to the (fold, category)
    grid — k·|categories| rows — then window totals on that tiny grid;
    label sums are DECIMAL(18,6)-exact (order-free), the encoding a
    fixed-order double expression.  The caller broadcasts the returned
    grid back onto the data (a k·|C|-row dimension, never a shuffle).

    Returns ``(fold, category, n_fold, n_oof, encoding)`` ordered by
    (fold, category) — ``encoding`` NULL only when n_oof + m = 0.
    """
    if smoothing < 0.0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    folds = kfold_split(df, key_col, k, seed)
    y = F.col(label_col).cast("double")
    cells = (folds.groupBy(F.col("fold"),
                           F.col(category_col).alias("category"))
             .agg(F.count(y).alias("n_fold"),
                  F.sum(y.cast("decimal(18,6)")).alias("__s")))
    w_cat = Window.partitionBy("category")
    w_all = Window.partitionBy()
    tot_n = F.sum("n_fold").over(w_cat)
    tot_s = F.sum("__s").over(w_cat)
    g_n = F.sum("n_fold").over(w_all)
    g_s = F.sum("__s").over(w_all)
    oof_n = (tot_n - F.col("n_fold")).cast("double")
    oof_s = (tot_s - F.col("__s")).cast("double")
    prior = g_s.cast("double") / g_n.cast("double")
    m = F.lit(float(smoothing))
    enc = F.when(oof_n + m > 0.0, (oof_s + m * prior) / (oof_n + m))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (cells.select("fold", "category", "n_fold",
                         (tot_n - F.col("n_fold")).alias("n_oof"),
                         r6(enc).alias("encoding"))
            .orderBy("fold", "category"))


def weighted_sample(df: DataFrame, rate: float, weight: Column | str,
                    key_col: str, seed: str = "s0") -> DataFrame:
    """Importance-weighted Bernoulli sampling: keep each row with
    probability ``min(1, rate × weight)`` — the selection step that
    consumes :func:`~hazelcast_jet_spark.operators.importance.dsir_weights`
    -style scores (sample high-value documents proportionally more,
    boilerplate proportionally less, with expected kept mass
    ``rate × Σ min(weight, 1/rate)``).

    Deterministic and engine-portable like everything in this module:
    the per-row uniform is the 6-hex-digit md5 prefix, and the per-row
    threshold is rendered AS A HEX STRING (``lpad(hex(floor(p·16⁶)))``)
    so the keep decision is a pure string comparison both Spark and a
    SQL oracle evaluate identically — no float RNG, no engine rand().
    Weights must be reproducible doubles (derived from row columns by
    IEEE arithmetic); NULL or negative weights never keep.

    Map-only: no shuffle, no join — the CASE/compare pushes into the
    scan.  Composes with :func:`split_by_key` (split first, then weight-
    sample within the train split) and :func:`deterministic_shuffle`.
    """
    if rate < 0.0:
        raise ValueError(f"rate must be >= 0, got {rate}")
    w = F.col(weight) if isinstance(weight, str) else weight
    # clamp to [0, 1]: a negative p would hex-render as two's-complement
    # 'ffff…' and keep nearly everything.  NULL needs an explicit guard —
    # least/greatest SKIP nulls (both engines), so least(1.0, NULL) is 1.0
    # and an unguarded NULL weight would keep every row
    raw = w * F.lit(float(rate))
    p = F.when(raw.isNull(), F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw)))
    # floor(p·16⁶) truncated to bigint (p ≥ 0 so cast == floor), rendered
    # as a 6-digit lowercase hex threshold; p == 1 keeps unconditionally
    # (the string compare alone would lose the single 'ffffff' row)
    thr = F.lpad(F.lower(F.hex((p * F.lit(float(_SPACE))).cast("bigint"))),
                 _HEX_DIGITS, "0")
    u = _hash_prefix(F.col(key_col), seed)
    return df.filter((p >= 1.0) | (u < thr))


def temperature_sample(df: DataFrame, group_col: str, key_col: str,
                       alpha: float = 0.5, seed: str = "t0") -> DataFrame:
    """Language/source-balanced temperature sampling: keep rows so the
    sampled group mix follows ``p_g ∝ n_g^alpha`` instead of the raw
    ``n_g`` (the UniMax / multilingual-temperature recipe, T = 1/alpha
    — alpha < 1 flattens the head, boosting low-resource groups'
    relative share).  The per-group keep rate is

        ``rate_g = (n_min / n_g)^(1 - alpha)``

    normalized so the SMALLEST group keeps everything (rate 1) and each
    larger group is downsampled toward the tempered mix.

    Determinism and engine portability: the per-row uniform is the md5
    hex prefix of ``key_col`` (same as every sampler in this module).
    For the default ``alpha = 0.5`` the rate is ``sqrt(n_min / n_g)`` —
    IEEE division and square root are both correctly rounded, so the
    rate doubles (and therefore the hex thresholds) are BIT-IDENTICAL
    in any engine and the op can sit under an exact-hash gate.  Other
    alphas go through ``pow``, which is not correctly rounded by
    standard libms — fine in production, not exact-gate-safe.

    Plan at scale: one tiny aggregate (a row per group), ``n_min``
    derived by an unpartitioned window over that ≤|groups|-row table
    (in-plan, no driver round-trip), then a BROADCAST join of the
    rates back — the corpus itself is never shuffled; the keep filter
    is a map-only string compare.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    from pyspark.sql.functions import broadcast

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy()  # ≤|groups| rows: a single-task window is fine
    ratio = F.min("_n").over(w).cast("double") / F.col("_n").cast("double")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    rates = counts.select(group_col, rate.alias("_rate"))
    out = df.join(broadcast(rates), group_col)
    thr = F.lpad(F.lower(F.hex(
        (F.col("_rate") * F.lit(float(_SPACE))).cast("bigint"))),
        _HEX_DIGITS, "0")
    u = _hash_prefix(F.col(key_col), seed)
    return out.filter((F.col("_rate") >= 1.0) | (u < thr)).drop("_rate")


def negative_sample(positives: DataFrame, items: DataFrame, k: int,
                    key_col: str, item_col: str, seed: str = "n0",
                    broadcast_items_max: int = 5_000_000) -> DataFrame:
    """Deterministic negative sampling for contrastive training: attach
    ``k`` pseudo-random candidate items to every positive row — the
    (anchor, positive, negatives…) batch builder for embedding /
    retrieval training, without any engine ``rand()`` (reruns, retries
    and the SQL oracle all draw the SAME negatives).

    Draw j for a row is the item at index ``md5(seed‖j‖':'‖key) mod n``
    of the item table ordered by ``item_col`` — md5 prefix to integer is
    the same portable arithmetic as the count-min coordinates.  A draw
    that collides with the row's OWN item (``item_col`` on the positive
    side) is DROPPED, not remapped — expected loss k/n per row, and the
    convention an oracle can replay with one filter.

    Plan: the item table is indexed once (row_number over the item
    order — a single-partition window, fine for item/vocabulary tables;
    at billion-item scale pre-assign dense ids upstream), then each
    positive explodes to k (j, idx) probes and equi-joins the index —
    broadcast when ``n ≤ broadcast_items_max``, shuffle otherwise.  The
    item count reaching the driver is one long.

    Returns the positive's ``(key_col, item_col)`` plus ``(j,
    negative)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    indexed = items.select(F.col(item_col).alias("__item")).distinct() \
        .select(F.col("__item"),
                (F.row_number().over(Window.orderBy("__item")) - 1)
                .alias("__idx"))
    indexed = indexed.localCheckpoint()
    n = indexed.count()
    if n < 2:
        raise ValueError("need at least 2 distinct items")
    if n <= broadcast_items_max:
        indexed = F.broadcast(indexed)
    probes = positives.select(
        key_col, item_col,
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j"))
    draw = (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(seed), F.col("j").cast("string"),
                           F.lit(":"), F.col(key_col).cast("string"))),
            1, 12), 16, 10).cast("bigint") % F.lit(n)
    ).alias("__idx")
    return (
        probes.select(key_col, item_col, "j", draw)
        .join(indexed, "__idx")
        .filter(F.col("__item") != F.col(item_col))
        .select(key_col, item_col, "j", F.col("__item").alias("negative"))
    )


#: cumulative Poisson(1) probabilities for the bootstrap inverse-CDF
#: (math.exp sums computed once in Python; the tail clamps at k=8 —
#: P(k>8) < 1e-6, negligible for replicate statistics)
_POIS1_CUM = None


def _pois1_thresholds() -> list[str]:
    global _POIS1_CUM
    if _POIS1_CUM is None:
        import math

        p, cum, out = math.exp(-1.0), 0.0, []
        for k in range(9):
            cum += p
            out.append(format(min(int(cum * _SPACE), _SPACE - 1),
                              f"0{_HEX_DIGITS}x"))
            p /= (k + 1)
        _POIS1_CUM = out
    return _POIS1_CUM


def bootstrap_sums(df: DataFrame, value_col: str, key_col: str,
                   n_reps: int = 20, seed: str = "boot") -> DataFrame:
    """Deterministic Poisson bootstrap (Chamandy et al. 2012, "Estimating
    uncertainty for massive data streams"): ``n_reps`` resampled
    sums/counts of a column, giving ERROR BARS for any downstream
    aggregate without a second scan or any engine ``rand()`` —

        k_r(row) ~ Poisson(1)  via inverse CDF on the md5-hex uniform
                   of (seed, rep, key)

    so each replicate re-weights every row by an iid Poisson(1) count,
    the classic scan-friendly approximation of the multinomial
    bootstrap.  Deterministic hashing means reruns, retries, AND a SQL
    oracle draw the identical replicates (the same md5-threshold
    convention as every sampler here; tail clamped at k=8,
    P(k>8) < 1e-6).

    Plan at scale: ONE aggregate pass — all ``n_reps`` replicate counts
    derive per row from literal hex-threshold CASE chains and combine
    map-side; the result is 2·n_reps scalars, unpivoted to
    ``(rep, n_eff, sum_v)``.  NULL values count toward ``n_eff`` but
    add 0 to ``sum_v`` (the same convention as a plain SUM over the
    resample).

    The replicate spread estimates the sampling distribution:
    ``std(sum_v)`` across reps ≈ the standard error of the total.
    """
    if n_reps < 2:
        raise ValueError("need n_reps >= 2")
    from hazelcast_jet_spark.session import ensure_parallelism

    # n_reps md5 draws per row is CPU-heavy map work: a one-row-group
    # parquet scan would serialize it on a single task (r6 bench: 8.4 s
    # -> 2.8 s on 32 tasks at sf0.1); no-op on an already-split scan
    df = ensure_parallelism(df)
    # hex prefix -> integer ONCE per (row, rep), compared against integer
    # thresholds, and the k_r draws STAGED as a projection so each one is
    # evaluated once instead of once per aggregate that mentions it
    # (string-threshold CASEs inside the aggregate were 2.8 s warm at
    # sf0.1; this shape is 1.5 s — same k values: fixed-width lowercase
    # hex ordering IS the integer ordering, so the oracle is untouched)
    thr_int = [int(t, 16) for t in _pois1_thresholds()]
    v = F.col(value_col).cast("double")
    # r13: stage the md5 uniform ONCE per (row, rep) — the previous
    # 8-deep CASE chain re-embedded the conv(md5(...)) subexpression in
    # every branch (up to 8 evaluations per draw in the before-plan's
    # 40 KB projection, which also blew past codegen so each branch
    # re-ran interpreted), and derive k BRANCHLESSLY as the count of
    # thresholds <= u — the same inverse-CDF integer (k = #{i: u >=
    # thr_i}, clamped at 8 by construction), now 8 comparisons + adds
    # in whole-stage codegen over one md5 per draw.
    u_cols = [
        F.conv(_hash_prefix(F.col(key_col), f"{seed}:{r}:"), 16, 10)
        .cast("long").alias(f"__u{r}")
        for r in range(n_reps)
    ]
    staged_u = df.select(v.alias("__v"), *u_cols)
    kcols = []
    for r in range(n_reps):
        u = F.col(f"__u{r}")
        k = (u >= F.lit(thr_int[0])).cast("int")
        for i in range(1, 8):
            k = k + (u >= F.lit(thr_int[i])).cast("int")
        kcols.append(k.cast("bigint").alias(f"__k{r}"))
    staged = staged_u.select("__v", *kcols)
    aggs = []
    for r in range(n_reps):
        k = F.col(f"__k{r}")
        aggs.append(F.sum(k).alias(f"__n{r}"))
        aggs.append(F.sum((k.cast("double")
                           * F.coalesce(F.col("__v"), F.lit(0.0)))
                          .cast("decimal(28,6)")).alias(f"__s{r}"))
    one = staged.agg(*aggs)
    stack = ", ".join(
        f"{r}, __n{r}, CAST(__s{r} AS DOUBLE)" for r in range(n_reps))
    return one.selectExpr(
        f"stack({n_reps}, {stack}) AS (rep, n_eff, sum_v)"
    ).select(F.col("rep").cast("int").alias("rep"), "n_eff", "sum_v")


def waterfill_allocation(
    df: DataFrame,
    group_col: str,
    size_col: str,
    budget_frac: float,
    round_digits: int = 6,
) -> DataFrame:
    """Training-mixture budget allocator: split a total token budget
    ``budget_frac * sum(size)`` across sources by WATER-FILLING — every
    source gets ``min(capacity, theta)`` where the common fill level
    theta solves ``sum(min(c_i, theta)) = budget``.  Small sources are
    taken whole; big ones are capped at theta: the max-min-fair mixture
    that up-weights scarce domains without oversampling any of them
    (the flat-cap special case of DoReMi-style reweighting, computed
    exactly).

    theta has a CLOSED FORM over capacities sorted ascending: with
    prefix sums ``P_i`` and ``r_i = n - i + 1`` sources remaining,
    ``theta = (B - P_{i-1}) / r_i`` at the FIRST i where that candidate
    is <= c_i (all earlier sources saturate); if even the last candidate
    exceeds c_n the budget covers everything and every rate is 1.

    Plan at scale: capacities aggregate once (the group dimension is
    tiny — sources, domains, languages); the sorted-prefix window, the
    theta pick and the per-group allocation all run on that
    groups-bounded table; the corpus itself is touched by the ONE
    capacity aggregate only.  Prefix sums are exact BIGINTs; theta and
    the rates are fixed-order double quotients — a SQL oracle replays
    them bit-for-bit.

    Returns ``(group_col, capacity, alloc, rate)`` ordered by group;
    ``sum(alloc)`` equals the budget whenever capacities cover it
    (up to one final double rounding).
    """
    if not 0.0 < budget_frac <= 1.0:
        raise ValueError("budget_frac must be in (0, 1]")
    # the capacity table is groups-bounded (tiny); checkpoint it so the
    # theta branch and the allocation branch don't each re-scan the
    # corpus through the duplicated aggregate lineage
    caps = df.groupBy(group_col).agg(
        F.sum(F.col(size_col).cast("long")).alias("capacity"),
    ).localCheckpoint(eager=True)
    w = Window.orderBy("capacity", group_col)
    tot = Window.partitionBy()
    ranked = caps.select(
        group_col, "capacity",
        F.row_number().over(w).alias("__i"),
        (F.sum("capacity").over(
            w.rowsBetween(Window.unboundedPreceding, -1))).alias("__pfx"),
        F.count(F.lit(1)).over(tot).alias("__n"),
        F.sum("capacity").over(tot).alias("__tot"),
    ).withColumn("__pfx", F.coalesce("__pfx", F.lit(0)))
    budget = F.col("__tot").cast("double") * F.lit(float(budget_frac))
    cand = (budget - F.col("__pfx").cast("double")) \
        / (F.col("__n") - F.col("__i") + 1).cast("double")
    with_cand = ranked.withColumn("__cand", cand)
    theta_row = (
        with_cand.filter(F.col("__cand") <= F.col("capacity").cast("double"))
        .groupBy().agg(F.min_by("__cand", "__i").alias("__theta"))
    )
    out = with_cand.crossJoin(F.broadcast(theta_row))
    alloc = F.when(
        F.col("__theta").isNull(),  # budget >= total: take everything
        F.col("capacity").cast("double"),
    ).otherwise(F.least(F.col("capacity").cast("double"), F.col("__theta")))
    rate = F.when(F.col("capacity") > 0,
                  F.round(alloc / F.col("capacity").cast("double"),
                          round_digits))
    return out.select(
        group_col, "capacity",
        F.round(alloc, round_digits).alias("alloc"),
        rate.alias("rate"),
    ).orderBy(group_col)


def top_mass_selection(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    order_col: str,
    p: float,
    round_digits: int = 6,
) -> DataFrame:
    """Nucleus-style (top-p) selection per group: walk rows in
    ``(weight desc, order_col)`` order and keep the SHORTEST prefix
    whose weight reaches fraction ``p`` of the group's total — "keep
    the highest-quality documents carrying 50% of the token mass", the
    budget-pruning rule that adapts to each group's concentration
    instead of a fixed top-k or a fixed rate (a skewed source keeps few
    rows, a flat one keeps many).

    A row is kept iff the mass STRICTLY BEFORE it is < p * total —
    the crossing row is included, so kept mass >= p exactly like
    nucleus sampling.  All comparisons are exact integer arithmetic
    (``before * 1 < p`` rearranged as ``before < p * total`` evaluated
    in double would round; instead both sides stay integral:
    ``before * DENOM < NUM * total`` with p = NUM/DENOM) — the
    selection is engine-exact, no float boundary anywhere.

    Plan at scale: ONE exchange on the group key serves the ordering
    window, the exclusive running sum and the final per-group
    aggregate.  Weights are summed as BIGINTs.

    Returns ``(group_col, n_rows, n_kept, total_w, kept_w,
    kept_frac)`` per group.
    """
    from fractions import Fraction

    frac = Fraction(p).limit_denominator(10 ** 9)
    num, den = frac.numerator, frac.denominator
    w = Window.partitionBy(group_col).orderBy(
        F.col(weight_col).desc(), F.col(order_col))
    wt = F.col(weight_col).cast("long")
    ranked = (
        df.filter(F.col(weight_col).isNotNull())
        .withColumn("__before", F.coalesce(
            F.sum(wt).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)))
        .withColumn("__tot", F.sum(wt).over(
            Window.partitionBy(group_col)))
    )
    keep = (F.col("__before") * F.lit(den)) < (F.lit(num) * F.col("__tot"))
    return (
        ranked.groupBy(group_col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.max("__tot").alias("total_w"),
            F.sum(F.when(keep, wt).otherwise(F.lit(0))).alias("kept_w"),
        )
        .select(
            group_col, "n_rows", "n_kept", "total_w", "kept_w",
            F.round(F.col("kept_w").cast("double")
                    / F.col("total_w").cast("double"),
                    round_digits).alias("kept_frac"))
        .orderBy(group_col)
    )


def budget_sample(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    budget: int,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Deterministic per-stratum BUDGET sampling: walk each stratum's
    rows in md5(seed||key) order (a reproducible uniform shuffle) and
    keep rows while the running weight BEFORE the row is under
    ``budget`` — the crossing row is included (the pack/top-mass
    crossing convention), so every non-empty stratum yields at least
    one row and the kept mass is >= min(budget, stratum mass).

    This is the selection step that CONSUMES a per-source token budget
    (e.g. :func:`waterfill_allocation`'s output): where
    ``stratified_sample`` keeps a fixed FRACTION of rows and
    ``top_mass_selection`` keeps the biggest-first mass prefix, this
    keeps a budget's worth of UNIFORMLY drawn content.

    One exchange on the stratum; the running sum is exact BIGINT; the
    keep predicate is integer-only (no float boundary).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    order = _hash_prefix(F.col(key_col), seed)
    w = (Window.partitionBy(stratum_col)
         .orderBy(order, F.col(key_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.coalesce(F.sum(F.col(weight_col).cast("bigint")).over(w),
                       F.lit(0).cast("bigint"))
    return (df.withColumn("__prior", prior)
            .filter(F.col("__prior") < budget)
            .drop("__prior"))


def sample_audit(full: DataFrame, sample: DataFrame, stratum_col: str,
                 value_col: str, round_digits: int = 6) -> DataFrame:
    """Representativeness audit of a sample against its source frame:
    per stratum, the realized sampling rate and the full-vs-sample mean
    of a value column — the QA step that runs after EVERY sampling
    stage of a data mix (a deterministic sampler is still the wrong
    sampler if a stratum's realized rate or value profile drifts from
    the plan).

    Two independent per-stratum rollups (each one aggregate over its
    frame) joined on the bounded stratum table; means are decimal-exact
    then one rounded double division.  Strata absent from the sample
    report 0 sampled rows and NULL means (explicit on both engine and
    oracle).

    Returns ``(stratum, n_full, n_sample, observed_rate,
    mean_value_full, mean_value_sample, mean_abs_diff)`` ordered.
    """
    def _roll(df: DataFrame, n_name: str, m_name: str) -> DataFrame:
        cnt = F.count(F.lit(1))
        return df.groupBy(F.col(stratum_col).alias("stratum")).agg(
            cnt.alias(n_name),
            (F.round(F.sum(F.col(value_col).cast("decimal(28,12)"))
                     .cast("double") / cnt.cast("double"), round_digits)
             + F.lit(0.0)).alias(m_name))

    f = _roll(full, "n_full", "mean_value_full")
    s = _roll(sample, "__n_s", "mean_value_sample")
    j = f.join(s, "stratum", "left")
    return (j.select(
        "stratum", "n_full",
        F.coalesce(F.col("__n_s"), F.lit(0)).alias("n_sample"),
        (F.round(F.coalesce(F.col("__n_s"), F.lit(0)).cast("double")
                 / F.col("n_full").cast("double"), round_digits)
         + F.lit(0.0)).alias("observed_rate"),
        "mean_value_full", "mean_value_sample",
        (F.round(F.abs(F.col("mean_value_full")
                       - F.col("mean_value_sample")), round_digits)
         + F.lit(0.0)).alias("mean_abs_diff"))
        .orderBy("stratum"))
