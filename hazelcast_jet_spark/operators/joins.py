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


def asof_join(left: DataFrame, right: DataFrame, key: str, time_col: str,
              value_cols: list[str] | None = None,
              right_time_col: str | None = None,
              direction: str = "backward",
              tolerance: int | float | None = None) -> DataFrame:
    """As-of join: each left row picks the RIGHT row with the greatest
    right-time ≤ its time (``direction="backward"``, the default) or the
    smallest right-time ≥ its time (``"forward"``), per key — the
    time-series enrichment join Spark lacks natively (DuckDB/Pandas
    ``ASOF JOIN`` semantics, bound-inclusive either way).

    Spark-first shape — ONE shuffle, no range join, no per-row probe:
    tag both sides, union, and carry the latest right values forward with
    ``last_value(..., ignoreNulls) OVER (PARTITION BY key ORDER BY time,
    side ROWS UNBOUNDED PRECEDING)``; left rows then read the running
    value.  Right rows sort before left rows at equal times (side 0 < 1),
    which implements the ≤ bound.  At 100 TB this is a single sort-merge
    window over (key, time) — the same cost as any keyed window — where a
    naive range join would explode candidates per key.

    ``value_cols`` default: every right column except the key and time.
    If several right rows share (key, time), the greatest value per
    column wins (made deterministic by a pre-aggregation) — disambiguate
    upstream if another rule is needed.

    ``tolerance`` (pandas ``merge_asof`` parity): a match farther than
    this from the left time yields NULLs instead — in SECONDS for
    timestamp time columns, in the column's own units for numerics.
    Same one-window plan; the matched right time rides along and a
    map-only post-filter nulls the too-far matches.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rtc = right_time_col or time_col
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (key, rtc)]
    # deterministic ties: right rows sharing (key, time) all carry the
    # per-column MAX of their tie group.  r13: computed as a window max
    # over (key, time, side) AFTER the union instead of a pre-union
    # groupBy — the groupBy cost its own full exchange of the right
    # side; the tie window runs on the SAME hash(key) exchange + sort
    # the carry window needs (guide §2.4 "two operations keyed the same
    # way share one exchange").  Every tie row carries the identical
    # group max, so the carried value — and the left-row output — is
    # bit-identical to the pre-aggregated form.
    r = right.select(F.col(key), F.col(rtc).alias(time_col), *value_cols)
    carry_cols = list(value_cols)
    if tolerance is not None:
        carry_cols.append("__t")
        r = r.withColumn("__t", F.col(time_col))
    rtypes = dict(r.dtypes)
    lt = left.withColumn("_side", F.lit(1)).withColumns(
        {f"_r_{c}": F.lit(None).cast(rtypes[c]) for c in carry_cols}
    )
    rt = r.select(
        F.col(key), F.col(time_col), F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carry_cols],
    )
    lt_cols = [c for c in lt.columns]
    unioned = rt.unionByName(lt.select(*lt_cols), allowMissingColumns=True)
    # ONE explicit hash(key) exchange serves both windows: it satisfies
    # the tie window's clustered-(key, time, side) requirement and the
    # carry window's clustered-(key); without it EnsureRequirements
    # plans hash(key, time, _side) for the ties and a SECOND hash(key)
    # for the carry.  Left-row partitions (side 1) contain no right
    # values, so their tie-max stays NULL.
    w_ties = Window.partitionBy(key, time_col, "_side")
    unioned = unioned.repartition(F.col(key)).select(
        *[c for c in unioned.columns if not c.startswith("_r_")],
        *[F.max(f"_r_{c}").over(w_ties).alias(f"_r_{c}")
          for c in carry_cols],
    )
    # forward = the same carry trick over DESCENDING time: the nearest
    # right row with time >= left time is the "last seen" one when walking
    # from the future backwards.  _side 0 < 1 keeps the bound inclusive at
    # equal times in both directions.
    time_order = F.col(time_col).asc() if direction == "backward" else F.col(time_col).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(time_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if not c.startswith("_r_") and c != "_side"],
        F.col("_side"),
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in carry_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        if rtypes["__t"].startswith("timestamp"):
            gap = F.abs(
                (F.col(time_col) - F.col("_rv___t")).cast("long"))
        else:
            gap = F.abs(F.col(time_col) - F.col("_rv___t"))
        keep = F.col("_rv___t").isNotNull() & (gap <= F.lit(tolerance))
        for c in value_cols:
            out = out.withColumn(
                f"_rv_{c}", F.when(keep, F.col(f"_rv_{c}")))
        out = out.drop("_rv___t", "_r___t")
    for c in value_cols:
        # avoid colliding with a same-named left column (e.g. both sides
        # carrying "value"): the joined-in column gets an asof_ prefix
        final = c if c not in left.columns else f"asof_{c}"
        out = out.withColumnRenamed(f"_rv_{c}", final).drop(f"_r_{c}")
    return out


def range_join(points: DataFrame, ranges: DataFrame, point_col: str,
               start_col: str, end_col: str, bin_width: float,
               extra_cond: Column | None = None) -> DataFrame:
    """Range (interval-containment) join: each point row matched to every
    range row with ``start <= point < end`` — the second custom join the
    reference-era engines special-case and Spark lacks (a naive
    non-equi join plans as BroadcastNestedLoop/cartesian and explodes at
    scale).

    Spark-first shape: bucketize.  Points map to ``floor(point/bin)``
    (map-only); ranges EXPLODE to every bin they overlap (``sequence``
    over the bin span); the join is then a plain EQUI-join on the bin id
    with the exact predicate as a residual filter — shuffle-partitioned,
    AQE-skew-splittable, never quadratic.  Pick ``bin_width`` near the
    typical range length: expansion factor = avg(range_len/bin_width)+1
    bins per range row.

    ``extra_cond`` adds an equi/theta residual (e.g. same-key ranges).
    Points whose value matches no range are dropped (inner join).
    """
    bw = float(bin_width)
    p = points.withColumn("_bin", F.floor(F.col(point_col) / bw).cast("long"))
    r = ranges.withColumn(
        "_bin",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / bw).cast("long"),
            # end is exclusive: a range ending exactly on a bin edge does
            # not reach into that bin — ceil(end/bw)-1 is that last bin,
            # exactly, with no epsilon
            F.ceil(F.col(end_col) / bw).cast("long") - 1,
        )),
    )
    cond = (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    if extra_cond is not None:
        cond = cond & extra_cond
    return p.join(r, "_bin").filter(cond).drop("_bin")


def _deletion_variants(col: Column) -> Column:
    """The string plus every single-character deletion of it (FastSS
    k=1 neighborhood) — all JVM expressions."""
    big = 1 << 20
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(col.substr(F.lit(1), i - 1), col.substr(i + 1, F.lit(big))),
    )
    return F.array_distinct(F.concat(F.array(col), dels))


def fuzzy_join(left: DataFrame, right: DataFrame, left_col: str,
               right_col: str | None = None) -> DataFrame:
    """Edit-distance-≤1 string join WITHOUT a cross join (FastSS deletion
    neighborhoods, Bocek et al. 2007 — no reference analog; the
    entity-resolution / typo-matching extension).

    Two strings are within Levenshtein distance 1 iff they share a
    member of each other's single-deletion neighborhood (equal strings
    share the original; one substitution ⇒ both strings minus the
    differing position agree; one insertion/deletion ⇒ the longer minus
    the extra char equals the shorter) — so candidate generation is an
    EQUI-join on exploded variants: each side shuffles O(rows × (len+1))
    short strings, never the |L|×|R| pair space.  Candidates are then
    re-verified with an exact ``levenshtein() <= 1`` filter (drops the
    distance-2 false positives deletion sharing admits, e.g. 'ab'~'ba'
    via 'a'... sharing both-side deletions) and deduplicated.

    Returns the distinct matching pairs ``(left_col, right_col)`` —
    join back on these keys to recover full rows.

    Sized for SHORT keys (names, titles, codes, URLs): the variant
    explode is O(len²) bytes per distinct string, so a 20-char key costs
    ~21 short strings while a 10 KB document would cost ~10^8 bytes —
    for near-dup detection on long text use the dedup family
    (minhash/simhash/winnowing), not an edit-distance join.
    """
    right_col = right_col or left_col
    lv = left.select(F.col(left_col).alias("_l")).distinct().select(
        "_l", F.explode(_deletion_variants(F.col("_l"))).alias("_v"))
    rv = right.select(F.col(right_col).alias("_r")).distinct().select(
        "_r", F.explode(_deletion_variants(F.col("_r"))).alias("_v"))
    return (
        lv.join(rv, "_v")
        .select(F.col("_l").alias(left_col), F.col("_r").alias(right_col))
        .distinct()
        .filter(F.levenshtein(left_col, right_col) <= 1)
    )


def _bloom_position(col: Column, i: int, m: int, seed: str) -> Column:
    """Hash i of the Bloom family: xxhash64 seeded per-i, reduced mod m.
    xxhash64 is a JVM intrinsic ~10× cheaper than an md5 hex pipeline —
    and unlike the dedup signatures, Bloom positions never need
    cross-engine portability (the oracle is the PLAIN semi join), so the
    cheap hash is the right one for a filter evaluated on every big-side
    row.  Deterministic on every executor, independent of partitioning."""
    h = F.xxhash64(F.lit(f"{seed}:{i}"),
                   F.coalesce(col.cast("string"), F.lit("\x00")))
    return F.pmod(h, F.lit(m))


def bloom_prune(big: DataFrame, keys: DataFrame, big_key: str, keys_key: str,
                m: int = 1 << 20, num_hashes: int = 3,
                seed: str = "bloom0") -> DataFrame:
    """Bloom-filter pre-filter for a semi join whose key side is too big
    to broadcast raw: keep only ``big`` rows that *might* match a key in
    ``keys`` (false positives possible at the classic (1-e^{-jn/m})^j
    rate, false negatives never).

    Spark-first formulation — the filter IS the plan, no byte-array
    UDAF: a key's Bloom membership test "all j hashed bit positions are
    set" becomes j broadcast LEFT SEMI joins against the j distinct-
    position sets of the key side.  Each position set is at most
    min(|keys|, m) longs (m=2^20 → ≤ 8 MB broadcast) no matter how many
    billions of keys it summarizes, every probe stays in whole-stage
    codegen, and the pruned big side never shuffles a dropped row.
    Catalyst pushes the semi joins below later wide operators, so the
    pruning happens at the scan side of the downstream join — the same
    shape as Spark's own runtime bloom-filter rewrite
    (spark.sql.optimizer.runtime.bloomFilter), but explicit, engine-
    checkable, and usable on any DataFrame, not just shuffle joins.

    Choose m ≈ 16×·|distinct keys| for a ~sub-1% FP rate with j=3; the
    driver never materializes more than the position sets.
    """
    pruned = big
    for i in range(num_hashes):
        positions = (
            keys.select(_bloom_position(F.col(keys_key), i, m, seed).alias("__bp"))
            .distinct()
        )
        pruned = pruned.join(
            F.broadcast(positions),
            _bloom_position(F.col(big_key), i, m, seed) == F.col("__bp"),
            "left_semi",
        )
    return pruned


def bloom_semi_join(big: DataFrame, keys: DataFrame, big_key: str,
                    keys_key: str | None = None, m: int = 1 << 20,
                    num_hashes: int = 3, seed: str = "bloom0") -> DataFrame:
    """Exact semi join accelerated by Bloom pruning: ``bloom_prune``
    drops the (vast) non-matching majority map-side, then one exact
    LEFT SEMI join on the survivors removes the Bloom false positives.

    At 100 TB this is the shape that matters: the exact semi join
    shuffles only `sel + fp` of the big side (sel = true selectivity,
    fp < 1% tunable via m), instead of every row.  Result is provably
    identical to ``big.join(keys, key, "left_semi")`` — the gate query
    oracle-pins exactly that equality.
    """
    keys_key = keys_key or big_key
    pruned = bloom_prune(big, keys, big_key, keys_key, m, num_hashes, seed)
    dim = keys.select(F.col(keys_key).alias(big_key)).distinct()
    return pruned.join(dim, big_key, "left_semi")


def interval_join(left: DataFrame, right: DataFrame,
                  left_span: tuple[str, str], right_span: tuple[str, str],
                  on: list[str] | None = None,
                  bin_width: float | None = None,
                  extra_cond: Column | None = None) -> DataFrame:
    """Interval-OVERLAP join: every (left, right) pair whose half-open
    spans intersect (``l_start < r_end AND r_start < l_end``) — the
    third custom join Spark lacks natively (alongside as-of and range):
    written as a raw theta join it plans BroadcastNestedLoop/cartesian.

    Two scale modes:

    - ``on=[keys…]``: keyed overlap — plain EQUI-join on the keys with
      the overlap predicate as residual.  Right when per-key groups are
      bounded (spans of one order, one user, one machine).
    - ``bin_width=w``: grid mode for un-keyed corpora — BOTH sides
      explode to every width-``w`` bin their span overlaps, the join is
      an equi-join on the bin id, and each pair is kept only in its
      OWNER bin (``max(floor(l_start/w), floor(r_start/w))`` — the
      first bin where both spans are present), so overlapping pairs
      emit exactly once with no post-dedup.  Expansion factor ≈
      span/w + 1 rows per side; pick ``w`` near the typical span.

    Both sides' span columns must be numeric (or date/timestamp for
    keyed mode — grid mode needs numbers; convert to epoch first) and
    column names must be disjoint across the two frames (alias
    upstream, same contract as :func:`range_join`).  Empty or inverted
    spans (start ≥ end) are dropped — the standard overlap predicate
    would otherwise treat an empty span as a point.
    """
    if (on is None) == (bin_width is None):
        raise ValueError("pass exactly one of on=[...] or bin_width=w")
    l_start, l_end = left_span
    r_start, r_end = right_span
    lf = left.filter(F.col(l_start) < F.col(l_end))
    rf = right.filter(F.col(r_start) < F.col(r_end))
    overlap = ((F.col(l_start) < F.col(r_end))
               & (F.col(r_start) < F.col(l_end)))
    if extra_cond is not None:
        overlap = overlap & extra_cond
    if on is not None:
        return lf.join(rf, on).filter(overlap)
    bw = float(bin_width)

    def _bins(s: str, e: str) -> Column:
        # half-open: a span ending exactly on a bin edge does not reach
        # into that bin — ceil(end/bw)-1 is its last bin, no epsilon
        return F.explode(F.sequence(
            F.floor(F.col(s) / bw).cast("long"),
            F.ceil(F.col(e) / bw).cast("long") - 1))

    lb = lf.withColumn("_bin", _bins(l_start, l_end))
    rb = rf.withColumn("_bin", _bins(r_start, r_end))
    owner = F.greatest(F.floor(F.col(l_start) / bw),
                       F.floor(F.col(r_start) / bw)).cast("long")
    return (
        lb.join(rb, "_bin")
        .filter(overlap & (F.col("_bin") == owner))
        .drop("_bin")
    )


def field_similarity(a: Column | str, b: Column | str) -> Column:
    """Normalized Levenshtein similarity ``1 − lev(a,b)/max(len)`` in
    [0, 1] — 1.0 for equal strings (including both-empty), 0.0 when
    either side is NULL.  Integer edit distance over integer lengths in
    a fixed-order double division: bit-identical in any engine."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    mx = F.greatest(F.length(a), F.length(b))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(0.0))
        .when(mx == 0, F.lit(1.0))
        .otherwise(F.lit(1.0)
                   - F.levenshtein(a, b) / mx.cast("double"))
    )


def record_linkage(left: DataFrame, right: DataFrame,
                   fields: list[tuple[str, str, float]],
                   block_on: list[tuple[str, str]],
                   threshold: float,
                   left_id: str, right_id: str,
                   max_block: int = 10_000,
                   round_digits: int = 6) -> DataFrame:
    """Multi-field record linkage (entity resolution): match records
    across two tables by a weighted sum of per-field normalized
    Levenshtein similarities, restricted to candidate pairs sharing
    BLOCKING keys — the Fellegi–Sunter-style pipeline shape
    (block → compare → score → threshold) without ever forming the
    |L|×|R| cross space.  Generalizes :func:`fuzzy_join` (single field,
    edit ≤ 1) to graded multi-field scores.

    - ``fields``: (left_col, right_col, weight) triples; the score is
      ``Σ wᵢ·simᵢ / Σ wᵢ`` with :func:`field_similarity` per field
      (NULL fields contribute 0 — disagreement, not ignorance).
    - ``block_on``: (left_col, right_col) equality keys.  Candidate
      volume is Σ_b |L_b|·|R_b|, so block choice is the scale knob;
      blocks larger than ``max_block`` rows on EITHER side are dropped
      entirely (the standard hot-block guard — a degenerate blocking
      key like an empty string would otherwise go quadratic).  Dropped
      blocks are recoverable by re-running with a finer key, exactly
      like the LSH max_bucket caps.
    - NULL blocking keys never match (SQL equality), so NULL-keyed rows
      are implicitly excluded from candidates.

    Plan: per-side block-size aggregates broadcast back as pruning
    filters, then ONE equi-join on the blocking keys with the score
    filter as residual — no cartesian, no BNLJ.  Returns
    ``(left_id, right_id, score)`` with the score rounded for
    engine-portable gating.
    """
    if not fields:
        raise ValueError("need at least one field")
    if not block_on:
        raise ValueError("need at least one blocking key (or the join is "
                         "a cross product)")
    total_w = sum(w for _, _, w in fields)
    if total_w <= 0:
        raise ValueError("field weights must sum to > 0")

    def _capped(df: DataFrame, cols: list[str], ids: list[str]) -> DataFrame:
        proj = df.select(*[F.col(c).alias(f"__b{i}") for i, c in enumerate(cols)],
                         *ids)
        keys = [f"__b{i}" for i in range(len(cols))]
        sizes = proj.groupBy(*keys).agg(F.count(F.lit(1)).alias("__bn"))
        ok = sizes.filter(F.col("__bn") <= max_block).drop("__bn")
        return proj.join(F.broadcast(ok), keys)

    lcols = [lc for lc, _ in block_on]
    rcols = [rc for _, rc in block_on]
    lneed = list(dict.fromkeys([left_id] + [lc for lc, _, _ in fields]))
    rneed = list(dict.fromkeys([right_id] + [rc for _, rc, _ in fields]))
    lb = _capped(left, lcols, lneed)
    rb = _capped(right, rcols, rneed)
    keys = [f"__b{i}" for i in range(len(block_on))]
    # disambiguate overlapping column names across the two sides
    lb = lb.select(*keys, *[F.col(c).alias(f"__l_{c}") for c in lneed])
    rb = rb.select(*keys, *[F.col(c).alias(f"__r_{c}") for c in rneed])
    score = None
    for lc, rc, w in fields:
        term = F.lit(w) * field_similarity(F.col(f"__l_{lc}"),
                                           F.col(f"__r_{rc}"))
        score = term if score is None else score + term
    score = score / F.lit(total_w)
    return (
        lb.join(rb, keys)
        .select(
            F.col(f"__l_{left_id}").alias(left_id),
            F.col(f"__r_{right_id}").alias(right_id),
            F.round(score, round_digits).alias("score"))
        .filter(F.col("score") >= threshold)
    )


def fellegi_sunter_weights(df: DataFrame, id_col: str, match_key_col: str,
                           fields: list[str], seed: str = "fs1",
                           max_group: int = 64,
                           round_digits: int = 6) -> DataFrame:
    """Fellegi–Sunter agreement weights (Fellegi & Sunter 1969) — the
    calibration step :func:`record_linkage` presupposes: for each
    comparison field, estimate

        m = P(field agrees | records are a true match)
        u = P(field agrees | records are NOT a match)

    and the log-likelihood-ratio weights the linkage score should add
    per field, ``w_agree = log2(m/u)`` and ``w_disagree =
    log2((1−m)/(1−u))`` — turning ad-hoc field weights into
    probabilistically-grounded ones.

    Deterministic, label-free estimation (both legs linear or
    group-bounded — no EM, no pair sampling RNG):

    - **m** from ground-truth-by-construction match pairs: all ``a<b``
      pairs within a ``match_key_col`` group (e.g. the exact-dup
      fingerprint — records describing the same underlying document).
      Groups larger than ``max_group`` are dropped (boilerplate guard —
      the quadratic hot-group convention).
    - **u** from a deterministic derangement: records sort by
      ``md5(seed‖id)`` (fixed public randomness) and each pairs with
      its successor; pairs landing in the same match group are
      excluded.  N−1 pairs, uniform over the population — the standard
      "random pairs are almost surely non-matches" u-estimate, made
      replayable.

    Agreement is null-safe equality.  Weights are NULL where
    degenerate (m or u at 0 for agree; at 1 for disagree).  Both
    probability legs are exact count ratios; the only transcendental
    is the final ``ln(x)/ln(2)`` pair, absorbed by the round-6
    discipline like the z→p tails.

    Plan: one self-join inside bounded match groups + one global
    md5-order window (at 100 TB, shard the derangement by hash prefix
    — same estimator per shard, union the counts).  Returns one row
    per field: ``(field, n_match_pairs, n_unmatch_pairs, m_prob,
    u_prob, w_agree, w_disagree)`` ordered by field.
    """
    base = df.select(F.col(id_col).alias("__id"),
                     F.col(match_key_col).alias("__mk"),
                     *[F.col(f) for f in fields])
    sizes = base.groupBy("__mk").agg(F.count(F.lit(1)).alias("__gn"))
    bounded = base.join(
        sizes.filter((F.col("__gn") >= 2) & (F.col("__gn") <= max_group))
        .select("__mk"), "__mk")
    l = bounded.alias("l")
    r = bounded.alias("r")
    match_pairs = (l.join(r, (F.col("l.__mk") == F.col("r.__mk"))
                          & (F.col("l.__id") < F.col("r.__id")))
                   .select(*[(F.col(f"l.{f}").eqNullSafe(F.col(f"r.{f}")))
                             .cast("bigint").alias(f"__a_{f}")
                             for f in fields]))
    w = Window.orderBy(F.md5(F.concat(F.lit(seed + "-"),
                                      F.col("__id").cast("string"))))
    seq = base.select(
        "__mk", *fields,
        F.lead("__mk").over(w).alias("__mk2"),
        *[F.lead(f).over(w).alias(f"__n_{f}") for f in fields])
    unmatch_pairs = (seq.filter(F.col("__mk2").isNotNull()
                                & (F.col("__mk") != F.col("__mk2")))
                     .select(*[(F.col(f).eqNullSafe(F.col(f"__n_{f}")))
                               .cast("bigint").alias(f"__a_{f}")
                               for f in fields]))
    magg = match_pairs.agg(
        F.count(F.lit(1)).alias("__nm"),
        *[F.sum(f"__a_{f}").alias(f"__m_{f}") for f in fields])
    uagg = unmatch_pairs.agg(
        F.count(F.lit(1)).alias("__nu"),
        *[F.sum(f"__a_{f}").alias(f"__u_{f}") for f in fields])
    one = magg.crossJoin(F.broadcast(uagg))
    ln2 = F.log(F.lit(2.0))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731

    def _row(f: str):
        m = F.col(f"__m_{f}").cast("double") / F.col("__nm").cast("double")
        u = F.col(f"__u_{f}").cast("double") / F.col("__nu").cast("double")
        wa = F.when((m > 0.0) & (u > 0.0), F.log(m / u) / ln2)
        wd = F.when((m < 1.0) & (u < 1.0),
                    F.log((F.lit(1.0) - m) / (F.lit(1.0) - u)) / ln2)
        return F.struct(
            F.lit(f).alias("field"),
            F.col("__nm").alias("n_match_pairs"),
            F.col("__nu").alias("n_unmatch_pairs"),
            r6(m).alias("m_prob"), r6(u).alias("u_prob"),
            r6(wa).alias("w_agree"), r6(wd).alias("w_disagree"))

    rows = F.explode(F.array(*[_row(f) for f in fields]))
    return (one.select(rows.alias("o")).select("o.*").orderBy("field"))
