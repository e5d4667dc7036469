"""One-pass table profiling — the data-quality step of a pipeline
(null/distinct/extrema per column before training or after ingest).
No reference analog: Jet users express this as a fan-out of aggregate
stages (AggregateOperations allOf — AggregateOperations.java:1337);
Spark expresses it as ONE aggregate over every column's metrics, so the
whole profile costs a single scan + a single partial-agg reduce.

Scale notes
-----------
- Everything is a global aggregate: partials combine map-side, only
  per-column scalars reach the final reduce — no per-row shuffle at any
  input size.
- ``exact_distinct=True`` uses count(DISTINCT col) per column: Spark
  plans multi-distinct aggregates via Expand (one duplicated row per
  distinct-column) — exact but O(n_cols) row amplification map-side.
  At 100 TB use the default approx (HyperLogLog++, mergeable, one pass,
  no Expand); the gate query runs the exact path because the oracle
  must agree bit-for-bit.
- min/max surface as strings so one long-format frame covers every
  column type; numeric columns keep their native comparison order
  BEFORE the cast (the cast is on the aggregated scalar only).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = False) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregate pass.

    Returns one row per column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``
    with extrema cast to string (NULL when the column is all-NULL).
    """
    cols = columns or df.columns
    distinct_fn = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}!rows"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"{c}!nulls"),
            distinct_fn(col).alias(f"{c}!distinct"),
            F.min(col).cast("string").alias(f"{c}!min"),
            F.max(col).cast("string").alias(f"{c}!max"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"`{c}!rows`").alias("n_rows"),
            F.col(f"`{c}!nulls`").alias("n_nulls"),
            F.col(f"`{c}!distinct`").alias("n_distinct"),
            F.col(f"`{c}!min`").alias("min_value"),
            F.col(f"`{c}!max`").alias("max_value"),
        )
        for c in cols
    ])
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def histogram(df: DataFrame, col: str, lo: float, hi: float,
              bins: int) -> DataFrame:
    """Equi-width histogram over a FIXED range [lo, hi] — one map-only
    binning expression + one groupBy on the bin id (the only shuffle,
    carrying ≤ ``bins`` partial rows per map task).

    The range is a parameter, not a scan: a data-derived range would
    need a second pass (or profile_table's extrema).  Rows outside
    [lo, hi] are dropped; v == hi lands in the last bin.  Binning is
    plain IEEE double arithmetic (sub/div/floor) so any engine computes
    identical bin ids — no rand, no engine-specific width_bucket.

    Returns ``(bin, bin_lo, bin_hi, n)`` for non-empty bins.
    """
    if bins <= 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    w = (hi - lo) / bins
    v = F.col(col).cast("double")
    b = F.least(F.floor((v - F.lit(lo)) / F.lit(w)), F.lit(bins - 1)).cast("int")
    return (
        df.filter(v.isNotNull() & (v >= lo) & (v <= hi))
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
            "n",
        )
    )


def rank_bins(df: DataFrame, score_col: str, n_bins: int,
              tiebreak_col: str, bin_col: str = "bin") -> DataFrame:
    """Exact equal-population binning (``ntile``) by a score — the
    curriculum / quality-bucket primitive (bin 1 = lowest scores):
    deterministic because the total order is ``(score, tiebreak_col)``.

    Scale note: an exact global ntile is a single-partition window sort —
    fine at profiling scale, NOT the 100 TB path.  At corpus scale
    compute approximate bin edges first (``approx_percentile(score,
    array(...))``) and bin map-only against the broadcast edges — same
    output modulo boundary ties; this exact form exists so the gate can
    pin the semantics against a SQL oracle (the same exact-vs-approx
    split as profile_table's distinct counts).
    """
    from pyspark.sql.window import Window

    if n_bins <= 0:
        raise ValueError("need n_bins > 0")
    w = Window.orderBy(F.col(score_col), F.col(tiebreak_col))
    return df.withColumn(bin_col, F.ntile(n_bins).over(w).cast("int"))


def rank_bins_approx(df: DataFrame, score_col: str, n_bins: int,
                     bin_col: str = "bin",
                     accuracy: int = 10_000) -> DataFrame:
    """The 100 TB path of :func:`rank_bins`: ONE pass computes
    approximate quantile edges (``approx_percentile`` — bounded-state
    GK sketch, map-side combined), then binning is a map-only expression
    against the broadcast edge literals — no global sort, no
    single-partition window.

    Bins approximate equal population to the sketch's rank accuracy
    (±n/accuracy rows per edge); boundary-tied rows may land one bin off
    the exact ntile.  Same 1-based bin ids.
    """
    if n_bins <= 0:
        raise ValueError("need n_bins > 0")
    probs = [i / n_bins for i in range(1, n_bins)]
    edges_row = df.agg(
        F.expr(
            f"approx_percentile({score_col}, array({', '.join(map(str, probs))}),"
            f" {accuracy})"
        ).alias("e")
    ).collect()[0]["e"]
    v = F.col(score_col)
    b = F.lit(1)
    for i, edge in enumerate(edges_row, start=2):
        b = F.when(v > F.lit(edge), F.lit(i)).otherwise(b)
    return df.withColumn(bin_col, b.cast("int"))


def referential_orphans(child: DataFrame, parent: DataFrame,
                        fk: str, pk: str | None = None) -> DataFrame:
    """Rows of ``child`` whose foreign key has no match in ``parent``
    (NULL fks are orphans too — flag them upstream if intended).  The
    referential-integrity check of a data-quality gate: one left-anti
    join, broadcast when the parent's key projection is small; at scale
    pre-prune with joins.bloom_prune when the parent is too big to
    broadcast raw."""
    pk = pk or fk
    keys = parent.select(F.col(pk).alias(fk)).distinct()
    return child.join(keys, fk, "left_anti")


def duplicate_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key groups violating a uniqueness expectation: one hash groupBy,
    returns (cols…, n_rows) for every key appearing more than once."""
    return (
        df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def quality_checks(child: DataFrame, parent: DataFrame, fk: str,
                   pk: str | None = None,
                   unique_cols: list[str] | None = None,
                   not_null_cols: list[str] | None = None) -> DataFrame:
    """One-row data-quality summary: orphaned-fk count, duplicate-key
    count, and per-column null counts — each check is one aggregate /
    one anti-join; nothing is collected row-by-row."""
    orphans = referential_orphans(child, parent, fk, pk).agg(
        F.count(F.lit(1)).alias("n_orphans"))
    dups = duplicate_keys(child, unique_cols or [fk]).agg(
        F.coalesce(F.sum(F.col("n_rows") - 1), F.lit(0)).alias("n_dup_rows"))
    nn = child.agg(*[
        (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"nulls_{c}")
        for c in (not_null_cols or [fk])
    ])
    return orphans.crossJoin(dups).crossJoin(nn)


def mad_outliers(df: DataFrame, value_col: str, group_col: str,
                 k: float = 3.0, exact: bool = True,
                 round_digits: int = 6) -> DataFrame:
    """Robust per-group outlier detection by median absolute deviation:
    a row is an outlier when ``|x - median| > k * MAD`` (MAD = median of
    ``|x - median|``).  Unlike mean/stddev z-scores, both statistics
    have a 50% breakdown point, so the outliers themselves cannot drag
    the threshold — the metric-drift / sensor-glitch monitor shape.

    Returns one row per group: ``(group, n, med, mad, n_outliers)``.
    Both statistics are rounded to ``round_digits`` BEFORE the
    ``k·MAD`` comparison, making the outlier set a pure function of the
    rounded values — deterministic and engine-portable (a SQL oracle
    computing ``quantile_cont`` + the same rounded compare flags the
    same rows).

    Scale: two grouped percentile passes + one final count — three
    shuffles on ``group_col``, with the tiny per-group stats tables
    broadcast back (no row-side re-shuffle beyond the first hash
    partitioning; AQE reuses the exchange).  ``exact=True`` uses
    Spark's sort-based ``percentile`` (per-group state O(|group|) — the
    oracle-gated form); ``exact=False`` swaps in ``approx_percentile``
    (t-digest, mergeable partials, bounded state) — the 100 TB path,
    same call shape, approximation documented rather than hidden.
    """
    pct = (lambda c: F.percentile(c, F.lit(0.5))) if exact else \
        (lambda c: F.approx_percentile(c, F.lit(0.5), F.lit(10000)))
    x = F.col(value_col)
    med = df.groupBy(group_col).agg(
        F.round(pct(x), round_digits).alias("med"))
    with_med = df.join(F.broadcast(med), group_col)
    dev = F.abs(x - F.col("med"))
    mad = with_med.groupBy(group_col).agg(
        F.round(pct(dev), round_digits).alias("mad"))
    return (
        with_med.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("med").alias("med"),
            F.first("mad").alias("mad"),
            F.sum((F.abs(x - F.col("med")) > F.lit(float(k)) * F.col("mad"))
                  .cast("bigint")).alias("n_outliers"),
        )
    )


def ks_drift(ref: DataFrame, cur: DataFrame, value_col: str,
             group_cols: list[str] | None = None,
             round_digits: int = 6) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per group — the
    distribution-drift monitor: ``D = sup_x |ECDF_ref(x) − ECDF_cur(x)|``
    between a reference sample (yesterday / training time) and the
    current one, per ``group_cols``.  Distribution-free and sensitive to
    shape changes mean/stddev checks miss.

    Plan: the two tagged samples union, then ONE hash exchange on the
    group keys serves everything — the per-group totals (count windows),
    the cumulative counts (a RANGE-framed window ordered by value, so
    ties contribute wholly on both sides and the result is independent
    of tie order — deterministic across engines), and the final max
    aggregate.  In-partition sort per group, no global sort barrier.
    Same per-group-state class as the exact percentile path; at extreme
    group sizes, bin the values first (``histogram``) and accept binned-
    ECDF resolution.

    NULL values are dropped (an ECDF has no place for them — count them
    upstream via :func:`profile_table` if NULL-rate drift matters).
    Returns ``(group_cols…, n_ref, n_cur, ks_stat)``; groups present in
    only one sample are omitted (no comparison exists).
    """
    g = group_cols or []
    tagged = (
        ref.select(*g, F.col(value_col).alias("__x"))
        .withColumn("__src", F.lit(0))
        .unionByName(
            cur.select(*g, F.col(value_col).alias("__x"))
            .withColumn("__src", F.lit(1)))
        .filter(F.col("__x").isNotNull())
    )
    w_all = Window.partitionBy(*[F.col(c) for c in g])
    w_cum = (w_all.orderBy("__x")
             .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    is_ref = (F.col("__src") == 0).cast("bigint")
    is_cur = (F.col("__src") == 1).cast("bigint")
    stepped = tagged.select(
        *g,
        F.sum(is_ref).over(w_all).alias("__n_ref"),
        F.sum(is_cur).over(w_all).alias("__n_cur"),
        F.sum(is_ref).over(w_cum).alias("__c_ref"),
        F.sum(is_cur).over(w_cum).alias("__c_cur"),
    )
    d = F.abs(F.col("__c_ref") / F.col("__n_ref")
              - F.col("__c_cur") / F.col("__n_cur"))
    return (
        stepped.filter((F.col("__n_ref") > 0) & (F.col("__n_cur") > 0))
        .groupBy(*g)
        .agg(
            F.first("__n_ref").alias("n_ref"),
            F.first("__n_cur").alias("n_cur"),
            F.round(F.max(d), round_digits).alias("ks_stat"),
        )
    )


def psi_drift(ref: DataFrame, cur: DataFrame, value_col: str,
              lo: float, hi: float, bins: int,
              group_cols: list[str] | None = None,
              alpha: float = 0.5, round_digits: int = 6) -> DataFrame:
    """Population Stability Index per group — the binned drift number
    risk/monitoring systems track alongside :func:`ks_drift`:

        PSI = Σ_bins (p_b − q_b) · ln(p_b / q_b)

    over smoothed bin shares of the reference (p) and current (q)
    samples.  Rule-of-thumb thresholds: <0.1 stable, 0.1–0.25 shifting,
    >0.25 drifted.  KS is exact but sort-based; PSI is fully map-side
    (fixed bins, :func:`histogram` semantics: [lo, hi] clamped into the
    edge bins so out-of-range mass is counted, not dropped) — the one
    to run continuously at 100 TB.

    Convention: the sum runs over OCCUPIED bins (any bin holding at
    least one row from either sample).  Bins empty on BOTH sides are
    skipped — their smoothed term is a negligible constant that would
    require materializing the full bin grid per group; bins empty on
    ONE side are present and contribute their full smoothed penalty,
    which is the signal PSI exists for.

    Laplace smoothing ``alpha`` keeps empty bins finite.  Determinism:
    binning is IEEE sub/div/floor, shares are double quotients of exact
    integers in fixed order, ``ln`` is bit-identical across engines,
    per-bin terms accumulate in DECIMAL(18,12) — hashes identically on
    a SQL oracle.  NULL values are dropped.

    Returns ``(group_cols…, n_ref, n_cur, psi)``; groups with either
    sample empty are omitted.
    """
    if bins <= 0 or not hi > lo:
        raise ValueError("need bins > 0 and hi > lo")
    g = group_cols or []
    w = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    x = F.col("__x")  # post-union name — the bin expr must bind to it
    b = F.greatest(
        F.least(F.floor((x - F.lit(lo)) / F.lit(w)), F.lit(bins - 1)),
        F.lit(0)).cast("int")
    tagged = (
        ref.select(*g, v.alias("__x")).withColumn("__src", F.lit(0))
        .unionByName(cur.select(*g, v.alias("__x")).withColumn("__src", F.lit(1)))
        .filter(x.isNotNull())
        .select(*g, "__src", b.alias("__b"))
    )
    per_bin = tagged.groupBy(*g, "__b").agg(
        F.sum((F.col("__src") == 0).cast("bigint")).alias("__c_ref"),
        F.sum((F.col("__src") == 1).cast("bigint")).alias("__c_cur"),
    )
    totals = per_bin.groupBy(*g).agg(
        F.sum("__c_ref").alias("__n_ref"), F.sum("__c_cur").alias("__n_cur"))
    a = float(alpha)
    joined = per_bin.join(F.broadcast(totals), g) if g else \
        per_bin.crossJoin(F.broadcast(totals))
    p = (F.col("__c_ref") + F.lit(a)) / (F.col("__n_ref") + F.lit(a * bins))
    q = (F.col("__c_cur") + F.lit(a)) / (F.col("__n_cur") + F.lit(a * bins))
    term = ((p - q) * F.log(p / q)).cast("decimal(18,12)")
    return (
        joined.filter((F.col("__n_ref") > 0) & (F.col("__n_cur") > 0))
        .groupBy(*g)
        .agg(
            F.first("__n_ref").alias("n_ref"),
            F.first("__n_cur").alias("n_cur"),
            F.round(F.sum(term).cast("double"), round_digits).alias("psi"),
        )
    )


def categorical_drift(ref: DataFrame, cur: DataFrame, cat_col: str,
                      group_cols: list[str] | None = None,
                      round_digits: int = 6) -> DataFrame:
    """Categorical drift per group — the discrete companion of
    :func:`ks_drift`/:func:`psi_drift`/:func:`w1_drift`, for columns
    where an ECDF has no meaning (event types, languages, sources,
    labels).  Emits three standard lenses over the two samples'
    category distributions:

    - ``chi2``: Pearson's two-sample chi-squared statistic
      ``Σ_cells (O − E)² / E`` with expected counts under homogeneity
      ``E = n_side · t_c / N`` — the classical independence test stat;
    - ``cramers_v``: ``sqrt(chi2 / (N · (k − 1)))`` — chi2 normalized
      to [0, 1] so it is comparable across groups of different sizes
      and cardinalities (NULL when k = 1: no variation to measure);
    - ``js_div``: Jensen–Shannon divergence (nats) between the two
      share vectors — bounded by ln 2, symmetric, finite even for
      categories present on only one side (the ``0·ln 0 = 0``
      convention), so no smoothing constant to tune.

    Plan — two strictly-shrinking exchanges: (1) the tagged union
    compacts to one row per ``(group, category)`` with per-side counts
    (map-side combine absorbs the heavy lifting — cardinality bounds
    the shuffle, not row count); (2) one window exchange on the group
    derives totals and category counts in-plan, and the final groupBy
    reuses that partitioning.  Per-cell terms are IEEE doubles in fixed
    expression order accumulated in DECIMAL(28,12) — order-independent
    and engine-portable, same determinism contract as psi_drift.

    NULL categories are dropped (count NULL-rate drift upstream via
    :func:`profile_table`).  Groups present in only one sample are
    omitted.  Returns ``(group_cols…, n_ref, n_cur, n_categories,
    chi2, cramers_v, js_div)``.
    """
    g = group_cols or []
    tagged = (
        ref.select(*g, F.col(cat_col).alias("__cat"))
        .withColumn("__src", F.lit(0))
        .unionByName(
            cur.select(*g, F.col(cat_col).alias("__cat"))
            .withColumn("__src", F.lit(1)))
        .filter(F.col("__cat").isNotNull())
    )
    per_cat = tagged.groupBy(*g, "__cat").agg(
        F.sum((F.col("__src") == 0).cast("bigint")).alias("__c_ref"),
        F.sum((F.col("__src") == 1).cast("bigint")).alias("__c_cur"),
    )
    w_all = Window.partitionBy(*[F.col(c) for c in g])
    stepped = per_cat.select(
        *g, "__c_ref", "__c_cur",
        F.sum("__c_ref").over(w_all).alias("__n_ref"),
        F.sum("__c_cur").over(w_all).alias("__n_cur"),
        F.count(F.lit(1)).over(w_all).alias("__k"),
    )
    n_ref_d = F.col("__n_ref").cast("double")
    n_cur_d = F.col("__n_cur").cast("double")
    n_tot_d = (F.col("__n_ref") + F.col("__n_cur")).cast("double")
    t_c = (F.col("__c_ref") + F.col("__c_cur")).cast("double")
    e_ref = n_ref_d * t_c / n_tot_d
    e_cur = n_cur_d * t_c / n_tot_d
    chi_term = (
        (F.col("__c_ref") - e_ref) * (F.col("__c_ref") - e_ref) / e_ref
        + (F.col("__c_cur") - e_cur) * (F.col("__c_cur") - e_cur) / e_cur
    ).cast("decimal(28,12)")
    p = F.col("__c_ref") / n_ref_d
    q = F.col("__c_cur") / n_cur_d
    m = (p + q) / F.lit(2.0)
    js_term = (
        F.when(F.col("__c_ref") > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("__c_cur") > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
    ).cast("decimal(28,12)")
    agged = (
        stepped.filter((F.col("__n_ref") > 0) & (F.col("__n_cur") > 0))
        .groupBy(*g)
        .agg(
            F.first("__n_ref").alias("n_ref"),
            F.first("__n_cur").alias("n_cur"),
            F.first("__k").alias("n_categories"),
            F.sum(chi_term).cast("double").alias("__chi2"),
            F.sum(js_term).cast("double").alias("__js2"),
        )
    )
    chi2 = F.col("__chi2")
    cramers = F.when(
        F.col("n_categories") > 1,
        F.sqrt(chi2 / ((F.col("n_ref") + F.col("n_cur")).cast("double")
                       * (F.col("n_categories") - F.lit(1)).cast("double"))))
    return agged.select(
        *g, "n_ref", "n_cur", "n_categories",
        F.round(chi2, round_digits).alias("chi2"),
        F.round(cramers, round_digits).alias("cramers_v"),
        F.round(F.col("__js2") / F.lit(2.0), round_digits).alias("js_div"),
    )


def w1_drift(ref: DataFrame, cur: DataFrame, value_col: str,
             group_cols: list[str] | None = None,
             round_digits: int = 6) -> DataFrame:
    """Exact two-sample Wasserstein-1 (earth-mover) distance per group —
    the INTEGRAL companion of :func:`ks_drift`'s supremum:

        ``W1 = ∫ |ECDF_ref(x) − ECDF_cur(x)| dx``

    KS answers "how far apart do the CDFs get" (scale-free, capped at
    1); W1 answers "how much probability mass moved, how far" in the
    value's own units — a uniform +c shift of the whole distribution
    gives exactly ``W1 = c`` while KS saturates.  Track both: KS for
    shape alarm, W1 for magnitude.

    Plan — two strictly-shrinking exchanges:

    1. aggregate per ``(group, x)``: the tagged union compacts to one
       row per DISTINCT value with ref/cur counts (map-side combine
       absorbs ties — heavy-tie columns shrink here);
    2. one window exchange on the group over those distinct-value rows:
       cumulative counts + ``lead(x)`` gaps, then
       ``Σ |Fr − Fc| · gap``.

    Each term accumulates in DECIMAL(28,12) so the sum is
    order-independent and engine-portable (the per-term double
    arithmetic — two divisions, one multiply — is IEEE-identical
    everywhere; only the summation order would differ).

    NULLs are dropped; groups present in only one sample are omitted.
    Returns ``(group_cols…, n_ref, n_cur, w1)``.
    """
    g = group_cols or []
    tagged = (
        ref.select(*g, F.col(value_col).alias("__x"))
        .withColumn("__src", F.lit(0))
        .unionByName(
            cur.select(*g, F.col(value_col).alias("__x"))
            .withColumn("__src", F.lit(1)))
        .filter(F.col("__x").isNotNull())
    )
    per_x = tagged.groupBy(*g, "__x").agg(
        F.sum((F.col("__src") == 0).cast("bigint")).alias("__r"),
        F.sum((F.col("__src") == 1).cast("bigint")).alias("__c"),
    )
    w_all = Window.partitionBy(*[F.col(c) for c in g])
    w_ord = w_all.orderBy("__x")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = per_x.select(
        *g,
        F.sum("__r").over(w_all).alias("__n_ref"),
        F.sum("__c").over(w_all).alias("__n_cur"),
        F.sum("__r").over(w_cum).alias("__c_ref"),
        F.sum("__c").over(w_cum).alias("__c_cur"),
        (F.lead("__x").over(w_ord) - F.col("__x")).alias("__gap"),
    )
    term = (
        F.abs(F.col("__c_ref") / F.col("__n_ref")
              - F.col("__c_cur") / F.col("__n_cur"))
        * F.coalesce(F.col("__gap").cast("double"), F.lit(0.0))
    )
    return (
        stepped.filter((F.col("__n_ref") > 0) & (F.col("__n_cur") > 0))
        .groupBy(*g)
        .agg(
            F.first("__n_ref").alias("n_ref"),
            F.first("__n_cur").alias("n_cur"),
            F.round(F.sum(term.cast("decimal(28,12)")).cast("double"),
                    round_digits).alias("w1"),
        )
    )


def cvm_drift(ref: DataFrame, cur: DataFrame, value_col: str,
              group_cols: list[str] | None = None,
              round_digits: int = 6) -> DataFrame:
    """Exact two-sample Cramér–von Mises statistic per group (Anderson
    1962) — the INTEGRATED-square companion completing the drift
    family: KS reports the supremum gap (one point), W1 the mass moved
    (value units), CvM the whole-curve squared discrepancy

        T = (n·m / N²) · Σ_z (ECDF_ref(z) − ECDF_cur(z))²

    summed over every pooled observation z (N = n + m) — sensitive to
    distributed small deviations a single-point supremum dilutes, in a
    scale-free [0, ~N/6] range with published critical values (0.461 at
    α=0.05 for large samples).

    Tie convention: ECDFs step INCLUSIVELY at tied values and each of
    the (r+c) tied observations contributes the same squared term —
    identical to evaluating the classic formula on the pooled order
    statistics, and tie-order-independent (the :func:`ks_drift`
    determinism argument).

    Plan: the same two strictly-shrinking exchanges as :func:`w1_drift`
    — distinct-value compaction (ties absorb map-side), one group
    window for the cumulative counts, then per-value squared terms
    weighted by multiplicity accumulate in DECIMAL(28,12) (order-free,
    engine-portable; the per-term double arithmetic is fixed-order).

    Returns ``(group_cols…, n_ref, n_cur, cvm_stat)``; groups present
    in only one sample are omitted.
    """
    g = group_cols or []
    tagged = (
        ref.select(*g, F.col(value_col).alias("__x"))
        .withColumn("__src", F.lit(0))
        .unionByName(
            cur.select(*g, F.col(value_col).alias("__x"))
            .withColumn("__src", F.lit(1)))
        .filter(F.col("__x").isNotNull())
    )
    per_x = tagged.groupBy(*g, "__x").agg(
        F.sum((F.col("__src") == 0).cast("bigint")).alias("__r"),
        F.sum((F.col("__src") == 1).cast("bigint")).alias("__c"),
    )
    w_all = Window.partitionBy(*[F.col(c) for c in g])
    w_cum = (w_all.orderBy("__x")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    stepped = per_x.select(
        *g,
        F.col("__r"), F.col("__c"),
        F.sum("__r").over(w_all).alias("__n_ref"),
        F.sum("__c").over(w_all).alias("__n_cur"),
        F.sum("__r").over(w_cum).alias("__c_ref"),
        F.sum("__c").over(w_cum).alias("__c_cur"),
    )
    gap = (F.col("__c_ref") / F.col("__n_ref")
           - F.col("__c_cur") / F.col("__n_cur"))
    term = (F.col("__r") + F.col("__c")).cast("double") * (gap * gap)
    n_d = F.col("n_ref").cast("double")
    m_d = F.col("n_cur").cast("double")
    nn = n_d + m_d
    return (
        stepped.filter((F.col("__n_ref") > 0) & (F.col("__n_cur") > 0))
        .groupBy(*g)
        .agg(
            F.first("__n_ref").alias("n_ref"),
            F.first("__n_cur").alias("n_cur"),
            F.sum(term.cast("decimal(28,12)")).cast("double").alias("__s"),
        )
        .select(
            *g, "n_ref", "n_cur",
            (F.round((n_d * m_d) / (nn * nn) * F.col("__s"),
                     round_digits) + F.lit(0.0)).alias("cvm_stat"))
    )


#: Benford expected first-digit shares log10(1 + 1/d), precomputed in
#: Python so NO engine evaluates a log — the literals (and everything
#: downstream) are bit-identical in Spark and any SQL oracle
BENFORD_EXPECTED = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def benford_digits(df: DataFrame, value_col: str,
                   group_cols: list[str] | None = None,
                   round_digits: int = 6) -> DataFrame:
    """Benford's-law first-digit audit per group — the classic
    fabricated-data / upstream-corruption detector for naturally-spread
    positive quantities (amounts, populations, file sizes): the leading
    digit of such data follows ``P(d) = log10(1 + 1/d)``, and a corpus
    that drifts from it (manual entry, synthetic padding, unit bugs)
    shows up digit by digit.

    Digit extraction is STRING-based on the integer part
    (``substr(cast(floor(abs(x)) as bigint), 1, 1)``) — integer-to-
    string is exact in every engine, where a ``log10``/``pow`` pipeline
    is only ulp-accurate and can flip digits at power-of-ten
    boundaries.  Rows with ``|x| < 1`` (no integer digit) or NULL are
    dropped; this is integer-part Benford, the convention used for
    money columns.

    Returns the FULL 9-digit grid per group (zero-count digits
    included — they carry the chi-squared signal): ``(group…, digit,
    n, obs_share, exp_share, chi2_term)`` where ``chi2_term =
    (n − N·e)² / (N·e)``; ``Σ chi2_term`` is Pearson's statistic
    against the Benford null (8 dof).  Plan: one cell aggregate, the
    9-row digit table broadcast onto the per-group totals — counts
    shuffle, rows never.
    """
    g = group_cols or []
    v = F.col(value_col)
    digit = F.substring(
        F.floor(F.abs(v)).cast("bigint").cast("string"), 1, 1).cast("int")
    base = (
        df.filter(v.isNotNull() & (F.abs(v) >= 1))
        .select(*g, digit.alias("digit"))
    )
    counts = base.groupBy(*g, "digit").agg(
        F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy(*g).agg(F.sum("n").alias("__N"))
    spark = df.sparkSession
    grid_rows = [(d, BENFORD_EXPECTED[d]) for d in range(1, 10)]
    grid = spark.createDataFrame(grid_rows, "digit int, exp_share double")
    full = totals.crossJoin(F.broadcast(grid))
    joined = full.join(counts, [*g, "digit"], "left") \
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    exp_n = F.col("__N").cast("double") * F.col("exp_share")
    chi2_term = (F.col("n") - exp_n) * (F.col("n") - exp_n) / exp_n
    return joined.select(
        *g, "digit", "n",
        F.round(F.col("n") / F.col("__N").cast("double"),
                round_digits).alias("obs_share"),
        F.round("exp_share", round_digits).alias("exp_share"),
        F.round(chi2_term, round_digits).alias("chi2_term"),
    )


def spearman_corr(df: DataFrame, x_col: str, y_col: str,
                  group_cols: list[str] | None = None,
                  round_digits: int = 6) -> DataFrame:
    """Spearman rank correlation per group (Spearman 1904): Pearson on
    AVERAGE ranks — the monotone-association screen that is robust to
    outliers and nonlinearity where raw Pearson (``correlation_matrix``)
    reads only linear co-movement; the gap between the two flags
    nonlinear-but-monotone structure.

    Tie handling is the classic midrank: tied values share the average
    of the positions they occupy, ``midrank = (2·rank_min + t − 1)/2``
    with ``rank_min`` the minimum (SQL ``rank()``) and ``t`` the tie
    count — deterministic and engine-portable (no tie-order
    dependence), and exactly what makes Pearson-on-ranks equal the
    textbook Spearman with ties.

    Listwise NULL drop (both columns present).  Plan: ONE exchange on
    the group keys serves both rank windows and the tie counts
    (in-partition sorts, no global barrier), then one aggregate with
    DECIMAL(38,12)-accumulated rank moments; the correlation is the
    :func:`correlation_matrix` fixed-order double expression over
    exact sums.  Midranks are at most n, so their squares stay exact in
    the decimal's 26 integer digits up to ~10^13 rows per group.

    Two plan-shape choices keep the skewed few-groups case (the common
    profiling call: 1-10 groups on many cores) off the slow path:
    the tie count rides the SAME (group, value) sort as the rank via a
    RANGE frame (one Sort+Window per column instead of two), and the
    rank moments aggregate behind a round-robin repartition so the
    DECIMAL(38) accumulation runs at full parallelism instead of inside
    the |groups|-task window stage (decimal sums are associative-exact,
    so the redistribution cannot change a bit of the result).

    Returns ``(group_cols…, n, spearman)``; groups with zero variance
    in either rank vector (a constant column) yield NULL.
    """
    g = group_cols or []
    base = (df.select(*g, F.col(x_col).alias("__x"),
                      F.col(y_col).alias("__y"))
            .filter(F.col("__x").isNotNull() & F.col("__y").isNotNull()))
    pg = [F.col(c) for c in g]

    def midrank(col: str) -> Column:
        rk = F.rank().over(Window.partitionBy(*pg).orderBy(col))
        t = F.count(F.lit(1)).over(
            Window.partitionBy(*pg).orderBy(col).rangeBetween(0, 0))
        return ((F.lit(2) * rk + t - F.lit(1)).cast("double")
                / F.lit(2.0))

    ranked = base.select(*g, midrank("__x").alias("__rx"),
                         midrank("__y").alias("__ry"))
    ranked = ranked.repartition(
        df.sparkSession.sparkContext.defaultParallelism)
    d = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    rx, ry = F.col("__rx"), F.col("__ry")
    agg = ranked.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n"),
        d(rx).alias("__sx"), d(ry).alias("__sy"),
        d(rx * ry).alias("__sxy"),
        d(rx * rx).alias("__sxx"), d(ry * ry).alias("__syy"))
    nd = F.col("n").cast("double")
    num = nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = nd * F.col("__syy") - F.col("__sy") * F.col("__sy")
    corr = F.when((vx > 0.0) & (vy > 0.0),
                  num / (F.sqrt(vx) * F.sqrt(vy)))
    return agg.select(
        *g, "n",
        (F.round(corr, round_digits) + F.lit(0.0)).alias("spearman"))


def correlation_matrix(df: DataFrame, cols: list[str],
                       round_digits: int = 6) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE
    aggregate pass — the feature-redundancy / leakage screen of a
    profiling suite (every pair from a single scan, vs one
    ``F.corr`` job per pair).

    Listwise NULL handling: rows with a NULL in ANY of ``cols`` are
    dropped, so every pair sees the same n and the matrix is positive
    semi-definite (pairwise-complete matrices need not be; document
    which you computed — this is the one statsmodels calls
    ``nan_policy='omit'`` rowwise).

    Determinism: all sums/cross-products accumulate per-row in
    DECIMAL(38,12) — 26 integer digits, so squares/cross-products are
    exact for |v| up to ~1e13 (a 28,12 per-row cast overflowed at
    |v| >= 1e8 and non-ANSI Spark turned it into a silently-skipped
    NULL, biasing the result).  Overflow of the accumulated sums
    themselves FAILS LOUDLY: a NULL sum alongside a non-zero row count
    can only mean decimal overflow (listwise-complete rows contain no
    NULLs), and the guard raises instead of emitting a plausible-looking
    matrix.  The correlation

        ``corr = (n·s_xy − s_x·s_y) /
                 (sqrt(n·s_xx − s_x²) · sqrt(n·s_yy − s_y²))``

    is a fixed-order double expression over those exact sums — hashes
    identically on a SQL oracle.  Zero-variance columns yield NULL
    correlations.  Returns ``(col_x, col_y, n, corr)`` for the
    ``k·(k−1)/2`` pairs in input order.
    """
    if len(cols) < 2:
        raise ValueError("need at least 2 columns")
    from hazelcast_jet_spark.session import ensure_parallelism

    # k*(k+1)/2 DECIMAL products per row is CPU-heavy map work: a
    # one-row-group parquet scan would serialize it on one task (r6
    # bench: 5.8 s -> 2.1 s on 32 tasks at sf0.1); no-op on a real scan
    base = ensure_parallelism(df.select(*cols))
    cond = None
    for c in cols:
        nn = F.col(c).isNotNull()
        cond = nn if cond is None else (cond & nn)
    base = base.filter(cond)
    # In ANSI mode (the Spark 4 default) an out-of-range cast throws
    # NUMERIC_VALUE_OUT_OF_RANGE on its own; only NON-ANSI sessions turn
    # it into a silently-skipped NULL and need the explicit per-row guard
    # (which costs ~2x the aggregate — don't pay it where ANSI already
    # fails loudly).
    ansi = str(df.sparkSession.conf.get(
        "spark.sql.ansi.enabled", "true")).lower() == "true"

    def _dterm(expr):
        # Rows here are listwise-complete, so a NULL decimal cast can only
        # mean overflow (or NaN/Inf input — equally corrupting): raise
        # instead of letting sum() silently skip the row and bias the
        # matrix.
        d = expr.cast("decimal(38,12)")
        if ansi:
            return d
        return F.when(d.isNull(), F.raise_error(F.lit(
            "correlation_matrix: value out of DECIMAL(38,12) range "
            "(|v| ~> 1e13, or NaN/Inf) — result would be silently biased"
        )).cast("decimal(38,12)")).otherwise(d)

    aggs = [F.count(F.lit(1)).alias("__n")]
    sum_aliases = []
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        aggs.append(F.sum(_dterm(v)).cast("double").alias(f"__s{i}"))
        aggs.append(F.sum(_dterm(v * v)).cast("double").alias(f"__q{i}"))
        sum_aliases += [f"__s{i}", f"__q{i}"]
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            vi = F.col(cols[i]).cast("double")
            vj = F.col(cols[j]).cast("double")
            aggs.append(F.sum(_dterm(vi * vj)).cast("double")
                        .alias(f"__x{i}_{j}"))
            sum_aliases.append(f"__x{i}_{j}")
    one = base.agg(*aggs)
    null_any = None
    for a in sum_aliases:
        isnull = F.col(a).isNull()
        null_any = isnull if null_any is None else (null_any | isnull)
    n_out = F.when(
        (F.col("__n") > 0) & null_any,
        F.raise_error(F.lit(
            "correlation_matrix: decimal accumulator overflow — a sum is "
            "NULL with rows present; |values| exceed DECIMAL(38,12) range"
        )).cast("long"),
    ).otherwise(F.col("__n"))
    n = F.col("__n").cast("double")
    pairs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            num = n * F.col(f"__x{i}_{j}") - F.col(f"__s{i}") * F.col(f"__s{j}")
            den = (F.sqrt(n * F.col(f"__q{i}")
                          - F.col(f"__s{i}") * F.col(f"__s{i}"))
                   * F.sqrt(n * F.col(f"__q{j}")
                            - F.col(f"__s{j}") * F.col(f"__s{j}")))
            pairs.append(F.struct(
                F.lit(cols[i]).alias("col_x"),
                F.lit(cols[j]).alias("col_y"),
                n_out.alias("n"),
                F.round(F.when(den > 0, num / den), round_digits)
                .alias("corr")))
    return one.select(F.explode(F.array(*pairs)).alias("p")).select("p.*")


def categorical_association(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Association strength between two categorical columns in ONE
    contingency aggregate — the redundancy/leakage screen for
    categorical features (the categorical twin of
    :func:`correlation_matrix`): mutual information

        MI = sum_xy (n_xy/n) * ln(n_xy * n / (n_x * n_y))

    plus the chi-squared statistic and Cramér's V
    ``sqrt(chi2 / (n * (min(r, c) - 1)))``.

    Plan at scale: one groupBy(a, b) count (the only data-sized
    exchange); margins derive from the CELL table (|a|·|b| rows) via
    two tiny re-aggregations joined back broadcast, and the final
    reduce is over cells.  NULL categories count as regular values
    (dropping them would silently bias both statistics).

    Determinism: per-cell terms are fixed-order IEEE doubles over
    integer counts (``ln`` is correctly-rounded libm on both engines —
    the unigram-LM convention), accumulated in DECIMAL(18,12), so the
    statistics hash exactly on a SQL oracle.

    Returns one row ``(n, n_cells, mi, chi2, cramers_v)``.
    """
    a, b = F.col(col_a), F.col(col_b)
    cells = (
        df.select(F.coalesce(a.cast("string"), F.lit("\x00NULL")).alias("a"),
                  F.coalesce(b.cast("string"), F.lit("\x00NULL")).alias("b"))
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("nxy"))
    )
    ma = cells.groupBy("a").agg(F.sum("nxy").alias("nx"))
    mb = cells.groupBy("b").agg(F.sum("nxy").alias("ny"))
    tot = cells.agg(F.sum("nxy").alias("n"),
                    F.count_distinct("a").alias("r"),
                    F.count_distinct("b").alias("c"))
    j = (cells.join(F.broadcast(ma), "a").join(F.broadcast(mb), "b")
         .crossJoin(F.broadcast(tot)))
    nxy = F.col("nxy").cast("double")
    nx = F.col("nx").cast("double")
    ny = F.col("ny").cast("double")
    n = F.col("n").cast("double")
    mi_term = nxy / n * F.log(nxy * n / (nx * ny))
    e = nx * ny / n
    chi_term = (nxy - e) * (nxy - e) / e
    agg = j.agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(mi_term.cast("decimal(18,12)")).cast("double").alias("mi"),
        F.sum(chi_term.cast("decimal(18,12)")).cast("double").alias("chi2"),
        F.max("r").alias("r"), F.max("c").alias("c"),
    )
    denom = (F.col("n").cast("double")
             * (F.least("r", "c").cast("double") - F.lit(1.0)))
    v = F.when(denom > 0, F.sqrt(F.col("chi2") / denom))
    return agg.select("n", "n_cells", "mi", "chi2", v.alias("cramers_v"))


def key_skew(df: DataFrame, key_col: str, top_n: int = 5) -> DataFrame:
    """Key-skew profile for a prospective join/aggregation on
    ``key_col`` — the operator that decides whether to salt BEFORE the
    shuffle surprises you: one groupBy(key) count (the only data-sized
    exchange), then scalar skew statistics plus the ``top_n`` heaviest
    keys from the counts table.

    Emits one row per heavy key plus one summary row (key = NULL):

    - summary: ``n_rows``, ``n_keys``, ``max_n``, ``mean_n``
      (n_rows/n_keys as a double), ``skew_ratio`` (max_n/mean_n — the
      factor by which the hottest partition-share exceeds the average;
      > ~20 on a 1000-executor cluster says salt or AQE-skew-join this
      key), with ``key``/``rank`` NULL/0;
    - heavy keys: ``key`` (as string), ``n`` and ``rank`` 1..top_n by
      (count desc, key asc).

    NULL keys count as a regular group (they hash together in a real
    join, which is exactly how they skew).
    """
    k = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00NULL"))
    counts = df.select(k.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n"))
    summary = counts.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_n"),
    ).select(
        F.lit(None).cast("string").alias("key"),
        F.lit(0).alias("rank"),
        "n_rows", "n_keys", "max_n",
        (F.col("n_rows").cast("double") / F.col("n_keys")).alias("mean_n"),
        (F.col("max_n").cast("double")
         / (F.col("n_rows").cast("double") / F.col("n_keys")))
        .alias("skew_ratio"),
    )
    w = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    heavy = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("key", "rank",
                F.lit(None).cast("bigint").alias("n_rows"),
                F.col("n").alias("n_keys"),
                F.lit(None).cast("bigint").alias("max_n"),
                F.lit(None).cast("double").alias("mean_n"),
                F.lit(None).cast("double").alias("skew_ratio"))
    )
    return summary.unionByName(heavy).orderBy("rank")


def winsorize(df: DataFrame, value_col: str, lo_p: float = 0.01,
              hi_p: float = 0.99, group_col: str | None = None,
              out_col: str | None = None, exact: bool = True,
              round_digits: int = 6) -> DataFrame:
    """Winsorization — clamp a value column into its [lo_p, hi_p]
    quantile band (per group when ``group_col`` is given): the standard
    robust pre-processing step when outliers should be CAPPED rather
    than dropped (:func:`mad_outliers` is the detect-and-review
    companion; this is the silent-repair one — reward clipping, price
    caps, sensor saturation).

    Both cut points are rounded to ``round_digits`` before the clamp so
    the output is a pure function of the rounded quantiles —
    deterministic and engine-portable (a SQL oracle computing
    ``quantile_cont`` + the same rounded clamp produces identical
    values).  NULL values pass through.

    Scale: one grouped percentile pass (exact sort-based per-group
    ``percentile`` for gate parity; ``exact=False`` switches to
    ``approx_percentile``'s bounded-state sketch — the 100 TB default),
    cut points broadcast back, then a map-only ``least/greatest``.

    Adds ``out_col`` (default ``<value_col>_w``) plus the per-row cut
    points ``__lo``/``__hi`` are NOT retained — join the stats from
    the aggregate if you need them.
    """
    if not 0.0 <= lo_p < hi_p <= 1.0:
        raise ValueError("need 0 <= lo_p < hi_p <= 1")
    out_col = out_col or f"{value_col}_w"
    fn = "percentile" if exact else "approx_percentile"
    v = F.col(value_col).cast("double")
    aggs = [
        F.round(F.expr(f"{fn}({value_col}, {lo_p})"), round_digits)
        .alias("__lo"),
        F.round(F.expr(f"{fn}({value_col}, {hi_p})"), round_digits)
        .alias("__hi"),
    ]
    if group_col is None:
        stats = df.agg(*aggs)
        joined = df.crossJoin(F.broadcast(stats))
    else:
        stats = df.groupBy(group_col).agg(*aggs)
        joined = df.join(F.broadcast(stats), group_col)
    clamped = F.when(v.isNull(), F.lit(None).cast("double")).otherwise(
        F.least(F.greatest(v, F.col("__lo")), F.col("__hi")))
    return joined.withColumn(out_col, clamped).drop("__lo", "__hi")


def theil_decomposition(df: DataFrame, group_col: str, value_col: str,
                        round_digits: int = 6) -> DataFrame:
    """Theil T inequality index with exact between/within decomposition
    (Theil 1967; Shorrocks 1980) over positive values:

        T        = (1/N) Σ_i (x_i/μ)·ln(x_i/μ)
        T_between = Σ_g s_g·ln((μ_g/μ))       with s_g = group value share
        T_within  = Σ_g s_g·T_g               (T = T_between + T_within)

    — the inequality measure :func:`gini_concentration` cannot
    decompose: it answers "how much of the spend/traffic concentration
    lives BETWEEN sources vs WITHIN them", the mixture-rebalancing
    signal (between-dominated → rebalance sources; within-dominated →
    rebalancing cannot help).

    Plan: ONE scan to per-group DECIMAL-exact (n, Σx) plus the
    group-local Σ(x·ln x) (the only per-row transcendental, absorbed by
    the round-6 discipline like the z→p tails); group rows are bounded,
    so the decomposition folds driver-free from broadcast-scale tables.
    Non-positive values are EXCLUDED (ln requires x > 0) and counted in
    ``n_dropped``.

    Identity used: (1/n_g)Σ(x/μ_g)ln(x/μ_g) = [Σx·ln x]/(n_g·μ_g) −
    ln(μ_g), evaluated in that exact order both engines.

    Returns ONE row ``(n, n_dropped, n_groups, theil_total,
    theil_between, theil_within)`` with total = between + within exact
    up to the shared fixed-order arithmetic.
    """
    x = F.col(value_col).cast("double")
    base = df.select(F.col(group_col).alias("__g"), x.alias("__x"))
    pos = F.col("__x") > 0.0
    d = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    # ONE scan: positive-row moments AND the dropped counter fold in the
    # same group aggregate; the resulting table is bounded (one row per
    # group) and localCheckpointed so the three downstream folds (group
    # terms, totals, dropped sum) never re-scan the source
    cells = (base.groupBy("__g").agg(
        F.sum(pos.cast("bigint")).alias("__n"),
        F.sum(F.when(pos, F.lit(0)).otherwise(F.lit(1)))
        .alias("__drop"),
        F.coalesce(d(F.when(pos, F.col("__x"))), F.lit(0.0)).alias("__s"),
        F.coalesce(d(F.when(pos, F.col("__x") * F.log("__x"))),
                   F.lit(0.0)).alias("__sxl"))
        .localCheckpoint())
    groups = cells.filter(F.col("__n") > 0)
    dropped = cells.agg(F.sum("__drop").alias("n_dropped"))
    tot = groups.agg(
        F.sum("__n").alias("n"),
        F.count(F.lit(1)).alias("n_groups"),
        d(F.col("__s")).alias("__ts"),
        d(F.col("__sxl")).alias("__tsxl"))
    nd = F.col("__n").cast("double")
    ntd = F.col("n").cast("double")
    mu_g = F.col("__s") / nd
    mu = F.col("__ts") / ntd
    s_g = F.col("__s") / F.col("__ts")
    t_g = F.col("__sxl") / (nd * mu_g) - F.log(mu_g)
    per = (groups.crossJoin(F.broadcast(tot)).select(
        (s_g * F.log(mu_g / mu)).alias("__tb"),
        (s_g * t_g).alias("__tw")))
    folded = per.agg(d(F.col("__tb")).alias("theil_between"),
                     d(F.col("__tw")).alias("theil_within"))
    total = F.col("__tsxl") / (ntd * mu) - F.log(mu)
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (tot.crossJoin(F.broadcast(folded))
            .crossJoin(F.broadcast(dropped))
            .select("n", "n_dropped", "n_groups",
                    r6(total).alias("theil_total"),
                    r6(F.col("theil_between")).alias("theil_between"),
                    r6(F.col("theil_within")).alias("theil_within")))


def gini_concentration(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative value — the
    concentration/inequality audit (how skewed is training-data volume
    across source domains, spend across customers, tokens across
    shards?).  0 = perfectly even, -> 1 = one member holds everything.
    Uses the exact rank formulation over ascending values

        G = (2 * sum(i * x_i) - (n + 1) * sum(x)) / (n * sum(x))

    with 1-based rank i.  Equal values make ``sum(i * x_i)`` invariant
    to tie order (the i's of a tie block sum to a constant), so the
    statistic is deterministic without a tie-break column.

    Plan at scale: ONE exchange on the group key serves both the
    rank window and the final aggregate (same partitioning, Catalyst
    reuses it).  Per-row terms accumulate in DECIMAL — ``i * x`` at
    DECIMAL(38,6) — so sums are order-independent and the result
    bit-identical across engines; the single division happens once in
    double.  Groups with sum(x) = 0 or n = 0 return NULL gini.

    Returns ``(group_cols..., n, total, gini)``; ``total`` is the
    exact decimal sum emitted as double.
    """
    w = Window.partitionBy(*group_cols).orderBy(F.col(value_col))
    xdec = F.col(value_col).cast("decimal(18,6)")
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__i", F.row_number().over(w))
        # rank at DECIMAL(12,0): 12 + 18 = 30 total width keeps the
        # product inside every engine's 38-digit multiply bound (and
        # caps supported group size at 1e12 rows — document past that)
        .withColumn("__ix", F.col("__i").cast("decimal(12,0)") * xdec)
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xdec).alias("__sx"),
        F.sum("__ix").alias("__six"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("__sx").cast("double")
    six_d = F.col("__six").cast("double")
    gini = F.when(
        (F.col("n") > 0) & (sx_d != 0.0),
        F.round((2.0 * six_d - (n_d + 1.0) * sx_d) / (n_d * sx_d),
                round_digits),
    )
    return agg.select(
        *group_cols, "n",
        F.round(sx_d, 2).alias("total"),
        gini.alias("gini"),
    )


def hill_tail_index(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 100,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group Hill estimator of the power-law tail index (Hill 1975):
    over the k largest positive values ``x_(1) >= ... >= x_(k)`` and the
    (k+1)-th,

        1/alpha = (1/k) * sum_{i=1..k} ln(x_(i) / x_(k+1))

    Small alpha (< 2) = genuinely heavy tail: means/variances of the
    column are unstable, sums are dominated by a few records — the
    "will one hot key/doc/user dominate this aggregate?" audit that
    complements :func:`key_skew` (observed counts) with a
    distributional verdict, and the Gini/quantile family with a tail
    EXPONENT.

    Plan at scale: one rank window keeps k+1 rows per group (the same
    single exchange the final aggregate reuses); everything after runs
    on the (groups x (k+1))-bounded table.  ``ln`` terms accumulate in
    DECIMAL(18,12) (the BM25/PMI convention) so the sum is order-free;
    the closing arithmetic is fixed-order double — engine-identical.

    Returns ``(group_cols..., n_pos, x_kth, alpha_inv, alpha)``; groups
    with fewer than k+1 positive values return NULL alpha (the
    estimator is undefined).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    pos = df.filter(F.col(value_col) > 0)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).desc())
    ranked = pos.withColumn("__r", F.row_number().over(w)) \
        .filter(F.col("__r") <= k + 1)
    cnt = pos.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_pos"))
    agg = ranked.groupBy(*group_cols).agg(
        F.min(F.col(value_col).cast("double")).alias("x_kth"),
        F.sum(F.when(F.col("__r") <= k,
                     F.log(F.col(value_col).cast("double"))
                     .cast("decimal(18,12)"))).alias("__sl"),
        F.count(F.lit(1)).alias("__nk"),
    )
    alpha_inv = (F.col("__sl").cast("double")
                 - F.lit(float(k)) * F.log("x_kth")) / F.lit(float(k))
    valid = F.col("__nk") == k + 1
    out = agg.join(cnt, list(group_cols))
    return out.select(
        *group_cols, "n_pos",
        F.round("x_kth", round_digits).alias("x_kth"),
        F.when(valid, F.round(alpha_inv, round_digits)).alias("alpha_inv"),
        F.when(valid & (alpha_inv > 0.0),
               F.round(F.lit(1.0) / alpha_inv, round_digits)).alias("alpha"),
    ).orderBy(*group_cols)


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Reliability-diagram table for a scored binary label — the
    calibration audit of a quality/LID classifier (is a 0.9-scoring doc
    actually positive ~90% of the time?): equi-width score bins over
    [lo, hi] (outliers clamp to the edge bins, the psi_drift
    convention) with per-bin mean score, positive rate, and the
    bin's weighted calibration-gap contribution

        w_abs_gap_b = (n_b / N) * |frac_pos_b − avg_score_b|

    whose sum over bins is the Expected Calibration Error (ECE,
    Naeini et al. 2015).

    Plan at scale: one map-only binning expression + ONE aggregate on
    the bin id (≤ n_bins partial rows per task); N re-derives from the
    bin table by a window sum — the corpus is scanned once.  Score
    sums accumulate in DECIMAL(18,12); every ratio is a fixed-order
    double quotient of exact sums — SQL-oracle exact.

    Returns ``(bin, bin_lo, bin_hi, n, avg_score, frac_pos,
    w_abs_gap)`` for non-empty bins, ordered.
    """
    if n_bins <= 0 or not hi > lo:
        raise ValueError("need n_bins > 0 and hi > lo")
    w = (hi - lo) / n_bins
    s = F.col(score_col).cast("double")
    b = F.greatest(
        F.least(F.floor((s - F.lit(lo)) / F.lit(w)), F.lit(n_bins - 1)),
        F.lit(0)).cast("int")
    lab = F.col(label_col).cast("boolean")
    binned = (
        df.filter(s.isNotNull() & lab.isNotNull())
        .select(b.alias("bin"), s.alias("__s"),
                lab.cast("long").alias("__y"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("__s").cast("decimal(18,12)")).alias("__ss"),
             F.sum("__y").alias("__np"))
    )
    tot = Window.partitionBy()
    avg_s = F.col("__ss").cast("double") / F.col("n").cast("double")
    frac = F.col("__np").cast("double") / F.col("n").cast("double")
    gap = (F.col("n").cast("double")
           / F.sum("n").over(tot).cast("double")) * F.abs(frac - avg_s)
    return binned.select(
        "bin",
        (F.lit(lo) + F.col("bin") * F.lit(w)).alias("bin_lo"),
        (F.lit(lo) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
        "n",
        F.round(avg_s, round_digits).alias("avg_score"),
        F.round(frac, round_digits).alias("frac_pos"),
        F.round(gap, round_digits).alias("w_abs_gap"),
    ).orderBy("bin")


def outlier_ensemble(df: DataFrame, value_col: str, group_col: str,
                     mad_k: float = 3.0, iqr_k: float = 1.5,
                     z_k: float = 3.0, round_digits: int = 6) -> DataFrame:
    """Multi-detector outlier ensemble per group: MAD
    (``|x−med| > k·MAD``), Tukey IQR fences
    (``x < q1 − k·IQR or x > q3 + k·IQR``) and the classic z-score
    (``|x−mean| > k·σ``) flagged side by side, with the agreement
    counts that tell you whether a point is an outlier or the DETECTOR
    is (z-score has a 0% breakdown point — heavy tails drag its own
    threshold; when n_z diverges from n_mad/n_iqr the tail is doing
    exactly that).

    All cut points are rounded before comparison (deterministic,
    engine-portable — the mad_outliers convention); mean/σ come from
    exact decimal moments.  One stats pass + one flag pass, with the
    tiny per-group stats broadcast back.

    Returns ``(group, n, n_mad, n_iqr, n_z, n_any, n_all)``.
    """
    x = F.col(value_col)
    pct = lambda c, q: F.percentile(c, F.lit(q))  # noqa: E731
    med = df.groupBy(group_col).agg(
        F.round(pct(x, 0.5), round_digits).alias("__med"),
        F.round(pct(x, 0.25), round_digits).alias("__q1"),
        F.round(pct(x, 0.75), round_digits).alias("__q3"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(x.cast("decimal(28,12)")).alias("__s"),
        F.sum((x * x).cast("decimal(28,12)")).alias("__s2"))
    with_med = df.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        F.round(pct(F.abs(x - F.col("__med")), 0.5), round_digits)
        .alias("__mad"))
    j = with_med.join(F.broadcast(mad), group_col)
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    s2 = F.col("__s2").cast("double")
    mean = F.round(s / n, round_digits)
    std = F.round(
        F.sqrt(F.greatest((s2 - s * s / n) / (n - F.lit(1.0)), F.lit(0.0))),
        round_digits)
    iqr = F.col("__q3") - F.col("__q1")
    f_mad = F.abs(x - F.col("__med")) > F.lit(float(mad_k)) * F.col("__mad")
    f_iqr = (x < F.col("__q1") - F.lit(float(iqr_k)) * iqr) | \
            (x > F.col("__q3") + F.lit(float(iqr_k)) * iqr)
    # n == 1 makes the sample variance 0/0 (NaN semantics diverge between
    # engines): a singleton group is explicitly never a z-outlier on both
    # sides (the oracle carries the matching n > 1 conjunct).
    f_z = (F.col("__n") > 1) & (F.abs(x - mean) > F.lit(float(z_k)) * std)
    return (
        j.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(f_mad.cast("bigint")).alias("n_mad"),
             F.sum(f_iqr.cast("bigint")).alias("n_iqr"),
             F.sum(f_z.cast("bigint")).alias("n_z"),
             F.sum((f_mad | f_iqr | f_z).cast("bigint")).alias("n_any"),
             F.sum((f_mad & f_iqr & f_z).cast("bigint")).alias("n_all"))
        .orderBy(group_col))


def quantile_bins(df: DataFrame, value_col: str, n_bins: int = 10,
                  round_digits: int = 6) -> DataFrame:
    """Equal-frequency discretization: exact quantile cut points at
    ``i/n_bins`` plus per-bin row counts — the feature-binning /
    monotonic-binning primitive (and the bin layout PSI-style drift
    monitors consume).  Cut points are rounded before assignment so
    binning is a pure function of the rounded edges (engine-portable);
    values equal to an edge go RIGHT (``edge <= x < next``), the last
    bin closes at +inf.

    One exact-percentile aggregate (single row, broadcast literal-free
    join) + one conditional-sum pass.  At 100 TB swap the exact
    percentile for approx_percentile exactly as rank_bins_approx does.

    Returns ``(bin INT, lo, hi, n_rows)`` with NULL lo on the first
    bin and NULL hi on the last.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    x = F.col(value_col)
    qs = [i / n_bins for i in range(1, n_bins)]
    # the edge frame is ONE row of n_bins-1 doubles — collect it (the
    # bounded-seed pattern) so the counting pass runs map-only against
    # literals instead of re-scanning the fact table per branch
    # ONE array-percentile aggregate: a separate percentile per edge
    # buffers and sorts the column once PER EDGE (9 redundant sorts for
    # deciles — measured 4x super-linear at 10x data); the array form
    # sorts once and reads every edge from the same buffer
    edges_arr = df.agg(
        F.percentile(x, F.lit(qs)).alias("e")).collect()[0]["e"]
    ev = [round(float(v), round_digits) for v in edges_arr]
    bin_expr = F.lit(0)
    for i, e in enumerate(ev):
        bin_expr = F.when(x >= F.lit(float(e)), F.lit(i + 1)) \
            .otherwise(bin_expr)
    counts = (df.groupBy(bin_expr.cast("int").alias("bin"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    spark = df.sparkSession
    edges = spark.createDataFrame(
        [(i,
          float(ev[i - 1]) if i > 0 else None,
          float(ev[i]) if i < len(qs) else None)
         for i in range(n_bins)],
        "bin int, lo double, hi double")
    return (edges.join(counts, "bin", "left")
            .select("bin", "lo", "hi",
                    F.coalesce("n_rows", F.lit(0)).cast("bigint")
                    .alias("n_rows"))
            .orderBy("bin"))


def lorenz_curve(df: DataFrame, value_col: str, n_points: int = 10,
                 round_digits: int = 6) -> DataFrame:
    """Lorenz concentration curve: for each population decile (by
    ascending value), the cumulative share of the total value mass —
    the curve behind :func:`gini_concentration`'s single number ("the
    top 10% of orders carry X% of revenue").

    One ordered ranking exchange over (value, rank) pairs + one
    conditional-sum aggregate for all points; value mass accumulates
    in exact decimals, the share is one rounded double quotient per
    point.  Ties order by value then input order irrelevance: rank by
    (value, row id) is not needed since equal values contribute equal
    mass to either side of a cut.

    Returns ``(pctile INT, n_rows, cum_value_share)``.
    """
    from pyspark.sql import Window

    if n_points < 2:
        raise ValueError("n_points must be >= 2")
    x = F.col(value_col)
    ranked = df.select(x.alias("__v")).withColumn(
        "__r", F.row_number().over(Window.orderBy("__v")))
    total = ranked.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__v").cast("decimal(28,12)")).alias("__tot"))
    j = ranked.crossJoin(F.broadcast(total))
    cut = lambda i: (F.col("__n") * i / n_points)  # noqa: E731
    agg = j.agg(
        F.first("__n").alias("n_total"),
        F.first("__tot").alias("tot"),
        *[F.sum(F.when(F.col("__r") <= cut(i),
                       F.col("__v").cast("decimal(28,12)"))
                .otherwise(F.lit(0).cast("decimal(28,12)")))
          .alias(f"__c{i}") for i in range(1, n_points + 1)])
    stacked = agg.select(F.explode(F.array(*[
        F.struct(
            F.lit(i * 100 // n_points).cast("int").alias("pctile"),
            F.floor(F.col("n_total") * i / n_points).cast("bigint")
            .alias("n_rows"),
            F.round(F.col(f"__c{i}").cast("double")
                    / F.col("tot").cast("double"), round_digits)
            .alias("cum_value_share"))
        for i in range(1, n_points + 1)])).alias("c")).select("c.*")
    return stacked.orderBy("pctile")


def source_ks_matrix(df: DataFrame, value_col: str, source_col: str,
                     round_digits: int = 6) -> DataFrame:
    """One-vs-rest Kolmogorov–Smirnov statistic for EVERY source in one
    pass: ``D_s = sup_x |ECDF_s(x) − ECDF_rest(x)|`` — "which corpus
    slice is distributionally unlike the others?", the per-source twin
    of :func:`ks_drift` (which needs a designated reference sample).

    Shape: one (source, value) count aggregate, then the dense
    source × distinct-value step grid (two SMALL broadcast sides — the
    grid is |sources| · |distinct values| rows, independent of row
    count); cumulative counts come from one window over the grid and
    the rest-side derives as ``global_cum − source_cum``, so the corpus
    is scanned ONCE and never amplified.  For continuous value columns
    bin first (``histogram``) and accept binned-ECDF resolution —
    |distinct values| is the grid bound.

    Returns ``(source, n_source, n_rest, ks_stat)``.
    """
    counts = (df.filter(F.col(value_col).isNotNull())
              .groupBy(F.col(source_col).alias("__s"),
                       F.col(value_col).alias("__x"))
              .agg(F.count(F.lit(1)).alias("__n")))
    values = counts.select("__x").distinct()
    sources = counts.select("__s").distinct()
    grid = sources.crossJoin(values)
    filled = grid.join(counts, ["__s", "__x"], "left") \
        .select("__s", "__x", F.coalesce("__n", F.lit(0)).alias("__n"))
    w_cum = (Window.partitionBy("__s").orderBy("__x")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_src = Window.partitionBy("__s")
    stepped = filled.select(
        "__s", "__x",
        F.sum("__n").over(w_cum).alias("__c_s"),
        F.sum("__n").over(w_src).alias("__n_s"))
    gw_cum = (Window.orderBy("__x")
              .rangeBetween(Window.unboundedPreceding, Window.currentRow))
    glob = (df.filter(F.col(value_col).isNotNull())
            .groupBy(F.col(value_col).alias("__x"))
            .agg(F.count(F.lit(1)).alias("__gn"))
            .select("__x", F.sum("__gn").over(gw_cum).alias("__c_all")))
    tot = (df.filter(F.col(value_col).isNotNull())
           .agg(F.count(F.lit(1)).alias("__tot")))
    j = stepped.join(F.broadcast(glob), "__x").crossJoin(F.broadcast(tot))
    c_rest = F.col("__c_all") - F.col("__c_s")
    n_rest = F.col("__tot") - F.col("__n_s")
    d = F.abs(F.col("__c_s").cast("double") / F.col("__n_s").cast("double")
              - c_rest.cast("double") / n_rest.cast("double"))
    return (j.filter((F.col("__n_s") > 0) & (n_rest > 0))
            .groupBy(F.col("__s").alias("source"))
            .agg(F.first("__n_s").alias("n_source"),
                 F.first(n_rest).alias("n_rest"),
                 F.round(F.max(d), round_digits).alias("ks_stat"))
            .orderBy("source"))


def corpus_data_card(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    num_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    near_threshold: float = 0.5,
    min_words: int = 20,
    max_words: int = 1000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    round_digits: int = 6,
) -> DataFrame:
    """The corpus "data card" — the one-report-per-source summary every
    training-data run starts from, composing the profiling, dedup and
    quality operators into a single frame (the profiling twin of the
    llm_data_pipeline transform-chain gate): per source, volume (docs +
    whitespace tokens, with corpus shares), length percentiles, exact and
    near duplicate rates, Gopher quality-pass rate, and the language mix
    (distinct langs, majority lang and its share).

    No reference analog (Jet users would hand-build a fan-out DAG of
    aggregate stages per metric); extension for the 100 TB curation loop.

    Scale shape: ONE corpus scan computes every per-doc feature map-side
    (fingerprint, token count, Gopher flags); exact-dup membership is one
    window count over the fingerprint shuffle; near-dup membership reuses
    the banded LSH pair table (the only non-linear stage — same cost
    class as the dedup run the card describes) reduced to a DISTINCT id
    set that joins back as a broadcast; everything then folds in ONE
    per-source aggregate plus a broadcast 1-row global total.  Ratios are
    fixed-order double divisions, rounded (+0.0 normalized).

    Returns per source, ordered by source::

        (source, n_docs, doc_share, n_tokens, token_share,
         p50_chars, p90_chars, exact_dup_rate, near_dup_rate,
         quality_pass_rate, n_langs, top_lang, top_lang_share)
    """
    from hazelcast_jet_spark.operators.dedup import minhash_lsh_pairs
    from hazelcast_jet_spark.operators.text import (
        fingerprint, gopher_quality_flags, token_count)

    flags = gopher_quality_flags(
        text_col, min_words=min_words, max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_ratio=max_symbol_ratio)
    feats = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).alias("__chars"),
        token_count(text_col).alias("__tok"),
        flags["pass"].alias("__q"),
        fingerprint(text_col).alias("__fp"),
    )
    feats = feats.withColumn(
        "__exact_dup",
        (F.count(F.lit(1)).over(Window.partitionBy("__fp")) > 1)
        .cast("bigint"))
    dup_ids = (
        minhash_lsh_pairs(df, text_col, id_col, num_hashes, bands, k,
                          near_threshold)
        .select(F.explode(F.array("id_a", "id_b")).alias("id"))
        .distinct()
        .withColumn("__nd", F.lit(1)))
    # Materialize the per-doc feature rows ONCE (narrow: 7 small
    # columns), after the fingerprint window and the broadcast dup-id
    # join: per_source, the lang mix and the global totals all fold off
    # this frame, and without the checkpoint each consumer re-ran the
    # whole documents scan + feature map + LSH dup join (3 scans of the
    # corpus in the r12-before plan; guide §2.4).
    feats = (feats.join(F.broadcast(dup_ids), "id", "left")
             .withColumn("__near_dup", F.coalesce(F.col("__nd"), F.lit(0)))
             .select("source", "lang", "__chars", "__tok", "__q",
                     "__exact_dup", "__near_dup")
             .localCheckpoint())
    per_source = feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").cast("bigint").alias("n_tokens"),
        F.round(F.percentile(F.col("__chars"), F.lit(0.5)), round_digits)
        .alias("p50_chars"),
        F.round(F.percentile(F.col("__chars"), F.lit(0.9)), round_digits)
        .alias("p90_chars"),
        F.sum("__exact_dup").alias("__n_exact"),
        F.sum("__near_dup").alias("__n_near"),
        F.sum(F.col("__q").cast("bigint")).alias("__n_pass"),
        F.count_distinct(F.col("lang")).cast("bigint").alias("n_langs"),
    )
    lang_counts = feats.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("__n"))
    wl = Window.partitionBy("source").orderBy(
        F.col("__n").desc(), F.col("lang"))
    top_lang = (lang_counts.withColumn("__rn", F.row_number().over(wl))
                .filter(F.col("__rn") == 1)
                .select("source", F.col("lang").alias("top_lang"),
                        F.col("__n").alias("__top_n")))
    # global totals fold from the per-source aggregate (exact integer
    # sums — identical to re-aggregating the corpus) instead of a third
    # pass over the feature rows
    totals = per_source.agg(
        F.sum("n_docs").cast("bigint").alias("__tot_docs"),
        F.sum("n_tokens").cast("bigint").alias("__tot_tokens"))
    nd = F.col("n_docs").cast("double")

    def _share(num, den):
        return (F.round(num.cast("double") / den.cast("double"),
                        round_digits) + F.lit(0.0))

    return (
        per_source
        .join(F.broadcast(top_lang), "source")
        .crossJoin(F.broadcast(totals))
        .select(
            "source", "n_docs",
            _share(F.col("n_docs"), F.col("__tot_docs")).alias("doc_share"),
            "n_tokens",
            _share(F.col("n_tokens"),
                   F.col("__tot_tokens")).alias("token_share"),
            (F.col("p50_chars") + F.lit(0.0)).alias("p50_chars"),
            (F.col("p90_chars") + F.lit(0.0)).alias("p90_chars"),
            (F.round(F.col("__n_exact") / nd, round_digits)
             + F.lit(0.0)).alias("exact_dup_rate"),
            (F.round(F.col("__n_near") / nd, round_digits)
             + F.lit(0.0)).alias("near_dup_rate"),
            (F.round(F.col("__n_pass") / nd, round_digits)
             + F.lit(0.0)).alias("quality_pass_rate"),
            "n_langs", "top_lang",
            (F.round(F.col("__top_n") / nd, round_digits)
             + F.lit(0.0)).alias("top_lang_share"),
        )
        .orderBy("source"))


def corpus_card_stream_counters(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    min_words: int = 20,
    max_words: int = 1000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
) -> DataFrame:
    """The STREAMING-legal counter grain of the corpus data card: one
    aggregation ``groupBy(source, lang, fingerprint)`` carrying doc /
    token / quality-pass counts.  Works identically on a batch or a
    streaming DataFrame — on a stream it is a single complete-mode
    aggregation whose state is one row per distinct (source, lang,
    fingerprint) triple, the same O(distinct-docs) state class any
    streaming exact-dedup already holds (every feature feeding the key
    and the sums is a row-local map-side expression).

    Feed the finished counter table to :func:`corpus_card_fold` for the
    per-source report.  Jet analog: a mapJournal → groupingKey →
    rolling aggregate DAG (no reference operator; 100 TB ingest-monitor
    extension, r8 verdict #6).
    """
    from hazelcast_jet_spark.operators.text import (
        fingerprint, gopher_quality_flags, token_count)

    flags = gopher_quality_flags(
        text_col, min_words=min_words, max_words=max_words,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_ratio=max_symbol_ratio)
    feats = df.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        fingerprint(text_col).alias("fp"),
        token_count(text_col).alias("__tok"),
        flags["pass"].cast("bigint").alias("__q"),
    )
    return feats.groupBy("source", "lang", "fp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").cast("bigint").alias("n_tokens"),
        F.sum("__q").alias("n_pass"),
    )


def corpus_card_fold(counters: DataFrame,
                     round_digits: int = 6) -> DataFrame:
    """Batch fold of :func:`corpus_card_stream_counters` output into the
    per-source data card — the streamable subset of
    :func:`corpus_data_card` with IDENTICAL conventions (global
    fingerprint-dup membership, (count desc, lang) top-lang tie-break,
    fixed-order rounded shares).  Length percentiles and LSH near-dup
    rates are deliberately absent: order statistics and candidate-pair
    joins are not incrementally maintainable over a stream — the batch
    card covers them on the at-rest corpus.

    Returns per source, ordered by source::

        (source, n_docs, doc_share, n_tokens, token_share,
         exact_dup_rate, quality_pass_rate, n_langs, top_lang,
         top_lang_share)
    """
    # a doc is an exact dup if its fingerprint occurs >1 time CORPUS-WIDE
    # (the corpus_data_card convention) — fold fp totals across sources
    # and langs, then count member docs per source
    fp_tot = (counters.groupBy("fp")
              .agg(F.sum("n_docs").alias("__fp_n")))
    with_dup = (counters.join(fp_tot, "fp")
                .withColumn("__n_exact",
                            F.when(F.col("__fp_n") > 1, F.col("n_docs"))
                            .otherwise(F.lit(0))))
    per_source = with_dup.groupBy("source").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("__n_exact").alias("__n_exact"),
        F.sum("n_pass").alias("__n_pass"),
        F.count_distinct(F.col("lang")).cast("bigint").alias("n_langs"),
    )
    lang_counts = (counters.groupBy("source", "lang")
                   .agg(F.sum("n_docs").alias("__n")))
    wl = Window.partitionBy("source").orderBy(
        F.col("__n").desc(), F.col("lang"))
    top_lang = (lang_counts.withColumn("__rn", F.row_number().over(wl))
                .filter(F.col("__rn") == 1)
                .select("source", F.col("lang").alias("top_lang"),
                        F.col("__n").alias("__top_n")))
    totals = counters.agg(
        F.sum("n_docs").alias("__tot_docs"),
        F.sum("n_tokens").cast("bigint").alias("__tot_tokens"))
    nd = F.col("n_docs").cast("double")

    def _share(num, den):
        return (F.round(num.cast("double") / den.cast("double"),
                        round_digits) + F.lit(0.0))

    return (
        per_source
        .join(F.broadcast(top_lang), "source")
        .crossJoin(F.broadcast(totals))
        .select(
            "source", "n_docs",
            _share(F.col("n_docs"), F.col("__tot_docs")).alias("doc_share"),
            "n_tokens",
            _share(F.col("n_tokens"),
                   F.col("__tot_tokens")).alias("token_share"),
            (F.round(F.col("__n_exact") / nd, round_digits)
             + F.lit(0.0)).alias("exact_dup_rate"),
            (F.round(F.col("__n_pass") / nd, round_digits)
             + F.lit(0.0)).alias("quality_pass_rate"),
            "n_langs", "top_lang",
            (F.round(F.col("__top_n") / nd, round_digits)
             + F.lit(0.0)).alias("top_lang_share"),
        )
        .orderBy("source"))


def mutual_information(df: DataFrame, col_a: str, col_b: str,
                       round_digits: int = 6) -> DataFrame:
    """Mutual information between two categorical columns (nats), with
    marginal entropies and the normalized MI

        MI  = Σ_{a,b} p(a,b) · ln( p(a,b) / (p(a) p(b)) )
        NMI = MI / √(H(a) · H(b))

    — the feature-redundancy / association screen that, unlike
    Cramér's V (:func:`categorical association <cohen_kappa>`-family),
    is comparable across cardinalities and detects ANY dependence, not
    just linear-contingency structure.  NMI ∈ [0, 1]: 0 independent,
    1 a bijection.

    ONE aggregate to the K·L joint-cell table (the only full-data
    shuffle); marginals and totals are window sums on that bounded
    grid; each term is a fixed-order double ``(c/n)·ln((c·n)/(n_a·n_b))``
    rounded to 12 and accumulated in DECIMAL(38,12) (order-free exact —
    the char_entropy convention).  NULL categories count as their own
    level (they carry real association mass); NMI is NULL when either
    marginal entropy is 0 (a constant column carries no information to
    normalize by).

    Returns ONE row ``(n, k_a, k_b, mi, h_a, h_b, nmi)``.
    """
    from pyspark.sql import Window

    cells = (df.groupBy(F.col(col_a).alias("__a"),
                        F.col(col_b).alias("__b"))
             .agg(F.count(F.lit(1)).alias("__c")))
    w_all = Window.partitionBy()
    w_a = Window.partitionBy("__a")
    w_b = Window.partitionBy("__b")
    n = F.sum("__c").over(w_all).cast("double")
    na = F.sum("__c").over(w_a).cast("double")
    nb = F.sum("__c").over(w_b).cast("double")
    c = F.col("__c").cast("double")
    mi_term = F.round((c / n) * F.log((c * n) / (na * nb)), 12)
    d12 = lambda x: F.sum(x.cast("decimal(38,12)")).cast("double")  # noqa: E731
    base = cells.select("__a", "__b", "__c", mi_term.alias("__t"),
                        na.alias("__na"), nb.alias("__nb"), n.alias("__n"))
    # marginal entropy terms fold once per marginal level: only the
    # lexicographically-first cell of each level carries them
    w_fa = Window.partitionBy("__a").orderBy("__b")
    w_fb = Window.partitionBy("__b").orderBy("__a")
    base = (base
            .withColumn("__ra", F.row_number().over(w_fa))
            .withColumn("__rb", F.row_number().over(w_fb)))
    ha_term = F.when(
        F.col("__ra") == 1,
        F.round(-(F.col("__na") / F.col("__n"))
                * F.log(F.col("__na") / F.col("__n")), 12))
    hb_term = F.when(
        F.col("__rb") == 1,
        F.round(-(F.col("__nb") / F.col("__n"))
                * F.log(F.col("__nb") / F.col("__n")), 12))
    agg = base.agg(
        F.max("__n").cast("bigint").alias("n"),
        F.count_distinct("__a").alias("k_a"),
        F.count_distinct("__b").alias("k_b"),
        d12(F.col("__t")).alias("__mi"),
        d12(ha_term).alias("__ha"),
        d12(hb_term).alias("__hb"))
    mi, ha, hb = F.col("__mi"), F.col("__ha"), F.col("__hb")
    nmi = F.when((ha > 0.0) & (hb > 0.0), mi / F.sqrt(ha * hb))
    r6 = lambda x: F.round(x, round_digits) + F.lit(0.0)  # noqa: E731
    return agg.select("n", "k_a", "k_b", r6(mi).alias("mi"),
                      r6(ha).alias("h_a"), r6(hb).alias("h_b"),
                      r6(nmi).alias("nmi"))


def group_ablation(df: DataFrame, group_col: str, metric_cols: list[str],
                   round_digits: int = 6) -> DataFrame:
    """Leave-one-group-out ablation table for additive metrics — the
    data-mixture question a training-data pipeline asks per source:
    "what does the corpus average look like WITHOUT this slice?".  For
    each group g and metric m,

        mean_without(g, m) = (Σm − Σ_g m) / (N − n_g)
        delta(g, m)        = mean_without − mean_overall

    — exact arithmetic on one aggregate's DECIMAL sums, so the whole
    ablation sweep costs ONE scan however many groups there are (a
    naive loop re-aggregates the corpus per group).  A positive delta
    means removing the group RAISES the average — the group drags it
    down.

    Additive metrics only (means of row-level values); ratio-of-sums
    metrics need their numerator and denominator ablated separately
    (pass both as metrics and divide downstream).  NULL metric values
    are excluded per-metric (count tracked per metric, not per row).

    Returns one row per (group, metric): ``(group, metric, n_group,
    mean_overall, mean_without, delta)`` ordered by (group, metric);
    ``mean_without`` NULL for a group that IS the whole corpus.
    """
    from pyspark.sql import Window

    if not metric_cols:
        raise ValueError("group_ablation needs >= 1 metric column")
    melted = df.select(
        F.col(group_col).alias("__g"),
        F.explode(F.array(*[
            F.struct(F.lit(m).alias("metric"),
                     F.col(m).cast("double").alias("__v"))
            for m in metric_cols])).alias("m")
    ).select("__g", "m.metric", "m.__v")
    d12 = lambda x: F.sum(x.cast("decimal(38,12)")).cast("double")  # noqa: E731
    per = (melted.groupBy("__g", "metric")
           .agg(F.count("__v").alias("n_group"),
                d12(F.col("__v")).alias("__s")))
    w_m = Window.partitionBy("metric")
    tot_n = F.sum("n_group").over(w_m)
    tot_s = F.sum("__s").over(w_m)
    mean_all = tot_s / tot_n.cast("double")
    rest_n = (tot_n - F.col("n_group")).cast("double")
    mean_wo = F.when(rest_n > 0.0, (tot_s - F.col("__s")) / rest_n)
    r6 = lambda x: F.round(x, round_digits) + F.lit(0.0)  # noqa: E731
    return (per.select(F.col("__g").alias("group"), "metric", "n_group",
                       r6(mean_all).alias("mean_overall"),
                       r6(mean_wo).alias("mean_without"),
                       r6(mean_wo - mean_all).alias("delta"))
            .orderBy("group", "metric"))


def cohen_kappa(df: DataFrame, col_a: str, col_b: str,
                round_digits: int = 6) -> DataFrame:
    """Cohen's kappa (Cohen 1960): chance-corrected agreement between two
    categorical labelings — the data-QA number behind a confusion matrix
    (two annotators, a heuristic vs a gold column, two model versions).
    kappa = (po − pe) / (1 − pe) with po the observed agreement rate and
    pe = Σ_k (row_k/n)(col_k/n) the agreement expected from the
    marginals alone.

    ONE scan builds the K×K cell table; the marginals, the diagonal and
    the pe sum all fold from those bounded cells (K² rows), so the cost
    is one aggregate however large the input.  The pe terms are exact
    integer products below 2^53 carried as decimal-summed doubles
    (exact to ~9·10^6 items per category; beyond that the products
    round — acceptable for an agreement RATE), and po/pe/kappa are
    fixed-order double arithmetic — engine-replayable.

    Returns ONE row ``(n_items, po, pe, kappa)``.
    """
    cell = (df.groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
            .agg(F.count(F.lit(1)).alias("n")))
    rows = cell.groupBy("a").agg(F.sum("n").alias("ra"))
    cols = cell.groupBy("b").agg(F.sum("n").alias("cb"))
    pe_num = (rows.join(cols, rows["a"] == cols["b"])
              .agg(F.sum((F.col("ra") * F.col("cb")).cast("double")
                         .cast("decimal(38,2)")).cast("double")
                   .alias("__pe_num")))
    base = cell.agg(
        F.sum("n").alias("n_items"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n"))
              .otherwise(F.lit(0))).alias("__diag"))
    n = F.col("n_items").cast("double")
    po = F.col("__diag").cast("double") / n
    pe = F.col("__pe_num") / n / n
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (base.crossJoin(F.broadcast(pe_num))
            .select("n_items", r6(po).alias("po"), r6(pe).alias("pe"),
                    r6((po - pe) / (F.lit(1.0) - pe)).alias("kappa")))


def rfm_segments(df: DataFrame, key_col: str, time_col: str,
                 value_col: str, n_bins: int = 5,
                 round_digits: int = 6) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    customer-analytics rollup: per key, days since last activity, event
    count, and exact-decimal value sum, each scored into ``n_bins``
    quantile bins (ntile; score 1 = best: most recent, most frequent,
    highest value — ties break on the key for determinism), then the
    population counted per (r, f, m) cell.

    Plan at scale: one keyed rollup collapses the raw stream to |keys|
    rows; the three ntile windows run on THAT table (one single-node
    ordered pass each — acceptable to ~10^8 keys; beyond that swap
    ntile for precomputed quantile edges, the quantile_bins shape).
    The reference day anchors to max(time_col) so the result is
    reproducible from the data alone.

    Returns ``(r_score, f_score, m_score, n_keys, avg_monetary)``
    ordered by the three scores.
    """
    # the monetary rollup stays an EXACT decimal all the way to the final
    # per-cell mean (double only for ntile ordering and the one division):
    # re-casting an intermediate double back to decimal is not
    # engine-stable at the rounding grain
    per = df.groupBy(key_col).agg(
        F.max(time_col).alias("__last"),
        F.count(F.lit(1)).alias("__freq"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__mon_dec"))
    anchor = df.agg(F.max(time_col).alias("__anchor"))
    per = (per.crossJoin(F.broadcast(anchor))
           .withColumn("__rec", F.datediff("__anchor", "__last")))
    k = F.col(key_col)
    per = per.select(
        key_col, "__mon_dec",
        F.ntile(n_bins).over(Window.orderBy(F.col("__rec").asc(), k))
        .alias("r_score"),
        F.ntile(n_bins).over(Window.orderBy(F.col("__freq").desc(), k))
        .alias("f_score"),
        F.ntile(n_bins).over(Window.orderBy(
            F.col("__mon_dec").cast("double").desc(), k)).alias("m_score"))
    return (per.groupBy("r_score", "f_score", "m_score")
            .agg(F.count(F.lit(1)).alias("n_keys"),
                 (F.round(F.sum("__mon_dec").cast("double")
                          / F.count(F.lit(1)).cast("double"),
                          round_digits) + F.lit(0.0)).alias("avg_monetary"))
            .orderBy("r_score", "f_score", "m_score"))


def weighted_percentiles(df: DataFrame, value_col: str, weight_col: str,
                         group_col: str, qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                         fine_bins: int = 128,
                         round_digits: int = 6) -> DataFrame:
    """Weighted lower percentiles per group: the smallest value whose
    cumulative weight reaches ``q`` of the group's total — the
    volume-weighted median/quartiles (an unweighted median of order
    lines answers "the typical line"; weighting by quantity answers
    "the typical unit shipped", which is what capacity and pricing
    actually see).

    Engine-stable by construction: weights accumulate as exact decimals
    per DISTINCT value (ties collapse before the scan, so no
    within-value ordering ambiguity), and every threshold compare runs
    on an exact decimal cumulative converted once to double.

    Scale shape — two-phase exact scan, NOT one window over every
    distinct value (a per-group total-order sort serializes on one task
    per group; the single-window form measured 3.2x at a 10x step and
    would sort hundreds of millions of rows per task at 100 TB):

    1. per-(group, range-bin) weight totals over ``fine_bins``
       equal-width bins (bounded: groups x bins rows) locate each
       quantile's TARGET BIN and its exact exclusive-prefix weight;
    2. only the target bins' values (~1/bins of the table, per
       quantile) take the in-bin cumulative window.

    Exactness is unchanged: the bin prefix and the in-bin cumulative
    are the same decimals the full scan would produce, so the selected
    value is identical.

    Returns ``(group, total_weight, wp_<q> ...)`` ordered by group.
    """
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    if fine_bins < 2:
        raise ValueError("fine_bins must be >= 2")
    per_val = df.groupBy(
        F.col(group_col).alias("group"),
        F.col(value_col).alias("__v"),
    ).agg(F.sum(F.col(weight_col).cast("decimal(18,6)")).alias("__w"))
    # materialize the distinct-value aggregate ONCE: it feeds the range
    # probe, the bin totals and the phase-2 fine scan — un-materialized,
    # the input re-aggregates once per reference and the r12 before-plan
    # carried 120 Exchange nodes (ReuseExchange recovers some at
    # runtime, but planning/codegen of the blown-up tree alone cost
    # ~1 s; measured 3.5 -> 2.6 s warm at sf0.1, rows identical)
    per_val = per_val.localCheckpoint()
    # phase 1: equal-width range bins per group (vmin/vmax broadcast);
    # bin index is engine-internal — only the picked VALUES surface
    vr = per_val.groupBy("group").agg(
        F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    width = ((F.col("__hi") - F.col("__lo")).cast("double")
             / F.lit(float(fine_bins)))
    binned = (per_val.join(F.broadcast(vr), "group")
              .withColumn(
                  "__b",
                  F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
                  .otherwise(F.least(
                      F.floor((F.col("__v") - F.col("__lo")).cast("double")
                              / width).cast("int"),
                      F.lit(fine_bins - 1)))))
    bin_tot = binned.groupBy("group", "__b").agg(
        F.sum("__w").alias("__bw"))
    wb = Window.partitionBy("group").orderBy("__b")
    bins = bin_tot.select(
        "group", "__b", "__bw",
        F.sum("__bw").over(wb.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cumb"),
        F.sum("__bw").over(Window.partitionBy("group")).alias("__totw"))
    # groups x fine_bins rows — materialize before the per-quantile
    # probes re-read it (3 probe branches + the total_weight readout)
    bins = bins.localCheckpoint()
    # target bin per quantile: FIRST bin whose end-of-bin cumulative
    # crosses q * total (the first qualifying value lives there)
    targets = None
    for q in qs:
        t = (bins.filter(F.col("__cumb").cast("double")
                         >= F.lit(float(q)) * F.col("__totw").cast("double"))
             .groupBy("group")
             .agg(F.min("__b").alias("__tb")))
        t = (t.join(bins.select("group", F.col("__b").alias("__tb"),
                                "__cumb", "__bw", "__totw"),
                    ["group", "__tb"])
             .select("group", F.lit(float(q)).alias("__q"), "__tb",
                     (F.col("__cumb") - F.col("__bw")).alias("__base"),
                     "__totw"))
        targets = t if targets is None else targets.unionByName(t)
    # phase 2: in-bin cumulative over ONLY the target bins' values
    fine = binned.select("group", "__b", "__v", "__w").join(
        F.broadcast(targets.withColumnRenamed("__tb", "__b")),
        ["group", "__b"])
    wf = Window.partitionBy("group", "__q").orderBy("__v")
    fine = fine.withColumn(
        "__cum",
        (F.col("__base")
         + F.sum("__w").over(wf.rowsBetween(Window.unboundedPreceding, 0)))
        .cast("double"))
    picks = (fine.filter(F.col("__cum")
                         >= F.col("__q") * F.col("__totw").cast("double"))
             .groupBy("group", "__q").agg(F.min("__v").alias("__pick")))
    # one conditional-aggregate pivot instead of one broadcast join per
    # quantile: the per-q join loop re-derived the whole fine subtree
    # per quantile (the other half of the 120-Exchange blow-up); a
    # single aggregate reads `picks` once.  min(when(q)) over one row
    # per (group, q) is exactly that row's pick — values unchanged.
    piv = picks.groupBy("group").agg(*[
        F.min(F.when(F.col("__q") == float(q), F.col("__pick")))
        .alias(f"wp_{str(q).replace('.', '_')}")
        for q in qs])
    out = bins.groupBy("group").agg(
        F.round(F.max(F.col("__totw").cast("double")), round_digits)
        .alias("total_weight"))
    return out.join(F.broadcast(piv), "group", "left").orderBy("group")


def fk_orphan_counts(relations) -> DataFrame:
    """Referential-integrity audit over declared FK relations: for each
    ``(name, child_df, child_key, parent_df, parent_key)``, the child
    row count and how many child rows reference a missing parent — the
    first DQ gate after any ingest/join-graph change (orphans silently
    become dropped rows in every downstream inner join).

    Each relation is one left_anti join (broadcast for dimension-sized
    parents, shuffle otherwise — Catalyst picks) + a count; results
    stack into one tiny frame via unionByName.

    Returns ``(relation, n_child, n_orphans, orphan_rate)`` in the
    declared order of ``relations`` (ordered by relation name).
    """
    out = None
    for name, child, ckey, parent, pkey in relations:
        c = child.select(F.col(ckey).alias("__k"))
        p = parent.select(F.col(pkey).alias("__k")).distinct()
        # an orphan is a NON-NULL key missing from the parent: a NULL FK
        # is "optional", not broken (and NULL semantics differ between
        # an anti-join and SQL NOT IN — pin the non-NULL definition)
        orphans = c.filter(F.col("__k").isNotNull()).join(p, "__k",
                                                          "left_anti")
        row = c.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
        ).select(
            F.lit(name).alias("relation"), "n_child", "n_orphans",
            (F.round(F.col("n_orphans").cast("double")
                     / F.col("n_child").cast("double"), 6)
             + F.lit(0.0)).alias("orphan_rate"))
        out = row if out is None else out.unionByName(row)
    return out.orderBy("relation")


def pareto_front(df: DataFrame, maximize_col: str, minimize_col: str,
                 group_cols: list[str] | None = None) -> DataFrame:
    """2-D Pareto frontier (skyline operator; Börzsönyi et al. 2001
    "The Skyline Operator"): the rows not dominated by any other row
    when ``maximize_col`` should be as large and ``minimize_col`` as
    small as possible — the price/performance shortlist every catalog
    query ("cheapest part at each size class or better") reduces to.

    Scale shape: the classic O(n log n) 2-D skyline — collapse to one
    row per level of ``maximize_col`` (min of ``minimize_col`` + the
    count of rows achieving it: the ONLY full-data aggregate), then a
    cumulative-min window over the tiny level table, descending: a
    level is on the frontier iff its best value strictly beats the
    best among all strictly-higher levels.  No self-join, no
    quadratic dominance test; the window table is |distinct levels|.

    Returns ``(group_cols..., <maximize_col>, best_<minimize_col>,
    n_best)`` — frontier levels only, ordered by (group, level desc).
    Pure comparisons and MIN — no float arithmetic, so results are
    engine-exact by construction.
    """
    gcols = list(group_cols or [])
    per_row_best = Window.partitionBy(*gcols, maximize_col)
    lev = (df.withColumn("__best", F.min(minimize_col).over(per_row_best))
           .filter(F.col(minimize_col) == F.col("__best"))
           .groupBy(*gcols, maximize_col)
           .agg(F.min(minimize_col).alias(f"best_{minimize_col}"),
                F.count(F.lit(1)).alias("n_best")))
    wpart = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    w_prior = (wpart.orderBy(F.col(maximize_col).desc())
               .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.min(f"best_{minimize_col}").over(w_prior)
    return (lev.withColumn("__prior", prior)
            .filter(F.col("__prior").isNull()
                    | (F.col(f"best_{minimize_col}") < F.col("__prior")))
            .drop("__prior")
            .orderBy(*gcols, F.col(maximize_col).desc()))


def table_fingerprint(df: DataFrame, cols: list[str],
                      group_cols: list[str] | None = None,
                      null_sentinel: str = "<NULL>") -> DataFrame:
    """Order-free table fingerprint for cross-engine / cross-copy
    reconciliation: per group, the row count plus an md5-derived
    checksum that any SQL engine can recompute over its own copy —
    THE migration/replication audit ("does the replica hold exactly
    these rows?") without shipping or sorting either side.

    checksum = (Σ over rows of the first 48 bits of
    ``md5(concat_ws(US, coalesce(col::string, sentinel)...))``)
    mod 2^61−1 — commutative, so no ordering requirement and no
    shuffle beyond the one per-group aggregate; min/max hash give
    cheap spot probes for WHERE a mismatch lives (binary-search by
    re-fingerprinting halves).  A sum (not xor) also catches
    duplicated-row divergence of even multiplicity.  The Mersenne
    modulus keeps the OUTPUT a plain BIGINT: a DECIMAL(38,0) output
    column is not driver-representation-safe (the r5
    hll_cardinality_events red-row class — DuckDB's pandas path
    coerces >18-precision decimals to float64), caught here by the
    in-suite type invariants; the exact sum still accumulates in
    DECIMAL(38,0) internally, so no overflow before the mod at any
    row count up to ~10^26.

    Caveats (documented contract): columns must have engine-stable
    string casts (ints/strings/dates — NOT doubles, whose formatting
    is engine-specific), and values must not contain the unit
    separator.

    Returns ``(group_cols..., n_rows, checksum, min_hash, max_hash)``
    ordered by group.
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(null_sentinel))
             for c in cols]
    h = F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 12)
    hv = F.conv(h, 16, 10).cast("decimal(38,0)")
    mod = F.lit((1 << 61) - 1).cast("decimal(38,0)")
    gcols = list(group_cols or [])
    out = df.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.pmod(F.sum(hv), mod).cast("bigint").alias("checksum"),
        F.min(h).alias("min_hash"),
        F.max(h).alias("max_hash"))
    return out.orderBy(*gcols) if gcols else out


def k_anonymity(df: DataFrame, quasi_cols: list[str],
                ks: tuple = (2, 5, 10, 20),
                round_digits: int = 6) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over a quasi-identifier set:
    for each threshold k, how many equivalence classes (distinct
    quasi-identifier combinations) hold FEWER than k rows, how many
    rows sit in them, and the re-identifiable share — the
    privacy-governance screen run before any dataset leaves the
    boundary (a row in a size-1 class is uniquely re-identifiable from
    its quasi-identifiers alone).

    One groupBy on the quasi-identifier tuple (the only full-data
    shuffle), then conditional sums over the class-size table — the ks
    come out of ONE pass, not |ks| scans.  Exact integer counts, one
    rounded share.

    Returns ``(k, n_risky_classes, n_risky_rows, risky_share)``
    ordered by k.
    """
    classes = (df.groupBy(*quasi_cols)
               .agg(F.count(F.lit(1)).alias("__n")))
    total = F.sum("__n")
    aggs = [F.count(F.lit(1)).alias("__classes"), total.alias("__rows")]
    for k in ks:
        aggs.append(F.sum((F.col("__n") < k).cast("bigint"))
                    .alias(f"__c{k}"))
        aggs.append(F.sum(F.when(F.col("__n") < k, F.col("__n"))
                          .otherwise(F.lit(0))).alias(f"__r{k}"))
    one = classes.agg(*aggs)
    rows = F.explode(F.array(*[
        F.struct(F.lit(k).alias("k"),
                 F.col(f"__c{k}").alias("n_risky_classes"),
                 F.col(f"__r{k}").alias("n_risky_rows"),
                 (F.round(F.col(f"__r{k}").cast("double")
                          / F.col("__rows").cast("double"),
                          round_digits) + F.lit(0.0))
                 .alias("risky_share"))
        for k in ks]))
    return (one.select(rows.alias("o")).select("o.*").orderBy("k"))


def l_diversity(df: DataFrame, quasi_cols: list[str], sensitive_col: str,
                ls: tuple = (2, 3, 5),
                round_digits: int = 6) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the attack
    k-anonymity misses: a large equivalence class whose SENSITIVE value
    is constant still discloses it (homogeneity attack).  For each
    threshold l, the classes holding fewer than l distinct sensitive
    values, the rows in them, and the disclosed share.

    Same single-pass shape as :func:`k_anonymity`: one groupBy on the
    quasi-identifier tuple computing (rows, distinct sensitive), then
    conditional sums over the class table for every l at once.

    Returns ``(l, n_weak_classes, n_weak_rows, weak_share)`` ordered
    by l.
    """
    classes = (df.groupBy(*quasi_cols)
               .agg(F.count(F.lit(1)).alias("__n"),
                    F.countDistinct(sensitive_col).alias("__d")))
    aggs = [F.sum("__n").alias("__rows")]
    for l in ls:
        aggs.append(F.sum((F.col("__d") < l).cast("bigint"))
                    .alias(f"__c{l}"))
        aggs.append(F.sum(F.when(F.col("__d") < l, F.col("__n"))
                          .otherwise(F.lit(0))).alias(f"__r{l}"))
    one = classes.agg(*aggs)
    rows = F.explode(F.array(*[
        F.struct(F.lit(l).alias("l"),
                 F.col(f"__c{l}").alias("n_weak_classes"),
                 F.col(f"__r{l}").alias("n_weak_rows"),
                 (F.round(F.col(f"__r{l}").cast("double")
                          / F.col("__rows").cast("double"),
                          round_digits) + F.lit(0.0))
                 .alias("weak_share"))
        for l in ls]))
    return (one.select(rows.alias("o")).select("o.*").orderBy("l"))


def t_closeness(df: DataFrame, quasi_cols: list[str], sensitive_col: str,
                ts: tuple = (0.2, 0.3, 0.5),
                round_digits: int = 6) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    SKEWNESS attack l-diversity misses: a class can hold l distinct
    sensitive values yet still leak if its distribution is far from the
    table's (a class that is 90% one segment against a uniform global
    mix discloses that segment with high confidence).  For a categorical
    sensitive attribute the distance is total variation

        TVD(class) = ½ · Σ_v |n_cv/n_c − N_v/N|

    summed over the GLOBAL value inventory (absent values count — a
    class missing a common value is also skewed).  For each threshold t,
    the classes with TVD > t, the rows in them, and the disclosed share
    — completing the k-anonymity / l-diversity / t-closeness triad.

    Plan: ONE scan to the (class, value) cell table; class totals,
    value totals and the grand total all derive from the cells
    (map-side-combined aggregates over a bounded frame); the
    class×value grid is a cross join of two BOUNDED dimension tables
    with the cells left-joined back.  Per-cell terms are fixed-order
    double quotients of exact counts; the per-class sum accumulates in
    DECIMAL(28,12) so it is order-free and engine-portable (the
    :func:`w1_drift` discipline — the threshold compare runs on the
    UNROUNDED statistic).

    Returns ``(t, n_weak_classes, n_weak_rows, weak_share)`` ordered
    by t.
    """
    cells = (df.groupBy(*quasi_cols, sensitive_col)
             .agg(F.count(F.lit(1)).alias("__ncv")))
    classes = cells.groupBy(*quasi_cols).agg(F.sum("__ncv").alias("__nc"))
    values = (cells.groupBy(sensitive_col)
              .agg(F.sum("__ncv").alias("__nv")))
    total = cells.agg(F.sum("__ncv").alias("__n"))
    grid = (classes.crossJoin(F.broadcast(values))
            .crossJoin(F.broadcast(total))
            .join(cells, [*quasi_cols, sensitive_col], "left"))
    term = F.abs(
        F.coalesce(F.col("__ncv"), F.lit(0)).cast("double")
        / F.col("__nc").cast("double")
        - F.col("__nv").cast("double") / F.col("__n").cast("double"))
    tvd_tbl = (grid.groupBy(*quasi_cols)
               .agg(F.max("__nc").alias("__nc"),
                    (F.lit(0.5) * F.sum(term.cast("decimal(28,12)"))
                     .cast("double")).alias("__tvd")))
    # internal aliases keyed by the threshold's ENUMERATION INDEX, not a
    # scaled value: int(t*100) collided for thresholds equal at the
    # hundredth grain (ts=(0.005, 0.008) -> duplicate __c0) and raised an
    # ambiguous-column AnalysisException (ADVICE r11)
    aggs = [F.sum("__nc").alias("__rows")]
    for i, t in enumerate(ts):
        aggs.append(F.sum((F.col("__tvd") > t).cast("bigint"))
                    .alias(f"__c{i}"))
        aggs.append(F.sum(F.when(F.col("__tvd") > t, F.col("__nc"))
                          .otherwise(F.lit(0)))
                    .alias(f"__r{i}"))
    one = tvd_tbl.agg(*aggs)
    rows = F.explode(F.array(*[
        F.struct(F.lit(float(t)).alias("t"),
                 F.col(f"__c{i}").alias("n_weak_classes"),
                 F.col(f"__r{i}").alias("n_weak_rows"),
                 (F.round(F.col(f"__r{i}").cast("double")
                          / F.col("__rows").cast("double"),
                          round_digits) + F.lit(0.0))
                 .alias("weak_share"))
        for i, t in enumerate(ts)]))
    return (one.select(rows.alias("o")).select("o.*").orderBy("t"))


#: 16^12 — the md5 12-hex-digit uniform space (matches operators/sampling)
_DP_SPACE = float(1 << 48)


def dp_noisy_counts(df: DataFrame, group_cols: list[str], epsilon: float,
                    seed: str = "dp0", domain: DataFrame | None = None,
                    round_digits: int = 6) -> DataFrame:
    """ε-differentially-private count release (Dwork et al. 2006): per
    group, ``count + Laplace(1/ε)`` — counting queries have sensitivity
    1, so Laplace noise with scale 1/ε gives ε-DP.  The governance twin
    of :func:`k_anonymity`: instead of suppressing small groups, every
    released count is perturbed just enough that one individual's
    presence is statistically deniable.

    The noise is DETERMINISTIC-BY-SEED: the per-group uniform is the
    12-hex-digit md5 prefix of ``seed || group key`` (the
    operators/sampling convention), centered to (0,1) with a half-step
    offset so the inverse-CDF

        noise = −(1/ε) · sign(u − ½) · ln(1 − 2·|u − ½|)

    never sees ln(0).  Seeded noise makes reruns, retries and SQL
    oracles replay the identical release — essential for testing the
    pipeline; a PRODUCTION release must draw fresh physical randomness
    instead (a replayable seed leaks the noise to anyone who knows it),
    which callers do by passing a secret, rotated seed.

    GROUP PRESENCE is itself a signal (review r9): without a fixed
    domain, a group appears in the release iff it has ≥1 member, so a
    singleton group's row reveals that individual's presence with
    probability 1 regardless of ε.  Pass ``domain`` — a DataFrame of
    ALL releasable group keys, known independently of the data (the
    nation list, the enum of event types) — and every domain group is
    released with noise added to its (possibly zero) count, restoring
    the DP guarantee.  Without ``domain`` the release is only ε-DP
    conditioned on the group set being public knowledge; the docstring
    contract, not a silent assumption.

    ONE aggregate (map-side partial), then row-local noise arithmetic
    on the tiny group table — ln()'s sub-ulp libm variance is absorbed
    by round-6.

    Returns ``(group_cols..., noisy_count)`` ordered by the group
    columns — the TRUE count never leaves the operator.
    """
    if epsilon <= 0.0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    per = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    if domain is not None:
        per = (domain.select(*group_cols).distinct()
               .join(per, list(group_cols), "left")
               .select(*group_cols,
                       F.coalesce("__n", F.lit(0)).alias("__n")))
    key = _dp_group_key(group_cols)
    noise = dp_laplace_noise(key, epsilon, seed)
    return (per.select(
        *group_cols,
        (F.round(F.col("__n").cast("double") + noise, round_digits)
         + F.lit(0.0)).alias("noisy_count"))
        .orderBy(*group_cols))


def _dp_group_key(group_cols: list[str]) -> Column:
    """Collision-free noise key for a group tuple.  A plain
    ``concat_ws('|', ...)`` lets two DIFFERENT multi-column groups
    collide when a value contains the separator (('a|b','c') vs
    ('a','b|c')) or when NULL and '' meet — colliding groups would
    receive IDENTICAL Laplace draws, weakening the release's noise
    independence (ADVICE r9).  Each component is therefore
    length-prefixed (``<len>:<value>``; NULL → ``~``), which makes the
    joined encoding prefix-free and hence injective.  Single-column
    keys stay the raw string cast — no boundary exists, and the
    released oracles replay that form."""
    if len(group_cols) == 1:
        return F.col(group_cols[0]).cast("string")
    parts = []
    for c in group_cols:
        s = F.col(c).cast("string")
        parts.append(F.when(s.isNull(), F.lit("~"))
                     .otherwise(F.concat(F.length(s).cast("string"),
                                         F.lit(":"), s)))
    return F.concat_ws("|", *parts)


def dp_laplace_noise(key: Column, epsilon: float,
                     seed: str = "dp0") -> Column:
    """The seeded Laplace(1/ε) draw :func:`dp_noisy_counts` adds: md5
    12-hex uniform (half-step-offset so ln never sees 0) through the
    inverse CDF.  Exposed so streaming releases apply the SAME noise to
    every emission of a group (a fresh draw per emission would leak the
    true count by averaging — ε composes over independent draws)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(seed + "-"),
                                          key.cast("string"))), 1, 12),
               16, 10).cast("bigint").cast("double")
    centered = (h + F.lit(0.5)) / F.lit(_DP_SPACE) - F.lit(0.5)
    return (F.lit(-1.0 / epsilon) * F.signum(centered)
            * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered)))


def median_ci(df: DataFrame, value_col: str,
              group_cols: list[str] | None = None,
              z: float = 1.9599639845400545,
              round_digits: int = 6) -> DataFrame:
    """Distribution-free confidence interval for the MEDIAN via order
    statistics (the binomial/sign-test construction, normal-
    approximated): with n sorted values, the interval

        [ x_(l) , x_(u) ],  l = ⌊n/2 − z·√n/2⌋,  u = ⌈n/2 + z·√n/2⌉ + 1

    covers the true median with ≈95% confidence (z=1.96) for ANY
    continuous distribution — no variance estimate, no normality
    assumption; the robust companion to a mean ± t·se readout.

    Everything is rank SELECTION on integer bounds (engine-exact): one
    ordering window per group over the scalar (group, value)
    projection, ranks compared against the closed-form bounds.  The
    median itself is the lower median (rank ⌈n/2⌉ — the
    theil_sen_trend convention).  The window sorts each GROUP in one
    task (parallelism = |groups|): past ~10⁸ rows per group swap the
    selection for the two-phase exact bin scan
    (:func:`weighted_percentiles`'s shape) — the 10× probe shows the
    2.2× superlinear growth this caveat predicts.

    Returns ``(group_cols..., n, median, ci_lo, ci_hi)`` ordered by
    group.
    """
    from pyspark.sql import Window

    gcols = list(group_cols or [])
    v = F.col(value_col).cast("double")
    wpart = (Window.partitionBy(*gcols) if gcols
             else Window.partitionBy())
    w_rank = wpart.orderBy(F.col("__v"))
    w_all = wpart.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    nd = F.col("__n").cast("double")
    half = nd / F.lit(2.0)
    spread = F.lit(float(z)) * F.sqrt(nd) / F.lit(2.0)
    lo_rank = F.greatest(F.lit(1).cast("bigint"),
                         F.floor(half - spread))
    hi_rank = F.least(F.col("__n"),
                      F.ceil(half + spread) + F.lit(1))
    med_rank = F.ceil(nd / F.lit(2.0))
    # NULL values are excluded BEFORE ranking (engines disagree on
    # NULL ordering, and a NULL has no rank)
    ranked = (df.select(*gcols, v.alias("__v"))
              .filter(F.col("__v").isNotNull())
              .withColumn("__rn", F.row_number().over(w_rank))
              .withColumn("__n", F.count(F.lit(1)).over(w_all)))
    pick = lambda rank_expr: F.max(  # noqa: E731
        F.when(F.col("__rn") == rank_expr, F.col("__v")))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    out = (ranked.groupBy(*gcols)
           .agg(F.max("__n").alias("n"),
                pick(med_rank).alias("__med"),
                pick(lo_rank).alias("__lo"),
                pick(hi_rank).alias("__hi"))
           .select(*gcols, "n", r6(F.col("__med")).alias("median"),
                   r6(F.col("__lo")).alias("ci_lo"),
                   r6(F.col("__hi")).alias("ci_hi")))
    return out.orderBy(*gcols) if gcols else out


def capture_recapture(df: DataFrame, key_col: str, in_a: Column,
                      in_b: Column,
                      round_digits: int = 6) -> DataFrame:
    """Chapman's capture-recapture population estimate (Chapman 1951;
    the bias-corrected Lincoln-Petersen index): from two overlapping
    observation windows A and B over the same population,

        N̂  = (n_A + 1)(n_B + 1) / (m + 1) − 1
        var = (n_A+1)(n_B+1)(n_A−m)(n_B−m) / ((m+1)²(m+2))

    with ``m`` the keys seen in BOTH — the "how many users exist that
    we have never observed?" estimator (census undercount, dedup
    universe sizing) that works when you cannot enumerate the
    population.  Assumes equal catchability across windows —
    documented, as ever violated in practice (heavy users are caught
    in both), which biases N̂ low.

    ONE distinct-compaction aggregate (key, seen_a, seen_b) then a
    1-row count aggregate; the estimate is closed-form doubles on
    exact BIGINTs.

    Returns ONE row ``(n_a, n_b, n_both, n_observed, n_hat, se)``.
    """
    per = (df.select(F.col(key_col).alias("__k"),
                     in_a.cast("boolean").alias("__a"),
                     in_b.cast("boolean").alias("__b"))
           .groupBy("__k")
           .agg(F.max("__a").alias("__ia"), F.max("__b").alias("__ib"))
           .filter(F.col("__ia") | F.col("__ib")))
    agg = per.agg(
        F.sum(F.col("__ia").cast("bigint")).alias("n_a"),
        F.sum(F.col("__ib").cast("bigint")).alias("n_b"),
        F.sum((F.col("__ia") & F.col("__ib")).cast("bigint"))
        .alias("n_both"),
        F.count(F.lit(1)).alias("n_observed"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    m = F.col("n_both").cast("double")
    n_hat = ((na + 1.0) * (nb + 1.0) / (m + 1.0)) - 1.0
    var = ((na + 1.0) * (nb + 1.0) * (na - m) * (nb - m)
           / ((m + 1.0) * (m + 1.0) * (m + 2.0)))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return agg.select("n_a", "n_b", "n_both", "n_observed",
                      r6(n_hat).alias("n_hat"),
                      r6(F.sqrt(var)).alias("se"))


def fd_violations(df: DataFrame, fds: list[tuple[list[str], str]],
                  round_digits: int = 6) -> DataFrame:
    """Approximate-functional-dependency profiling (Kivinen & Mannila
    1995; the TANE error measure, Huhtala et al. 1999): for each
    candidate FD ``lhs → rhs`` report how far the data is from
    satisfying it —

    * ``n_groups`` — distinct lhs value combinations,
    * ``n_violating`` — lhs groups holding >1 distinct rhs value,
    * ``g3_error`` — the **minimum fraction of rows to delete** for the
      FD to hold exactly: ``(N − Σ_g max_v |rows in g with rhs=v|)/N``
      (the g₃ measure — the standard AFD error because it has that
      operational deletion meaning).

    The discovery primitive behind schema inference, key detection and
    pipeline data-contract checks ("does user_id still determine
    country?").  Plan per FD: one (lhs, rhs) count aggregate, one lhs
    re-aggregate — two shuffles on the FD's own keys, map-side
    combined; candidate FDs are unioned into one result (each leg
    prunes to its own columns, so a 100-column table at 100 TB reads
    only the profiled columns).  Rows with NULL in lhs or rhs are
    excluded (SQL grouping semantics would conflate NULL groups across
    engines).  Returns one row per FD: ``(fd, n_rows, n_groups,
    n_violating, g3_error)`` ordered by fd.
    """
    if not fds:
        raise ValueError("fds must name at least one candidate "
                         "lhs -> rhs dependency")
    legs = []
    for lhs, rhs in fds:
        lhs = [lhs] if isinstance(lhs, str) else list(lhs)
        name = ",".join(lhs) + "->" + rhs
        base = df.select(*lhs, rhs).na.drop(subset=[*lhs, rhs])
        cell = (base.groupBy(*lhs, rhs)
                .agg(F.count(F.lit(1)).alias("__c")))
        grp = (cell.groupBy(*lhs)
               .agg(F.sum("__c").alias("__n"),
                    F.max("__c").alias("__keep"),
                    F.count(F.lit(1)).alias("__nv")))
        legs.append(grp.agg(
            F.lit(name).alias("fd"),
            F.sum("__n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("__nv") > 1).cast("bigint")).alias("n_violating"),
            (F.round(
                (F.sum("__n") - F.sum("__keep")).cast("double")
                / F.sum("__n").cast("double"), round_digits)
             + F.lit(0.0)).alias("g3_error")))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("fd")


def ucc_profile(df: DataFrame, candidates: list[list[str]],
                round_digits: int = 6) -> DataFrame:
    """Unique-column-combination profiling (the key-discovery
    complement of :func:`fd_violations`; Heise et al. 2013 "Scalable
    Discovery of Unique Column Combinations" frames the search — this
    operator VERIFIES a candidate list): for each candidate column set
    report whether it is a key and how far from one it is —

    * ``n_groups`` — distinct value combinations,
    * ``max_mult`` — the largest group (1 ⇔ unique),
    * ``is_unique`` — the key verdict,
    * ``dup_fraction`` — the fraction of rows to delete for uniqueness
      (``(N − n_groups)/N``, the g₃ measure specialized to keys).

    Plan per candidate: ONE count aggregate on its own pruned columns,
    map-side combined, then a scalar fold — candidates union into one
    result, so a wide table at 100 TB reads only the profiled columns.
    Rows with NULL in any candidate column are excluded (engines
    disagree on NULL grouping identity).  Returns one row per
    candidate: ``(ucc, n_rows, n_groups, max_mult, is_unique,
    dup_fraction)`` ordered by ucc.
    """
    if not candidates:
        raise ValueError("candidates must name at least one column set")
    legs = []
    for cols in candidates:
        cols = [cols] if isinstance(cols, str) else list(cols)
        name = ",".join(cols)
        base = df.select(*cols).na.drop(subset=cols)
        grp = base.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
        legs.append(grp.agg(
            F.lit(name).alias("ucc"),
            F.sum("__c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_groups"),
            F.max("__c").alias("max_mult"),
            (F.max("__c") == 1).alias("is_unique"),
            (F.round(
                (F.sum("__c") - F.count(F.lit(1))).cast("double")
                / F.sum("__c").cast("double"), round_digits)
             + F.lit(0.0)).alias("dup_fraction")))
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("ucc")
