"""Experiment-analysis operators: deterministic A/B assignment, CUPED
variance reduction, and multi-touch attribution — the product-analytics
lane downstream of the event/KPI queries (no reference analog: Jet users
build these as groupAndAggregate chains; batch Spark expresses them as
two aggregates and a broadcast of the tiny arm/theta table).

Scale notes
-----------
- Assignment is a pure function of the unit key via md5 (the
  operators/sampling.py convention): no stored assignment table, no
  shuffle, replayable by any engine — the property a 100 TB experiment
  readout needs (recompute > join against a 10 B-row assignment dim).
- CUPED needs exactly TWO aggregates over the unit table: one global
  (theta from decimal-exact moment sums, broadcast scalar) and one
  per-arm.  The unit table itself is the one real shuffle (groupBy
  unit), already paid by any per-unit metric.
- Attribution is two aggregates on the same user_id key (conversion
  lookup, then conditional min_by/max_by bookends) — no window, no
  per-user sort, no duplicated subtrees.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ab_assign(key: Column, seed: str = "ab1", arms: tuple = ("A", "B"),
              split_hex: str = "8") -> Column:
    """Deterministic 2-arm assignment: first hex char of
    ``md5(seed || key)`` below ``split_hex`` → ``arms[0]`` else
    ``arms[1]`` ('8' = 50/50; '4' = 25/75).  Uniform over keys,
    engine-portable (any SQL engine's md5 replays the arm), and
    collision-free with sampling seeds by namespace discipline.
    """
    h = F.substring(F.md5(F.concat(F.lit(seed + "-"), key.cast("string"))),
                    1, 1)
    return (F.when(h < F.lit(split_hex), F.lit(arms[0]))
            .otherwise(F.lit(arms[1])))


def cuped_adjusted_means(units: DataFrame, arm_col: str, pre_col: str,
                         post_col: str,
                         round_digits: int = 6) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker 2013): with a pre-experiment covariate X and metric Y,

        theta = cov(X, Y) / var(X)
        Y_adj = Y - theta * (X - mean(X))

    removes the pre-period component of the variance (1 - rho^2
    remains), tightening the arm-mean confidence without bias (theta is
    pooled across arms, mean(X) is global).

    Input is ONE ROW PER UNIT (build it with the per-unit metric
    groupBy you already pay).  Moments are DECIMAL(38,12)-accumulated
    sums (order-free exact, engine-portable); theta and the adjusted
    means are a handful of double ops on those exact sums.

    Returns one row per arm: ``(arm, n_units, mean_pre, mean_post,
    mean_adj, theta)`` ordered by arm — ``theta`` repeated per row for
    readout convenience.

    A zero-variance covariate (constant X) leaves theta undefined; this
    raises at execution time (``raise_error`` inside the theta branch —
    the guard is lazy, so non-degenerate plans are unchanged) instead of
    silently emitting NULL adjusted means (ADVICE r8).
    """
    x = F.col(pre_col).cast("double")
    y = F.col(post_col).cast("double")
    d = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    glob = units.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        d(x).alias("__sx"), d(y).alias("__sy"),
        d(x * y).alias("__sxy"), d(x * x).alias("__sxx"))
    var_x = F.col("__sxx") - F.col("__sx") * F.col("__sx") / F.col("__n")
    theta_raw = ((F.col("__sxy")
                  - F.col("__sx") * F.col("__sy") / F.col("__n")) / var_x)
    theta = F.when(
        var_x == F.lit(0.0),
        F.raise_error(F.lit(
            "cuped_adjusted_means: zero-variance pre-period covariate "
            "(var(X)=0) — theta is undefined; drop the covariate or "
            "report unadjusted means")).cast("double"),
    ).otherwise(theta_raw)
    g = glob.select(theta.alias("__theta"),
                    (F.col("__sx") / F.col("__n")).alias("__mx"))
    arms = units.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n_units"),
        d(x).alias("__ax"), d(y).alias("__ay"))
    n = F.col("n_units").cast("double")
    mean_pre = F.col("__ax") / n
    mean_post = F.col("__ay") / n
    adj = mean_post - F.col("__theta") * (mean_pre - F.col("__mx"))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (arms.crossJoin(F.broadcast(g))
            .select("arm", "n_units",
                    r6(mean_pre).alias("mean_pre"),
                    r6(mean_post).alias("mean_post"),
                    r6(adj).alias("mean_adj"),
                    r6(F.col("__theta")).alias("theta"))
            .orderBy("arm"))


def post_stratified_ate(units: DataFrame, arm_col: str, y_col: str,
                        stratum_col: str, arms: tuple = ("A", "B"),
                        round_digits: int = 6) -> DataFrame:
    """Post-stratified average treatment effect (Miratrix, Sekhon & Yu
    2013): stratify AFTER randomization on a pre-treatment covariate and
    weight the per-stratum arm contrasts by stratum size,

        ATE_ps  = Σ_s w_s · (ȳ_sB − ȳ_sA),      w_s = n_s / N
        Var_ps  = Σ_s w_s² · (s²_sA/n_sA + s²_sB/n_sB)

    — removes the chance covariate imbalance a raw difference-in-means
    carries (most of blocking's variance reduction, paid at analysis
    time instead of design time).  Strata need both arms with ≥ 2 units
    (the variance needs a sample variance per cell); smaller strata are
    EXCLUDED and the weights renormalize over the included total —
    reported via ``n_strata_used``/``n_units_used`` beside the raw
    all-units contrast for comparison.

    One (stratum, arm) cell aggregate over the unit table (bounded by
    the stratum inventory), then a one-row fold: per-cell moments are
    DECIMAL(38,12)-accumulated exact sums; per-stratum terms are
    fixed-order doubles that re-accumulate in DECIMAL — order-free and
    engine-portable end to end.  z and the two-sided p use the shared
    :func:`two_sided_p` polynomial tail.

    Returns ONE row ``(n_units, n_strata_used, n_units_used, ate_raw,
    ate_ps, se_ps, z, p_value)``; z/p are NULL when the variance
    degenerates to 0.
    """
    a0, a1 = arms
    y = F.col(y_col).cast("double")
    isa = F.col(arm_col) == F.lit(a0)
    isb = F.col(arm_col) == F.lit(a1)
    d = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    cells = units.groupBy(F.col(stratum_col).alias("__s")).agg(
        F.sum(isa.cast("bigint")).alias("__na"),
        F.sum(isb.cast("bigint")).alias("__nb"),
        F.coalesce(d(F.when(isa, y)), F.lit(0.0)).alias("__sa"),
        F.coalesce(d(F.when(isb, y)), F.lit(0.0)).alias("__sb"),
        F.coalesce(d(F.when(isa, y * y)), F.lit(0.0)).alias("__qa"),
        F.coalesce(d(F.when(isb, y * y)), F.lit(0.0)).alias("__qb"))
    raw = cells.agg(
        F.sum(F.col("__na") + F.col("__nb")).alias("n_units"),
        F.coalesce(d(F.col("__sa")), F.lit(0.0)).alias("__ta"),
        F.coalesce(d(F.col("__sb")), F.lit(0.0)).alias("__tb"),
        F.sum("__na").alias("__tna"), F.sum("__nb").alias("__tnb"))
    inc = cells.filter((F.col("__na") >= 2) & (F.col("__nb") >= 2))
    tot = inc.agg(F.sum(F.col("__na") + F.col("__nb")).alias("__nt"))
    na = F.col("__na").cast("double")
    nb = F.col("__nb").cast("double")
    w = (na + nb) / F.col("__nt").cast("double")
    ma = F.col("__sa") / na
    mb = F.col("__sb") / nb
    va = (F.col("__qa") - F.col("__sa") * F.col("__sa") / na) / (na - 1.0)
    vb = (F.col("__qb") - F.col("__sb") * F.col("__sb") / nb) / (nb - 1.0)
    folded = (inc.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).alias("n_strata_used"),
        F.sum(F.col("__na") + F.col("__nb")).alias("n_units_used"),
        F.coalesce(d(w * (mb - ma)), F.lit(0.0)).alias("__ate"),
        F.coalesce(d(w * w * (va / na + vb / nb)), F.lit(0.0))
        .alias("__var")))
    se = F.sqrt(F.col("__var"))
    z = F.when(se > 0.0, F.col("__ate") / se)
    ate_raw = (F.col("__tb") / F.col("__tnb").cast("double")
               - F.col("__ta") / F.col("__tna").cast("double"))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (raw.crossJoin(F.broadcast(folded)).select(
        "n_units", "n_strata_used", "n_units_used",
        r6(ate_raw).alias("ate_raw"),
        r6(F.col("__ate")).alias("ate_ps"),
        r6(se).alias("se_ps"),
        r6(z).alias("z"),
        r6(F.when(se > 0.0, two_sided_p(z))).alias("p_value")))


def ratio_metric_delta(units: DataFrame, arm_col: str, num_col: str,
                       den_col: str, arms: tuple = ("A", "B"),
                       round_digits: int = 6) -> DataFrame:
    """Delta-method readout for a RATIO-OF-SUMS metric (Fieller/delta
    method; Deng, Knoblich & Lu 2018): metrics like revenue-per-order or
    clicks-per-session are ``Σx/Σy`` over units, and the naive
    per-unit-mean t-test is WRONG because numerator and denominator are
    correlated within a unit.  Per arm,

        R = x̄/ȳ,   Var(R) ≈ (S_xx − 2R·S_xy + R²·S_yy) / (n·ȳ²)

    with S the ddof-1 sample (co)variances — the first-order Taylor
    variance of the ratio — then the two-arm contrast z = ΔR/SE with
    the shared :func:`two_sided_p` tail.

    One (arm) aggregate of DECIMAL(38,12)-exact moments (n, Σx, Σy,
    Σxx, Σxy, Σyy); everything downstream is fixed-order doubles on
    those sums.  Units with 0 denominator are fine (they just carry
    mass); an arm with ȳ = 0 or n < 2 yields NULL variance → NULL z/p.

    Returns ONE row ``(n_a, n_b, ratio_a, ratio_b, diff, se, z,
    p_value)``.
    """
    a0, a1 = arms
    x = F.col(num_col).cast("double")
    y = F.col(den_col).cast("double")
    d = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731

    def arm_stats(tag, pred):
        return [
            F.sum(pred.cast("bigint")).alias(f"n_{tag}"),
            F.coalesce(d(F.when(pred, x)), F.lit(0.0)).alias(f"sx_{tag}"),
            F.coalesce(d(F.when(pred, y)), F.lit(0.0)).alias(f"sy_{tag}"),
            F.coalesce(d(F.when(pred, x * x)), F.lit(0.0))
            .alias(f"sxx_{tag}"),
            F.coalesce(d(F.when(pred, x * y)), F.lit(0.0))
            .alias(f"sxy_{tag}"),
            F.coalesce(d(F.when(pred, y * y)), F.lit(0.0))
            .alias(f"syy_{tag}"),
        ]

    agg = units.agg(*(arm_stats("a", F.col(arm_col) == F.lit(a0))
                      + arm_stats("b", F.col(arm_col) == F.lit(a1))))

    def ratio_var(tag):
        n = F.col(f"n_{tag}").cast("double")
        sx, sy = F.col(f"sx_{tag}"), F.col(f"sy_{tag}")
        sxx, sxy, syy = (F.col(f"sxx_{tag}"), F.col(f"sxy_{tag}"),
                         F.col(f"syy_{tag}"))
        mx, my = sx / n, sy / n
        ratio = F.when(sy != 0.0, sx / sy)
        cxx = (sxx - sx * sx / n) / (n - 1.0)
        cxy = (sxy - sx * sy / n) / (n - 1.0)
        cyy = (syy - sy * sy / n) / (n - 1.0)
        var = F.when((F.col(f"n_{tag}") >= 2) & (my != 0.0),
                     (cxx - 2.0 * ratio * cxy + ratio * ratio * cyy)
                     / (n * my * my))
        return ratio, var

    ra, va = ratio_var("a")
    rb, vb = ratio_var("b")
    se = F.sqrt(va + vb)
    z = F.when(se > 0.0, (rb - ra) / se)
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return agg.select(
        "n_a", "n_b",
        r6(ra).alias("ratio_a"), r6(rb).alias("ratio_b"),
        r6(rb - ra).alias("diff"), r6(se).alias("se"),
        r6(z).alias("z"),
        r6(F.when(se > 0.0, two_sided_p(z))).alias("p_value"))


#: two-sided alpha=0.05 and power=0.80 normal quantiles — fixed literals
#: so every engine replays the MDE arithmetic bit-for-bit
Z_ALPHA_0_05 = 1.9599639845400545
Z_POWER_0_80 = 0.8416212335729143


def ab_power_mde(units: DataFrame, arm_col: str, converted_col: str,
                 z_alpha: float = Z_ALPHA_0_05,
                 z_power: float = Z_POWER_0_80,
                 round_digits: int = 6) -> DataFrame:
    """Post-hoc power analysis for a two-proportion experiment: the
    minimum detectable effect (MDE) at the realized arm sizes and the
    pooled baseline rate — "what lift COULD this test even see?", the
    question to answer before reading :func:`ab_proportion_test`'s z.

        mde_abs = (z_{α/2} + z_β) · sqrt(p̂(1−p̂)·(1/nA + 1/nB))
        mde_rel = mde_abs / p̂

    Same execute-once discipline as ab_proportion_test: ONE per-arm
    aggregate is collected (bounded: 2 rows) and the returned frame is
    a local relation over the collected counts — closed-form double
    arithmetic on exact BIGINT counts, engine-replayable.

    Returns ONE row ``(n_a, n_b, pooled_rate, mde_abs, mde_rel)``.
    """
    per = (units.groupBy(F.col(arm_col).alias("arm"))
           .agg(F.count(F.lit(1)).alias("n_units"),
                F.sum(F.col(converted_col).cast("bigint"))
                .alias("n_converted"))
           .orderBy("arm"))
    rows = per.limit(3).collect()
    if len(rows) != 2:
        raise ValueError(f"ab_power_mde needs exactly 2 arms, "
                         f"got {len(rows)}")
    (na, ca), (nb, cb) = [(r["n_units"], r["n_converted"]) for r in rows]
    pool = (ca + cb) / (na + nb)
    if pool in (0.0, 1.0):
        raise ValueError("degenerate conversion metric: pooled rate is "
                         f"{pool} — the MDE is undefined")
    mde = (z_alpha + z_power) * math.sqrt(
        pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    local = units.sparkSession.createDataFrame(
        [(na, nb)], "n_a bigint, n_b bigint")
    r6 = lambda v: F.round(F.lit(v), round_digits) + F.lit(0.0)  # noqa: E731
    return local.select(
        "n_a", "n_b",
        r6(pool).alias("pooled_rate"),
        r6(mde).alias("mde_abs"),
        r6(mde / pool).alias("mde_rel"))


def touch_attribution(events: DataFrame, user_col: str = "user_id",
                      time_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id",
                      conversion_type: str = "purchase") -> DataFrame:
    """First- vs last-touch conversion attribution: for every user whose
    journey reaches ``conversion_type``, credit the FIRST touch (any
    other event type strictly before the first conversion) and the LAST
    touch to their channels — the two bookend models whose disagreement
    measures how top- vs bottom-of-funnel a channel is.

    Two aggregates total: the conversion lookup and ONE per-user
    ``min_by``/``max_by`` with a conditional ordering (NULL ordering
    rows — touches at/after the conversion, and the conversion itself —
    never win), so the bookends need no window, no per-user sort, and
    no recomputed subtrees (the first cut used row_number windows plus
    a full-outer of two groupBys: Catalyst duplicated the whole
    touch subtree 5×, caught by the plan pin).  Ties break on
    ``id_col`` so credit is deterministic.  Users who convert with no
    prior touch land in the ``(direct)`` channel in both models.

    Returns ``(channel, n_first_touch, n_last_touch)`` ordered by
    channel.
    """
    conv = (events.filter(F.col(type_col) == conversion_type)
            .groupBy(user_col)
            .agg(F.min(F.struct(time_col, id_col)).alias("__c")))
    pre = ((F.col(type_col) != conversion_type)
           & (F.struct(time_col, id_col) < F.col("__c")))
    order = F.when(pre, F.struct(time_col, id_col))
    bookends = (events.join(conv, user_col)
                .groupBy(user_col)
                .agg(F.coalesce(F.min_by(type_col, order),
                                F.lit("(direct)")).alias("__first"),
                     F.coalesce(F.max_by(type_col, order),
                                F.lit("(direct)")).alias("__last")))
    credits = bookends.select(F.explode(F.array(
        F.struct(F.col("__first").alias("channel"),
                 F.lit(1).alias("__f"), F.lit(0).alias("__l")),
        F.struct(F.col("__last").alias("channel"),
                 F.lit(0).alias("__f"), F.lit(1).alias("__l"))))
        .alias("c"))
    return (credits.groupBy(F.col("c.channel").alias("channel"))
            .agg(F.sum("c.__f").alias("n_first_touch"),
                 F.sum("c.__l").alias("n_last_touch"))
            .orderBy("channel"))


def ab_proportion_test(units: DataFrame, arm_col: str,
                       converted_col: str,
                       round_digits: int = 6) -> DataFrame:
    """Two-proportion A/B readout with guardrails: per-arm conversion
    rates, the pooled two-proportion z statistic, and the
    sample-ratio-mismatch (SRM) z — the first thing to check before
    believing any experiment (a non-uniform split means broken
    assignment, and no downstream stat is trustworthy).

        z      = (pA − pB) / sqrt(p̂(1−p̂)(1/nA + 1/nB))
        srm_z  = (nA − N/2) / sqrt(N/4)          (50/50 design)

    Input is one row per unit with a boolean ``converted_col``; both
    statistics are a handful of double ops on exact BIGINT counts, so
    any engine replays them bit-for-bit.  Arms beyond the first two
    (lexicographic) raise — the z-test is pairwise by definition.

    Returns one row per arm: ``(arm, n_units, n_converted, rate, z,
    srm_z)`` — z/srm_z repeated per row for readout convenience.

    The per-arm aggregate executes EXACTLY ONCE: its collected rows both
    feed the z/srm_z math and become the returned plan (a 2-row local
    relation), so ``units`` is never scanned a second time and a
    non-deterministic input cannot make the collected statistics diverge
    from the returned rows (r8 verdict hygiene item).  The rate rounding
    still runs in Spark, over the local relation, so the arithmetic is
    identical to the pre-fix plan.
    """
    per = (units.groupBy(F.col(arm_col).alias("arm"))
           .agg(F.count(F.lit(1)).alias("n_units"),
                F.sum(F.col(converted_col).cast("bigint"))
                .alias("n_converted"))
           .orderBy("arm"))
    rows = per.limit(3).collect()  # bounded: arms are a tiny domain
    if len(rows) != 2:
        raise ValueError(f"ab_proportion_test needs exactly 2 arms, "
                         f"got {len(rows)}")
    (na, ca), (nb, cb) = [(r["n_units"], r["n_converted"]) for r in rows]
    pa, pb = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    if pool in (0.0, 1.0):
        raise ValueError("degenerate conversion metric: pooled rate is "
                         f"{pool} — the z statistic is undefined")
    z = (pa - pb) / math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    n = na + nb
    srm_z = (na - n / 2.0) / math.sqrt(n / 4.0)
    r6 = lambda v: F.round(F.lit(v), round_digits) + F.lit(0.0)  # noqa: E731
    rate = (F.round(F.col("n_converted").cast("double")
                    / F.col("n_units").cast("double"), round_digits)
            + F.lit(0.0))
    local = units.sparkSession.createDataFrame(rows, schema=per.schema)
    return (local.select("arm", "n_units", "n_converted",
                         rate.alias("rate"),
                         r6(z).alias("z"), r6(srm_z).alias("srm_z"))
            .orderBy("arm"))


def diff_in_diff(units: DataFrame, arm_col: str, period_col: str,
                 y_col: str, pre_value: str = "pre",
                 post_value: str = "post",
                 round_digits: int = 6) -> DataFrame:
    """Difference-in-differences estimator (the quasi-experimental
    workhorse when assignment can't be randomized per-unit — geo
    launches, staged rollouts): with arm means per period,

        did = (mean_B_post − mean_B_pre) − (mean_A_post − mean_A_pre)

    the treatment effect under the parallel-trends assumption, with a
    standard error from the four independent cell variances

        se = sqrt(Σ_cell s²_cell / n_cell)

    (cells treated as independent samples — the two-period unpaired
    design; a within-unit paired design would need per-unit deltas
    instead, which callers can build and feed to
    :func:`ab_proportion_test`-style readouts).

    Input is ONE ROW PER UNIT-PERIOD ``(arm, period, y)``.  Exactly ONE
    aggregate runs: 4 conditional DECIMAL(38,12) sums + sum-squares +
    counts (order-free exact), and the estimate/SE are fixed-order
    double arithmetic on those exact sums — engine-replayable.  Arms
    are the two lexicographically-first values; more than two raise.

    Returns one row per (arm, period) cell — ``(arm, period, n_units,
    mean_y)`` plus the scalar ``did``, ``se`` and ``t`` repeated per
    row for readout convenience, ordered by (arm, period DESC) so pre
    precedes post alphabetically-stable.
    """
    y = F.col(y_col).cast("double")
    dsum = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    # n counts NON-NULL metric rows (the welch_t_test convention)
    per = (units.groupBy(F.col(arm_col).alias("arm"),
                         F.col(period_col).alias("period"))
           .agg(F.count(y).alias("n_units"),
                dsum(y).alias("__s"), dsum(y * y).alias("__ss"))
           .orderBy("arm", "period"))
    rows = per.limit(5).collect()  # bounded: 2 arms x 2 periods
    cells = {(r["arm"], r["period"]): r for r in rows}
    arms = sorted({a for a, _ in cells})
    if len(arms) != 2 or len(rows) != 4:
        raise ValueError(
            f"diff_in_diff needs exactly 2 arms x 2 periods, got "
            f"{sorted(cells)}")
    for k in [(a, p) for a in arms for p in (pre_value, post_value)]:
        if k not in cells:
            raise ValueError(f"diff_in_diff: missing cell {k}")
        # a cell whose metric is entirely NULL has n_units=0 / __s=None
        # (count(y) counts non-nulls) — fail descriptively, not with a
        # TypeError inside stats() (ADVICE r9)
        if not cells[k]["n_units"] or cells[k]["__s"] is None:
            raise ValueError(
                f"diff_in_diff: cell {k} has no non-null {y_col!r} values")

    def stats(a: str, p: str) -> tuple[int, float, float]:
        r = cells[(a, p)]
        n, s, ss = r["n_units"], r["__s"], r["__ss"]
        mean = s / n
        var = (ss - s * s / n) / (n - 1) if n > 1 else 0.0
        return n, mean, var

    na0, ma0, va0 = stats(arms[0], pre_value)
    na1, ma1, va1 = stats(arms[0], post_value)
    nb0, mb0, vb0 = stats(arms[1], pre_value)
    nb1, mb1, vb1 = stats(arms[1], post_value)
    did = (mb1 - mb0) - (ma1 - ma0)
    se = math.sqrt(va0 / na0 + va1 / na1 + vb0 / nb0 + vb1 / nb1)
    t = did / se if se > 0.0 else float("nan")
    local = units.sparkSession.createDataFrame(
        [(r["arm"], r["period"], r["n_units"], r["__s"]) for r in rows],
        "arm string, period string, n_units bigint, __s double")
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    rl = lambda v: F.round(F.lit(v), round_digits) + F.lit(0.0)  # noqa: E731
    return (local.select(
        "arm", "period", "n_units",
        r6(F.col("__s") / F.col("n_units").cast("double")).alias("mean_y"),
        rl(did).alias("did"), rl(se).alias("se"), rl(t).alias("t"))
        .orderBy("arm", F.col("period").desc()))


def covariate_balance(units: DataFrame, arm_col: str,
                      covariates: list[str],
                      round_digits: int = 6) -> DataFrame:
    """Pre-experiment covariate-balance audit: for each covariate, the
    standardized mean difference between the two arms

        smd = (mean_A − mean_B) / sqrt((s²_A + s²_B) / 2)

    — the randomization health check run BEFORE the readout (|smd| ≥
    0.1 is the conventional imbalance flag; a broken split shows up
    here and in :func:`ab_proportion_test`'s srm_z).

    The unit table is melted (one in-plan explode of a literal struct
    array — map-side, no extra scan per covariate) and ONE aggregate
    computes per-(covariate, arm) DECIMAL(38,12) moment sums; the smd
    is fixed-order double arithmetic on exact sums.  Arms must be
    exactly two (lexicographic).  A zero pooled variance yields a NULL
    smd; the ``imbalanced`` flag then falls back to a direct
    means-differ check — a covariate constant WITHIN each arm but
    different ACROSS arms is the most broken split possible and must
    flag, not slip through as NULL (review r9).

    Returns one row per covariate: ``(covariate, n_a, n_b, mean_a,
    mean_b, smd, imbalanced)`` ordered by covariate.
    """
    if not covariates:
        raise ValueError("covariate_balance needs >= 1 covariate")
    melted = units.select(
        F.col(arm_col).alias("__arm"),
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("covariate"),
                     F.col(c).cast("double").alias("__v"))
            for c in covariates])).alias("m")
    ).select("__arm", "m.covariate", "m.__v")
    dsum = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    v = F.col("__v")
    # per-covariate n counts NON-NULL values (the welch_t_test
    # convention — NULL covariates must not deflate the moments)
    per = (melted.groupBy("covariate", "__arm")
           .agg(F.count(v).alias("__n"),
                dsum(v).alias("__s"), dsum(v * v).alias("__ss")))
    arms = [r["__arm"] for r in
            per.select("__arm").distinct().orderBy("__arm").limit(3)
            .collect()]
    if len(arms) != 2:
        raise ValueError(f"covariate_balance needs exactly 2 arms, "
                         f"got {arms}")
    a, b = arms
    pick = lambda arm, col: F.max(F.when(F.col("__arm") == arm,  # noqa: E731
                                         F.col(col)))
    cells = (per.groupBy("covariate")
             .agg(pick(a, "__n").alias("n_a"), pick(b, "__n").alias("n_b"),
                  pick(a, "__s").alias("__sa"), pick(b, "__s").alias("__sb"),
                  pick(a, "__ss").alias("__ssa"),
                  pick(b, "__ss").alias("__ssb")))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma = F.col("__sa") / na
    mb = F.col("__sb") / nb
    # gate on n>1: a single-value arm would divide by zero, where Spark
    # yields NULL but DuckDB's IEEE float division yields inf/nan — make
    # both engines emit NULL explicitly (ADVICE r9)
    var_a = F.when(na > 1, (F.col("__ssa")
                            - F.col("__sa") * F.col("__sa") / na) / (na - 1))
    var_b = F.when(nb > 1, (F.col("__ssb")
                            - F.col("__sb") * F.col("__sb") / nb) / (nb - 1))
    pooled = F.sqrt((var_a + var_b) / F.lit(2.0))
    smd = F.when(pooled > 0.0, (ma - mb) / pooled)
    imbalanced = F.when(pooled > 0.0, F.abs(smd) >= 0.1).otherwise(ma != mb)
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (cells.select(
        "covariate", "n_a", "n_b",
        r6(ma).alias("mean_a"), r6(mb).alias("mean_b"),
        r6(smd).alias("smd"),
        imbalanced.alias("imbalanced"))
        .orderBy("covariate"))


#: Zelen & Severo (A&S 26.2.17) Φ tail coefficients — fixed literals so
#: the two-sided p is the SAME fixed-order double arithmetic in Spark
#: and any SQL oracle (|approx error| < 7.5e-8, absorbed by round-6)
_PHI_B = (0.319381530, -0.356563782, 1.781477937,
          -1.821255978, 1.330274429)
_PHI_T = 0.2316419
_INV_SQRT_2PI = 0.3989422804014327


def two_sided_p(z: Column) -> Column:
    """Two-sided normal p-value ``2·(1 − Φ(|z|))`` via the Zelen &
    Severo polynomial tail (Abramowitz & Stegun 26.2.17) — Horner
    order fixed so Spark and a SQL oracle produce bit-identical
    doubles (exp() is the only libm call; its sub-ulp variance is
    absorbed by the callers' round-6 discipline)."""
    az = F.abs(z.cast("double"))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_PHI_T) * az)
    b1, b2, b3, b4, b5 = (F.lit(b) for b in _PHI_B)
    poly = t * (b1 + t * (b2 + t * (b3 + t * (b4 + t * b5))))
    phi = F.exp(-(az * az) / F.lit(2.0)) * F.lit(_INV_SQRT_2PI)
    return F.lit(2.0) * phi * poly


def two_sided_p_sql(z_expr: str) -> str:
    """The ANSI-SQL twin of :func:`two_sided_p` — textually the same
    fixed-order arithmetic, for DuckDB oracles."""
    b1, b2, b3, b4, b5 = _PHI_B
    az = f"abs(CAST({z_expr} AS DOUBLE))"
    t = f"(1.0 / (1.0 + {_PHI_T} * {az}))"
    poly = (f"({t} * ({b1!r} + {t} * ({b2!r} + {t} * ({b3!r} + {t} "
            f"* ({b4!r} + {t} * {b5!r})))))")
    return (f"(2.0 * (exp(-({az} * {az}) / 2.0) * {_INV_SQRT_2PI!r}) "
            f"* {poly})")


def fdr_bh(tests: DataFrame, test_col: str, p_col: str,
           q: float = 0.05, round_digits: int = 6) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate control (Benjamini &
    Hochberg 1995) over a table of per-test p-values — the multiple-
    testing correction an experiment readout with many guardrail
    metrics needs (at m tests, α=0.05 each expects m/20 false alarms).

        p_adj_(i) = min_{j ≥ i} ( m · p_(j) / j ),  clamped to 1

    with ranks ascending by p (ties broken by test name for
    determinism); ``rejected`` = p_adj ≤ q.

    The test table is tiny by construction (one row per metric), so
    the rank + reverse-running-min windows run in one task — and ``m``
    is computed IN-PLAN (an unbounded window count) rather than via
    ``tests.count()``, so the upstream plan (often a full-scan
    aggregate) executes exactly once.  Empty input yields an empty
    result.

    Returns ``(test, p_value, rank, p_adj, rejected)`` ordered by
    test.
    """
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col(p_col).asc(), F.col(test_col).asc())
    w_all = Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing)
    ranked = tests.select(
        F.col(test_col).alias("test"),
        F.col(p_col).cast("double").alias("p_value"),
        F.row_number().over(w_rank).alias("rank"),
        F.count(F.lit(1)).over(w_all).alias("__m"))
    step = F.least(F.lit(1.0),
                   F.col("__m").cast("double") * F.col("p_value")
                   / F.col("rank").cast("double"))
    w_tail = (Window.orderBy(F.col("rank").desc())
              .rowsBetween(Window.unboundedPreceding,
                           Window.currentRow))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (ranked
            .withColumn("__adj", F.min(step).over(w_tail))
            .select("test", r6(F.col("p_value")).alias("p_value"), "rank",
                    r6(F.col("__adj")).alias("p_adj"),
                    (F.col("__adj") <= F.lit(float(q))).alias("rejected"))
            .orderBy("test"))


def offline_policy_value(units: DataFrame, logged_arm_col: str,
                         target_arm_col: str, reward_col: str,
                         propensity: float = 0.5,
                         round_digits: int = 6) -> DataFrame:
    """Off-policy evaluation of a counterfactual assignment rule from
    logged randomized data (Li et al. 2011; Horvitz-Thompson 1952):
    with logged arms drawn uniformly (propensity p per arm), the
    inverse-propensity-scored value of a target policy π is

        V_IPS(π)   = (1/N) · Σ  1{π(u) = logged(u)} · r(u) / p
        V_SNIPS(π) = Σ w·r / Σ w,   w = 1{π(u) = logged(u)} / p

    — "what reward would THIS rule have collected?" answered without
    running a new experiment.  SNIPS trades a little bias for much
    lower variance when the match rate drifts from p.

    Input is one row per unit with the logged arm, the target policy's
    arm (any deterministic column expression), and a numeric reward.
    ONE aggregate (exact counts + DECIMAL reward sums); the estimates
    are fixed-order doubles on those sums.

    Returns ONE row ``(n_units, match_rate, mean_reward_logged,
    ips_value, snips_value)``.
    """
    if not 0.0 < propensity <= 1.0:
        raise ValueError(f"propensity must be in (0, 1], got {propensity}")
    match = (F.col(logged_arm_col) == F.col(target_arm_col))
    r = F.col(reward_col).cast("double")
    d9 = lambda c: F.sum(c.cast("decimal(38,9)")).cast("double")  # noqa: E731
    agg = units.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(match.cast("bigint")).alias("__nm"),
        d9(r).alias("__sr"),
        d9(F.when(match, r).otherwise(F.lit(0.0))).alias("__smr"))
    n = F.col("n_units").cast("double")
    w = F.lit(1.0 / propensity)
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return agg.select(
        "n_units",
        r6(F.col("__nm").cast("double") / n).alias("match_rate"),
        r6(F.col("__sr") / n).alias("mean_reward_logged"),
        r6(F.col("__smr") * w / n).alias("ips_value"),
        r6(F.when(F.col("__nm") > 0,
                  F.col("__smr") / F.col("__nm").cast("double")))
        .alias("snips_value"))


def welch_t_test(units: DataFrame, arm_col: str, y_col: str,
                 round_digits: int = 6) -> DataFrame:
    """Welch's unequal-variance t-test (Welch 1947) for a CONTINUOUS
    per-unit metric — the readout :func:`ab_proportion_test` cannot
    give (that one is binary):

        t  = (m_A − m_B) / sqrt(s²_A/n_A + s²_B/n_B)
        df = (s²_A/n_A + s²_B/n_B)² /
             ((s²_A/n_A)²/(n_A−1) + (s²_B/n_B)²/(n_B−1))

    with the two-sided p from the NORMAL approximation
    (:func:`two_sided_p`) — indistinguishable from the t distribution
    at experiment-scale df (hundreds+), documented so small-sample
    callers know to look up t tables themselves.

    Execute-once discipline: ONE per-arm moment aggregate
    (DECIMAL(38,9)-exact sums) is collected and the returned frame is
    a local relation — heavy-tailed metrics should be winsorized
    BEFORE calling (compose with profile.winsorize).

    Returns ONE row ``(n_a, n_b, mean_a, mean_b, t, df, p_approx)``.
    """
    y = F.col(y_col).cast("double")
    d9 = lambda c: F.sum(c.cast("decimal(38,9)")).cast("double")  # noqa: E731
    # n counts NON-NULL metric rows (review r9: count(*) would count
    # NULL-metric units into the denominator while the sums skip them,
    # silently deflating means/variances)
    per = (units.groupBy(F.col(arm_col).alias("arm"))
           .agg(F.count(y).alias("n"),
                d9(y).alias("s"), d9(y * y).alias("ss"))
           .orderBy("arm"))
    rows = per.limit(3).collect()
    if len(rows) != 2:
        raise ValueError(f"welch_t_test needs exactly 2 arms, "
                         f"got {len(rows)}")

    def stats(r):
        n, s, ss = r["n"], r["s"], r["ss"]
        if n < 2:
            raise ValueError("welch_t_test needs >= 2 units per arm")
        return n, s / n, (ss - s * s / n) / (n - 1)

    na, ma, va = stats(rows[0])
    nb, mb, vb = stats(rows[1])
    qa, qb = va / na, vb / nb
    if qa + qb <= 0.0:
        raise ValueError("welch_t_test: zero variance in both arms — "
                         "t is undefined")
    t = (ma - mb) / math.sqrt(qa + qb)
    # explicit multiplies (not **2): Python pow and SQL power() are not
    # guaranteed correctly rounded; x*x is, so the oracle replays bits
    df = ((qa + qb) * (qa + qb)
          / (qa * qa / (na - 1) + qb * qb / (nb - 1)))
    local = units.sparkSession.createDataFrame(
        [(na, nb)], "n_a bigint, n_b bigint")
    r6 = lambda v: F.round(F.lit(v), round_digits) + F.lit(0.0)  # noqa: E731
    return local.select(
        "n_a", "n_b", r6(ma).alias("mean_a"), r6(mb).alias("mean_b"),
        r6(t).alias("t"), r6(df).alias("df"),
        (F.round(two_sided_p(F.lit(t)), round_digits)
         + F.lit(0.0)).alias("p_approx"))


def mann_whitney_u(units: DataFrame, arm_col: str, y_col: str,
                   arms: tuple | None = None,
                   round_digits: int = 6) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test (Mann & Whitney 1947) —
    the NONPARAMETRIC two-sample readout that survives what breaks
    Welch's t (heavy tails, outliers, any monotone metric transform):

        U_A = R_A − n_A(n_A+1)/2,   z = (U_A − n_A·n_B/2) / σ
        σ²  = (n_A·n_B/12) · ((n+1) − Σ(t³−t)/(n(n−1)))   (tie-corrected)

    with the two-sided normal-approximation p (no continuity
    correction — documented; negligible at experiment n).

    Scale shape: rank sums need NO per-row rank — the metric collapses
    to its DISTINCT-VALUE table (count + per-arm count per value), and
    average ranks come from ONE cumulative window over that sorted
    value table (single-task over |distinct values| rows — quantize a
    continuous metric first past ~10⁷ distinct values, the
    rfm_segments convention).  Average ranks are exact .5-grid
    doubles; rank sums accumulate in DECIMAL(38,1) (exact).

    Returns ONE row ``(n_a, n_b, u_a, auc, z, p_approx)`` — ``auc``
    the common-language effect size ``U_A / (n_A·n_B)``.
    """
    from pyspark.sql import Window

    # pass arms when known (md5 assignment ⇒ ("A", "B")) to avoid the
    # discovery pass re-executing the unit-table plan; explicit arms
    # also RESTRICT the input to those two arms (review r9: without the
    # filter, a third arm's rows silently counted toward arm B)
    a_arm = sorted(arms) if arms else [
        r[0] for r in
        units.select(arm_col).distinct().orderBy(arm_col).limit(3)
        .collect()]
    if len(a_arm) != 2:
        raise ValueError(f"mann_whitney_u needs exactly 2 arms, "
                         f"got {a_arm}")
    y = F.col(y_col).cast("double")
    # NULL metric rows are excluded (they have no rank); NULL ordering
    # also differs across engines, so they must never reach the window
    base = units.filter(F.col(arm_col).isin(list(a_arm))
                        & y.isNotNull())
    vals = (base.groupBy(y.alias("__v"))
            .agg(F.count(F.lit(1)).alias("__t"),
                 F.sum((F.col(arm_col) == a_arm[0]).cast("bigint"))
                 .alias("__ta")))
    w_cum = (Window.orderBy("__v")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # avg rank of a tied group at cumulative position C with t members:
    # (C - t + 1 + C) / 2 = C - (t - 1)/2
    ranked = (vals
              .withColumn("__c", F.sum("__t").over(w_cum))
              .withColumn("__r", F.col("__c").cast("double")
                          - (F.col("__t").cast("double") - 1.0) / 2.0))
    agg = ranked.agg(
        F.sum("__ta").alias("n_a"),
        (F.sum("__t") - F.sum("__ta")).alias("n_b"),
        F.sum((F.col("__ta").cast("double") * F.col("__r"))
              .cast("decimal(38,1)")).cast("double").alias("__ra"),
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t"))
        .alias("__ties")).limit(1).collect()[0]
    na, nb = agg["n_a"], agg["n_b"]
    # empty/all-NULL input makes the sums NULL (not 0) — `not na` catches
    # both None and 0 so the intended ValueError fires instead of a
    # TypeError on na + nb (ADVICE r9)
    if not na or not nb:
        raise ValueError("mann_whitney_u: an arm has no units")
    n = na + nb
    u_a = agg["__ra"] - na * (na + 1) / 2.0
    mu = na * nb / 2.0
    var = (na * nb / 12.0) * ((n + 1) - agg["__ties"] / (n * (n - 1.0)))
    if var <= 0.0:
        raise ValueError("mann_whitney_u: all values tied — z undefined")
    z = (u_a - mu) / math.sqrt(var)
    # common-language effect size: P(random A > random B) + ½P(tie) —
    # the magnitude readout the z alone hides (a huge n makes any
    # hairline shift significant; auc says whether anyone would notice)
    auc = u_a / (na * nb)
    local = units.sparkSession.createDataFrame(
        [(na, nb)], "n_a bigint, n_b bigint")
    r6 = lambda v: F.round(F.lit(v), round_digits) + F.lit(0.0)  # noqa: E731
    return local.select(
        "n_a", "n_b", r6(u_a).alias("u_a"), r6(auc).alias("auc"),
        r6(z).alias("z"),
        (F.round(two_sided_p(F.lit(z)), round_digits)
         + F.lit(0.0)).alias("p_approx"))


def quantile_treatment_effects(units: DataFrame, arm_col: str, y_col: str,
                               quantiles: tuple = (0.1, 0.25, 0.5,
                                                   0.75, 0.9),
                               arms: tuple | None = None,
                               round_digits: int = 6) -> DataFrame:
    """Quantile treatment effects: the per-quantile difference of the
    two arms' metric distributions — WHERE a treatment moves the
    distribution (a mean lift hiding in the top decile reads very
    differently from a uniform shift).  Quantiles are LOWER-rank
    SELECTION (the value at row ceil(q·n), the theil_sen_trend
    convention) — no interpolation arithmetic, engine-exact.

    One per-arm ordering window over the unit table (two partitions;
    the scalar (arm, y) projection is what sorts), one filter per
    quantile against the in-plan row counts, then a 2×|quantiles|
    pivot.  Arms are the two lexicographically-first values.

    Returns one row per quantile: ``(q, y_a, y_b, qte)`` with
    ``qte = y_b − y_a``, ordered by q.
    """
    from pyspark.sql import Window

    qs = sorted(set(float(q) for q in quantiles))
    if not qs or qs[0] <= 0.0 or qs[-1] >= 1.0:
        raise ValueError(f"quantiles must be in (0, 1), got {quantiles}")
    y = F.col(y_col).cast("double")
    w_rank = Window.partitionBy(arm_col).orderBy(y)
    w_all = (Window.partitionBy(arm_col)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    # NULL metric rows are excluded BEFORE ranking (engines disagree on
    # NULL ordering, and a NULL has no quantile anyway)
    ranked = units.filter(y.isNotNull()).select(
        F.col(arm_col).alias("__arm"), y.alias("__y"),
        F.row_number().over(w_rank).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"))
    picks = ranked.select(
        "__arm", "__y",
        F.explode(F.array(*[F.lit(q) for q in qs])).alias("q"),
        "__rn", "__n").filter(
        F.col("__rn") == F.greatest(
            F.lit(1), F.ceil(F.col("q") * F.col("__n").cast("double"))
            .cast("int")))
    arms = sorted(arms) if arms else [
        r[0] for r in
        units.select(arm_col).distinct().orderBy(arm_col).limit(3)
        .collect()]
    if len(arms) != 2:
        raise ValueError(f"quantile_treatment_effects needs exactly 2 "
                         f"arms, got {arms}")
    pick = lambda arm: F.max(F.when(F.col("__arm") == arm,  # noqa: E731
                                    F.col("__y")))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (picks.groupBy("q")
            .agg(pick(arms[0]).alias("__ya"), pick(arms[1]).alias("__yb"))
            .select("q", r6(F.col("__ya")).alias("y_a"),
                    r6(F.col("__yb")).alias("y_b"),
                    r6(F.col("__yb") - F.col("__ya")).alias("qte"))
            .orderBy("q"))


def aipw_ate(units: DataFrame, arm_col: str, y_col: str,
             stratum_col: str, arms: tuple = ("A", "B"),
             propensity: float = 0.5,
             round_digits: int = 6) -> DataFrame:
    """Doubly-robust average treatment effect — AIPW (Robins, Rotnitzky
    & Zhao 1994; the augmented inverse-propensity estimator): with
    treatment T (``arms[1]``), known propensity e, and a per-stratum
    outcome model m_a(x) (the stratum's arm mean),

        ψ = m₁(x) − m₀(x) + T·(y − m₁(x))/e − (1−T)·(y − m₀(x))/(1−e)
        ATE = mean(ψ),  se = √(var(ψ)/n)

    — consistent if EITHER the propensity OR the outcome model is
    right; under md5 randomization e is exactly known (0.5), so the
    stratum model only buys VARIANCE reduction (the same reason CUPED
    works), and se shrinks when strata predict the outcome.  The
    difference-in-means readout is emitted alongside so the reduction
    is visible.  The outcome model is fit on the full sample (no
    cross-fitting): with a fixed known propensity the plug-in remains
    consistent — the honest caveat for ESTIMATED propensities is that
    production use should cross-fit (Chernozhukov et al. 2018),
    documented here rather than silently assumed.

    Plan: ONE aggregate builds the (stratum × arm) model table
    (DECIMAL-exact sums, broadcast back — a |strata|-row dim join),
    then one aggregate folds ψ with round-9 terms in DECIMAL(38,9).
    Strata with a missing arm contribute NULL model means and are
    EXCLUDED from ψ (reported in ``n_dropped``) — the positivity
    violation surfaced, not imputed.

    Returns ONE row ``(n_units, n_dropped, ate_aipw, se_aipw,
    ate_diff_means)``.
    """
    if not 0.0 < propensity < 1.0:
        raise ValueError(f"propensity must be in (0,1), got {propensity}")
    control, treated = arms
    y = F.col(y_col).cast("double")
    t = (F.col(arm_col) == treated).cast("double")
    base = (units.filter(F.col(arm_col).isin(list(arms)) & y.isNotNull())
            .select(F.col(stratum_col).alias("__x"), y.alias("__y"),
                    t.alias("__t")))
    d12 = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    model = (base.groupBy("__x")
             .agg(F.sum(F.when(F.col("__t") == 1.0, 1).otherwise(0))
                  .alias("__nt"),
                  F.sum(F.when(F.col("__t") == 0.0, 1).otherwise(0))
                  .alias("__nc"),
                  d12(F.when(F.col("__t") == 1.0, F.col("__y")))
                  .alias("__st"),
                  d12(F.when(F.col("__t") == 0.0, F.col("__y")))
                  .alias("__sc")))
    m1 = F.when(F.col("__nt") > 0,
                F.col("__st") / F.col("__nt").cast("double"))
    m0 = F.when(F.col("__nc") > 0,
                F.col("__sc") / F.col("__nc").cast("double"))
    model = model.select("__x", m1.alias("__m1"), m0.alias("__m0"))
    e = F.lit(float(propensity))
    j = base.join(F.broadcast(model), "__x")
    psi = (F.col("__m1") - F.col("__m0")
           + F.col("__t") * (F.col("__y") - F.col("__m1")) / e
           - (F.lit(1.0) - F.col("__t"))
           * (F.col("__y") - F.col("__m0")) / (F.lit(1.0) - e))
    ok = F.col("__m1").isNotNull() & F.col("__m0").isNotNull()
    d9 = lambda c: F.sum(c.cast("decimal(38,9)")).cast("double")  # noqa: E731
    agg = j.agg(
        F.sum(ok.cast("bigint")).alias("n_units"),
        F.sum((~ok).cast("bigint")).alias("n_dropped"),
        d9(F.when(ok, F.round(psi, 9))).alias("__sp"),
        d9(F.when(ok, F.round(psi * psi, 9))).alias("__spp"),
        F.sum(F.when(ok & (F.col("__t") == 1.0), 1).otherwise(0))
        .alias("__nt"),
        F.sum(F.when(ok & (F.col("__t") == 0.0), 1).otherwise(0))
        .alias("__nc"),
        d9(F.when(ok & (F.col("__t") == 1.0), F.col("__y"))).alias("__syt"),
        d9(F.when(ok & (F.col("__t") == 0.0), F.col("__y"))).alias("__syc"))
    row = agg.limit(1).collect()[0]
    n, nd = row["n_units"], row["n_dropped"]
    if not n:
        raise ValueError("aipw_ate: no usable units (empty input or every "
                         "stratum missing an arm)")
    ate = row["__sp"] / n
    var = (row["__spp"] - row["__sp"] * row["__sp"] / n) / (n - 1) \
        if n > 1 else 0.0
    se = math.sqrt(var / n) if var > 0.0 else 0.0
    dm = ((row["__syt"] / row["__nt"] if row["__nt"] else None),
          (row["__syc"] / row["__nc"] if row["__nc"] else None))
    diff = (dm[0] - dm[1]
            if dm[0] is not None and dm[1] is not None else None)
    local = units.sparkSession.createDataFrame(
        [(n, nd)], "n_units bigint, n_dropped bigint")
    rl = lambda v: (F.round(F.lit(v), round_digits)  # noqa: E731
                    + F.lit(0.0))
    return local.select(
        "n_units", "n_dropped", rl(ate).alias("ate_aipw"),
        rl(se).alias("se_aipw"),
        (rl(diff) if diff is not None
         else F.lit(None).cast("double")).alias("ate_diff_means"))


def shapley_attribution(events: DataFrame, user_col: str, time_col: str,
                        type_col: str, conversion_type: str,
                        channels: list[str] | None = None,
                        max_channels: int = 12,
                        round_digits: int = 6) -> DataFrame:
    """Shapley-value channel attribution (Shapley 1953; the simplified
    data-driven form of Zhao et al. 2018): each channel's fair share of
    conversion credit, averaging its marginal contribution over every
    coalition —

        φ_i = Σ_{S ⊆ C∖{i}} |S|!(k−|S|−1)!/k! · (v(S∪{i}) − v(S))

    with ``v(S)`` the observed conversion rate of users whose
    pre-conversion touch set is exactly S (unobserved coalitions
    contribute v = 0).  The principled answer to the first/last-touch
    arbitrariness of :func:`attribution bookends <ab_assign>`-style
    readouts: order-free, efficiency axiom (Σφ_i + v(∅) = grand
    coalition value) — and exponential in CHANNELS, not users, so it
    is exact and cheap for the ≤ ``max_channels`` marketing channels
    real attribution runs on.

    Scale shape: ONE per-user aggregate builds the touch-set string
    (channels seen strictly before the user's first conversion;
    non-converters contribute their full set), one tiny groupBy builds
    the v(S) table (≤ 2^k rows), and φ is computed IN-PLAN by joining a
    literal (channel, S, S∪{i}, weight) table — k·2^(k−1) rows — against
    v twice; terms are round-12 doubles accumulated in DECIMAL(38,12)
    (order-free, engine-exact), so a SQL oracle with the same generated
    literals replays every bit.  Pass ``channels`` explicitly for a
    fully deterministic plan; ``None`` discovers them with one bounded
    distinct-collect.

    Returns ``(channel, shapley, touched_users, touched_conv_rate)``
    ordered by channel.
    """
    from itertools import combinations

    conv = F.col(type_col) == conversion_type
    if channels is None:
        channels = sorted(
            r[0] for r in events.filter(~conv).select(type_col)
            .distinct().limit(max_channels + 1).collect())
    channels = sorted(channels)
    k = len(channels)
    if not 1 <= k <= max_channels:
        raise ValueError(f"need 1..{max_channels} channels, got {k}")

    es = events.select(F.col(user_col).alias("__u"),
                       F.col(time_col).alias("__t"),
                       F.col(type_col).alias("__c"))
    firsts = (es.groupBy("__u")
              .agg(F.min(F.when(F.col("__c") == conversion_type,
                                F.col("__t"))).alias("__fc")))
    touch_set = F.array_join(F.array_sort(F.collect_set(
        F.when((F.col("__c") != conversion_type)
               & (F.col("__c").isin(channels))
               & (F.col("__fc").isNull() | (F.col("__t") < F.col("__fc"))),
               F.col("__c")))), ",")
    users = (es.join(firsts, "__u")
             .groupBy("__u")
             .agg(touch_set.alias("__s"),
                  F.max(F.col("__fc").isNotNull().cast("bigint"))
                  .alias("__conv")))
    vtab = (users.groupBy("__s")
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.sum("__conv").alias("__cv"))
            .select("__s", "__n",
                    (F.col("__cv").cast("double")
                     / F.col("__n").cast("double")).alias("__v"))
            .localCheckpoint(eager=True))

    fact = [1] * (k + 1)
    for i in range(2, k + 1):
        fact[i] = fact[i - 1] * i
    pairs = []
    for ch in channels:
        rest = [c for c in channels if c != ch]
        for size in range(k):
            for sub in combinations(rest, size):
                w = fact[size] * fact[k - size - 1] / fact[k]
                s_wo = ",".join(sorted(sub))
                s_wi = ",".join(sorted(sub + (ch,)))
                pairs.append((ch, s_wo, s_wi, w))
    spark = events.sparkSession
    ptab = spark.createDataFrame(
        pairs, "channel string, s_wo string, s_wi string, weight double")
    vo = vtab.select(F.col("__s").alias("s_wo"), F.col("__v").alias("__vo"))
    vw = vtab.select(F.col("__s").alias("s_wi"), F.col("__v").alias("__vw"))
    term = F.round(F.col("weight")
                   * (F.coalesce("__vw", F.lit(0.0))
                      - F.coalesce("__vo", F.lit(0.0))), 12)
    phi = (ptab.join(F.broadcast(vo), "s_wo", "left")
           .join(F.broadcast(vw), "s_wi", "left")
           .groupBy("channel")
           .agg(F.sum(term.cast("decimal(38,12)")).cast("double")
                .alias("__phi")))
    # per-channel diagnostics: users who touched the channel pre-conv
    touched = (users
               .select(F.explode(F.split("__s", ",")).alias("channel"),
                       "__conv")
               .filter(F.col("channel") != "")
               .groupBy("channel")
               .agg(F.count(F.lit(1)).alias("touched_users"),
                    (F.sum("__conv").cast("double")
                     / F.count(F.lit(1)).cast("double")).alias("__tr")))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (phi.join(touched, "channel", "left")
            .select("channel", r6(F.col("__phi")).alias("shapley"),
                    F.coalesce("touched_users", F.lit(0))
                    .alias("touched_users"),
                    r6(F.col("__tr")).alias("touched_conv_rate"))
            .orderBy("channel"))


def qini_curve(units: DataFrame, arm_col: str, score_col: str,
               converted_col: str, id_col: str, n_bins: int = 10,
               arms: tuple = ("A", "B"),
               round_digits: int = 6) -> DataFrame:
    """Qini / uplift curve (Radcliffe 2007) — the evaluation readout for
    uplift ("whom should we treat?") models: units ranked by the model
    score descending and cut into ``n_bins`` quantile bins; per
    cumulative prefix k,

        uplift(k) = conv_T(k)/n_T(k) − conv_C(k)/n_C(k)
        qini(k)   = conv_T(k) − conv_C(k) · n_T(k)/n_C(k)

    (``arms[1]`` treated, ``arms[0]`` control).  A useful targeting
    model shows qini rising steeply over the first bins — the
    incremental conversions captured by treating only the top-scored
    units; the diagonal to qini(n_bins) is random targeting.

    Determinism contract: bins are ``ntile`` over (score DESC, id ASC)
    — the id tiebreak makes the cut engine-exact, so the score itself
    must be engine-stable (exact counts/decimal-derived doubles, not
    model floats refit per run) and NON-NULL (engines disagree on NULL
    placement under DESC: Spark last, DuckDB first — score NULLs on a
    cross-engine workload must be filtered or coalesced by the caller).  One window pass over the unit table,
    one n_bins-row aggregate, cumulative windows on the bin table.
    Bins where an arm is empty yield NULL readouts rather than IEEE
    infinities.

    Returns ``(bin, cum_n_treated, cum_n_control, cum_conv_treated,
    cum_conv_control, uplift, qini)`` ordered by bin.
    """
    from pyspark.sql import Window

    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    control, treated = arms
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    binned = units.select(
        F.col(arm_col).alias("__arm"),
        F.col(converted_col).cast("bigint").alias("__conv"),
        F.ntile(n_bins).over(w).cast("int").alias("bin"))
    cnt = lambda arm: F.sum(  # noqa: E731
        (F.col("__arm") == arm).cast("bigint"))
    cv = lambda arm: F.sum(  # noqa: E731
        F.when(F.col("__arm") == arm, F.col("__conv")).otherwise(F.lit(0)))
    per = binned.groupBy("bin").agg(
        cnt(treated).alias("__nt"), cnt(control).alias("__nc"),
        cv(treated).alias("__ct"), cv(control).alias("__cc"))
    w_cum = (Window.orderBy("bin")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = per.select(
        "bin",
        F.sum("__nt").over(w_cum).alias("cum_n_treated"),
        F.sum("__nc").over(w_cum).alias("cum_n_control"),
        F.sum("__ct").over(w_cum).alias("cum_conv_treated"),
        F.sum("__cc").over(w_cum).alias("cum_conv_control"))
    nt = F.col("cum_n_treated").cast("double")
    nc = F.col("cum_n_control").cast("double")
    ct = F.col("cum_conv_treated").cast("double")
    cc = F.col("cum_conv_control").cast("double")
    uplift = F.when((F.col("cum_n_treated") > 0)
                    & (F.col("cum_n_control") > 0), ct / nt - cc / nc)
    qini = F.when(F.col("cum_n_control") > 0, ct - cc * nt / nc)
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (cum.select("bin", "cum_n_treated", "cum_n_control",
                       "cum_conv_treated", "cum_conv_control",
                       r6(uplift).alias("uplift"), r6(qini).alias("qini"))
            .orderBy("bin"))


def _cumulative_arm_counts(events: DataFrame, user_col: str, time_col: str,
                           type_col: str, conversion_type: str,
                           seed: str) -> DataFrame:
    """Shared cumulative experiment panel for the day-grain traces
    (:func:`peeking_trace`, :func:`msprt_trace`): units enter at their
    first event day, convert at their first ``conversion_type`` day;
    ONE per-user rollup melts into a per-(day, kind, arm) count — the
    CALENDAR-BOUNDED table that gets checkpointed (never the O(users)
    rollup) — then cumulative windows over the complete day grid.

    Returns ``(day, n_a, n_b, conv_a, conv_b)`` with one row per
    calendar day from first entry to last activity.
    """
    return _panel_from_firsts(
        user_firsts(events, user_col, time_col, type_col, conversion_type),
        user_col, seed)


def user_firsts(events: DataFrame, user_col: str, time_col: str,
                type_col: str, conversion_type: str) -> DataFrame:
    """Per-unit (first-event day, first-conversion day) rollup — the
    ONLY full-data aggregate under the day-grain traces, exposed
    separately because it is complete-mode STREAMING-LEGAL (two min
    aggregates, one state row per user — the experiment_stream_counters
    state class), so a live stream can maintain it and feed the
    identical panel/statistic tail the batch gates pin.

    Returns ``(user_col, __fa, __fc)``.
    """
    day = F.to_date(time_col)
    return (events.groupBy(user_col)
            .agg(F.min(day).alias("__fa"),
                 F.min(F.when(F.col(type_col) == conversion_type,
                              day)).alias("__fc")))


def _panel_from_firsts(firsts: DataFrame, user_col: str,
                       seed: str) -> DataFrame:
    """The bounded tail of :func:`_cumulative_arm_counts`: md5 arms,
    melt to the calendar-bounded (day, kind, arm) counter table
    (checkpointed), cumulative windows on the complete day grid."""
    from pyspark.sql import Window

    per_user = firsts.withColumn("__arm",
                                 ab_assign(F.col(user_col), seed))
    counts = (per_user.select(
        "__arm",
        F.explode(F.array(
            F.struct(F.lit("e").alias("kind"), F.col("__fa").alias("day")),
            F.struct(F.lit("c").alias("kind"), F.col("__fc").alias("day")),
        )).alias("m"))
        .filter(F.col("m.day").isNotNull())
        .groupBy(F.col("m.day").alias("day"), F.col("m.kind").alias("kind"),
                 "__arm")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=True))
    ends = counts.agg(
        F.min(F.when(F.col("kind") == "e", F.col("day"))).alias("__lo"),
        F.max("day").alias("__hi"))
    grid = ends.select(F.explode(F.sequence("__lo", "__hi")).alias("day"))
    pick = lambda kind, arm: F.sum(  # noqa: E731
        F.when((F.col("kind") == kind) & (F.col("__arm") == arm),
               F.col("__n")).otherwise(F.lit(0)))
    daily = (counts.filter(F.col("kind") == "e").groupBy("day")
             .agg(pick("e", "A").alias("__ea"),
                  pick("e", "B").alias("__eb")))
    convs = (counts.filter(F.col("kind") == "c").groupBy("day")
             .agg(pick("c", "A").alias("__ca"),
                  pick("c", "B").alias("__cb")))
    w_cum = (Window.orderBy("day")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(daily, "day", "left").join(convs, "day", "left")
            .select("day",
                    F.sum(F.coalesce("__ea", F.lit(0))).over(w_cum)
                    .alias("n_a"),
                    F.sum(F.coalesce("__eb", F.lit(0))).over(w_cum)
                    .alias("n_b"),
                    F.sum(F.coalesce("__ca", F.lit(0))).over(w_cum)
                    .alias("conv_a"),
                    F.sum(F.coalesce("__cb", F.lit(0))).over(w_cum)
                    .alias("conv_b")))


def msprt_trace(events: DataFrame, user_col: str, time_col: str,
                type_col: str, conversion_type: str,
                seed: str = "ab1", tau: float = 0.1,
                alpha: float = 0.05,
                round_digits: int = 6) -> DataFrame:
    """ALWAYS-VALID sequential readout — the mixture sequential
    probability ratio test (mSPRT; Robbins 1970, applied to A/B
    streaming inference by Johari, Koomen, Pekelis & Walsh 2017): the
    anytime-valid p-value a dashboard may legally refresh after every
    day, fixing the peeking inflation :func:`peeking_trace` visualizes.

    With the cumulative two-proportion estimate Δ̂_t = p̂_A − p̂_B, its
    variance V_t = p̂(1−p̂)(1/n_A + 1/n_B) (pooled), and a Normal(0, τ²)
    mixture over effect sizes, the mixture likelihood ratio is

        Λ_t = sqrt(V_t / (V_t + τ²)) · exp( Δ̂_t² τ² / (2 V_t (V_t + τ²)) )

    and ``p_t = min(p_{t−1}, 1/Λ_t)`` is a valid p-value at EVERY t
    simultaneously (it is nonincreasing by construction; rejecting when
    p_t ≤ α controls type-I error at α under optional stopping).  τ is
    the prior scale of detectable effects — too small wastes power on
    tiny lifts, too large on huge ones; 0.1 suits conversion-rate
    experiments (absolute-rate grain).

    Days where the statistic is undefined (an arm empty, pooled rate 0
    or 1) contribute p=1 — they never reject and never reset the
    running minimum.  Same plan shape as :func:`peeking_trace`: one
    checkpointed calendar-bounded counter table, cumulative windows on
    the day grid, fixed-order double arithmetic on exact counts (exp is
    the only libm call beyond sqrt; its sub-ulp variance is absorbed by
    the round-6 output discipline).

    Returns ``(day, n_a, n_b, conv_a, conv_b, always_valid_p,
    rejected)`` ordered by day — ``rejected`` latches once p crosses α.
    """
    from pyspark.sql import Window

    if tau <= 0.0:
        raise ValueError(f"tau must be > 0, got {tau} (tau=0 makes the "
                         f"mixture degenerate: Lambda == 1 and p == 1 "
                         f"forever)")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")

    cum = _cumulative_arm_counts(events, user_col, time_col, type_col,
                                 conversion_type, seed)
    return _msprt_stat(cum, tau, alpha, round_digits)


def msprt_trace_from_firsts(firsts: DataFrame, user_col: str,
                            seed: str = "ab1", tau: float = 0.1,
                            alpha: float = 0.05,
                            round_digits: int = 6) -> DataFrame:
    """:func:`msprt_trace` over a PREBUILT :func:`user_firsts` table —
    the streaming composition point: a live stream maintains the
    complete-mode firsts rollup (the only unbounded pass) and this
    identical panel + statistic tail folds it, so the continuously-
    refreshed always-valid readout provably matches the batch gate."""
    if tau <= 0.0:
        raise ValueError(f"tau must be > 0, got {tau}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return _msprt_stat(_panel_from_firsts(firsts, user_col, seed),
                       tau, alpha, round_digits)


def _msprt_stat(cum: DataFrame, tau: float, alpha: float,
                round_digits: int) -> DataFrame:
    from pyspark.sql import Window

    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pa = F.col("conv_a").cast("double") / na
    pb = F.col("conv_b").cast("double") / nb
    pool = ((F.col("conv_a") + F.col("conv_b")).cast("double")
            / (F.col("n_a") + F.col("n_b")).cast("double"))
    v = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    tau2 = F.lit(float(tau) * float(tau))
    d = pa - pb
    lam = (F.sqrt(v / (v + tau2))
           * F.exp(d * d * tau2 / (F.lit(2.0) * v * (v + tau2))))
    p_raw = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0)
                   & (pool > 0.0) & (pool < 1.0),
                   F.least(F.lit(1.0), F.lit(1.0) / lam)).otherwise(F.lit(1.0))
    w_min = (Window.orderBy("day")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    p_av = F.min(p_raw).over(w_min)
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (cum.select("day", "n_a", "n_b", "conv_a", "conv_b",
                       r6(p_av).alias("always_valid_p"),
                       (p_av <= F.lit(float(alpha))).alias("rejected"))
            .orderBy("day"))


def peeking_trace(events: DataFrame, user_col: str, time_col: str,
                  type_col: str, conversion_type: str,
                  seed: str = "ab1",
                  round_digits: int = 6) -> DataFrame:
    """The PEEKING trace: the two-proportion z statistic recomputed
    after every day of an experiment — the curve that shows why
    checking a fixed-horizon test daily inflates false positives (the
    z wanders across ±1.96 long before the planned horizon; each
    crossing is a would-have-stopped-early event).  Emit it next to
    the single end-of-experiment readout so dashboard consumers SEE
    the multiplicity; pair with :func:`fdr_bh` across metrics and a
    pre-registered horizon across time.

    Units enter at their first event day (denominator grows daily) and
    convert at their first ``conversion_type`` day.  Cumulative counts
    are suffix-exact: one per-user rollup melts straight into ONE
    per-(day, kind, arm) count — the CALENDAR-BOUNDED table that gets
    checkpointed (review r9: the first cut checkpointed the O(users)
    rollup itself, pinning unbounded executor storage; the bounded
    counter table serves the grid, entry and conversion branches
    identically).  z is NULL on degenerate days (either arm empty,
    pooled rate 0 or 1).

    Returns ``(day, n_a, n_b, conv_a, conv_b, z, significant)``
    ordered by day — ``significant`` = |z| > 1.96.
    """
    cum = _cumulative_arm_counts(events, user_col, time_col, type_col,
                                 conversion_type, seed)
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pa = F.col("conv_a").cast("double") / na
    pb = F.col("conv_b").cast("double") / nb
    pool = ((F.col("conv_a") + F.col("conv_b")).cast("double")
            / (F.col("n_a") + F.col("n_b")).cast("double"))
    z = F.when((F.col("n_a") > 0) & (F.col("n_b") > 0)
               & (pool > 0.0) & (pool < 1.0),
               (pa - pb) / F.sqrt(pool * (F.lit(1.0) - pool)
                                  * (F.lit(1.0) / na + F.lit(1.0) / nb)))
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    return (cum.select("day", "n_a", "n_b", "conv_a", "conv_b",
                       r6(z).alias("z"),
                       F.coalesce(F.abs(z) > 1.96, F.lit(False))
                       .alias("significant"))
            .orderBy("day"))


def experiment_stream_counters(events: DataFrame, user_col: str,
                               time_col: str, type_col: str,
                               conversion_type: str,
                               value_col: str | None = None,
                               conv_value: float | None = None) -> DataFrame:
    """STREAMING per-unit experiment state (r9 verdict #5): the
    complete-mode aggregation a live experiment maintains over its
    event stream — one row per unit carrying everything the readout
    fold needs (event count, converted flag, first-event and
    first-conversion days).

    State is one row per distinct unit — the streaming-exact-dedup
    state class (the same bound q:streaming_corpus_card_docs'
    fingerprint counters carry); at billions of units switch the
    session to the RocksDB provider (streaming.run.use_rocksdb_state).
    All four aggregates are min/max/count — complete-mode-legal and
    merge-associative, so micro-batches fold exactly.  availableNow on
    bounded input makes the final counters deterministic, which is
    what lets the batch SQL replay serve as the oracle.

    Pass ``value_col``/``conv_value`` to require a minimum value on the
    converting event (the readout gate's high-value-purchase predicate).
    Returns ``(user, n_events, converted, first_day, first_conv_day)``.
    """
    day = F.to_date(time_col)
    conv = F.col(type_col) == conversion_type
    if value_col is not None:
        conv = conv & (F.col(value_col) >= F.lit(float(conv_value)))
    return (events.groupBy(F.col(user_col).alias("user"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.max(conv.cast("int")).alias("converted"),
                 F.min(day).alias("first_day"),
                 F.min(F.when(conv, day)).alias("first_conv_day")))


def experiment_readout_fold(counters: DataFrame, seed: str = "ab1",
                            round_digits: int = 6) -> DataFrame:
    """Batch-side fold of :func:`experiment_stream_counters`: md5 arm
    assignment over the final unit counters, then the live experiment
    readout — per arm: units, conversions, conversion rate, exact mean
    events/unit — plus the pooled two-proportion z, the SRM z and the
    ``significant`` flag (|z| > 1.96), repeated per row for dashboard
    convenience.

    This is :func:`ab_proportion_test`'s discipline over streaming
    state: the per-arm aggregate executes EXACTLY ONCE (bounded ≤3-row
    collect feeding both the statistics and the returned local
    relation).  The ``significant`` flag is the PEEKING hazard
    :func:`peeking_trace` visualizes — a dashboard refreshing this
    readout every batch is peeking; the flag is labeled for the
    fixed-horizon readout and consumers pre-register the horizon.

    Returns one row per arm ``(arm, n_users, n_converted, conv_rate,
    avg_events, z, srm_z, significant)`` ordered by arm.
    """
    units = counters.withColumn("arm", ab_assign(F.col("user"), seed))
    per = (units.groupBy("arm")
           .agg(F.count(F.lit(1)).alias("n_users"),
                F.sum(F.col("converted").cast("bigint"))
                .alias("n_converted"),
                F.sum(F.col("n_events").cast("decimal(38,0)"))
                .alias("sum_events"))
           .orderBy("arm"))
    rows = per.limit(3).collect()  # bounded: arms are a tiny domain
    if len(rows) != 2:
        raise ValueError(f"experiment_readout_fold needs exactly 2 arms, "
                         f"got {len(rows)}")
    (na, ca, _), (nb, cb, _) = [
        (r["n_users"], r["n_converted"], r["sum_events"]) for r in rows]
    pool = (ca + cb) / (na + nb)
    if pool in (0.0, 1.0):
        raise ValueError("degenerate conversion metric: pooled rate is "
                         f"{pool} — the z statistic is undefined")
    z = ((ca / na - cb / nb)
         / math.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb)))
    n = na + nb
    srm_z = (na - n / 2.0) / math.sqrt(n / 4.0)
    local = counters.sparkSession.createDataFrame(rows, schema=per.schema)
    r6 = lambda c: F.round(c, round_digits) + F.lit(0.0)  # noqa: E731
    rl = lambda v: F.round(F.lit(v), round_digits) + F.lit(0.0)  # noqa: E731
    nd = F.col("n_users").cast("double")
    return (local.select(
        "arm", "n_users", "n_converted",
        r6(F.col("n_converted").cast("double") / nd).alias("conv_rate"),
        r6(F.col("sum_events").cast("double") / nd).alias("avg_events"),
        rl(z).alias("z"), rl(srm_z).alias("srm_z"),
        F.lit(bool(abs(z) > 1.96)).alias("significant"))
        .orderBy("arm"))


def required_sample_size(units: DataFrame, converted_col: str,
                         rel_lift: float,
                         units_per_day: float | None = None,
                         z_alpha: float = Z_ALPHA_0_05,
                         z_power: float = Z_POWER_0_80,
                         round_digits: int = 6) -> DataFrame:
    """Pre-experiment sample-size calculator: the per-arm n needed to
    detect a ``rel_lift`` relative change of the CURRENT baseline rate
    at two-sided α=0.05 / power 0.80 — the inverse of
    :func:`ab_power_mde` (that one asks "what could we see at the n we
    have", this asks "what n do we need for the lift we care about"):

        n_per_arm = 2 · p̂(1−p̂) · ((z_{α/2} + z_β) / (p̂·lift))²

    plus, when the caller passes the observed ``units_per_day``, the
    runway in days to fill BOTH arms — so the answer is a date, not
    just a number.

    ONE aggregate over the unit table (exact BIGINT count +
    conversions), collected once; closed-form doubles (explicit
    multiplies — pow is not correctly rounded); local-relation result.

    Returns ONE row ``(n_units, baseline_rate, target_rate,
    n_per_arm_required, days_required)`` — ``days_required`` NULL when
    no arrival rate was given.
    """
    if rel_lift <= 0.0:
        raise ValueError(f"rel_lift must be > 0, got {rel_lift}")
    agg = units.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(converted_col).cast("bigint")).alias("c"))
    row = agg.limit(1).collect()[0]
    n, c = row["n"], row["c"]
    if c == 0 or c == n:
        raise ValueError("degenerate baseline rate — sizing is undefined")
    p = c / n
    ratio = (z_alpha + z_power) / (p * rel_lift)
    need = math.ceil(2.0 * p * (1.0 - p) * (ratio * ratio))
    days = (int(math.ceil(2.0 * need / units_per_day))
            if units_per_day else None)
    local = units.sparkSession.createDataFrame(
        [(n,)], "n_units bigint")
    r6 = lambda v: F.round(F.lit(v), round_digits) + F.lit(0.0)  # noqa: E731
    return local.select(
        "n_units", r6(p).alias("baseline_rate"),
        r6(p * (1.0 + rel_lift)).alias("target_rate"),
        F.lit(int(need)).cast("bigint").alias("n_per_arm_required"),
        F.lit(days).cast("bigint").alias("days_required"))


def dml_partial_linear_ate(units: DataFrame, arm_col: str, y_col: str,
                           stratum_col: str, arms: tuple = ("A", "B"),
                           round_digits: int = 6) -> DataFrame:
    """Partialling-out treatment effect for the partially linear model
    (the double-ML estimand of Chernozhukov et al. 2018 §4.1, with
    categorical controls where the nuisance regressions have CLOSED
    FORMS): residualize outcome and treatment on the stratum —
    within-stratum demeaning, the exact OLS-on-dummies fit by
    Frisch–Waugh–Lovell — then regress residual on residual:

        θ̂ = Σ ỹᵢ·d̃ᵢ / Σ d̃ᵢ²,   ỹ = y − ȳ_stratum,  d̃ = t − t̄_stratum
        se = √(Σ d̃ᵢ²·êᵢ²) / Σ d̃ᵢ²,   ê = ỹ − θ̂·d̃      (HC0 sandwich)

    Complements :func:`aipw_ate`: AIPW models the outcome per arm and
    needs positivity per stratum; partialling-out pools the slope and
    stays defined when a stratum is single-arm (its d̃ is just its
    demeaned share).  Because the nuisances are exact conditional means
    (not fitted learners), no cross-fitting split is required for
    validity here — the caveat for LEARNED nuisances stands (op. cit.).

    Plan: one (stratum) aggregate for the two means (DECIMAL-exact),
    broadcast back (|strata| rows), TWO global folds in DECIMAL(38,9)
    — first the θ̂ moments, then the sandwich with θ̂ joined as a
    1-row broadcast scalar.  Returns ONE row
    ``(n_units, n_strata, theta, se)``.
    """
    control, treated = arms
    y = F.col(y_col).cast("double")
    t = (F.col(arm_col) == treated).cast("double")
    base = (units.filter(F.col(arm_col).isin(list(arms)) & y.isNotNull())
            .select(F.col(stratum_col).alias("__x"), y.alias("__y"),
                    t.alias("__t")))
    nuis = base.groupBy("__x").agg(
        (F.sum(F.col("__y").cast("decimal(38,9)")).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("__my"),
        (F.sum(F.col("__t").cast("decimal(38,9)")).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("__mt"))
    res = (base.join(F.broadcast(nuis), "__x")
           .select((F.col("__y") - F.col("__my")).alias("__ry"),
                   (F.col("__t") - F.col("__mt")).alias("__rt")))
    # round-9 before the decimal cast: the aipw psi-fold convention —
    # the scaled integers stay exact and both engines cast identically
    mom = res.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.round(F.col("__ry") * F.col("__rt"), 9)
              .cast("decimal(38,9)")).cast("double").alias("__syd"),
        F.sum(F.round(F.col("__rt") * F.col("__rt"), 9)
              .cast("decimal(38,9)")).cast("double").alias("__sdd"))
    theta = mom.select(
        "n_units", "__sdd",
        (F.col("__syd") / F.col("__sdd")).alias("__theta"))
    e = F.col("__ry") - F.col("__theta") * F.col("__rt")
    sand = (res.crossJoin(F.broadcast(theta))
            .agg(F.first("n_units").alias("n_units"),
                 F.first("__theta").alias("__theta"),
                 F.first("__sdd").alias("__sdd"),
                 F.sum(F.round(F.col("__rt") * F.col("__rt") * e * e, 9)
                       .cast("decimal(38,9)")).cast("double")
                 .alias("__meat")))
    n_strata = nuis.count()
    return sand.select(
        "n_units", F.lit(n_strata).cast("long").alias("n_strata"),
        (F.round(F.col("__theta"), round_digits) + F.lit(0.0))
        .alias("theta"),
        (F.round(F.sqrt(F.col("__meat")) / F.col("__sdd"), round_digits)
         + F.lit(0.0)).alias("se"))
