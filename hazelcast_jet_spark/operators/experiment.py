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
