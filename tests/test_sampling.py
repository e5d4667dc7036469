"""Deterministic sampling operators (training-data pipeline extension —
no Jet analog; operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators.sampling import (
    deterministic_sample,
    reservoir_sample,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )


def test_deterministic_sample_rate_and_stability(spark, docs):
    s1 = deterministic_sample(docs, 0.3, "doc_id", seed="a")
    n = s1.count()
    assert 0.25 * 2000 < n < 0.35 * 2000  # ~binomial around 600
    # same seed → identical membership, regardless of partitioning
    s2 = deterministic_sample(docs.repartition(13), 0.3, "doc_id", seed="a")
    assert sorted(r.doc_id for r in s1.collect()) == sorted(
        r.doc_id for r in s2.collect())
    # different seed → different membership
    s3 = deterministic_sample(docs, 0.3, "doc_id", seed="b")
    assert {r.doc_id for r in s3.collect()} != {r.doc_id for r in s1.collect()}


def test_deterministic_sample_is_subset_monotone(spark, docs):
    """rate r1 < r2 ⇒ sample(r1) ⊆ sample(r2) (threshold semantics) —
    lets a pipeline grow a sample without resampling everything."""
    small = {r.doc_id for r in deterministic_sample(docs, 0.1, "doc_id").collect()}
    big = {r.doc_id for r in deterministic_sample(docs, 0.4, "doc_id").collect()}
    assert small <= big


def test_stratified_rates(spark, docs):
    out = stratified_sample(
        docs, "doc_id", "stratum",
        rates={"0": 1.0, "1": 0.5, "2": 0.0}, default_rate=0.1,
    ).groupBy("stratum").count().collect()
    got = {r.stratum: r["count"] for r in out}
    assert got["0"] == 500               # rate 1.0 keeps everything
    assert 200 < got["1"] < 300          # ~250
    assert "2" not in got                # rate 0 drops the stratum
    assert 20 < got["3"] < 90            # default 0.1 ≈ 50


def test_stratified_is_map_only(spark, docs):
    plan = stratified_sample(
        docs, "doc_id", "stratum", rates={"0": 0.5}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure filter, no shuffle/join


def test_reservoir_exact_k_per_stratum(spark, docs):
    out = reservoir_sample(docs, 7, "doc_id", stratum_col="stratum")
    counts = {r.stratum: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert counts == {"0": 7, "1": 7, "2": 7, "3": 7}
    # deterministic under repartitioning
    again = reservoir_sample(docs.repartition(17), 7, "doc_id", stratum_col="stratum")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_reservoir_global(spark, docs):
    assert reservoir_sample(docs, 11, "doc_id").count() == 11


def test_deterministic_shuffle_reproducible_and_uniform(spark, sf_dir):
    from hazelcast_jet_spark.operators.sampling import deterministic_shuffle
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def run(df, seed):
        out = deterministic_shuffle(df, "doc_id", seed=seed, num_shards=8)
        rows = out.collect()
        per_shard = {}
        for r in rows:
            per_shard.setdefault(r["shard"], []).append(r["doc_id"])
        return per_shard

    a = run(d, "epoch1")
    b = run(d.repartition(13), "epoch1")      # different input partitioning
    assert a == b                             # shard membership AND intra-shard order
    assert sum(len(v) for v in a.values()) == d.count()
    # roughly uniform shards (md5 is well-mixed; 500 docs over 8 shards)
    sizes = sorted(len(v) for v in a.values())
    assert sizes[0] > 30 and sizes[-1] < 100

    c = run(d, "epoch2")                      # new epoch = new permutation
    assert c != a
    assert sorted(x for v in c.values() for x in v) == \
        sorted(x for v in a.values() for x in v)


def test_deterministic_shuffle_no_global_sort(spark, sf_dir):
    from hazelcast_jet_spark.operators.sampling import deterministic_shuffle
    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents")
    out = deterministic_shuffle(d, "doc_id", num_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()   # no global sort barrier
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# quota_per_key (per-domain caps) + split_by_key (train/val/test)
# ---------------------------------------------------------------------------

def test_quota_per_key_cap_and_determinism(spark, docs):
    from hazelcast_jet_spark.operators.sampling import quota_per_key

    out = quota_per_key(docs, "stratum", 7, "doc_id", seed="q")
    sizes = {r["stratum"]: r["n"] for r in
             out.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
    assert all(n == 7 for n in sizes.values()) and len(sizes) == 4
    # re-run picks the identical membership (pure function of seed+key)
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in
                  quota_per_key(docs, "stratum", 7, "doc_id", seed="q").collect())
    assert ids1 == ids2


def test_quota_prefilter_is_lossless(spark, docs):
    from hazelcast_jet_spark.operators.sampling import quota_per_key

    fast = quota_per_key(docs, "stratum", 5, "doc_id", seed="z",
                         local_prefilter=True)
    exact = quota_per_key(docs, "stratum", 5, "doc_id", seed="z",
                          local_prefilter=False)
    assert (sorted(map(tuple, fast.collect()))
            == sorted(map(tuple, exact.collect())))


def test_quota_smaller_groups_pass_through(spark):
    from hazelcast_jet_spark.operators.sampling import quota_per_key

    df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit("only").alias("src"))
    assert quota_per_key(df, "src", 100, "doc_id").count() == 10


def test_split_by_key_partitions_everything(spark, docs):
    from hazelcast_jet_spark.operators.sampling import split_by_key

    out = split_by_key(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}  # no NULL split
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_by_key_group_safe_and_stable(spark):
    from hazelcast_jet_spark.operators.sampling import split_by_key

    # rows sharing a key must land in the SAME split (leakage safety)
    df = spark.range(0, 3000).select(
        (F.col("id") % 100).alias("host"), F.col("id").alias("row_id"))
    out = split_by_key(df, "host", {"train": 0.5, "test": 0.5})
    per_key = out.groupBy("host").agg(
        F.countDistinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_key)


def test_split_by_key_partial_fractions_hold_out(spark, docs):
    from hazelcast_jet_spark.operators.sampling import split_by_key

    out = split_by_key(docs, "doc_id", {"train": 0.2})
    n_null = out.filter(F.col("split").isNull()).count()
    assert n_null > 1000  # ~80% held out entirely
    with pytest.raises(ValueError):
        split_by_key(docs, "doc_id", {"a": 0.9, "b": 0.2})


def test_quota_prefilter_keeps_null_quota_group(spark):
    """Regression: pandas groupby drops the NaN group by default, which
    would silently delete every NULL-quota-key row inside the map-side
    prefilter while the exact window path ranks NULL as its own group."""
    from hazelcast_jet_spark.operators.sampling import quota_per_key

    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"g{i % 2}") for i in range(60)],
        "doc_id long, src string")
    fast = quota_per_key(df, "src", 4, "doc_id", seed="nn",
                         local_prefilter=True)
    exact = quota_per_key(df, "src", 4, "doc_id", seed="nn",
                          local_prefilter=False)
    f_rows = sorted(map(tuple, fast.collect()))
    e_rows = sorted(map(tuple, exact.collect()))
    assert f_rows == e_rows
    assert sum(1 for _, s in f_rows if s is None) == 4  # NULL group capped too


def test_weighted_sample_proportional_and_clamped(spark, docs):
    """Keep rate tracks min(1, rate*w) per weight band; w<=0 and NULL
    never keep; w*rate>=1 keeps unconditionally."""
    from hazelcast_jet_spark.operators.sampling import weighted_sample

    # four weight bands: 0.0, 0.5, 1.0, 3.0 at rate 0.5 → p = 0, .25, .5, 1
    d = docs.withColumn(
        "w",
        F.element_at(F.array(F.lit(0.0), F.lit(0.5), F.lit(1.0), F.lit(3.0)),
                     (F.col("doc_id") % 4 + 1).cast("int")))
    out = weighted_sample(d, 0.5, "w", "doc_id", seed="ws")
    got = {r.w: r["count"] for r in out.groupBy("w").count().collect()}
    assert 0.0 not in got                 # p=0 band: nothing kept
    assert 80 < got[0.5] < 170            # ~125 of 500
    assert 190 < got[1.0] < 310           # ~250 of 500
    assert got[3.0] == 500                # p=1 band: everything kept
    # deterministic: repartitioning does not change membership
    again = weighted_sample(d.repartition(7), 0.5, "w", "doc_id", seed="ws")
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in out.collect())


def test_weighted_sample_null_and_negative_weights_drop(spark):
    from hazelcast_jet_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, -5.0), (2, None), (3, 2.0)], "doc_id long, w double")
    kept = weighted_sample(df, 1.0, "w", "doc_id").collect()
    assert [r.doc_id for r in kept] == [3]
    with pytest.raises(ValueError):
        weighted_sample(df, -0.1, "w", "doc_id")


def test_weighted_sample_is_map_only(spark, docs):
    """The keep decision compiles into the scan stage — no exchange."""
    from hazelcast_jet_spark.operators.sampling import weighted_sample

    plan = weighted_sample(
        docs.withColumn("w", F.lit(0.5)), 0.5, "w", "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_sample_flattens_mix(spark):
    from hazelcast_jet_spark.operators.sampling import temperature_sample

    # groups of size 4000 / 1000 / 250 — heavily head-skewed
    df = spark.range(0, 5250).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 4000, "big")
        .when(F.col("id") < 5000, "mid")
        .otherwise("small").alias("lang"),
    )
    out = temperature_sample(df, "lang", "doc_id", alpha=0.5, seed="tt")
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # smallest group keeps everything (rate 1 exactly)
    assert got["small"] == 250
    # expected kept ≈ n_g * sqrt(n_min/n_g) = sqrt(n_min * n_g)
    import math
    for g, n_g in (("big", 4000), ("mid", 1000)):
        exp = math.sqrt(250 * n_g)
        assert 0.75 * exp < got[g] < 1.3 * exp, (g, got[g], exp)
    # deterministic: partitioning must not change membership
    again = temperature_sample(
        df.repartition(13), "lang", "doc_id", alpha=0.5, seed="tt")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())


def test_temperature_sample_matches_python_replay(spark):
    """The keep decision replays exactly in Python: sqrt/div are IEEE
    correctly-rounded, the threshold render is floor(rate·16^6) hex."""
    import hashlib
    import math

    from hazelcast_jet_spark.operators.sampling import temperature_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = temperature_sample(df, "lang", "doc_id", alpha=0.5, seed="tp")
    got = sorted(r["doc_id"] for r in out.collect())

    counts = {"a": 100, "b": 100, "c": 100}
    n_min = min(counts.values())
    exp = []
    for i, lang in rows:
        rate = math.sqrt(n_min / counts[lang])
        if rate >= 1.0:
            exp.append(i)
            continue
        thr = format(int(rate * 16 ** 6), "06x")
        u = hashlib.md5(f"tp{i}".encode()).hexdigest()[:6]
        if u < thr:
            exp.append(i)
    assert got == sorted(exp)


def test_temperature_sample_alpha_one_keeps_all(spark):
    from hazelcast_jet_spark.operators.sampling import temperature_sample

    df = spark.createDataFrame(
        [(i, "x" if i < 90 else "y") for i in range(100)],
        "doc_id: long, lang: string")
    assert temperature_sample(df, "lang", "doc_id", alpha=1.0).count() == 100
    with pytest.raises(ValueError):
        temperature_sample(df, "lang", "doc_id", alpha=0.0)


def test_kfold_split_matches_python_replay_and_partitions(spark):
    """Folds replay the md5 band arithmetic exactly, cover every row,
    are group-stable by key, and NULL keys get NULL fold."""
    import hashlib

    from hazelcast_jet_spark.operators.sampling import kfold_split

    df = spark.createDataFrame(
        [(i,) for i in range(500)] + [(None,)], "key: long")
    out = {r.key: r.fold for r in kfold_split(df, "key", 4, seed="f0").collect()}
    assert out[None] is None

    def model(key):
        pfx = hashlib.md5(f"f0{key}".encode()).hexdigest()[:6]
        cum, edges = 0.0, []
        for _ in range(3):
            cum = cum + 1.0 / 4
            edges.append(format(int(cum * 16 ** 6), "06x"))
        for i, e in enumerate(edges):
            if pfx < e:
                return i
        return 3

    for k in range(500):
        assert out[k] == model(k), k
    sizes = [sum(1 for v in out.values() if v == i) for i in range(4)]
    assert sum(sizes) == 500 and min(sizes) > 80  # roughly balanced
    import pytest as _pt
    with _pt.raises(ValueError):
        kfold_split(df, "key", 1)


def test_negative_sample_deterministic_draws_and_exclusion(spark):
    """Draws replay the md5 index arithmetic exactly; self-collisions
    are dropped; reruns and repartitions give identical negatives."""
    import hashlib

    from hazelcast_jet_spark.operators.sampling import negative_sample

    items = spark.createDataFrame([(i * 10,) for i in range(7)], "item: long")
    pos = spark.createDataFrame(
        [("a", 20), ("b", 50), ("c", 0)], "key string, item long")
    out = negative_sample(pos, items, 4, "key", "item", seed="t0")
    got = sorted((r.key, r.j, r.negative) for r in out.collect())

    sorted_items = [i * 10 for i in range(7)]

    def draw(key, j):
        h = hashlib.md5(f"t0{j}:{key}".encode()).hexdigest()[:12]
        return sorted_items[int(h, 16) % 7]

    exp = sorted(
        (k, j, draw(k, j))
        for k, it in [("a", 20), ("b", 50), ("c", 0)]
        for j in range(4) if draw(k, j) != it)
    assert got == exp
    assert all(neg != dict([("a", 20), ("b", 50), ("c", 0)])[k]
               for k, _, neg in got)
    # repartitioning the inputs changes nothing
    got2 = sorted((r.key, r.j, r.negative) for r in negative_sample(
        pos.repartition(5), items.repartition(3), 4, "key", "item",
        seed="t0").collect())
    assert got2 == got
    import pytest as _pt
    with _pt.raises(ValueError):
        negative_sample(pos, items, 0, "key", "item")
    with _pt.raises(ValueError):
        negative_sample(pos, items.limit(1), 2, "key", "item")


def test_bootstrap_sums_matches_hashlib_replay_and_estimates_se(spark):
    """Every replicate's counts replay exactly from hashlib + the same
    inverse-CDF thresholds; the replicate spread approximates the
    theoretical standard error of the total."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from hazelcast_jet_spark.operators.sampling import (
        _pois1_thresholds, bootstrap_sums)

    rows = [(i, float(i % 7) + 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["rep"]: (r["n_eff"], r["sum_v"])
           for r in bootstrap_sums(df, "v", "id", n_reps=10).collect()}
    thr = [int(t, 16) for t in _pois1_thresholds()]

    def draw(key, rep):
        u = int(hashlib.md5(f"boot:{rep}:{key}".encode()).hexdigest()[:6], 16)
        for k, t in enumerate(thr):
            if u < t:
                return k
        return 8

    for rep in range(10):
        n = sum(draw(i, rep) for i, _ in rows)
        s = sum(draw(i, rep) * v for i, v in rows)
        assert got[rep][0] == n, rep
        assert abs(got[rep][1] - s) < 1e-6, rep

    # spread sanity: SE of the Poisson-bootstrap total is
    # sqrt(sum(v_i^2)); the 10-replicate std should be same order
    true_se = math.sqrt(sum(v * v for _, v in rows))
    sums = [got[r][1] for r in range(10)]
    mean = sum(sums) / len(sums)
    sd = math.sqrt(sum((x - mean) ** 2 for x in sums) / (len(sums) - 1))
    assert 0.3 * true_se < sd < 3 * true_se

    import pytest as _pt
    with _pt.raises(ValueError):
        bootstrap_sums(df, "v", "id", n_reps=1)


def test_budget_sample_crossing_and_determinism(spark):
    """budget_sample keeps rows while the PRIOR mass is under budget
    (crossing row included), walks in md5 order (partition-independent),
    and every non-empty stratum yields at least one row."""
    from hazelcast_jet_spark.operators.sampling import budget_sample

    rows = [("a", i, 100) for i in range(10)] + [("b", 100, 999)]
    df = spark.createDataFrame(rows, "src string, k long, w long")
    kept = budget_sample(df, "src", "w", budget=250, key_col="k",
                         seed="t-")
    got = kept.groupBy("src").count().collect()
    by = {r["src"]: r["count"] for r in got}
    assert by["a"] == 3          # 100+100 prior < 250 -> third row crosses
    assert by["b"] == 1          # oversized single row still kept
    again = budget_sample(df.repartition(7), "src", "w", budget=250,
                          key_col="k", seed="t-")
    assert sorted(r["k"] for r in kept.collect()) == \
        sorted(r["k"] for r in again.collect())
    import pytest as _pytest
    with _pytest.raises(ValueError):
        budget_sample(df, "src", "w", budget=0, key_col="k")
