"""Analytic sanity pins for the r12-session operators — each checked
against a case whose answer is known in closed form (the oracle-parity
mirror covers the gated substrates; these pin the math itself).
"""

import math

import pytest
from pyspark.sql import functions as F


def test_degree_assortativity_closed_forms(spark):
    from hazelcast_jet_spark.operators.graph import degree_assortativity

    # star K_{1,3}: perfectly disassortative
    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)],
                                 "src long, dst long")
    r = degree_assortativity(star).collect()[0]
    assert (r.n_edges, r.n_nodes, r.assortativity) == (3, 4, -1.0)
    # path P4: the textbook -0.5
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                                 "src long, dst long")
    assert degree_assortativity(path).collect()[0].assortativity == -0.5
    # duplicate/reversed rows canonicalize away
    noisy = spark.createDataFrame([(0, 1), (1, 0), (0, 1), (1, 2), (2, 3)],
                                  "src long, dst long")
    assert degree_assortativity(noisy).collect()[0].assortativity == -0.5


def test_resource_allocation_cycle_and_hub(spark):
    from hazelcast_jet_spark.operators.graph import resource_allocation_links

    # C4: both diagonals score 1/2 + 1/2 = 1.0 through two degree-2 centers
    cyc = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)],
                                "src long, dst long")
    got = {(r.src, r.dst): (r.n_common, r.ra_score)
           for r in resource_allocation_links(cyc, top_k=5).collect()}
    assert got == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}
    # hub cap: a degree-4 center above max_degree contributes no wedges
    hub = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long")
    assert resource_allocation_links(hub, top_k=10,
                                     max_degree=3).count() == 0
    # below the cap the fan pairs appear, each 1/4
    got2 = {(r.src, r.dst): r.ra_score
            for r in resource_allocation_links(hub, top_k=10,
                                               max_degree=4).collect()}
    assert got2 == {(a, b): 0.25 for a in range(1, 5)
                    for b in range(a + 1, 5)}


def test_theta_forecast_linear_series(spark):
    """On x_t = 2 + 3t the OLS fit is exact, the theta2 line equals the
    series, and the forecast is the closed-form SES/trend average."""
    from hazelcast_jet_spark.operators.timeseries import theta_forecast

    df = spark.createDataFrame([("k", t, 2.0 + 3 * t) for t in range(1, 9)],
                               "key string, t int, v double")
    out = {r.step: r for r in theta_forecast(df, "key", "t", "v",
                                             h=2).collect()}
    s = None
    for t in range(1, 9):
        y = 2.0 * (2.0 + 3 * t) - (2.0 + 3.0 * t)
        s = y if s is None else 0.5 * y + 0.5 * s
    assert out[1].slope == 3.0 and out[1].n == 8
    assert out[1].ses_level == pytest.approx(s, abs=1e-6)
    assert out[1].forecast == pytest.approx(0.5 * s + 0.5 * (2 + 3 * 9),
                                            abs=1e-6)
    assert out[2].forecast == pytest.approx(0.5 * s + 0.5 * (2 + 3 * 10),
                                            abs=1e-6)


def test_sax_monotone_ramp(spark):
    """A linear ramp z-normalizes symmetrically: 4 segments map to the
    4 letters in order, PAA means symmetric around 0."""
    from hazelcast_jet_spark.operators.timeseries import sax_symbols

    df = spark.createDataFrame([("k", t, float(t)) for t in range(1, 9)],
                               "key string, t int, v double")
    rows = sax_symbols(df, "key", "t", "v", segments=4,
                       alphabet=4).collect()
    assert [r.symbol for r in rows] == ["a", "b", "c", "d"]
    assert rows[0].paa == -rows[3].paa and rows[1].paa == -rows[2].paa
    with pytest.raises(ValueError, match="alphabet"):
        sax_symbols(df, "key", "t", "v", alphabet=7)


def test_fd_violations_g3(spark):
    from hazelcast_jet_spark.operators.profile import fd_violations

    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (2, "b", "x"), (3, "b", "x"),
         (4, None, "z")],
        "k long, l string, r string")
    out = {r.fd: r for r in fd_violations(
        df, [(["k"], "l"), (["l"], "r")]).collect()}
    # k->l holds on the 4 non-null rows (k=1 twice, 2, 3 -> 3 groups)
    assert (out["k->l"].n_groups, out["k->l"].n_violating,
            out["k->l"].g3_error) == (3, 0, 0.0)
    # l->r: group a holds {x,y} -> delete 1 of 4 rows
    assert (out["l->r"].n_rows, out["l->r"].n_violating,
            out["l->r"].g3_error) == (4, 1, 0.25)
    with pytest.raises(ValueError, match="at least one"):
        fd_violations(df, [])


def test_dml_partialling_out_removes_confounding(spark):
    from hazelcast_jet_spark.operators.experiment import (
        dml_partial_linear_ate)

    rows = ([("B", "s1", 12.0)] * 3 + [("A", "s1", 10.0)]
            + [("B", "s2", 2.0)] + [("A", "s2", 0.0)] * 3)
    df = spark.createDataFrame(rows, "arm string, stratum string, y double")
    r = dml_partial_linear_ate(df, "arm", "y", "stratum").collect()[0]
    # naive diff-in-means is 9.5 - 2.5 = 7 (confounded); theta is exact 2
    assert (r.n_units, r.n_strata, r.theta, r.se) == (8, 2, 2.0, 0.0)


def test_radius_join_exact_vs_brute_force(spark):
    from hazelcast_jet_spark.operators.spatial import radius_join

    lpts = {1: (0.0, 0.0), 2: (10.0, 10.0)}
    rpts = {10: (0.5, 0.5), 11: (0.9, 0.0), 12: (1.5, 0.0),
            13: (9.5, 10.5), 14: (-0.75, -0.5)}
    L = spark.createDataFrame([(k, *v) for k, v in lpts.items()],
                              "id long, x double, y double")
    R = spark.createDataFrame([(k, *v) for k, v in rpts.items()],
                              "id long, x double, y double")
    got = sorted((r["id_l"], r["id_r"], r["dist2"])
                 for r in radius_join(L, R, radius=1.0).collect())
    want = sorted(
        (a, b, round((xa - xb) ** 2 + (ya - yb) ** 2, 6))
        for a, (xa, ya) in lpts.items() for b, (xb, yb) in rpts.items()
        if (xa - xb) ** 2 + (ya - yb) ** 2 <= 1.0)
    assert got == want and len(got) == 4
    # boundary inclusion: dist == radius exactly (binary-rational) joins
    L2 = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    R2 = spark.createDataFrame([(2, 1.0, 0.0), (3, 1.0000001, 0.0)],
                               "id long, x double, y double")
    ids = {r["id_r"] for r in radius_join(L2, R2, radius=1.0).collect()}
    assert ids == {2}


def test_stream_cusum_equals_batch(spark, tmp_path):
    """The carried-state streaming CUSUM replays the batch detector
    row-for-row across trigger boundaries, and polices duplicates the
    kalman way."""
    import os

    from hazelcast_jet_spark.operators.timeseries import cusum_alarms
    from hazelcast_jet_spark.streaming.cusum import stream_cusum_alarms
    from hazelcast_jet_spark.streaming.run import run_to_batch

    daily = spark.createDataFrame(
        [("a", f"2024-01-{d:02d}", float(v)) for d, v in
         enumerate([5, 5, 9, 9, 9, 5, 12], start=1)]
        + [("b", f"2024-01-{d:02d}", float(v)) for d, v in
           enumerate([3, 3, 3, 3], start=1)],
        "k string, day string, n double") \
        .select("k", F.to_date("day").alias("day"), "n")
    batch = cusum_alarms(daily, "k", "day", "n", slack=0.0, threshold=4.0)
    want = sorted((r.k, str(r.day), r.cusum, r.alarm)
                  for r in batch.collect())
    targets = daily.groupBy("k").agg(
        (F.sum(F.col("n").cast("decimal(28,12)")).cast("double")
         / F.count(F.lit(1)).cast("double")).alias("target"))

    src = str(tmp_path / "src"); os.makedirs(src)
    for i, pred in enumerate([F.dayofmonth("day") <= 2,
                              (F.dayofmonth("day") > 2)
                              & (F.dayofmonth("day") <= 5),
                              F.dayofmonth("day") > 5]):
        daily.filter(pred).coalesce(1).write.parquet(f"{src}/f{i}")
    stream = (spark.readStream.schema("k string, day date, n double")
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    out = stream_cusum_alarms(stream, "k", "day", "n", targets,
                              slack=0.0, threshold=4.0)
    got = sorted((r.k, str(r.day), r.cusum, r.alarm)
                 for r in run_to_batch(out, "update").collect())
    assert got == want


def test_knn_join_ranks_and_radius_cap(spark):
    from hazelcast_jet_spark.operators.spatial import knn_join

    L = spark.createDataFrame([(1, 0.0, 0.0), (2, 5.0, 5.0)],
                              "id long, x double, y double")
    R = spark.createDataFrame(
        [(10, 0.5, 0.0), (11, 0.0, 1.0), (12, 0.25, 0.25),
         (13, 5.5, 5.0), (14, 9.0, 9.0)],
        "id long, x double, y double")
    got = sorted((r["id_l"], r["rank"], r["id_r"], r["dist2"])
                 for r in knn_join(L, R, k=2, radius=2.0,
                                   left_id="id", right_id="id").collect())
    # left 1: 12 (0.125) then 10 (0.25); left 2: only 13 in radius
    assert got == [(1, 1, 12, 0.125), (1, 2, 10, 0.25),
                   (2, 1, 13, 0.25)]
    # deterministic tie-break: equal distances order by right id
    Rt = spark.createDataFrame([(20, 1.0, 0.0), (21, -1.0, 0.0)],
                               "id long, x double, y double")
    tie = [(r["rank"], r["id_r"]) for r in
           knn_join(L.limit(1), Rt, k=2, radius=1.0,
                    left_id="id", right_id="id")
           .orderBy("rank").collect()]
    assert tie == [(1, 20), (2, 21)]
    with pytest.raises(ValueError, match="left_id"):
        knn_join(L, R, k=1, radius=1.0, left_id="nope", right_id="id")


def test_grid_density_clusters_blobs_and_noise(spark):
    from hazelcast_jet_spark.operators.spatial import (
        CELL_OFF, CELL_SPAN, grid_density_clusters)

    def key(cx, cy):
        return (cx + CELL_OFF) * CELL_SPAN + (cy + CELL_OFF)

    # blob A spans two ADJACENT core cells (0,0)+(1,1) (diagonal touch),
    # blob B is one isolated core cell, one point is noise
    pts = spark.createDataFrame(
        [(i, 0.5, 0.5) for i in range(3)]
        + [(10 + i, 1.5, 1.5) for i in range(3)]
        + [(20 + i, 10.5, 10.5) for i in range(3)]
        + [(99, 5.5, 5.5)],
        "id long, x double, y double")
    out = grid_density_clusters(pts, cell=1.0, min_pts=3)
    lab = {r.id: r.cluster for r in out.collect()}
    a = key(0, 0)
    assert all(lab[i] == a for i in range(3))          # min cell key wins
    assert all(lab[10 + i] == a for i in range(3))     # diagonal merged
    assert all(lab[20 + i] == key(10, 10) for i in range(3))
    assert lab[99] is None                             # noise
    # min_pts boundary: raising it demotes blob B to noise
    out2 = grid_density_clusters(pts, cell=1.0, min_pts=4)
    assert all(r.cluster is None for r in out2.collect())


def test_hotspot_gi_closed_form(spark):
    """Three occupied cells, no two adjacent: W_i = 1 everywhere, so
    z_i = (x_i - xbar) / (S * sqrt((n-1)/(n-1))) = (x_i - xbar)/S."""
    import math

    from hazelcast_jet_spark.operators.spatial import hotspot_gi

    pts = spark.createDataFrame(
        [(i, 0.5, 0.5) for i in range(9)]
        + [(100 + i, 5.5, 5.5) for i in range(1)]
        + [(200 + i, 10.5, 10.5) for i in range(4)],
        "id long, x double, y double")
    out = {(r.cx, r.cy): r for r in hotspot_gi(pts, cell=1.0).collect()}
    xs = {(0, 0): 9, (5, 5): 1, (10, 10): 4}
    n = 3
    xbar = sum(xs.values()) / n
    s = math.sqrt(sum(v * v for v in xs.values()) / n - xbar * xbar)
    for cell, v in xs.items():
        r = out[cell]
        assert (r.n_points, r.w, r.g) == (v, 1, v)
        assert r.z == round((v - xbar) / s, 6) + 0.0
    # adjacent pair pools its neighborhood: w=2 over the joint cells
    pts2 = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 0.5, 0.5), (3, 1.5, 0.5), (4, 10.5, 0.5)],
        "id long, x double, y double")
    out2 = {(r.cx, r.cy): r for r in hotspot_gi(pts2, cell=1.0).collect()}
    assert (out2[(0, 0)].w, out2[(0, 0)].g) == (2, 3)
    assert (out2[(10, 0)].w, out2[(10, 0)].g) == (1, 1)
    # a single occupied cell has zero variance -> NULL z
    one = spark.createDataFrame([(1, 0.5, 0.5)],
                                "id long, x double, y double")
    assert hotspot_gi(one, cell=1.0).collect()[0].z is None


def test_hits_bipartite_closed_form(spark):
    """Hand-unrolled two iterations on hubs {1,2} -> auths {10,11}:
    a1 = (1.0, 0.5), h1 = (1.0, 2/3), a2 = (1.0, 0.6),
    h2 = (1.0, 0.625)."""
    from hazelcast_jet_spark.operators.graph import hits

    e = spark.createDataFrame([(1, 10), (1, 11), (2, 10)],
                              "src long, dst long")
    got = {(r.side, r.node): r.score
           for r in hits(e, iters=2).collect()}
    assert got == {("hub", 1): 1.0, ("hub", 2): 0.625,
                   ("auth", 10): 1.0, ("auth", 11): 0.6}
    # one iteration: the in/out-degree co-ranking
    got1 = {(r.side, r.node): r.score
            for r in hits(e, iters=1).collect()}
    assert got1[("auth", 10)] == 1.0 and got1[("auth", 11)] == 0.5
    assert got1[("hub", 1)] == 1.0 and got1[("hub", 2)] == round(2 / 3, 9)
    # duplicate edges collapse; the top of each side is pinned at 1.0
    e2 = spark.createDataFrame([(1, 10), (1, 10), (2, 10), (1, 11)],
                               "src long, dst long")
    got2 = {(r.side, r.node): r.score for r in hits(e2, iters=3).collect()}
    assert max(v for (s, _), v in got2.items() if s == "hub") == 1.0
    assert max(v for (s, _), v in got2.items() if s == "auth") == 1.0
    with pytest.raises(ValueError, match="iters"):
        hits(e, iters=0)


def test_ucc_profile_key_detection(spark):
    from hazelcast_jet_spark.operators.profile import ucc_profile

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 20), (4, "b", 20),
         (5, None, 30)],
        "id long, grp string, v long")
    out = {r.ucc: r for r in ucc_profile(
        df, [["id"], ["grp"], ["grp", "v"]]).collect()}
    assert out["id"].is_unique and out["id"].max_mult == 1
    assert out["id"].dup_fraction == 0.0
    # NULL rows excluded: grp has 4 non-null rows in 2 groups
    g = out["grp"]
    assert (g.n_rows, g.n_groups, g.max_mult, g.is_unique) == (4, 2, 2, False)
    assert g.dup_fraction == 0.5
    # the pair separates all but the (b,20) duplicate
    gv = out["grp,v"]
    assert (gv.n_groups, gv.max_mult, gv.is_unique) == (3, 2, False)
    with pytest.raises(ValueError, match="at least one"):
        ucc_profile(df, [])


def test_stream_funnel_equals_batch(spark, tmp_path):
    """The carried-state streaming funnel reaches the same per-user
    completion depth as the batch earliest-completion fold, across
    trigger boundaries, including the strictly-after and
    within_seconds semantics."""
    import os

    from hazelcast_jet_spark.operators.timeseries import funnel_counts
    from hazelcast_jet_spark.streaming.funnel import stream_funnel_progress
    from hazelcast_jet_spark.streaming.run import run_to_batch

    stages = ["view", "click", "purchase"]
    rows = [
        # u1 completes all three in order
        ("u1", "view", "2024-01-01 00:00:00"),
        ("u1", "click", "2024-01-02 00:00:00"),
        ("u1", "purchase", "2024-01-05 00:00:00"),
        # u2 clicks BEFORE viewing -> stuck at stage 1
        ("u2", "click", "2024-01-01 00:00:00"),
        ("u2", "view", "2024-01-03 00:00:00"),
        # u3 view+click at the SAME instant -> click not strictly after
        ("u3", "view", "2024-01-02 00:00:00"),
        ("u3", "click", "2024-01-02 00:00:00"),
        # u4 never views
        ("u4", "purchase", "2024-01-04 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, "
                                     "t string") \
        .select("user_id", "event_type",
                F.expr("CAST(t AS TIMESTAMP_NTZ)").alias("ts"))
    batch = {(r.stage, r.event_type): r.n_keys
             for r in funnel_counts(df, stages).collect()}

    src = str(tmp_path / "src"); os.makedirs(src)
    for i, pred in enumerate([F.col("ts") < F.expr(
            "CAST('2024-01-02 12:00:00' AS TIMESTAMP_NTZ)"),
            F.col("ts") >= F.expr(
            "CAST('2024-01-02 12:00:00' AS TIMESTAMP_NTZ)")]):
        df.filter(pred).coalesce(1).write.parquet(f"{src}/f{i}")
    stream = (spark.readStream
              .schema("user_id string, event_type string, "
                      "ts timestamp_ntz")
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    prog = stream_funnel_progress(stream, stages)
    out = run_to_batch(prog, "update")
    final = (out.groupBy("user_id")
             .agg(F.max("stage_reached").alias("depth")))
    got = {i + 1: final.filter(F.col("depth") >= i + 1).count()
           for i in range(3)}
    assert got == {i + 1: batch[(i + 1, s)]
                   for i, s in enumerate(stages)}
    assert got == {1: 3, 2: 1, 3: 1}

    # within_seconds bounds the whole conversion against t0
    b = funnel_counts(df, stages, within_seconds=3 * 86400).collect()
    batch_b = {r.stage: r.n_keys for r in b}
    prog_b = stream_funnel_progress(
        (spark.readStream.schema("user_id string, event_type string, "
                                 "ts timestamp_ntz")
         .option("maxFilesPerTrigger", 1).parquet(src + "/f*")),
        stages, within_seconds=3 * 86400)
    out_b = run_to_batch(prog_b, "update")
    final_b = (out_b.groupBy("user_id")
               .agg(F.max("stage_reached").alias("depth")))
    got_b = {i + 1: final_b.filter(F.col("depth") >= i + 1).count()
             for i in range(3)}
    assert got_b == batch_b      # u1's purchase at +4d falls outside
    assert got_b[3] == 0


def test_cell_key_out_of_bounds_raises(spark):
    from hazelcast_jet_spark.operators.spatial import grid_density_clusters

    far = spark.createDataFrame([(1, 0.5, 0.5), (2, 2.0e6, 0.5)],
                                "id long, x double, y double")
    with pytest.raises(Exception, match="cell_key"):
        grid_density_clusters(far, cell=1.0, min_pts=1).collect()


def test_sax_constant_series_symbol_is_null(spark):
    from hazelcast_jet_spark.operators.timeseries import sax_symbols

    df = spark.createDataFrame(
        [("flat", t, 5.0) for t in range(1, 9)]
        + [("ramp", t, float(t)) for t in range(1, 9)],
        "key string, t int, v double")
    out = sax_symbols(df, "key", "t", "v", segments=4, alphabet=4)
    flat = out.filter(F.col("key") == "flat").collect()
    assert all(r.symbol is None and r.paa is None for r in flat)
    ramp = [r.symbol for r in out.filter(F.col("key") == "ramp")
            .orderBy("segment").collect()]
    assert ramp[0] < ramp[-1] and None not in ramp
