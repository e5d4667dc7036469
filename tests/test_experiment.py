"""Experiment-analysis operators (operators/experiment.py) plus the
r8-session survival / skyline / isotropy additions — each verified
against an independent hand or pandas/numpy model, not against the
implementation's own arithmetic."""

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# ab_assign
# ---------------------------------------------------------------------------

def test_ab_assign_matches_md5_and_is_deterministic(spark):
    from hazelcast_jet_spark.operators.experiment import ab_assign

    df = spark.createDataFrame([(i,) for i in range(200)], "k long")
    got = {r["k"]: r["arm"] for r in
           df.select("k", ab_assign(F.col("k"), "s1").alias("arm")).collect()}
    for k in range(200):
        h = hashlib.md5(f"s1-{k}".encode()).hexdigest()
        assert got[k] == ("A" if h[0] < "8" else "B")
    # roughly balanced (md5 uniformity; exact count is deterministic)
    n_a = sum(1 for v in got.values() if v == "A")
    assert 60 <= n_a <= 140


# ---------------------------------------------------------------------------
# cuped_adjusted_means
# ---------------------------------------------------------------------------

def test_cuped_matches_closed_form(spark):
    """theta and adjusted means equal the numpy closed form; CUPED on a
    metric fully explained by the covariate collapses both arms to the
    same adjusted mean."""
    import numpy as np

    from hazelcast_jet_spark.operators.experiment import cuped_adjusted_means

    # covariate depends on the PAIR index (i // 2) so both arms see the
    # identical x distribution -> cov(x, arm) = 0 -> pooled theta == 3
    rng = [(i, "A" if i % 2 == 0 else "B", float(10 + ((i // 2) * 7) % 13))
           for i in range(40)]
    # post = 3*pre + arm effect (B gets +2)
    rows = [(i, a, x, 3.0 * x + (2.0 if a == "B" else 0.0))
            for (i, a, x) in rng]
    df = spark.createDataFrame(rows, "u long, arm string, pre double, post double")
    out = {r["arm"]: r for r in
           cuped_adjusted_means(df, "arm", "pre", "post").collect()}

    x = np.array([r[2] for r in rows])
    y = np.array([r[3] for r in rows])
    theta = ((x * y).sum() - x.sum() * y.sum() / len(x)) / \
            ((x * x).sum() - x.sum() ** 2 / len(x))
    assert abs(out["A"]["theta"] - round(theta, 6)) < 1e-9
    for arm in ("A", "B"):
        xa = x[[i for i, r in enumerate(rows) if r[1] == arm]]
        ya = y[[i for i, r in enumerate(rows) if r[1] == arm]]
        adj = ya.mean() - theta * (xa.mean() - x.mean())
        assert abs(out[arm]["mean_adj"] - adj) < 1e-6
    # metric = f(covariate) + constant arm effect: adjusted diff == 2
    assert abs((out["B"]["mean_adj"] - out["A"]["mean_adj"]) - 2.0) < 1e-4


# ---------------------------------------------------------------------------
# touch_attribution
# ---------------------------------------------------------------------------

def test_touch_attribution_bookends_and_direct(spark):
    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, mins, typ):
        return (eid, uid, t0 + dt.timedelta(minutes=mins), typ)

    rows = [
        # user 1: ad -> email -> purchase (first=ad, last=email)
        ev(1, 1, 0, "ad"), ev(2, 1, 5, "email"), ev(3, 1, 10, "purchase"),
        # touches AFTER the first purchase never get credit
        ev(4, 1, 20, "ad"),
        # user 2: single touch -> first == last == search
        ev(5, 2, 0, "search"), ev(6, 2, 9, "purchase"),
        # user 3: purchase with no prior touch -> (direct)
        ev(7, 3, 0, "purchase"), ev(8, 3, 5, "email"),
        # user 4: no purchase -> contributes nothing
        ev(9, 4, 0, "ad"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string")
    from hazelcast_jet_spark.operators.experiment import touch_attribution

    out = {r["channel"]: (r["n_first_touch"], r["n_last_touch"])
           for r in touch_attribution(df).collect()}
    assert out == {"(direct)": (1, 1), "ad": (1, 0),
                   "email": (0, 1), "search": (1, 1)}


def test_touch_attribution_tiebreak_on_id(spark):
    """Two touches at the identical timestamp: event_id orders them."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(2, 1, t0, "b_channel"), (1, 1, t0, "a_channel"),
            (3, 1, t0 + dt.timedelta(minutes=1), "purchase")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string")
    from hazelcast_jet_spark.operators.experiment import touch_attribution

    out = {r["channel"]: (r["n_first_touch"], r["n_last_touch"])
           for r in touch_attribution(df).collect()}
    assert out == {"a_channel": (1, 0), "b_channel": (0, 1)}


# ---------------------------------------------------------------------------
# kaplan_meier
# ---------------------------------------------------------------------------

def test_kaplan_meier_textbook_example(spark):
    """Hand-computed product-limit curve with censoring: durations
    [1, 2+, 3, 3, 5+] (+ = censored)."""
    from hazelcast_jet_spark.operators.timeseries import kaplan_meier

    rows = [(1, True), (2, False), (3, True), (3, True), (5, False)]
    df = spark.createDataFrame(rows, "duration int, observed boolean")
    out = {r["duration"]: r for r in
           kaplan_meier(df, "duration", "observed").collect()}
    # t=1: n=5, d=1 -> S=0.8 ; t=2: censored only, S stays 0.8
    # t=3: n=3, d=2 -> S=0.8*(1/3) ; t=5: censored only
    assert out[1]["n_risk"] == 5 and out[1]["n_events"] == 1
    assert out[1]["survival"] == 0.8
    assert out[2]["n_censored"] == 1 and out[2]["survival"] == 0.8
    assert out[3]["n_risk"] == 3
    assert out[3]["survival"] == round(0.8 * (1 / 3), 6)
    assert out[5]["n_risk"] == 1 and out[5]["survival"] == out[3]["survival"]


def test_kaplan_meier_grouped_curves_are_independent(spark):
    from hazelcast_jet_spark.operators.timeseries import kaplan_meier

    rows = [("g1", 1, True), ("g1", 2, True),
            ("g2", 1, False), ("g2", 2, True)]
    df = spark.createDataFrame(rows, "g string, duration int, observed boolean")
    out = {(r["g"], r["duration"]): r["survival"] for r in
           kaplan_meier(df, "duration", "observed", ["g"]).collect()}
    assert out[("g1", 1)] == 0.5 and out[("g1", 2)] == 0.0
    # g2: t=1 censored -> S=1.0 ; t=2 d=1/n=1 -> 0.0
    assert out[("g2", 1)] == 1.0 and out[("g2", 2)] == 0.0


# ---------------------------------------------------------------------------
# pareto_front
# ---------------------------------------------------------------------------

def test_pareto_front_matches_naive_dominance(spark):
    """The window skyline equals the O(n^2) dominance definition on a
    deterministic point set with duplicates and ties."""
    from hazelcast_jet_spark.operators.profile import pareto_front

    pts = [((i * 13) % 7, float((i * 29) % 11)) for i in range(60)]
    df = spark.createDataFrame(pts, "size int, price double")
    got = {(r["size"], r["best_price"], r["n_best"])
           for r in pareto_front(df, "size", "price").collect()}

    best = {}
    for s, p in pts:
        best[s] = min(p, best.get(s, p))
    expect = set()
    for s, p in best.items():
        if not any(s2 > s and p2 <= p for s2, p2 in best.items()):
            n = sum(1 for s1, p1 in pts if s1 == s and p1 == p)
            expect.add((s, p, n))
    assert got == expect
    # frontier prices strictly increase as size decreases
    ordered = sorted(got, key=lambda t: -t[0])
    prices = [p for _, p, _ in ordered]
    assert prices == sorted(prices)


def test_pareto_front_grouped(spark):
    from hazelcast_jet_spark.operators.profile import pareto_front

    rows = [("x", 1, 5.0), ("x", 2, 4.0), ("x", 3, 6.0),
            ("y", 1, 1.0), ("y", 2, 1.0)]
    df = spark.createDataFrame(rows, "g string, size int, price double")
    got = {(r["g"], r["size"]) for r in
           pareto_front(df, "size", "price", ["g"]).collect()}
    # x: size 3 (6.0) and size 2 (4.0) survive; size 1 (5.0) dominated
    # y: size 2 (1.0) survives; size 1 tied on price -> dominated
    assert got == {("x", 3), ("x", 2), ("y", 2)}


# ---------------------------------------------------------------------------
# embedding_isotropy
# ---------------------------------------------------------------------------

def test_embedding_isotropy_extremes(spark):
    """All-identical vectors -> anisotropy 1; a symmetric +/- pair ->
    mean vector 0 -> anisotropy 0; numpy cross-check on a mixed group."""
    import numpy as np

    from hazelcast_jet_spark.operators.similarity import embedding_isotropy

    aligned = [(i, [3.0, 4.0], 0) for i in range(4)]
    opposed = [(10, [1.0, 0.0], 1), (11, [-1.0, 0.0], 1)]
    mixed = [(20, [1.0, 1.0], 2), (21, [1.0, 0.0], 2), (22, [0.0, 1.0], 2)]
    df = spark.createDataFrame(aligned + opposed + mixed,
                               "vec_id long, embedding array<float>, label int")
    out = {r["group"]: r for r in embedding_isotropy(df).collect()}
    assert out[0]["anisotropy"] == 1.0 and out[0]["mean_norm"] == 5.0
    assert out[1]["anisotropy"] == 0.0 and out[1]["mean_vec_norm"] == 0.0
    V = np.array([v for _, v, _ in mixed])
    expect = np.linalg.norm(V.mean(axis=0)) / \
        np.mean([np.linalg.norm(v) for v in V])
    assert abs(out[2]["anisotropy"] - expect) < 1e-5
    assert out[2]["dim"] == 2 and out[2]["n_vecs"] == 3


# ---------------------------------------------------------------------------
# r8-session batch 2: table_fingerprint / rake_keyphrases / windowed funnel
# ---------------------------------------------------------------------------

def test_table_fingerprint_order_free_and_sensitive(spark):
    from hazelcast_jet_spark.operators.profile import table_fingerprint

    rows = [(1, "en", 10, "a"), (2, "de", 20, "a"), (3, None, 30, "b")]
    a = spark.createDataFrame(rows, "id long, lang string, n long, src string")
    # same rows, reversed order, different partitioning -> same fingerprint
    b = spark.createDataFrame(rows[::-1], "id long, lang string, n long, src string") \
             .repartition(7)
    fa = {r["src"]: r for r in
          table_fingerprint(a, ["id", "lang", "n"], ["src"]).collect()}
    fb = {r["src"]: r for r in
          table_fingerprint(b, ["id", "lang", "n"], ["src"]).collect()}
    assert fa == fb and fa["a"]["n_rows"] == 2
    # a single changed value flips the checksum but not the count
    rows2 = [(1, "en", 11, "a"), (2, "de", 20, "a"), (3, None, 30, "b")]
    c = spark.createDataFrame(rows2, "id long, lang string, n long, src string")
    fc = {r["src"]: r for r in
          table_fingerprint(c, ["id", "lang", "n"], ["src"]).collect()}
    assert fc["a"]["n_rows"] == 2 and fc["a"]["checksum"] != fa["a"]["checksum"]
    assert fc["b"] == fa["b"]
    # NULL is distinguished from the literal sentinel string
    import hashlib
    h = hashlib.md5("3\x1f<NULL>\x1f30".encode()).hexdigest()[:12]
    assert fa["b"]["min_hash"] == h == fa["b"]["max_hash"]
    assert fa["b"]["checksum"] == int(h, 16)


def test_rake_keyphrases_hand_model(spark):
    """RAKE on a two-doc corpus, hand-computed: degree/freq scoring,
    phrase aggregation across docs, stopword boundaries."""
    from hazelcast_jet_spark.operators.text import rake_keyphrases

    docs = [(1, "deep learning of deep networks"),
            (2, "deep learning in practice")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["phrase"]: r for r in rake_keyphrases(df, top_k=10).collect()}
    # phrases: "deep learning" x2, "deep networks", "practice"
    # freq: deep 3, learning 2, networks 1, practice 1
    # degree: deep 2+2+2=6, learning 4, networks 2, practice 1
    # scores: deep 2.0, learning 2.0, networks 2.0, practice 1.0
    assert out["deep learning"]["n_occurrences"] == 2
    assert out["deep learning"]["score"] == 4.0
    assert out["deep networks"]["score"] == 4.0
    assert out["practice"]["score"] == 1.0
    assert out["deep learning"]["n_words"] == 2


def test_funnel_within_seconds_bound(spark):
    """The 24h-style bound rejects completions outside the window of
    the FIRST stage, even when each consecutive gap is small."""
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import funnel_counts

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, mins, typ):
        return (u, t0 + dt.timedelta(minutes=mins), typ)

    rows = [
        # user 1 completes within 60 min of the first view
        ev(1, 0, "view"), ev(1, 10, "click"), ev(1, 50, "purchase"),
        # user 2: click inside, purchase at +70 min -> stage 3 misses
        ev(2, 0, "view"), ev(2, 30, "click"), ev(2, 70, "purchase"),
        # user 3: click already outside the window
        ev(3, 0, "view"), ev(3, 61, "click"), ev(3, 62, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_type string")
    out = {r["stage"]: r["n_keys"] for r in
           funnel_counts(df, ["view", "click", "purchase"],
                         within_seconds=3600).collect()}
    assert out == {1: 3, 2: 2, 3: 1}


# ---------------------------------------------------------------------------
# r8-session batch 3: label propagation / link prediction / OHLC
# ---------------------------------------------------------------------------

def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge: after 2 sync rounds with
    min-label ties the left triangle has converged to label 1; the
    bridge-side triangle is mid-oscillation exactly as the synchronous
    update rule dictates (4 sees {1,4,4}->4; 5 and 6 see {3,4}->3) —
    pinned values, hand-derived."""
    from hazelcast_jet_spark.operators.graph import label_propagation

    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["label"] for r in
           label_propagation(df, iters=2).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 3, 6: 3}


def test_label_propagation_matches_python_model(spark):
    """Sync LPA with (count desc, label asc) argmax replayed in python
    on a deterministic random-ish graph."""
    from hazelcast_jet_spark.operators.graph import label_propagation

    edges = sorted({(min(a, b), max(a, b))
                    for a, b in (((i * 7) % 15, (i * 11 + 3) % 15)
                                 for i in range(40)) if a != b})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"] for r in
           label_propagation(df, iters=3).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: v for v in adj}
    for _ in range(3):
        new = {}
        for v, ns in adj.items():
            cnt = {}
            for u in ns:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = new
    assert got == lab


def test_jaccard_link_prediction_square(spark):
    """4-cycle 1-2-3-4-1: the two diagonals are the only predictions,
    each with 2 common neighbors and union 2 -> jaccard 1.0."""
    from hazelcast_jet_spark.operators.graph import jaccard_link_prediction

    edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {(r["src"], r["dst"]): (r["n_common"], r["jaccard"])
           for r in jaccard_link_prediction(df, top_k=10).collect()}
    assert out == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}


def test_jaccard_link_prediction_hub_guard(spark):
    """A star hub above max_degree contributes no wedges: its fan pairs
    are not predicted."""
    from hazelcast_jet_spark.operators.graph import jaccard_link_prediction

    star = [(100, i) for i in range(1, 6)]          # hub degree 5
    df = spark.createDataFrame(star, "src long, dst long")
    assert jaccard_link_prediction(df, max_degree=4).count() == 0
    assert jaccard_link_prediction(df, max_degree=5).count() == 10


def test_ohlc_resample_bookends(spark):
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import ohlc_resample

    t0 = dt.datetime(2024, 3, 1, 9, 0)
    rows = [
        (1, "a", t0, 5.0),
        (2, "a", t0 + dt.timedelta(hours=1), 9.0),
        (3, "a", t0 + dt.timedelta(hours=2), 1.0),
        (4, "a", t0 + dt.timedelta(hours=3), 7.0),
        # equal-timestamp tie on day 2: event_id picks open=10, close=20
        (6, "a", t0 + dt.timedelta(days=1), 20.0),
        (5, "a", t0 + dt.timedelta(days=1), 10.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp_ntz, value double")
    out = {str(r["day"]): r for r in
           ohlc_resample(df, "event_type", "ts", "value", "event_id").collect()}
    d1 = out["2024-03-01"]
    assert (d1["open"], d1["high"], d1["low"], d1["close"]) == (5.0, 9.0, 1.0, 7.0)
    assert d1["n_points"] == 4 and d1["sum_value"] == 22.0
    d2 = out["2024-03-02"]
    assert (d2["open"], d2["close"]) == (10.0, 20.0)


# ---------------------------------------------------------------------------
# r8-session batch 4: session bounce / seasonality strength
# ---------------------------------------------------------------------------

def test_session_entry_exit_hand_model(spark):
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import session_entry_exit

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, mins, typ):
        return (eid, uid, t0 + dt.timedelta(minutes=mins), typ)

    rows = [
        # user 1, session 1: view -> click   (entry view, exit click)
        ev(1, 1, 0, "view"), ev(2, 1, 5, "click"),
        # user 1, session 2 (gap > 30min): single purchase -> bounce
        ev(3, 1, 60, "purchase"),
        # user 2, session 1: single view -> bounce on view
        ev(4, 2, 0, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string")
    out = {r["event_type"]: r for r in session_entry_exit(df).collect()}
    v = out["view"]
    assert (v["n_entries"], v["n_exits"], v["n_bounces"]) == (2, 1, 1)
    assert v["bounce_rate"] == 0.5
    c = out["click"]
    assert (c["n_entries"], c["n_exits"], c["n_bounces"]) == (0, 1, 0)
    assert c["bounce_rate"] is None
    p = out["purchase"]
    assert (p["n_entries"], p["n_exits"], p["n_bounces"]) == (1, 1, 1)
    assert p["bounce_rate"] == 1.0


def test_seasonality_strength_extremes(spark):
    """A purely dow-driven series scores ~1; a constant series has zero
    variance -> NULL; numpy cross-check on a mixed series."""
    import datetime as dt

    import numpy as np

    from hazelcast_jet_spark.operators.timeseries import seasonality_strength

    d0 = dt.date(2024, 1, 1)  # a Monday
    rows = []
    # key 'pure': count = dow+1 exactly (emit that many events per day)
    for day in range(28):
        dow = day % 7
        for k in range(dow + 1):
            rows.append(("pure", dt.datetime.combine(
                d0 + dt.timedelta(days=day), dt.time(1, k))))
    # key 'flat': constant 2/day
    for day in range(28):
        for k in range(2):
            rows.append(("flat", dt.datetime.combine(
                d0 + dt.timedelta(days=day), dt.time(2, k))))
    # key 'mix': dow signal + deterministic noise
    counts = []
    for day in range(28):
        n = (day % 7) + 1 + (day * 3) % 5
        counts.append(n)
        for k in range(n):
            rows.append(("mix", dt.datetime.combine(
                d0 + dt.timedelta(days=day), dt.time(3, k % 60))))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    out = {r["key"]: r for r in
           seasonality_strength(df, "event_type", "ts").collect()}
    assert out["pure"]["strength"] == 1.0
    assert out["flat"]["strength"] is None
    x = np.array(counts, dtype=float)
    dows = np.arange(28) % 7
    ss_tot = ((x - x.mean()) ** 2).sum()
    ss_b = sum(len(x[dows == d]) * (x[dows == d].mean() - x.mean()) ** 2
               for d in range(7))
    assert abs(out["mix"]["strength"] - ss_b / ss_tot) < 1e-6
    assert out["mix"]["n_days"] == 28


# ---------------------------------------------------------------------------
# r8-session batch 5: ab_proportion_test / self_repetition
# ---------------------------------------------------------------------------

def test_ab_proportion_test_closed_form(spark):
    rows = ([(i, "A", i < 30) for i in range(100)]          # 30% conv
            + [(i + 100, "B", i < 40) for i in range(100)])  # 40% conv
    df = spark.createDataFrame(rows, "u long, arm string, converted boolean")
    from hazelcast_jet_spark.operators.experiment import ab_proportion_test

    out = {r["arm"]: r for r in
           ab_proportion_test(df, "arm", "converted").collect()}
    assert out["A"]["rate"] == 0.3 and out["B"]["rate"] == 0.4
    pool = 0.35
    z = (0.3 - 0.4) / math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert out["A"]["z"] == round(z, 6) + 0.0
    assert out["A"]["srm_z"] == 0.0  # perfectly balanced split


def test_ab_proportion_test_guards(spark):
    from hazelcast_jet_spark.operators.experiment import ab_proportion_test

    allconv = spark.createDataFrame(
        [(1, "A", True), (2, "B", True)], "u long, arm string, converted boolean")
    with pytest.raises(ValueError, match="degenerate"):
        ab_proportion_test(allconv, "arm", "converted")
    three = spark.createDataFrame(
        [(1, "A", True), (2, "B", False), (3, "C", True)],
        "u long, arm string, converted boolean")
    with pytest.raises(ValueError, match="exactly 2 arms"):
        ab_proportion_test(three, "arm", "converted")


def test_self_repetition_hand_model(spark):
    from hazelcast_jet_spark.operators.text import self_repetition

    loop = "spam ham " * 6                  # 12 tokens, heavy repeats
    fresh = "a b c d e f g h i j k l"       # 12 distinct tokens
    short = "too short"                     # < k tokens -> no windows
    df = spark.createDataFrame(
        [(1, loop, "s1"), (2, fresh, "s2"), (3, short, "s2")],
        "doc_id long, text string, source string")
    out = {r["source"]: r for r in self_repetition(df, k=5).collect()}
    # loop: 8 windows, distinct = 2 ("spam ham..."/"ham spam...") -> 0.75
    assert out["s1"]["mean_repetition"] == 0.75
    assert out["s1"]["share_degenerate"] == 1.0
    # fresh doc: all 8 windows distinct -> 0; short doc contributes nothing
    assert out["s2"]["n_docs"] == 1
    assert out["s2"]["mean_repetition"] == 0.0
    assert out["s2"]["share_degenerate"] == 0.0


# ---------------------------------------------------------------------------
# r8-session batch 6: fisher separation / growth decomposition / stickiness
# ---------------------------------------------------------------------------

def test_fisher_separation_numpy_model(spark):
    import numpy as np

    from hazelcast_jet_spark.operators.clustering import fisher_separation

    vecs = {0: [[0.0, 0.0], [2.0, 0.0], [1.0, 1.0]],
            1: [[10.0, 0.0], [12.0, 0.0]]}
    rows = [(i * 10 + j, v, lab) for i, (lab, vs) in enumerate(vecs.items())
            for j, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["label"]: r for r in fisher_separation(df).collect()}

    allv = np.array([v for vs in vecs.values() for v in vs])
    mu_g = allv.mean(axis=0)
    ssw, ssb = {}, 0.0
    for lab, vs in vecs.items():
        V = np.array(vs)
        mu = V.mean(axis=0)
        ssw[lab] = ((V - mu) ** 2).sum()
        ssb += len(vs) * ((mu - mu_g) ** 2).sum()
        assert abs(out[lab]["mean_within"] - ssw[lab] / len(vs)) < 1e-6
        assert abs(out[lab]["centroid_dist"]
                   - np.linalg.norm(mu - mu_g)) < 1e-6
    fisher = ssb / sum(ssw.values())
    assert abs(out[0]["fisher_ratio"] - fisher) < 1e-6
    assert out[0]["fisher_ratio"] == out[1]["fisher_ratio"]


def test_growth_decomposition_identity(spark):
    """The three effects sum exactly to the revenue delta, and a pure
    volume change shows zero price effect."""
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import growth_decomposition

    rows = []
    # month 1: 10 orders x 100 ; month 2: 20 orders x 100 (pure volume)
    # month 3: 20 orders x 110 (pure price)
    for i in range(10):
        rows.append((dt.datetime(2024, 1, 1 + i), 100.0))
    for i in range(20):
        rows.append((dt.datetime(2024, 2, 1 + i), 100.0))
    for i in range(20):
        rows.append((dt.datetime(2024, 3, 1 + i), 110.0))
    df = spark.createDataFrame(rows, "t timestamp_ntz, v double")
    out = {r["month"]: r for r in
           growth_decomposition(df, "t", "v").collect()}
    feb = out["2024-02"]
    assert feb["volume_effect"] == 1000.0 and feb["price_effect"] == 0.0
    assert feb["cross_effect"] == 0.0 and feb["d_revenue"] == 1000.0
    mar = out["2024-03"]
    assert mar["volume_effect"] == 0.0 and mar["price_effect"] == 200.0
    for m in ("2024-02", "2024-03"):
        r = out[m]
        assert (r["volume_effect"] + r["price_effect"] + r["cross_effect"]
                == r["d_revenue"])
    assert out["2024-01"]["d_revenue"] is None


def test_stickiness_hand_model(spark):
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import stickiness

    d0 = dt.datetime(2024, 1, 4)  # Thursday, start of an epoch week? no:
    # epoch weeks are day//7 blocks; use two clean consecutive blocks
    rows = []
    # week A: user 1 active 2 days, user 2 active 1 day
    rows += [(1, d0), (1, d0 + dt.timedelta(days=1)), (2, d0)]
    # duplicate events same day must not double-count DAU
    rows += [(1, d0 + dt.timedelta(hours=2))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = stickiness(df).collect()
    assert len(out) == 1
    r = out[0]
    # days active: d0 (users 1,2 -> dau 2), d0+1 (user 1 -> dau 1)
    assert r["wau"] == 2 and r["avg_dau"] == 1.5
    assert r["stickiness"] == 0.75


# ---------------------------------------------------------------------------
# r8-session batch 7: decayed trending / new-vs-returning
# ---------------------------------------------------------------------------

def test_decayed_score_dyadic_weights(spark):
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import decayed_score

    ref = dt.datetime(2024, 6, 1)
    rows = [
        ("a", ref),                               # age 0   -> 1.0
        ("a", ref - dt.timedelta(days=28)),       # age 28  -> 0.5
        ("a", ref - dt.timedelta(days=57)),       # age 57  -> 0.25
        ("b", ref - dt.timedelta(days=27)),       # age 27  -> 1.0
    ]
    df = spark.createDataFrame(rows, "k string, t timestamp_ntz")
    out = {r["key"]: r for r in
           decayed_score(df, "k", "t", halflife_days=28).collect()}
    assert out["a"]["score"] == 1.75 and out["a"]["n_events"] == 3
    assert out["b"]["score"] == 1.0
    # ordering: a (1.75) before b (1.0)
    top = decayed_score(df, "k", "t", halflife_days=28, top_k=1).collect()
    assert top[0]["key"] == "a"


def test_new_vs_returning_weeks(spark):
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import new_vs_returning

    w0 = dt.datetime(2024, 1, 1)  # epoch week floor(19723/7)
    rows = [
        (1, w0), (2, w0),                          # both new in week 0
        (1, w0 + dt.timedelta(days=7)),            # 1 returns week 1
        (3, w0 + dt.timedelta(days=7)),            # 3 new in week 1
        (1, w0 + dt.timedelta(days=8)),            # same week, no dup
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    out = {r["week"]: (r["n_new"], r["n_returning"])
           for r in new_vs_returning(df).collect()}
    weeks = sorted(out)
    assert out[weeks[0]] == (2, 0)
    assert out[weeks[1]] == (1, 1)


# ---------------------------------------------------------------------------
# r8-session batch 8: k-anonymity
# ---------------------------------------------------------------------------

def test_k_anonymity_hand_model(spark):
    from hazelcast_jet_spark.operators.profile import k_anonymity

    # classes: (a,x):1 row, (a,y):3 rows, (b,x):5 rows  -> 9 rows total
    rows = ([("a", "x")] + [("a", "y")] * 3 + [("b", "x")] * 5)
    df = spark.createDataFrame(rows, "q1 string, q2 string")
    out = {r["k"]: r for r in
           k_anonymity(df, ["q1", "q2"], ks=(2, 4, 10)).collect()}
    assert (out[2]["n_risky_classes"], out[2]["n_risky_rows"]) == (1, 1)
    assert out[2]["risky_share"] == round(1 / 9, 6)
    assert (out[4]["n_risky_classes"], out[4]["n_risky_rows"]) == (2, 4)
    assert (out[10]["n_risky_classes"], out[10]["n_risky_rows"]) == (3, 9)
    assert out[10]["risky_share"] == 1.0


def test_l_diversity_hand_model(spark):
    from hazelcast_jet_spark.operators.profile import l_diversity

    # class a: 4 rows, 1 distinct sensitive (homogeneous!)
    # class b: 2 rows, 2 distinct ; class c: 3 rows, 3 distinct
    rows = ([("a", "s1")] * 4
            + [("b", "s1"), ("b", "s2")]
            + [("c", "s1"), ("c", "s2"), ("c", "s3")])
    df = spark.createDataFrame(rows, "q string, s string")
    out = {r["l"]: r for r in
           l_diversity(df, ["q"], "s", ls=(2, 3)).collect()}
    assert (out[2]["n_weak_classes"], out[2]["n_weak_rows"]) == (1, 4)
    assert out[2]["weak_share"] == round(4 / 9, 6)
    assert (out[3]["n_weak_classes"], out[3]["n_weak_rows"]) == (2, 6)


# ---------------------------------------------------------------------------
# r8-session batch 10: markov stationary / position attribution
# ---------------------------------------------------------------------------

def test_markov_stationary_numpy_power_method(spark):
    import datetime as dt

    import numpy as np

    from hazelcast_jet_spark.operators.timeseries import markov_stationary

    t0 = dt.datetime(2024, 1, 1)
    seqs = {1: "aabab", 2: "bbaba", 3: "abbba"}
    rows = []
    eid = 0
    for uid, seq in seqs.items():
        for i, ch in enumerate(seq):
            eid += 1
            rows.append((eid, uid, t0 + dt.timedelta(minutes=i), ch))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string")
    got = {r["event_type"]: r["stationary_prob"] for r in
           markov_stationary(df, iters=3).collect()}

    # transition counts over consecutive pairs per user
    from collections import Counter
    c = Counter()
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            c[(a, b)] += 1
    states = sorted({a for a, _ in c} | {b for _, b in c})
    P = np.zeros((len(states), len(states)))
    for (a, b), n in c.items():
        P[states.index(a), states.index(b)] = n
    P = P / P.sum(axis=1, keepdims=True)
    p = np.full(len(states), 1.0 / len(states))
    for _ in range(3):
        p = p @ P
    for s, v in zip(states, p):
        assert abs(got[s] - v) < 1e-6


def test_position_attribution_u_shape(spark):
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import position_attribution

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, uid, mins, typ):
        return (eid, uid, t0 + dt.timedelta(minutes=mins), typ)

    rows = [
        # user 1: a b c d -> purchase: a 0.4, b 0.1, c 0.1, d 0.4
        ev(1, 1, 0, "a"), ev(2, 1, 1, "b"), ev(3, 1, 2, "c"),
        ev(4, 1, 3, "d"), ev(5, 1, 4, "purchase"),
        # user 2: single touch a -> 1.0
        ev(6, 2, 0, "a"), ev(7, 2, 1, "purchase"),
        # user 3: two touches a, b -> 0.5 each
        ev(8, 3, 0, "a"), ev(9, 3, 1, "b"), ev(10, 3, 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string")
    out = {r["channel"]: (r["credit"], r["n_touches"]) for r in
           position_attribution(df).collect()}
    assert out["a"] == (1.9, 3)          # 0.4 + 1.0 + 0.5
    assert out["b"] == (0.6, 2)          # 0.1 + 0.5
    assert out["c"] == (0.1, 1)
    assert out["d"] == (0.4, 1)
    # total credit equals number of attributed conversions
    assert abs(sum(v for v, _ in out.values()) - 3.0) < 1e-9


def test_centroid_distances_numpy(spark):
    import numpy as np

    from hazelcast_jet_spark.operators.clustering import centroid_distances

    vecs = {0: [[0.0, 0.0], [2.0, 0.0]],
            1: [[10.0, 0.0], [10.0, 2.0]],
            2: [[0.0, 5.0]]}
    rows = [(i * 10 + j, v, lab) for i, (lab, vs) in enumerate(vecs.items())
            for j, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {(r["label_a"], r["label_b"]): r["dist"]
           for r in centroid_distances(df).collect()}
    mus = {l: np.array(v).mean(axis=0) for l, v in vecs.items()}
    for (a, b), d in out.items():
        assert abs(d - np.linalg.norm(mus[a] - mus[b])) < 1e-6
    assert set(out) == {(0, 1), (0, 2), (1, 2)}


# ---------------------------------------------------------------------------
# r9 fixes: single-execution ab test, CUPED guard, graph contracts,
# markov empty-chain guard (r8 verdict hygiene + ADVICE items)
# ---------------------------------------------------------------------------


def test_ab_proportion_test_single_execution_plan(spark):
    """The returned plan must be a local relation over the ALREADY
    collected per-arm rows — no second scan / aggregate of the input
    (r8 verdict: the collected stats and returned rows could diverge on
    a non-deterministic input)."""
    from hazelcast_jet_spark.operators.experiment import ab_proportion_test

    rows = ([(i, "A", i % 3 == 0) for i in range(60)]
            + [(i + 60, "B", i % 4 == 0) for i in range(60)])
    df = spark.createDataFrame(rows, "u long, arm string, converted boolean")
    out = ab_proportion_test(df, "arm", "converted")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" not in plan, plan
    assert "LocalRelation" in plan or "LogicalRDD" in plan, plan
    got = {r["arm"]: (r["n_units"], r["n_converted"]) for r in out.collect()}
    assert got == {"A": (60, 20), "B": (60, 15)}


def test_cuped_zero_variance_covariate_raises(spark):
    """Constant pre-period covariate: theta is undefined and must raise
    at execution instead of silently emitting NULL means (ADVICE r8)."""
    from hazelcast_jet_spark.operators.experiment import cuped_adjusted_means

    rows = [(i, "A" if i % 2 == 0 else "B", 5.0, float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "u long, arm string, pre double, post double")
    with pytest.raises(Exception, match="zero-variance"):
        cuped_adjusted_means(df, "arm", "pre", "post").collect()


def test_jaccard_link_prediction_noncanonical_edges(spark):
    """ADVICE r8 (medium): edges stored in arbitrary orientation or
    duplicated must behave exactly like the canonical representation —
    an existing (3,1) edge must NOT surface as a predicted (1,3) link,
    and duplicate rows must not inflate degrees."""
    from hazelcast_jet_spark.operators.graph import jaccard_link_prediction

    # triangle with one reversed edge: nothing to predict
    tri = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                                "src long, dst long")
    assert jaccard_link_prediction(tri, top_k=10).count() == 0

    # 4-cycle with reversed + duplicated + bidirectional rows == canonical
    messy = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (1, 4), (1, 2), (4, 3)],
        "src long, dst long")
    out = {(r["src"], r["dst"]): (r["n_common"], r["jaccard"])
           for r in jaccard_link_prediction(messy, top_k=10).collect()}
    assert out == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}


def test_label_propagation_string_node_ids(spark):
    """ADVICE r8: the smallest-label tie-break must hold for STRING node
    ids (the old unary-minus tie-break cast strings to NULL).  Two
    triangles converge to their lexicographically smallest member."""
    from hazelcast_jet_spark.operators.graph import label_propagation

    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("x", "y"), ("y", "z"), ("z", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r["label"] for r in label_propagation(df, iters=2).collect()}
    assert out == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "z": "x"}


def test_markov_stationary_empty_chain_raises(spark):
    """ADVICE r8: a log with no transitions (single event per key) must
    raise a clear ValueError, not ZeroDivisionError."""
    from hazelcast_jet_spark.operators.timeseries import markov_stationary

    import datetime as dt
    rows = [(i, dt.datetime(2024, 1, 1, i), f"t{i}", i) for i in range(4)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, event_id long")
    with pytest.raises(ValueError, match="no transitions"):
        markov_stationary(df)


def test_ab_power_mde_closed_form(spark):
    from hazelcast_jet_spark.operators.experiment import (
        Z_ALPHA_0_05, Z_POWER_0_80, ab_power_mde)

    rows = ([(i, "A", i < 30) for i in range(100)]
            + [(i + 100, "B", i < 40) for i in range(200)])
    df = spark.createDataFrame(rows, "u long, arm string, conv boolean")
    out = ab_power_mde(df, "arm", "conv").collect()
    assert len(out) == 1
    r = out[0]
    pool = 70 / 300
    mde = (Z_ALPHA_0_05 + Z_POWER_0_80) * math.sqrt(
        pool * (1 - pool) * (1 / 100 + 1 / 200))
    assert (r["n_a"], r["n_b"]) == (100, 200)
    assert r["pooled_rate"] == round(pool, 6) + 0.0
    assert r["mde_abs"] == round(mde, 6) + 0.0
    assert r["mde_rel"] == round(mde / pool, 6) + 0.0
    # single-execution: local relation, no aggregate in the returned plan
    plan = (ab_power_mde(df, "arm", "conv")
            ._jdf.queryExecution().optimizedPlan().toString())
    assert "Aggregate" not in plan


def test_cohen_kappa_hand_values(spark):
    from hazelcast_jet_spark.operators.profile import cohen_kappa

    # perfect agreement -> kappa 1
    same = spark.createDataFrame(
        [(i, "x" if i % 3 else "y") for i in range(30)], "i long, l string")
    perfect = cohen_kappa(same.select(F.col("l").alias("a"),
                                      F.col("l").alias("b")), "a", "b")
    r = perfect.collect()[0]
    assert (r["po"], r["kappa"]) == (1.0, 1.0)

    # textbook 2x2: cells a/b = yes,yes:20 yes,no:5 no,yes:10 no,no:15
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa(df, "a", "b").collect()[0]
    po = 35 / 50
    pe = (25 * 30 + 25 * 20) / 50 / 50
    assert r["n_items"] == 50
    assert r["po"] == round(po, 6)
    assert r["pe"] == round(pe, 6)
    assert r["kappa"] == round((po - pe) / (1 - pe), 6) + 0.0


# ---------------------------------------------------------------------------
# diff_in_diff
# ---------------------------------------------------------------------------

def test_diff_in_diff_matches_closed_form(spark):
    """The DiD estimate, SE and cell means equal the numpy closed form
    on a panel with a known injected effect."""
    import numpy as np

    from hazelcast_jet_spark.operators.experiment import diff_in_diff

    # Arm A trend: pre 10 -> post 12; arm B: pre 20 -> post 25 (+3 did)
    rows = []
    for i in range(30):
        noise = ((i * 7) % 5) - 2.0
        rows += [("A", "pre", 10.0 + noise), ("A", "post", 12.0 + noise),
                 ("B", "pre", 20.0 - noise), ("B", "post", 25.0 - noise)]
    df = spark.createDataFrame(rows, "arm string, period string, y double")
    out = diff_in_diff(df, "arm", "period", "y")
    got = {(r["arm"], r["period"]): r for r in out.collect()}

    cells = {}
    for a in ("A", "B"):
        for p in ("pre", "post"):
            ys = np.array([y for (aa, pp, y) in rows if aa == a and pp == p])
            cells[(a, p)] = (len(ys), ys.mean(), ys.var(ddof=1))
    did = ((cells[("B", "post")][1] - cells[("B", "pre")][1])
           - (cells[("A", "post")][1] - cells[("A", "pre")][1]))
    se = math.sqrt(sum(v / n for (n, _, v) in cells.values()))
    for (a, p), (n, mean, _) in cells.items():
        r = got[(a, p)]
        assert r["n_units"] == n
        assert abs(r["mean_y"] - round(mean, 6)) < 1e-9
        assert abs(r["did"] - round(did, 6)) < 1e-9
        assert abs(r["se"] - round(se, 6)) < 1e-9
        assert abs(r["t"] - round(did / se, 6)) < 1e-9
    # ordering: (arm asc, period desc) -> pre rows before post per arm
    names = [(r["arm"], r["period"]) for r in out.collect()]
    assert names == [("A", "pre"), ("A", "post"), ("B", "pre"), ("B", "post")]


def test_diff_in_diff_rejects_bad_shapes(spark):
    from hazelcast_jet_spark.operators.experiment import diff_in_diff

    three_arms = spark.createDataFrame(
        [(a, p, 1.0) for a in "ABC" for p in ("pre", "post")],
        "arm string, period string, y double")
    with pytest.raises(ValueError, match="2 arms"):
        diff_in_diff(three_arms, "arm", "period", "y")
    missing_cell = spark.createDataFrame(
        [("A", "pre", 1.0), ("A", "post", 2.0), ("B", "pre", 3.0)],
        "arm string, period string, y double")
    with pytest.raises(ValueError, match="2 arms x 2 periods"):
        diff_in_diff(missing_cell, "arm", "period", "y")


# ---------------------------------------------------------------------------
# covariate_balance
# ---------------------------------------------------------------------------

def test_covariate_balance_matches_numpy_smd(spark):
    import numpy as np

    from hazelcast_jet_spark.operators.experiment import covariate_balance

    rows = [("A" if i % 2 == 0 else "B",
             float(i % 11), float((i * 3) % 7) + (0.8 if i % 2 else 0.0))
            for i in range(60)]
    df = spark.createDataFrame(rows, "arm string, x1 double, x2 double")
    out = {r["covariate"]: r for r in
           covariate_balance(df, "arm", ["x1", "x2"]).collect()}
    for ci, name in ((1, "x1"), (2, "x2")):
        xa = np.array([r[ci] for r in rows if r[0] == "A"])
        xb = np.array([r[ci] for r in rows if r[0] == "B"])
        smd = (xa.mean() - xb.mean()) / math.sqrt(
            (xa.var(ddof=1) + xb.var(ddof=1)) / 2.0)
        r = out[name]
        assert (r["n_a"], r["n_b"]) == (len(xa), len(xb))
        assert abs(r["mean_a"] - round(xa.mean(), 6)) < 1e-9
        assert abs(r["smd"] - round(smd, 6)) < 1e-9
        assert r["imbalanced"] == (abs(smd) >= 0.1)


def test_covariate_balance_zero_variance_gives_null_smd(spark):
    from hazelcast_jet_spark.operators.experiment import covariate_balance

    df = spark.createDataFrame(
        [("A", 5.0), ("A", 5.0), ("B", 5.0), ("B", 5.0)],
        "arm string, x double")
    r = covariate_balance(df, "arm", ["x"]).collect()[0]
    assert r["smd"] is None and r["imbalanced"] is False


def test_covariate_balance_constant_per_arm_still_flags(spark):
    """A covariate constant WITHIN each arm but different ACROSS arms
    (pooled variance 0, means differ) is the most broken split there
    is: smd is NULL but imbalanced must be True (review r9)."""
    from hazelcast_jet_spark.operators.experiment import covariate_balance

    df = spark.createDataFrame(
        [("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0)],
        "arm string, x double")
    r = covariate_balance(df, "arm", ["x"]).collect()[0]
    assert r["smd"] is None and r["imbalanced"] is True


# ---------------------------------------------------------------------------
# two_sided_p / fdr_bh
# ---------------------------------------------------------------------------

def test_two_sided_p_matches_scipy_like_reference(spark):
    """The A&S 26.2.17 tail is within 1.5e-7 of the exact normal
    two-sided p (erfc reference via math)."""
    from hazelcast_jet_spark.operators.experiment import two_sided_p

    zs = [0.0, 0.5, -0.5, 1.0, 1.96, -2.5, 3.3, 5.0]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {r["z"]: r["p"] for r in
           df.select("z", two_sided_p(F.col("z")).alias("p")).collect()}
    for z in zs:
        exact = math.erfc(abs(z) / math.sqrt(2.0))
        assert abs(got[z] - exact) < 1.5e-7


def test_two_sided_p_sql_twin_matches_spark(spark):
    """DuckDB evaluating two_sided_p_sql agrees with the Spark Column
    to within 1 ulp (exp() is the one libm call — JVM vs libm differ
    sub-ulp, e.g. at z=0.7) and EXACTLY after the round-6 discipline
    every gate query applies."""
    import duckdb

    from hazelcast_jet_spark.operators.experiment import (two_sided_p,
                                                          two_sided_p_sql)

    zs = [0.0, 0.7, -1.3, 2.1, -3.9]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    sp = [r["p"] for r in
          df.select(two_sided_p(F.col("z")).alias("p")).collect()]
    dk = [duckdb.sql(f"select {two_sided_p_sql(repr(z))} as p").fetchone()[0]
          for z in zs]
    for s, d in zip(sp, dk):
        assert abs(s - d) <= math.ulp(max(abs(s), abs(d)))
        assert round(s, 6) == round(d, 6)


def test_fdr_bh_matches_hand_computation(spark):
    from hazelcast_jet_spark.operators.experiment import fdr_bh

    ps = {"t1": 0.001, "t2": 0.012, "t3": 0.021, "t4": 0.04, "t5": 0.9}
    df = spark.createDataFrame(list(ps.items()), "test string, p double")
    out = {r["test"]: r for r in fdr_bh(df, "test", "p", q=0.05).collect()}
    m = len(ps)
    ordered = sorted(ps.items(), key=lambda kv: (kv[1], kv[0]))
    step = [min(1.0, m * p / (i + 1)) for i, (_, p) in enumerate(ordered)]
    adj = [min(step[i:]) for i in range(m)]
    for i, (name, p) in enumerate(ordered):
        r = out[name]
        assert r["rank"] == i + 1
        assert abs(r["p_adj"] - round(adj[i], 6)) < 1e-9
        assert r["rejected"] == (adj[i] <= 0.05)
    # t1..t4 survive BH at q=.05 (0.04*5/4=0.05), t5 does not
    assert [out[t]["rejected"] for t in sorted(ps)] == [
        True, True, True, True, False]


# ---------------------------------------------------------------------------
# dp_noisy_counts (governance lane, operators/profile.py)
# ---------------------------------------------------------------------------

def test_dp_noisy_counts_matches_seeded_laplace_formula(spark):
    """Noise equals the md5-seeded inverse-CDF Laplace draw exactly,
    and is calibrated: mean |noise| over many groups ~ 1/eps."""
    from hazelcast_jet_spark.operators.profile import dp_noisy_counts

    eps = 0.5
    rows = [(f"g{i:03d}", j) for i in range(200) for j in range(i % 7 + 1)]
    df = spark.createDataFrame(rows, "g string, v int")
    out = {r["g"]: r["noisy_count"] for r in
           dp_noisy_counts(df, ["g"], eps, seed="t1").collect()}
    abs_noise = []
    for i in range(200):
        g = f"g{i:03d}"
        n = i % 7 + 1
        h = int(hashlib.md5(f"t1-{g}".encode()).hexdigest()[:12], 16)
        u = (h + 0.5) / float(1 << 48)
        noise = -(1.0 / eps) * math.copysign(1.0, u - 0.5) \
            * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert abs(out[g] - round(n + noise, 6)) < 1e-6
        abs_noise.append(abs(noise))
    assert abs(sum(abs_noise) / len(abs_noise) - 1.0 / eps) < 0.5


def test_dp_noisy_counts_rejects_bad_epsilon(spark):
    from hazelcast_jet_spark.operators.profile import dp_noisy_counts

    df = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["g"], 0.0)


# ---------------------------------------------------------------------------
# offline_policy_value
# ---------------------------------------------------------------------------

def test_offline_policy_value_hand_computed(spark):
    """IPS and SNIPS equal the hand formulas; evaluating the LOGGING
    policy itself recovers the plain mean reward (w == 1/p on every
    matched row, match_rate ~ p)."""
    from hazelcast_jet_spark.operators.experiment import offline_policy_value

    rows = [
        # (logged, target, reward)
        ("A", "A", 1.0), ("A", "B", 1.0), ("B", "B", 0.0),
        ("B", "A", 1.0), ("A", "A", 0.0), ("B", "B", 1.0),
    ]
    df = spark.createDataFrame(rows, "logged string, target string, r double")
    out = offline_policy_value(df, "logged", "target", "r",
                               propensity=0.5).collect()[0]
    n = len(rows)
    matched = [(lg, tg, r) for lg, tg, r in rows if lg == tg]
    ips = sum(r for _, _, r in matched) / 0.5 / n
    snips = sum(r for _, _, r in matched) / len(matched)
    assert out["n_units"] == n
    assert abs(out["match_rate"] - round(len(matched) / n, 6)) < 1e-9
    assert abs(out["mean_reward_logged"]
               - round(sum(r for *_, r in rows) / n, 6)) < 1e-9
    assert abs(out["ips_value"] - round(ips, 6)) < 1e-9
    assert abs(out["snips_value"] - round(snips, 6)) < 1e-9
    # identity policy: target == logged everywhere
    ident = df.withColumn("target2", F.col("logged"))
    o2 = offline_policy_value(ident, "logged", "target2", "r",
                              propensity=0.5).collect()[0]
    assert o2["match_rate"] == 1.0
    assert abs(o2["snips_value"] - o2["mean_reward_logged"]) < 1e-9


def test_offline_policy_value_rejects_bad_propensity(spark):
    from hazelcast_jet_spark.operators.experiment import offline_policy_value

    df = spark.createDataFrame([("A", "A", 1.0)],
                               "logged string, target string, r double")
    with pytest.raises(ValueError, match="propensity"):
        offline_policy_value(df, "logged", "target", "r", propensity=0.0)


# ---------------------------------------------------------------------------
# welch_t_test / mann_whitney_u / quantile_treatment_effects
# ---------------------------------------------------------------------------

def test_welch_t_matches_closed_form(spark):
    import numpy as np

    from hazelcast_jet_spark.operators.experiment import welch_t_test

    a = [float((i * 7) % 13) for i in range(30)]
    b = [float((i * 5) % 11) + 2.0 for i in range(40)]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "arm string, y double")
    out = welch_t_test(df, "arm", "y").collect()[0]
    xa, xb = np.array(a), np.array(b)
    qa, qb = xa.var(ddof=1) / len(a), xb.var(ddof=1) / len(b)
    t = (xa.mean() - xb.mean()) / math.sqrt(qa + qb)
    dof = (qa + qb) ** 2 / (qa ** 2 / (len(a) - 1) + qb ** 2 / (len(b) - 1))
    assert (out["n_a"], out["n_b"]) == (30, 40)
    assert abs(out["t"] - round(t, 6)) < 1e-9
    assert abs(out["df"] - round(dof, 6)) < 1e-9
    p = math.erfc(abs(t) / math.sqrt(2.0))
    assert abs(out["p_approx"] - p) < 1e-5


def test_mann_whitney_matches_scipy_formulas(spark):
    """U, tie-corrected z and p equal the textbook formulas computed in
    pure Python (with average ranks) on data WITH ties."""
    from hazelcast_jet_spark.operators.experiment import mann_whitney_u

    a = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 7.0]
    b = [2.0, 4.0, 5.0, 6.0, 6.0, 8.0]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "arm string, y double")
    out = mann_whitney_u(df, "arm", "y", arms=("A", "B")).collect()[0]

    pooled = sorted(a + b)
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0
        i = j
    ra = sum(ranks[v] for v in a)
    na, nb = len(a), len(b)
    n = na + nb
    u = ra - na * (na + 1) / 2.0
    ties = {}
    for v in pooled:
        ties[v] = ties.get(v, 0) + 1
    tie_sum = sum(t ** 3 - t for t in ties.values())
    var = (na * nb / 12.0) * ((n + 1) - tie_sum / (n * (n - 1.0)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    assert (out["n_a"], out["n_b"]) == (na, nb)
    assert abs(out["u_a"] - round(u, 6)) < 1e-9
    assert abs(out["auc"] - round(u / (na * nb), 6)) < 1e-9
    assert abs(out["z"] - round(z, 6)) < 1e-9
    assert abs(out["p_approx"] - math.erfc(abs(z) / math.sqrt(2))) < 1e-5


def test_mann_whitney_rejects_all_tied(spark):
    from hazelcast_jet_spark.operators.experiment import mann_whitney_u

    df = spark.createDataFrame([("A", 1.0), ("B", 1.0), ("A", 1.0)],
                               "arm string, y double")
    with pytest.raises(ValueError, match="tied"):
        mann_whitney_u(df, "arm", "y", arms=("A", "B"))


def test_quantile_treatment_effects_selection(spark):
    """QTE picks the value at rank ceil(q*n) per arm; a constant +5
    shift shows qte == 5 at every quantile."""
    from hazelcast_jet_spark.operators.experiment import (
        quantile_treatment_effects)

    a = [float(v) for v in range(1, 21)]            # 1..20
    b = [v + 5.0 for v in a]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "arm string, y double")
    out = {r["q"]: r for r in
           quantile_treatment_effects(df, "arm", "y",
                                      arms=("A", "B")).collect()}
    for q, r in out.items():
        k = max(1, math.ceil(q * 20))
        assert r["y_a"] == float(k)
        assert r["y_b"] == float(k) + 5.0
        assert r["qte"] == 5.0


# ---------------------------------------------------------------------------
# median_ci / capture_recapture / peeking_trace
# ---------------------------------------------------------------------------

def test_median_ci_order_statistics(spark):
    from hazelcast_jet_spark.operators.profile import median_ci

    vals = sorted(float((i * 37) % 101) for i in range(81))
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = median_ci(df, "v").collect()[0]
    n = len(vals)
    z = 1.9599639845400545
    lo = max(1, math.floor(n / 2.0 - z * math.sqrt(n) / 2.0))
    hi = min(n, math.ceil(n / 2.0 + z * math.sqrt(n) / 2.0) + 1)
    med = vals[math.ceil(n / 2.0) - 1]
    assert r["n"] == n
    assert r["median"] == med
    assert r["ci_lo"] == vals[lo - 1] and r["ci_hi"] == vals[hi - 1]
    assert r["ci_lo"] <= r["median"] <= r["ci_hi"]


def test_median_ci_grouped(spark):
    from hazelcast_jet_spark.operators.profile import median_ci

    rows = [("g1", float(v)) for v in range(1, 10)] + \
           [("g2", float(v * 10)) for v in range(1, 6)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in median_ci(df, "v", ["g"]).collect()}
    assert out["g1"]["median"] == 5.0
    assert out["g2"]["median"] == 30.0


def test_capture_recapture_chapman(spark):
    """Chapman estimate on a known universe: 100 keys, window A sees
    keys 0-59, window B sees 40-89 -> m=20, N_hat ~ 185 (estimator
    sees only the union; the formula is checked exactly)."""
    from hazelcast_jet_spark.operators.profile import capture_recapture

    rows = []
    for k in range(90):
        rows.append((k, k < 60, 40 <= k))
    df = spark.createDataFrame(rows, "k long, a boolean, b boolean")
    r = capture_recapture(df, "k", F.col("a"), F.col("b")).collect()[0]
    na, nb, m = 60, 50, 20
    n_hat = (na + 1) * (nb + 1) / (m + 1) - 1
    var = ((na + 1) * (nb + 1) * (na - m) * (nb - m)
           / ((m + 1) ** 2 * (m + 2)))
    assert (r["n_a"], r["n_b"], r["n_both"], r["n_observed"]) == \
        (na, nb, m, 90)
    assert abs(r["n_hat"] - round(n_hat, 6)) < 1e-9
    assert abs(r["se"] - round(math.sqrt(var), 6)) < 1e-9


def test_peeking_trace_cumulative_counts_and_z(spark):
    """Cumulative denominators/numerators equal the hand fold; z is
    NULL before both arms exist and matches the closed form after."""
    from hazelcast_jet_spark.operators.experiment import (ab_assign,
                                                          peeking_trace)

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 0..19 enter on day (u % 5); user converts on entry_day + 2
    # if u % 3 == 0
    for u in range(20):
        d = u % 5
        rows.append((eid, u, t0 + dt.timedelta(days=d), "view")); eid += 1
        if u % 3 == 0:
            rows.append((eid, u, t0 + dt.timedelta(days=d + 2),
                         "purchase")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, "
              "event_type string")
    out = {str(r["day"]): r for r in
           peeking_trace(df, "user_id", "ts", "event_type",
                         "purchase", seed="pt1").collect()}
    import hashlib as hl
    arm = {u: ("A" if hl.md5(f"pt1-{u}".encode()).hexdigest()[0] < "8"
               else "B") for u in range(20)}
    for day_off in range(7):
        day = str((t0 + dt.timedelta(days=day_off)).date())
        ents = {a: sum(1 for u in range(20)
                       if u % 5 <= day_off and arm[u] == a)
                for a in "AB"}
        convs = {a: sum(1 for u in range(20)
                        if u % 3 == 0 and u % 5 + 2 <= day_off
                        and arm[u] == a) for a in "AB"}
        r = out[day]
        assert (r["n_a"], r["n_b"]) == (ents["A"], ents["B"])
        assert (r["conv_a"], r["conv_b"]) == (convs["A"], convs["B"])
        na, nb = ents["A"], ents["B"]
        ca, cb = convs["A"], convs["B"]
        if na and nb and 0 < ca + cb < na + nb:
            pool = (ca + cb) / (na + nb)
            z = (ca / na - cb / nb) / math.sqrt(
                pool * (1 - pool) * (1 / na + 1 / nb))
            assert abs(r["z"] - round(z, 6)) < 1e-9
            assert r["significant"] == (abs(z) > 1.96)
        else:
            assert r["z"] is None and r["significant"] is False


# ---------------------------------------------------------------------------
# required_sample_size
# ---------------------------------------------------------------------------

def test_required_sample_size_closed_form(spark):
    from hazelcast_jet_spark.operators.experiment import (
        Z_ALPHA_0_05, Z_POWER_0_80, required_sample_size)

    rows = [(i, 1 if i % 5 == 0 else 0) for i in range(500)]  # p = 0.2
    df = spark.createDataFrame(rows, "u long, conv int")
    r = required_sample_size(df, "conv", 0.1,
                             units_per_day=50.0).collect()[0]
    p = 0.2
    ratio = (Z_ALPHA_0_05 + Z_POWER_0_80) / (p * 0.1)
    need = math.ceil(2.0 * p * (1.0 - p) * (ratio * ratio))
    assert r["n_units"] == 500
    assert r["baseline_rate"] == 0.2
    assert abs(r["target_rate"] - round(p * 1.1, 6)) < 1e-9
    assert r["n_per_arm_required"] == need
    assert r["days_required"] == math.ceil(2.0 * need / 50.0)
    # no arrival rate -> NULL runway
    r2 = required_sample_size(df, "conv", 0.1).collect()[0]
    assert r2["days_required"] is None


def test_required_sample_size_guards(spark):
    from hazelcast_jet_spark.operators.experiment import required_sample_size

    df = spark.createDataFrame([(1, 1), (2, 1)], "u long, conv int")
    with pytest.raises(ValueError, match="degenerate"):
        required_sample_size(df, "conv", 0.1)
    with pytest.raises(ValueError, match="rel_lift"):
        required_sample_size(df, "conv", 0.0)


def test_two_phase_quantiles_equal_rank_selection(spark, sf_dir):
    """The scale-path swap the median_ci/tail_risk docstrings prescribe
    is EXACT: weighted_percentiles with unit weights (two-phase bin
    scan, no per-group total sort) picks the identical values as the
    rank-selection operators — the smallest value whose cumulative
    count reaches q*n IS the value at rank ceil(q*n)."""
    from hazelcast_jet_spark.operators.profile import (median_ci,
                                                       weighted_percentiles)
    from hazelcast_jet_spark.operators.timeseries import tail_risk
    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("key"), "value",
        F.lit(1.0).alias("one"))
    wp = {r["group"]: r for r in
          weighted_percentiles(e, "value", "one", "key",
                               qs=(0.5, 0.95)).collect()}
    med = {r["key"]: r["median"] for r in
           median_ci(e, "value", ["key"]).collect()}
    var95 = {r["key"]: r["var_q"] for r in
             tail_risk(e, "key", "value", q=0.95).collect()}
    assert set(wp) == set(med)
    for k in wp:
        assert round(wp[k]["wp_0_5"], 6) == med[k]
        assert round(wp[k]["wp_0_95"], 6) == var95[k]


def test_mann_whitney_explicit_arms_restrict_input(spark):
    """With arms=('A','B'), rows from a third arm (or NULL arm/metric)
    are EXCLUDED, not silently folded into arm B (review r9)."""
    from hazelcast_jet_spark.operators.experiment import mann_whitney_u

    clean = [("A", 1.0), ("A", 3.0), ("B", 2.0), ("B", 4.0), ("A", 5.0)]
    noisy = clean + [("C", 100.0), ("C", 200.0), (None, 300.0),
                     ("B", None)]
    df_c = spark.createDataFrame(clean, "arm string, y double")
    df_n = spark.createDataFrame(noisy, "arm string, y double")
    a = mann_whitney_u(df_c, "arm", "y", arms=("A", "B")).collect()[0]
    b = mann_whitney_u(df_n, "arm", "y", arms=("A", "B")).collect()[0]
    assert a.asDict() == b.asDict()
    assert (b["n_a"], b["n_b"]) == (3, 2)


def test_dp_noisy_counts_domain_releases_absent_groups(spark):
    """With a domain, groups absent from the data are still released
    (noise around zero), so group PRESENCE no longer leaks (review
    r9); present groups release identically with or without domain."""
    from hazelcast_jet_spark.operators.profile import dp_noisy_counts

    df = spark.createDataFrame([("x", 1), ("x", 2), ("y", 3)],
                               "g string, v int")
    dom = spark.createDataFrame([("x",), ("y",), ("z",)], "g string")
    with_dom = {r["g"]: r["noisy_count"] for r in
                dp_noisy_counts(df, ["g"], 0.5, seed="d1",
                                domain=dom).collect()}
    without = {r["g"]: r["noisy_count"] for r in
               dp_noisy_counts(df, ["g"], 0.5, seed="d1").collect()}
    assert set(with_dom) == {"x", "y", "z"}
    assert set(without) == {"x", "y"}
    for g in ("x", "y"):
        assert with_dom[g] == without[g]
    # absent group: pure noise around 0, same seeded draw as count 0
    h = int(hashlib.md5(b"d1-z").hexdigest()[:12], 16)
    u = (h + 0.5) / float(1 << 48)
    noise = -(2.0) * math.copysign(1.0, u - 0.5) \
        * math.log(1.0 - 2.0 * abs(u - 0.5))
    assert abs(with_dom["z"] - round(noise, 6)) < 1e-6


# ---------------------------------------------------------------------------
# ADVICE r10 edge-case hardening
# ---------------------------------------------------------------------------

def test_diff_in_diff_all_null_cell_raises_cleanly(spark):
    """A cell whose metric is entirely NULL has n_units=0 (count(y)
    counts non-nulls) — must raise the descriptive ValueError, not a
    TypeError inside the stats arithmetic (ADVICE r9)."""
    from hazelcast_jet_spark.operators.experiment import diff_in_diff

    rows = ([("A", "pre", None), ("A", "pre", None)]
            + [("A", "post", 2.0), ("B", "pre", 3.0), ("B", "post", 4.0)])
    df = spark.createDataFrame(rows, "arm string, period string, y double")
    with pytest.raises(ValueError, match="no non-null"):
        diff_in_diff(df, "arm", "period", "y")


def test_covariate_balance_single_value_arm_gives_null_smd(spark):
    """An arm with one non-null value has an undefined sample variance
    (n-1 = 0): both the operator and the oracle must emit NULL, not
    inf/nan from IEEE division (ADVICE r9)."""
    from hazelcast_jet_spark.operators.experiment import covariate_balance

    df = spark.createDataFrame(
        [("A", 5.0), ("A", None), ("B", 1.0), ("B", 3.0), ("B", 5.0)],
        "arm string, x double")
    r = covariate_balance(df, "arm", ["x"]).collect()[0]
    assert r["n_a"] == 1 and r["n_b"] == 3
    assert r["smd"] is None
    # means differ (5.0 vs 3.0) -> the fallback flag still fires
    assert r["imbalanced"] is True


def test_mann_whitney_empty_input_raises_cleanly(spark):
    """Empty / all-NULL input makes the aggregate sums NULL — the
    intended 'an arm has no units' ValueError must fire, not a
    TypeError on NULL arithmetic (ADVICE r9)."""
    from hazelcast_jet_spark.operators.experiment import mann_whitney_u

    empty = spark.createDataFrame([], "arm string, y double")
    with pytest.raises(ValueError, match="no units"):
        mann_whitney_u(empty, "arm", "y", arms=("A", "B"))
    all_null = spark.createDataFrame(
        [("A", None), ("B", None)], "arm string, y double")
    with pytest.raises(ValueError, match="no units"):
        mann_whitney_u(all_null, "arm", "y", arms=("A", "B"))


def test_dp_noise_key_is_boundary_safe(spark):
    """Multi-column groups whose values straddle the separator — e.g.
    ('a|b', 'c') vs ('a', 'b|c') — and NULL-vs-empty pairs must get
    INDEPENDENT noise draws, not identical ones (ADVICE r9)."""
    from hazelcast_jet_spark.operators.profile import dp_noisy_counts

    df = spark.createDataFrame(
        [("a|b", "c"), ("a", "b|c"), (None, "x"), ("", "x")],
        "g1 string, g2 string")
    out = dp_noisy_counts(df, ["g1", "g2"], 0.5, seed="bk1").collect()
    assert len(out) == 4
    # every group has true count 1 -> identical draws would show as
    # identical noisy counts; the length-prefixed key makes all four
    # draws distinct
    noisy = [r["noisy_count"] for r in out]
    assert len(set(noisy)) == 4


def test_dp_single_column_key_unchanged(spark):
    """The single-column noise key stays the raw string cast, so the
    released replayable oracles (md5(seed-||key)) keep matching."""
    import hashlib as _h

    from hazelcast_jet_spark.operators.profile import dp_noisy_counts

    eps, seed = 0.5, "sc1"
    df = spark.createDataFrame([(7,), (7,), (9,)], "g int")
    got = {r["g"]: r["noisy_count"] for r in
           dp_noisy_counts(df, ["g"], eps, seed=seed).collect()}
    for g, n in ((7, 2), (9, 1)):
        h = int(_h.md5(f"{seed}-{g}".encode()).hexdigest()[:12], 16)
        u = (h + 0.5) / float(1 << 48) - 0.5
        noise = (-1.0 / eps) * math.copysign(1.0, u) \
            * math.log(1.0 - 2.0 * abs(u))
        assert abs(got[g] - round(n + noise, 6)) < 1e-9


# ---------------------------------------------------------------------------
# experiment_stream_counters / experiment_readout_fold (r10)
# ---------------------------------------------------------------------------

def test_experiment_readout_fold_matches_closed_form(spark):
    """The fold reproduces ab_proportion_test's z/srm on the same unit
    table, plus the exact mean events per user."""
    import datetime as _dt

    from hazelcast_jet_spark.operators.experiment import (
        ab_assign, experiment_readout_fold, experiment_stream_counters)

    rows = [(i, _dt.datetime(2024, 1, 1 + i % 5),
             "purchase" if i % 3 == 0 else "view",
             100.0 if i % 6 == 0 else 10.0)
            for i in range(120)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, "
              "value double")
    counters = experiment_stream_counters(
        df, "user_id", "ts", "event_type", "purchase", "value", 95.0)
    out = experiment_readout_fold(counters, seed="t9").collect()
    assert [r["arm"] for r in out] == ["A", "B"]

    # python replica over the same md5 assignment
    per = {}
    for uid, _, t, v in rows:
        arm = "A" if hashlib.md5(f"t9-{uid}".encode()
                                 ).hexdigest()[0] < "8" else "B"
        n, c = per.get((arm, uid), (0, 0))
        per[(arm, uid)] = (n + 1, max(c, int(t == "purchase" and v >= 95.0)))
    stats = {}
    for (arm, _), (n, c) in per.items():
        u, cv, ev = stats.get(arm, (0, 0, 0))
        stats[arm] = (u + 1, cv + c, ev + n)
    (na, ca, ea), (nb, cb, eb) = stats["A"], stats["B"]
    pool = (ca + cb) / (na + nb)
    z = ((ca / na - cb / nb)
         / math.sqrt(pool * (1 - pool) * (1 / na + 1 / nb)))
    srm = (na - (na + nb) / 2.0) / math.sqrt((na + nb) / 4.0)
    for r, (n, c, e) in zip(out, (stats["A"], stats["B"])):
        assert (r["n_users"], r["n_converted"]) == (n, c)
        assert abs(r["conv_rate"] - round(c / n, 6)) < 1e-9
        assert abs(r["avg_events"] - round(e / n, 6)) < 1e-9
        assert abs(r["z"] - round(z, 6)) < 1e-9
        assert abs(r["srm_z"] - round(srm, 6)) < 1e-9
        assert r["significant"] == (abs(z) > 1.96)
    # the counters' arm column comes from the fold, not the stream:
    # the stream side never needs the seed
    assert "arm" not in counters.columns
    del ab_assign  # imported for parity with the operator surface


def test_experiment_readout_fold_rejects_degenerate(spark):
    from hazelcast_jet_spark.operators.experiment import (
        experiment_readout_fold)

    one_arm = spark.createDataFrame(
        [(1, 3, 1, None, None)],
        "user long, n_events long, converted int, first_day date, "
        "first_conv_day date")
    with pytest.raises(ValueError, match="2 arms"):
        experiment_readout_fold(one_arm, seed="x")


def test_msprt_trace_always_valid_p_behaves(spark):
    """p is 1 on undefined days, nonincreasing everywhere, matches the
    closed-form mixture likelihood ratio, and rejects under a strong
    effect while staying >alpha under a null split."""
    import datetime as _dt

    from hazelcast_jet_spark.operators.experiment import ab_assign, msprt_trace

    # strong effect: arm A converts (almost) always, arm B (almost) never
    rows = []
    arms = {}
    for uid in range(400):
        arm = "A" if hashlib.md5(f"m1-{uid}".encode()
                                 ).hexdigest()[0] < "8" else "B"
        arms[uid] = arm
        day = 1 + uid % 10
        rows.append((uid, _dt.datetime(2024, 1, day), "view", 1.0))
        if (arm == "A") == (uid % 20 != 0):
            rows.append((uid, _dt.datetime(2024, 1, day), "purchase", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, "
              "value double")
    out = msprt_trace(df, "user_id", "ts", "event_type", "purchase",
                      seed="m1").collect()
    ps = [r["always_valid_p"] for r in out]
    assert all(ps[i] >= ps[i + 1] - 1e-12 for i in range(len(ps) - 1))
    assert out[-1]["rejected"] is True and ps[-1] < 0.01

    # python replica of the final day's statistic
    na = sum(1 for a in arms.values() if a == "A")
    nb = len(arms) - na
    ca = sum(1 for u, a in arms.items() if a == "A" and u % 20 != 0)
    cb = sum(1 for u, a in arms.items() if a == "B" and u % 20 == 0)
    tau2 = 0.1 * 0.1
    best = 1.0
    # replay the running min over the 10 entry days
    seen = sorted({1 + u % 10 for u in arms})
    for d_i in seen:
        in_day = [u for u in arms if 1 + u % 10 <= d_i]
        a_u = [u for u in in_day if arms[u] == "A"]
        b_u = [u for u in in_day if arms[u] == "B"]
        if not a_u or not b_u:
            continue
        cna, cnb = len(a_u), len(b_u)
        cca = sum(1 for u in a_u if u % 20 != 0)
        ccb = sum(1 for u in b_u if u % 20 == 0)
        pool = (cca + ccb) / (cna + cnb)
        if pool <= 0.0 or pool >= 1.0:
            continue
        v = pool * (1.0 - pool) * (1.0 / cna + 1.0 / cnb)
        d = cca / cna - ccb / cnb
        lam = math.sqrt(v / (v + tau2)) * math.exp(
            d * d * tau2 / (2.0 * v * (v + tau2)))
        best = min(best, min(1.0, 1.0 / lam))
    assert abs(ps[-1] - round(best, 6)) < 1e-9
    assert (na, nb, ca, cb) == (out[-1]["n_a"], out[-1]["n_b"],
                                out[-1]["conv_a"], out[-1]["conv_b"])

    # null: identical 50% conversion in both arms -> never rejects
    null_rows = []
    for uid in range(400):
        day = 1 + uid % 10
        null_rows.append((uid, _dt.datetime(2024, 1, day), "view", 1.0))
        if uid % 2 == 0:
            null_rows.append((uid, _dt.datetime(2024, 1, day),
                              "purchase", 1.0))
    ndf = spark.createDataFrame(
        null_rows, "user_id long, ts timestamp_ntz, event_type string, "
                   "value double")
    nout = msprt_trace(ndf, "user_id", "ts", "event_type", "purchase",
                       seed="m1").collect()
    assert all(r["rejected"] is False for r in nout)
    assert all(r["always_valid_p"] > 0.05 for r in nout)
    del ab_assign


def test_qini_curve_perfect_targeting(spark):
    """A score that perfectly ranks uplift-responders first makes qini
    rise across the first bins and equal the total incremental
    conversions at the final bin (balanced arms)."""
    from hazelcast_jet_spark.operators.experiment import qini_curve

    # 100 units, alternating arms (50/50); treated units convert iff
    # score is in the top half, control never converts
    rows = [(i, "B" if i % 2 == 0 else "A", 100.0 - i,
             1 if (i % 2 == 0 and i < 50) else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, arm string, score double, "
                                     "conv bigint")
    out = qini_curve(df, "arm", "score", "conv", "id", n_bins=4).collect()
    assert [r["bin"] for r in out] == [1, 2, 3, 4]
    # top-half bins capture all 25 treated conversions; control stays 0
    assert out[1]["cum_conv_treated"] == 25
    assert out[-1]["qini"] == 25.0
    assert out[0]["qini"] < out[1]["qini"] + 1e-9
    # balanced arms: uplift at bin 2 = 25/25 - 0 = 1.0
    assert abs(out[1]["uplift"] - 1.0) < 1e-9
    # final-bin uplift = overall treated rate (25/50)
    assert abs(out[-1]["uplift"] - 0.5) < 1e-9


def test_qini_curve_empty_arm_bins_are_null(spark):
    import pytest

    from hazelcast_jet_spark.operators.experiment import qini_curve

    # every unit treated: control cumulative is 0 -> NULL readouts
    rows = [(i, "B", float(i), i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, arm string, score double, "
                                     "conv bigint")
    out = qini_curve(df, "arm", "score", "conv", "id", n_bins=2).collect()
    assert all(r["uplift"] is None and r["qini"] is None for r in out)
    with pytest.raises(ValueError, match="n_bins"):
        qini_curve(df, "arm", "score", "conv", "id", n_bins=1)


def test_shapley_attribution_matches_hand_example(spark):
    """Two channels, hand-computable coalition values: phi matches the
    closed form and satisfies the efficiency axiom
    sum(phi) = v(grand) - v(empty)."""
    from hazelcast_jet_spark.operators.experiment import shapley_attribution

    rows = []
    # users 1,2 touch A then buy: v({A}) = 1.0
    for u in (1, 2):
        rows += [(u, 1, "A"), (u, 2, "buy")]
    # users 3,4 touch B; only 3 buys: v({B}) = 0.5
    rows += [(3, 1, "B"), (3, 2, "buy"), (4, 1, "B")]
    # users 5,6 touch A and B then buy: v({A,B}) = 1.0
    for u in (5, 6):
        rows += [(u, 1, "A"), (u, 2, "B"), (u, 3, "buy")]
    # user 7 buys untouched: v({}) = 1.0
    rows += [(7, 1, "buy")]
    df = spark.createDataFrame(rows, "u long, t int, c string")
    out = {r["channel"]: r for r in shapley_attribution(
        df, "u", "t", "c", "buy", channels=["A", "B"]).collect()}
    # phi_A = .5(v(A)-v({})) + .5(v(AB)-v(B)) = 0.25
    # phi_B = .5(v(B)-v({})) + .5(v(AB)-v(A)) = -0.25
    assert abs(out["A"]["shapley"] - 0.25) < 1e-9
    assert abs(out["B"]["shapley"] + 0.25) < 1e-9
    assert out["A"]["touched_users"] == 4 and out["B"]["touched_users"] == 4
    assert abs(out["A"]["touched_conv_rate"] - 1.0) < 1e-9
    assert abs(out["B"]["touched_conv_rate"] - 0.75) < 1e-9


def test_shapley_attribution_touches_after_conversion_ignored(spark):
    """Only strictly-pre-conversion touches count; non-converters
    contribute their full set at v = 0."""
    import pytest

    from hazelcast_jet_spark.operators.experiment import shapley_attribution

    rows = [(1, 1, "buy"), (1, 2, "A"),          # post-conv touch ignored
            (2, 1, "A"), (2, 2, "buy"),          # pre-conv counts
            (3, 1, "B")]                          # non-converter set {B}
    df = spark.createDataFrame(rows, "u long, t int, c string")
    out = {r["channel"]: r for r in shapley_attribution(
        df, "u", "t", "c", "buy", channels=["A", "B"]).collect()}
    # v({})=1 (user 1), v({A})=1 (user 2), v({B})=0 (user 3)
    # phi_A = .5(1-1) + .5(0-0) = 0 ; phi_B = .5(0-1) + .5(0-1) = -1
    assert abs(out["A"]["shapley"] - 0.0) < 1e-9
    assert abs(out["B"]["shapley"] + 1.0) < 1e-9
    assert out["A"]["touched_users"] == 1
    with pytest.raises(ValueError, match="channels"):
        shapley_attribution(df, "u", "t", "c", "buy", channels=[])


def test_aipw_matches_numpy_and_reduces_variance(spark):
    """AIPW equals the numpy influence-function computation; with
    strata that predict the outcome, se_aipw < the naive diff-in-means
    se while the point estimates agree in expectation."""
    import numpy as np

    from hazelcast_jet_spark.operators.experiment import aipw_ate

    rows = []
    rng_t = lambda i: "B" if (i // 4) % 2 == 0 else "A"
    for i in range(400):
        s = f"s{i % 4}"
        base = (i % 4) * 10.0
        eff = 3.0
        t = rng_t(i)
        y = base + (eff if t == "B" else 0.0) + ((i * 13) % 5 - 2.0) * 0.1
        rows.append((t, s, y))
    df = spark.createDataFrame(rows, "arm string, stratum string, y double")
    out = aipw_ate(df, "arm", "y", "stratum").collect()[0]

    a = np.array([(1.0 if t == "B" else 0.0, int(s[1]), y)
                  for t, s, y in rows])
    T, S, Y = a[:, 0], a[:, 1].astype(int), a[:, 2]
    m1 = {s: Y[(S == s) & (T == 1)].mean() for s in range(4)}
    m0 = {s: Y[(S == s) & (T == 0)].mean() for s in range(4)}
    e = 0.5
    psi = np.array([m1[s] - m0[s] + tt * (yy - m1[s]) / e
                    - (1 - tt) * (yy - m0[s]) / (1 - e)
                    for tt, s, yy in zip(T, S, Y)])
    psi = np.round(psi, 9)
    ate = psi.mean()
    se = np.sqrt(psi.var(ddof=1) / len(psi))
    assert out["n_units"] == 400 and out["n_dropped"] == 0
    assert abs(out["ate_aipw"] - round(float(ate), 6)) < 1e-6
    assert abs(out["ate_aipw"] - 3.0) < 0.2
    assert abs(out["se_aipw"] - round(float(se), 6)) < 1e-6
    assert abs(out["ate_diff_means"] - round(float(Y[T == 1].mean()
                                                   - Y[T == 0].mean()),
                                             6)) < 1e-6
    # strata soak up the base-rate variance: the naive diff-means se
    # (pooled) is much larger than the AIPW se
    naive_se = np.sqrt(Y[T == 1].var(ddof=1) / (T == 1).sum()
                       + Y[T == 0].var(ddof=1) / (T == 0).sum())
    assert out["se_aipw"] < 0.5 * naive_se


def test_aipw_drops_one_armed_strata(spark):
    import pytest

    from hazelcast_jet_spark.operators.experiment import aipw_ate

    rows = ([("B", "both", 2.0), ("A", "both", 1.0)] * 3
            + [("B", "only_t", 9.0)] * 2)
    df = spark.createDataFrame(rows, "arm string, stratum string, y double")
    out = aipw_ate(df, "arm", "y", "stratum").collect()[0]
    assert out["n_units"] == 6 and out["n_dropped"] == 2
    assert abs(out["ate_aipw"] - 1.0) < 1e-9
    empty = spark.createDataFrame([], "arm string, stratum string, y double")
    with pytest.raises(ValueError, match="no usable units"):
        aipw_ate(empty, "arm", "y", "stratum")


def test_msprt_trace_rejects_bad_params(spark):
    from hazelcast_jet_spark.operators.experiment import msprt_trace

    df = spark.createDataFrame([], "user_id long, ts timestamp_ntz, "
                                   "event_type string")
    with pytest.raises(ValueError, match="tau"):
        msprt_trace(df, "user_id", "ts", "event_type", "x", tau=0.0)
    with pytest.raises(ValueError, match="alpha"):
        msprt_trace(df, "user_id", "ts", "event_type", "x", alpha=1.0)


def test_msprt_from_firsts_equals_batch_trace(spark):
    """The firsts-fed tail is the SAME statistic: user_firsts +
    msprt_trace_from_firsts reproduces msprt_trace row for row — the
    streaming==batch pin behind q:streaming_msprt_events."""
    import datetime as _dt

    from hazelcast_jet_spark.operators.experiment import (
        msprt_trace, msprt_trace_from_firsts, user_firsts)

    rows = []
    for uid in range(120):
        day = 1 + uid % 9
        rows.append((uid, _dt.datetime(2024, 2, day), "view", 1.0))
        if uid % 3 == 0:
            rows.append((uid, _dt.datetime(2024, 2, day), "purchase", 1.0))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string, "
              "value double")
    a = [tuple(r) for r in msprt_trace(
        df, "user_id", "ts", "event_type", "purchase", seed="sf1").collect()]
    b = [tuple(r) for r in msprt_trace_from_firsts(
        user_firsts(df, "user_id", "ts", "event_type", "purchase"),
        "user_id", seed="sf1").collect()]
    assert a == b and len(a) == 9
