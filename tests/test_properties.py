"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has no randomized testing): engine results
must agree with an independent pandas model on arbitrary inputs."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators.joins import top_n_rows

ROWS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-1000, 1000)), min_size=1, max_size=60
)

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(rows=ROWS)
@SLOW
def test_grouped_agg_matches_pandas(spark, rows):
    df = spark.createDataFrame(rows, "k int, v long")
    got = {
        r["k"]: (r["cnt"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        ).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    want = {
        int(k): (int(g["v"].count()), int(g["v"].sum()), int(g["v"].min()), int(g["v"].max()))
        for k, g in pdf.groupby("k")
    }
    assert got == want


@given(rows=ROWS, n=st.integers(1, 4))
@SLOW
def test_top_n_rows_matches_pandas(spark, rows, n):
    df = spark.createDataFrame(rows, "k int, v long")
    out = top_n_rows(df, n, ["k"], [F.col("v").desc(), F.col("k")])
    got = sorted((r["k"], r["v"]) for r in out.collect())
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    want = sorted(
        (int(k), int(v))
        for k, g in pdf.groupby("k")
        for v in g["v"].sort_values(ascending=False).head(n)
    )
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=1, max_size=40), min_size=1, max_size=12
    )
)
@SLOW
def test_exact_dedup_partitions_all_docs(spark, texts):
    """exact_dedup groups cover every doc exactly once, and identical
    normalized texts always land in one group."""
    from hazelcast_jet_spark.operators.dedup import exact_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = exact_dedup(df).collect()
    assert sum(g["dup_count"] for g in groups) == len(texts)
    assert all(any(g["keep_id"] == i for g in groups) or True for i in range(len(texts)))
    # keep_id is the min doc_id of its group
    assert all(g["keep_id"] < len(texts) for g in groups)


@given(
    batches=st.lists(
        st.lists(
            st.tuples(st.integers(0, 20), st.one_of(st.none(), st.integers(-99, 99))),
            min_size=1, max_size=8,
        ),
        min_size=1, max_size=4,
    )
)
@SLOW
def test_keyed_table_matches_dict_model(spark, tmp_path_factory, batches):
    """Arbitrary upsert/delete batch sequences applied through
    KeyedParquetTable end in exactly the state of a plain dict applying
    the same operations (value None = delete)."""
    from hazelcast_jet_spark.storage import KeyedParquetTable

    tbl = str(tmp_path_factory.mktemp("kt_prop") / "t")
    t = KeyedParquetTable(tbl, ["id"], num_buckets=4)
    model: dict[int, int] = {}
    for batch in batches:
        # last write per key wins within the batch (dict shape)
        per_key = dict(batch)
        ups = [(k, v) for k, v in per_key.items() if v is not None]
        up_df = spark.createDataFrame(ups, "id long, v long") if ups else \
            spark.createDataFrame([], "id long, v long")
        keys_df = spark.createDataFrame([(k,) for k in per_key], "id long")
        if not t.exists():
            # table bootstrap only stores upserts (deletes are no-ops)
            t.overwrite(up_df)
        else:
            t.apply(up_df, keys_df)
        for k, v in per_key.items():
            if v is None:
                model.pop(k, None)
            else:
                model[k] = v
    got = {r["id"]: r["v"] for r in t.read(spark).collect()} if t.exists() else {}
    assert got == model


EVENTS = st.lists(
    st.tuples(st.integers(0, 3),              # user
              st.integers(0, 48),             # hour offset
              st.sampled_from(["a", "b", "c"])),  # event type
    min_size=0, max_size=50,
)


@given(events=EVENTS, pattern=st.lists(st.sampled_from(["a", "b", "c"]),
                                       min_size=2, max_size=4),
       within_hours=st.one_of(st.none(), st.integers(1, 24)))
@SLOW
def test_match_sequence_matches_python_model(spark, events, pattern, within_hours):
    """CEP strict-contiguity matcher agrees with an independent
    pure-Python scan over arbitrary event sequences and patterns."""
    from datetime import datetime, timedelta

    from hazelcast_jet_spark.operators.cep import match_sequence

    base = datetime(2024, 1, 1)
    rows = [(i, u, base + timedelta(hours=h), t)
            for i, (u, h, t) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, event_type string")
    got = {(r.user_id, r.start_event_id, r.end_event_id)
           for r in match_sequence(
               df, list(pattern),
               within=f"{within_hours} HOUR" if within_hours else None).collect()}

    # independent model: sort per user by (ts, id), scan windows of k
    model = set()
    k = len(pattern)
    by_user: dict[int, list] = {}
    for eid, u, ts, t in rows:
        by_user.setdefault(u, []).append((ts, eid, t))
    for u, evs in by_user.items():
        evs.sort()
        for i in range(len(evs) - k + 1):
            win = evs[i:i + k]
            if [e[2] for e in win] == list(pattern):
                if within_hours is None or win[-1][0] <= win[0][0] + timedelta(hours=within_hours):
                    model.add((u, win[0][1], win[-1][1]))
    assert got == model


ASOF_LEFT = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-99, 99)),
    min_size=1, max_size=40)
ASOF_RIGHT = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(-99, 99)),
    min_size=0, max_size=40)


@given(left=ASOF_LEFT, right=ASOF_RIGHT, direction=st.sampled_from(["backward", "forward"]))
@SLOW
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction):
    """asof_join (both directions) must agree with pandas.merge_asof on
    arbitrary keyed integer time-series.  Right-side (key, t) duplicates
    are pre-collapsed to max(v) — the operator's documented tie rule —
    so both models see identical inputs."""
    from hazelcast_jet_spark.operators.joins import asof_join

    # unique left rows (id by position); right collapsed like the operator does
    lpdf = pd.DataFrame(left, columns=["k", "t", "lv"]).reset_index(names="rid")
    rbest: dict = {}
    for k, t, v in right:
        rbest[(k, t)] = max(v, rbest.get((k, t), v))
    rpdf = pd.DataFrame(
        [(k, t, v) for (k, t), v in sorted(rbest.items())], columns=["k", "t", "rv"])

    ldf = spark.createDataFrame(lpdf, "rid long, k long, t long, lv long")
    rdf = spark.createDataFrame(rpdf, "k long, t long, rv long") if len(rpdf) else \
        spark.createDataFrame([], "k long, t long, rv long")
    got = {
        r["rid"]: r["rv"]
        for r in asof_join(ldf, rdf, "k", "t", value_cols=["rv"],
                           direction=direction).collect()
    }

    if len(rpdf):
        want_df = pd.merge_asof(
            lpdf.sort_values(["t", "rid"]), rpdf.sort_values("t"),
            on="t", by="k", direction=direction)
        want = {int(r.rid): (None if pd.isna(r.rv) else int(r.rv))
                for r in want_df.itertuples()}
    else:
        want = {int(r.rid): None for r in lpdf.itertuples()}
    assert got == want


DOC_TEXTS = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=12)


@given(texts=DOC_TEXTS, chunk=st.integers(2, 6), overlap=st.integers(0, 4))
@SLOW
def test_chunk_documents_matches_python_model(spark, texts, chunk, overlap):
    """chunk_documents vs an independent Python model: same chunk starts,
    contents, and counts for arbitrary text/chunk/overlap combos (the
    model's ceil-div start grid guarantees the last chunk reaches the
    final token, so equality pins full coverage too)."""
    from hazelcast_jet_spark.operators.text import chunk_documents

    if overlap >= chunk:
        overlap = chunk - 1
    stride = chunk - overlap
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    )

    want = []
    for i, t in enumerate(texts):
        # python model of normalize_text: lowercase, non-alnum -> space,
        # collapse, strip; then whitespace split (empty text -> [''])
        import re
        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9]+", " ", t.lower())).strip()
        toks = norm.split(" ") if norm else [""]
        n_chunks = max(-(-(len(toks) - overlap) // stride), 1)
        for c in range(n_chunks):
            want.append((i, c, " ".join(toks[c * stride: c * stride + chunk])))
    assert got == sorted(want)


HH_ROWS = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 30)),
    min_size=1, max_size=120)


@given(rows=HH_ROWS, k=st.integers(1, 4), cap=st.integers(5, 40))
@SLOW
def test_heavy_hitters_matches_exact_topk(spark, rows, k, cap):
    """heavy_hitters vs exact pandas counts on arbitrary data: whenever
    the k-th item's frequency clears the MG bound n/(capacity+1), the
    verified top-k equals ground truth exactly (counts always exact for
    whatever candidates survive)."""
    from hazelcast_jet_spark.operators.sketch import heavy_hitters

    df = spark.createDataFrame(
        [(g, f"i{v}") for g, v in rows], "grp int, item string").repartition(4)
    got = heavy_hitters(df, "item", ["grp"], k=k, capacity=cap).collect()

    truth: dict[int, dict[str, int]] = {}
    for g, v in rows:
        truth.setdefault(g, {})
        truth[g][f"i{v}"] = truth[g].get(f"i{v}", 0) + 1
    for r in got:
        assert truth[r["grp"]][r["item"]] == r["n"]   # exact counts always
    for g, counts in truth.items():
        n = sum(counts.values())
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        kth = ranked[min(k, len(ranked)) - 1][1]
        if kth > n / (cap + 1):                       # MG coverage holds
            want = ranked[:k]
            mine = sorted(((r["item"], r["n"]) for r in got if r["grp"] == g),
                          key=lambda kv: (-kv[1], kv[0]))
            assert mine == want, (g, mine, want)


@given(texts=st.lists(st.text(alphabet="abc THE!9", min_size=0, max_size=60),
                      min_size=1, max_size=10))
@SLOW
def test_gopher_flags_match_python_model(spark, texts):
    """gopher_quality_flags vs an independent Python model of the four
    row-local rules on arbitrary text."""
    import re

    from hazelcast_jet_spark.operators.text import EN_STOPWORDS, gopher_quality_flags

    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = {r["id"]: r["q"] for r in df.select(
        "id", gopher_quality_flags(
            "text", min_words=2, max_words=20, min_mean_word_len=1.0,
            max_mean_word_len=4.0, max_symbol_ratio=0.2,
            min_stopword_hits=1).alias("q")).collect()}

    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.strip()) if t.strip() else []
        n_tok = len(toks) if t.strip() else 0
        n_alpha = len(re.sub(r"[^A-Za-z]", "", t))
        mean_wl = n_alpha / max(n_tok, 1)
        n_sym = len(re.sub(r"[A-Za-z0-9\s]", "", t))
        sym_ratio = n_sym / max(len(t), 1)
        sw_hits = len({w for w in (x.lower() for x in toks)
                       if w in EN_STOPWORDS})
        q = got[i]
        assert q["ok_words"] == (2 <= n_tok <= 20), (t, n_tok)
        assert q["ok_mean_word_len"] == (1.0 <= mean_wl <= 4.0), (t, mean_wl)
        assert q["ok_symbol_ratio"] == (sym_ratio <= 0.2), (t, sym_ratio)
        assert q["ok_stopwords"] == (sw_hits >= 1), (t, sw_hits)
        assert q["pass"] == all([q["ok_words"], q["ok_mean_word_len"],
                                 q["ok_symbol_ratio"], q["ok_stopwords"]])


@given(
    keys=st.lists(st.integers(0, 50), min_size=1, max_size=80),
    n=st.integers(1, 5),
)
@SLOW
def test_quota_per_key_matches_python_model(spark, keys, n):
    """quota_per_key == an independent Python model ranking by
    md5(seed||id) with id tiebreak, for ANY key multiset and cap."""
    import hashlib
    from hazelcast_jet_spark.operators.sampling import quota_per_key

    rows = [(i, f"g{k % 5}") for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = sorted(r["doc_id"] for r in
                 quota_per_key(df, "grp", n, "doc_id", seed="pp").collect())
    by_grp: dict[str, list] = {}
    for i, g in rows:
        h = hashlib.md5(f"pp{i}".encode()).hexdigest()
        by_grp.setdefault(g, []).append((h, i))
    want = sorted(i for g, members in by_grp.items()
                  for _, i in sorted(members)[:n])
    assert got == want


@given(keys=st.lists(st.integers(0, 10_000), min_size=1, max_size=100))
@SLOW
def test_split_by_key_matches_python_model(spark, keys):
    """split_by_key == the cumulative md5-prefix band model."""
    import hashlib
    from hazelcast_jet_spark.operators.sampling import split_by_key

    df = spark.createDataFrame([(k,) for k in set(keys)], "k long")
    got = {r["k"]: r["split"] for r in
           split_by_key(df, "k", {"a": 0.5, "b": 0.25, "c": 0.25},
                        seed="sp").collect()}
    space = 16 ** 6
    for k in set(keys):
        p = int(hashlib.md5(f"sp{k}".encode()).hexdigest()[:6], 16)
        if p < int(0.5 * space):
            want = "a"
        elif p < int(0.75 * space):
            want = "b"
        else:
            want = "c"
        assert got[k] == want, (k, p, got[k], want)


@given(
    rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2000),
                            st.integers(-50, 50)), min_size=1, max_size=80),
    n_frames=st.integers(1, 6),
    slide=st.sampled_from([5, 60]),
)
@SLOW
def test_sliding_agg_matches_python_model(spark, rows, n_frames, slide):
    """windows.sliding_agg == a direct Python model assigning every event
    to its size/slide windows — for arbitrary event times, window
    geometry, and keys (numeric time column)."""
    from hazelcast_jet_spark.operators.windows import sliding_agg
    from pyspark.sql import functions as F

    size = slide * n_frames
    df = spark.createDataFrame(
        [(k, float(t), v) for k, t, v in rows], "k int, ts double, v long")
    got = {
        (r["k"], r["window_start_epoch"]): (r["n"], r["s"])
        for r in sliding_agg(df, "ts", size, slide, ["k"],
                             {"n": F.count(F.lit(1)), "s": F.sum("v")},
                             {"n": F.sum("n"), "s": F.sum("s")}).collect()
    }
    want: dict = {}
    for k, t, v in rows:
        frame = t // slide
        for a in range(frame, frame + n_frames):
            ws = (a - n_frames + 1) * slide
            key = (k, ws)
            n0, s0 = want.get(key, (0, 0))
            want[key] = (n0 + 1, s0 + v)
    assert got == want


FUNNEL_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 6),                 # user
        st.sampled_from(["a", "b", "c"]),  # stage type
        st.integers(0, 50),                # second offset
    ),
    min_size=1, max_size=60,
)


@given(events=FUNNEL_EVENTS)
@SLOW
def test_funnel_counts_match_python_model(spark, events):
    """funnel_counts vs an independent greedy earliest-completion model
    over arbitrary event streams (ties and repeats included)."""
    import datetime as dt

    from hazelcast_jet_spark.operators.timeseries import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, s, t0 + dt.timedelta(seconds=sec)) for u, s, sec in events]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {r["stage"]: r["n_keys"]
           for r in funnel_counts(df, ["a", "b", "c"]).collect()}

    stages = ["a", "b", "c"]
    counts = [0, 0, 0]
    users = {u for u, _, _ in events}
    for u in users:
        evs = [(s, sec) for uu, s, sec in events if uu == u]
        prev = None
        for i, stage in enumerate(stages):
            cand = [sec for s, sec in evs
                    if s == stage and (prev is None or sec > prev)]
            if not cand:
                break
            prev = min(cand)
            counts[i] += 1
    assert got == {i + 1: c for i, c in enumerate(counts)}


PAIR_SETS = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=25,
)


@given(pairs=PAIR_SETS, scores=st.lists(st.integers(0, 5), min_size=16, max_size=16))
@SLOW
def test_keep_best_matches_union_find_model(spark, pairs, scores):
    """keep_best vs union-find + per-group argmax (ties → lowest id)."""
    from hazelcast_jet_spark.operators.dedup import keep_best

    docs = spark.createDataFrame(
        [(i, float(scores[i])) for i in range(16)], "doc_id long, s double")
    pdf = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "id_a long, id_b long")
    got = {r["group_id"]: (r["keep_id"], r["group_size"])
           for r in keep_best(docs, pdf, F.col("s")).collect()}

    parent = list(range(16))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    nodes = {n for p in pairs for n in p}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    want = {}
    for g, members in groups.items():
        best = max(members, key=lambda n: (scores[n], -n))
        want[min(members)] = (best, len(members))
    assert got == want


CORPUS = st.lists(
    st.lists(st.sampled_from(list("abcde")), min_size=1, max_size=12),
    min_size=2, max_size=8,
)


@given(corpus=CORPUS)
@SLOW
def test_cut_duplicated_spans_matches_python_model(spark, corpus):
    """cut_duplicated_spans vs a direct Python model: token i survives
    iff NO k-window covering it appears (as a token tuple) in another
    document."""
    from hazelcast_jet_spark.operators.dedup import cut_duplicated_spans

    k = 3
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_kept"], r["clean_text"])
           for r in cut_duplicated_spans(df, k=k).collect()}

    windows = {}  # tuple -> set of docs
    for i, toks in enumerate(corpus):
        for s in range(len(toks) - k + 1):
            windows.setdefault(tuple(toks[s:s + k]), set()).add(i)
    want = {}
    for i, toks in enumerate(corpus):
        w = len(toks) - k + 1
        dup_starts = [s for s in range(max(w, 0))
                      if len(windows[tuple(toks[s:s + k])]) > 1]
        kept = [t for j, t in enumerate(toks)
                if not any(s <= j <= s + k - 1 for s in dup_starts)]
        want[i] = (len(kept), " ".join(kept))
    assert got == want


@given(
    weights=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-2.0, max_value=3.0,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=40),
    rate=st.floats(min_value=0.0, max_value=2.0,
                   allow_nan=False, allow_infinity=False),
)
@SLOW
def test_weighted_sample_matches_exact_python_model(spark, weights, rate):
    """weighted_sample is DETERMINISTIC, so membership must equal an
    independent Python replay of the md5/hex-threshold arithmetic
    EXACTLY — including p≥1 short-circuit, clamping, and NULL drops."""
    import hashlib

    from hazelcast_jet_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, w double")
    got = sorted(r.doc_id for r in
                 weighted_sample(df, rate, "w", "doc_id", seed="pp").collect())

    want = []
    for i, w in enumerate(weights):
        if w is None:
            continue
        p = max(0.0, min(1.0, w * rate))
        u = hashlib.md5(f"pp{i}".encode()).hexdigest()[:6]
        thr = format(int(p * 16 ** 6), "x").rjust(6, "0")[:6]
        if p >= 1.0 or u < thr:
            want.append(i)
    assert got == want


BPE_TEXTS = st.lists(
    st.text(alphabet="abcd ", min_size=0, max_size=40),
    min_size=1, max_size=6)


@given(texts=BPE_TEXTS, n_merges=st.integers(1, 6))
@SLOW
def test_bpe_fit_and_segment_match_reference(spark, texts, n_merges):
    """Learned merge sequence AND the fold-based segmentation agree with
    an independent pure-Python BPE (Sennrich semantics) on arbitrary
    corpora — incl. repeated chars, empty texts, singleton pairs."""
    from hazelcast_jet_spark.operators.bpe import bpe_fit, bpe_segments
    from tests.test_operators import _ref_bpe_fit

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id: long, text: string")
    got = bpe_fit(df, "text", n_merges=n_merges)
    exp, ref_vocab = _ref_bpe_fit(texts, n_merges)
    assert got == exp
    seg = {r["id"]: r["s"] for r in df.select(
        "id", bpe_segments("text", got).alias("s")).collect()}
    for i, t in enumerate(texts):
        want = [s for w in t.strip().split() for s in ref_vocab[w]]
        assert seg[i] == want


INTERVALS = st.lists(
    st.tuples(st.integers(-30, 30), st.integers(1, 12)),
    min_size=1, max_size=25)


@given(left=INTERVALS, right=INTERVALS,
       bw=st.sampled_from([0.9, 2.0, 7.5, 50.0]))
@SLOW
def test_interval_grid_join_matches_bruteforce(spark, left, right, bw):
    """Grid decomposition == theta join for arbitrary spans/bin widths:
    no pair missed, none duplicated (owner-bin uniqueness)."""
    from hazelcast_jet_spark.operators.joins import interval_join

    ldf = spark.createDataFrame(
        [(i, float(s), float(s + d)) for i, (s, d) in enumerate(left)],
        "lid: long, ls: double, le: double")
    rdf = spark.createDataFrame(
        [(i, float(s), float(s + d)) for i, (s, d) in enumerate(right)],
        "rid: long, rs: double, re: double")
    got = sorted((r["lid"], r["rid"]) for r in
                 interval_join(ldf, rdf, ("ls", "le"), ("rs", "re"),
                               bin_width=bw).collect())
    want = sorted(
        (i, j)
        for i, (ls, ld) in enumerate(left)
        for j, (rs, rd) in enumerate(right)
        if ls < rs + rd and rs < ls + ld)
    assert got == want


@given(
    logs=st.lists(
        st.tuples(st.integers(0, 3),            # key
                  st.integers(0, 50),           # time
                  st.sampled_from(["A", "B", None])),  # state
        min_size=1, max_size=40),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_intervals_match_python_model(spark, logs):
    """scd2_intervals vs a direct Python replay: per key, sort by
    (time, id), collapse null-safe consecutive repeats, close intervals
    with the next change, number versions."""
    from hazelcast_jet_spark.operators.timeseries import scd2_intervals

    rows = [(k, t, s, i) for i, (k, t, s) in enumerate(logs)]
    df = spark.createDataFrame(rows, "k long, t long, s string, id long")
    got = sorted(
        (r["k"], r["version"], r["s"], r["valid_from"], r["valid_to"],
         r["open_id"])
        for r in scd2_intervals(df, "k", "t", "s", "id").collect())

    exp = []
    bykey: dict = {}
    for k, t, s, i in rows:
        bykey.setdefault(k, []).append((t, i, s))
    for k, evs in bykey.items():
        evs.sort()
        kept = []
        for t, i, s in evs:
            # Python == on None IS null-safe equality, matching eqNullSafe
            if not kept or kept[-1][2] != s:
                kept.append((t, i, s))
        for v, (t, i, s) in enumerate(kept, 1):
            vt = kept[v][0] if v < len(kept) else None
            exp.append((k, v, s, t, vt, i))
    assert got == sorted(exp)


@given(
    docs=st.lists(st.text(alphabet="ab c", min_size=0, max_size=30),
                  min_size=1, max_size=12),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bm25_matches_python_model_property(spark, docs):
    """bm25_scores vs the direct formula on arbitrary tiny corpora
    (normalization, df/N/avgdl derivation, absent-term rows)."""
    import math

    from hazelcast_jet_spark.operators.text import bm25_scores

    terms = ["a", "b"]
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["bm25"])
           for r in bm25_scores(df, terms).collect()}

    toks = {i: [w for w in t.split() if w] for i, t in enumerate(docs)}
    toks = {i: v for i, v in toks.items() if v}       # docs with >= 1 token
    if not toks:
        assert got == {}
        return
    N = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / N
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    exp = {}
    for i, v in toks.items():
        s, hits = 0.0, 0
        for t in sorted(terms):
            tf = v.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
        if hits:
            exp[i] = (hits, s)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert abs(got[i][1] - exp[i][1]) < 1e-9


@given(rows=st.lists(st.tuples(st.integers(0, 3),
                               st.integers(1, 10_000)),
                     min_size=1, max_size=50),
       frac=st.sampled_from([0.25, 0.5, 0.75, 1.0]))
@SLOW
def test_waterfill_matches_python_model(spark, rows, frac):
    """waterfill_allocation vs an independent python water-filling
    solver: allocations sum to the budget (when coverable), small
    sources saturate, nothing exceeds its capacity."""
    from hazelcast_jet_spark.operators.sampling import waterfill_allocation

    df = spark.createDataFrame(rows, "g int, sz long")
    got = {r.g: r for r in
           waterfill_allocation(df, "g", "sz", frac).collect()}

    caps = {}
    for g, sz in rows:
        caps[g] = caps.get(g, 0) + sz
    total = sum(caps.values())
    budget = total * frac
    order = sorted(caps.items(), key=lambda kv: (kv[1], kv[0]))
    theta, pfx = None, 0
    for i, (_g, c) in enumerate(order):
        cand = (budget - pfx) / (len(order) - i)
        if cand <= c:
            theta = cand
            break
        pfx += c
    for g, c in caps.items():
        want = float(c) if theta is None else min(float(c), theta)
        assert abs(got[g].alloc - round(want, 6)) < 1e-9, (g, c, theta)
        assert got[g].alloc <= c + 1e-9
    assert abs(sum(r.alloc for r in got.values()) - budget) < 1e-3


@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 10_000),
                               st.floats(-1e6, 1e6, allow_nan=False)),
                     min_size=1, max_size=60, unique_by=lambda t: t[1]),
       k=st.sampled_from([4, 16]),
       shards=st.sampled_from([2, 5]))
@SLOW
def test_quantile_sketch_sharded_always_equals_whole(spark, rows, k, shards):
    """quantile_sketch property: the sharded fold is bit-identical to
    the unsharded sketch for arbitrary data/k/shard counts, and below-k
    groups keep every row."""
    from pyspark.sql import functions as F
    from hazelcast_jet_spark.operators.sketch import (
        quantile_sketch, quantile_sketch_sharded)

    df = spark.createDataFrame(rows, "g int, key long, v double")
    whole = {r.g: r.qsk for r in
             df.groupBy("g").agg(
                 quantile_sketch("v", "key", k).alias("qsk")).collect()}
    shard = {r.g: r.qsk for r in
             quantile_sketch_sharded(df, ["g"], "v", "key", k=k,
                                     num_shards=shards).collect()}
    assert whole == shard
    sizes = {}
    for g, _key, _v in rows:
        sizes[g] = sizes.get(g, 0) + 1
    for g, sk in whole.items():
        assert len(sk) == min(k, sizes[g])


@given(rows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 500),
                               st.integers(1, 1000)),
                     min_size=1, max_size=50, unique_by=lambda t: t[1]),
       p=st.sampled_from([0.25, 0.5, 0.9]))
@SLOW
def test_top_mass_selection_matches_python_model(spark, rows, p):
    """top_mass_selection vs an exact python walk: same kept set size
    and mass for arbitrary weights; kept mass always reaches p."""
    from fractions import Fraction

    from hazelcast_jet_spark.operators.sampling import top_mass_selection

    df = spark.createDataFrame(rows, "g int, id long, w long")
    got = {r.g: r for r in
           top_mass_selection(df, "g", "w", "id", p=p).collect()}

    groups = {}
    for g, i, w in rows:
        groups.setdefault(g, []).append((i, w))
    fr = Fraction(p)
    for g, items in groups.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        tot = sum(w for _i, w in items)
        before, kept_n, kept_w = 0, 0, 0
        for _i, w in items:
            if Fraction(before) < fr * tot:
                kept_n += 1
                kept_w += w
            before += w
        assert got[g].n_kept == kept_n and got[g].kept_w == kept_w
        assert kept_w * fr.denominator >= fr.numerator * tot


@given(rows=st.lists(
    st.tuples(st.integers(0, 2), st.integers(-50, 50),
              st.integers(1, 20)),
    min_size=1, max_size=40))
@SLOW
def test_weighted_percentiles_match_model(spark, rows):
    """weighted_percentiles == the brute-force cumulative-weight model
    on arbitrary integer-weighted inputs."""
    from hazelcast_jet_spark.operators.profile import weighted_percentiles

    df = spark.createDataFrame(
        [(g, float(v), float(w)) for g, v, w in rows],
        "g int, v double, w double")
    got = {r["group"]: r for r in
           weighted_percentiles(df, "v", "w", "g",
                                qs=(0.25, 0.5, 0.75)).collect()}
    pdf = pd.DataFrame(rows, columns=["g", "v", "w"])
    for g, grp in pdf.groupby("g"):
        per_val = grp.groupby("v")["w"].sum().sort_index()
        tot = float(per_val.sum())
        cum = per_val.cumsum()
        for q, name in ((0.25, "wp_0_25"), (0.5, "wp_0_5"),
                        (0.75, "wp_0_75")):
            want = float(cum.index[(cum >= q * tot).argmax()])
            assert got[int(g)][name] == want, (g, q)
        assert got[int(g)]["total_weight"] == round(tot, 6)


@given(rows=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(1, 10)),
    min_size=1, max_size=30, unique_by=lambda t: (t[0], t[1])))
@SLOW
def test_rrf_fuse_matches_model(spark, rows):
    """rrf_fuse == the dict model: sum of 1/(60+rank) per (query, doc),
    docs absent from one list contribute only the present term."""
    from hazelcast_jet_spark.operators.similarity import rrf_fuse

    a_rows = [(q, d, r) for q, d, r in rows]
    b_rows = [(q, d + 1, r) for q, d, r in rows]       # shifted doc ids
    a = spark.createDataFrame(a_rows or [(0, 0, 1)],
                              "query_id int, corpus_id int, rank int")
    b = spark.createDataFrame(b_rows or [(0, 0, 1)],
                              "query_id int, corpus_id int, rank int")
    got = {(r["query_id"], r["corpus_id"]): r["rrf_score"]
           for r in rrf_fuse(a, b, k=1000).collect()}
    scores: dict = {}
    for q, d, r in a_rows:
        scores[(q, d)] = scores.get((q, d), 0.0) + 1.0 / (60.0 + r)
    for q, d, r in b_rows:
        scores[(q, d)] = scores.get((q, d), 0.0) + 1.0 / (60.0 + r)
    for key, s in scores.items():
        assert got[key] == round(s, 6), key


# ---------------------------------------------------------------------------
# r8 session-2 operators
# ---------------------------------------------------------------------------

@given(pts=st.lists(st.tuples(st.integers(0, 8), st.integers(0, 20)),
                    min_size=1, max_size=50))
@SLOW
def test_pareto_front_matches_naive(spark, pts):
    """Window skyline == O(n²) dominance definition on arbitrary points."""
    from hazelcast_jet_spark.operators.profile import pareto_front

    df = spark.createDataFrame([(s, float(p)) for s, p in pts],
                               "size int, price double")
    got = {(r["size"], r["best_price"], r["n_best"])
           for r in pareto_front(df, "size", "price").collect()}
    best = {}
    for s, p in pts:
        best[s] = min(float(p), best.get(s, float(p)))
    want = set()
    for s, p in best.items():
        if not any(s2 > s and p2 <= p for s2, p2 in best.items()):
            n = sum(1 for s1, p1 in pts if s1 == s and float(p1) == p)
            want.add((s, p, n))
    assert got == want


@given(subj=st.lists(st.tuples(st.integers(0, 6), st.booleans()),
                     min_size=1, max_size=40))
@SLOW
def test_kaplan_meier_matches_python(spark, subj):
    """Product-limit curve == the sequential python fold on arbitrary
    censored duration sets."""
    from hazelcast_jet_spark.operators.timeseries import kaplan_meier

    df = spark.createDataFrame(subj, "duration int, observed boolean")
    got = {r["duration"]: (r["n_risk"], r["n_events"], r["n_censored"],
                           r["survival"])
           for r in kaplan_meier(df, "duration", "observed").collect()}
    want = {}
    s = 1.0
    remaining = len(subj)
    for t in sorted({d for d, _ in subj}):
        d = sum(1 for dd, o in subj if dd == t and o)
        c = sum(1 for dd, o in subj if dd == t and not o)
        s = s * (1.0 - d / remaining)
        want[t] = (remaining, d, c, round(s, 6) + 0.0)
        remaining -= d + c
    assert got == want


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(-5, 5),
                               st.text(alphabet="abcde", max_size=3)),
                     min_size=1, max_size=50),
       perm=st.randoms())
@SLOW
def test_table_fingerprint_invariance_and_sensitivity(spark, rows, perm):
    """Fingerprints are row-order/partitioning-invariant and change when
    any single value changes."""
    from hazelcast_jet_spark.operators.profile import table_fingerprint

    schema = "a int, b int, c string"
    f1 = table_fingerprint(spark.createDataFrame(rows, schema),
                           ["a", "b", "c"]).collect()[0]
    shuffled = list(rows)
    perm.shuffle(shuffled)
    f2 = table_fingerprint(
        spark.createDataFrame(shuffled, schema).repartition(5),
        ["a", "b", "c"]).collect()[0]
    assert f1 == f2
    mutated = list(rows)
    a, b, c = mutated[0]
    mutated[0] = (a, b + 1, c)
    f3 = table_fingerprint(spark.createDataFrame(mutated, schema),
                           ["a", "b", "c"]).collect()[0]
    assert f3["checksum"] != f1["checksum"]


@given(edges=st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                      min_size=1, max_size=30),
       iters=st.integers(1, 3))
@SLOW
def test_label_propagation_matches_python(spark, edges, iters):
    from hazelcast_jet_spark.operators.graph import label_propagation

    es = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    if not es:
        return
    df = spark.createDataFrame(es, "src long, dst long")
    got = {r["node"]: r["label"] for r in
           label_propagation(df, iters=iters).collect()}
    adj = {}
    for a, b in es:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lab = {v: v for v in adj}
    for _ in range(iters):
        lab = {v: min({l: sum(1 for u in ns if lab[u] == l)
                       for l in {lab[u] for u in ns}}.items(),
                      key=lambda kv: (-kv[1], kv[0]))[0]
               for v, ns in adj.items()}
    assert got == lab


@given(subj=st.lists(st.tuples(st.integers(0, 8), st.booleans()),
                     min_size=1, max_size=40))
@SLOW
def test_nelson_aalen_matches_python(spark, subj):
    """H(t) equals the Python fold over sorted distinct durations, and
    exp(-H) >= KM survival pointwise (Jensen: 1-x <= e^-x)."""
    from hazelcast_jet_spark.operators.timeseries import nelson_aalen

    df = spark.createDataFrame(subj, "duration int, observed boolean")
    got = {r["duration"]: r["cum_hazard"] for r in
           nelson_aalen(df, "duration", "observed").collect()}
    h = 0.0
    expect = {}
    for t in sorted({d for d, _ in subj}):
        at = [o for d, o in subj if d == t]
        risk = sum(1 for d, _ in subj if d >= t)
        h += sum(at) / risk
        expect[t] = round(h, 6)
    assert set(got) == set(expect)
    for t in expect:
        assert abs(got[t] - expect[t]) < 1e-9


@given(ps=st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=1,
                   max_size=12), q=st.floats(0.01, 0.2))
@SLOW
def test_fdr_bh_properties(spark, ps, q):
    """BH invariants on arbitrary p-vectors: p_adj >= p, p_adj is
    monotone in the p-ordering, p_adj <= 1, and the rejection set is a
    prefix of the sorted order."""
    from hazelcast_jet_spark.operators.experiment import fdr_bh

    rows = [(f"t{i:02d}", p) for i, p in enumerate(ps)]
    df = spark.createDataFrame(rows, "test string, p double")
    out = sorted(fdr_bh(df, "test", "p", q=q).collect(),
                 key=lambda r: r["rank"])
    for r, (name, p) in zip(out, sorted(rows, key=lambda t: (t[1], t[0]))):
        assert r["p_adj"] <= 1.0 + 1e-12
        assert r["p_adj"] >= round(p, 6) - 1e-9      # adj never shrinks p
    adjs = [r["p_adj"] for r in out]
    assert adjs == sorted(adjs)                      # monotone in rank
    rejected = [r["rejected"] for r in out]
    assert rejected == sorted(rejected, reverse=True)  # prefix property


@given(pts=st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                    min_size=1, max_size=50))
@SLOW
def test_zorder_key_is_injective_and_bounded(spark, pts):
    """Morton codes are unique per (x, y) pair and bounded by 2^16."""
    from hazelcast_jet_spark.operators.bucketing import zorder_key

    df = spark.createDataFrame(pts, "x int, y int").distinct()
    rows = df.select("x", "y",
                     zorder_key(F.col("x"), F.col("y")).alias("z")).collect()
    zs = [r["z"] for r in rows]
    assert len(set(zs)) == len(zs)
    assert all(0 <= z < (1 << 16) for z in zs)


@given(rows=st.lists(st.tuples(st.sampled_from(["A", "B"]),
                               st.sampled_from(["A", "B"]),
                               st.floats(0.0, 1.0, allow_nan=False)),
                     min_size=1, max_size=40))
@SLOW
def test_offline_policy_matches_python(spark, rows):
    from hazelcast_jet_spark.operators.experiment import offline_policy_value

    df = spark.createDataFrame(rows, "lg string, tg string, r double")
    out = offline_policy_value(df, "lg", "tg", "r",
                               propensity=0.5).collect()[0]
    n = len(rows)
    matched = [r for lg, tg, r in rows if lg == tg]
    assert out["n_units"] == n
    assert abs(out["match_rate"] - round(len(matched) / n, 6)) < 1e-6
    assert abs(out["ips_value"]
               - round(sum(matched) * 2.0 / n, 6)) < 1e-6
    if matched:
        assert abs(out["snips_value"]
                   - round(sum(matched) / len(matched), 6)) < 1e-6
    else:
        assert out["snips_value"] is None
