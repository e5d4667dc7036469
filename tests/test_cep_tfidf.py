"""Pattern matching (reference examples/pattern-matching) and TF-IDF
(reference examples/tf-idf) — operator semantics + plan shape."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_spark.operators.cep import match_sequence
from hazelcast_jet_spark.operators.text import tf_idf


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, _ts(*t) if isinstance(t, tuple) else _ts(t), ty)
         for i, (u, t, ty) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp_ntz, event_type string",
    )


def test_match_sequence_strict_contiguity(spark):
    df = _events(spark, [
        (1, 9, "view"), (1, 10, "click"), (1, 11, "purchase"),   # match @0
        (2, 9, "view"), (2, 10, "error"), (2, 11, "click"), (2, 12, "purchase"),  # gap → no match
        (3, 9, "view"), (3, 10, "click"),                        # incomplete
    ])
    got = match_sequence(df, ["view", "click", "purchase"]).collect()
    assert [(r.user_id, r.start_event_id, r.end_event_id) for r in got] == [(1, 0, 2)]


def test_match_sequence_overlapping_and_within(spark):
    # v c v c p : matches start at the 1st v (span 4h) and the 2nd v (span 2h)
    df = _events(spark, [
        (1, 9, "view"), (1, 10, "click"), (1, 11, "view"),
        (1, 12, "click"), (1, 13, "purchase"),
    ])
    pat = ["view", "click", "purchase"]
    assert len(match_sequence(df, pat).collect()) == 1  # strict: only v@11 c@12 p@13
    got = match_sequence(df, pat, within="1 HOUR").collect()
    assert got == []  # span is 2h > 1h
    got = match_sequence(df, pat, within="3 HOUR").collect()
    assert [r.start_event_id for r in got] == [2]


def test_match_sequence_one_shuffle(spark):
    df = _events(spark, [(1, 9, "view"), (1, 10, "click"), (1, 11, "purchase")])
    plan = match_sequence(df, ["view", "click", "purchase"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # only the keyed window


def test_match_sequence_stream_equals_batch(spark, tmp_path):
    """The streaming state machine (the reference example's actual shape)
    emits exactly the batch operator's matches, across micro-batch
    boundaries: the cross-boundary tail lives in per-key state."""
    import json

    from hazelcast_jet_spark.operators.cep import match_sequence_stream
    from hazelcast_jet_spark.streaming.run import run_to_batch

    rows = [
        (0, 1, "2024-01-01 09:00:00", "view"),
        (1, 1, "2024-01-01 10:00:00", "click"),     # completes in file 2
        (2, 2, "2024-01-01 09:00:00", "view"),
        (3, 1, "2024-01-01 11:00:00", "purchase"),  # file 2: match for user 1
        (4, 2, "2024-01-01 12:00:00", "click"),
        (5, 2, "2024-01-02 13:00:00", "purchase"),  # match but spans > 1 day
    ]
    src = tmp_path / "in"
    src.mkdir()
    for fname, chunk in [("a.json", rows[:3]), ("b.json", rows[3:])]:
        with open(src / fname, "w") as f:
            for eid, uid, ts, ty in chunk:
                f.write(json.dumps({"event_id": eid, "user_id": uid,
                                    "ts": ts, "event_type": ty}) + "\n")
    schema = ("event_id long, user_id long, ts timestamp_ntz, "
              "event_type string")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force the cross-batch boundary
        .json(str(src))
    )
    got = run_to_batch(
        match_sequence_stream(stream, ["view", "click", "purchase"],
                              within="1 DAY"),
        "append",
    ).collect()

    batch = match_sequence(
        spark.createDataFrame(
            [(e, u, datetime.fromisoformat(t), y) for e, u, t, y in rows], schema
        ),
        ["view", "click", "purchase"], within="1 DAY",
    ).collect()

    key = lambda r: (r.user_id, r.start_event_id, r.end_event_id)
    assert sorted(map(key, got)) == sorted(map(key, batch)) == [(1, 0, 3)]


def test_tf_idf_values(spark):
    df = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat fish"), (3, "bird")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.term): (r.tf, r.df, r.tf_idf) for r in tf_idf(df).collect()}
    # N=3; cat in 2 docs, dog/fish/bird in 1
    assert got[(1, "cat")] == (1, 2, 1.5)
    assert got[(2, "cat")] == (2, 2, 3.0)
    assert got[(2, "fish")] == (1, 1, 3.0)
    assert got[(3, "bird")] == (1, 1, 3.0)


def test_tf_idf_broadcasts_doc_count(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    plan = tf_idf(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_tf_idf_log_variant(spark):
    import math
    df = spark.createDataFrame([(1, "x y"), (2, "y")], "doc_id long, text string")
    got = {(r.doc_id, r.term): r.tf_idf for r in tf_idf(df, log_idf=True).collect()}
    assert got[(1, "x")] == pytest.approx(math.log(2.0))
    assert got[(1, "y")] == pytest.approx(0.0)
