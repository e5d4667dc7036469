"""SourceBuilder tests — the custom-source escape hatch
(SourceBuilder.java:58-331) on Spark 4's Python Data Source API."""

import time

from pyspark.sql import functions as F

from hazelcast_jet_spark.pipeline import Pipeline
from hazelcast_jet_spark.source_builder import SourceBuilder


def test_batch_source_builder(spark):
    """createFn/fillBufferFn contract: each partition runs its own loop,
    buffer.close() ends it; the result is a normal DataFrame (filters
    compose above the scan)."""

    def create(idx):
        return {"partition": idx, "next": 0}

    def fill(state, buf):
        # emit 5 items per call, 20 per partition (fillBufferFn batching)
        for _ in range(5):
            if state["next"] >= 20:
                buf.close()
                return
            buf.add((state["partition"], state["next"]))
            state["next"] += 1

    df = (
        SourceBuilder.batch("jet_test_batch_src")
        .schema("part int, seq int")
        .create(create)
        .fill(fill)
        .distributed(4)
        .build(spark)
    )
    assert df.count() == 80
    got = df.filter(F.col("seq") >= 15).groupBy("part").count().collect()
    assert len(got) == 4 and all(r["count"] == 5 for r in got)


def test_batch_source_via_pipeline(spark):
    """Pipeline.read_from(SourceBuilder...) — the Jet call shape."""
    builder = (
        SourceBuilder.batch("jet_test_pipe_src")
        .schema("v long")
        .fill(lambda state, buf: ([buf.add((i,)) for i in range(10)], buf.close()))
    )
    p = Pipeline.create(spark)
    stage = p.read_from(builder).filter(F.col("v") % 2 == 0)
    assert sorted(r["v"] for r in stage.df.collect()) == [0, 2, 4, 6, 8]


def test_stream_source_builder(spark, tmp_path):
    """Offset-based custom stream: poll_fn emits a replayable range per
    micro-batch (SourceBuilder.stream ≡ SimpleDataSourceStreamReader)."""

    def poll(state, start):
        o = start["offset"]
        if o >= 30:
            return [], {"offset": o}
        rows = [(i, i * 2) for i in range(o, o + 10)]
        return rows, {"offset": o + 10}

    df = (
        SourceBuilder.stream("jet_test_stream_src")
        .schema("seq int, val int")
        .poll(poll)
        .replay(lambda state, start, end: [(i, i * 2) for i in range(start["offset"], end["offset"])])
        .build(spark)
    )
    assert df.isStreaming
    q = (
        df.writeStream.format("memory")
        .queryName("custom_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("custom_stream_out").count() >= 30:
                break
            time.sleep(0.5)
        got = sorted(r["seq"] for r in spark.table("custom_stream_out").collect())
        assert got == list(range(30))
    finally:
        q.stop()
