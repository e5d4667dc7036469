"""CDC ingestion tests — DebeziumCdcSources/CdcSinks semantics
(extensions/cdc-debezium): envelope parsing, keyed apply with
INSERT/UPDATE/DELETE, last-writer-wins, streaming exactly-once apply."""

import json
import os
import time

from pyspark.sql import functions as F

from hazelcast_jet_spark.streaming.cdc import cdc_apply, parse_debezium

SCHEMA = "id bigint, name string, balance bigint"


def _env(op, ts, before, after):
    return json.dumps({"op": op, "ts_ms": ts, "before": before, "after": after})


def test_parse_debezium(spark):
    rows = [
        (_env("c", 1, None, {"id": 1, "name": "a", "balance": 10}),),
        (_env("u", 2, {"id": 1, "name": "a", "balance": 10}, {"id": 1, "name": "a", "balance": 20}),),
        (_env("d", 3, {"id": 1, "name": "a", "balance": 20}, None),),
        (_env("r", 0, None, {"id": 2, "name": "b", "balance": 5}),),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = parse_debezium(df, SCHEMA).collect()
    assert [r["op"] for r in out] == ["INSERT", "UPDATE", "DELETE", "SYNC"]
    assert out[1]["after"]["balance"] == 20 and out[2]["after"] is None


def test_cdc_apply_batch(spark, tmp_path):
    tbl = str(tmp_path / "accounts")
    batch1 = spark.createDataFrame(
        [
            (_env("r", 0, None, {"id": 1, "name": "a", "balance": 10}),),
            (_env("r", 0, None, {"id": 2, "name": "b", "balance": 5}),),
        ],
        "value string",
    )
    cdc_apply(parse_debezium(batch1, SCHEMA), tbl, ["id"])
    got = {r["id"]: r["balance"] for r in spark.read.parquet(tbl).collect()}
    assert got == {1: 10, 2: 5}

    # update id=1 twice (last-writer-wins), delete id=2, insert id=3
    batch2 = spark.createDataFrame(
        [
            (_env("u", 10, None, {"id": 1, "name": "a", "balance": 11}),),
            (_env("u", 20, None, {"id": 1, "name": "a", "balance": 12}),),
            (_env("d", 15, {"id": 2, "name": "b", "balance": 5}, None),),
            (_env("c", 5, None, {"id": 3, "name": "c", "balance": 7}),),
        ],
        "value string",
    )
    cdc_apply(parse_debezium(batch2, SCHEMA), tbl, ["id"])
    got = {r["id"]: r["balance"] for r in spark.read.parquet(tbl).collect()}
    assert got == {1: 12, 3: 7}


def test_cdc_apply_streaming(spark, tmp_path):
    """File-streamed Debezium JSON applied via foreachBatch (the CREATE
    JOB shape for CDC pipelines)."""
    src = str(tmp_path / "cdc_src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    with open(src + "/f1.json", "w") as f:
        f.write(_env("c", 1, None, {"id": 1, "name": "x", "balance": 1}) + "\n")
        f.write(_env("c", 2, None, {"id": 2, "name": "y", "balance": 2}) + "\n")

    stream = spark.readStream.schema("value string").text(src)
    q = cdc_apply(parse_debezium(stream, SCHEMA), tbl, ["id"], checkpoint=ckpt)
    q.awaitTermination()

    time.sleep(1.1)
    with open(src + "/f2.json", "w") as f:
        f.write(_env("u", 3, None, {"id": 2, "name": "y", "balance": 22}) + "\n")
        f.write(_env("d", 4, {"id": 1, "name": "x", "balance": 1}, None) + "\n")
    stream = spark.readStream.schema("value string").text(src)
    q = cdc_apply(parse_debezium(stream, SCHEMA), tbl, ["id"], checkpoint=ckpt)
    q.awaitTermination()

    got = {r["id"]: r["balance"] for r in spark.read.parquet(tbl).collect()}
    assert got == {2: 22}
