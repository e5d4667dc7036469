"""Avro container-file support (reference extensions/avro AvroSources/
AvroSinks; SURVEY §2.1 row 8 — previously 'untested: no avro fixture')."""

import math

import pytest

from hazelcast_jet_spark import avro_io

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "payload", "type": "bytes"},
    ],
}

RECORDS = [
    {"id": 1, "name": "alpha", "score": 1.5, "ok": True, "payload": b"\x00\x01"},
    {"id": -2, "name": None, "score": -0.25, "ok": False, "payload": b""},
    {"id": 3, "name": "y" * 200, "score": math.pi, "ok": True, "payload": b"zz"},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_local_round_trip(tmp_path, codec):
    p = str(tmp_path / f"t_{codec}.avro")
    avro_io.write_avro(p, RECORDS, SCHEMA, codec=codec)
    schema, got = avro_io.read_avro(p)
    assert schema["fields"] == SCHEMA["fields"]
    assert got == RECORDS


def test_zigzag_longs_edge_values(tmp_path):
    vals = [0, 1, -1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**62, -(2**62)]
    schema = {"type": "record", "name": "r",
              "fields": [{"name": "v", "type": "long"}]}
    p = str(tmp_path / "longs.avro")
    avro_io.write_avro(p, [{"v": v} for v in vals], schema)
    _, got = avro_io.read_avro(p)
    assert [r["v"] for r in got] == vals


def test_spark_reads_avro_fixture(spark, tmp_path):
    """FileSources.files(fmt='avro') — a distributed read of container
    files, one input partition per file."""
    from hazelcast_jet_spark.sources import FileSources

    d = tmp_path / "avrodir"
    d.mkdir()
    avro_io.write_avro(str(d / "a.avro"), RECORDS[:2], SCHEMA, codec="deflate")
    avro_io.write_avro(str(d / "b.avro"), RECORDS[2:], SCHEMA)
    df = FileSources.files(str(d), fmt="avro")(spark)
    assert df.schema.simpleString() == (
        "struct<id:bigint,name:string,score:double,ok:boolean,payload:binary>"
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1, -2, 3}
    assert rows[-2]["name"] is None and rows[1]["payload"] == bytearray(b"\x00\x01")
    assert df.rdd.getNumPartitions() == 2  # one partition per file


def test_spark_writes_avro(spark, tmp_path):
    """df.write.format('jet-avro') round-trips through the writer path."""
    avro_io.register(spark)
    out = str(tmp_path / "out")
    df = spark.createDataFrame(
        [(1, "x", 0.5), (2, None, 1.5), (3, "z", -2.0)], "id long, s string, v double"
    )
    df.repartition(2).write.format("jet-avro").mode("overwrite").save(out)
    back = avro_io.load(spark, out)
    assert {tuple(r) for r in back.collect()} == {(1, "x", 0.5), (2, None, 1.5), (3, "z", -2.0)}


def test_sql_avro_file_table_function(spark, tmp_path):
    """TABLE(AVRO_FILE('...')) — FileTableFunction parity for avro."""
    from hazelcast_jet_spark.sql import JetSqlEngine

    p = str(tmp_path / "docs.avro")
    avro_io.write_avro(p, RECORDS, SCHEMA)
    eng = JetSqlEngine(spark)
    got = eng.sql(
        f"SELECT id, score FROM TABLE(AVRO_FILE('{p}')) WHERE ok ORDER BY id"
    ).collect()
    assert [(r["id"], r["score"]) for r in got] == [(1, 1.5), (3, math.pi)]
