"""CDC ingestion tests — DebeziumCdcSources/CdcSinks semantics
(extensions/cdc-debezium): envelope parsing, keyed apply with
INSERT/UPDATE/DELETE, last-writer-wins, streaming exactly-once apply."""

import json
import os
import time

import pytest
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


def _bucket_files(tbl):
    """{bucket_dir: {(filename, inode)}} for every live bucket partition."""
    out = {}
    for e in os.listdir(tbl):
        if e.startswith("_kb="):
            d = os.path.join(tbl, e)
            out[e] = {(f, os.stat(os.path.join(d, f)).st_ino)
                      for f in os.listdir(d) if not f.startswith(".")}
    return out


def test_keyed_table_selective_rewrite(spark, tmp_path):
    """The 100 TB CDC property: a batch touching one key rewrites only that
    key's bucket partition — every other bucket's files are bit-identical
    (same inodes), not rewritten copies."""
    from hazelcast_jet_spark.storage import KeyedParquetTable

    tbl = str(tmp_path / "kt")
    t = KeyedParquetTable(tbl, ["id"], num_buckets=8)
    base = spark.range(0, 400).select(
        F.col("id"), (F.col("id") * 10).alias("balance"))
    t.overwrite(base)
    before = _bucket_files(tbl)
    assert len(before) == 8

    one = spark.createDataFrame([(7, 777)], "id long, balance long")
    rewritten = t.apply(one, one.select("id"))
    assert len(rewritten) == 1

    after = _bucket_files(tbl)
    changed = {d for d in before if before[d] != after.get(d)}
    assert changed == {f"_kb={rewritten[0]}"}, (changed, rewritten)

    got = {r["id"]: r["balance"] for r in t.read(spark).collect()}
    assert got[7] == 777 and got[8] == 80 and len(got) == 400


def test_keyed_table_delete_and_recovery(spark, tmp_path):
    """Deletes drop keys; a simulated crash between the two swap renames
    (bucket moved to trash, new not yet live) is healed by _recover."""
    import shutil

    from hazelcast_jet_spark.storage import KeyedParquetTable

    tbl = str(tmp_path / "kt2")
    t = KeyedParquetTable(tbl, ["id"], num_buckets=4)
    t.overwrite(spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "id long, balance long"))

    # delete id=3 (changed_keys contains it, upserts do not)
    empty = spark.createDataFrame([], "id long, balance long")
    t.apply(empty, spark.createDataFrame([(3,)], "id long"))
    got = {r["id"] for r in t.read(spark).collect()}
    assert 3 not in got and len(got) == 19

    # simulate crash: move one bucket to a trash dir and delete it live
    victim = next(e for e in os.listdir(tbl) if e.startswith("_kb="))
    trash = os.path.join(tbl, ".trash-crashtest")
    os.makedirs(trash)
    os.rename(os.path.join(tbl, victim), os.path.join(trash, victim))
    assert not os.path.isdir(os.path.join(tbl, victim))

    t._recover()
    assert os.path.isdir(os.path.join(tbl, victim))
    assert not os.path.isdir(trash)
    assert len({r["id"] for r in t.read(spark).collect()}) == 19


def test_map_with_merging_selective(spark, tmp_path):
    """Sinks.mapWithMerging on the keyed table: merge resolves conflicts,
    untouched buckets keep their files."""
    from hazelcast_jet_spark.sinks import Sinks

    tbl = str(tmp_path / "merge_tbl")
    sink = Sinks.map_with_merging(
        tbl, ["id"],
        lambda cur, new: (
            cur.unionByName(new)
            .groupBy("id").agg(F.sum("balance").alias("balance"))
        ),
        num_buckets=8,
    )
    sink(spark.createDataFrame([(i, 100) for i in range(40)], "id long, balance long"))
    before = _bucket_files(tbl)
    sink(spark.createDataFrame([(5, 1)], "id long, balance long"))
    after = _bucket_files(tbl)

    got = {r["id"]: r["balance"] for r in spark.read.parquet(tbl).collect()}
    assert got[5] == 101 and got[6] == 100 and len(got) == 40
    assert sum(1 for d in before if before[d] != after.get(d)) == 1


def test_map_with_updating_insert_update_delete(spark, tmp_path):
    """Sinks.mapWithUpdating (Sinks.java:481): absent key -> insert,
    present -> update_fn(old, item), omitted batch key -> REMOVED (the
    updateFn-returns-null branch) — distinct from mapWithMerging, which
    retains omitted keys.  Untouched keys never move."""
    from hazelcast_jet_spark.sinks import Sinks

    tbl = str(tmp_path / "upd_tbl")

    def update(cur, new):
        if cur is None:
            return new
        # add the delta to the old balance; a negative result deletes
        # the key (returns-null semantics via omission)
        merged = (cur.withColumnRenamed("balance", "old")
                  .join(new, "id", "full")
                  .select("id", (F.coalesce("old", F.lit(0))
                                 + F.coalesce("balance", F.lit(0))).alias("balance")))
        return merged.filter(F.col("balance") >= 0)

    sink = Sinks.map_with_updating(tbl, ["id"], update, num_buckets=8)
    sink(spark.createDataFrame([(i, 100) for i in range(10)],
                               "id long, balance long"))
    # batch: id=3 updated (+5), id=4 driven negative (deleted),
    # id=50 inserted; everything else untouched
    sink(spark.createDataFrame([(3, 5), (4, -200), (50, 7)],
                               "id long, balance long"))
    got = {r["id"]: r["balance"] for r in spark.read.parquet(tbl).collect()}
    assert got[3] == 105
    assert 4 not in got
    assert got[50] == 7
    assert got[0] == 100 and len(got) == 10


def test_files_sink_rolling(spark, tmp_path):
    """FileSinkBuilder rollByDate/rollByFileSize analog: dated
    subdirectories from the event-time column + bounded per-file record
    counts via maxRecordsPerFile."""
    import glob as _glob

    from hazelcast_jet_spark.sinks import Sinks

    out = str(tmp_path / "rolled")
    df = spark.createDataFrame(
        [(i, f"2024-01-{1 + i % 3:02d}") for i in range(60)],
        "v long, day string").select(
            "v", F.to_timestamp("day").alias("ts"))
    Sinks.files(out, fmt="parquet", roll_by_date="yyyy-MM-dd",
                date_col="ts", max_records_per_file=5)(df)
    days = sorted(os.path.basename(d) for d in _glob.glob(out + "/roll=*"))
    assert days == ["roll=2024-01-01", "roll=2024-01-02", "roll=2024-01-03"]
    for d in days:
        for f in _glob.glob(f"{out}/{d}/*.parquet"):
            assert spark.read.parquet(f).count() <= 5
    back = spark.read.parquet(out)
    assert back.count() == 60 and set(back.columns) == {"v", "ts", "roll"}


def test_map_with_entry_processor(spark, tmp_path):
    """mapWithEntryProcessor: per-key processor sees current + incoming,
    returned rows replace their keys, untouched buckets keep their files."""
    from hazelcast_jet_spark.sinks import Sinks

    tbl = str(tmp_path / "ep_tbl")

    def processor(current, incoming):
        if current is None:
            return incoming
        cur = current.join(incoming.select("id"), "id", "inner") \
                     .withColumnsRenamed({"balance": "old_balance"})
        return (
            incoming.join(cur, "id", "left")
            .select("id", (F.coalesce(F.col("old_balance"), F.lit(0))
                           + F.col("balance")).alias("balance"))
        )

    sink = Sinks.map_with_entry_processor(tbl, ["id"], processor, num_buckets=8)
    sink(spark.createDataFrame([(i, 10) for i in range(40)], "id long, balance long"))
    before = _bucket_files(tbl)
    sink(spark.createDataFrame([(3, 5)], "id long, balance long"))
    after = _bucket_files(tbl)

    got = {r["id"]: r["balance"] for r in spark.read.parquet(tbl).collect()}
    assert got[3] == 15 and got[4] == 10 and len(got) == 40
    assert sum(1 for d in before if before[d] != after.get(d)) == 1


def test_socket_sink(spark):
    """Sinks.socket: newline-delimited rows arrive at a TCP listener."""
    import socket as socklib
    import threading

    from hazelcast_jet_spark.sinks import Sinks

    received = []
    server = socklib.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def accept():
        conn, _ = server.accept()
        with conn:
            buf = b""
            while True:
                chunk = conn.recv(4096)
                if not chunk:
                    break
                buf += chunk
            received.append(buf.decode())

    t = threading.Thread(target=accept, daemon=True)
    t.start()
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    Sinks.socket("127.0.0.1", port)(df)
    t.join(timeout=10)
    server.close()
    assert received and sorted(received[0].strip().split("\n")) == ["1,a", "2,b"]


def test_reliable_topic_sink(spark, tmp_path):
    """Sinks.reliableTopic: append-only durable log, re-readable."""
    from hazelcast_jet_spark.sinks import Sinks

    topic = str(tmp_path / "topic")
    sink = Sinks.reliable_topic(topic)
    sink(spark.createDataFrame([(1,)], "v int"))
    sink(spark.createDataFrame([(2,)], "v int"))
    assert sorted(r["v"] for r in spark.read.json(topic).collect()) == [1, 2]


def test_keyed_table_batch_atomicity_roll_forward(spark, tmp_path):
    """A committed staging dir (manifest present) is rolled FORWARD by
    recovery even when some buckets already swapped and others did not —
    the table is never left half-applied for non-replayed batch callers."""
    import json as jsonlib
    import shutil

    from hazelcast_jet_spark.storage import BUCKET_COL, KeyedParquetTable

    tbl = str(tmp_path / "kt3")
    t = KeyedParquetTable(tbl, ["id"], num_buckets=4)
    t.overwrite(spark.createDataFrame(
        [(i, 0) for i in range(40)], "id long, balance long"))

    # build a committed-but-unswapped staging dir by hand: new content for
    # every bucket (balance=1), manifest written, NO swap performed
    staging = os.path.join(tbl, ".staging-crash")
    (
        spark.createDataFrame([(i, 1) for i in range(40)], "id long, balance long")
        .withColumn(BUCKET_COL, t.bucket_of())
        .write.partitionBy(BUCKET_COL).parquet(staging)
    )
    bks = sorted(int(e.split("=")[1]) for e in os.listdir(staging)
                 if e.startswith(f"{BUCKET_COL}="))
    with open(os.path.join(staging, "_commit.json"), "w") as f:
        jsonlib.dump({"buckets": bks, "with_data": bks}, f)
    # simulate a partial swap: bucket[0] already swapped before the crash
    b0 = bks[0]
    shutil.rmtree(os.path.join(tbl, f"{BUCKET_COL}={b0}"))
    os.rename(os.path.join(staging, f"{BUCKET_COL}={b0}"),
              os.path.join(tbl, f"{BUCKET_COL}={b0}"))

    t._recover()
    got = {r["balance"] for r in t.read(spark).collect()}
    assert got == {1}, got  # ALL buckets post-batch, none half-applied
    assert not any(e.startswith(".staging") for e in os.listdir(tbl))

    # an UNcommitted staging (no manifest) is discarded wholesale
    staging2 = os.path.join(tbl, ".staging-uncommitted")
    os.makedirs(os.path.join(staging2, f"{BUCKET_COL}=0"))
    t._recover()
    assert not os.path.isdir(staging2)
    assert {r["balance"] for r in t.read(spark).collect()} == {1}


def test_keyed_table_rejects_object_store_paths():
    """The rename-based swap protocol is not atomic on object stores; such
    paths must fail fast with a pointer to the manifest commit mode."""
    from hazelcast_jet_spark.storage import KeyedParquetTable

    for scheme in ("s3a", "s3", "gs", "abfs", "wasbs"):
        with pytest.raises(ValueError, match="object-store"):
            KeyedParquetTable(f"{scheme}://bucket/tbl", ["id"])
    # local and HDFS-like paths stay accepted
    KeyedParquetTable("/tmp/x", ["id"])
    KeyedParquetTable("file:///tmp/x", ["id"])
    KeyedParquetTable("hdfs://nn/tbl", ["id"])


def test_keyed_table_writer_lock(spark, tmp_path):
    """Two concurrent writers to one table: the second live writer fails
    fast instead of racing the swap; a lock left by a dead pid is broken."""
    from hazelcast_jet_spark.storage import ConcurrentWriterError, KeyedParquetTable

    tbl = str(tmp_path / "locked")
    t = KeyedParquetTable(tbl, ["id"], num_buckets=4)
    t.overwrite(spark.createDataFrame([(1, 10)], "id long, v long"))
    up = spark.createDataFrame([(1, 11)], "id long, v long")

    # simulate a live concurrent writer (pid 1 is always alive)
    os.makedirs(tbl, exist_ok=True)
    with open(os.path.join(tbl, ".writer.lock"), "w") as f:
        f.write("1")
    with pytest.raises(ConcurrentWriterError, match="single-writer"):
        t.apply(up, up.select("id"))

    # stale lock from a dead process is broken and the batch applies
    with open(os.path.join(tbl, ".writer.lock"), "w") as f:
        f.write("999999999")
    t.apply(up, up.select("id"))
    assert {(r["id"], r["v"]) for r in t.read(spark).collect()} == {(1, 11)}
    assert not os.path.exists(os.path.join(tbl, ".writer.lock"))


def test_keyed_table_key_dtype_canonicalized(spark, tmp_path):
    """A later batch whose key column arrives as INT (table stored BIGINT)
    must hash each logical key to the SAME bucket — otherwise the upsert
    silently retains the old row beside the new one (ADVICE r2)."""
    from hazelcast_jet_spark.storage import KeyedParquetTable

    tbl = str(tmp_path / "dtypes")
    t = KeyedParquetTable(tbl, ["id"], num_buckets=8)
    t.overwrite(spark.createDataFrame([(i, 0) for i in range(20)], "id long, v long"))

    up_int = spark.createDataFrame([(3, 99), (7, 99)], "id int, v long")
    up_int = up_int.withColumn("id", up_int["id"].cast("int"))
    t.apply(up_int.withColumn("id", F.col("id").cast("long")).select("id", "v"),
            up_int.select("id"))  # changed_keys still INT-typed
    rows = {(r["id"], r["v"]) for r in t.read(spark).collect()}
    assert (3, 99) in rows and (7, 99) in rows
    assert (3, 0) not in rows and (7, 0) not in rows
    assert len(rows) == 20  # no duplicate logical keys
