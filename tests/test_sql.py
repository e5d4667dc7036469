"""SQL surface tests — mirrors the reference's SQL suites (SURVEY §5:
SqlAggregateTest/SqlFilterProjectTest shapes + mapping DDL + job DDL)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_spark.sql import JetSqlEngine


@pytest.fixture()
def engine(spark):
    return JetSqlEngine(spark)


def test_create_mapping_and_query(engine, sf_dir, tmp_path):
    engine.sql(f"CREATE MAPPING nat EXTERNAL NAME '{sf_dir}/nation.parquet' TYPE File")
    out = engine.sql("SELECT count(*) AS n FROM nat").collect()
    assert out[0]["n"] == 25
    names = [r["name"] for r in engine.sql("SHOW MAPPINGS").collect()]
    assert names == ["nat"]
    engine.sql("DROP MAPPING nat")
    assert engine.sql("SHOW MAPPINGS").count() == 0


def test_csv_mapping_roundtrip(engine, spark, tmp_path):
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    path = str(tmp_path / "csvdir")
    src.write.option("header", "true").csv(path)
    engine.sql(f"CREATE MAPPING c TYPE File OPTIONS('format'='csv', 'path'='{path}')")
    got = {(r["id"], r["s"]) for r in engine.sql("SELECT id, s FROM c").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_generate_series_tvf(engine):
    out = engine.sql("SELECT sum(v) AS s, count(*) AS n FROM TABLE(generate_series(1, 10))").collect()
    assert out[0]["s"] == 55 and out[0]["n"] == 10


def test_file_table_function(engine, spark, tmp_path):
    path = str(tmp_path / "pq")
    spark.range(5).withColumnRenamed("id", "x").write.parquet(path)
    out = engine.sql(f"SELECT sum(x) AS s FROM TABLE(PARQUET_FILE('{path}'))").collect()
    assert out[0]["s"] == 10


def test_spark_superset_features(engine, sf_dir):
    """Features the reference REJECTS but we support as extensions
    (UnsupportedOperationVisitor.java:340-363; SqlUnsupportedFeaturesTest)."""
    engine.sql(f"CREATE MAPPING orders EXTERNAL NAME '{sf_dir}/orders.parquet' TYPE IMap")
    engine.sql(f"CREATE MAPPING customer EXTERNAL NAME '{sf_dir}/customer.parquet' TYPE IMap")
    # ORDER BY + LIMIT (Jet: unsupported)
    top = engine.sql("SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 3").collect()
    assert len(top) == 3
    # RIGHT/FULL OUTER join (Jet: unsupported)
    full = engine.sql(
        "SELECT count(*) AS n FROM orders FULL OUTER JOIN customer ON o_custkey = c_custkey"
    ).collect()
    assert full[0]["n"] > 0
    # EXISTS semi join (Jet: 'Function EXISTS does not exist')
    n_cust = engine.sql("SELECT count(*) AS n FROM customer").collect()[0]["n"]
    semi = engine.sql(
        "SELECT count(*) AS n FROM customer WHERE EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ).collect()
    assert 0 < semi[0]["n"] <= n_cust
    # GROUPING SETS (absent in Jet)
    gs = engine.sql(
        "SELECT c_mktsegment, c_nationkey, count(*) AS n FROM customer "
        "GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))"
    ).collect()
    assert len(gs) > 5


def test_values_and_insert_into_mapping(engine, spark, tmp_path):
    path = str(tmp_path / "sink_tbl")
    spark.createDataFrame([(0, "seed")], "k int, v string").write.parquet(path)
    engine.sql(f"CREATE MAPPING sink_tbl EXTERNAL NAME '{path}' TYPE IMap")
    out = engine.sql("SELECT * FROM (VALUES (1, 'x'), (2, 'y')) AS t(k, v)").collect()
    assert len(out) == 2


def test_create_job_streaming(engine, spark, tmp_path):
    """CREATE JOB → named StreamingQuery; ALTER JOB SUSPEND; DROP JOB
    (SqlCreateJob.java / JetSqlBackend.java:202-240)."""
    out_path = str(tmp_path / "job_out")
    os.makedirs(out_path, exist_ok=True)
    engine.sql(
        f"CREATE MAPPING job_sink EXTERNAL NAME '{out_path}' (v BIGINT) "
        f"TYPE File OPTIONS('format'='parquet')"
    )
    engine.sql("CREATE JOB myjob AS INSERT INTO job_sink SELECT v FROM TABLE(generate_stream(50))")
    jobs = {r["name"]: r["status"] for r in engine.sql("SHOW JOBS").collect()}
    assert jobs == {"myjob": "RUNNING"}
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            if spark.read.parquet(out_path).count() > 0:
                break
        except Exception:
            pass
        time.sleep(1)
    engine.sql("ALTER JOB myjob SUSPEND")
    assert {r["status"] for r in engine.sql("SHOW JOBS").collect()} == {"SUSPENDED"}
    engine.sql("DROP JOB myjob")
    assert engine.sql("SHOW JOBS").count() == 0
    assert spark.read.parquet(out_path).count() > 0


def test_insert_into_mapping_batch(engine, spark, tmp_path):
    """Batch INSERT INTO a mapping appends to backing storage and
    refreshes the view (SqlExtendedInsert.java)."""
    path = str(tmp_path / "ins_tbl")
    spark.createDataFrame([(1, "a")], "k int, s string").write.parquet(path)
    engine.sql(f"CREATE MAPPING ins_tbl EXTERNAL NAME '{path}' TYPE IMap")
    engine.sql("INSERT INTO ins_tbl SELECT * FROM (VALUES (2, 'b'), (3, 'c')) AS t(k, s)")
    got = {(r["k"], r["s"]) for r in engine.sql("SELECT k, s FROM ins_tbl").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}


def test_create_mapping_parenthesized_types(spark, tmp_path, engine):
    """DECIMAL(10,2) in the column list must not truncate the parse
    (balanced up-to-TYPE capture, ADVICE r1)."""
    import os

    path = str(tmp_path / "decs")
    spark.createDataFrame([(1, 12.34), (2, 56.78)], "id long, amount double") \
        .selectExpr("id", "CAST(amount AS DECIMAL(10,2)) AS amount") \
        .write.parquet(path)
    engine.sql(
        f"CREATE MAPPING decmap (id BIGINT, amount DECIMAL(10,2)) "
        f"TYPE File OPTIONS('format' 'parquet', 'path' '{path}')"
    )
    rows = engine.sql("SELECT id, amount FROM decmap ORDER BY id").collect()
    assert [str(r["amount"]) for r in rows] == ["12.34", "56.78"]
    assert engine.mappings["decmap"].fmt == "parquet"


def test_generate_stream_rewrites_all_occurrences(spark, engine):
    """Each TABLE(generate_stream(n)) gets its own rate-source view."""
    s = engine._rewrite(
        "SELECT * FROM TABLE(generate_stream(5)) a "
        "JOIN TABLE(generate_stream(7)) b ON a.v = b.v"
    )
    assert "generate_stream" not in s
    views = [w for w in s.split() if w.startswith("__stream_fn_")]
    assert len(set(views)) == 2


def test_snapshot_ddl_round_trip(engine, spark, tmp_path):
    """CREATE/SHOW/DROP SNAPSHOT (parse/SqlCreateSnapshot.java:38,
    SqlDropSnapshot.java:37) and restarting a job from a named snapshot
    via CREATE JOB ... OPTIONS('initialSnapshotName'='...')."""
    import shutil

    out_path = str(tmp_path / "snap_out")
    os.makedirs(out_path, exist_ok=True)
    engine.sql(
        f"CREATE MAPPING snap_sink EXTERNAL NAME '{out_path}' (v BIGINT) "
        f"TYPE File OPTIONS('format'='parquet')"
    )
    engine.sql(
        "CREATE JOB snapjob AS INSERT INTO snap_sink "
        "SELECT v FROM TABLE(generate_stream(50))"
    )
    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            if spark.read.parquet(out_path).count() > 0:
                break
        except Exception:
            pass
        time.sleep(1)
    engine.sql("CREATE SNAPSHOT s1 FOR JOB snapjob")
    # export leaves the job running and registers the named snapshot,
    # with lineage: SHOW SNAPSHOTS names the source job
    snaps = {r["name"]: r["source_job"]
             for r in engine.sql("SHOW SNAPSHOTS").collect()}
    assert snaps == {"s1": "snapjob"}
    assert {r["status"] for r in engine.sql("SHOW JOBS").collect()} == {"RUNNING"}
    snap_dir = engine.snapshots["s1"]
    assert os.path.isdir(snap_dir)

    ckpt = engine._job_ckpts["snapjob"]
    engine.sql("ALTER JOB snapjob SUSPEND")
    engine.sql("DROP JOB snapjob")
    shutil.rmtree(ckpt)  # simulate the original job's state being gone
    # a new job seeded from the snapshot starts from the exported state
    engine.sql(
        "CREATE JOB snapjob OPTIONS('initialSnapshotName'='s1') AS "
        "INSERT INTO snap_sink SELECT v FROM TABLE(generate_stream(50))"
    )
    jobs = {r["name"]: (r["status"], r["seeded_from"])
            for r in engine.sql("SHOW JOBS").collect()}
    # lineage: SHOW JOBS records which snapshot seeded the job
    assert jobs == {"snapjob": ("RUNNING", "s1")}
    assert os.path.isdir(ckpt)  # checkpoint was seeded from the snapshot
    engine.sql("ALTER JOB snapjob SUSPEND")
    engine.sql("DROP JOB snapjob")

    engine.sql("DROP SNAPSHOT s1")
    assert engine.sql("SHOW SNAPSHOTS").count() == 0
    assert not os.path.isdir(snap_dir)
    # unknown snapshot / unknown job are rejected
    with pytest.raises(ValueError):
        engine.sql(
            "CREATE JOB j2 OPTIONS('initialSnapshotName'='nope') AS "
            "INSERT INTO snap_sink SELECT v FROM TABLE(generate_stream(50))"
        )
    with pytest.raises(ValueError):
        engine.sql("CREATE SNAPSHOT s2 FOR JOB no_such_job")
