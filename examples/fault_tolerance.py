"""Fault tolerance / exactly-once — the reference's demo
(/root/reference/examples/fault-tolerance: kill a member mid-job, the
snapshot replays, every event counts once).  Spark's checkpoint + WAL is
the Chandy-Lamport analog (SURVEY §2.12): this example stops a streaming
job mid-input, delivers more input while it is down, restarts it from
the SAME checkpoint, and shows the sink holds every row exactly once.

Run: python examples/fault_tolerance.py
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hazelcast_jet_spark import get_spark

spark = get_spark("example-fault-tolerance")

work = tempfile.mkdtemp(prefix="jet_spark_ft_")
src, out, ckpt = (os.path.join(work, d) for d in ("src", "out", "ckpt"))
os.makedirs(src)
spark.range(0, 100).write.parquet(src + "/batch1")
schema = spark.read.parquet(src + "/batch1").schema


def start_job():
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src + "/batch*")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)   # the distributed snapshot
        .trigger(availableNow=True)
        .start()
    )


q = start_job()
q.awaitTermination()          # drains batch1, then "the cluster dies"
time.sleep(1.1)
spark.range(100, 250).write.parquet(src + "/batch2")  # arrives while down

q = start_job()               # restart from the SAME checkpoint
q.awaitTermination()

got = sorted(r["id"] for r in spark.read.parquet(out).collect())
assert got == list(range(250)), f"lost/duplicated rows: {len(got)}"
print(f"exactly-once across restart: {len(got)} rows, no gaps, no dups")
shutil.rmtree(work, ignore_errors=True)
