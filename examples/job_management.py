"""Job lifecycle management — the reference's job-management demo
(/root/reference/examples/job-management: submit, suspend, resume,
cancel, snapshot export).  Here: streaming/job.Job wrapping a
Structured Streaming query with a durable checkpoint.

Run: python examples/job_management.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import TestSources, get_spark
from hazelcast_jet_spark.streaming.job import Job, JobStatus

spark = get_spark("example-job-management")
workdir = tempfile.mkdtemp(prefix="jet-job-")


def start(checkpoint_dir):
    counts = (
        TestSources.item_stream(500)(spark)
        .groupBy((F.col("value") % 10).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


job = Job(start, checkpoint_dir=os.path.join(workdir, "ckpt"), name="demo-job")
print("status:", job.status)
time.sleep(2)

job.suspend()
print("after suspend:", job.status)
assert job.status is JobStatus.SUSPENDED

snap = job.export_snapshot("demo-snap")
print("exported snapshot to:", snap)

job.resume()
print("after resume:", job.status)
time.sleep(1)

job.cancel()
print("after cancel:", job.status)
