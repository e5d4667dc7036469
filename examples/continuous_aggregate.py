"""Continuous aggregate (hypertable rollup) — a streaming windowed
aggregation materialized incrementally into a queryable keyed table
(streaming/rollup.py; no Jet analog — Phase-5 extension).

Run: python examples/continuous_aggregate.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark
from hazelcast_jet_spark.streaming.rollup import continuous_aggregate, read_rollup
from hazelcast_jet_spark.streaming.run import read_stream_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-continuous-aggregate")

work = tempfile.mkdtemp(prefix="rollup-example-")
tbl = os.path.join(work, "hourly_rollup")

stream = read_stream_table(spark, sf_dir, "events")
q = continuous_aggregate(
    stream, tbl, "1 day", keys=["event_type"],
    aggs={"n": F.count(F.lit(1)), "sum_value": F.round(F.sum("value"), 2)},
    checkpoint=os.path.join(work, "ckpt"), num_buckets=8,
)
q.awaitTermination(120)

# the rollup is a plain keyed parquet table — query it any time
rollup = read_rollup(spark, tbl, ["window_start", "event_type"], 8)
rollup.orderBy("window_start", "event_type").show(10)
