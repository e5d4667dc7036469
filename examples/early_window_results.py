"""Early window results — the reference's demo
(/root/reference/examples/early-window-results, TrafficSpeedMonitor:
window(...).setEarlyResultsPeriod(...)).  Here: an update-mode tumbling
window whose partial aggregates are emitted every trigger via
streaming/run.early_results_writer.

Run: python examples/early_window_results.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import TestSources, get_spark
from hazelcast_jet_spark.streaming.run import early_results_writer

spark = get_spark("example-early-window-results")

stream = TestSources.item_stream(2000)(spark)
windowed = (
    stream.withWatermark("timestamp", "0 seconds")
    .groupBy(F.window("timestamp", "10 seconds"), (F.col("value") % 3).alias("lane"))
    .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_speed"))
)

sink_dir = tempfile.mkdtemp(prefix="jet-early-")
q = early_results_writer(windowed, period="1 second").foreachBatch(
    lambda df, epoch: print(f"-- early result (batch {epoch}):", df.count(), "rows")
).option("checkpointLocation", os.path.join(sink_dir, "ckpt")).start()

time.sleep(6)  # several early emissions of still-open windows
q.stop()
