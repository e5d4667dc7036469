"""Sliding-window trade monitor — the reference's demo
(/root/reference/examples/sliding-windows, TradeMonitor: a 1-second
window sliding every 10 ms of trade counts per ticker).  Here: the
events table replayed as a timestamped stream through a 2-hour window
sliding every hour, counting and summing per event type — the same
two-stage (partial, then final) windowed aggregation Jet's
SlidingWindowP runs, executed natively by Structured Streaming.

Run: python examples/sliding_windows.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark
from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-sliding-windows")

events = read_stream_table(spark, sf_dir, "events")  # replay parquet as a stream
# addTimestamps(lag) analog; watermarks need TIMESTAMP, the table stores
# tz-independent TIMESTAMP_NTZ (value-preserving cast under UTC session)
events = events.withColumn("ts", F.col("ts").cast("timestamp"))
windowed = (
    events.withWatermark("ts", "10 minutes")
    .groupBy(F.window("ts", "2 hours", "1 hour"), "event_type")
    .agg(F.count(F.lit(1)).alias("trades"), F.sum("value").alias("volume"))
)
out = run_to_batch(windowed, "append").select(
    F.date_format("window.start", "yyyy-MM-dd HH:mm").alias("window_start"),
    "event_type", "trades", F.round("volume", 2).alias("volume"),
)
out.orderBy("window_start", "event_type").show(10)
print(f"{out.count()} (window, type) rows from the stream replay")
