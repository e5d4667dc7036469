"""Session windows over an event stream
(/root/reference/examples/session-windows, SessionWindowP.java semantics).

Run: python examples/session_windows.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hazelcast_jet_spark import AggregateOperations as agg
from hazelcast_jet_spark import get_spark
from hazelcast_jet_spark.pipeline import Pipeline, WindowDefinition
from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-session-windows")

stage = (
    Pipeline.create(spark)
    .read_from(read_stream_table(spark, sf_dir, "events"))
    .add_timestamps("ts", "10 minutes")
    .grouping_key("user_id")
    .window(WindowDefinition.session("30 minutes"))
    .aggregate(n_events=agg.counting(), total=agg.summing("value"))
)
run_to_batch(stage.df, "complete").orderBy("user_id", "window_start").show(15, truncate=False)
