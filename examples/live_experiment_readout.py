"""LIVE experiment readout — the always-on surface of the batch
experiment lane (examples/experimentation.py reads the experiment at
rest; this watches it RUN):

1. readStream over the events table (stands in for the tracking
   topic a production experiment emits to),
2. ONE complete-mode streaming aggregation per unit
   (experiment.experiment_stream_counters) — state is one row per
   user, the streaming-exact-dedup state class; switch the session to
   RocksDB state (streaming.run.use_rocksdb_state) at billions of
   units,
3. batch-side fold of the final counters
   (experiment.experiment_readout_fold): md5 arm assignment, per-arm
   conversions / rates / exact mean events-per-user, the pooled
   two-proportion z, the sample-ratio-mismatch z, and the significance
   flag.

The significance flag refreshing every micro-batch is PEEKING — the
false-positive inflation experiment.peeking_trace visualizes; consumers
pre-register the horizon and read the flag once.  The SAME counter+fold
pair runs on a batch DataFrame unchanged, and this example pins the
two lanes equal, so the live dashboard and the end-of-experiment report
can never disagree.

Run: python examples/live_experiment_readout.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.experiment import (
    experiment_readout_fold,
    experiment_stream_counters,
)
from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-live-experiment-readout")
spark.sparkContext.setLogLevel("ERROR")

# live lane: stream -> per-unit counters -> per-arm readout
stream = read_stream_table(spark, sf_dir, "events")
counters = run_to_batch(
    experiment_stream_counters(stream, "user_id", "ts", "event_type",
                               "purchase", "value", 95.0),
    "complete")
print("live experiment readout (from the stream):")
readout = experiment_readout_fold(counters.localCheckpoint(), seed="exp42")
readout.show(truncate=False)

# at-rest lane: identical operators over the batch reader
batch = load_table(spark, sf_dir, "events")
batch_readout = experiment_readout_fold(
    experiment_stream_counters(batch, "user_id", "ts", "event_type",
                               "purchase", "value", 95.0),
    seed="exp42")
stream_rows = [tuple(r) for r in readout.collect()]
batch_rows = [tuple(r) for r in batch_readout.collect()]
print(f"streaming == batch: {stream_rows == batch_rows} "
      f"({len(stream_rows)} arms)")
assert stream_rows == batch_rows
