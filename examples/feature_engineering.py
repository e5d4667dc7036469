"""Per-key time-series feature engineering — the event-log half of a
training-data pipeline (operators/timeseries.py + operators/windows.py):

1. lag / gap / rolling features per user (one window exchange serves
   them all),
2. sessionization by inactivity gap (lag + running-sum composition),
3. EWMA smoothing (applyInPandas — the recurrence SQL windows cannot
   express),
4. sliding-window aggregates via the two-level frame-partial plan
   (the incremental-sliding-window cost model: the size/slide explode
   applies to frames, not raw rows).

Run: python examples/feature_engineering.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.timeseries import (
    event_features, ewma, sessionize)
from hazelcast_jet_spark.operators.windows import sliding_agg

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-feature-engineering")

events = load_table(spark, sf_dir, "events")

feats = event_features(events, rolling_n=5)
print("lag/gap/rolling features:")
feats.select("event_id", "user_id", "seq", "prev_value", "gap_seconds",
             "rolling_sum_5").orderBy("user_id", "seq").show(5)

sessions = sessionize(events, gap="30 minutes", id_col="event_id")
print("sessions per user:")
(sessions.groupBy("user_id")
 .agg(F.countDistinct("session_id").alias("n_sessions"))
 .orderBy("user_id").show(5))

smooth = ewma(events, "user_id", "ts", "value", alpha=0.3,
              id_col="event_id")
print("EWMA-smoothed values:")
smooth.select("user_id", "ts", "value", "ewma").orderBy("user_id", "ts").show(5)

dec = F.col("value").cast("decimal(18,6)")
win = sliding_agg(events, "ts", 7200, 3600, ["event_type"],
                  {"n": F.count(F.lit(1)), "s": F.sum(dec)},
                  {"n": F.sum("n"), "s": F.sum("s")})
print("2h/1h sliding windows (two-level plan):")
win.orderBy("event_type", "window_start_epoch").show(5)

# SCD2: collapse each user's event-type change log into validity
# intervals [valid_from, valid_to) — the warehouse history table a CDC
# stream would maintain, built batch-side in one ordered window
from hazelcast_jet_spark.operators.timeseries import (  # noqa: E402
    _epoch_seconds, scd2_intervals)

ev = events.select("user_id", "event_id", "event_type",
                   _epoch_seconds(events, "ts").alias("sec"))
print("SCD2 state intervals (first user):")
(scd2_intervals(ev, "user_id", "sec", "event_type", "event_id")
 .orderBy("user_id", "version").show(5))
