"""Experimentation & lifecycle analytics — the round-8 session-2
operators composed as an A/B readout plus the lifecycle reports around
it:

1. deterministic assignment + CUPED variance-reduced arm means,
2. which channels drive the conversions (first/last-touch attribution),
3. did users convert fast enough (24h windowed funnel),
4. where journeys start/end and bounce (session entry/exit report),
5. how long users live (Kaplan-Meier survival with censoring),
6. is traffic calendar-driven (seasonality strength) and what does the
   daily candle look like (OHLC downsample).

No reference analog as a surface — Jet users hand-build these as keyed
aggregate DAGs; here each is one declarative operator.

Run: python examples/experimentation.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.experiment import (
    ab_assign,
    cuped_adjusted_means,
    touch_attribution,
)
from hazelcast_jet_spark.operators.timeseries import (
    funnel_counts,
    kaplan_meier,
    ohlc_resample,
    seasonality_strength,
    session_entry_exit,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-experimentation")

events = load_table(spark, sf_dir, "events")
orders = load_table(spark, sf_dir, "orders")

# 1. CUPED A/B readout: pre-1996 spend is the covariate
pre = F.when(F.to_date("o_orderdate") < F.lit("1996-01-01").cast("date"),
             F.col("o_totalprice"))
post = F.when(F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"),
              F.col("o_totalprice"))
units = (orders.groupBy("o_custkey")
         .agg(F.coalesce(F.sum(pre.cast("decimal(28,12)")).cast("double"),
                         F.lit(0.0)).alias("pre"),
              F.coalesce(F.sum(post.cast("decimal(28,12)")).cast("double"),
                         F.lit(0.0)).alias("post"))
         .withColumn("arm", ab_assign(F.col("o_custkey"), "demo")))
print("=== CUPED adjusted arm means ===")
cuped_adjusted_means(units, "arm", "pre", "post").show()

# 2. channel attribution for purchases
print("=== first/last-touch attribution ===")
touch_attribution(events).show()

# 3. funnel: view -> click -> purchase within 24h of the first view
print("=== 24h windowed funnel ===")
funnel_counts(events, ["view", "click", "purchase"],
              within_seconds=86400).orderBy("stage").show()

# 4. session entry/exit/bounce report
print("=== session bounce report ===")
session_entry_exit(events).show()

# 5. Kaplan-Meier user-lifetime curve (final week = censored)
span = events.groupBy("user_id").agg(
    F.min(F.to_date("ts")).alias("f"), F.max(F.to_date("ts")).alias("l"))
mx = span.agg(F.max("l").alias("m"))
subj = span.crossJoin(F.broadcast(mx)).select(
    F.datediff("l", "f").alias("duration"),
    (F.col("l") <= F.date_sub("m", 7)).alias("observed"))
print("=== Kaplan-Meier survival (first rows) ===")
kaplan_meier(subj, "duration", "observed").show(10)

# 6. seasonality screen + daily OHLC candles
print("=== weekly-seasonality strength ===")
seasonality_strength(events, "event_type", "ts").show()
print("=== daily OHLC (first rows) ===")
ohlc_resample(events, "event_type", "ts", "value", "event_id").show(10)
