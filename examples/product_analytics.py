"""Product-analytics pipeline over an event log — the round-8 behavioral
operators composed the way a growth/analytics team actually runs them:

1. who converts and how long it takes (funnel + conversion lag),
2. what users actually do (top multi-hop paths, session co-occurrence),
3. how predictable each state is (transition entropy),
4. when traffic misbehaves (calendar-seasonal anomalies, Holt trend),
5. who the users are (RFM segmentation over the orders table).

No reference analog as a surface — Jet users hand-build each as a DAG of
keyed aggregates; here every step is one declarative operator sharing
the same keyed exchange shapes.

Run: python examples/product_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.profile import rfm_segments
from hazelcast_jet_spark.operators.timeseries import (
    conversion_lag_stats,
    funnel_counts,
    holt_linear,
    seasonal_baseline_anomalies,
    session_type_cooccurrence,
    top_event_paths,
    transition_entropy,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-product-analytics")

events = load_table(spark, sf_dir, "events")
orders = load_table(spark, sf_dir, "orders")

# 1. conversion: who reaches each stage, and how long view -> purchase takes
print("funnel (view -> purchase):")
funnel_counts(events, ["view", "purchase"]).show()
print("time-to-convert:")
conversion_lag_stats(events, "view", "purchase").show()

# 2. behavior: the common flows and what co-occurs inside a session
print("top 3-step event paths:")
top_event_paths(events, length=3, k=5).show(truncate=False)
print("session-basket co-occurrence (lift over independence):")
session_type_cooccurrence(events).show(5)

# 3. predictability: which states have deterministic successors
print("per-state transition entropy:")
transition_entropy(events).show()

# 4. traffic health: seasonal-baseline anomalies + trend-aware smoothing
print("(dow, hour)-baseline anomaly cells (|z| > 1.5):")
seasonal_baseline_anomalies(events, z_threshold=1.5).show(5)
daily = (events.groupBy("event_type", F.to_date("ts").alias("day"))
         .agg(F.count(F.lit(1)).alias("n")))
print("Holt level+trend of the daily rate (last rows per type):")
holt_linear(daily, "event_type", "day", "n") \
    .orderBy("event_type", "day").show(5)

# 5. who the customers are: RFM cells over the orders table
print("RFM segmentation (r=f=m=1 is best):")
rfm_segments(orders, "o_custkey", "o_orderdate", "o_totalprice") \
    .show(5)
# NOTE: no spark.stop() — examples run in-process in tests/test_examples.py
# against a shared session (get_spark -> getOrCreate).
