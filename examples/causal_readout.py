"""Causal & counterfactual readouts — the round-9 session-2 operators
composed as the decision pipeline an experimentation platform runs
AROUND the primary A/B readout:

1. was the randomization healthy (covariate balance / SMD audit),
2. what would a staged rollout have shown (difference-in-differences),
3. which of many guardrail metrics really moved (BH false-discovery
   control over per-metric z-tests),
4. what would a TARGETING RULE have earned (IPS/SNIPS off-policy
   evaluation from the logged randomization),
5. is the trend real under outliers (Theil-Sen robust slope) and does
   browsing volume LEAD buying volume (lead-lag cross-correlation),
6. how long do users survive in hazard terms (Nelson-Aalen) and what
   is a cohort worth over time (LTV curves).

No reference analog as a surface — Jet users hand-build these as keyed
aggregate DAGs; here each is one declarative operator.

Run: python examples/causal_readout.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.experiment import (
    ab_assign,
    covariate_balance,
    diff_in_diff,
    fdr_bh,
    offline_policy_value,
    two_sided_p,
)
from hazelcast_jet_spark.operators.timeseries import (
    lead_lag_corr,
    ltv_cohorts,
    nelson_aalen,
    theil_sen_trend,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-causal-readout")

events = load_table(spark, sf_dir, "events")
orders = load_table(spark, sf_dir, "orders")
customer = load_table(spark, sf_dir, "customer")

# 1. randomization health: SMD balance over pre-experiment covariates
spend = orders.groupBy("o_custkey").agg(
    F.count(F.lit(1)).alias("n_orders"),
    F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
    .alias("total_spend"))
units = (customer.join(spend, customer.c_custkey == spend.o_custkey, "left")
         .select(ab_assign(F.col("c_custkey"), "demo").alias("arm"),
                 F.col("c_acctbal").alias("acctbal"),
                 F.coalesce("n_orders", F.lit(0)).cast("double")
                 .alias("n_orders"),
                 F.coalesce("total_spend", F.lit(0.0)).alias("total_spend")))
print("=== covariate balance (|smd| >= 0.1 flags a broken split) ===")
covariate_balance(units, "arm", ["acctbal", "n_orders",
                                 "total_spend"]).show()

# 2. difference-in-differences on the pre/post halves of the order log
panel = (orders.groupBy(
    "o_custkey",
    F.when(F.col("o_orderdate") < "1998-01-01", F.lit("pre"))
     .otherwise(F.lit("post")).alias("period"))
    .agg(F.avg("o_totalprice").alias("avg_value"))
    .withColumn("arm", ab_assign(F.col("o_custkey"), "demo")))
print("=== difference-in-differences ===")
diff_in_diff(panel, "arm", "period", "avg_value").show()

# 3. guardrail sweep: per-event-type first-touch z-tests, BH-adjusted
first = (events.groupBy("user_id")
         .agg(F.min_by("event_type", F.struct("ts", "event_id"))
              .alias("event_type"))
         .withColumn("arm", ab_assign(F.col("user_id"), "demo")))
cells = (first.groupBy("event_type")
         .agg(F.sum((F.col("arm") == "A").cast("bigint")).alias("ca"),
              F.sum((F.col("arm") == "B").cast("bigint")).alias("cb")))
from pyspark.sql import Window  # noqa: E402

w_all = Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                         Window.unboundedFollowing)
cells = (cells.withColumn("na", F.sum("ca").over(w_all))
         .withColumn("nb", F.sum("cb").over(w_all)))
pa = F.col("ca") / F.col("na")
pb = F.col("cb") / F.col("nb")
pool = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
z = (pa - pb) / F.sqrt(pool * (1 - pool)
                       * (1 / F.col("na") + 1 / F.col("nb")))
tests = cells.select("event_type", two_sided_p(z).alias("p"))
print("=== guardrail metrics, BH FDR-adjusted at q=0.05 ===")
fdr_bh(tests, "event_type", "p").show()

# 4. counterfactual: what purchase-rate would a targeting rule collect?
policy_units = (events.groupBy("user_id")
                .agg(F.min_by("event_type", F.struct("ts", "event_id"))
                     .alias("first_type"),
                     F.max((F.col("event_type") == "purchase").cast("int"))
                     .cast("double").alias("reward"))
                .select(ab_assign(F.col("user_id"), "demo").alias("logged"),
                        F.when(F.col("first_type") == "view", F.lit("B"))
                        .otherwise(F.lit("A")).alias("target"), "reward"))
print("=== off-policy value (IPS / SNIPS) of 'B for viewers' ===")
offline_policy_value(policy_units, "logged", "target", "reward").show()

# 5. robust trend + lead-lag structure
daily = (events.groupBy(
    F.col("event_type").alias("key"),
    F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
    .alias("day")).agg(F.count(F.lit(1)).cast("double").alias("n")))
print("=== Theil-Sen robust daily trend per event type ===")
theil_sen_trend(daily, "key", "day", "n").show()
print("=== does view volume LEAD purchase volume? (hourly xcorr) ===")
lead_lag_corr(events, "ts", F.col("event_type") == "view",
              F.col("event_type") == "purchase", 3600, 3).show()

# 6. hazard + value over the lifecycle
span = events.groupBy("user_id").agg(
    F.min(F.to_date("ts")).alias("f"), F.max(F.to_date("ts")).alias("l"))
mx = span.agg(F.max("l").alias("m"))
subj = span.crossJoin(F.broadcast(mx)).select(
    F.datediff("l", "f").alias("duration"),
    (F.col("l") <= F.date_sub("m", 7)).alias("observed"))
print("=== Nelson-Aalen cumulative hazard (first rows) ===")
nelson_aalen(subj, "duration", "observed").show(10)
print("=== cohort LTV curves (first rows) ===")
ltv_cohorts(orders, "o_custkey", "o_orderdate", "o_totalprice").show(10)
