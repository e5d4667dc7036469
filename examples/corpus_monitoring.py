"""Corpus OBSERVABILITY pipeline — the monitoring half of a training-
data platform (round-5 session-3 operators):

1. one-pass table profile (operators/profile.profile_table),
2. robust outliers via median/MAD (profile.mad_outliers) — the
   sensor-glitch / metric-drift check stddev z-scores get dragged on,
3. distribution drift via exact two-sample KS (profile.ks_drift)
   between the even/odd event-id halves (stand-in for yesterday vs
   today),
4. text-quality distribution: character entropy (text.char_entropy)
   and bigram-LM surprisal (text.bigram_lm_score) summarized per lang.

Run: python examples/corpus_monitoring.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators import text
from hazelcast_jet_spark.operators.profile import (
    ks_drift,
    mad_outliers,
    profile_table,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-corpus-monitoring")

events = load_table(spark, sf_dir, "events")
docs = load_table(spark, sf_dir, "documents")

# 1. one-scan profile of the events table
print("table profile:")
profile_table(events, ["event_id", "value", "event_type"]).show()

# 2. robust per-type outlier counts (median/MAD, k=3)
print("MAD outliers by event type:")
mad_outliers(events, "value", "event_type", k=3.0).orderBy("event_type").show()

# 3. KS drift between the two halves of each event type
ref = events.filter(F.col("event_id") % 2 == 0)
cur = events.filter(F.col("event_id") % 2 == 1)
print("KS drift (even vs odd halves):")
ks_drift(ref, cur, "value", ["event_type"]).orderBy("event_type").show()

# 4. text quality distributions per language
ent = docs.select("lang", text.char_entropy("text").alias("h_bits"))
print("char entropy by lang:")
ent.groupBy("lang").agg(
    F.count(F.lit(1)).alias("n_docs"),
    F.round(F.avg("h_bits"), 3).alias("mean_bits"),
    F.round(F.min("h_bits"), 3).alias("min_bits"),
    F.round(F.max("h_bits"), 3).alias("max_bits"),
).orderBy("lang").show()

print("bigram-LM surprisal (5 most out-of-distribution docs):")
text.bigram_lm_score(docs).orderBy(F.col("mean_nll").desc()).show(5)
