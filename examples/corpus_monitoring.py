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

# ---- round-5 session-4 additions -----------------------------------------

from hazelcast_jet_spark.operators.sketch import (  # noqa: E402
    count_min_build, count_min_estimate)
from hazelcast_jet_spark.operators.text import ngram_novelty  # noqa: E402
from hazelcast_jet_spark.operators.timeseries import cohort_retention  # noqa: E402
from hazelcast_jet_spark.storage import snapshot_diff  # noqa: E402

# 5. count-min sketch of the corpus vocabulary + a probe watchlist: the
#    sketch is depth x width counters however large the vocabulary — ship
#    one per day and add them to merge
toks = docs.filter(F.col("text").isNotNull()).select(
    F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
cms = count_min_build(toks, "term", width=512, depth=4)
watch = spark.createDataFrame(
    [("data",), ("spark",), ("value",)], "term: string")
print("count-min term-frequency watchlist (estimate >= true):")
count_min_estimate(cms, watch, "term", depth=4, width=512).show()

# 6. day-over-day snapshot diff (stand-in: doc-id halves with a planted
#    change) — the audit primitive for "what moved between exports"
old = docs.filter(F.col("doc_id") % 3 != 0).select("doc_id", "n_chars")
new = docs.filter(F.col("doc_id") % 5 != 0).select(
    "doc_id",
    F.when(F.col("doc_id") % 7 == 0, F.col("n_chars") + 1)
    .otherwise(F.col("n_chars")).alias("n_chars"))
print("snapshot diff (added/removed/changed):")
snapshot_diff(old, new, ["doc_id"]).groupBy("change").count().show()

# 7. corpus freshness: n-gram novelty per source (near-copies of earlier
#    docs score ~0)
print("3-gram novelty by source:")
(ngram_novelty(docs, n=3)
 .join(docs.select("doc_id", "source"), "doc_id")
 .groupBy("source")
 .agg(F.count(F.lit(1)).alias("n_docs"),
      F.round(F.avg("novelty"), 3).alias("mean_novelty"))
 .orderBy("source").show())

# 8. weekly cohort retention of event users
print("weekly cohort retention (first 10 cells):")
cohort_retention(events, "user_id", "ts").orderBy(
    "cohort_period", "period_offset").show(10)

from hazelcast_jet_spark.operators.profile import (  # noqa: E402
    benford_digits, categorical_drift)
from hazelcast_jet_spark.operators.timeseries import (  # noqa: E402
    acf, changepoint_scores)

# 9. categorical drift: did the event-type MIX shift between the two
#    id halves?  chi2/V for the alarm, JS for a bounded distance
print("categorical drift of event_type (even vs odd ids):")
categorical_drift(events.filter(F.col("event_id") % 2 == 0),
                  events.filter(F.col("event_id") % 2 == 1),
                  "event_type").show()

# 10. Benford's law on event values — a cheap fabricated-data tripwire
print("Benford first-digit audit of event values:")
benford_digits(events, "value").orderBy("digit").show()

# 11. level-shift changepoints per event type (the regime-change
#     companion of point-anomaly bands)
print("strongest level shift per event type:")
cp = changepoint_scores(events, "event_type", "ts", "value", "event_id",
                        window_n=20)
(cp.filter(F.col("zscore").isNotNull())
 .orderBy(F.abs(F.col("zscore")).desc()).show(5))

# 12. autocorrelation at lags 1-3 — persistence/seasonality signature
print("value ACF per event type:")
acf(events.filter(F.col("value").isNotNull()),
    "event_type", "ts", "value", "event_id").orderBy("key", "lag").show()

from hazelcast_jet_spark.operators.profile import correlation_matrix  # noqa: E402
from hazelcast_jet_spark.operators.timeseries import seasonal_decompose  # noqa: E402

# 13. feature-redundancy screen: all pairwise correlations in one pass
print("event-feature correlation matrix:")
correlation_matrix(
    events.withColumn("hour", F.hour("ts") * 1.0)
    .withColumn("uid", F.col("user_id") * 1.0),
    ["value", "hour", "uid"]).show()

# 14. separate "traffic is down" from "it's that hour": additive
#     seasonal decomposition of event values per type
print("seasonal profile of event values (first positions):")
dec = seasonal_decompose(events.filter(F.col("value").isNotNull()),
                         "event_type", "ts", "value", "event_id", period=12)
(dec.groupBy("event_type", "pos").agg(F.min("seasonal").alias("seasonal"))
 .orderBy("event_type", "pos").show(8))

# 15. plan BEFORE you shuffle: key-skew profile (salt-or-not signal)
#     and a join-size forecast from two bounded Count-Min sketches
from hazelcast_jet_spark.operators.profile import key_skew  # noqa: E402
from hazelcast_jet_spark.operators.sketch import (  # noqa: E402
    cms_join_size, count_min_build)

print("events.user_id skew profile:")
key_skew(events, "user_id", top_n=3).show()
a = count_min_build(events.select("user_id"), "user_id", width=512, depth=4)
b = count_min_build(events.select("user_id").distinct(), "user_id",
                    width=512, depth=4)
print("forecast |events JOIN users| from sketches:",
      cms_join_size(a, b).collect()[0]["est_join_size"],
      "(exact:", events.count(), ")")

# 16. categorical feature redundancy: MI / chi^2 / Cramér's V between
#     two discrete columns in one contingency aggregate
from hazelcast_jet_spark.operators.profile import categorical_association  # noqa: E402

docs = load_table(spark, sf_dir, "documents")
print("lang x source association:")
categorical_association(docs, "lang", "source").show()

# 17. readability distribution per language — syllable-heuristic lexical
#     scoring, pure map-only array expressions
from hazelcast_jet_spark.operators.text import readability  # noqa: E402

print("readability by lang:")
(readability(docs).join(docs.select("doc_id", "lang"), "doc_id")
 .groupBy("lang").agg(F.round(F.avg("avg_syllables"), 4).alias("avg_syl"),
                      F.round(F.avg("pct_complex"), 4).alias("complex"),
                      F.round(F.avg("flesch_proxy"), 2).alias("flesch"))
 .orderBy("lang").show())

# 18. corpus concentration: Gini of char volume across sources — how
#     lopsided is the training mix?
from hazelcast_jet_spark.operators.profile import gini_concentration  # noqa: E402

print("char-volume concentration across sources (global Gini):")
gini_concentration(docs.withColumn("_all", F.lit("corpus")),
                   ["_all"], "n_chars").show()

# 19. mergeable quantile sketch beside the exact percentiles — the
#     bounded-state way to track p50/p90 at 100 TB
from hazelcast_jet_spark.operators.sketch import (  # noqa: E402
    quantile_estimate, quantile_sketch_sharded)

qs = quantile_sketch_sharded(events.filter(F.col("value").isNotNull()),
                             ["event_type"], "value", "event_id", k=128)
print("sketched p50/p90 per event type:")
qs.select("event_type",
          quantile_estimate(F.col("qsk"), 0.5).alias("p50_est"),
          quantile_estimate(F.col("qsk"), 0.9).alias("p90_est")) \
  .orderBy("event_type").show()

# 20. cross-source contamination: shared shingles between sources
from hazelcast_jet_spark.operators.dedup import source_overlap  # noqa: E402

print("phrase-level source overlap (top pairs):")
source_overlap(docs, unit="shingle").orderBy(F.desc("jaccard")).show(5)

# 21. behavioral fingerprint: event-type transition matrix
from hazelcast_jet_spark.operators.timeseries import event_transitions  # noqa: E402

print("event transition matrix:")
event_transitions(events).show()

# 22. heavy-tail audit: Hill tail index of the value distribution —
#     alpha < 2 means sums are dominated by a few records
from hazelcast_jet_spark.operators.profile import hill_tail_index  # noqa: E402

print("Hill tail index per event type (k=50):")
hill_tail_index(events, ["event_type"], "value", k=50).show()

# 23. distribution-level source similarity: pairwise Jensen-Shannon
#     divergence of unigram mixes (0 = same language, ln2 = disjoint)
from hazelcast_jet_spark.operators.text import source_term_divergence  # noqa: E402

print("closest source pairs by term-distribution JSD:")
source_term_divergence(docs).orderBy("jsd").show(5)

# 24. lexical diversity: TTR + Herdan's C — the boilerplate signal
#     length/symbol gates miss
from hazelcast_jet_spark.operators.text import lexical_diversity  # noqa: E402

print("least lexically diverse docs (template suspects):")
lexical_diversity(docs).orderBy("ttr").show(5)

# 25. corpus scaling laws: Heaps' vocabulary growth + Zipf slope
from hazelcast_jet_spark.operators.text import vocab_growth, zipf_fit  # noqa: E402

print("Heaps vocabulary growth (distinct terms after first N docs):")
vocab_growth(docs, checkpoints=(10, 20, 40)).show()
print("Zipf fit over top terms (healthy natural text: slope near -1):")
zipf_fit(docs, top_n=50).show()

# 26. tokenizer sizing: token coverage of candidate vocab sizes
from hazelcast_jet_spark.operators.text import vocab_coverage_curve  # noqa: E402

print("vocab coverage curve:")
vocab_coverage_curve(docs, sizes=(50, 200, 500)).show()

# 27. arrival burstiness: Fano factor of daily counts (1 = Poisson)
from hazelcast_jet_spark.operators.timeseries import burstiness  # noqa: E402

print("per-type burstiness:")
burstiness(events).show()

# 28. live distinct counting: per-day HLL registers merged to a month
#     total WITHOUT rescanning (the sketch-mergeability pattern)
from hazelcast_jet_spark.operators.sketch import (  # noqa: E402
    hll_build, hll_estimate, hll_merge)

daily_regs = hll_build(events.withColumn("day", F.to_date("ts")),
                       "user_id", ["day"], p=4)
print("per-day distinct-user estimates (16 registers/day):")
hll_estimate(daily_regs, ["day"], p=4).select("day", "hll_estimate") \
    .orderBy("day").show(5)
print("month total from merged registers (no rescan):")
hll_estimate(hll_merge(daily_regs.select("hll_reg", "hll_rho"), []),
             [], p=4).select("hll_estimate").show()

# 29. next-event predictability: held-out Markov accuracy
from hazelcast_jet_spark.operators.timeseries import (  # noqa: E402
    markov_holdout_accuracy)

print("next-event prediction accuracy (train < Jan 21, test after):")
markov_holdout_accuracy(
    events, split_ts=F.expr("CAST('2024-01-21 00:00:00' AS TIMESTAMP_NTZ)")
).show()

# 30. value concentration: Lorenz deciles + multi-detector outliers +
#     equal-frequency binning on the same value column
from hazelcast_jet_spark.operators.profile import (  # noqa: E402
    lorenz_curve, outlier_ensemble, quantile_bins)

print("Lorenz curve of event values:")
lorenz_curve(events, "value", n_points=4).show()
print("outlier-detector agreement per event type:")
outlier_ensemble(events, "value", "event_type").show()
print("equal-frequency value bins:")
quantile_bins(events, "value", n_bins=4).show()

# 31. language-ID heuristic evaluation: confusion vs labeled lang
from hazelcast_jet_spark.operators.text import lang_id  # noqa: E402

print("lang_id confusion (labeled vs predicted):")
docs.groupBy("lang", lang_id("text").alias("pred")).count() \
    .orderBy("lang", "pred").show()

# 32. which source is distributionally unlike the rest (one-vs-rest KS)
from hazelcast_jet_spark.operators.profile import source_ks_matrix  # noqa: E402

print("per-source one-vs-rest KS over doc length:")
source_ks_matrix(docs, "n_chars", "source") \
    .orderBy(F.desc("ks_stat")).show(5)

# 33. arrival spacing + engagement shape + boilerplate prefixes
from hazelcast_jet_spark.operators.dedup import prefix_dup_stats  # noqa: E402

print("shared-prefix doc groups (boilerplate suspects):")
prefix_dup_stats(docs, prefix_chars=24, source_col="source").show(5)

print("events-per-user distribution:")
events.groupBy("user_id").count() \
    .agg(F.count(F.lit(1)).alias("n_users"),
         F.expr("percentile(count, 0.5)").alias("p50"),
         F.expr("percentile(count, 0.99)").alias("p99"),
         F.max("count").alias("max")).show()

# 34. the corpus DATA CARD: the one-report-per-source summary a
# training-data run starts from (volume + shares, length percentiles,
# exact/near dup rates, Gopher pass rate, language mix) in one frame
from hazelcast_jet_spark.operators.profile import corpus_data_card  # noqa: E402

print("corpus data card (per source):")
corpus_data_card(docs).show(5, truncate=False)
