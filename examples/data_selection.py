"""Training-data SELECTION pipeline — the curation half that follows
dedup (round-5 operators):

1. DSIR importance weights (operators/importance.dsir_weights, Xie et
   al. 2023): score every raw doc by hashed-bigram log-likelihood ratio
   against a target subset — "more like this" selection,
2. quality deciles (operators/profile.rank_bins over
   text.quality_score): equal-population curriculum buckets,
3. importance-weighted sampling (operators/sampling.weighted_sample):
   the DSIR weights become per-doc keep probabilities — deterministic,
   map-only Bernoulli selection,
4. keep-best dedup (operators/dedup.keep_best): each near-dup group
   keeps its highest-quality member instead of blind min-id,
5. range-clustered output layout (storage.write_clustered): the final
   mix lands sorted/clustered by doc_id so downstream filtered scans
   skip whole files.

Run: python examples/data_selection.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators import dedup, text
from hazelcast_jet_spark.operators.importance import dsir_weights
from hazelcast_jet_spark.operators.profile import rank_bins
from hazelcast_jet_spark.storage import write_clustered

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-data-selection")

docs = load_table(spark, sf_dir, "documents")

# 1. importance weights: target = docs tagged English
weights = dsir_weights(docs, F.col("lang") == "en")
print("top docs by importance weight (most target-like):")
weights.orderBy(F.col("weight").desc()).show(5)

# 2. quality curriculum deciles
scored = docs.select(
    "doc_id", F.round(text.quality_score("text"), 6).alias("q"))
deciles = rank_bins(scored, "q", 10, "doc_id", bin_col="decile")
print("docs per quality decile:")
deciles.groupBy("decile").count().orderBy("decile").show()

# 3. importance-weighted sampling: DSIR weight → keep probability
from hazelcast_jet_spark.operators.sampling import weighted_sample

weighted = weighted_sample(
    docs.join(weights.select("doc_id", "weight"), "doc_id"),
    rate=0.8, weight="weight", key_col="doc_id", seed="sel0")
print(f"weighted sample kept {weighted.count()} of {docs.count()} docs")

# 4. keep the best copy of every near-dup group
pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
winners = dedup.keep_best(docs, pairs, F.round(text.quality_score("text"), 6))
print("dup groups and their quality winners:")
winners.show(5)

# docs to drop = group members that are not the winner
members = dedup.pairs_to_groups(pairs).select("node")
keepers = winners.select(F.col("keep_id").alias("node"))
drops = members.exceptAll(keepers)
selected = docs.join(drops.withColumnRenamed("node", "doc_id"),
                     "doc_id", "left_anti")
print(f"selected {selected.count()} of {docs.count()} docs after keep-best")

# 5. write the selection range-clustered by doc_id for skippable scans
out = os.path.join(tempfile.mkdtemp(prefix="data_selection_"), "selected")
write_clustered(selected.select("doc_id", "lang", "source", "text"),
                out, ["doc_id"], num_files=4)
print("clustered output:", out, "->",
      spark.read.parquet(out).count(), "rows")

# 6. language-balance the final mix with temperature sampling (T=2):
#    large languages downsample toward p_g ∝ sqrt(n_g); the smallest
#    keeps everything — deterministic, map-only, reproducible
from hazelcast_jet_spark.operators.sampling import temperature_sample

balanced = temperature_sample(selected, "lang", "doc_id", alpha=0.5)
print("language mix before/after temperature sampling:")
(selected.groupBy("lang").agg(F.count(F.lit(1)).alias("n_raw"))
 .join(balanced.groupBy("lang").agg(F.count(F.lit(1)).alias("n_balanced")),
       "lang", "left")
 .orderBy("lang").show())

from hazelcast_jet_spark.operators.sampling import kfold_split  # noqa: E402

# k-fold assignment for cross-validated filter-model training: folds are
# a pure function of the doc id hash, so membership never drifts between
# runs and grouped rows never straddle folds
print("5-fold split sizes:")
kfold_split(docs, "doc_id", 5).groupBy("fold").count().orderBy("fold").show()

from hazelcast_jet_spark.operators.clustering import coreset_kcenter  # noqa: E402

# diversity-maximizing coreset over the embedding space: greedy k-center
# picks spread-out exemplars instead of oversampling dense modes
emb = load_table(spark, sf_dir, "embeddings")
print("k-center coreset selection order:")
coreset_kcenter(emb, 5).orderBy("sel_order").show()

from hazelcast_jet_spark.operators.sampling import waterfill_allocation  # noqa: E402

# budget the final mixture: water-fill 60% of total chars across
# sources — scarce domains kept whole, big ones capped at the fill level
print("water-filled source budget (60% of corpus):")
waterfill_allocation(docs, "source", "n_chars", 0.6).show(25)

from hazelcast_jet_spark.operators.sampling import top_mass_selection  # noqa: E402

# concentration-adaptive pruning: per source, keep the shortest
# biggest-first prefix carrying half the char mass
print("top-50%-mass selection per source:")
top_mass_selection(docs, "source", "n_chars", "doc_id", p=0.5).show(25)

from hazelcast_jet_spark.operators.importance import hashed_classifier_score  # noqa: E402
from hazelcast_jet_spark.operators.profile import calibration_bins  # noqa: E402

# audit the quality filter's confidence: reliability diagram + ECE
# contributions of classifier scores against the lang=='en' label
hexd = "0123456789abcdef"
weights = {a + b + c: ((ord(a) + 3 * ord(b) + 7 * ord(c)) % 13 - 6) / 8.0
           for a in hexd for b in hexd for c in hexd}
scored = hashed_classifier_score(docs, weights, bucket_hex=3, bias=-0.5)
lab = scored.join(docs.select("doc_id", "lang"), "doc_id") \
    .select("score", (F.col("lang") == "en").alias("y"))
print("classifier calibration bins (ECE = sum of w_abs_gap):")
calibration_bins(lab, "score", "y", n_bins=10, lo=-15.0, hi=15.0).show()

# consume a budget: per-source token-budget sampling in md5 order —
# the selection step a waterfill allocation feeds
from hazelcast_jet_spark.operators.sampling import budget_sample  # noqa: E402

kept = budget_sample(docs, stratum_col="source", weight_col="n_chars",
                     budget=2000, key_col="doc_id", seed="sel-")
print("per-source kept docs under a 2000-char budget:")
kept.groupBy("source").agg(
    F.count(F.lit(1)).alias("n_kept"),
    F.sum("n_chars").alias("chars_kept")).orderBy("source").show(5)

# does the classifier actually SELECT well?  gains/lift per score decile
# against a Gopher-pass label: lift >> 1 in bin 1 = the filter works
from hazelcast_jet_spark.operators.importance import lift_table  # noqa: E402
from hazelcast_jet_spark.operators.text import gopher_quality_flags  # noqa: E402

labeled = scored.join(
    docs.select(
        "doc_id",
        gopher_quality_flags("text", min_words=20, max_words=1000,
                             min_mean_word_len=3.0, max_mean_word_len=10.0,
                             max_symbol_ratio=0.1)["pass"].alias("pos")),
    "doc_id")
print("classifier gains/lift per decile:")
lift_table(labeled, "score", "pos", n_bins=10).show()
