"""End-to-end training-data pipeline over the documents table — the
Phase-5 extension operators composed the way a 100 TB corpus run would
be: exact dedup → near-dup (MinHash/LSH) prune → quality gate →
per-language stratified downsample → token accounting.

Every stage is JVM expressions or one bounded band-join; nothing
collects the corpus to the driver, so the same plan runs at cluster
scale.

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from hazelcast_jet_spark.operators.sampling import stratified_sample
from hazelcast_jet_spark.operators.text import quality_score, token_count

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-llm-data-pipeline")

docs = load_table(spark, sf_dir, "documents")
n0 = docs.count()

# 1. exact dedup: keep the lowest doc_id of each normalized-text group
groups = exact_dedup(docs, "text", "doc_id")
survivors = docs.join(
    groups.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi")
n1 = survivors.count()

# 2. near-dup prune: drop the higher id of every MinHash/LSH verified pair
pairs = minhash_lsh_pairs(survivors, "text", "doc_id", threshold=0.7)
near_dups = pairs.select(F.col("id_b").alias("doc_id")).distinct()
survivors = survivors.join(near_dups, "doc_id", "left_anti")
n2 = survivors.count()

# 3. quality gate (pure JVM expressions)
survivors = survivors.filter(quality_score("text") >= 1.0)
n3 = survivors.count()

# 4. language-stratified downsample (map-only, reproducible)
sampled = stratified_sample(
    survivors, key_col="doc_id", stratum_col="lang",
    rates={"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0},
    default_rate=0.2, seed="mix-v1",
)

# 5. token accounting for the final mix
mix = (
    sampled.groupBy("lang")
    .agg(F.count(F.lit(1)).alias("docs"),
         F.sum(token_count("text")).alias("tokens"))
    .orderBy("lang")
)
print(f"corpus: {n0} → exact-dedup {n1} → near-dup {n2} → quality {n3}")
mix.show()
