"""End-to-end training-data pipeline over the documents table — the
Phase-5 extension operators composed the way a 100 TB corpus run would
be: exact dedup → near-dup (MinHash/LSH) prune → benchmark
decontamination → quality gate → per-language stratified downsample →
sequence packing into token-budget bins → token accounting.

Every stage is JVM expressions, one bounded band-join, or a broadcast
of a tiny benchmark set; nothing collects the corpus to the driver, so
the same plan runs at cluster scale.

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.dedup import (
    decontaminate, exact_dedup, minhash_lsh_pairs, pairs_to_groups)
from hazelcast_jet_spark.operators.packing import pack_concat, pack_stats
from hazelcast_jet_spark.operators.sampling import stratified_sample
from hazelcast_jet_spark.operators.sketch import heavy_hitters
from hazelcast_jet_spark.operators.text import (
    chunk_documents, gopher_quality_flags, normalize_text, scrub_pii,
    token_count)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-llm-data-pipeline")

docs = load_table(spark, sf_dir, "documents")
n0 = docs.count()

# 1. exact dedup: keep the lowest doc_id of each normalized-text group
groups = exact_dedup(docs, "text", "doc_id")
survivors = docs.join(
    groups.select(F.col("keep_id").alias("doc_id")), "doc_id", "left_semi")
n1 = survivors.count()

# 2. near-dup prune: MinHash/LSH pairs → connected-component groups →
#    keep each group's min doc_id.  (Per-pair "drop id_b" under-drops on
#    chains like (1,3),(2,3): it keeps 2, though 1-2-3 is one group.)
pairs = minhash_lsh_pairs(survivors, "text", "doc_id", threshold=0.7)
drop = (
    pairs_to_groups(pairs)
    .filter(F.col("node") != F.col("group"))   # group label = kept min id
    .select(F.col("node").alias("doc_id"))
)
survivors = survivors.join(drop, "doc_id", "left_anti")
n2 = survivors.count()

# 3. benchmark decontamination: drop docs overlapping the eval slice
#    (here: doc_id % 50 == 0 stands in for a held-out benchmark set)
bench = docs.filter(F.col("doc_id") % 50 == 0)
contaminated = decontaminate(survivors, bench, min_overlap=3)
survivors = survivors.join(
    contaminated.select("doc_id"), "doc_id", "left_anti")
n2b = survivors.count()

# 4. quality gate: Gopher-style row-local rules (pure JVM expressions),
#    then PII redaction on what survives (map-only chained regex)
survivors = (
    survivors.filter(gopher_quality_flags("text", min_words=10)["pass"])
    .withColumn("text", scrub_pii("text"))
)
n3 = survivors.count()

# 5. language-stratified downsample (map-only, reproducible)
sampled = stratified_sample(
    survivors, key_col="doc_id", stratum_col="lang",
    rates={"en": 0.5, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0},
    default_rate=0.2, seed="mix-v1",
)

# 6. context-window chunking (map-side explode, co-partitioned with the
#    doc), then sequence packing: concatenate chunks per language into
#    512-token bins
chunks = chunk_documents(
    sampled, chunk_tokens=128, overlap=16, keep_cols=["lang"])
packed = pack_concat(
    chunks.withColumn("tok", F.col("chunk_n_tokens")),
    token_col="tok", budget=512, order_col="doc_id",
    partition_cols=["lang"])
bins = pack_stats(packed, "tok", ["lang"])

# 6b. tokenize to id sequences against a corpus vocab (the encoder step
#     the packed bins feed; OOV tokens map to id 0)
from hazelcast_jet_spark.operators.text import build_vocab, tokenize_ids

vocab = build_vocab(sampled, size=512)
encoded = tokenize_ids(sampled, vocab)
print("encoded docs (ordered id arrays, OOV accounting):")
encoded.select("doc_id", "n_tokens", "n_unk").orderBy("doc_id").show(5)

# 7. token accounting + bounded-state vocabulary report for the final mix
mix = (
    sampled.groupBy("lang")
    .agg(F.count(F.lit(1)).alias("docs"),
         F.sum(token_count("text")).alias("tokens"))
    .orderBy("lang")
)
top_terms = heavy_hitters(
    sampled.select(F.explode(F.split(normalize_text("text"), " ")).alias("term"))
    .filter(F.col("term") != ""),
    "term", k=5, capacity=64)
print(f"corpus: {n0} → exact-dedup {n1} → near-dup {n2} → "
      f"decontaminated {n2b} → quality+scrub {n3}")
print(f"packed into {bins.count()} bins of <=512 tokens (start-offset rule)")
mix.show()
top_terms.show()

# 8. learn a subword tokenizer IN-ENGINE (BPE): the corpus is scanned
#    once for word counts; every merge iteration runs on the vocab table
#    only — then segment with the learned merges
from hazelcast_jet_spark.operators.bpe import bpe_fit, bpe_segments

merges = bpe_fit(sampled, "text", n_merges=12)
print(f"learned {len(merges)} BPE merges, first 6: {merges[:6]}")
segmented = sampled.select(
    "doc_id", bpe_segments("text", merges).alias("syms"))
print("subword symbols per doc (learned tokenizer):")
segmented.select("doc_id", F.size("syms").alias("n_syms")).orderBy(
    "doc_id").show(5)

# 9. dedup QUALITY audits before trusting the pipeline at scale:
#    (a) multi-grain exact-substring duplication (short boilerplate AND
#        long copies in one pass), (b) the weakest edge inside each LSH
#        group (transitive false-merge signal), (c) how well the MinHash
#        estimate tracks exact Jaccard on the candidates it generated
from hazelcast_jet_spark.operators.dedup import (
    dedup_group_quality, dup_span_stats_multi, minhash_estimate_vs_exact)

print("multi-grain duplicated-span profile (docs with any dup span):")
dup_span_stats_multi(docs, ks=(4, 8, 16)) \
    .filter(F.col("n_dup_spans") > 0).orderBy("doc_id", "k").show(6)

audit_pairs = minhash_lsh_pairs(docs, "text", "doc_id",
                                num_hashes=8, bands=4, threshold=0.5)
if audit_pairs.head(1):
    print("LSH group quality (weakest edge per group):")
    dedup_group_quality(audit_pairs).show(5)
print("MinHash estimate vs exact Jaccard on LSH candidates:")
minhash_estimate_vs_exact(docs, num_hashes=8, bands=4).show(5)
