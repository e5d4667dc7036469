"""Embedding similarity-search workflow — the ANN scale path end to end:

1. train IVF centroids with distributed spherical k-means
   (operators/clustering.py),
2. materialize the corpus as a persisted IVF index partitioned by
   centroid (operators/similarity.ivf_build_index) so probes read only
   nprobe partitions,
3. query it, and sanity-check against brute-force cosine top-k.

At 100 TB: train on a deterministic sample (k-means needs ~1000·k
vectors), build once, probe forever — the corpus is scanned once at
build and never shuffled at query time.

Run: python examples/embedding_search.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.clustering import train_ivf_centroids
from hazelcast_jet_spark.operators.similarity import (
    cosine_topk, ivf_build_index, ivf_topk_indexed)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-embedding-search")

emb = load_table(spark, sf_dir, "embeddings")
queries = emb.filter(F.col("vec_id") < 3)

# 1. train coarse quantizer (8 centroids; sample first at real scale)
centroids = train_ivf_centroids(emb, k=8, max_iter=8)

# 2. persist the index partitioned by centroid_id
index_path = os.path.join(tempfile.mkdtemp(prefix="ivf_ex_"), "index")
ivf_build_index(emb, centroids, index_path)

# 3. probe 2 of 8 partitions per query
approx = ivf_topk_indexed(spark, index_path, queries, centroids, k=5, nprobe=2)
exact = cosine_topk(emb, queries, k=5)

a = {(r["query_id"], r["corpus_id"]) for r in approx.collect()}
e = {(r["query_id"], r["corpus_id"]) for r in exact.collect()}
print(f"recall@5 with nprobe=2/8: {len(a & e) / len(e):.2f} "
      f"({len(a & e)}/{len(e)} of brute-force top-k recovered)")

# 4. product quantization: 64 float dims -> 8 code bytes, then ADC
#    search over codes only (the memory + search arms of the ANN stack)
from hazelcast_jet_spark.operators.similarity import pq_encode, pq_fit, pq_topk

books = pq_fit(emb, m=8, k=16, max_iter=6)
codes = pq_encode(emb, books, err_col="qerr")
print("mean quantization error:",
      codes.agg(F.round(F.avg("qerr"), 4)).collect()[0][0])
adc = pq_topk(codes, queries, books, k=5)
a2 = {(r["query_id"], r["corpus_id"]) for r in adc.collect()}
# exact here is cosine; ADC is L2 — overlap is indicative, not 1.0
print(f"ADC top-5 overlap with exact cosine: {len(a2 & e)}/{len(e)}")

# 5. ANN quality probe: recall of the full IVF-PQ-with-re-rank pipeline
#    (shortlist by ADC, finish with exact cosine over the shortlist) —
#    the metric that sizes nprobe/shortlist for a recall target
from hazelcast_jet_spark.operators.similarity import adc_dist_portable  # noqa: E402

short = pq_topk(codes, queries, books, k=25)
rr = (short.join(emb.select(F.col("vec_id").alias("corpus_id"), "embedding"),
                 "corpus_id")
      .join(queries.select(F.col("vec_id").alias("query_id"),
                           F.col("embedding").alias("qv")), "query_id"))
from hazelcast_jet_spark.operators.similarity import cosine  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

reranked = (rr.withColumn("cs", F.round(cosine(
                F.col("qv").cast("array<double>"),
                F.col("embedding").cast("array<double>")), 6))
            .withColumn("rk", F.row_number().over(
                Window.partitionBy("query_id")
                .orderBy(F.col("cs").desc(), F.col("corpus_id"))))
            .filter(F.col("rk") <= 5))
a3 = {(r["query_id"], r["corpus_id"]) for r in reranked.collect()}
print(f"ADC-shortlist + exact re-rank recall@5: {len(a3 & e)}/{len(e)}")

# 6. byte-domain near-dups straight off PQ codes (no vectors read):
#    pairs differing in <= 1 of 8 subspaces via the one-hot hamming
#    probe.  The one-hot bigint packing needs m*k_cb <= 63 bits, so the
#    DEDUP codebook is a coarser k=4 fit than the k=16 search codebook
#    (coarser codes collide more aggressively — what dedup wants).
from hazelcast_jet_spark.operators.similarity import pq_code_near_dup_pairs  # noqa: E402

books4 = pq_fit(emb, m=8, k=4, max_iter=4)
codes4 = pq_encode(emb, books4)
code_dups = pq_code_near_dup_pairs(codes4, k_cb=4, max_diff_codes=1)
print("PQ-code near-dup pairs (<=1 differing subspace):", code_dups.count())

# 7. hard negatives + MMR: the selection end of the embedding pipeline —
#    similarity-aware negatives for contrastive training, and a
#    diversified top-k that spends a budget on coverage
from hazelcast_jet_spark.operators.similarity import (  # noqa: E402
    hard_negative_topk, mmr_select)

labeled = emb  # embeddings table carries a label column
print("hard negatives (most-similar different-label) for 3 anchors:")
hard_negative_topk(labeled, labeled.filter(F.col("vec_id") < 3), k=3).show()
print("MMR diversified selection (k=3 from a 10-candidate pool):")
mmr_select(emb, queries, k=3, pool=10, lam=0.7).show()

# 8. rank-quality metric: RBO between full-dim and truncated-dim
#    rankings — rewards agreement at the TOP, unlike recall@k
from hazelcast_jet_spark.operators.similarity import (  # noqa: E402
    cosine_topk, rbo_overlap, truncated_cosine_topk)

full_r = cosine_topk(emb, queries, k=10)
trunc_r = truncated_cosine_topk(emb, queries, dims=16, k=10)
print("RBO(full vs 16-dim prefix) per query:")
rbo_overlap(full_r, trunc_r, depth=10).show()

# replayable training: a fixed-iteration k-means fit whose every float
# op has a fixed order (rounded-distance argmin + decimal centroid
# updates) — the auditable twin of kmeans_fit
from hazelcast_jet_spark.operators.clustering import kmeans_fit_unrolled

cent_u, assigned_u = kmeans_fit_unrolled(emb, k=4, iters=2)
print("replayable 2-iteration k-means cluster sizes:")
assigned_u.groupBy("cluster").count().orderBy("cluster").show()

# representation drift: has any label's centroid moved between the two
# deterministic halves of the data?
from hazelcast_jet_spark.operators.clustering import embedding_centroid_drift

print("per-label centroid drift (even vs odd ids):")
embedding_centroid_drift(emb).show(5)

# pre-indexing sanity: per-label norm distribution (un-normalized vectors
# silently break the cosine/IP interchange ANN indexes assume)
from hazelcast_jet_spark.operators.similarity import embedding_norm_stats

print("per-label embedding norm profile:")
embedding_norm_stats(emb).show(5)

# hybrid retrieval: fuse the cheap 16-dim prefix ranking with the exact
# full-vector ranking using only RANKS (reciprocal-rank fusion)
from hazelcast_jet_spark.operators.similarity import (rrf_fuse,
                                                      truncated_cosine_topk)

q = emb.filter(F.col("vec_id") < 3)
fused = rrf_fuse(cosine_topk(emb, q, k=5),
                 truncated_cosine_topk(emb, q, 16, k=5), k=5)
print("RRF-fused top-5 per query:")
fused.show(15)
