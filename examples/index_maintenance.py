"""Day-2 index operations — the maintenance loop a persisted ANN/dedup
deployment actually runs (no reference analog; Phase-5 extension):

1. build an IVF-PQ vector index (coarse lists + PQ codes, partitioned
   by centroid) and a 2-epoch LSH dedup index,
2. upsert a new vector cohort against the FROZEN centroids/codebooks
   and retract a document (takedown) via tombstone,
3. read ONE health table (operators/index_health.index_health): IVF
   list drift → recluster?, PQ codebook drift → refit?, LSH epochs +
   pending tombstones → compact?,
4. act on the breached rows: compact the LSH index and show the
   tombstone counter return to zero.

Run: python examples/index_maintenance.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators import dedup
from hazelcast_jet_spark.operators.index_health import index_health
from hazelcast_jet_spark.operators.similarity import (ivf_pq_build,
                                                      ivf_pq_upsert)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-index-maintenance")

emb = load_table(spark, sf_dir, "embeddings")
docs = load_table(spark, sf_dir, "documents")

# deterministic literal config (the gate's convention: fitted paths are
# pytest-pinned; examples use literals so every run is identical)
centroids = [[((i * 7 + j * 3) % 9 - 4) / 8.0 for j in range(64)]
             for i in range(4)]
books = [[[((s * 5 + j * 3 + t * 7) % 9 - 4) / 8.0 for t in range(8)]
          for j in range(4)] for s in range(8)]

work = tempfile.mkdtemp(prefix="idx_maint_")
ann = os.path.join(work, "ann")
lsh = os.path.join(work, "lsh")

# 1. initial build: 2/3 of the corpus is the training-era cohort
ivf_pq_build(emb.filter(F.col("vec_id") % 3 != 0), centroids, books, ann)
for epoch in range(2):
    dedup.minhash_index_build(docs.filter(F.col("doc_id") % 2 == epoch),
                              lsh, epoch=epoch)

# 2. day-2 changes: upsert the new cohort, retract one document
ivf_pq_upsert(emb.filter(F.col("vec_id") % 3 == 0), centroids, books, ann)
dedup.minhash_index_retract(
    docs.filter(F.col("doc_id") == 7).select("doc_id"), lsh, epoch=1)

# 3. ONE health table across all three signals
health = index_health(spark, ann, centroids, books,
                      F.col("vec_id") % 3 == 0, lsh_index_path=lsh)
health.show(30, truncate=False)

breached = {(r.component, r.action) for r in health.collect() if r.breached}
print("breached:", sorted(breached))

# 4. act: pending tombstones -> compact the LSH index
if ("lsh", "compact") in breached:
    stats = dedup.minhash_index_compact(spark, lsh)
    print("compacted:", stats)
    after = index_health(spark, ann, centroids, books,
                         F.col("vec_id") % 3 == 0, lsh_index_path=lsh)
    tomb = [r for r in after.collect()
            if (r.component, r.key) == ("lsh", "tombstones")][0]
    print("tombstones after compaction:", tomb.value)
    assert tomb.value == 0.0
