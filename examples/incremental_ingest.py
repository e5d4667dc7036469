"""Daily-ingest dedup + curation workflow — the production loop a
training-data corpus actually runs:

1. day 0: profile the incoming batch (operators/profile.profile_table),
   build the persisted LSH dedup index (dedup.minhash_index_build),
2. day 1: a NEW batch arrives — probe it against the index with ZERO
   recompute of day 0 (dedup.minhash_index_probe), drop the near-dups,
   cap per-source quotas (sampling.quota_per_key), assign leakage-safe
   train/val/test splits (sampling.split_by_key),
3. fold the accepted batch into the index (mode="append") so day 2
   dedups against day 0 ∪ day 1.

At 100 TB: each day costs O(new batch), never O(corpus) — signatures
and shingles of prior days are parquet on disk, the candidate join
touches only bucket keys the new batch produces.

Run: python examples/incremental_ingest.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators import dedup
from hazelcast_jet_spark.operators.profile import profile_table
from hazelcast_jet_spark.operators.sampling import quota_per_key, split_by_key

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-incremental-ingest")

docs = load_table(spark, sf_dir, "documents")
day0 = docs.filter(F.col("doc_id") % 2 == 0)
day1 = docs.filter(F.col("doc_id") % 2 == 1)

# -- day 0: profile, then index ------------------------------------------
print("day-0 profile:")
profile_table(day0, ["doc_id", "lang", "source"]).show()

index_path = os.path.join(tempfile.mkdtemp(prefix="ingest_ex_"), "lsh")
dedup.minhash_index_build(day0, index_path, num_hashes=8, bands=4, k=3)

# -- day 1: dedup the new batch against everything already ingested ------
pairs = dedup.minhash_index_probe(
    spark, index_path, day1, num_hashes=8, bands=4, k=3, threshold=0.5)
dupes = pairs.select(F.col("new_id").alias("doc_id")).distinct()
accepted = day1.join(dupes, "doc_id", "left_anti")
print(f"day-1 batch: {day1.count()} docs, "
      f"{dupes.count()} near-dups of the corpus dropped")

# -- curate: per-source quota caps + leakage-safe splits -----------------
curated = quota_per_key(accepted, "source", 10, "doc_id", seed="ingest")
curated = split_by_key(curated, "doc_id",
                       {"train": 0.9, "val": 0.05, "test": 0.05},
                       seed="ingest")
curated.groupBy("split").count().orderBy("split").show()

# -- fold the accepted batch into the index for day 2 --------------------
dedup.minhash_index_build(accepted, index_path, num_hashes=8, bands=4, k=3,
                          mode="append")
n_idx = spark.read.parquet(f"{index_path}/shingles").count()
print(f"index now covers {n_idx} docs")
# NOTE: no spark.stop() — examples run in-process in tests/test_examples.py
# against a shared session (get_spark → getOrCreate), like the rest of the
# suite; stopping here would kill every later test's session.

# -- maintenance: retract a takedown + compact the epoch layout ----------
# (tombstones hide the doc from every later probe with no index rewrite;
# compaction folds epoch dirs, physically drops tombstoned rows, and
# consumes the tombstones — probe results are pinned equal to a fresh
# rebuild over the surviving docs)
maint_base = tempfile.mkdtemp(prefix="ingest_maint_")
epoch_index = os.path.join(maint_base, "epoch_index")
dedup.ingest_epoch(day0, 0, epoch_index, os.path.join(maint_base, "pairs0"),
                   num_hashes=8, bands=4, k=3)
dedup.ingest_epoch(accepted, 1, epoch_index,
                   os.path.join(maint_base, "pairs1"),
                   num_hashes=8, bands=4, k=3)
takedown = day0.orderBy("doc_id").limit(3).select("doc_id")
dedup.minhash_index_retract(takedown, epoch_index, epoch=1)
stats = dedup.minhash_index_compact(spark, epoch_index)
print(f"compacted {stats['epochs_compacted']} epochs into "
      f"epoch={stats['target_epoch']}, dropped {stats['ids_dropped']} "
      "retracted docs")
