"""CONTINUOUS corpus data card — the live-ingest monitoring surface of
the batch card (examples/llm_data_pipeline.py profiles the corpus at
rest; this watches it ARRIVE):

1. readStream over the documents table (stands in for the landing
   bucket a 100 TB ingest writes to),
2. ONE complete-mode streaming aggregation at (source, lang,
   fingerprint) grain (profile.corpus_card_stream_counters) — state is
   one row per distinct triple, the same bounded-state class as
   streaming exact-dedup,
3. batch-side fold of the final counters into the per-source report
   (profile.corpus_card_fold): docs/tokens with corpus shares,
   corpus-wide exact-duplicate rate, Gopher quality-pass rate, and the
   language mix.

The SAME counter+fold pair runs on a batch DataFrame unchanged — the
suite pins streaming == batch equality, so the live report and the
at-rest report can never disagree.

Run: python examples/streaming_data_card.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.profile import (
    corpus_card_fold,
    corpus_card_stream_counters,
)
from hazelcast_jet_spark.streaming.run import read_stream_table, run_to_batch

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-streaming-data-card")
spark.sparkContext.setLogLevel("ERROR")

# live lane: stream -> counters -> fold
stream = read_stream_table(spark, sf_dir, "documents")
counters = run_to_batch(corpus_card_stream_counters(stream), "complete")
print("continuous data card (from the stream):")
card = corpus_card_fold(counters.localCheckpoint())
card.show(truncate=False)

# at-rest lane: identical operators over the batch reader
batch = load_table(spark, sf_dir, "documents")
batch_card = corpus_card_fold(corpus_card_stream_counters(batch))
stream_rows = [tuple(r) for r in card.collect()]
batch_rows = [tuple(r) for r in batch_card.collect()]
print(f"streaming == batch: {stream_rows == batch_rows} "
      f"({len(stream_rows)} sources)")
assert stream_rows == batch_rows
