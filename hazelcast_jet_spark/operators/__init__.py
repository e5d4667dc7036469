"""Extended operators: joins/co-group helpers + large-scale training-data
pipeline ops (dedup, similarity, text analysis, multimodal) beyond the
reference's inventory (SURVEY §2 + Phase 5)."""

from hazelcast_jet_spark.operators.joins import co_group, co_group3, top_n_rows
from hazelcast_jet_spark.operators import (
    bpe, bucketing, cep, clustering, dedup, experiment, graph, importance,
    joins, multimodal, packing, profile, sampling, similarity, sketch, skew,
    text, timeseries, windows)

__all__ = [
    "co_group", "co_group3", "top_n_rows",
    "bpe", "bucketing", "cep", "clustering", "dedup", "experiment", "graph",
    "importance", "joins", "multimodal", "packing", "profile", "sampling",
    "similarity", "sketch", "skew", "text", "timeseries", "windows",
]
