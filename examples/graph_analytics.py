"""Graph analytics + entity resolution over relational data — the
link-analysis half of a corpus-curation platform (round-5 session-5
operators):

1. co-purchase graph from order baskets (graph.cooccurrence_edges —
   in-task pair enumeration with a hot-basket cap),
2. structural summary: degrees, wedges, triangles via the
   adjacency-intersection edge-iterator, clustering coefficient,
3. fixed-iteration PageRank as a part-popularity prior
   (deterministic DECIMAL accumulation — same ranks on any cluster),
4. multi-field record linkage of even- vs odd-key parts
   (joins.record_linkage — Fellegi-Sunter block/compare/score).

Run: python examples/graph_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.graph import (
    cooccurrence_edges,
    degrees,
    graph_summary,
    pagerank,
)
from hazelcast_jet_spark.operators.joins import record_linkage

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-graph-analytics")

lineitem = load_table(spark, sf_dir, "lineitem")
part = load_table(spark, sf_dir, "part")

# 1. edges between parts bought together in one order
edges = cooccurrence_edges(lineitem, "l_orderkey", "l_partkey", max_group=64)

# 2. structure of the co-purchase graph
print("co-purchase graph summary:")
graph_summary(edges).show()
print("highest-degree parts:")
degrees(edges).orderBy(F.desc("degree"), "node").show(5)

# 3. PageRank as a popularity prior over the same graph
print("top parts by PageRank:")
(pagerank(edges, iters=3)
 .join(part.select(F.col("p_partkey").alias("node"), "p_name"), "node")
 .orderBy(F.desc("pagerank"), "node").show(5))

# 4. entity resolution: even- vs odd-key parts by (name, type) similarity
p = part.withColumn("p_first", F.split(F.col("p_name"), " ")[0])
left = p.filter(F.col("p_partkey") % 2 == 0) \
    .withColumnRenamed("p_partkey", "left_key")
right = p.filter(F.col("p_partkey") % 2 == 1) \
    .withColumnRenamed("p_partkey", "right_key")
matches = record_linkage(
    left, right,
    fields=[("p_name", "p_name", 0.7), ("p_type", "p_type", 0.3)],
    block_on=[("p_brand", "p_brand"), ("p_first", "p_first")],
    threshold=0.8, left_id="left_key", right_id="right_key")
print("strongest cross-half part matches:")
matches.orderBy(F.desc("score"), "left_key", "right_key").show(5)

# 5. market-basket association rules over the same co-purchase baskets
from hazelcast_jet_spark.operators.graph import association_rules  # noqa: E402

print("top association rules by lift:")
association_rules(lineitem, "l_orderkey", "l_partkey",
                  min_pair_count=2, max_basket=64, top_k=5).show()

# 6. "customers who bought X": item-item Jaccard top-k neighbors
from hazelcast_jet_spark.operators.graph import item_similarity_topk  # noqa: E402

print("top co-purchase neighbors per part:")
item_similarity_topk(lineitem, "l_orderkey", "l_partkey",
                     k=3, min_co=2).show(10)
