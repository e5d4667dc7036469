"""Stream/batch enrichment via hash joins — the reference's enrichment
demo (/root/reference/examples/enrichment, Enrichment.java: hashJoin
against two IMaps).  Here: broadcast dimension joins through the
Pipeline façade's hash_join2.

Run: python examples/enrichment.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import Pipeline, Sinks, Sources, get_spark, load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-enrichment")

customers = load_table(spark, sf_dir, "customer")
nations = load_table(spark, sf_dir, "nation")

enriched = (
    Pipeline.create(spark)
    .read_from(Sources.map(f"{sf_dir}/orders.parquet"))
    .hash_join2(
        customers, F.col("o_custkey") == F.col("c_custkey"),
        nations.select("n_nationkey", "n_name"),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    .map("o_orderkey", "o_totalprice", "c_name", F.col("n_name").alias("nation"))
    .write_to(Sinks.observable())
)
for row in enriched[:5]:
    print(row)
