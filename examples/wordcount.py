"""Word count — the reference's canonical example
(/root/reference/examples/wordcount, WordCountTest.java).

Run: python examples/wordcount.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import AggregateOperations as agg
from hazelcast_jet_spark import Pipeline, Sinks, Sources, get_spark

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-wordcount")

result = (
    Pipeline.create(spark)
    .read_from(Sources.map(f"{sf_dir}/documents.parquet"))
    .flat_map(F.split(F.trim("text"), r"\s+"), alias="word", keep=[])
    .filter(F.length("word") > 0)
    .grouping_key("word")
    .aggregate(cnt=agg.counting())
    .write_to(Sinks.observable())
)
for row in sorted(result, key=lambda r: -r["cnt"])[:10]:
    print(f"{row['word']:>12}  {row['cnt']}")
