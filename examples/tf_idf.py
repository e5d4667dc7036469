"""TF-IDF — the reference's flagship fork/join DAG demo
(/root/reference/examples/tf-idf, TfIdf.java): tokenize, per-doc term
frequency, document frequency, inverted index.  Here: three declarative
aggregations (operators/text.tf_idf).

Run: python examples/tf_idf.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.text import tf_idf

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-tf-idf")

docs = load_table(spark, sf_dir, "documents")
scored = tf_idf(docs, "doc_id", "text", log_idf=True)

# top 3 most characteristic terms of each of the first 5 docs
w = Window.partitionBy("doc_id").orderBy(F.desc("tf_idf"), "term")
(
    scored.filter(F.col("doc_id") < 5)
    .withColumn("rank", F.row_number().over(w))
    .filter(F.col("rank") <= 3)
    .orderBy("doc_id", "rank")
    .show(15, truncate=False)
)
