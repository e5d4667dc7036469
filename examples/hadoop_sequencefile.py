"""Hadoop InputFormat reads — the reference's demo
(/root/reference/examples/hadoop: wordcount over HDFS via
HadoopSources.inputFormat).  Spark bundles the Hadoop client, so the
SequenceFile path works with zero extra jars: write (K, V) Writables,
read them back through ``HadoopSources.input_format``, and run the
wordcount shape over the values.

Run: python examples/hadoop_sequencefile.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark
from hazelcast_jet_spark.sources import HadoopSources

spark = get_spark("example-hadoop-sequencefile")

work = tempfile.mkdtemp(prefix="jet_spark_hadoop_")
seq_dir = os.path.join(work, "lines.seq")
lines = [
    (1, "to be or not to be"),
    (2, "that is the question"),
    (3, "to sleep perchance to dream"),
]
spark.sparkContext.parallelize(lines, 2).saveAsSequenceFile(seq_dir)

docs = HadoopSources.input_format(
    "org.apache.hadoop.mapred.SequenceFileInputFormat", seq_dir,
    key_col="line_no", value_col="line")(spark)
counts = (
    docs.select(F.explode(F.split("line", r"\s+")).alias("word"))
    .groupBy("word").count().orderBy(F.col("count").desc(), "word")
)
counts.show()
assert counts.first()["word"] == "to" and counts.first()["count"] == 4
shutil.rmtree(work, ignore_errors=True)
