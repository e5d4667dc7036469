"""JDBC pipeline — the reference's ``examples/jdbc`` (Sources.jdbc /
Sinks.jdbc) plus this engine's XA-analog exactly-once sink
(``Sinks.jdbc_transactional`` — per-epoch staging + one atomic
publish-and-mark transaction instead of 2PC), against embedded Derby.

Run: python examples/jdbc_exactly_once.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import Sinks, Sources, get_spark, load_table

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-jdbc")
work = tempfile.mkdtemp(prefix="jdbc_example_")
url = f"jdbc:derby:{work}/db;create=true"
drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

# plain Sources.jdbc / Sinks.jdbc round trip
nations = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
Sinks.jdbc(url, "nations", **drv)(nations)
back = Sources.jdbc(url, "nations", **drv)(spark)
print("plain JDBC round trip:", back.count(), "rows")

# exactly-once epochs: a replayed epoch must not duplicate rows
sink = Sinks.jdbc_transactional(url, "region_counts", **drv)
counts = (load_table(spark, sf_dir, "nation")
          .groupBy("n_regionkey").agg(F.count(F.lit(1)).alias("n")))
sink.publish_epoch(counts, 0)
sink.publish_epoch(counts, 0)  # replay (crash-between-commit-and-checkpoint)
got = Sources.jdbc(url, "region_counts", **drv)(spark)
print("exactly-once sink after replayed epoch:", got.count(),
      "rows (no duplicates)")
assert got.count() == counts.count()
