"""IMDG-connector analogs — the reference's ``examples/imdg-connectors``
(IMap / ICache / IList as pipeline sources and sinks), re-expressed on
managed columnar tables:

- ``Sources.map`` / ``Sources.cache`` / ``Sources.remote_map`` — an IMap
  is a keyed table; scanning one is a parquet/table scan,
- ``Sinks.map`` — writing back materializes the table,
- keyed point-updates (``mapWithMerging``) go through
  ``storage.KeyedParquetTable`` — O(changed-buckets) rewrites,
- ``Sources.list`` — the single-partition IList of inline items.

Run: python examples/imdg_connectors.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import Pipeline, Sinks, Sources, get_spark
from hazelcast_jet_spark.storage import KeyedParquetTable

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-imdg-connectors")
work = tempfile.mkdtemp(prefix="imdg_connectors_")

# IMap source: scan the 'nation' table like Sources.map("nation")
p = Pipeline.create(spark)
nations = p.read_from(Sources.map(os.path.join(sf_dir, "nation.parquet")))
print("IMap scan (Sources.map):")
nations.df.select("n_nationkey", "n_name").orderBy("n_nationkey").show(5)

# IMap sink: write an aggregate back as a managed table (Sinks.map)
per_region = nations.df.groupBy("n_regionkey").agg(
    F.count(F.lit(1)).alias("n_nations"))
out_map = os.path.join(work, "region_counts")
Sinks.map(out_map)(per_region)
print("IMap sink round trip:",
      spark.read.parquet(out_map).orderBy("n_regionkey").count(), "rows")

# mapWithMerging analog: keyed upserts rewrite only the touched buckets
table = KeyedParquetTable(os.path.join(work, "keyed"), ["n_nationkey"],
                          num_buckets=4)
table.overwrite(nations.df.select("n_nationkey", "n_name"))
change = spark.createDataFrame([(0, "RENAMED")],
                               "n_nationkey long, n_name string")
rewritten = table.apply(change, change.select("n_nationkey"))
got = {r["n_nationkey"]: r["n_name"] for r in table.read(spark).collect()}
print(f"keyed upsert rewrote {len(rewritten)}/4 buckets; nation 0 ->", got[0])

# IList source: inline items, single partition
items = Pipeline.create(spark).read_from(
    Sources.list([(1, "a"), (2, "b")], "k long, v string"))
print("IList rows:", items.df.count())
