"""Co-group — joint aggregation of two keyed stages
(/root/reference/examples/co-group, BatchCoGroup.java).

Run: python examples/co_group.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import AggregateOperations as agg
from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.joins import co_group

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-co-group")

orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
customers = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")

out = co_group(
    customers, orders, "custkey",
    {"n_cust_rows": agg.counting(), "balance": F.round(F.sum("c_acctbal"), 2)},
    {"n_orders": agg.counting(), "spend": F.round(F.sum("o_totalprice"), 2)},
)
out.orderBy(F.col("spend").desc_nulls_last()).show(10)
