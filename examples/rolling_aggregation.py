"""Rolling aggregation over a live stream — the reference's demo
(/root/reference/examples/rolling-aggregation, TradingVolume.java:
rollingAggregate(summingLong) over a trade stream).  Here: a rate
source through the Pipeline façade's keyed rolling_aggregate, which
routes to an update-mode streaming groupBy on the JVM.

Run: python examples/rolling_aggregation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import AggregateOperations as agg
from hazelcast_jet_spark import Pipeline, TestSources, get_spark
from hazelcast_jet_spark.streaming.run import run_to_batch

spark = get_spark("example-rolling-aggregation")

# itemStream(rate): value column ~ trade amount, value % 5 ~ ticker id
trades = (
    Pipeline.create(spark)
    .read_from(TestSources.item_stream(1000))
    .with_column("ticker", F.concat(F.lit("T"), (F.col("value") % 5)))
    .grouping_key("ticker")
    .rolling_aggregate(agg.summing("value"), name="volume")
)

# bounded demo run: drain a few micro-batches, show the final totals
out = run_to_batch(trades.df, "update")
out.orderBy("ticker").show()
