"""Custom streaming trade source — the reference's demo
(/root/reference/examples/trade-source: a SourceBuilder stream emitting
random trades, consumed by a windowed pipeline).  Here the source is
deterministic and OFFSET-REPLAYABLE (poll/replay contract — the
exactly-once half Jet gets from snapshotting the source state), built on
``SourceBuilder.stream`` over the Python data source API, then rolled up
into per-ticker volume.

Run: python examples/trade_source.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark
from hazelcast_jet_spark.source_builder import SourceBuilder

spark = get_spark("example-trade-source")

TICKERS = ("AAPL", "GOOG", "MSFT")
BATCH, TOTAL = 50, 400


def make_trades(start: int, end: int) -> list:
    return [
        (i, TICKERS[i % len(TICKERS)], 100 + (i * 7) % 50, (i * 13) % 900)
        for i in range(start, end)
    ]


def poll(state, offset):
    start = offset["offset"]
    if start >= TOTAL:                       # bounded demo: source drains
        return [], offset
    end = min(start + BATCH, TOTAL)
    return make_trades(start, end), {"offset": end}


trades = (
    SourceBuilder.stream("trade_source_demo")
    .schema("seq long, ticker string, price long, qty long")
    .poll(poll)
    .replay(lambda state, start, end: make_trades(start["offset"], end["offset"]))
    .build(spark)
)

volume = trades.groupBy("ticker").agg(
    F.count(F.lit(1)).alias("trades"),
    F.sum(F.col("price") * F.col("qty")).alias("volume"),
)
# micro-batch trigger: the source emits one poll window per batch, so
# keep triggering until the bounded demo source drains
q = (volume.writeStream.format("memory").queryName("trade_volume")
     .outputMode("complete").trigger(processingTime="250 milliseconds")
     .start())
deadline = time.time() + 60
while time.time() < deadline:
    rows = {r["ticker"]: r["trades"]
            for r in spark.table("trade_volume").collect()}
    if sum(rows.values()) >= TOTAL:
        break
    time.sleep(0.5)
q.stop()
spark.table("trade_volume").orderBy("ticker").show()
assert sum(rows.values()) == TOTAL, rows
