"""Custom batch source + custom sink — the reference's builder demo
(/root/reference/examples/source-sink-builder: SourceBuilder /
SinkBuilder).  Here: SourceBuilder.batch on Spark 4's Python data
source API, draining into an Observable sink.

Run: python examples/source_sink_builder.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hazelcast_jet_spark import Pipeline, Sinks, get_spark
from hazelcast_jet_spark.source_builder import SourceBuilder

spark = get_spark("example-source-sink-builder")


def create(partition_idx):
    return {"partition": partition_idx, "next": 0}


def fill(state, buf):
    # fillBufferFn: emit a few items per call; close() ends the partition
    for _ in range(5):
        if state["next"] >= 10:
            buf.close()
            return
        n = state["next"]
        buf.add((state["partition"], n, n * n))
        state["next"] += 1


src = (
    SourceBuilder.batch("squares")
    .schema("part int, n int, square int")
    .create(create)
    .fill(fill)
    .distributed(2)
)

rows = (
    Pipeline.create(spark)
    .read_from(src)
    .filter("square % 2 = 0")
    .write_to(Sinks.observable())
)
for r in sorted(rows, key=lambda r: (r["part"], r["n"])):
    print(r)
