"""CDC ingestion — Debezium-style change stream applied to a keyed table
(/root/reference/extensions/cdc-debezium, examples/cdc).

Run: python examples/cdc_pipeline.py
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hazelcast_jet_spark import get_spark
from hazelcast_jet_spark.streaming.cdc import cdc_apply, parse_debezium

spark = get_spark("example-cdc")
work = tempfile.mkdtemp(prefix="cdc_example")
src, tbl, ckpt = f"{work}/src", f"{work}/accounts", f"{work}/ckpt"
os.makedirs(src)

env = lambda op, ts, before, after: json.dumps(
    {"op": op, "ts_ms": ts, "before": before, "after": after}
)
with open(f"{src}/changes.jsonl", "w") as f:
    f.write(env("r", 0, None, {"id": 1, "name": "alice", "balance": 100}) + "\n")
    f.write(env("r", 0, None, {"id": 2, "name": "bob", "balance": 50}) + "\n")
    f.write(env("u", 10, None, {"id": 2, "name": "bob", "balance": 75}) + "\n")
    f.write(env("d", 20, {"id": 1, "name": "alice", "balance": 100}, None) + "\n")

stream = spark.readStream.schema("value string").text(src)
changes = parse_debezium(stream, "id bigint, name string, balance bigint")
query = cdc_apply(changes, tbl, ["id"], checkpoint=ckpt)
query.awaitTermination()

print("final table after INSERT/UPDATE/DELETE replay:")
spark.read.parquet(tbl).show()
