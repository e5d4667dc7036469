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

# SCD2 history maintenance from the SAME change stream: instead of the
# current-state table above, keep the full validity-interval history
# (who was in which state, when) — rebuilt incrementally per batch for
# the touched keys only, idempotent under checkpoint replay
from hazelcast_jet_spark.storage import KeyedParquetTable  # noqa: E402
from hazelcast_jet_spark.streaming.scd2 import scd2_stream_maintain  # noqa: E402

hist = KeyedParquetTable(f"{work}/balance_history", ["id"], num_buckets=8)
stream2 = spark.readStream.schema("value string").text(src)
changes2 = parse_debezium(stream2, "id bigint, name string, balance bigint")
log = changes2.selectExpr(
    "coalesce(after.id, before.id) AS id",
    "ts_ms AS t",
    # track balance transitions; a delete closes the history with a
    # terminal 'DELETED' state
    "CASE WHEN op = 'DELETE' THEN 'DELETED' "
    "     ELSE CAST(after.balance AS STRING) END AS state",
    "ts_ms AS change_id")
q2 = scd2_stream_maintain(log, hist, "id", "t", "state", "change_id",
                          checkpoint=f"{work}/ckpt_hist")
q2.awaitTermination()
print("SCD2 balance history (validity intervals per account):")
hist.read(spark).orderBy("id", "version").show()
