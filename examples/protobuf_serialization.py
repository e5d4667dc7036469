"""Protobuf-encoded values — the reference's protobuf demo
(/root/reference/examples/protobuf: ProtobufSerializer registered for
IMap values).  Here: proto_io field-spec codec — encode rows to proto3
wire format, ship as a binary column, decode back; both directions are
Arrow-batched pandas UDFs.

Run: python examples/protobuf_serialization.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark import proto_io

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-protobuf")

SPEC = [
    (1, "n_nationkey", "int64"),
    (2, "n_name", "string"),
    (3, "n_regionkey", "int64"),
]

nations = load_table(spark, sf_dir, "nation")
wire = nations.select(
    proto_io.encode_udf(SPEC)(
        F.struct(
            F.col("n_nationkey").cast("long"),
            F.col("n_name"),
            F.col("n_regionkey").cast("long"),
        )
    ).alias("pb")
)
print("wire sizes:", wire.select(F.length("pb").alias("bytes")).agg(
    F.min("bytes"), F.max("bytes")).collect())

decoded = wire.select(proto_io.decode_udf(SPEC)("pb").alias("m")).select("m.*")
decoded.orderBy("n_nationkey").show(5)
