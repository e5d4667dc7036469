"""Event-sequence pattern matching — the reference's CEP demo
(/root/reference/examples/pattern-matching, TransactionTracking.java:
a keyed mapStateful state machine detecting event sequences).  Here:
operators/cep.match_sequence — lead() window functions, one shuffle.

Run: python examples/pattern_matching.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hazelcast_jet_spark import get_spark, load_table
from hazelcast_jet_spark.operators.cep import match_sequence

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("example-pattern-matching")

events = load_table(spark, sf_dir, "events")
matches = match_sequence(
    events, ["view", "view", "click"], key="user_id", within="1 DAY"
)
print(f"view→view→click sequences within 1 day: {matches.count()}")
matches.orderBy("user_id", "start_event_id").show(10)
