"""Event-sequence pattern matching (CEP).

Reference: ``examples/pattern-matching`` — Jet detects event sequences
with keyed ``mapStateful`` folding a per-key state machine
(examples/pattern-matching/src/main/java/com/hazelcast/jet/examples/
patternmatching/TransactionTracking.java), because Jet has no declarative
pattern operator.  Spark-first re-expression: a strict-contiguity
sequence match is a *window-function* problem — ``lead(type, i) OVER
(PARTITION BY key ORDER BY time)`` — which keeps the whole match on the
JVM in one shuffle (no per-row Python, no state machine), is exactly
SQL-expressible for the oracle, and scales as an ordinary windowed scan.

Semantics (MATCH_RECOGNIZE's ``A B C`` with strict contiguity, one match
row per starting event, overlapping matches allowed — the same matches a
Jet state machine emitting on every completed sequence would produce):

- events of one ``key`` are ordered by ``(time_col, *tiebreak)``;
- a match is ``k`` *consecutive* events whose ``type_col`` values equal
  ``pattern`` in order;
- optional ``within``: the last event's time must be ``<= first event's
  time + within`` (an INTERVAL string, e.g. ``'1 hour'``) — interval
  arithmetic on TIMESTAMP_NTZ, so session-timezone independent.

For gaps-allowed matching ("A eventually followed by B"), compose two
passes or use :func:`hazelcast_jet_spark.streaming.stateful` — strict
contiguity is what the reference example computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def match_sequence(
    df: DataFrame,
    pattern: list[str],
    key: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within: str | None = None,
) -> DataFrame:
    """One row per event that STARTS a full pattern match.

    Returns ``key, start_<id>, start_<time>, end_<id>, end_<time>``.
    ``(time_col, id_col)`` must be a per-key unique ordering.
    """
    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    k = len(pattern)
    w = Window.partitionBy(key).orderBy(time_col, id_col)

    cond = F.col(type_col) == pattern[0]
    for i in range(1, k):
        cond = cond & (F.lead(type_col, i).over(w) == pattern[i])
    end_ts = F.lead(time_col, k - 1).over(w)
    end_id = F.lead(id_col, k - 1).over(w)
    if within is not None:
        cond = cond & (end_ts <= F.col(time_col) + F.expr(f"INTERVAL {within}"))

    return (
        df.select(
            F.col(key),
            F.col(id_col).alias(f"start_{id_col}"),
            F.col(time_col).alias(f"start_{time_col}"),
            end_id.alias(f"end_{id_col}"),
            end_ts.alias(f"end_{time_col}"),
            cond.alias("__match"),
        )
        .filter(F.col("__match"))
        .drop("__match")
    )
