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


def match_sequence_stream(
    df,
    pattern: list[str],
    key: str = "user_id",
    time_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within: str | None = None,
) -> DataFrame:
    """Streaming :func:`match_sequence` — the shape the reference example
    actually runs (a live event stream folded through a per-key state
    machine).  ``applyInPandasWithState`` holds the last ``k-1`` events
    per key (bounded state: k-1 tuples per key, independent of stream
    length) and emits a match row whenever the window of the newest k
    events equals the pattern.

    Same output schema and rows as the batch operator given the same
    (per-key time-ordered) input: micro-batch boundaries don't matter
    because the cross-boundary tail lives in state.  Input must arrive
    per-key time-ordered (true for a keyed journal / CDC feed; otherwise
    add_timestamps + a window sort upstream).

    The in-batch scan is vectorized (r4 verdict: the original per-event
    ``iterrows`` fold was the one interpreted-Python hot path left in the
    engine): the k-1 state tail is prepended to the batch arrays, then
    the pattern match is k numpy slice-compares AND-reduced over every
    window start, plus one slice-compare for ``within``.  Every window's
    END element lies in the new batch (the tail is < k long), so
    tail-only windows — already emitted last batch — cannot re-emit.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    if len(pattern) < 2:
        raise ValueError("pattern needs at least 2 steps")
    k = len(pattern)
    within_us = None
    if within is not None:
        n, unit = within.split()
        within_us = int(float(n) * {"SECOND": 1, "MINUTE": 60, "HOUR": 3600,
                                    "DAY": 86400}[unit.upper().rstrip("S")] * 1_000_000)

    dt = dict(df.dtypes)
    out_schema = (f"{key} {dt[key]}, start_{id_col} {dt[id_col]}, "
                  f"start_{time_col} {dt[time_col]}, "
                  f"end_{id_col} {dt[id_col]}, end_{time_col} {dt[time_col]}")
    # timestamps live in state as integer MICROseconds (Timestamp.value is
    # ns): a float-epoch round trip leaves ns residue that Arrow refuses
    # to truncate back to timestamp[us] on output
    state_schema = "ids array<long>, tss array<long>, types array<string>"
    cols = [key, f"start_{id_col}", f"start_{time_col}",
            f"end_{id_col}", f"end_{time_col}"]

    def fn(key_tuple, pdf_iter, state):
        if state.exists:
            t_ids, t_tss, t_types = (list(x) for x in state.get)
        else:
            t_ids, t_tss, t_types = [], [], []
        frames = []
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values([time_col, id_col])
            ids = np.concatenate([
                np.asarray(t_ids, dtype=np.int64),
                pdf[id_col].to_numpy(dtype=np.int64),
            ])
            tss = np.concatenate([
                np.asarray(t_tss, dtype=np.int64),
                pdf[time_col].to_numpy(dtype="datetime64[ns]").astype(np.int64)
                // 1000,
            ])
            types = np.concatenate([
                np.asarray(t_types, dtype=object),
                pdf[type_col].to_numpy(dtype=object),
            ])
            n = len(ids)
            if n >= k:
                m = np.ones(n - k + 1, dtype=bool)
                for j, p in enumerate(pattern):
                    m &= types[j:n - k + 1 + j] == p
                if within_us is not None:
                    m &= tss[k - 1:] <= tss[:n - k + 1] + within_us
                starts = np.nonzero(m)[0]
                if len(starts):
                    frames.append(pd.DataFrame({
                        cols[0]: key_tuple[0],
                        cols[1]: ids[starts],
                        cols[2]: pd.to_datetime(tss[starts] * 1000),
                        cols[3]: ids[starts + k - 1],
                        cols[4]: pd.to_datetime(tss[starts + k - 1] * 1000),
                    }))
            t_ids = [int(x) for x in ids[-(k - 1):]]
            t_tss = [int(x) for x in tss[-(k - 1):]]
            t_types = [str(x) for x in types[-(k - 1):]]
        state.update((t_ids, t_tss, t_types))
        # no-match groups yield nothing at all: with ~10k keys per batch,
        # serializing 10k empty frames through Arrow is pure overhead
        yield from frames

    return df.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
