"""Streaming first-order event-transition counting — the live twin of
``operators/timeseries.event_transitions`` (reference analog: a keyed
``mapStateful`` over the event journal, TransformStatefulP.java:48).

Per-key state is ONE carried event (its time, order id and type): each
micro-batch sorts its own rows, stitches them onto the carried last
event, and emits the batch's (from_type, to_type) DELTA counts — so the
downstream sum over all emissions equals the batch transition matrix.
State is O(1) per key however long the stream runs.

Correct under per-key in-order delivery across micro-batches (the event
journal / Kafka-partition ordering assumption; within a batch, rows are
sorted).  A later batch delivering an EARLIER event for a key would
stitch it after the carried one — same caveat as every
record-at-a-time stateful operator, documented rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
    on_out_of_order: str = "raise",
) -> DataFrame:
    """Keyed stateful transition counter over a streaming DataFrame.

    Returns a streaming frame of per-batch delta rows ``(from_type,
    to_type, cnt)`` (update mode); ``sum(cnt)`` per pair over the full
    run equals the batch :func:`~hazelcast_jet_spark.operators.
    timeseries.event_transitions` counts.  Event-time state is stored
    as integer MICROseconds (never float epoch — Arrow rejects the
    timestamp cast on float ns-residue).

    ``on_out_of_order`` polices the documented in-order-per-key contract:
    a micro-batch delivering an event OLDER than the carried state would
    otherwise stitch it after the carried one and silently corrupt the
    matrix.  ``"raise"`` (default) fails the batch loudly;
    ``"drop"`` discards the late rows and keeps counting.
    """
    import pandas as pd

    from hazelcast_jet_spark.streaming.stateful import map_stateful_stream

    if on_out_of_order not in ("raise", "drop"):
        raise ValueError(
            f"on_out_of_order must be 'raise' or 'drop', "
            f"got {on_out_of_order!r}")

    def fn(key, pdfs, state):
        from collections import Counter

        if state.exists:
            last_us, last_id, last_type = state.get
        else:
            last_us, last_id, last_type = None, None, None
        parts = [p for p in pdfs if len(p)]
        counts: Counter = Counter()
        if parts:
            rows = (pd.concat(parts, ignore_index=True)
                    .sort_values([time_col, order_col]))
            if last_us is not None:
                us = rows[time_col].map(
                    lambda t: int(pd.Timestamp(t).value // 1000))
                late = (us < last_us) | (
                    (us == last_us) & (rows[order_col] < last_id))
                if bool(late.any()):
                    if on_out_of_order == "raise":
                        raise RuntimeError(
                            f"stream_event_transitions: key {key} got "
                            f"{int(late.sum())} event(s) older than the "
                            f"carried state (last_us={last_us}, "
                            f"last_id={last_id}) — per-key in-order "
                            f"delivery violated (see operator contract); "
                            f"pass on_out_of_order='drop' to discard")
                    rows = rows[~late]
                    if not len(rows):
                        return
            prev = last_type
            for ty in rows[type_col].tolist():
                if prev is not None:
                    counts[(prev, ty)] += 1
                prev = ty
            tail = rows.iloc[-1]
            state.update((
                int(pd.Timestamp(tail[time_col]).value // 1000),
                int(tail[order_col]),
                str(tail[type_col]),
            ))
        if counts:
            yield pd.DataFrame({
                "from_type": [a for (a, _b) in counts],
                "to_type": [b for (_a, b) in counts],
                "cnt": list(counts.values()),
            })

    return map_stateful_stream(
        events.select(key_col, time_col, order_col, type_col),
        [key_col], fn,
        output_schema="from_type string, to_type string, cnt bigint",
        state_schema="last_us bigint, last_id bigint, last_type string",
        output_mode="update",
    )
