"""Job metrics — Jet metric names over Spark's listener/observe APIs.

Reference: hazelcast-jet-core/src/main/java/com/hazelcast/jet/core/metrics/
MetricNames.java (emittedCount, receivedCount, lateEventsDropped,
totalKeys, …) and Metrics.metric() user metrics.

Spark surfaces the same signals through StreamingQueryListener progress
events and ``df.observe``; this module translates them to Jet's names so
dashboards keyed on Jet metrics keep working.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener


def progress_to_jet_metrics(progress) -> dict[str, float]:
    """Map a StreamingQueryProgress to Jet MetricNames (MetricNames.java)."""
    p = progress
    metrics = {
        "receivedCount": p.numInputRows,                     # MetricNames.RECEIVED_COUNT
        "emittedCount": sum(  # sink-side rows if reported
            (s.numOutputRows or 0) for s in [p.sink] if s is not None
        ),
        "totalKeys": 0.0,
        "lateEventsDropped": 0.0,
        "executionTimeMs": p.batchDuration,
    }
    for sop in p.stateOperators or []:
        metrics["totalKeys"] += sop.numRowsTotal or 0         # MetricNames.TOTAL_KEYS
        metrics["lateEventsDropped"] += getattr(sop, "numRowsDroppedByWatermark", 0) or 0
    return metrics


class JetMetricsListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener(JetMetricsListener(cb))``;
    ``cb(query_name, metrics_dict)`` fires per micro-batch."""

    def __init__(self, callback: Callable[[str, dict], None] | None = None):
        self.callback = callback
        self.latest: dict[str, dict[str, float]] = {}

    def onQueryStarted(self, event):  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        m = progress_to_jet_metrics(event.progress)
        name = event.progress.name or str(event.progress.id)
        self.latest[name] = m
        if self.callback:
            self.callback(name, m)

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass
