#!/usr/bin/env python
"""Streaming-latency A/B for the r11 p99 rise (VERDICT r11 "Next round
#5"): the driver's micro-batch latency probe recorded p99 123→180 ms
round-over-round with stream_probe_version unchanged.  Candidate causes:
(a) host contention on the driver box, (b) the r11 session's extra
registered streaming queries running earlier in the same bench JVM
(state-store providers, checkpoint dirs, Python worker pools staying
resident and taxing the trigger loop).

Reproduction mirrors tools/bench_drift_ab.py: the probe is run 5× in a
fresh JVM (condition A), and 5× after first executing the r11-added
streaming gate queries in the same JVM (condition B — the exact bench
delta).  One condition per process; run:

    python tools/latency_probe_ab.py fresh
    python tools/latency_probe_ab.py pressured

Prints one JSON line: {"mode", "p50_runs", "p99_runs"}.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: streaming queries added to the suite in r11 (run before the latency
#: probes in bench.py's name-ordered sweep)
PRIME = ["streaming_quantile_sketch", "streaming_kalman_events"]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "fresh"
    assert mode in ("fresh", "pressured"), mode
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hazelcast_jet_spark.session import get_spark
    import __spark_entry__ as entry_mod
    import bench

    spark = get_spark("latency-probe-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # bench's streaming-lane warmup so run 1 is steady-state
    entry_mod.streaming_rolling_count(spark, sf_dir).write \
        .format("noop").mode("overwrite").save()

    if mode == "pressured":
        qs = entry_mod.queries()
        for name in PRIME:
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()

    runs = [bench._stream_latency_probe(spark) for _ in range(5)]
    print(json.dumps({"mode": mode,
                      "p50_runs": [r[0] for r in runs],
                      "p99_runs": [r[1] for r in runs]}))


if __name__ == "__main__":
    main()
