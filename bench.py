#!/usr/bin/env python
"""Benchmark harness: runs the declared queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop batch sink (full plan runs,
nothing collected to the driver).  A short warm-up query amortizes JVM/
codegen startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hazelcast_jet_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("hazelcast-jet-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + parquet footer caches + codegen
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
