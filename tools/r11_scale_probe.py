#!/usr/bin/env python
"""10x scale-sanity probe for the r11-session gate queries: warm
(min of 2) wall time at sf0.01 vs sf0.1 on one session — the
PERFORMANCE.md per-round convention."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "index_health_emb", "t_closeness_customer", "kalman_level_events",
    "khop_reach_parts", "ppr_copurchase", "streaming_quantile_sketch",
    "post_stratified_ate_orders", "cvm_drift_events", "fs_weights_docs",
    "ndcg_ivf_emb", "vocab_richness_docs", "streaming_kalman_events",
    "spearman_lineitem", "burrows_delta_docs", "coreness_hist_parts",
    "ratio_delta_orders", "theil_orders",
]


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("r11-scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs = m.queries()
    results = {}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        for name in QUERIES:
            times = []
            for _ in range(3):  # 1 cold + 2 warm
                t0 = time.perf_counter()
                qs[name](spark, sf).collect()
                times.append(time.perf_counter() - t0)
            warm = min(times[1:])
            results.setdefault(name, {})[sf] = warm
            print(f"{name} {sf.rsplit('/', 1)[1]}: warm {warm:.2f}s "
                  f"(cold {times[0]:.2f}s)", flush=True)
    print("\n| query | sf0.01 warm | sf0.1 warm | ratio |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a = results[name]["/root/testdata/sf0.01"]
        b = results[name]["/root/testdata/sf0.1"]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")


if __name__ == "__main__":
    main()
