#!/usr/bin/env python
"""Controlled A/B for the r11 driver-bench drift (VERDICT r11 "What's
wrong #2" / "Next round #3"): several TPC-H warm times roughly doubled
round-over-round with NO code change (tpch_q3 0.486→1.504 s), while the
builder's quiet-host run of the SAME 361-query registry recorded
0.942 s/q — so the question is whether suite GROWTH (20 new r11 queries
sharing the JVM: codegen cache, GC pressure, state-store dirs) taxes the
unchanged queries, or the driver host was simply contended.

The r10→r11 registry delta IS the 20 r11-session additions, so the
faithful reproduction is: measure the drifted queries in a fresh JVM
(condition A), then measure them again after running exactly those 20
extra queries first in the same JVM (condition B).  A ≈ B ⇒ the drift
is not suite pressure (host noise); B ≫ A ⇒ suite growth is a real tax
and bench.py needs session recycling.

One trial per process (the codegen cache lives in the JVM, so repeats
must not share one); run 3× per condition:

    for i in 1 2 3; do python tools/bench_drift_ab.py fresh; done
    for i in 1 2 3; do python tools/bench_drift_ab.py pressured; done

Prints one JSON line per trial: {"mode", "probe": {name: warm_sec},
"probe_cold": {...}, "prime_sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: the queries the r11 driver bench recorded ~2x slower with no code change
PROBE = ["tpch_q3_shipping_priority", "tpch_q7_volume_shipping",
         "tpch_q8_market_share", "transition_entropy_events"]

#: the exact r10->r11 registry delta (NOTES_r11 session additions) — the
#: only thing that changed between the two driver bench runs
PRIME = ["index_health_emb", "t_closeness_customer", "kalman_level_events",
         "khop_reach_parts", "ppr_copurchase", "streaming_quantile_sketch",
         "post_stratified_ate_orders", "cvm_drift_events", "fs_weights_docs",
         "ndcg_ivf_emb", "vocab_richness_docs", "streaming_kalman_events",
         "spearman_lineitem", "burrows_delta_docs", "coreness_hist_parts",
         "ratio_delta_orders", "theil_orders", "recursive_cte_surface",
         "lateral_topk_surface", "croston_demand_lineitem"]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "fresh"
    assert mode in ("fresh", "pressured"), mode
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hazelcast_jet_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench-drift-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)

    # the same three-lane warmup bench.py uses, so condition A matches
    # the bench's steady state for an early-alphabet query
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for warm in (entry_mod.q1_pricing_summary,
                 entry_mod.pandas_udf_text_metrics,
                 entry_mod.streaming_rolling_count):
        warm(spark, sf_dir).write.format("noop").mode("overwrite").save()

    prime_sec = 0.0
    if mode == "pressured":
        t0 = time.perf_counter()
        for name in PRIME:
            run(name)
        prime_sec = round(time.perf_counter() - t0, 2)

    cold = {n: run(n) for n in PROBE}
    warm = {n: min(run(n), run(n)) for n in PROBE}
    print(json.dumps({"mode": mode, "probe": warm, "probe_cold": cold,
                      "prime_sec": prime_sec}))


if __name__ == "__main__":
    main()
