#!/usr/bin/env python
"""State-store scale probe (r10 verdict "Next round #6").

The streaming twins all use complete-mode BOUNDED state (one row per
user / per distinct triple), so the 100 TB design claim rests on state
staying calendar/user-bounded.  This probe makes that claim measurable:
it grows the keyed state 10× with synthetic users (and synthetic
fingerprint variants for the corpus card's triple grain), runs the top
streaming twins' state operators as REAL multi-batch streams under both
state-store providers, and records from ``StreamingQueryProgress``:

- ``numRowsTotal`` — state-store rows after the final batch
- ``memoryUsedBytes`` — provider-reported state memory
- per-batch trigger latency (mean and max over the batches)

Usage:
    python tools/state_scale_probe.py [--sf-dir DIR] [--mults 1,10]
        [--batches 4] [--json-out PATH]

The results table goes into PERFORMANCE.md; the RocksDB rows document
the switch-over point (state no longer on the JVM heap) the
``use_rocksdb_state`` helper provides for the beyond-bounded regime.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _grown_events(spark, sf_dir: str, mult: int, n_files: int, out: str):
    """events replicated ``mult``× with disjoint synthetic user ids, split
    into ``n_files`` files so maxFilesPerTrigger=1 yields real batches."""
    from pyspark.sql import functions as F

    from hazelcast_jet_spark.session import load_table

    e = load_table(spark, sf_dir, "events").select("user_id", "ts",
                                                   "event_type")
    grown = (e.crossJoin(
        spark.range(mult).select(F.col("id").alias("__rep")))
        .select((F.col("user_id") + F.col("__rep") * F.lit(10_000_000))
                .alias("user_id"), "ts", "event_type"))
    for i in range(n_files):
        (grown.filter(F.pmod(F.col("user_id"), n_files) == i).coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(out, f"f{i}")))
    return grown.count()


def _grown_docs(spark, sf_dir: str, mult: int, n_files: int, out: str):
    """documents replicated ``mult``× with per-replica text suffixes so
    the (source, lang, fingerprint) state grain grows ``mult``×."""
    from pyspark.sql import functions as F

    from hazelcast_jet_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source")
    grown = (d.crossJoin(
        spark.range(mult).select(F.col("id").alias("__rep")))
        .select((F.col("doc_id") + F.col("__rep") * F.lit(10_000_000))
                .alias("doc_id"),
                F.concat("text", F.lit(" replica"),
                         F.col("__rep").cast("string")).alias("text"),
                "lang", "source"))
    for i in range(n_files):
        (grown.filter(F.pmod(F.col("doc_id"), n_files) == i).coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(out, f"f{i}")))
    return grown.count()


def _run_stream(spark, src_dir: str, schema, build_agg, rocksdb: bool):
    """Stream src_dir files one per batch through the complete-mode agg;
    return (progress summary dict)."""
    from hazelcast_jet_spark.streaming.run import use_rocksdb_state

    use_rocksdb_state(spark, rocksdb)
    try:
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(os.path.join(src_dir, "f*")))
        name = f"probe_{uuid.uuid4().hex[:10]}"
        q = (build_agg(stream).writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        progresses = [json.loads(p.json) if hasattr(p, "json") else p
                      for p in q.recentProgress]
    finally:
        use_rocksdb_state(spark, False)
    batches = [p for p in progresses if p.get("numInputRows", 0) > 0]
    ops = [p["stateOperators"][0] for p in batches if p.get("stateOperators")]
    durs = [p["durationMs"]["triggerExecution"] for p in batches]
    return {
        "n_batches": len(batches),
        "state_rows": ops[-1]["numRowsTotal"] if ops else None,
        "state_memory_bytes": ops[-1]["memoryUsedBytes"] if ops else None,
        "batch_ms_mean": round(sum(durs) / len(durs), 1) if durs else None,
        "batch_ms_max": max(durs) if durs else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mults", default="1,10")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()
    mults = [int(x) for x in args.mults.split(",")]

    from pyspark.sql import SparkSession, functions as F

    from hazelcast_jet_spark.operators.experiment import user_firsts
    from hazelcast_jet_spark.operators.profile import (
        corpus_card_stream_counters)

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("state-scale-probe")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="state_probe_")
    results = []
    try:
        for mult in mults:
            edir = os.path.join(work, f"events_x{mult}")
            n_ev = _grown_events(spark, args.sf_dir, mult, args.batches,
                                 edir)
            eschema = spark.read.parquet(os.path.join(edir, "f0")).schema
            ddir = os.path.join(work, f"docs_x{mult}")
            n_docs = _grown_docs(spark, args.sf_dir, mult, args.batches,
                                 ddir)
            dschema = spark.read.parquet(os.path.join(ddir, "f0")).schema
            for rocksdb in (False, True):
                r1 = _run_stream(
                    spark, edir, eschema,
                    lambda s: user_firsts(s, "user_id", "ts", "event_type",
                                          "purchase"),
                    rocksdb)
                results.append({"query": "streaming_msprt(user_firsts)",
                                "mult": mult, "input_rows": n_ev,
                                "provider": "rocksdb" if rocksdb
                                else "hdfs-heap", **r1})
                r2 = _run_stream(
                    spark, ddir, dschema,
                    lambda s: corpus_card_stream_counters(s), rocksdb)
                results.append(
                    {"query": "streaming_corpus_card(counters)",
                     "mult": mult, "input_rows": n_docs,
                     "provider": "rocksdb" if rocksdb else "hdfs-heap",
                     **r2})
                print(results[-2], flush=True)
                print(results[-1], flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    hdr = ("| query | state mult | provider | input rows | state rows | "
           "state MB | batch ms (mean/max) |")
    print("\n" + hdr)
    print("|---" * 7 + "|")
    for r in results:
        mb = (r["state_memory_bytes"] or 0) / 1e6
        print(f"| {r['query']} | {r['mult']}x | {r['provider']} | "
              f"{r['input_rows']} | {r['state_rows']} | {mb:.1f} | "
              f"{r['batch_ms_mean']}/{r['batch_ms_max']} |")
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
