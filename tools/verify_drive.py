#!/usr/bin/env python
"""Driver-gate emulation CLI: a VANILLA SparkSession (hostile non-UTC
timezone, none of the repo's conftest configs) runs ``queries()`` entries
exactly the way the driver's correctness gate does and compares them
typed + float-bit-pattern against their DuckDB ``oracle_sql()`` twins
over the same parquet.

The driver only ever checks a 50-entry window per round, so window
rotation alone can never keep a 200+-query registry fresh; this tool
closes the loop by sweeping ANY subset — the round-close convention runs
``--all`` and records the tally in NOTES_r{N}.

Usage:
    python tools/verify_drive.py                 # the first-50 gate window
    python tools/verify_drive.py --all           # every registered query
    python tools/verify_drive.py --names a,b,c   # a specific subset
    python tools/verify_drive.py --since 10      # only queries with no
                                                 # green driver row in r>=10
    python tools/verify_drive.py --sf-dir /root/testdata/sf0.1 --all
    python tools/verify_drive.py --json-out /tmp/sweep.json --all

Exit status is non-zero if any checked query mismatches, so it can gate
a commit.  Queries with no oracle entry get the driver's weaker
rows-only check (runs + row count >= 0 + stable schema).
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import struct
import sys
import time
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm(v):
    """Type-tagged exact normalization — the driver hashes TYPED values,
    so int != float, Decimal != float, and floats compare by IEEE bit
    pattern (-0.0 != +0.0): the classes that produced the r4/r5/r6 red
    rows all fail this compare pre-driver."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", struct.pack(">d", v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm(x) for x in v))
    return (type(v).__name__, v)


def _sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in idx) for r in rows),
                  key=_sort_key)


def _duck(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    return [d[0] for d in cur.description], cur.fetchall()


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--all", action="store_true",
                    help="sweep every registered query (default: first 50)")
    ap.add_argument("--names", default="",
                    help="comma-separated subset of query names")
    ap.add_argument("--since", type=int, default=None, metavar="ROUND",
                    help="sweep only queries whose latest green DRIVER row "
                         "predates ROUND (plus never-checked ones) — the "
                         "round-close incremental sweep: --all re-verifies "
                         "queries the driver just confirmed, which at 300+ "
                         "registered entries costs >10 min for no signal "
                         "(r10 verdict #3)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tz", default="Pacific/Kiritimati",
                    help="hostile session timezone (driver configs are "
                         "unknown; UTC would mask tz bugs)")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--json-out", default="",
                    help="write the per-query result map to this path")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(args.master)
             .appName("verify-drive")
             .config("spark.sql.session.timeZone", args.tz)
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    queries, oracles = m.queries(), m.oracle_sql()
    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            ap.error(f"unknown queries: {unknown}")
    elif args.since is not None:
        from window_plan import last_green_rounds
        green = last_green_rounds(REPO)
        names = [n for n in queries
                 if green.get(n, -1) < args.since]
        print(f"--since {args.since}: {len(names)} of {len(queries)} "
              f"queries stale or never driver-checked")
    elif args.all:
        names = list(queries)
    else:
        names = list(queries)[:50]

    results: dict[str, dict] = {}
    bad = 0
    t_start = time.perf_counter()
    for i, name in enumerate(names, 1):
        t0 = time.perf_counter()
        rec: dict = {"oracle": name in oracles}
        try:
            sdf = queries[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(s_rows)
            if name in oracles:
                d_cols, d_rows = _duck(oracles[name], args.sf_dir)
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                rec["hash_match"] = (
                    rec["rows_match"] and rec["schema_match"]
                    and _canon(s_cols, s_rows) == _canon(d_cols, d_rows))
                ok = rec["hash_match"]
            else:
                # the driver's weaker rows-only check for non-SQL ops
                rec["rows_match"] = rec["schema_match"] = True
                rec["hash_match"] = None
                ok = True
            rec["err"] = None
        except Exception as e:  # noqa: BLE001 — must sweep past failures
            ok = False
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        rec["sec"] = round(time.perf_counter() - t0, 3)
        results[name] = rec
        if not ok:
            bad += 1
        status = "ok" if ok else ("ERROR" if rec["err"] else "MISMATCH")
        print(f"{i:3d}/{len(names)} {name}: {status} ({rec['sec']}s)",
              flush=True)

    total = round(time.perf_counter() - t_start, 1)
    print(f"\nsweep: {len(names) - bad}/{len(names)} green in {total}s "
          f"(sf={args.sf_dir}, tz={args.tz})")
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump({"green": len(names) - bad, "total": len(names),
                       "sf_dir": args.sf_dir, "tz": args.tz,
                       "sweep_sec": total, "results": results},
                      fh, indent=1, sort_keys=True)
            fh.write("\n")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
