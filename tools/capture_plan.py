#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries into plans/r12/.

Usage: python tools/capture_plan.py [--suffix after] name [name ...]
"""
from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-dir", default=os.path.join(REPO, "plans", "r12"))
    args = ap.parse_args()

    from hazelcast_jet_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark("capture-plan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
