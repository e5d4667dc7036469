#!/usr/bin/env python
"""Window-rotation planner: generates the recommended ``queries()``
ordering for the driver's 50-entry correctness window from the committed
CORRECTNESS_r*.json ledger, replacing the hand-maintained boundary
comments that produced the r7 off-by-one (fixed r8) — the r8 verdict's
"Next round #5".

Policy (the one every verdict since r5 has converged on):

1. **Never-driver-checked queries first**, in registry order — a query
   with zero green driver rows is strictly higher-value to check than a
   refresh of one that has already passed.
2. **Then checked queries, stalest green first** (ascending last-green
   round, ties broken by registry position) — so the r2-era cohort
   rotates back through the window before anything newer.

Queries named in ``__spark_entry__.NEXT_ROUND_LEADS`` are *deferred*:
registered after the current round's window froze, they are excluded
from this round's recommendation and become next round's leads (the
r7/r8 handoff convention, now machine-readable).

Usage:
    python tools/window_plan.py              # print the 50-slot plan
    python tools/window_plan.py --check      # exit 1 if the registry's
                                             # first 50 differ from plan
    python tools/window_plan.py --full       # the full ordering

``tests/test_window_plan.py`` runs ``--check`` logic in the suite, so a
new round cannot freeze a window the ledger disagrees with.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50


def last_green_rounds(repo: str = REPO,
                      before_round: int | None = None) -> dict[str, int]:
    """query -> latest round with a fully-green driver row (rows + schema
    + hash when the driver computed one).

    ``before_round`` freezes the view: ledgers CORRECTNESS_r{N}.json with
    N >= before_round are ignored.  The registry pin passes the entry
    file's ``WINDOW_ROUND`` here so the driver dropping the CURRENT
    round's ledger mid-round cannot retroactively change the plan the
    window was frozen against (r9 verdict "What's wrong #1").
    """
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rnd = int(base.split("_r")[1].split(".")[0])
        except (IndexError, ValueError):
            continue
        if before_round is not None and rnd >= before_round:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for name, r in rows.items():
            green = (
                r.get("err") in (None, "")
                and r.get("rows_match") is True
                and r.get("schema_match") is True
                and r.get("hash_match") in (True, None)  # None = rows-only check
            )
            if green:
                out[name] = max(out.get(name, 0), rnd)
    return out


def recommended(registry_names: list[str] | None = None,
                deferred: set[str] | None = None,
                repo: str = REPO,
                before_round: int | None = None) -> list[str]:
    """Full recommended ordering (window = first ``WINDOW`` entries)."""
    if registry_names is None or deferred is None:
        import __spark_entry__ as entry_mod
        if registry_names is None:
            registry_names = list(entry_mod.queries().keys())
        if deferred is None:
            deferred = set(getattr(entry_mod, "NEXT_ROUND_LEADS", ()))
    green = last_green_rounds(repo, before_round)
    pos = {n: i for i, n in enumerate(registry_names)}
    active = [n for n in registry_names if n not in deferred]
    never = [n for n in active if n not in green]
    checked = sorted((n for n in active if n in green),
                     key=lambda n: (green[n], pos[n]))
    return never + checked + [n for n in registry_names if n in deferred]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit nonzero if registry[:50] != plan[:50]")
    ap.add_argument("--full", action="store_true", help="print full ordering")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    names = list(entry_mod.queries().keys())
    deferred = set(getattr(entry_mod, "NEXT_ROUND_LEADS", ()))
    freeze = getattr(entry_mod, "WINDOW_ROUND", None)
    # --check validates the FROZEN window (ledgers < WINDOW_ROUND only);
    # the plain/--full listing is the LIVE plan for freezing the next one.
    plan = recommended(names, deferred,
                       before_round=freeze if args.check else None)
    green = last_green_rounds()

    if args.check:
        want, got = plan[:WINDOW], names[:WINDOW]
        if want == got:
            print(f"OK: registry window matches plan ({WINDOW} entries, "
                  f"{len(names)} registered, {len(deferred)} deferred)")
            return
        for i, (w, g) in enumerate(zip(want, got)):
            if w != g:
                print(f"slot {i + 1}: plan={w!r} registry={g!r}")
        sys.exit(1)

    show = plan if args.full else plan[:WINDOW]
    for i, n in enumerate(show):
        tag = f"r{green[n]}-green" if n in green else "NEVER-CHECKED"
        defer = " [deferred]" if n in deferred else ""
        print(f"{i + 1:3d}  {n:40s} {tag}{defer}")


if __name__ == "__main__":
    main()
