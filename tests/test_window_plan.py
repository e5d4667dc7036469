"""Pins the driver correctness window to the generated rotation plan.

The r8 verdict's "Next round #5": the 50-entry window `queries()` exposes
to the driver was hand-maintained with prose comments and had one
boundary bug (r7, fixed r8).  ``tools/window_plan.py`` now derives the
ordering from the CORRECTNESS_r*.json ledger; this test asserts the
registry actually follows it, so a round can't freeze a window the
ledger disagrees with.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import __spark_entry__ as entry_mod  # noqa: E402
from window_plan import WINDOW, last_green_rounds, recommended  # noqa: E402


def test_registry_window_matches_plan():
    """The pin is evaluated against the ledger state the window was
    FROZEN from (``WINDOW_ROUND``): CORRECTNESS ledgers from that round
    onward are excluded, so the driver dropping this round's artifact
    mid-round cannot re-redden the suite (r9 verdict "What's wrong #1").
    """
    names = list(entry_mod.queries().keys())
    deferred = set(entry_mod.NEXT_ROUND_LEADS)
    plan = recommended(names, deferred, REPO,
                       before_round=entry_mod.WINDOW_ROUND)
    assert names[:WINDOW] == plan[:WINDOW], (
        "queries()[:50] has drifted from tools/window_plan.py; rerun "
        "`python tools/window_plan.py --check` and reorder the registry"
    )


def test_deferred_leads_sit_below_the_boundary():
    names = list(entry_mod.queries().keys())
    window = set(names[:WINDOW])
    for name in entry_mod.NEXT_ROUND_LEADS:
        assert name in names, f"NEXT_ROUND_LEADS names unknown query {name!r}"
        assert name not in window, (
            f"{name!r} is declared deferred but sits inside the window"
        )


def test_never_checked_queries_lead_the_window():
    """No checked query may occupy a slot while an eligible never-checked
    query sits outside the window."""
    names = list(entry_mod.queries().keys())
    deferred = set(entry_mod.NEXT_ROUND_LEADS)
    green = last_green_rounds(REPO, before_round=entry_mod.WINDOW_ROUND)
    never = [n for n in names if n not in green and n not in deferred]
    if len(never) >= WINDOW:
        pytest.skip("more never-checked queries than window slots")
    window = set(names[:WINDOW])
    missing = [n for n in never if n not in window]
    assert not missing, f"never-driver-checked queries outside window: {missing}"


def test_pin_is_stable_under_new_ledger_drop(tmp_path):
    """r9 verdict "What's wrong #1": the driver dropping CORRECTNESS_r{N}
    for N >= WINDOW_ROUND mid-round must not change the frozen plan.
    Reproduces the failure mode against a sandboxed ledger copy."""
    import glob
    import json
    import shutil

    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / os.path.basename(p))
    names = list(entry_mod.queries().keys())
    deferred = set(entry_mod.NEXT_ROUND_LEADS)
    freeze = entry_mod.WINDOW_ROUND
    before = recommended(names, deferred, str(tmp_path), before_round=freeze)

    fake = {n: {"err": None, "rows_match": True, "schema_match": True,
                "hash_match": True} for n in names[:WINDOW]}
    with open(tmp_path / f"CORRECTNESS_r{freeze:02d}.json", "w") as fh:
        json.dump(fake, fh)
    with open(tmp_path / f"CORRECTNESS_r{freeze + 1:02d}.json", "w") as fh:
        json.dump(fake, fh)

    after = recommended(names, deferred, str(tmp_path), before_round=freeze)
    assert before == after, "frozen plan changed when a newer ledger landed"
    # ...while the LIVE (unfrozen) view does see the new ledger
    live = last_green_rounds(str(tmp_path))
    assert live[names[0]] == freeze + 1
