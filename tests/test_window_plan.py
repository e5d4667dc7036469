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
    names = list(entry_mod.queries().keys())
    deferred = set(entry_mod.NEXT_ROUND_LEADS)
    plan = recommended(names, deferred, REPO)
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
    green = last_green_rounds(REPO)
    never = [n for n in names if n not in green and n not in deferred]
    if len(never) >= WINDOW:
        pytest.skip("more never-checked queries than window slots")
    window = set(names[:WINDOW])
    missing = [n for n in never if n not in window]
    assert not missing, f"never-driver-checked queries outside window: {missing}"
