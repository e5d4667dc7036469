"""Every example under examples/ must actually run (the reference ships
runnable examples with tests; examples/README.md maps them)."""

import pathlib
import runpy
import sys

import pytest

EXAMPLES = sorted(
    p for p in (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(spark, path, capsys, monkeypatch):
    # examples default to sf0.001 and call get_spark (getOrCreate → reuses
    # the test session); run each as __main__ in this process
    monkeypatch.setattr(sys, "argv", [str(path)])
    runpy.run_path(str(path), run_name="__main__")
