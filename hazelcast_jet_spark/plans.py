"""Plan introspection & guardrails — the engine's answer to "would this
still run at 100 TB?" asked BEFORE the job does.

Jet exposes its executable graph for inspection (DAG.toDotString,
JobConfig validation); the Spark-first analog is auditing the physical
plan Catalyst actually produced: how many scans, how many shuffles,
which join strategies, whether a cartesian leg or an un-pushed filter
slipped in.  This module packages the checks the engine's own plan-pin
test suite applies to every gate query (tests/test_plans.py) as a
runtime API, so user pipelines can assert their plan shape in CI the
same way.

Use::

    from hazelcast_jet_spark.plans import plan_audit, assert_plan
    audit = plan_audit(df)             # dict of counts
    assert_plan(df, forbid=("CartesianProduct",), max_scans=1)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .pipeline import to_dot_string  # noqa: F401  (re-export beside audit)

#: Physical operators that do not survive a 100× scale-up: an unbounded
#: pair space (cartesian / broadcast nested loop over non-trivial sides)
#: is the default ``assert_plan`` forbid list.
SCALE_KILLERS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def plan_audit(df: DataFrame) -> dict:
    """One dict of plan-shape counters for a DataFrame's physical plan:

    ``scans`` (file sources read), ``exchanges`` (shuffles),
    ``broadcast_joins`` / ``sort_merge_joins`` / ``nested_loop_joins`` /
    ``cartesian`` (join strategies), ``windows``, ``sorts``,
    ``codegen_spans`` (whole-stage codegen regions — wider is better;
    ``None`` until the DataFrame has executed, since AQE materializes
    codegen per stage),
    ``pushed_filters`` (scans with a non-empty pushdown),
    ``read_columns`` (total columns across scan ReadSchemas — catches a
    SELECT * feeding a 2-column projection).

    Driver-side introspection only: nothing is executed.
    """
    plan = _formatted(df)
    # under AQE, codegen regions are materialized per executed stage —
    # before the DataFrame has run, the honest answer is "unknown"
    # (None); after a run the final plan carries the `*(n)` markers
    simple = df._jdf.queryExecution().executedPlan().toString()
    codegen = (len(set(re.findall(r"\*\((\d+)\)", simple)))
               if ("isFinalPlan=true" in simple
                   or "AdaptiveSparkPlan" not in simple) else None)
    scans = re.findall(r"\(\d+\) Scan \w+", plan)
    read_cols = sum(
        len(re.findall(r"\w+:", m))
        for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan))
    return {
        "scans": len(scans),
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "broadcast_joins": len(
            re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "sort_merge_joins": len(
            re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "nested_loop_joins": len(
            re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        "cartesian": len(re.findall(r"\(\d+\) CartesianProduct", plan)),
        "windows": len(re.findall(r"\(\d+\) Window", plan)),
        "sorts": len(re.findall(r"\(\d+\) Sort\b", plan)),
        "codegen_spans": codegen,
        "pushed_filters": len(re.findall(
            r"PushedFilters: \[(?!\])", plan)),
        "read_columns": read_cols,
    }


def assert_plan(df: DataFrame, forbid: tuple = SCALE_KILLERS,
                max_scans: int | None = None,
                max_exchanges: int | None = None,
                require_pushed_filters: bool = False) -> dict:
    """Raise ``AssertionError`` (with the offending counters) unless the
    physical plan satisfies the stated shape; returns the audit dict on
    success so callers can log it.  ``forbid`` names audit keys by
    operator (``CartesianProduct``→``cartesian``,
    ``BroadcastNestedLoopJoin``→``nested_loop_joins``,
    ``SortMergeJoin``→``sort_merge_joins``) or audit keys directly."""
    alias = {"CartesianProduct": "cartesian",
             "BroadcastNestedLoopJoin": "nested_loop_joins",
             "SortMergeJoin": "sort_merge_joins"}
    audit = plan_audit(df)
    problems = []
    for f in forbid:
        key = alias.get(f, f)
        if key not in audit:
            raise ValueError(f"unknown forbid entry {f!r}")
        if audit[key] > 0:
            problems.append(f"{f} present ({audit[key]})")
    if max_scans is not None and audit["scans"] > max_scans:
        problems.append(f"scans {audit['scans']} > {max_scans}")
    if max_exchanges is not None and audit["exchanges"] > max_exchanges:
        problems.append(
            f"exchanges {audit['exchanges']} > {max_exchanges}")
    if require_pushed_filters and audit["pushed_filters"] == 0:
        problems.append("no scan has a pushed filter")
    if problems:
        raise AssertionError(
            "plan-shape violations: " + "; ".join(problems)
            + f" — audit={audit}")
    return audit
