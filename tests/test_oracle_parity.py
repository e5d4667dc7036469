"""The in-repo mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same sf0.01 parquet, and compare row count, column names, and values
(order-insensitive, exact after normalization).

If this passes, the driver's CORRECTNESS_r{N}.json hash compare should
pass for every query that declares an oracle.
"""

from __future__ import annotations

import datetime
import math
import os
import struct
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck(sql: str):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    # Exact, TYPE-TAGGED comparison: the driver's gate hashes typed values,
    # so int 902 must NOT equal float 902.0 and Decimal must not collapse to
    # float (both masked real driver failures in r1/r2 — scalar_functions'
    # ceil/floor returned BIGINT on Spark, DOUBLE on DuckDB, and the old
    # mirror passed while the driver hash failed).  Anything that needs
    # tolerance must be reformulated bit-exactly in the query itself, not
    # papered over here.
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
        # Compare BIT PATTERNS, not == : the r6 driver red row
        # (embedding_standardize_stats) was round() yielding -0.0 on
        # DuckDB and +0.0 on Spark — equal under Python ==, different
        # IEEE bits, different typed driver hash.  struct.pack makes
        # -0.0 != +0.0 here so the mirror catches the class pre-driver.
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


def _normalize(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in idx) for r in rows), key=_sort_key)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = _duck(ORACLES[name])

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} (spark) != {len(d_rows)} (duckdb)"
    )
    sn = _normalize(s_cols, s_rows)
    dn = _normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_every_query_has_oracle_or_is_declared():
    missing = set(QUERIES) - set(ORACLES)
    # The driver contract has NO rows-only notion (r4 verdict: the declared
    # rows-only kmeans slot produced an error row every round) — every gate
    # query must carry an oracle.  Iterative/non-SQL ops get a
    # deterministic SQL-twinnable gate shape instead (e.g.
    # kmeans_assign_counts) with the full algorithm pinned in pytest.
    allowed_rows_only: set[str] = set()
    assert missing <= allowed_rows_only, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_types_are_driver_safe(name):
    """Regression for the r4 dq_checks_orders red row: DuckDB widens
    SUM(BIGINT) to HUGEINT, the driver's typed hash then disagrees with
    Spark's BIGINT even for equal values — while this mirror passed,
    because fetchall() collapses HUGEINT to Python int.  DESCRIBE every
    oracle and reject HUGEINT/UHUGEINT outright (cast to BIGINT in the
    oracle instead)."""
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    rows = con.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [(r[0], r[1]) for r in rows if "HUGEINT" in str(r[1]).upper()]
    assert not bad, f"{name}: HUGEINT-typed oracle columns {bad}"
    # r5's second typed-representation red row (hll_cardinality_events): a
    # DECIMAL(38,0) output column passed fetchall() (both sides produce
    # decimal.Decimal) but failed the DRIVER's hash, because DuckDB's
    # pandas path coerces >18-precision DECIMAL to float64 while Spark's
    # toPandas keeps decimal.Decimal objects.  Reject any oracle output
    # column of DECIMAL with precision > 18 (cast to BIGINT/DOUBLE in the
    # oracle instead).
    import re as _re
    wide = []
    for cname, ctype in ((r[0], str(r[1]).upper()) for r in rows):
        m = _re.match(r"DECIMAL\((\d+),(\d+)\)", ctype)
        if m and int(m.group(1)) > 18:
            wide.append((cname, ctype))
    assert not wide, (
        f"{name}: oracle columns with DECIMAL precision > 18 are not "
        f"driver-representation-safe: {wide}"
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_gate_output_decimals_are_driver_safe(spark, name):
    """Spark-side twin of the DuckDB check above: reject any gate-output
    column of DecimalType with precision > 18.  Spark's toPandas keeps
    such values as decimal.Decimal objects while DuckDB's pandas path
    coerces them to float64, so the driver's typed hash disagrees even
    when every value is equal (the r5 hll_cardinality_events red row).
    Schema-only: no execution."""
    from pyspark.sql.types import ArrayType, DecimalType, StructType

    def _wide(dt, path):
        if isinstance(dt, DecimalType) and dt.precision > 18:
            yield (path, str(dt))
        elif isinstance(dt, ArrayType):
            yield from _wide(dt.elementType, path + "[]")
        elif isinstance(dt, StructType):
            for f in dt.fields:
                yield from _wide(f.dataType, f"{path}.{f.name}")

    schema = QUERIES[name](spark, SF_DIR).schema
    bad = [b for f in schema.fields for b in _wide(f.dataType, f.name)]
    assert not bad, (
        f"{name}: gate-output columns with DecimalType precision > 18 are "
        f"not driver-representation-safe: {bad}"
    )


def test_mirror_is_typed():
    """Regression: the mirror must distinguish what the driver's typed hash
    distinguishes — a BIGINT column on one side vs DOUBLE on the other with
    equal numeric values has to FAIL the compare (r2 verdict item #3)."""
    assert _norm(902) != _norm(902.0)
    assert _norm(Decimal("902.00")) != _norm(902.0)
    assert _norm(True) != _norm(1)
    assert _norm(0) != _norm(False)
    # and equal typed values still compare equal
    assert _norm(902) == _norm(902)
    assert _norm([1, 2.0]) == _norm([1, 2.0])
    assert _norm([1, 2]) != _norm([1, 2.0])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_no_oracle_is_empty():
    """A 0-row gate query trivially hash-matches and proves nothing (bit
    q22 and q11 during development) — every oracle must select rows at
    the gate scale factors.  At the sf0.001 smoke scale a selective
    filter can legitimately drain (Q7's two-nation restriction finds no
    rows in ~6k lineitem) — the allowlist keeps the cross-SF sweep
    runnable without weakening the sf0.01/sf0.1 guard."""
    tiny_ok = {"tpch_q7_volume_shipping"} if SF_DIR.rstrip("/").endswith("sf0.001") else set()
    for name, sql in ORACLES.items():
        if name in tiny_ok:
            continue
        _, rows = _duck(sql)
        assert len(rows) > 0, f"{name}: oracle returns 0 rows at {SF_DIR}"
