"""Oracle-differential tests: every registered query vs its DuckDB twin.

This mirrors the driver's t2 correctness gate (row count + columns +
order-insensitive values) at the same scale factor, so a green run here
predicts a green CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from dataframework_spark.registry import all_queries
from tests.oracle_utils import compare

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    # Output discipline: oracle-checked queries must emit only scalar
    # top-level columns — the driver's pandas canonicalizer sorts/hashes
    # column values and crashes on array/map/struct cells (r1:
    # scalar_array_collect / scalar_map_funcs err "unhashable type: list").
    # Emit array_join(...)/to_json(...) strings instead; keep nesting internal.
    if spec.oracle is not None:
        offenders = [
            f"{f.name}:{f.dataType.typeName()}"
            for f in df.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        assert not offenders, (
            f"{name} emits non-scalar top-level columns {offenders}; "
            "the driver canonicalizer cannot hash these"
        )
    if spec.oracle is None:
        # rows-only check, like the driver's weaker path
        assert df.count() >= 0
        return
    problems = compare(df, duck, spec.oracle)
    assert not problems, f"{name}:\n" + "\n".join(problems)


@pytest.mark.parametrize("name", sorted(n for n in SPECS if SPECS[n].oracle))
def test_oracle_no_fragile_numeric_types(name, duck):
    """DuckDB SUM over integers returns HUGEINT and bare decimal literals
    infer DECIMAL(p,s); the driver canonicalizes oracle output via pandas,
    where those land as float64/object — so Spark's int64 `123`
    hash-mismatches oracle `123.0` even though values are equal (r1
    scalar_json_extract; r2 hit five more).  Every numeric oracle output
    must be BIGINT or DOUBLE: CAST integer aggregates AS BIGINT, decimal
    literals AS DOUBLE.  This guard runs DESCRIBE (types only, no
    execution) on every registered oracle."""
    rows = duck.execute(f"DESCRIBE {SPECS[name].oracle}").fetchall()
    offenders = [
        f"{r[0]}:{r[1]}"
        for r in rows
        if "HUGEINT" in r[1].upper() or r[1].upper().startswith("DECIMAL")
    ]
    assert not offenders, (
        f"{name} oracle emits fragile numeric columns {offenders}; CAST "
        "to BIGINT/DOUBLE or the driver's pandas canonicalizer will "
        "coerce them and hash-mismatch Spark's types"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
