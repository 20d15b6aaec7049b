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
    if spec.oracle is None:
        # rows-only check, like the driver's weaker path
        assert df.count() >= 0
        return
    problems = compare(df, duck, spec.oracle)
    assert not problems, f"{name}:\n" + "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
