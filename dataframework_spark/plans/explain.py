"""Physical-plan introspection helpers.

The engine's IR is Catalyst's plan (SURVEY.md §3: "we do not build our
own"), so plan *quality* — did the filter reach the parquet scan, did the
dimension broadcast, did the bucketed join skip its exchanges — is a
testable property, not a hope.  ``tests/test_plans.py`` asserts these on
the headline queries; at 100 TB each assertion is the difference between
a scan-bound query and a cluster-melting one.

Spark's AQE wraps plans in ``AdaptiveSparkPlan``; helpers read the
*executed or initial* plan string via ``explain`` modes, which include the
``PushedFilters`` / ``ReadSchema`` scan annotations.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """Capture ``df.explain(mode=...)`` output as a string."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All ``PushedFilters: [...]`` annotations on the plan's scans."""
    out = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """All ``ReadSchema`` annotations — what each parquet scan actually reads
    (column pruning evidence)."""
    out = []
    for line in plan_string(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line.removeprefix("ReadSchema:").strip())
    return out


def count_occurrences(df: DataFrame, token: str) -> int:
    return plan_string(df).count(token)


def has_broadcast_join(df: DataFrame) -> bool:
    return count_occurrences(df, "BroadcastHashJoin") > 0


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (excludes broadcast
    exchanges, which move only the small side).  Uses ``simple`` mode,
    where each exchange prints inline as ``Exchange hashpartitioning(...)``
    (formatted mode splits the operator and its arguments across lines)."""
    p = plan_string(df, mode="simple")
    return p.count("Exchange hashpartitioning") + p.count("Exchange rangepartitioning")


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen spans — wider is better (more of the plan fused
    into generated JVM loops)."""
    return count_occurrences(df, "WholeStageCodegen")
