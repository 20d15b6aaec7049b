"""Query registry: every operator ships as (spark_fn, oracle_sql).

The driver harness (``/root/repo/__spark_entry__.py``) runs each registered
Spark query and its DuckDB oracle SQL side-by-side at sf=0.01 and compares
row-count + schema + order-insensitive value hash.  Registration keeps the
implementation and its oracle adjacent in the operator modules.

Rules enforced by convention here (see SURVEY.md §7):

* every computed column is aliased identically in the Spark plan and the
  oracle SQL;
* float outputs are rounded (usually 2 dp) on BOTH sides so cross-engine
  summation-order differences cannot flip the value hash;
* no ``rand()`` anywhere — ordering is by key columns or seeded integer
  hashes expressible in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# Preferred family order for the round-robin cycle below; families not listed
# are appended in registration order.  The first cycle therefore reads as the
# "one best representative per SURVEY.md §2 family" list.
_FAMILY_ORDER = [
    "tpch",      # q1 flagship first — the driver smoke-checks it via entry()
    "join",
    "agg",
    "window",
    "scalar",
    "events",
    "stream",
    "dedup",
    "sim",
    "text",
    "ml",
    "mm",
    "pipeline",
    "subquery",
    "reshape",
    "udf",
    "sample",
    "sink",
    "source",
    "profile",
    "graph",
    "sort",
    "setops",
]


def _family(name: str) -> str:
    if name.startswith("q") and name[1:2].isdigit():
        return "tpch"
    if name.startswith("sql_"):
        return "tpch"
    return name.split("_", 1)[0]


def _driver_history() -> tuple[set[str], set[str], set[str]]:
    """Return (needs_regrade, rows_only, ever_sampled) sets read from
    ``CORRECTNESS_r*.json``.

    The driver grades only a ~50-query prefix per round, so prefix order
    is the sampling policy.  Reading the driver's own verdict files makes
    the policy self-updating: a query that erred or hash-failed last
    round must stay in the prefix to prove its fix; a query that has
    never had a driver row should get one before any already-green query
    is re-graded.  Missing/unparsable files degrade to empty sets (e.g.
    fresh checkouts), leaving plain registration order.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set[str] = set()
    latest: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            data = json.load(open(path))
        except Exception:
            continue
        if isinstance(data, dict):
            sampled |= set(data)
            latest.update(data)  # later rounds overwrite earlier verdicts
    regrade = {
        name
        for name, row in latest.items()
        if isinstance(row, dict)
        and (row.get("err") not in (None, "no_oracle") or row.get("hash_match") is False)
    }
    rows_only = {
        name
        for name, row in latest.items()
        if isinstance(row, dict) and row.get("err") == "no_oracle"
    }
    return regrade, rows_only, sampled


def _interleaved(reg: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Round-robin the registry across operator families, verdict-aware.

    The driver harness may grade only a prefix of ``queries()`` per round
    (r1/r2 graded 50 of ~190).  Interleaving guarantees ANY prefix of
    length ≥ |families| carries one verdict per SURVEY.md §2 family, and a
    50-query prefix carries ≥2 per family — so no family can end a round
    with zero driver rows (VERDICT r1, "What's missing" #1).  Within a
    family, queues are ordered by what maximizes new driver information
    (VERDICT r2, "Next round" #7): first queries whose latest driver
    verdict was an error or hash mismatch (their fixes need re-grading),
    then queries never driver-sampled, then already-green queries rotated
    to the back.  Ties keep registration order (modules register their
    most representative query first).
    """
    regrade, rows_only, sampled = _driver_history()

    def _cls(spec: QuerySpec) -> int:
        if spec.name in regrade:
            return 0
        if spec.name in rows_only and spec.oracle is not None:
            return 0  # oracle added since the last rows-only verdict
        if spec.name not in sampled:
            return 1
        return 2

    queues: dict[str, list[QuerySpec]] = {}
    for name, spec in reg.items():
        queues.setdefault(_family(name), []).append(spec)
    for q in queues.values():
        q.sort(key=_cls)  # stable: registration order within each class
    fam_order = [f for f in _FAMILY_ORDER if f in queues]
    fam_order += [f for f in queues if f not in fam_order]
    out: dict[str, QuerySpec] = {}
    depth = 0
    while len(out) < len(reg):
        for f in fam_order:
            q = queues[f]
            if depth < len(q):
                out[q[depth].name] = q[depth]
        depth += 1
    return out


def all_queries() -> dict[str, QuerySpec]:
    # Import operator modules for their registration side effects.
    from dataframework_spark.operators import (  # noqa: F401
        corpus,
        dedup,
        graph,
        ml_prep,
        multimodal,
        pipeline,
        relational,
        similarity,
        temporal,
        text,
        tpch_shapes,
        udfs,
    )
    from dataframework_spark import streaming  # noqa: F401
    from dataframework_spark.sources import io, matlab  # noqa: F401

    return _interleaved(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }


def get_spec(name: str) -> QuerySpec:
    """Lookup an already-registered spec (for queries that compose other
    queries' oracles — e.g. the ANN recall evaluator)."""
    return _REGISTRY[name]
