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
    from dataframework_spark.sources import io  # noqa: F401

    return dict(_REGISTRY)


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
