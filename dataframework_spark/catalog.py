"""Catalog: named parquet tables → DataFrames / temp views.

Reference counterpart: ``LoadFeatureFromMatFile`` eagerly loads whole
``.mat`` files into RAM and *then* selects variables
(``/root/reference/DFW/tools.py:58-79``, ``preprocess.py:390-407``).  Here a
"database" is a lazy DataFrame over columnar parquet: column pruning and
predicate pushdown happen *at the scan* (Catalyst pushes ``select``/
``filter`` into the parquet reader), which is the behavior that survives
100 TB — we never materialize a table to apply a projection.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough to broadcast in joins at any scale factor (region and
# nation are constant-size; the others scale but stay dimension-like).
BROADCAST_TABLES = ("region", "nation")

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Lazy scan of one table; optional projection is pushed to the reader.

    Mirrors the reference's ``loadmat(filename, domain)`` variable selection
    (``tools.py:72-79``) but with true scan-time pruning instead of
    load-then-drop.
    """
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS), which Spark's reader refuses by
        # default. Set the legacy conf on the *caller's* session (the
        # driver hands us a vanilla one), scan nanos as int64, and
        # truncate to microseconds (integer div — nanos exceed double
        # precision) exactly as DuckDB coerces ns → µs.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    if columns:
        df = df.select(*columns)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (the engine's ``spark.sql`` face)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
