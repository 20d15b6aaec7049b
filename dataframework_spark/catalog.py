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
        df = _load_events(spark, table_path(sf_dir, name))
    else:
        df = spark.read.parquet(table_path(sf_dir, name))
    if columns:
        df = df.select(*columns)
    return df


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """Load the events table, normalizing ``ts`` to TIMESTAMP.

    The driver has shipped ``ts`` both as parquet TIMESTAMP(NANOS) (which
    Spark's vectorized reader only accepts as raw int64 via the legacy
    conf) and as TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).  Branch on
    the dtype Spark actually reads rather than assuming either encoding,
    so a testdata regeneration flips a branch instead of breaking every
    event-time query.  The engine guarantee is plain TIMESTAMP: NTZ is
    rejected by ``withWatermark`` / ``unix_micros``, and with the session
    timezone pinned to UTC (``session.py``) the NTZ → TIMESTAMP cast
    preserves wall-clock values exactly.  The nanos path truncates
    ns → µs with integer div (nanos exceed double precision), matching
    DuckDB's coercion.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    # Harmless for micros files; required to even read nanos files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (the engine's ``spark.sql`` face)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
