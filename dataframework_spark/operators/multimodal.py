"""Multimodal column plumbing: binary payloads + typed metadata
(SURVEY.md §2.10).

No reference counterpart (Alrash/DataFramework reads only numeric ``.mat``
matrices — SURVEY.md §1.2).  The engine treats image/audio/video as opaque
``binary`` columns with typed metadata and runs decode/feature-extract as
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (`_fake_decode`) behind the same
signature a real decoder would have — the Spark-side plumbing (schema,
Arrow batching, partition behavior) is real and oracle-checked: because
the fake decode is pure arithmetic on byte length, DuckDB can replay it
exactly, which verifies the mapInPandas path end-to-end, not just
rows-only.

Scale design: decode is embarrassingly parallel per-partition Python with
Arrow transfer (the one legitimate Pandas-UDF hot path in this engine —
codecs don't exist JVM-side).  Batches are bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``; memory per task =
batch_size × max payload, the knob that must be sized against executor
memory at 100 TB.  Metadata-only queries (length, digest, magic bytes)
never enter Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dataframework_spark.catalog import load_table
from dataframework_spark.registry import register

# ---------------------------------------------------------------------------
# M1 — binary metadata (JVM-only: digest, size, magic bytes)
# ---------------------------------------------------------------------------


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT
      doc_id,
      octet_length(text::BLOB)        AS n_bytes,
      sha256(text)                    AS sha256_hex,
      hex(substr(text, 1, 4))         AS magic_hex
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-payload metadata: byte length, content digest, magic-byte
    prefix.  (The corpus has no true binary column, so the payload is the
    utf-8 encoding of ``text`` — byte-identical in both engines.)

    Pure JVM expressions — the pattern for routing files by container
    format (magic bytes) and content-addressing (sha256) without ever
    touching Python."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.hex(F.substring("text", 1, 4)).alias("magic_hex"),
    )


# ---------------------------------------------------------------------------
# M2 — decode / feature-extract via Arrow-batched mapInPandas
# ---------------------------------------------------------------------------

_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def _fake_decode(payload: pd.Series) -> pd.DataFrame:
    """DETERMINISTIC FAKE decoder (no codecs in this container).

    A real implementation would parse the container header (PIL/ffmpeg);
    this stand-in derives the same *shaped* metadata from byte length so
    the full Arrow pipeline is exercised and oracle-checkable.  Swap the
    body — not the signature — when codecs are available."""
    n = payload.str.len().astype("int64")  # ascii corpus ⇒ chars == bytes
    return pd.DataFrame(
        {
            "n_bytes": n,
            "width": (64 + n % 193).astype("int32"),
            "height": (64 + (n * 7) % 129).astype("int32"),
            "n_frames": (1 + n % 24).astype("int32"),
            "fmt": (n % 3).map({0: "jpeg", 1: "png", 2: "webp"}),
        }
    )


def _real_decode(payload: pd.Series) -> pd.DataFrame:  # pragma: no cover
    raise NotImplementedError(
        "image/audio codecs are not installed in this container; "
        "wire PIL/ffmpeg here and keep _DECODE_SCHEMA unchanged"
    )


@register(
    "mm_decode_features",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(text::BLOB) AS n FROM documents)
    SELECT doc_id,
           n                         AS n_bytes,
           (64 + n % 193)::INTEGER   AS width,
           (64 + (n * 7) % 129)::INTEGER AS height,
           (1 + n % 24)::INTEGER     AS n_frames,
           CASE n % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS fmt
    FROM b
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage: Arrow-batched ``mapInPandas`` over the
    opaque payload column, emitting typed media metadata.

    This is the engine's canonical slow-path shape: per-partition Python,
    vectorized within each Arrow batch, schema declared up front.  The
    decode body is a deterministic fake (see ``_fake_decode``) so the
    plumbing itself is hash-verified against the oracle."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    # spread the decode across cores — one Python worker per partition, so
    # a single-split scan would serialize the whole decode stage
    docs = docs.repartition(spark.sparkContext.defaultParallelism)

    def decode_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _fake_decode(pdf["text"])
            out.insert(0, "doc_id", pdf["doc_id"].astype("int64"))
            yield out

    return docs.mapInPandas(decode_partition, schema=_DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# M3 — frame sampling (video-style explode of a frame index)
# ---------------------------------------------------------------------------

_FRAME_STRIDE = 4


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, (1 + octet_length(text::BLOB) % 24) AS n_frames
      FROM documents)
    SELECT doc_id, n_frames,
           unnest(generate_series(0, n_frames - 1, {_FRAME_STRIDE})) AS frame_id
    FROM v
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling: every 4th frame index of each "video"
    (frame count from the fake decode).  ``sequence`` + ``explode`` keeps
    the fan-out JVM-side; a real pipeline would follow with a mapInPandas
    frame-decode stage exactly like ``mm_decode_features``."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    v = docs.select(
        "doc_id",
        (1 + F.octet_length(F.encode("text", "utf-8")) % 24).cast("int").alias("n_frames"),
    )
    return v.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(_FRAME_STRIDE))).alias(
            "frame_id"
        ),
    )


# ---------------------------------------------------------------------------
# M4 — audio chunking (segment an opaque audio payload for batch decode)
# ---------------------------------------------------------------------------

_CHUNK_S = 30
_OVERLAP_S = 5


@register(
    "mm_audio_chunks",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, (10 + octet_length(text::BLOB) % 290) AS duration_s
      FROM documents)
    SELECT doc_id, duration_s,
           unnest(generate_series(0, duration_s - 1, {_CHUNK_S - _OVERLAP_S})) AS chunk_start_s,
           LEAST(unnest(generate_series(0, duration_s - 1, {_CHUNK_S - _OVERLAP_S}))
                 + {_CHUNK_S}, duration_s) AS chunk_end_s
    FROM a
    """,
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio segmentation: 30 s chunks with 5 s overlap (the windowing an
    ASR/embedding batch job feeds to its decoder).  Duration comes from
    the deterministic fake header read (same convention as
    ``mm_decode_features``); the chunk fan-out is a JVM-side ``sequence``
    + ``explode`` — each chunk row would then carry (offset, length) into
    an Arrow decode stage, so the expensive Python step reads only its
    slice."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    a = docs.select(
        "doc_id",
        (10 + F.octet_length(F.encode("text", "utf-8")) % 290).cast("int").alias("duration_s"),
    )
    step = _CHUNK_S - _OVERLAP_S
    return a.select(
        "doc_id",
        "duration_s",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_s") - 1, F.lit(step))
        ).alias("chunk_start_s"),
    ).withColumn(
        "chunk_end_s", F.least(F.col("chunk_start_s") + _CHUNK_S, F.col("duration_s"))
    )
