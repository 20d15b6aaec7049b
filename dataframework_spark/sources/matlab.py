"""MAT-file (v5) ingestion: the reference's literal input format.

The reference loads MATLAB ``.mat`` files via ``scipy.io.loadmat``
(``/root/reference/DFW/tools.py:58-79``) and expects each database variable
to be a 1×C cell array of per-class matrices: ``data[group][0][i]`` is class
``i``'s ``features × samples`` matrix, and a parallel ``group_rand`` cell
holds 1-based permutation indices (``preprocess.py:390-426``).

This engine is parquet-primary (SURVEY.md §1.4): ``.mat`` is a single-file,
single-machine format, so the scale story is **convert once → parquet →
every query scans parquet**.  This module supplies that converter without
scipy (not installed here): a pure-numpy reader/writer for the MAT v5
container, covering the subset the reference uses — numeric matrices and
cell arrays of numeric matrices, plus zlib-compressed elements, which is
what MATLAB and ``scipy.io.savemat(..., do_compression=True)`` emit.

The v5 layout implemented here is from the public "MAT-File Format"
specification: a 128-byte header, then tagged data elements
(``uint32 type, uint32 nbytes`` + 8-byte-aligned payload, with the 4-byte
"small data element" packing), ``miMATRIX`` elements holding array flags /
dimensions / name subelements, ``miCOMPRESSED`` wrapping a zlib stream.

Reference-behavior parity (``preprocess.py:409-426`` ``_adapt_range``):

* ``domain`` selection = pick named variables (``tools.py:71-78``);
* ``range=[lo, hi]`` = 1-based inclusive cell (class) slice, ``-1`` ⇒ all;
* ``labeled=True`` strips the trailing label row from each class matrix —
  the *intended* semantics (the reference's ternary at
  ``preprocess.py:422`` strips in both branches; SURVEY.md §2.2 P3
  documents keeping the intent, not the quirk);
* permutation cells whose 1-based max equals their length are normalized
  to 0-based (``preprocess.py:423-424``).
"""

from __future__ import annotations

import io
import os
import struct
import tempfile
import zlib
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataframework_spark.registry import register

# --- MAT v5 constants (public MAT-File Format spec, Level 5) ---------------

MI_INT8, MI_UINT8, MI_INT16, MI_UINT16 = 1, 2, 3, 4
MI_INT32, MI_UINT32, MI_SINGLE, MI_DOUBLE = 5, 6, 7, 9
MI_INT64, MI_UINT64, MI_MATRIX, MI_COMPRESSED, MI_UTF8 = 12, 13, 14, 15, 16

MX_CELL, MX_STRUCT, MX_OBJECT, MX_CHAR = 1, 2, 3, 4
MX_DOUBLE, MX_SINGLE = 6, 7
MX_INT8, MX_UINT8, MX_INT16, MX_UINT16, MX_INT32, MX_UINT32 = 8, 9, 10, 11, 12, 13

_MI_DTYPE = {
    MI_INT8: np.int8,
    MI_UINT8: np.uint8,
    MI_INT16: np.int16,
    MI_UINT16: np.uint16,
    MI_INT32: np.int32,
    MI_UINT32: np.uint32,
    MI_SINGLE: np.float32,
    MI_DOUBLE: np.float64,
    MI_INT64: np.int64,
    MI_UINT64: np.uint64,
}

_MX_DTYPE = {
    MX_DOUBLE: np.float64,
    MX_SINGLE: np.float32,
    MX_INT8: np.int8,
    MX_UINT8: np.uint8,
    MX_INT16: np.int16,
    MX_UINT16: np.uint16,
    MX_INT32: np.int32,
    MX_UINT32: np.uint32,
}


# --- reader -----------------------------------------------------------------


def _read_tag(buf: io.BytesIO) -> tuple[int, int, bytes | None]:
    """Read one element tag; returns (type, nbytes, small_payload|None)."""
    raw = buf.read(8)
    if len(raw) < 8:
        raise EOFError
    word0, word1 = struct.unpack("<II", raw)
    if word0 >> 16:  # small data element: nbytes in high 16 bits of word0
        mtype, nbytes = word0 & 0xFFFF, word0 >> 16
        return mtype, nbytes, raw[4 : 4 + nbytes]
    return word0, word1, None


def _read_element(buf: io.BytesIO) -> tuple[int, bytes]:
    mtype, nbytes, small = _read_tag(buf)
    if small is not None:
        return mtype, small
    data = buf.read(nbytes)
    pad = (-nbytes) % 8
    if pad:
        buf.read(pad)
    return mtype, data


def _numeric(mtype: int, data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype=np.dtype(_MI_DTYPE[mtype]).newbyteorder("<"))


def _parse_matrix(data: bytes) -> tuple[str, Any]:
    """Parse one miMATRIX payload → (name, value).

    Numeric → float/int ndarray (column-major dims honored); char → str;
    cell → object ndarray of parsed values (scipy-compatible shape).
    """
    buf = io.BytesIO(data)
    ftype, fdata = _read_element(buf)
    flags = _numeric(MI_UINT32, fdata)
    mx_class = int(flags[0]) & 0xFF
    dtag, ddata = _read_element(buf)
    dims = tuple(int(d) for d in _numeric(MI_INT32, ddata))
    _, ndata = _read_element(buf)
    name = ndata.decode("ascii")

    if mx_class == MX_CELL:
        n = int(np.prod(dims)) if dims else 0
        cells = np.empty(n, dtype=object)
        for i in range(n):
            mtype, mdata = _read_element(buf)
            if mtype != MI_MATRIX:
                raise ValueError(f"cell {i}: expected miMATRIX, got {mtype}")
            _, cells[i] = _parse_matrix(mdata)
        return name, cells.reshape(dims, order="F")
    if mx_class == MX_CHAR:
        mtype, mdata = _read_element(buf)
        if mtype == MI_UTF8:
            return name, mdata.decode("utf-8")
        return name, _numeric(mtype, mdata).astype(np.uint32).view()
    if mx_class in _MX_DTYPE:
        mtype, mdata = _read_element(buf)
        arr = _numeric(mtype, mdata).astype(_MX_DTYPE[mx_class])
        return name, arr.reshape(dims, order="F")
    raise ValueError(
        f"unsupported MATLAB array class {mx_class} for variable {name!r} "
        "(this converter covers the numeric/cell/char subset the reference uses)"
    )


def read_mat(path: str, domain: list[str] | None = None) -> dict[str, Any] | None:
    """Load a MAT v5 file → ``{variable: ndarray}``.

    Mirrors the reference's ``loadmat`` contract (``tools.py:58-79``):
    missing file → ``None``; ``domain`` selects variables (``None``/empty →
    all).  Unlike the reference (which ``KeyError``s), unknown domain names
    raise a clear ``KeyError`` naming the file.
    """
    if not os.path.exists(path):
        return None
    out: dict[str, Any] = {}
    with open(path, "rb") as f:
        header = f.read(128)
        if len(header) < 128:
            raise ValueError(f"{path}: truncated MAT header")
        version, endian = struct.unpack("<HH", header[124:128])
        if endian != 0x4D49:  # 'IM' little-endian
            raise ValueError(f"{path}: big-endian MAT files not supported")
        body = f.read()
    buf = io.BytesIO(body)
    while True:
        try:
            mtype, data = _read_element(buf)
        except EOFError:
            break
        if mtype == MI_COMPRESSED:
            inner = io.BytesIO(zlib.decompress(data))
            mtype, data = _read_element(inner)
        if mtype != MI_MATRIX:
            continue  # skip subsystem / unknown top-level elements
        name, value = _parse_matrix(data)
        out[name] = value
    if domain is None or len(domain) == 0:
        return out
    missing = [k for k in domain if k not in out]
    if missing:
        raise KeyError(f"{path}: variables {missing} not found (has {sorted(out)})")
    return {k: out[k] for k in domain}


# --- writer (fixtures / round-trips; numeric + cell subset) -----------------


def _element(mtype: int, payload: bytes) -> bytes:
    if len(payload) <= 4:
        return struct.pack("<HH", mtype, len(payload)) + payload.ljust(4, b"\0")
    pad = (-len(payload)) % 8
    return struct.pack("<II", mtype, len(payload)) + payload + b"\0" * pad


def _matrix_bytes(name: str, value: Any) -> bytes:
    if isinstance(value, np.ndarray) and value.dtype == object:
        dims = value.shape if value.ndim >= 2 else (1, value.size)
        sub = b"".join(
            _element(MI_MATRIX, _matrix_bytes("", c))
            for c in value.reshape(-1, order="F")
        )
        body = (
            _element(MI_UINT32, struct.pack("<II", MX_CELL, 0))
            + _element(MI_INT32, struct.pack(f"<{len(dims)}i", *dims))
            + _element(MI_INT8, name.encode("ascii"))
            + sub
        )
        return body
    arr = np.asarray(value, dtype=np.float64)
    if arr.ndim < 2:
        arr = arr.reshape(1, -1)
    dims = arr.shape
    body = (
        _element(MI_UINT32, struct.pack("<II", MX_DOUBLE, 0))
        + _element(MI_INT32, struct.pack(f"<{len(dims)}i", *dims))
        + _element(MI_INT8, name.encode("ascii"))
        + _element(MI_DOUBLE, arr.flatten(order="F").tobytes())
    )
    return body


def write_mat(path: str, variables: dict[str, Any], compress: bool = True) -> None:
    """Write a MAT v5 file (float64 matrices + object-array cells).

    Exists so fixture round-trips need no scipy; the byte layout follows
    the public v5 spec, and ``read_mat`` (plus scipy, where available)
    reads the output.
    """
    desc = b"MATLAB 5.0 MAT-file, created by dataframework_spark"
    header = desc.ljust(116) + b"\0" * 8 + struct.pack("<HH", 0x0100, 0x4D49)
    parts = []
    for name, value in variables.items():
        elem = _element(MI_MATRIX, _matrix_bytes(name, value))
        if compress:
            parts.append(_element(MI_COMPRESSED, zlib.compress(elem)))
        else:
            parts.append(elem)
    with open(path, "wb") as f:
        f.write(header + b"".join(parts))


# --- reference-semantics converter → long-format DataFrame ------------------


def adapt_range(
    data: dict[str, Any],
    group: str,
    group_rand: str,
    drange: tuple[int, int] | list[int] | None = None,
    labeled: bool = False,
) -> dict[str, np.ndarray]:
    """Reference ``_adapt_range`` (``preprocess.py:414-426``), intended
    semantics: 1-based inclusive class slice (``-1`` ⇒ all), transpose each
    class matrix to samples-major, strip the trailing label row only when
    ``labeled`` (the reference quirk strips always — documented divergence),
    normalize 1-based permutations to 0-based."""
    x_cells = np.asarray(data[group]).reshape(-1, order="F")
    r_cells = np.asarray(data[group_rand]).reshape(-1, order="F")
    if drange is not None and drange[0] != -1:
        sel = slice(drange[0] - 1, drange[1])
        x_cells, r_cells = x_cells[sel], r_cells[sel]
    xs, rs = [], []
    for x, r in zip(x_cells, r_cells):
        x = np.asarray(x, dtype=np.float64)
        xs.append((x[:-1] if labeled else x).T)
        r = np.asarray(r, dtype=np.float64)
        row0 = r[0, :] if r.ndim == 2 else r
        if row0.size and row0.max() == row0.shape[-1]:
            r = r - 1
        rs.append(r.astype(np.int64))
    return {"x": xs, "r": rs}


def mat_to_long_df(
    spark: SparkSession,
    path: str,
    group: str = "x",
    group_rand: str = "r",
    drange: tuple[int, int] | list[int] | None = None,
    labeled: bool = False,
) -> DataFrame:
    """Convert one reference-layout ``.mat`` database to the engine's long
    format: one row per sample — ``(label, sample_id, features
    array<double>, perm_order)`` — ready to write to parquet and feed every
    registered operator.

    This is deliberately a driver-side, convert-ONCE utility (a ``.mat``
    file is one blob; there is nothing to distribute until it becomes
    parquet).  ``perm_order`` carries the file's stored permutation for
    replicate ``no`` = row index of ``r``; the engine's seeded-hash
    permutation (SURVEY §2.2 P4) replaces stored perms for new data.
    """
    data = read_mat(path, [group, group_rand])
    if data is None:
        raise FileNotFoundError(f"could not find MAT file [{path}]")
    adapted = adapt_range(data, group, group_rand, drange, labeled)
    rows = []
    for label, (x, r) in enumerate(zip(adapted["x"], adapted["r"])):
        order = r[0] if r.ndim == 2 else r
        pos = {int(sample): int(rank) for rank, sample in enumerate(order)}
        for sid in range(x.shape[0]):
            rows.append((label, sid, [float(v) for v in x[sid]], pos.get(sid, -1)))
    return spark.createDataFrame(
        rows, "label INT, sample_id INT, features ARRAY<DOUBLE>, perm_order INT"
    )


@register(
    "source_mat_roundtrip",
    # the oracle recomputes the same per-label stats straight from parquet:
    # if the MAT container round-trip is byte-faithful, the hashes agree
    oracle="""
    WITH sel AS (
      SELECT label, CAST(embedding[1] AS DOUBLE) AS e0
      FROM (SELECT label, embedding,
                   ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM embeddings)
      WHERE rn <= 60
    )
    SELECT label, COUNT(*) AS n, ROUND(SUM(e0), 4) AS sum_x0
    FROM sel GROUP BY label
    """,
)
def source_mat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ``.mat`` ingestion proof (reference ``tools.py:58-79``):
    take a BOUNDED 60-row slice of ``embeddings``, lay it out exactly like
    a reference database file (1×C cells of ``(features+label-row) ×
    samples`` plus 1-based permutation cells), write a real MAT v5 file,
    read it back through ``mat_to_long_df`` (labeled strip + perm
    normalization), and aggregate per label.

    The driver-side collect is a fixed 60 rows — the converter is a
    convert-once utility by design (a ``.mat`` file is one undistributable
    blob; parquet is the scan format)."""
    from dataframework_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .orderBy("vec_id")
        .limit(60)
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
        .collect()  # bounded: limit(60) convert-once fixture above
    )
    labels = sorted({r.label for r in rows})
    x_cells = np.empty((1, len(labels)), dtype=object)
    r_cells = np.empty((1, len(labels)), dtype=object)
    for i, lab in enumerate(labels):
        cols = [r.e for r in rows if r.label == lab]
        m = np.empty((len(cols[0]) + 1, len(cols)), dtype=np.float64)
        m[:-1, :] = np.array(cols, dtype=np.float64).T
        m[-1, :] = lab  # trailing label row, stripped by labeled=True
        x_cells[0, i] = m
        r_cells[0, i] = np.arange(1, len(cols) + 1, dtype=np.float64).reshape(1, -1)
    path = os.path.join(tempfile.gettempdir(), "dfw_source_mat_roundtrip.mat")
    write_mat(path, {"x": x_cells, "r": r_cells})
    long_df = mat_to_long_df(spark, path, labeled=True)
    label_arr = F.array(*[F.lit(l) for l in labels])
    return (
        long_df.withColumn("label", F.element_at(label_arr, F.col("label") + 1))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.element_at("features", 1)), 4).alias("sum_x0"),
        )
    )
