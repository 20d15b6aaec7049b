"""Vector / token expression helpers used by similarity, dedup, and text ops.

Every helper comes in two flavors that MUST stay semantically identical:

* a Spark ``Column``/SQL-expression builder (JVM-side, whole-stage-codegen
  friendly — no Python UDFs anywhere in these hot paths), and
* a DuckDB SQL fragment builder used to assemble the oracle strings.

The reference has no vector math beyond NumPy means
(``/root/reference/DFW/preprocess.py:76-84``); these exist for the
north-star LLM-pipeline operators (SURVEY.md §2.10).

Scale notes: all expressions are per-row (narrow) — they vectorize inside
codegen and never shuffle.  Cosine over ``array<float>`` is computed in
double on both engines so the oracle hash cannot be flipped by f32 noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization (documents.text → array<string>)
# ---------------------------------------------------------------------------

#: Spark SQL fragment: whitespace tokens of a trimmed text column.
TOKENS_SQL = r"split(trim(text), '\\s+')"

#: DuckDB twin of :data:`TOKENS_SQL`.
DUCK_TOKENS_SQL = r"regexp_split_to_array(trim(text), '\s+')"


def tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def shingles_sql(toks_sql: str, n: int = 3) -> str:
    """Spark SQL: distinct word n-gram shingles of a token-array expression.

    Pure array expression (``sequence`` + ``transform`` stay inside
    codegen); nothing leaves the row, so cost is linear in tokens per doc.
    ``array_join(slice(...))`` measures ~2.6× faster than the
    ``concat_ws(element_at...)`` formulation (one array op per shingle vs
    n interpreted lookups).  The ``size < n`` guard matters because
    Spark's ``sequence(1, 0)`` produces a *descending* range rather than
    an empty one.
    """
    return (
        f"case when size({toks_sql}) < {n} then array() "
        f"else array_distinct(transform(sequence(1, size({toks_sql}) - {n - 1}), "
        f"i -> array_join(slice({toks_sql}, i, {n}), ' '))) end"
    )


def duck_shingles_sql(toks_sql: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles_sql` (1-based list indexing)."""
    parts = " || ' ' || ".join(f"({toks_sql})[i + {k}]" for k in range(n))
    return (
        f"case when len({toks_sql}) < {n} then [] "
        f"else list_distinct(list_transform(generate_series(1, len({toks_sql}) - {n - 1}), "
        f"i -> {parts})) end"
    )


# ---------------------------------------------------------------------------
# Cross-dialect term ids (string → bounded bigint, identical on both engines)
# ---------------------------------------------------------------------------

# MinHash/SimHash need an integer id per shingle/token.  A dictionary
# (global row_number over the distinct vocabulary) is a single-partition
# sort of the whole corpus vocabulary — the r1 scale-killer.  Instead both
# engines hash the term directly: the first 15 hex digits of md5 (60 bits,
# < int64) reduced mod a caller-chosen modulus.  Collisions (~|V|²/2m) map
# the SAME term to the SAME id on both engines, so oracles stay exact; for
# signature math a rare shared id merely perturbs one minhash slot.


def tid_sql(col: str, mod: int) -> str:
    """Spark SQL: deterministic term id in ``[0, mod)`` for a string column."""
    return f"cast(conv(substring(md5({col}), 1, 15), 16, 10) as bigint) % {mod}"


def duck_tid_sql(col: str, mod: int) -> str:
    """DuckDB twin of :func:`tid_sql` (hex-literal cast instead of conv)."""
    return f"CAST('0x' || substr(md5({col}), 1, 15) AS BIGINT) % {mod}"


# ---------------------------------------------------------------------------
# Vector math (embeddings.embedding: array<float>)
# ---------------------------------------------------------------------------


def as_double(col: str = "embedding") -> Column:
    return F.expr(f"transform({col}, x -> cast(x as double))")


def dot_sql(a: str, b: str) -> str:
    """Spark SQL: dot product of two array<double> expressions."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def cosine_sql(a: str, b: str) -> str:
    """Spark SQL: cosine similarity of two array<double> expressions."""
    na = f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + v * v))"
    nb = f"sqrt(aggregate({b}, 0D, (acc, v) -> acc + v * v))"
    return f"({dot_sql(a, b)}) / (({na}) * ({nb}))"


def cosine(a: str, b: str) -> Column:
    return F.expr(cosine_sql(a, b))


def norm_sql(a: str) -> str:
    """Spark SQL: L2 norm of an array<double> expression — the exact
    per-side subexpression of :func:`cosine_sql`."""
    return f"sqrt(aggregate({a}, 0D, (acc, v) -> acc + v * v))"


def cosine_prenorm_sql(a: str, b: str, na: str, nb: str) -> str:
    """Spark SQL: cosine similarity with the two norms PRECOMPUTED
    (``na``/``nb`` are column names holding :func:`norm_sql` values).

    r12 optimization-round helper (guide §1.2 per-task work): inside a
    (query × corpus) pair loop, :func:`cosine_sql` re-evaluates both norm
    aggregates per PAIR — three O(d) interpreted higher-order-function
    passes where one suffices.  Hoisting ``norm_sql`` to one evaluation per
    row and dividing by the product keeps the IDENTICAL IEEE shape
    (same dot, same ``(na) * (nb)`` product, same division, same op order),
    so every cosine is bit-equal to the un-hoisted form and rounded ranking
    keys cannot move."""
    return f"({dot_sql(a, b)}) / (({na}) * ({nb}))"


def duck_cosine_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`cosine_sql` — forced to double precision."""
    return f"list_cosine_similarity(({a})::DOUBLE[], ({b})::DOUBLE[])"


def duck_dot_sql(a: str, b: str) -> str:
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"
