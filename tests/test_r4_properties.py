"""Property tests for the r4-continuation primitives.

These pin the bit-level helpers the oracles rely on, independently of
the oracle comparison itself: the Morton bit-spread against a Python
reference over the full 8-bit domain, idempotence of the URL
canonicalization chain, and the dHash against a brute reimplementation
from the decoded pixel array.
"""

from __future__ import annotations

import duckdb
import pytest

from dataframework_spark.operators.multimodal import (
    _bmp_pixels,
    dhash_bmp,
    synth_bmp,
)
from dataframework_spark.sources.io import _zorder_sql, _zspread


def _spread_ref(x: int) -> int:
    # textbook bit interleave reference: bit i of x → bit 2i
    out = 0
    for i in range(8):
        out |= ((x >> i) & 1) << (2 * i)
    return out


def test_zspread_matches_reference_over_full_domain():
    """The *,+,&,| spread expression equals the textbook interleave for
    every 8-bit value — evaluated through DuckDB, i.e. through the same
    SQL semantics the oracle uses."""
    con = duckdb.connect()
    expr = _zspread("x")
    rows = con.execute(
        f"SELECT x, {expr} FROM (SELECT unnest(range(256)) AS x)"
    ).fetchall()
    for x, got in rows:
        assert got == _spread_ref(x), f"x={x}: {got} != {_spread_ref(x)}"


def test_zvalue_interleave_is_bijective_on_16_bits():
    """spread(p) + 2*spread(s) must hit each 16-bit value exactly once —
    a collision would mean two (p,s) cells share a z-run and the skipping
    audit undercounts."""
    con = duckdb.connect()
    p = _zspread("p")
    s = _zspread("s")
    n = con.execute(
        f"""
        SELECT COUNT(DISTINCT ({p}) + 2 * ({s}))
        FROM (SELECT unnest(range(256)) AS p), (SELECT unnest(range(256)) AS s)
        """
    ).fetchone()[0]
    assert n == 65536


def test_zorder_sql_dialects_agree():
    """The Spark-dialect and DuckDB-dialect z expressions must compute the
    same bucket for every (partkey, suppkey) in a sample grid — only the
    integer-division spelling may differ."""
    con = duckdb.connect()
    duck = _zorder_sql(lambda a, b: f"(({a}) // ({b}))")
    # Render the Spark dialect into DuckDB-runnable text: `a div b` has no
    # DuckDB meaning, so emulate it with CAST(... AS BIGINT) of a floor
    # division — for the non-negative operands used here they coincide.
    spark_like = _zorder_sql(lambda a, b: f"CAST(FLOOR(({a}) / ({b})) AS BIGINT)")
    row = con.execute(
        f"""
        WITH b AS (SELECT 0 AS minp, 1999 AS maxp, 0 AS mins, 99 AS maxs),
        g AS (SELECT unnest(range(0, 2000, 37)) AS l_partkey,
                     unnest(range(0, 100, 7))  AS l_suppkey)
        SELECT COUNT(*) FROM g, b
        WHERE ({duck['zbucket']}) <> ({spark_like['zbucket']})
        """
    ).fetchone()
    assert row[0] == 0


_CANON = """
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(lower({u}), '#.*$', ''),
            'utm_[^&]*&', ''),
          '[?&]utm_[^&]*$', ''),
        '/($|\\?)', '\\1'),
      '://www\\.', '://')
"""


@pytest.mark.parametrize(
    "raw",
    [
        "HTTPS://WWW.SITE3.EXAMPLE.COM/articles/page-8/#section2",
        "https://www.site0.example.com/articles/page-1?utm_source=feed",
        "https://site1.example.com/articles/page-2?utm_campaign=x&ref=keep",
        "https://www.site2.example.com/articles/page-3/?ref=keep",
        "https://site4.example.com/articles/page-4",
    ],
)
def test_url_canonicalization_idempotent(raw):
    """normalize(normalize(u)) == normalize(u): canonical URLs are fixed
    points of the chain, so re-crawling an already-canonical URL can never
    produce a second dedup key."""
    con = duckdb.connect()
    once = con.execute(f"SELECT {_CANON.format(u='?')}", [raw]).fetchone()[0]
    twice = con.execute(f"SELECT {_CANON.format(u='?')}", [once]).fetchone()[0]
    assert once == twice
    assert "utm_" not in once and "#" not in once and "://www." not in once
    assert not once.split("?")[0].endswith("/")


@pytest.mark.parametrize("doc_id", [0, 1, 7, 42, 97, 123, 255, 4999])
def test_dhash_matches_brute_reimplementation(doc_id):
    """dhash_bmp (used by the registered query) against an independent
    brute recomputation from the decoded pixel array."""
    payload = synth_bmp(doc_id)
    px = _bmp_pixels(payload).astype("int64")
    h, w = px.shape[:2]
    bits = []
    for j in range(8):
        y = (j * h) // 8
        for i in range(8):
            x0, x1 = (i * w) // 9, ((i + 1) * w) // 9
            g0 = (int(px[y, x0, 0]) + int(px[y, x0, 1]) + int(px[y, x0, 2])) // 3
            g1 = (int(px[y, x1, 0]) + int(px[y, x1, 1]) + int(px[y, x1, 2])) // 3
            bits.append("1" if g1 > g0 else "0")
    assert dhash_bmp(payload) == "".join(bits)
