"""Reconciliation tests for the r8 ADVICE items (fixed in r9).

1. SOS Td/Ta table selectors are honored: a JPEG whose scan selects
   huffman table id 1 decodes with table 1 (not silently table 0), and
   selecting an ABSENT table is REJECTED with a clear error.
2. _BitReader masks consumed high bits out of its accumulator, so bit
   extraction stays O(1) regardless of scan length (was O(n) per bit).
3. The entropy stream ends at the FIRST FF D9 (byte stuffing guarantees
   FF D9 cannot occur inside valid entropy data); trailing bytes that
   happen to contain FF D9 no longer extend the stream.
4. Image channel means are integer 1e4 fixed-point on both engines
   (half-up from the exact integer pixel sum) — no ROUND-vs-round()
   tie divergence class.  Cross-engine equality is pinned by the oracle
   suite; here we pin the half-up algebra itself on a manufactured tie.
"""

from __future__ import annotations

import numpy as np
import pytest

from dataframework_spark.operators.multimodal import (
    _BitReader,
    _encode_gray_jpeg,
    _mean_e4,
    jpeg_pixels,
    synth_jpeg,
)


def _patch_sos_tdta(payload: bytes, tdta: int) -> bytearray:
    """Return payload with the (single) SOS component's Td/Ta byte set."""
    out = bytearray(payload)
    i = out.find(b"\xff\xda")
    assert i >= 0
    # SOS layout: marker(2) len(2) ns(1) [comp_id(1) TdTa(1)] Ss Se AhAl
    assert out[i + 4] == 1  # single-component scan
    out[i + 6] = tdta
    return out


def _retable_dht(payload: bytes | bytearray, new_id: int) -> bytearray:
    """Rewrite the DHT segment so both tables carry huffman table id
    ``new_id`` (the encoder always writes DC id 0 then AC id 0)."""
    out = bytearray(payload)
    i = out.find(b"\xff\xc4")
    assert i >= 0
    off = i + 4  # first table header byte (Tc<<4 | Th)
    for _ in range(2):
        tc = out[off] >> 4
        out[off] = (tc << 4) | new_id
        nv = sum(out[off + 1 : off + 17])
        off += 17 + nv
    return out


def test_sos_table_selectors_are_honored():
    """Same image, tables republished as id 1 and selected via Td=Ta=1:
    must decode identically to the id-0 original (pre-fix: KeyError or a
    silent table-0 decode)."""
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
    base = _encode_gray_jpeg(img)
    moved = _patch_sos_tdta(_retable_dht(base, 1), 0x11)
    assert (jpeg_pixels(bytes(moved)) == jpeg_pixels(base)).all()


def test_sos_selecting_absent_table_is_rejected():
    payload, _, _ = synth_jpeg(6)  # tables live at id 0
    mutated = _patch_sos_tdta(payload, 0x11)  # select absent id 1
    with pytest.raises(ValueError, match="absent huffman"):
        jpeg_pixels(bytes(mutated))


def test_multi_component_sos_is_rejected():
    payload, _, _ = synth_jpeg(6)
    out = bytearray(payload)
    i = out.find(b"\xff\xda")
    out[i + 4] = 3  # claim a 3-component scan
    with pytest.raises(ValueError, match="scan components"):
        jpeg_pixels(bytes(out))


def test_bitreader_accumulator_stays_bounded():
    """Consume a long stream bit-by-bit; the accumulator must never hold
    more than the unconsumed bits (≤ 8), not the whole history."""
    data = bytes((7 * i + 3) % 251 for i in range(4096))
    br = _BitReader(data)
    total = 0
    for _ in range(len(data) * 8):
        total += br.bit()
        assert br.acc.bit_length() <= br.n <= 8
    assert total == sum(bin(b).count("1") for b in data)


def test_bitreader_masking_preserves_values():
    data = bytes([0b10110100, 0b01011111, 0xA7])
    br = _BitReader(data)
    assert br.bits(5) == 0b10110
    assert br.bits(6) == 0b100_010
    assert br.bits(8) == 0b11111_101
    assert br.bits(5) == 0b00111


def test_trailing_bytes_after_eoi_are_ignored():
    """A trailer containing FF D9 after the true EOI must not extend the
    entropy stream (pre-fix: rfind picked the LAST FF D9)."""
    payload, _, _ = synth_jpeg(13)
    want = jpeg_pixels(payload)
    trailed = payload + b"exif-ish trailer \xff\x00 junk \xff\xd9"
    assert (jpeg_pixels(trailed) == want).all()


def test_mean_e4_half_up_on_exact_ties():
    # 1/2 -> 0.5 -> 5000 exactly; tie at the 4th decimal: 3/20000 scales
    # to 1.5 -> half-up 2 (banker's round() would give 2 here too, so pin
    # a case where they differ: 1/8000 -> 1.25 -> half-up... not a tie).
    # True ties: S*20000 + n divisible edge — use S=1, n=8000:
    # mean = 0.000125 -> e4 = 1.25 -> floor((2*1.25+1)/2) = 1? No:
    # (1*20000 + 8000) // 16000 = 28000 // 16000 = 1 (1.25 rounds DOWN —
    # half-up only bumps >= .5).  S=3, n=8000: 2.375 -> 2.  S=1, n=4000:
    # 2.5 -> half-up 3, while round() banker's gives 2.
    assert _mean_e4(1, 4000) == 3
    assert round(1 / 4000 * 1e4) == 2  # the divergence the fix removes
    assert _mean_e4(1, 2) == 5000
    assert _mean_e4(255 * 12, 12) == 2550000


def test_q1_money_sums_are_partitioning_invariant_at_10x(spark):
    """The r8 VERDICT asked for a 10×-replica partitioning-invariance
    canary on q1's ``ROUND(SUM(l_extendedprice*(1-l_discount)), 2)``.
    Run once against the float formulation, the canary FLIPPED on its
    first execution: at 10× (≈600k rows/group) two of the six groups
    differed by exactly one cent between coalesce(1) and
    repartition(32) — ('R','O') 2755537168.82 vs .81, ('A','O')
    2751086432.75 vs .74.  Per the VERDICT's own protocol ("if it
    flips, migrate that query"), q1's money aggregates are now integer
    cents; this test pins the MIGRATED formulation's invariance on the
    same experiment, for every money column at once."""
    from pyspark.sql import functions as F

    from conftest import ORACLE_SF_DIR
    from dataframework_spark.catalog import load_table

    li = load_table(
        spark, ORACLE_SF_DIR, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate"],
    ).where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    li10 = li.withColumn(
        "rep", F.explode(F.sequence(F.lit(1), F.lit(10)))
    ).drop("rep")

    def cents(col):
        return F.round(col * 100, 0).cast("bigint")

    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    aggs = [
        F.round(F.sum(cents(F.col("l_extendedprice"))) / 100.0, 2).alias("base"),
        F.round(F.sum(cents(disc_price)) / 100.0, 2).alias("disc"),
        F.round(
            F.sum(cents(disc_price * (1 + F.col("l_tax")))) / 100.0, 2
        ).alias("charge"),
    ]
    key = ["l_returnflag", "l_linestatus"]
    one = {tuple(r[:2]): tuple(r[2:])
           for r in li10.coalesce(1).groupBy(key).agg(*aggs).collect()}
    many = {tuple(r[:2]): tuple(r[2:])
            for r in li10.repartition(32).groupBy(key).agg(*aggs).collect()}
    assert one == many
