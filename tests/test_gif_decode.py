"""Unit tests for the real GIF decoder (variable-width LZW + interlace).

The oracle-differential test proves synth → LZW-decode → de-interlace
round-trips at corpus scale; these pin what a hash can't see: the LZW
state machine on ADVERSARIAL streams (KwKwK chains, width bumps at the
512/1024/2048 boundaries, mid-stream dictionary resets, small minimum
code sizes), the giflib-compatible width-bump convention, and the
rejection paths (bad signature, local color tables, truncated
sub-blocks, invalid codes, pixel-count mismatches, missing trailer) —
REJECTED, not mis-decoded.

The encoder (synthesis side) and decoder are independent
implementations of the public GIF89a spec (CompuServe, 1990, Appendix
F), so a roundtrip equality is a genuine differential check of both.
"""

from __future__ import annotations

import numpy as np
import pytest

from dataframework_spark.operators.multimodal import (
    _gif_interlace_order,
    _gif_lzw_decode,
    _gif_lzw_encode,
    decode_gif,
    gif_pixels,
    synth_gif,
)


def _closed_form(doc_id: int) -> np.ndarray:
    w, h = 8 + doc_id % 13, 6 + (doc_id * 7) % 10
    return np.fromfunction(
        lambda y, x: (doc_id + 5 * x + 3 * y) % 256, (h, w)
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# pixel-exact roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 12, 13, 97, 4998, 4999])
def test_decode_matches_closed_form_exactly(doc_id):
    px, palette, interlaced = gif_pixels(synth_gif(doc_id))
    assert interlaced == (doc_id % 2 == 1)
    assert np.array_equal(px, _closed_form(doc_id))
    assert np.array_equal(palette, np.repeat(np.arange(256, dtype=np.uint8), 3).reshape(256, 3))


def test_decode_gif_features_match_closed_form():
    for doc_id in (6, 7):  # one plain, one interlaced
        v = _closed_form(doc_id).astype(np.int64)
        h, w = v.shape
        total = int(v.sum())
        assert decode_gif(synth_gif(doc_id)) == (
            w,
            h,
            (total * 20000 + h * w) // (2 * h * w),
            total,
            int((v * np.arange(h)[:, None]).sum()),
            doc_id % 256,
            doc_id % 2,
        )


def test_interlace_order_is_the_spec_pass_sequence():
    # GIF89a: rows 0,8,.. then 4,12,.. then 2,6,.. then 1,3,..
    assert _gif_interlace_order(10) == [0, 8, 4, 2, 6, 1, 3, 5, 7, 9]
    # a permutation for every height
    for h in range(1, 40):
        assert sorted(_gif_interlace_order(h)) == list(range(h))


def test_interlaced_and_plain_payloads_differ_but_decode_equal():
    """doc_ids with identical dims and pixel formula but opposite
    interlace flags must decode to the same image from DIFFERENT row
    layouts — pinning that de-interlacing actually reorders."""
    # encode the same pixels in both row layouts directly
    px = _closed_form(13)
    h, w = px.shape
    plain = _gif_lzw_decode(
        _gif_lzw_encode(px.tobytes(), 8), 8, w * h
    )
    order = _gif_interlace_order(h)
    inter_stream = b"".join(px[r].tobytes() for r in order)
    assert inter_stream != px.tobytes()  # layouts genuinely differ
    out = np.empty_like(px)
    out[order] = np.frombuffer(
        _gif_lzw_decode(_gif_lzw_encode(inter_stream, 8), 8, w * h), np.uint8
    ).reshape(h, w)
    assert np.array_equal(np.frombuffer(plain, np.uint8).reshape(h, w), px)
    assert np.array_equal(out, px)


# ---------------------------------------------------------------------------
# LZW state machine on adversarial streams
# ---------------------------------------------------------------------------


def _roundtrip(data: bytes, mcs: int = 8) -> None:
    assert _gif_lzw_decode(_gif_lzw_encode(data, mcs), mcs, len(data)) == data


def test_lzw_kwkwk_chain():
    # 'aaaa...' forces the code == next_code case immediately and repeatedly
    _roundtrip(b"\x05" * 1000)
    _roundtrip(b"\x00" * 3)  # minimal KwKwK


def test_lzw_width_bump_boundaries():
    # random bytes force ~1 insertion per code: crosses 512, 1024, 2048
    rng = np.random.RandomState(42)
    _roundtrip(bytes(rng.randint(0, 256, size=8000, dtype=np.uint8)))


def test_lzw_dictionary_reset_midstream():
    # long repetitive input drives next_code to 4096 -> encoder must emit
    # CLEAR and both sides must resynchronize
    data = bytes([1, 1, 2, 2, 3, 1, 1, 2] * 8000)
    enc = _gif_lzw_encode(data, 8)
    assert _gif_lzw_decode(enc, 8, len(data)) == data


def test_lzw_small_mcs():
    rng = np.random.RandomState(3)
    for mcs in (2, 3, 4):
        _roundtrip(bytes(rng.randint(0, 1 << mcs, size=4000, dtype=np.uint8)), mcs)


def test_lzw_single_pixel():
    _roundtrip(b"\x2a")


def test_lzw_rejects_invalid_code():
    # stream (mcs=8): CLEAR, literal 5, then code 400 — representable in
    # 9 bits but beyond the dictionary (only 258 is assignable next)
    import struct

    acc = 256 | (5 << 9) | (400 << 18)  # three 9-bit codes, LSB-first
    data = struct.pack("<I", acc)
    with pytest.raises(ValueError, match="invalid LZW code"):
        _gif_lzw_decode(data, 8, 10)


def test_lzw_rejects_missing_eoi_and_wrong_pixel_count():
    good = _gif_lzw_encode(b"\x01\x02\x03\x04", 8)
    with pytest.raises(ValueError, match="ended before EOI"):
        _gif_lzw_decode(good[:1], 8, 4)
    with pytest.raises(ValueError, match="yields"):
        _gif_lzw_decode(good, 8, 5)  # fewer pixels than expected
    with pytest.raises(ValueError, match="more than"):
        _gif_lzw_decode(good, 8, 3)  # more pixels than expected


def test_lzw_rejects_bad_mcs():
    with pytest.raises(ValueError, match="minimum code size"):
        _gif_lzw_decode(b"\x00", 1, 1)


# ---------------------------------------------------------------------------
# container rejection paths
# ---------------------------------------------------------------------------


def test_rejects_bad_signature():
    with pytest.raises(ValueError, match="bad signature"):
        gif_pixels(b"GIF90a" + b"\x00" * 20)


def test_rejects_missing_global_color_table():
    g = bytearray(synth_gif(4))
    g[10] &= 0x7F  # clear the GCT-present flag
    with pytest.raises(ValueError, match="global color table"):
        gif_pixels(bytes(g))


def test_rejects_local_color_table():
    g = bytearray(synth_gif(4))
    # image descriptor: find 0x2C after the 13-byte header + 768-byte GCT
    pos = bytes(g).index(b"\x2c", 13 + 768)
    g[pos + 9] |= 0x80  # set the local-color-table flag
    with pytest.raises(ValueError, match="local color tables"):
        gif_pixels(bytes(g))


def test_rejects_missing_trailer():
    g = synth_gif(4)
    assert g[-1] == 0x3B
    with pytest.raises(ValueError, match="trailer"):
        gif_pixels(g[:-1])


def test_rejects_truncated_sub_block():
    g = synth_gif(4)
    # cut inside the LZW data sub-blocks (between mcs byte and trailer)
    with pytest.raises(ValueError):
        gif_pixels(g[: len(g) - 10])


def test_rejects_image_larger_than_screen():
    import struct

    g = bytearray(synth_gif(4))
    pos = bytes(g).index(b"\x2c", 13 + 768)
    w = struct.unpack("<H", bytes(g[pos + 5 : pos + 7]))[0]
    g[pos + 5 : pos + 7] = struct.pack("<H", w + 1)
    with pytest.raises(ValueError, match="outside"):
        gif_pixels(bytes(g))


def test_rejects_unknown_block_introducer():
    g = bytearray(synth_gif(4))
    pos = bytes(g).index(b"\x21\xf9")  # graphic control extension
    g[pos] = 0x7E  # not 0x21/0x2C/0x3B
    with pytest.raises(ValueError, match="unrecognized block"):
        gif_pixels(bytes(g))


def test_extensions_are_skipped_not_decoded():
    """The GCE + comment blocks in every synthesized payload must be
    walked over; stripping them must not change the pixels."""
    doc_id = 8
    g = synth_gif(doc_id)
    stripped = g.replace(b"\x21\xf9\x04\x00\x00\x00\x00\x00", b"").replace(
        b"\x21\xfe\x03dfw\x00", b""
    )
    assert len(stripped) < len(g)
    a, _, _ = gif_pixels(g)
    b, _, _ = gif_pixels(stripped)
    assert np.array_equal(a, b)


def test_lzw_eoi_at_exact_width_boundary():
    """255 incompressible bytes put the encoder's free-code counter at
    exactly 512 after the FINAL data code, so EOI is written at the
    bumped 10-bit width — the reader's per-code counter must bump at the
    same point or EOI desyncs (the giflib-convention edge the decoder's
    strictly-greater comparison exists for)."""
    data = bytes(range(255))  # all-distinct: one insertion per emitted code
    _roundtrip(data)
    # one fewer byte: EOI stays at 9 bits; one more: bump happens earlier
    _roundtrip(bytes(range(254)))
    _roundtrip(bytes(range(256)))


# ---------------------------------------------------------------------------
# property-based roundtrip (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=1, max_size=3000),
    mcs=st.integers(min_value=2, max_value=8),
)
def test_lzw_roundtrip_property(data, mcs):
    """encode→decode is the identity for ANY index stream whose values
    fit the palette — hypothesis drives byte distributions (runs,
    near-random, structured) that sweep the width-bump and KwKwK state
    space far beyond the hand-written cases."""
    capped = bytes(b % (1 << mcs) for b in data)
    assert _gif_lzw_decode(_gif_lzw_encode(capped, mcs), mcs, len(capped)) == capped
