"""Real-TIFF decode tests (r10) — the PNG/JPEG/GIF discipline applied to
the strip-LZW container: the writer (synthesis) and reader are
independent implementations of the public TIFF 6.0 spec, so a roundtrip
mismatch means one of them is wrong (differential testing).  The LZW
variant here is NOT GIF's: MSB-first bit packing, fixed 8-bit symbols,
and the spec's EARLY width change — the boundary tests pin that
convention specifically, including a late-change impostor encoder whose
output must NOT decode cleanly across the 511-entry boundary.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataframework_spark.operators.multimodal import (
    _TIFF_RPS,
    _tiff_lzw_decode,
    _tiff_lzw_encode,
    decode_tiff,
    synth_tiff,
    tiff_pixels,
)


def _closed_form(doc_id: int) -> np.ndarray:
    w, h = 24 + doc_id % 25, 16 + (doc_id * 7) % 17
    return np.array(
        [
            [(doc_id + 5 * x + 3 * y + (x * y) % 7) % 256 for x in range(w)]
            for y in range(h)
        ],
        np.uint8,
    )


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 5, 6, 11, 12, 24, 37, 99])
def test_decode_matches_closed_form_exactly(doc_id):
    px, n_strips, predictor, big = tiff_pixels(synth_tiff(doc_id))
    exp = _closed_form(doc_id)
    assert px.shape == exp.shape
    assert (px == exp).all()
    assert n_strips == -(-exp.shape[0] // _TIFF_RPS)
    assert predictor == 1 + doc_id % 2
    assert big == (doc_id % 3 == 0)


def test_decode_tiff_features_match_closed_form():
    for doc_id in (0, 1, 4, 9, 50):
        exp = _closed_form(doc_id).astype(np.int64)
        h, w = exp.shape
        total = int(exp.sum())
        assert decode_tiff(synth_tiff(doc_id)) == (
            w,
            h,
            (total * 20000 + h * w) // (2 * h * w),
            total,
            int((exp * np.arange(h)[:, None]).sum()),
            doc_id % 256,
            -(-h // _TIFF_RPS),
            1 + doc_id % 2,
            int(doc_id % 3 == 0),
        )


# ---------------------------------------------------------------------------
# TIFF-LZW core: MSB-first + EARLY width change
# ---------------------------------------------------------------------------


def _roundtrip(data: bytes) -> None:
    assert _tiff_lzw_decode(_tiff_lzw_encode(data), len(data)) == data


def test_lzw_empty_and_single():
    _roundtrip(b"")
    _roundtrip(b"\x00")
    _roundtrip(b"\xff")


def test_lzw_kwkwk_chain():
    _roundtrip(b"\x01" * 200)  # aaaa... is the canonical KwKwK generator
    _roundtrip(b"ababababababababab" * 10)


def test_lzw_early_change_boundaries():
    """Streams whose dictionaries cross 511 (9→10), 1023 (10→11) and
    2047 (11→12): a convention desync on ANY boundary breaks the exact
    roundtrip."""
    base = bytes(range(256))
    for reps in (2, 3, 5, 9, 17):  # ~256·reps entries: crosses each boundary
        _roundtrip(base * reps)


def test_lzw_dictionary_reset_midstream():
    """> 4094 entries forces the encoder's Clear-based reset; the reader
    must follow it."""
    import random

    rng = random.Random(42)
    data = bytes(rng.randrange(256) for _ in range(12000))
    _roundtrip(data)


def test_late_change_impostor_fails_across_boundary():
    """Encode with the PLAIN-LZW (late) width change; the early-change
    reader must desync somewhere past the 511-entry boundary — proving
    the early-change convention is load-bearing, not decorative."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    import random

    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(1200))  # > 511 entries
    emit(CLEAR)
    cur = data[:1]
    for b in data[1:]:
        k = cur + bytes([b])
        if k in table:
            cur = k
            continue
        emit(table[cur])
        table[k] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:  # LATE (plain LZW)
            width += 1
        cur = bytes([b])
    emit(table[cur])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)

    with pytest.raises(ValueError):
        got = _tiff_lzw_decode(bytes(out), len(data))
        if got != data:  # a silent wrong decode is also a failure mode
            raise ValueError("desynced decode")


def test_lzw_rejects_truncation_and_garbage():
    enc = _tiff_lzw_encode(b"hello strip world" * 10)
    with pytest.raises(ValueError):
        _tiff_lzw_decode(enc[: len(enc) // 2], 170)
    with pytest.raises(ValueError, match="invalid TIFF LZW code"):
        # code 300 before any insertions
        acc = (256 << 9) | 300  # CLEAR then invalid
        raw = acc << (24 - 18)
        _tiff_lzw_decode(raw.to_bytes(3, "big"), 5)


def test_lzw_rejects_wrong_pixel_count():
    enc = _tiff_lzw_encode(b"abcabcabc")
    with pytest.raises(ValueError, match="yields"):
        _tiff_lzw_decode(enc, 8)
    with pytest.raises(ValueError, match="more than"):
        _tiff_lzw_decode(enc, 4)


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_lzw_roundtrip_property(data):
    _roundtrip(data)


# ---------------------------------------------------------------------------
# container rejection paths
# ---------------------------------------------------------------------------


def _patch_short_tag(payload: bytes, tag: int, value: int) -> bytes:
    """Rewrite a SHORT IFD entry's value in a synth_tiff payload."""
    e = ">" if payload[:2] == b"MM" else "<"
    ifd_off = struct.unpack(e + "I", payload[4:8])[0]
    n = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])[0]
    out = bytearray(payload)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        t = struct.unpack(e + "H", payload[off : off + 2])[0]
        if t == tag:
            out[off + 8 : off + 12] = struct.pack(e + "HH", value, 0)
            return bytes(out)
    raise AssertionError(f"tag {tag} not present")


def test_rejects_bad_byte_order_and_magic():
    g = synth_tiff(4)
    with pytest.raises(ValueError, match="byte-order"):
        tiff_pixels(b"XX" + g[2:])
    bad = bytearray(g)
    bad[2:4] = struct.pack("<H", 43)
    with pytest.raises(ValueError, match="magic"):
        tiff_pixels(bytes(bad))


def test_rejects_wrong_compression_bps_spp_photometric():
    g = synth_tiff(4)
    with pytest.raises(ValueError, match="LZW"):
        tiff_pixels(_patch_short_tag(g, 259, 1))  # uncompressed
    with pytest.raises(ValueError, match="8-bit"):
        tiff_pixels(_patch_short_tag(g, 258, 16))
    with pytest.raises(ValueError, match="single-sample"):
        tiff_pixels(_patch_short_tag(g, 277, 3))
    with pytest.raises(ValueError, match="BlackIsZero"):
        tiff_pixels(_patch_short_tag(g, 262, 0))
    with pytest.raises(ValueError, match="predictor"):
        tiff_pixels(_patch_short_tag(g, 317, 3))


def test_rejects_multipage_and_truncation():
    g = synth_tiff(7)
    e = "<"
    out = bytearray(g)
    out[-4:] = struct.pack(e + "I", 8)  # next-IFD pointer ≠ 0
    with pytest.raises(ValueError, match="multi-page"):
        tiff_pixels(bytes(out))
    with pytest.raises(ValueError):
        tiff_pixels(g[: len(g) - 30])  # IFD cut off
    with pytest.raises(ValueError):
        tiff_pixels(g[:6])


def test_rejects_strip_overrun():
    g = synth_tiff(4)
    e = ">" if g[:2] == b"MM" else "<"
    ifd_off = struct.unpack(e + "I", g[4:8])[0]
    n = struct.unpack(e + "H", g[ifd_off : ifd_off + 2])[0]
    out = bytearray(g)
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack(e + "H", g[off : off + 2])[0]
        if tag == 279:  # StripByteCounts array lives out of line
            arr = struct.unpack(e + "I", g[off + 8 : off + 12])[0]
            out[arr : arr + 4] = struct.pack(e + "I", len(g) + 99)
    with pytest.raises(ValueError, match="overruns|yields|ended"):
        tiff_pixels(bytes(out))


def test_ycheck_pins_strip_order():
    """Swap the first two strip offsets: the payload still decodes
    byte-wise (same strips, wrong order) — the ycheck feature must
    change, which is exactly why it exists."""
    doc_id = 10  # predictor 1, little-endian, ≥ 2 strips
    g = synth_tiff(doc_id)
    e = "<"
    ifd_off = struct.unpack(e + "I", g[4:8])[0]
    n = struct.unpack(e + "H", g[ifd_off : ifd_off + 2])[0]
    out = bytearray(g)
    so = sc = None
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack(e + "H", g[off : off + 2])[0]
        if tag == 273:
            so = struct.unpack(e + "I", g[off + 8 : off + 12])[0]
        if tag == 279:
            sc = struct.unpack(e + "I", g[off + 8 : off + 12])[0]
    for base in (so, sc):
        a = struct.unpack(e + "I", g[base : base + 4])[0]
        b = struct.unpack(e + "I", g[base + 4 : base + 8])[0]
        out[base : base + 4] = struct.pack(e + "I", b)
        out[base + 4 : base + 8] = struct.pack(e + "I", a)
    swapped = decode_tiff(bytes(out))
    original = decode_tiff(g)
    assert swapped[3] == original[3]  # plain checksum blind to order
    assert swapped[4] != original[4]  # ycheck catches it


def test_predictor_and_endianness_axes_appear():
    preds = {decode_tiff(synth_tiff(d))[7] for d in range(6)}
    bigs = {decode_tiff(synth_tiff(d))[8] for d in range(6)}
    assert preds == {1, 2} and bigs == {0, 1}


def test_in_corpus_width_bumps_are_real():
    """≥ 1/4 of the first 100 docs must push some strip's dictionary
    past 511 entries — the early-change boundary genuinely executes on
    registered data (the GIF discipline)."""
    bumped = 0
    for d in range(100):
        w, h = 24 + d % 25, 16 + (d * 7) % 17
        rows = [
            bytes((d + 5 * x + 3 * y + (x * y) % 7) % 256 for x in range(w))
            for y in range(h)
        ]
        pred = 1 + d % 2
        for s0 in range(0, h, _TIFF_RPS):
            chunk = rows[s0 : s0 + _TIFF_RPS]
            if pred == 2:
                chunk = [
                    bytes([r[0]] + [(r[i] - r[i - 1]) % 256 for i in range(1, len(r))])
                    for r in chunk
                ]
            table = {bytes([i]): i for i in range(256)}
            nxt, cur = 258, b""
            data = b"".join(chunk)
            cur = data[:1]
            for bch in data[1:]:
                k = cur + bytes([bch])
                if k in table:
                    cur = k
                    continue
                table[k] = nxt
                nxt += 1
                cur = bytes([bch])
            if nxt > 511:
                bumped += 1
                break
    assert bumped >= 25, bumped
