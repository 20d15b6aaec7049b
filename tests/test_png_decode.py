"""Unit tests for the real PNG decoder (stdlib zlib + numpy defilter).

The oracle-differential test proves synth → inflate → defilter →
features round-trips at corpus scale; these pin what a hash can't see:
malformed containers must be REJECTED (bad signature, CRC corruption,
truncated IDAT, unsupported IHDR, invalid filter byte), the Paeth
predictor must follow RFC 2083's normative tie-break, and defiltering
must use RECONSTRUCTED (not raw-filtered) neighbors — each filter type
is exercised in isolation against the closed-form pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dataframework_spark.operators.multimodal import (
    _paeth_predict,
    _png_filter_row,
    decode_png,
    png_pixels,
    synth_png,
)


def _formula_pixels(doc_id: int) -> np.ndarray:
    w, h = 9 + doc_id % 12, 7 + (doc_id * 5) % 11
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack(
        [(doc_id + 3 * xs + 7 * ys + 11 * c) % 256 for c in range(3)], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 37, 499])
def test_png_round_trip_matches_formula(doc_id):
    px, fts = png_pixels(synth_png(doc_id))
    assert (px == _formula_pixels(doc_id)).all()
    assert fts == [0, 1, 2, 3, 4]  # h >= 7 guarantees all five filters


def _encode_single_filter(px: np.ndarray, ft: int) -> bytes:
    """Build a PNG whose EVERY row uses filter type ft — isolates one
    defilter path per test case."""
    h, w = px.shape[:2]
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.uint8)
    for r in range(h):
        row = px[r].reshape(-1)
        raw.append(ft)
        raw += _png_filter_row(row, prev, ft).tobytes()
        prev = row

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_each_filter_type_defilters_exactly(ft):
    """Every filter path in isolation, on a high-entropy image whose
    neighbors differ (catches raw-vs-reconstructed-left bugs: with
    filter Sub applied to every row, a decoder that adds the FILTERED
    left byte instead of the RECONSTRUCTED one diverges by row 1)."""
    rng = np.random.default_rng(ft + 1)
    px = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    got, fts = png_pixels(_encode_single_filter(px, ft))
    assert (got == px).all()
    assert fts == [ft]


def test_paeth_tiebreak_is_normative():
    """RFC 2083 §6.6: on ties prefer a (left), then b (up), then c."""
    a = np.array([1, 5, 0])
    b = np.array([1, 3, 9])
    c = np.array([1, 4, 9])
    # p = a+b-c; case1 all equal -> a; case2 pa==pb -> a; case3 pb==pc -> b
    got = _paeth_predict(a, b, c)
    assert got[0] == 1
    # hand-check case 2: p=4, pa=1,pb=1,pc=0 -> pc smallest -> c
    assert got[1] == c[1]
    assert got[2] == b[2] or got[2] == a[2] or got[2] == c[2]  # sanity
    # exhaustive scalar check vs the spec reference implementation
    for aa in range(0, 256, 51):
        for bb in range(0, 256, 51):
            for cc in range(0, 256, 51):
                p = aa + bb - cc
                pa, pb, pc = abs(p - aa), abs(p - bb), abs(p - cc)
                want = aa if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                got1 = _paeth_predict(
                    np.array([aa]), np.array([bb]), np.array([cc])
                )[0]
                assert got1 == want, (aa, bb, cc)


def test_png_rejects_bad_signature():
    payload = bytearray(synth_png(7))
    payload[0] = 0x88
    with pytest.raises(ValueError, match="signature"):
        png_pixels(bytes(payload))


def test_png_rejects_crc_corruption():
    payload = bytearray(synth_png(7))
    # flip one byte inside the IDAT data (after the 8-byte sig + 25-byte
    # IHDR chunk + 8-byte IDAT header)
    payload[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_pixels(bytes(payload))


def test_png_rejects_truncated_idat():
    payload = synth_png(7)
    with pytest.raises(ValueError):
        png_pixels(payload[: len(payload) - 16])


def test_png_rejects_unsupported_ihdr():
    # bit depth 16 (bytes are at sig+8 .. sig+8+13; depth is offset 8 in data)
    payload = bytearray(synth_png(7))
    data_off = 8 + 8  # sig + len/type
    ihdr = bytearray(payload[data_off : data_off + 13])
    ihdr[8] = 16
    crc = zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF
    payload[data_off : data_off + 13] = ihdr
    payload[data_off + 13 : data_off + 17] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="unsupported"):
        png_pixels(bytes(payload))


def test_png_rejects_invalid_filter_byte():
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    h, w = 4, 4
    raw = bytearray()
    for r in range(h):
        raw.append(9)  # invalid filter type
        raw += bytes(w * 3)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="filter type"):
        png_pixels(payload)


def test_png_rejects_wrong_inflated_length():
    # declare 5 rows in IHDR but provide 4 rows of scanlines
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + bytes(12) for _ in range(4))

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflated"):
        png_pixels(payload)


def test_decode_png_corners_pin_row_order():
    """corner_tl_r must be pixel (0,0) and corner_br_b pixel (w-1,h-1) —
    a bottom-up/top-down mixup (the classic BMP habit) flips both."""
    d = 11
    w, h = 9 + d % 12, 7 + (d * 5) % 11
    out = decode_png(synth_png(d))
    assert out[5] == d % 256
    assert out[6] == (d + 3 * (w - 1) + 7 * (h - 1) + 22) % 256


def test_multi_idat_streams_concatenate():
    """IDAT may be split across chunks; the decoder must concatenate."""
    payload = synth_png(3)
    # split the single IDAT into two chunks at an arbitrary byte
    sig, rest = payload[:8], payload[8:]
    # walk to IDAT
    pos = 0
    chunks = []
    while pos < len(rest):
        (size,) = struct.unpack(">I", rest[pos : pos + 4])
        typ = rest[pos + 4 : pos + 8]
        data = rest[pos + 8 : pos + 8 + size]
        chunks.append((typ, data))
        pos += 12 + size
    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )
    rebuilt = sig
    for typ, data in chunks:
        if typ == b"IDAT" and len(data) > 4:
            rebuilt += chunk(b"IDAT", data[:3]) + chunk(b"IDAT", data[3:])
        else:
            rebuilt += chunk(typ, data)
    px, fts = png_pixels(rebuilt)
    assert (px == _formula_pixels(3)).all()


# ---------------------------------------------------------------------------
# r11 breadth: palette (color type 3) + Adam7 interlace
# ---------------------------------------------------------------------------


def _chunk(typ, data):
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _rebuild(payload, mutate):
    """Re-emit a PNG chunk stream through ``mutate(typ, data) ->
    (typ, data) | None`` (None drops the chunk)."""
    out, pos = payload[:8], 8
    while pos < len(payload):
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        kept = mutate(typ, data)
        if kept is not None:
            out += _chunk(*kept)
        pos += 12 + size
    return out


def test_palette_adam7_variants_roundtrip():
    from dataframework_spark.operators.multimodal import synth_png_v2

    for d in range(8):  # two of each (ctype, interlace) combination
        px, fts = png_pixels(synth_png_v2(d))
        assert px.shape[2] == 3 and fts == [0, 1, 2, 3, 4]


def test_interlace_changes_bytes_not_values():
    """Adam7 is a byte-layout property: doc d and d+2 share (w, h, ctype)
    formulas whenever d % 4 < 2 maps to d+2's interlaced twin with the
    same doc constants — decode values must match pixel-for-pixel when
    the formula inputs coincide."""
    from dataframework_spark.operators.multimodal import synth_png_v2

    # craft twins directly: same doc constants, flipped interlace bit is
    # impossible via doc_id alone, so compare against the formula instead
    for d in (2, 3, 6, 7, 10, 11):  # interlaced variants
        px, _ = png_pixels(synth_png_v2(d))
        h, w = px.shape[:2]
        npal = 17 + d % 13
        for (x, y) in ((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1), (3, 5)):
            for c in range(3):
                want = (
                    (d + 3 * x + 7 * y + 11 * c) % 256
                    if d % 2 == 0
                    else (d + 9 * ((d + 3 * x + 7 * y) % npal) + 11 * c) % 256
                )
                assert int(px[y, x, c]) == want, (d, x, y, c)


def test_truncated_palette_rejected():
    from dataframework_spark.operators.multimodal import synth_png_v2

    payload = synth_png_v2(1)  # palette, non-interlaced
    bad = _rebuild(
        payload,
        lambda typ, data: (typ, data[:-1]) if typ == b"PLTE" else (typ, data),
    )
    with pytest.raises(ValueError, match="truncated palette"):
        png_pixels(bad)


def test_missing_palette_rejected():
    from dataframework_spark.operators.multimodal import synth_png_v2

    payload = synth_png_v2(1)
    bad = _rebuild(
        payload, lambda typ, data: None if typ == b"PLTE" else (typ, data)
    )
    with pytest.raises(ValueError, match="missing PLTE"):
        png_pixels(bad)


def test_palette_index_past_last_entry_rejected():
    """Shrink the PLTE below the max index actually used: the decoder
    must refuse rather than wrap or clamp."""
    from dataframework_spark.operators.multimodal import synth_png_v2

    payload = synth_png_v2(1)  # npal = 17 + 1 % 13 = 18; indices reach 17
    bad = _rebuild(
        payload,
        lambda typ, data: (typ, data[: 3 * 4]) if typ == b"PLTE" else (typ, data),
    )
    with pytest.raises(ValueError, match="past last entry"):
        png_pixels(bad)


def test_unsupported_color_types_still_rejected():
    payload = bytearray(synth_png(2))
    payload[25] = 6  # IHDR color type byte → RGBA
    ihdr = bytes(payload[16:29])  # re-CRC the mutated IHDR
    fixed = bytes(payload[:8]) + _chunk(b"IHDR", ihdr) + bytes(payload[33:])
    with pytest.raises(ValueError, match="unsupported PNG"):
        png_pixels(fixed)
