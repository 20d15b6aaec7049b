"""Unit tests for the MPEG audio frame-header probe (r12).

The oracle-differential test proves synth → frame-walk round-trips at
corpus scale; these pin what a hash can't see: out-of-subset or broken
streams must be REJECTED (lost sync, non-MPEG-1/non-Layer-III headers,
free-format/reserved bitrate, reserved sample rate, mid-stream
parameter changes, frames overrunning the file, malformed tags), never
mis-probed — and the probe re-sniffs the BYTES, so a stream edited
behind the synthesis formula's back reports the edited values.
"""

from __future__ import annotations

import pytest

from dataframework_spark.operators.multimodal import mp3_probe, synth_mp3


def _frame(bi: int = 9, sri: int = 0, pad: int = 0, ch: int = 0) -> bytes:
    from dataframework_spark.operators.multimodal import (
        _MP3_BITRATE_KBPS,
        _MP3_SAMPLE_RATE,
    )

    flen = 144 * _MP3_BITRATE_KBPS[bi] * 1000 // _MP3_SAMPLE_RATE[sri] + pad
    hdr = bytes((0xFF, 0xFB, (bi << 4) | (sri << 2) | (pad << 1), (ch << 6) | 4))
    return hdr + bytes(flen - 4)


def test_roundtrip_cbr_vbr_and_tags():
    # doc 0: CBR + ID3v2 + ID3v1; doc 1: VBR bare; doc 5: VBR + ID3v1
    assert mp3_probe(synth_mp3(0)) == (4, 44100, "stereo", 32, 32, 1, 104, 418, 1, 1)
    n, sr, _, lo, hi, cbr, *_ , v2, v1 = mp3_probe(synth_mp3(1))
    assert (cbr, v2, v1) == (0, 0, 0) and lo < hi
    assert mp3_probe(synth_mp3(5))[-1] == 1


def test_lost_sync_rejected():
    with pytest.raises(ValueError, match="lost MPEG frame sync"):
        mp3_probe(b"\x00\x00\x00\x00" + _frame())


def test_mpeg2_and_layer_rejected():
    f = bytearray(_frame())
    f[1] = 0xF3  # version bits 10 = MPEG-2
    with pytest.raises(ValueError, match="MPEG-1 only"):
        mp3_probe(bytes(f))
    f = bytearray(_frame())
    f[1] = 0xFD  # layer bits 10 = Layer II
    with pytest.raises(ValueError, match="Layer III only"):
        mp3_probe(bytes(f))


def test_free_format_and_reserved_bitrate_rejected():
    f = bytearray(_frame())
    f[2] = (0 << 4) | (f[2] & 0x0F)
    with pytest.raises(ValueError, match="free-format"):
        mp3_probe(bytes(f))
    f[2] = (15 << 4) | (f[2] & 0x0F)
    with pytest.raises(ValueError, match="reserved bitrate"):
        mp3_probe(bytes(f))


def test_reserved_sample_rate_rejected():
    f = bytearray(_frame())
    f[2] = (f[2] & 0xF0) | (3 << 2) | (f[2] & 0x02)
    with pytest.raises(ValueError, match="reserved sample-rate"):
        mp3_probe(bytes(f))


def test_midstream_parameter_change_rejected():
    with pytest.raises(ValueError, match="change mid-stream"):
        mp3_probe(_frame(sri=0) + _frame(sri=1))
    with pytest.raises(ValueError, match="change mid-stream"):
        mp3_probe(_frame(ch=0) + _frame(ch=3))


def test_truncated_frame_rejected():
    with pytest.raises(ValueError, match="frame overruns file"):
        mp3_probe(_frame()[:-5])
    with pytest.raises(ValueError, match="truncated frame header"):
        mp3_probe(_frame() + b"\xff\xfb")


def test_id3v2_overrun_and_bad_syncsafe_rejected():
    with pytest.raises(ValueError, match="overruns file"):
        mp3_probe(b"ID3" + bytes((4, 0, 0)) + bytes((0, 0, 7, 127)) + b"\x00" * 4)
    with pytest.raises(ValueError, match="syncsafe"):
        mp3_probe(b"ID3" + bytes((4, 0, 0)) + bytes((0, 0, 0, 0x80)))


def test_no_frames_rejected():
    with pytest.raises(ValueError, match="no MPEG frames"):
        mp3_probe(b"ID3" + bytes((4, 0, 0)) + bytes((0, 0, 0, 0)))


def test_probe_resniffs_bytes_not_formula():
    # flip one frame's padding bit in a synthesized stream: the walk must
    # still land exactly (the stride follows the BYTES) and audio_bytes
    # must report one more byte than the formula predicts.
    doc = 4  # CBR, no tags, pad bits (4+i) % 2 -> frame 0 pad=0
    base = mp3_probe(synth_mp3(doc))
    raw = bytearray(synth_mp3(doc))
    assert raw[2] & 0x02 == 0
    raw[2] |= 0x02  # frame 0 now claims padding
    raw.insert(144 * 64 * 1000 // 48000, 0)  # and carries the extra byte
    edited = mp3_probe(bytes(raw))
    assert edited[7] == base[7] + 1
    assert edited[:7] == base[:7]
