"""Unit tests for the ISO BMFF structural probe (r11 VERDICT #4).

The oracle-differential test proves synth → box-walk round-trips at
corpus scale; these pin what a hash can't see: malformed containers
must be REJECTED (truncated headers, boxes overrunning their parent,
children that under-tile, size-0 below top level, missing moov, a
non-v0 mvhd), never mis-probed — and the probe re-sniffs the BYTES,
so a container edited behind the synthesis formula's back reports the
edited values, not the formula's.
"""

from __future__ import annotations

import struct

import pytest

from dataframework_spark.operators.multimodal import (
    _box,
    _mp4_children,
    _u32,
    mp4_probe,
    synth_mp4,
)


def test_roundtrip_all_layouts():
    # doc 0: size-0 mdat (7|0 wins over 5|0); doc 5: largesize; doc 4: plain
    assert mp4_probe(synth_mp4(0))[-1] == 2
    assert mp4_probe(synth_mp4(5))[-1] == 1
    assert mp4_probe(synth_mp4(4))[-1] == 0
    n_tracks, n_video, n_audio, dur, w, h, vc, ac, ch, sr, _ = mp4_probe(synth_mp4(2))
    assert (n_tracks, n_video, n_audio) == (3, 1, 2)
    assert dur == 1000 + 2 * 37
    assert (w, h, vc, ac, ch, sr) == (352, 240, "avc1", "mp4a", 1, 44100)


def test_truncated_header_rejected():
    with pytest.raises(ValueError, match="truncated box header"):
        mp4_probe(b"\x00\x00\x00\x08fty")


def test_box_overrun_rejected():
    with pytest.raises(ValueError, match="overruns parent"):
        mp4_probe(synth_mp4(1)[:-5])


def test_under_tiling_rejected():
    # a moov whose declared children stop 4 bytes short of its own end
    mvhd_stub = _box(b"free", b"\x00" * 8)
    moov = _u32(8 + len(mvhd_stub) + 4) + b"moov" + mvhd_stub + b"\x00\x00\x00\x00"
    payload = _box(b"ftyp", b"isom" + _u32(0)) + moov
    with pytest.raises(ValueError):
        mp4_probe(payload)


def test_size_zero_below_top_level_rejected():
    bad = (
        _box(b"ftyp", b"isom" + _u32(0))
        + _u32(16) + b"moov" + b"\x00\x00\x00\x00mvhd"
    )
    with pytest.raises(ValueError, match="size-0 box below top level"):
        mp4_probe(bad)


def test_missing_moov_rejected():
    with pytest.raises(ValueError, match="missing moov"):
        mp4_probe(_box(b"ftyp", b"isom" + _u32(0)) + _box(b"mdat", b"xx"))


def test_ftyp_not_first_rejected():
    p = synth_mp4(4)
    boxes = list(_mp4_children(p, 0, len(p), top=True))
    # re-order: mdat before ftyp
    (f_s, f_e), (m_s, m_e) = (
        (s - 8, e) for fc, s, e, _ in boxes if fc in (b"ftyp", b"mdat")
    )
    reordered = p[m_s:m_e] + p[f_s:f_e] + p[m_e:]
    with pytest.raises(ValueError, match="ftyp not first"):
        mp4_probe(reordered)


def test_nonzero_mvhd_version_rejected():
    p = bytearray(synth_mp4(4))
    i = p.find(b"mvhd") + 4  # version byte of the fullbox
    p[i] = 1
    with pytest.raises(ValueError, match="unsupported mvhd version"):
        mp4_probe(bytes(p))


def test_probe_resniffs_bytes_not_synthesis():
    """Edit the visual sample entry's width field in place: the probe
    must report the EDITED width — proof the features come from the
    box walk, not from the doc_id formula."""
    p = bytearray(synth_mp4(4))
    i = p.find(b"avc1") + 4 + 24  # entry payload + fixed prefix → width
    struct.pack_into(">H", p, i, 999)
    assert mp4_probe(bytes(p))[4] == 999


def test_largesize_declared_length_honored():
    """Shrink a largesize mdat's 64-bit length below its actual span:
    the next 'box' then starts inside garbage and the walk must reject
    rather than resync."""
    p = bytearray(synth_mp4(5))
    i = p.find(b"mdat") + 4  # largesize field follows the fourcc
    (big,) = struct.unpack_from(">Q", p, i)
    struct.pack_into(">Q", p, i, big - 3)
    with pytest.raises(ValueError):
        mp4_probe(bytes(p))
