"""Unit tests for the MP4 sample-table frame index (r12).

The oracle-differential test proves synth → stts/stsz/stsc/stco
resolution round-trips at corpus scale; these pin what a hash can't
see: the offsets genuinely require chunk resolution (a running sum of
sizes is wrong whenever inter-chunk gaps exist), the two-run stts is
genuinely walked, and inconsistent tables are REJECTED, never guessed.
"""

from __future__ import annotations

import struct

import pytest

from dataframework_spark.operators.multimodal import (
    mp4_frame_index,
    synth_mp4_indexed,
)


def _patch_fullbox(payload: bytes, fourcc: bytes, offset: int, new: bytes) -> bytes:
    """Overwrite bytes at `offset` into the first `fourcc` fullbox payload."""
    at = payload.index(fourcc) + 4
    return payload[: at + offset] + new + payload[at + offset + len(new) :]


def test_offsets_require_chunk_resolution():
    # doc 9: gap = 1, spc = 4 -> sample 4 opens chunk 1, one gap byte in.
    rows = mp4_frame_index(synth_mp4_indexed(9), 1)
    sizes = [20 + (9 + 11 * i) % 40 for i in range(8 + 9 % 17)]
    running = 32 + sum(sizes[:4])
    assert rows[4][1] == running + 1  # NOT the gap-blind running sum
    # doc 8: gap = 0 -> running sum and chunk resolution coincide.
    rows0 = mp4_frame_index(synth_mp4_indexed(8), 1)
    sizes0 = [20 + (8 + 11 * i) % 40 for i in range(8 + 8 % 17)]
    assert rows0[4][1] == 32 + sum(sizes0[:4])


def test_two_run_stts_walked():
    d = 3  # n = 11, n1 = 5, d1 = 33
    rows = mp4_frame_index(synth_mp4_indexed(d), 1)
    assert rows[4][3] == 4 * 33
    assert rows[5][3] == 5 * 33           # first sample of run 2
    assert rows[6][3] == 5 * 33 + 43      # delta2 = d1 + 10


def test_ragged_last_chunk_covered():
    # doc 2: n = 10, spc = 5 -> 2 chunks exactly; doc 4: n = 12, spc = 3
    # -> 4 chunks; doc 16: n = 24, spc = 7? (3 + 16 % 4 = 3) -> ragged.
    for d in (2, 4, 16):
        n = 8 + d % 17
        rows = mp4_frame_index(synth_mp4_indexed(d), 1)
        assert len(rows) == n
        assert [r[0] for r in rows] == list(range(n))


def test_stride_selects_every_nth():
    rows = mp4_frame_index(synth_mp4_indexed(5), 3)
    assert [r[0] for r in rows] == [0, 3, 6, 9, 12]
    with pytest.raises(ValueError, match="stride"):
        mp4_frame_index(synth_mp4_indexed(5), 0)


def test_stsz_stts_mismatch_rejected():
    raw = synth_mp4_indexed(0)
    # stts run 1 count 4 -> 5: total no longer matches stsz count
    bad = _patch_fullbox(raw, b"stts", 8, struct.pack(">I", 5))
    with pytest.raises(ValueError, match="sample-count mismatch"):
        mp4_frame_index(bad, 1)


def test_sample_outside_mdat_rejected():
    raw = synth_mp4_indexed(0)
    # first stco chunk offset -> past EOF
    bad = _patch_fullbox(raw, b"stco", 8, struct.pack(">I", len(raw) + 100))
    with pytest.raises(ValueError, match="outside mdat"):
        mp4_frame_index(bad, 1)


def test_chunks_not_covering_samples_rejected():
    raw = synth_mp4_indexed(0)
    # stco claims a single chunk; doc 0 has 8 samples at spc 3 -> 3 chunks
    bad = _patch_fullbox(raw, b"stco", 4, struct.pack(">I", 1))
    with pytest.raises(ValueError, match="do not cover"):
        mp4_frame_index(bad, 1)


def test_invalid_stsc_run_rejected():
    raw = synth_mp4_indexed(0)
    bad = _patch_fullbox(raw, b"stsc", 12, struct.pack(">I", 0))  # per-chunk 0
    with pytest.raises(ValueError, match="invalid stsc run"):
        mp4_frame_index(bad, 1)


def test_uniform_stsz_supported():
    raw = synth_mp4_indexed(8)  # gap = 0: offsets stay valid under resize
    n = 8 + 8 % 17
    # rewrite stsz to uniform 24-byte samples (keep count); shrink is safe
    # only because every real size >= 20 and mdat is unchanged.
    at = raw.index(b"stsz") + 4
    bad = raw[: at + 4] + struct.pack(">II", 24, n) + raw[at + 12 :]
    # the per-sample size table is still present but must be IGNORED
    rows = mp4_frame_index(bad, 1)
    assert all(r[2] == 24 for r in rows)
    assert rows[1][1] == rows[0][1] + 24
