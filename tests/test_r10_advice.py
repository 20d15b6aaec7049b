"""Reconciliation tests for the r9 ADVICE items (fixed in r10).

1. SURVEY.md §2.10's per-round additions list drifted by CONTENTS (it
   named mm_decode_router + mm_gif_decode but omitted
   dedup_simhash_hamming); the registry pin test only checked counts.
   The guard here recomputes each round's newcomer set mechanically from
   the shipped CORRECTNESS files and asserts every newcomer of the
   latest graded round is named in SURVEY.md — list contents, not a
   count.
2. gif_pixels silently accepted a sub-screen image (w<sw / h<sh or a
   nonzero left/top offset), returning the bare image block with the
   placement and screen dims dropped — neither compositing nor
   rejection.  It now REJECTS any frame that does not cover the logical
   screen exactly, per the decoder's REJECTED-not-mis-decoded contract.
"""

from __future__ import annotations

import json
import re
import struct
from pathlib import Path

import pytest

from dataframework_spark.operators.multimodal import gif_pixels, synth_gif

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# 1. SURVEY additions-list drift: contents, not counts
# ---------------------------------------------------------------------------


def _graded_rounds() -> list[tuple[int, set[str]]]:
    out = []
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", p.name).group(1))
        data = json.loads(p.read_text())
        queries = data.get("queries", data)
        out.append((n, set(queries)))
    return sorted(out)


def test_latest_round_newcomers_are_named_in_survey():
    """Every query FIRST graded in the latest CORRECTNESS round must be
    named (backticked or plain) somewhere in SURVEY.md — the mechanical
    form of the r9 catalog-drift advice."""
    rounds = _graded_rounds()
    assert rounds, "driver CORRECTNESS files missing"
    seen: set[str] = set()
    for _, names in rounds[:-1]:
        seen |= names
    latest_round, latest = rounds[-1]
    newcomers = latest - seen
    survey = (REPO / "SURVEY.md").read_text()
    missing = sorted(n for n in newcomers if n not in survey)
    assert not missing, (
        f"r{latest_round} newcomers absent from SURVEY.md: {missing} — "
        "update the §2.10 additions list (contents, not counts)"
    )


def test_registry_doc_names_every_ever_graded_query():
    """REGISTRY.md + COVERAGE.md are the per-round source of truth; the
    union of every driver-graded query must be registered (no name can
    drift out of the registry while history says it was graded)."""
    from dataframework_spark.registry import all_queries

    registered = set(all_queries())
    ever_graded = set()
    for _, names in _graded_rounds():
        ever_graded |= names
    assert ever_graded <= registered, sorted(ever_graded - registered)


# ---------------------------------------------------------------------------
# 2. partial-frame GIFs are rejected, not silently reinterpreted
# ---------------------------------------------------------------------------


def _grow_screen(payload: bytes, dw: int = 0, dh: int = 0) -> bytearray:
    """Enlarge the logical screen so the (unchanged) image no longer
    covers it."""
    g = bytearray(payload)
    sw, sh = struct.unpack("<HH", payload[6:10])
    g[6:10] = struct.pack("<HH", sw + dw, sh + dh)
    return g


def _image_descriptor_pos(payload: bytes) -> int:
    return payload.index(b"\x2c", 13 + 768)


def test_subscreen_image_rejected_taller_screen():
    g = _grow_screen(synth_gif(4), dh=1)
    with pytest.raises(ValueError, match="partial-frame"):
        gif_pixels(bytes(g))


def test_subscreen_image_rejected_wider_screen():
    g = _grow_screen(synth_gif(4), dw=3)
    with pytest.raises(ValueError, match="partial-frame"):
        gif_pixels(bytes(g))


def test_offset_image_rejected_even_when_it_fits():
    """left=1 on a screen widened by 1: the frame FITS (left+w == sw)
    but does not cover the screen — pre-fix this silently returned the
    bare block."""
    payload = synth_gif(4)
    g = _grow_screen(payload, dw=1)
    pos = _image_descriptor_pos(payload)
    g[pos + 1 : pos + 3] = struct.pack("<H", 1)  # left = 1
    with pytest.raises(ValueError, match="partial-frame"):
        gif_pixels(bytes(g))


def test_oversized_image_still_the_outside_rejection():
    """The pre-existing bounds check keeps its own message (ordering:
    out-of-screen trips before the coverage check)."""
    payload = synth_gif(4)
    g = bytearray(payload)
    pos = _image_descriptor_pos(payload)
    w = struct.unpack("<H", payload[pos + 5 : pos + 7])[0]
    g[pos + 5 : pos + 7] = struct.pack("<H", w + 1)
    with pytest.raises(ValueError, match="outside"):
        gif_pixels(bytes(g))


def test_full_screen_frames_still_decode():
    for doc_id in (3, 4):
        px, palette, _ = gif_pixels(synth_gif(doc_id))
        assert px.size > 0 and palette.shape == (256, 3)
