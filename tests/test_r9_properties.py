"""Property tests for the r9 additions.

The mixed-format decode router (`mm_decode_router`): magic-byte
dispatch must route every synthesized container to the right REAL
parser, skip (not decode, not reject) the externals-only mp3 tier, and
reject unknown containers explicitly — never guess.
"""

from __future__ import annotations

import numpy as np
import pytest

from dataframework_spark.operators.multimodal import (
    _bmp_pixels,
    _mean_e4,
    gif_pixels,
    jpeg_pixels,
    png_pixels,
    route_media,
    synth_bmp,
    synth_gif,
    synth_jpeg,
    synth_media,
    synth_mp3_stub,
    synth_png,
    synth_wav,
    wav_samples,
)


@pytest.mark.parametrize("doc_id", range(22))
def test_router_fmt_matches_synthesis(doc_id):
    # eleven-way since r11: progressive SOF2 JPEG (grey AND 4:2:0 color)
    # joined the r10 mix
    fmt, verdict, *_ = route_media(synth_media(doc_id))
    want = [
        "wav", "bmp", "png", "jpeg", "mp3", "gif", "tiff", "flac", "jpeg",
        "jpeg", "jpeg",
    ][doc_id % 11]
    assert fmt == want
    assert verdict == ("skipped:mp3" if want == "mp3" else "decoded")


def test_router_wav_features_match_parser():
    payload = synth_wav(12)  # 12 % 6 == 0
    fmt, verdict, w, h, n_units, feat = route_media(payload)
    _, s = wav_samples(payload)
    assert (fmt, verdict, w, h) == ("wav", "decoded", None, None)
    assert n_units == len(s)
    assert feat == _mean_e4(int(np.abs(s).sum()), len(s))


@pytest.mark.parametrize(
    "synth,pixels,name",
    [
        (synth_bmp, _bmp_pixels, "bmp"),
        (synth_png, lambda p: png_pixels(p)[0], "png"),
    ],
)
def test_router_rgb_features_match_parser(synth, pixels, name):
    payload = synth(7)
    fmt, verdict, w, h, n_units, feat = route_media(payload)
    px = pixels(payload)
    assert (fmt, verdict) == (name, "decoded")
    assert (w, h) == (px.shape[1], px.shape[0])
    assert n_units == px.size
    assert feat == _mean_e4(int(px.astype(np.int64).sum()), px.size)


def test_router_jpeg_features_match_parser():
    payload, w, h = synth_jpeg(9)  # 9 % 6 == 3
    fmt, verdict, rw, rh, n_units, feat = route_media(payload)
    px = jpeg_pixels(payload)
    assert (fmt, verdict, rw, rh) == ("jpeg", "decoded", w, h)
    assert n_units == w * h
    assert feat == _mean_e4(int(px.astype(np.int64).sum()), w * h)


def test_router_skips_mp3_without_decoding():
    fmt, verdict, w, h, n_units, feat = route_media(synth_mp3_stub(9))
    assert (fmt, verdict) == ("mp3", "skipped:mp3")
    assert w is h is n_units is feat is None
    # bare mp3 frame sync (no ID3 tag) is also recognized as mp3
    assert route_media(b"\xff\xfbjunkframe")[0:2] == ("mp3", "skipped:mp3")


@pytest.mark.parametrize(
    "junk",
    [
        b"",  # empty
        b"\x00\x01\x02\x03 random bytes",
        b"RIFX0000WAVE",  # wrong RIFF endianness marker
        b"ID2\x03\x00\x00",  # almost-ID3
    ],
)
def test_router_rejects_unknown_containers(junk):
    fmt, verdict, w, h, n_units, feat = route_media(junk)
    assert (fmt, verdict) == ("unknown", "rejected:unknown")
    assert w is h is n_units is feat is None


def test_router_gif_features_match_parser():
    payload = synth_gif(11)  # 11 % 6 == 5, odd -> interlaced path
    fmt, verdict, w, h, n_units, feat = route_media(payload)
    idx, palette, interlaced = gif_pixels(payload)
    rgb = palette[idx]
    assert (fmt, verdict) == ("gif", "decoded")
    assert interlaced
    assert (w, h) == (idx.shape[1], idx.shape[0])
    assert n_units == rgb.size
    assert feat == _mean_e4(int(rgb.astype(np.int64).sum()), rgb.size)


def test_router_does_not_mask_corrupt_truncated_gif():
    """GIF magic is now CLAIMED (r9): a truncated GIF must RAISE from
    the parser, not fall through to rejected:unknown."""
    with pytest.raises(ValueError):
        route_media(b"GIF89a....")


def test_router_does_not_mask_corrupt_known_formats():
    """A payload that sniffs as PNG but is corrupt must RAISE (the
    parser's rejection), not fall through to rejected:unknown — routing
    is by magic bytes only; decode errors stay loud."""
    good = synth_png(12)
    corrupt = good[:20] + bytes([good[20] ^ 0xFF]) + good[21:]
    with pytest.raises(ValueError):
        route_media(corrupt)


# ---------------------------------------------------------------------------
# dedup_simhash_hamming (r9): lossless banding + pigeonhole boundary
# ---------------------------------------------------------------------------

SF_SMALL = "/root/testdata/sf0.001"


def test_simhash_hamming_banding_is_lossless(spark):
    """The banded candidate plan must emit EXACTLY the brute-force
    all-pairs result — pigeonhole (hamming <= 3 over 4 bands forces >= 1
    untouched band) says no pair can be lost; this pins it measured."""
    import pyspark.sql.functions as F

    from dataframework_spark.operators.dedup import (
        _SH64_R,
        dedup_simhash_hamming,
        simhash64_signatures,
    )

    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup_simhash_hamming(spark, SF_SMALL).collect()
    }
    sig = simhash64_signatures(spark, SF_SMALL)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb"))
    ham = F.expr("bit_count(sa ^ sb)")
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= _SH64_R)
        .collect()
    }
    assert banded == brute
    assert len(brute) > 0  # non-vacuous: the corpus has close pairs


def test_simhash_hamming_radius_is_inside_pigeonhole_bound():
    from dataframework_spark.operators.dedup import _SH64_BANDS, _SH64_R

    # losslessness REQUIRES r < bands; this is the invariant the operator
    # docstring argues from — a future retune must keep it
    assert _SH64_R < _SH64_BANDS


def test_simhash_hamming_pairs_are_canonical_and_within_radius(spark):
    from dataframework_spark.operators.dedup import _SH64_R, dedup_simhash_hamming

    rows = dedup_simhash_hamming(spark, SF_SMALL).collect()
    assert all(r.doc_a < r.doc_b for r in rows)
    assert all(0 <= r.hamming <= _SH64_R for r in rows)


def test_simhash_hamming_plan_single_corpus_scan(spark):
    """The signature stage must read the corpus ONCE (cached signatures
    feed both band-join sides) — a second parquet scan would mean the
    tokenize+fold pipeline runs twice per query."""
    from dataframework_spark.operators.dedup import dedup_simhash_hamming

    df = dedup_simhash_hamming(spark, SF_SMALL)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # both band-join sides must read the CACHED signatures (the raw
    # "Scan parquet" string also appears inside the InMemoryRelation's
    # stored child plan, so count the cache reads, not the scans)
    assert plan.count("InMemoryTableScan") >= 2
