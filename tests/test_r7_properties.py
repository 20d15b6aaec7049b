"""Property and plan pins for the r7 operator wave.

The oracle suite proves cross-engine value equality; these pin the
semantic invariants (a future edit that keeps both engines wrong in the
same way must still fail) and the knob contracts.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import ORACLE_SF_DIR

from dataframework_spark.catalog import load_table
from dataframework_spark.functions.arrays import tokens
from dataframework_spark.operators.dedup import dedup_semdedup
from dataframework_spark.operators.text import (
    _BM25_B,
    _BM25_K1,
    _BM25_NQ,
    _BM25_TOPK,
    text_bm25_topk,
)


def test_bm25_topk_shape_and_rank_contract(spark):
    rows = text_bm25_topk(spark, ORACLE_SF_DIR).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) <= set(range(_BM25_NQ))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _BM25_TOPK
        # scores non-increasing with rank; ties broken by doc_id ascending
        for a, b in zip(rs, rs[1:]):
            assert a.score > b.score or (a.score == b.score and a.doc_id < b.doc_id)


def test_bm25_scores_positive_and_every_query_answered(spark):
    """Lucene's +1 IDF keeps every contribution positive, so every score
    is > 0; and every query doc trivially hits itself, so each query
    returns a full page.  (Note: rank-1 = the query doc is NOT a BM25
    invariant — a doc with higher tf of the query terms and a shorter
    length legitimately outscores the query doc; this corpus has such
    docs, which is the saturation/length-normalization behavior
    working.)"""
    rows = text_bm25_topk(spark, ORACLE_SF_DIR).collect()
    assert {r.query_id for r in rows} == set(range(_BM25_NQ))
    for r in rows:
        assert r.score > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, 0)
        by_q[r.query_id] += 1
    assert all(n == _BM25_TOPK for n in by_q.values())


def test_bm25_score_matches_reference_formula(spark):
    """Recompute one query's scores driver-side from raw token counts and
    compare — pins the k1/b/idf algebra, not just cross-engine parity."""
    docs = load_table(spark, ORACLE_SF_DIR, "documents", columns=["doc_id", "text"])
    toks = [
        (r.doc_id, r.toks)
        for r in docs.select("doc_id", tokens().alias("toks")).collect()
    ]
    n_docs = len(toks)
    avgdl = sum(len(t) for _, t in toks) / n_docs
    df = {}
    for _, t in toks:
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    qid = 0
    qterms = set(dict(toks)[qid])
    expected = {}
    for d, t in toks:
        ci_sum = 0
        tf = {}
        for term in t:
            tf[term] = tf.get(term, 0) + 1
        for term in qterms & set(t):
            idf = math.log(1 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            c = (
                idf
                * (tf[term] * (_BM25_K1 + 1.0))
                / (tf[term] + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(t) / avgdl))
            )
            # the operator fixed-points each contribution to integer micros
            # with Spark F.round (HALF_UP) — emulate half-up, NOT Python's
            # banker's round(), so a .5-micro boundary cannot diverge
            ci_sum += math.floor(c * 1_000_000 + 0.5)
        if ci_sum:
            expected[d] = round(ci_sum / 1_000_000.0, 6)
    got = {
        r.doc_id: r.score
        for r in text_bm25_topk(spark, ORACLE_SF_DIR).collect()
        if r.query_id == qid
    }
    want = dict(sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:_BM25_TOPK])
    assert got == want


def test_semdedup_planes_knob_default_identity(spark):
    """n_planes=8 must be the registered query exactly (same bucket fn)."""
    a = sorted(map(tuple, dedup_semdedup(spark, ORACLE_SF_DIR).collect()))
    b = sorted(map(tuple, dedup_semdedup(spark, ORACLE_SF_DIR, n_planes=8).collect()))
    assert a == b


def test_semdedup_more_planes_keeps_first_per_bucket(spark):
    """At any resolution the greedy contract holds: within every bucket the
    smallest vec_id is always kept, and finer buckets can only PRUNE FEWER
    (splitting a cluster removes candidate pairs, never adds them ...
    pruned set at 12 planes ⊆ pruned set at 8 planes is NOT guaranteed
    pairwise, but the kept COUNT can only grow)."""
    r8 = dedup_semdedup(spark, ORACLE_SF_DIR, n_planes=8)
    r12 = dedup_semdedup(spark, ORACLE_SF_DIR, n_planes=12)
    for df in (r8, r12):
        first = df.groupBy("bucket").agg(F.min("vec_id").alias("m"))
        bad = (
            df.join(first, "bucket")
            .where((F.col("vec_id") == F.col("m")) & ~F.col("is_kept"))
            .count()
        )
        assert bad == 0
    kept8 = r8.where("is_kept").count()
    kept12 = r12.where("is_kept").count()
    assert kept12 >= kept8


def test_extended_planes_add_real_splitting_power(spark):
    """The r7 probe found the affine _plane_coef formula produces nearly
    parallel planes for p >= 8 (shifts of one mod-13 pattern), so extra
    planes added almost no buckets.  Pin the fix: going 8 -> 14 planes
    must multiply occupied buckets (real splitting), not merely add a
    few."""
    from dataframework_spark.operators.similarity import _plane_coef

    b8 = dedup_semdedup(spark, ORACLE_SF_DIR, n_planes=8).select("bucket").distinct()
    b14 = dedup_semdedup(spark, ORACLE_SF_DIR, n_planes=14).select("bucket").distinct()
    n8, n14 = b8.count(), b14.count()
    assert n14 >= 2 * n8, (n8, n14)
    # and the first 8 planes are STILL the registered affine formula
    # (the oracles hash those buckets; the mix applies to p >= 8 only)
    assert _plane_coef(3, 7) == ((1 + 3 * 131 + 7 * 31) % 13) - 6


def test_epoch_plan_conserves_budget_and_flags_consistently(spark):
    from dataframework_spark.operators.corpus import (
        _EPOCH_BUDGET_X,
        _EPOCH_CAP,
        corpus_epoch_plan,
    )

    rows = corpus_epoch_plan(spark, ORACLE_SF_DIR).collect()
    assert rows
    total = sum(r.n_tokens for r in rows)
    planned = sum(r.planned_tokens for r in rows)
    # planned tokens sum to the budget up to per-source rounding
    assert abs(planned - _EPOCH_BUDGET_X * total) <= len(rows)
    # weights normalize; epochs = planned/n_tokens; flag matches the value
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.epochs - r.planned_tokens / r.n_tokens) < 1e-3
        assert r.over_exposed == (r.epochs > _EPOCH_CAP)
    # sqrt mixture upsamples the tail: the smallest source must be asked
    # for MORE epochs than the largest
    by_size = sorted(rows, key=lambda r: r.n_tokens)
    assert by_size[0].epochs > by_size[-1].epochs


def test_chi2_keywords_match_driver_recompute(spark):
    """Recompute the full chi2 table driver-side from raw presence counts
    — pins the 2x2 algebra and the one-vs-rest margins."""
    from dataframework_spark.operators.text import (
        _CHI2_DF_MIN,
        _CHI2_TOPK,
        text_chi2_keywords,
    )

    docs = load_table(
        spark, ORACLE_SF_DIR, "documents", columns=["doc_id", "source", "text"]
    ).collect()
    pres = {}
    ns = {}
    for r in docs:
        ns[r.source] = ns.get(r.source, 0) + 1
        for term in set(r.text.strip().split()):
            pres.setdefault(term, {}).setdefault(r.source, 0)
            pres[term][r.source] += 1
    n = len(docs)
    expected = {}
    for term, per_src in pres.items():
        df = sum(per_src.values())
        if df < _CHI2_DF_MIN or df >= n:  # df==n excluded (c+d margin = 0)
            continue
        for src, a in per_src.items():
            b, c = df - a, ns[src] - a
            d = n - df - ns[src] + a
            chi2 = round(
                n * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d)), 4
            )
            expected.setdefault(src, []).append((chi2, term, df, a))
    want = {}
    for src, lst in expected.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        want[src] = [
            (t[1], t[2], t[3], t[0], i + 1) for i, t in enumerate(lst[:_CHI2_TOPK])
        ]
    got = {}
    for r in text_chi2_keywords(spark, ORACLE_SF_DIR).collect():
        got.setdefault(r.source, []).append(
            (r.term, r.df, r.n_docs_in_source, r.chi2, r.rank)
        )
    for src in got:
        got[src].sort(key=lambda t: t[4])
    assert got == want


def test_xml_roundtrip_survives_special_characters(spark, tmp_path):
    """sink_xml_roundtrip's docstring claims arbitrary text survives via
    XML entity escaping — pin it on the characters that break naive XML
    writers (&, <, >, quotes, unicode)."""
    rows = [
        (1, 'a & b < c > d "quoted" it’s', 1.5),
        (2, "<tag>not markup</tag> && more", -2.25),
        (3, "plain", 0.0),
    ]
    df = spark.createDataFrame(rows, "id bigint, txt string, val double")
    path = str(tmp_path / "xml_special")
    df.write.mode("overwrite").format("xml").option("rowTag", "r").save(path)
    back = (
        spark.read.schema("id bigint, txt string, val double")
        .option("rowTag", "r")
        .format("xml")
        .load(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(rows)
