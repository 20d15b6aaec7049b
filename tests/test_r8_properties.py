"""Property tests for the round-8 operators.

- pipeline_hybrid_search: the shared-scan capstone must (a) tokenize the
  corpus exactly once — every explode in the plan lives inside the one
  cached inverted-index relation — and (b) reproduce sim_rrf_fusion's
  fusion product EXACTLY from the shared scan (same ranks, same scores),
  and its bm25 product must agree with text_bm25_topk on every non-self
  hit.
- mm_png_decode: driver-side recompute of one doc's features from the
  closed-form pixels (pins the feature algebra, not just parity).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from conftest import ORACLE_SF_DIR

from dataframework_spark.operators.pipeline import pipeline_hybrid_search
from dataframework_spark.operators.similarity import sim_rrf_fusion
from dataframework_spark.operators.text import text_bm25_topk


def test_hybrid_search_corpus_tokenizes_once(spark):
    """The capstone's reason to exist: every `Generate explode` in the
    optimized plan must be a reprint of the ONE cached (doc, term, tf)
    InMemoryRelation — no un-cached corpus explode may survive.  If the
    cache were dropped, InMemoryRelation would print 0 times while the
    explodes remained, and this assertion fails."""
    df = pipeline_hybrid_search(spark, ORACLE_SF_DIR)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    n_cached = opt.count("InMemoryRelation")
    # r12: TWO caches exist — the (doc, term, tf) inverted index (where the
    # one corpus tokenize lives) and the ranked lexical top-N list that
    # both products read (so the scored pipeline runs once, not twice).
    # Count the tf cache's prints by its exact column list; every explode
    # and every documents scan must live inside one of those prints.
    import re

    n_tf_cached = len(
        re.findall(r"InMemoryRelation \[doc_id#\d+L?, term#\d+, tf#\d+L?\]", opt)
    )
    n_explode = opt.count("Generate explode")
    n_docscan = opt.count("documents.parquet")
    assert n_tf_cached > 0, "shared tf cache missing from the plan"
    assert n_cached > n_tf_cached, (
        "the ranked-lexical-list cache is missing — the scored pipeline "
        "would run once per product"
    )
    assert n_explode == n_tf_cached, (
        f"{n_explode} explodes vs {n_tf_cached} tf-cache prints — "
        "an un-cached corpus tokenization crept in"
    )
    assert n_docscan == n_tf_cached, (
        f"{n_docscan} documents scans vs {n_tf_cached} tf-cache prints"
    )


def test_hybrid_rrf_product_equals_standalone_fusion(spark):
    """The fused ranking served from the shared scan must be IDENTICAL to
    sim_rrf_fusion's standalone recompute — same (query, doc, score,
    rank) set."""
    hybrid = {
        (r.query_id, r.doc_id, r.score, r.rank)
        for r in pipeline_hybrid_search(spark, ORACLE_SF_DIR)
        .where(F.col("system") == "rrf")
        .collect()
    }
    standalone = {
        (r.query_id, r.doc_id, r.rrf_score, r.rank)
        for r in sim_rrf_fusion(spark, ORACLE_SF_DIR).collect()
    }
    assert hybrid == standalone


def test_hybrid_bm25_product_agrees_with_standalone_topk(spark):
    """The lexical product must agree with text_bm25_topk wherever the
    two are comparable: for every (query, doc) the standalone top-k
    ranks that is NOT a self-match, the hybrid list carries the same
    score, and ranks agree up to the self-match shift (the hybrid list
    excludes doc == query, so ranks below a self-match close up by 1)."""
    standalone = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in text_bm25_topk(spark, ORACLE_SF_DIR).collect()
        if r.query_id != r.doc_id
    }
    hybrid = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in pipeline_hybrid_search(spark, ORACLE_SF_DIR)
        .where(F.col("system") == "bm25")
        .collect()
    }
    assert standalone, "standalone top-k unexpectedly empty"
    for key, (score, rank) in standalone.items():
        assert key in hybrid, f"{key} missing from hybrid bm25 list"
        hscore, hrank = hybrid[key]
        assert hscore == score
        assert hrank in (rank, rank - 1)  # self-match removal shifts by <= 1


def test_png_decode_features_match_driver_recompute(spark):
    """Recompute one doc's features from the closed-form pixels and
    compare against the operator's output — pins the feature algebra."""
    out = {
        r.doc_id: r
        for r in __import__(
            "dataframework_spark.operators.multimodal", fromlist=["mm_png_decode"]
        ).mm_png_decode(spark, ORACLE_SF_DIR).collect()
    }
    for d in (0, 7, 123):
        w, h = 9 + d % 12, 7 + (d * 5) % 11
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        px = np.stack(
            [(d + 3 * xs + 7 * ys + 11 * c) % 256 for c in range(3)], axis=2
        )
        r = out[d]
        assert (r.width, r.height) == (w, h)
        n = int(px[:, :, 0].size)
        for c, col in enumerate(("mean_r_e4", "mean_g_e4", "mean_b_e4")):
            # half-up 1e4 fixed-point from the exact integer pixel sum
            assert getattr(r, col) == (int(px[:, :, c].sum()) * 20000 + n) // (2 * n)
        assert r.corner_tl_r == d % 256
        assert r.corner_br_b == (d + 3 * (w - 1) + 7 * (h - 1) + 22) % 256
        assert r.filter_types == "0,1,2,3,4"


def test_embedding_cosine_blocking_is_partition_invariant(spark):
    """The r8 n_blocks knob: blocking partitions the pair space, so the
    EXACT pair set (ids and 4-dp cosines) must be identical for every
    block count — the property that makes the knob safe to size to
    executor memory at any corpus scale."""
    from dataframework_spark.operators.dedup import dedup_embedding_cosine

    def key(df):
        return sorted((r.vec_a, r.vec_b, r.cos_sim) for r in df.collect())

    b4 = key(dedup_embedding_cosine(spark, ORACLE_SF_DIR))  # registered default
    b7 = key(dedup_embedding_cosine(spark, ORACLE_SF_DIR, n_blocks=7))
    b1 = key(dedup_embedding_cosine(spark, ORACLE_SF_DIR, n_blocks=1))
    assert b4 == b7 == b1
    assert b4, "pair set unexpectedly empty"


def test_semantic_dedup_forwards_blocking_knob(spark):
    """pipeline_semantic_dedup(n_blocks=7) must equal the registered
    default — same pairs, same keepers."""
    from dataframework_spark.operators.pipeline import pipeline_semantic_dedup

    def key(df):
        return sorted(map(tuple, df.collect()))

    assert key(pipeline_semantic_dedup(spark, ORACLE_SF_DIR)) == key(
        pipeline_semantic_dedup(spark, ORACLE_SF_DIR, n_blocks=7)
    )
