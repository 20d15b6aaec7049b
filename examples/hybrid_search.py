"""Hybrid search — the retrieval stack a RAG deployment actually runs,
composed from this round's registered, oracle-checked components.

Every production search system learned the same lesson: lexical ranking
(BM25) and dense ranking (embedding cosine) fail on DIFFERENT queries —
BM25 misses paraphrase, dense misses rare exact terms — and the cheap,
calibration-free way to combine them is Reciprocal Rank Fusion.  This
example walks the full stack over the test corpus (documents and
embeddings align on doc_id == vec_id):

1. LEXICAL  — BM25 top-5 per query (``text_bm25_topk``: fixed-point
   contribution sums, cached (doc, term) tf, broadcast df/query terms).
2. DENSE    — exact cosine top-5 per query (``sim_cosine_topk``:
   broadcast queries, one corpus scan).
3. FUSE     — RRF over the two top-20 lists (``sim_rrf_fusion``:
   Σ 1/(60 + rank); a doc missing from one list contributes nothing).
4. COMPARE  — where the fused page disagrees with each single system:
   the per-query count of fused top-5 docs that NEITHER system ranked
   #1-5 alone — the lift hybrid exists to buy.
5. KEYWORDS — what vocabulary makes each source distinctive
   (``text_chi2_keywords``), the curation view over the same corpus.

Runnable as-is (~30 s on local[4]):

    python examples/hybrid_search.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from dataframework_spark.registry import all_queries  # noqa: E402
from dataframework_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="hybrid-search", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")
    q = {s.name: s.fn for s in all_queries().values()}

    print("== 1. lexical: BM25 top-5 per query ==")
    lex = q["text_bm25_topk"](spark, SF_DIR).collect()
    for r in [x for x in lex if x.query_id == 0]:
        print(f"  q0 rank={r.rank} doc={r.doc_id} bm25={r.score}")

    print("== 2. dense: exact cosine top-5 per query ==")
    dense = q["sim_cosine_topk"](spark, SF_DIR).collect()
    for r in [x for x in dense if x.query_id == 0][:5]:
        print(f"  q0 rank={r.rank} doc={r.neighbor_id} cos={r.cos_sim}")

    print("== 3. fuse: reciprocal rank fusion over top-20 lists ==")
    fused = q["sim_rrf_fusion"](spark, SF_DIR)
    rows = fused.orderBy("query_id", "rank").collect()
    for r in [x for x in rows if x.query_id == 0][:5]:
        print(
            f"  q0 rank={r.rank} doc={r.doc_id} rrf={r.rrf_score}"
            f" (lex_rank={r.lex_rank}, dense_rank={r.dense_rank})"
        )

    print("== 4. the hybrid lift: fused top-5 docs neither system had on page 1 ==")
    lex_top = {(r.query_id, r.doc_id) for r in lex}
    dense_top = {(r.query_id, r.neighbor_id) for r in dense}
    for qid in sorted({r.query_id for r in rows}):
        page = [r.doc_id for r in rows if r.query_id == qid][:5]
        fresh = [d for d in page if (qid, d) not in lex_top and (qid, d) not in dense_top]
        print(f"  q{qid}: fused page-1 {page}; new-to-both: {fresh}")

    print("== 5. source-distinctive vocabulary (chi^2 keywords) ==")
    for r in q["text_chi2_keywords"](spark, SF_DIR).orderBy("source", "rank").collect():
        if r.rank <= 3:
            print(f"  {r.source}: #{r.rank} {r.term!r} chi2={r.chi2}")

    spark.stop()


if __name__ == "__main__":
    main()
