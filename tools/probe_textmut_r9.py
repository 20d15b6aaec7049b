"""Token-rename (mutation) scale probe for the TEXT-side sweep exclusions
(VERDICT r8, next-round #3): ``dedup_ngram_jaccard``,
``dedup_ngram_containment``, ``dedup_simhash``, ``dedup_lsh_eval``,
``dedup_clusters``, ``ml_leakage_safe_split``, and
``pipeline_pretrain_corpus``.

All seven are excluded from the replica sweeps for a sound reason — an M×
replica makes every document an M-way near-dup, so the OUTPUT pair set /
cluster graph grows ~M² by construction.  This probe is the text-corpus
analog of the embedding rotation synthesis (``probe_rotation_r8.py``):
copy j of each document gets every whitespace token renamed ``tok →
tok~j``.  A per-copy token rename is a BIJECTION on the vocabulary, so:

* within each copy, every pairwise shingle-set Jaccard / containment is
  EXACTLY the base corpus's value (shingle sets are renamed elementwise);
* across copies, shingle sets are DISJOINT (different suffixes), so
  Jaccard/containment/minhash-band candidates cannot cross copies.

True near-dup structure therefore grows exactly ~M, not M² — the
non-degenerate scale-up real corpora exhibit, with the base corpus's
planted ≥0.9-Jaccard pairs carried verbatim into every copy.

What this probe can and cannot claim, per operator:

* ``dedup_ngram_jaccard`` / ``dedup_ngram_containment`` — output pairs
  must be exactly M× the base count and 100% within-copy (the probe
  decomposes and reports both).  COMPUTE stays the prefix-filtered index
  join; the shingle exchange grows ~M because per-copy vocabularies are
  disjoint (no hot-key pileup).
* ``dedup_minhash_lsh``-vs-truth (``dedup_lsh_eval``) — candidates and
  truth both grow ~M; cross-copy band collisions need 4 simultaneous
  31-bit minhash matches between disjoint shingle sets (~P⁻⁴), so
  precision/recall at M should match the base corpus's values.
* ``dedup_simhash`` — within-copy structure is preserved only
  STATISTICALLY (token hashes change under rename, so per-copy
  signatures re-roll), and the 16-bit key space saturates by pigeonhole:
  at M=100 the corpus is 500k docs in ≤65536 buckets, so bucket pair
  mass carries a ~n²/2¹⁶ birthday term that is a WIDTH fact of the
  16-bit teaching hash, not operator blowup.  The probe decomposes
  bucket pair mass into same-copy vs cross-copy (via
  ``simhash_signatures``) so the two mechanisms are measured separately
  — the production form at scale is a 64-bit simhash with
  Hamming-distance banding, where the birthday term is ~0.
* ``dedup_clusters`` / ``ml_leakage_safe_split`` — the edge source is
  the exact Jaccard pair graph, so components grow ~M with base-corpus
  diameters; the probe asserts zero clusters span copies and reports the
  iterative CC wall, which is the quantity the replica exclusion could
  not measure.
* ``pipeline_pretrain_corpus`` — the capstone composing quality filter →
  exact dedup → cluster-keeper over the same edge source; the r4 sweep
  measured it executor-OOMing on the 100x replica's ~M^2 cluster graph.
  On the renamed corpus the graph is ~M and the capstone must track it.
  (Stopword ratios are 0 under rename — every copy including the m=1
  base scores quality identically, so growth ratios stay clean.)

Corpus: ``.scratch/textmut_scale/m{M}/documents.parquet`` — copy j
shifts doc_id by j·OFFSET (the rotation-probe convention) and renames
every token; lang/source pass through, n_chars recomputed.

Usage: python tools/probe_textmut_r9.py [M ...]    (default: 10 100)
Writes SCALEPROBE_TEXTMUT_r9.json (one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(ROOT, ".scratch", "textmut_scale")
OUT = os.path.join(ROOT, "SCALEPROBE_TEXTMUT_r9.json")
OFFSET = 10_000_000_000


def build_corpus(m: int) -> str:
    """M token-renamed copies of the base documents, written once and
    cached on disk.  Copy j: doc_id += j·OFFSET, every whitespace token
    gets the suffix ``~j`` (bijective per copy, disjoint across copies —
    see module docstring).  Copy 0 is suffixed too, so every copy is the
    same bijection class and m=1 remains the comparable base."""
    out_dir = os.path.join(SCRATCH, f"m{m}")
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    base = pq.read_table(os.path.join(BASE, "documents.parquet"))
    writer = pq.ParquetWriter(out, base.schema)
    try:
        for j in range(m):
            text = pc.replace_substring_regex(
                base.column("text"), pattern=r"(\S+)", replacement=rf"\1~{j}"
            )
            t = pa.table(
                {
                    "doc_id": pc.add(base.column("doc_id"), j * OFFSET),
                    "text": text,
                    "lang": base.column("lang"),
                    "source": base.column("source"),
                    "n_chars": pc.cast(pc.utf8_length(text), base.schema.field("n_chars").type),
                }
            ).cast(base.schema)
            writer.write_table(t)
    finally:
        writer.close()
    return out_dir


def _pair_decomp(df, a: str = "doc_a", b: str = "doc_b"):
    same = (F.col(a) / OFFSET).cast("bigint") == (F.col(b) / OFFSET).cast("bigint")
    return df.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum(same.cast("bigint")), F.lit(0)).alias("n_within"),
    ).collect()[0]


def probe(spark, sf_dir: str, m: int) -> dict:
    from dataframework_spark.operators.dedup import (
        dedup_clusters,
        dedup_lsh_eval,
        dedup_ngram_containment,
        dedup_ngram_jaccard,
        dedup_simhash,
        simhash_signatures,
    )
    from dataframework_spark.operators.ml_prep import ml_leakage_safe_split
    from dataframework_spark.operators.pipeline import pipeline_pretrain_corpus

    r: dict = {}

    t0 = time.perf_counter()
    p = _pair_decomp(dedup_ngram_jaccard(spark, sf_dir))
    r["jaccard"] = {
        "pairs": p.n_pairs,
        "pairs_within_copy": int(p.n_within),
        "pairs_cross_copy": int(p.n_pairs - p.n_within),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }

    t0 = time.perf_counter()
    p = _pair_decomp(dedup_ngram_containment(spark, sf_dir))
    r["containment"] = {
        "pairs": p.n_pairs,
        "pairs_within_copy": int(p.n_within),
        "pairs_cross_copy": int(p.n_pairs - p.n_within),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }

    t0 = time.perf_counter()
    b = dedup_simhash(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_bucketed_docs"),
    ).collect()[0]
    wall_sh = round(time.perf_counter() - t0, 3)
    # decompose bucket PAIR mass: same-copy (structure, ~M) vs cross-copy
    # (16-bit birthday term, ~n²/2¹⁶) — signatures stage reused, buckets
    # recomputed once more for the per-(bucket, copy) counts
    sig = simhash_signatures(spark, sf_dir).withColumn(
        "cp", (F.col("doc_id") / OFFSET).cast("bigint")
    )
    per = sig.groupBy("simhash", "cp").agg(F.count(F.lit(1)).alias("c"))
    d = per.groupBy("simhash").agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("sp")
    ).agg(
        F.coalesce(F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0.0)).alias("tot"),
        F.coalesce(F.sum("sp"), F.lit(0.0)).alias("same"),
    ).collect()[0]
    r["simhash"] = {
        "buckets_multi": b.n_buckets,
        "bucketed_docs": int(b.n_bucketed_docs),
        "bucket_pairs_total": int(d.tot),
        "bucket_pairs_same_copy": int(d.same),
        "bucket_pairs_cross_copy": int(d.tot - d.same),
        "wall_sec": wall_sh,
    }

    t0 = time.perf_counter()
    row = dedup_lsh_eval(spark, sf_dir).collect()[0]
    r["lsh_eval"] = {
        "n_candidates": row.n_candidates,
        "n_truth": row.n_truth,
        "n_hits": row.n_hits,
        "precision": float(row.precision) if row.precision is not None else None,
        "recall": float(row.recall) if row.recall is not None else None,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }

    t0 = time.perf_counter()
    cl = dedup_clusters(spark, sf_dir)
    agg = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct((F.col("doc_id") / OFFSET).cast("bigint")).alias("n_copies"),
    ).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("n_clustered_docs"),
        F.coalesce(F.max("n"), F.lit(0)).alias("max_cluster"),
        F.coalesce(F.sum((F.col("n_copies") > 1).cast("bigint")), F.lit(0)).alias(
            "n_cross_copy_clusters"
        ),
    ).collect()[0]
    r["clusters"] = {
        "n_clusters": agg.n_clusters,
        "n_clustered_docs": int(agg.n_clustered_docs),
        "max_cluster_size": int(agg.max_cluster),
        "n_cross_copy_clusters": int(agg.n_cross_copy_clusters),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }

    t0 = time.perf_counter()
    rows = {x["split"]: x.asDict() for x in ml_leakage_safe_split(spark, sf_dir).collect()}
    r["leakage_split"] = {
        "n_docs_train": int(rows["train"]["n_docs"]),
        "n_docs_test": int(rows["test"]["n_docs"]),
        "n_multi_doc_clusters": int(
            rows["train"]["n_multi_doc_clusters"] + rows["test"]["n_multi_doc_clusters"]
        ),
        "n_leaky_clusters_naive": int(
            rows["train"]["n_leaky_clusters_naive"] + rows["test"]["n_leaky_clusters_naive"]
        ),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    t0 = time.perf_counter()
    pre = pipeline_pretrain_corpus(spark, sf_dir).agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.sum("total_ws_tokens"), F.lit(0)).alias("ws_tokens"),
    ).collect()[0]
    r["pretrain_corpus"] = {
        "n_docs_kept": int(pre.n_docs),
        "ws_tokens": int(pre.ws_tokens),
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    spark.catalog.clearCache()
    return r


_RATIO_KEYS = {
    "jaccard": ["pairs", "pairs_within_copy", "wall_sec"],
    "containment": ["pairs", "pairs_within_copy", "wall_sec"],
    "simhash": ["bucket_pairs_same_copy", "bucket_pairs_cross_copy", "wall_sec"],
    "lsh_eval": ["n_candidates", "n_truth", "wall_sec"],
    "clusters": ["n_clusters", "n_clustered_docs", "wall_sec"],
    "leakage_split": ["n_multi_doc_clusters", "n_leaky_clusters_naive", "wall_sec"],
    "pretrain_corpus": ["n_docs_kept", "ws_tokens", "wall_sec"],
}


def main() -> None:
    from dataframework_spark.session import get_spark

    ms = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    d1 = build_corpus(1)
    probe(spark, d1, 1)  # discarded warm-up: JVM/codegen, not the plan
    base = probe(spark, d1, 1)
    results = {"m1": base}
    for m in ms:
        sf_dir = build_corpus(m)
        r = probe(spark, sf_dir, m)
        r["data_ratio"] = m
        for op, keys in _RATIO_KEYS.items():
            for k in keys:
                b = base[op][k]
                if b:
                    r[op][f"{k}_ratio_vs_1x"] = round(r[op][k] / b, 2)
        results[f"m{m}"] = r
    out = {
        "probe": "token_rename_nonreplica_r9",
        "ops": [
            "dedup_ngram_jaccard",
            "dedup_ngram_containment",
            "dedup_simhash",
            "dedup_lsh_eval",
            "dedup_clusters",
            "ml_leakage_safe_split",
            "pipeline_pretrain_corpus",
        ],
        "note": (
            "per-copy token rename is a vocabulary bijection: within-copy "
            "Jaccard/containment exact-preserved, copies shingle-disjoint — "
            "output must grow ~M; simhash bucket pairs decomposed into "
            "same-copy structure (~M) vs the 16-bit birthday term (~n^2/2^16, "
            "a key-width fact, ~0 for the production 64-bit form)"
        ),
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
