"""Rotation-synthesis scale probe for the two remaining embedding-side
sweep exclusions (VERDICT r7, next-round #3): ``dedup_embedding_cosine``
and ``pipeline_semantic_dedup``.

Both are excluded from the replica sweeps for a sound reason — an M×
replica makes every document an M-way duplicate, so the OUTPUT pair set
grows ~M² by construction.  The rotated-corpus synthesis proven on
SemDeDup (``probe_semdedup_scale.build_corpus``: copy j gets a seeded
random rotation + relative noise, preserving within-copy cosines while
pointing each copy's clusters in fresh directions) removes that
degeneracy: near-dup structure per copy matches the base corpus, so the
true pair count grows ~M, not M².

What this probe can and cannot claim:

* OUTPUT decomposes into two measured parts.  WITHIN-copy pairs are the
  de-degenerated quantity — they must grow exactly ~M (each rotated copy
  carries the base corpus's pair set).  CROSS-copy pairs measure the
  τ=0.4 random-direction collision mass: in d=64 a random-direction
  cosine has σ = 1/√d = 0.125, so τ = 0.4 is only 3.2σ and dense
  cluster pairs collide at a small but non-zero rate — a GEOMETRY fact
  of low-dim embeddings at a loose threshold, reported separately so it
  can't masquerade as (or hide) operator-induced blowup.  At production
  dims (d ≥ 384, τ/σ ≥ 7.8) the cross mass is ~0 and the within-copy
  line is the whole story.
* COMPUTE for ``dedup_embedding_cosine`` is O(n²·d) BY DESIGN — it is
  the exact-correctness tier the approximate operators are graded
  against (see its docstring).  The probe measures the quadratic wall
  honestly rather than pretending rotation changes the tier's algebra;
  the 100 TB path is the swept approximate tier (LSH/IVF/SemDeDup).
* ``pipeline_semantic_dedup`` composes that pair stage with per-doc
  quality joins; its extra cost over the pair stage should stay ~linear
  (quality is per-doc, the join is pair-sized).

Corpus: reuses the m{M} rotated embeddings from the r7 SemDeDup probe
(cached under .scratch/semdedup_scale) and adds an aligned documents
replica (doc_id + j·OFFSET, text unchanged — the text side feeds only
per-doc quality scores, which replicas do not degenerate).

Usage: python tools/probe_rotation_r8.py [M ...]    (default: 10 100)
Writes SCALEPROBE_ROTATION_r8.json (one JSON line).
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

from tools.probe_semdedup_scale import BASE, OFFSET, build_corpus

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "SCALEPROBE_ROTATION_r8.json")


def add_documents(sf_dir: str, m: int) -> None:
    """Aligned documents replica for the rotated corpus: copy j shifts
    doc_id by j·OFFSET (matching the embedding vec_ids); text is
    unchanged — it feeds only the per-doc quality stage."""
    out = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(out):
        return
    base = pq.read_table(os.path.join(BASE, "documents.parquet"))
    writer = pq.ParquetWriter(out, base.schema)
    try:
        for j in range(m):
            t = base.set_column(
                base.schema.get_field_index("doc_id"),
                "doc_id",
                pc.add(base.column("doc_id"), j * OFFSET),
            )
            writer.write_table(t)
    finally:
        writer.close()


def probe(spark, sf_dir: str, m: int) -> dict:
    from dataframework_spark.operators.dedup import dedup_embedding_cosine
    from dataframework_spark.operators.pipeline import pipeline_semantic_dedup

    # size the GEMM tile to ~<=5k rows/block (sims tile <= 200 MB f64) —
    # the r8 n_blocks knob; 4 (the registered default) below that
    n_blocks = max(4, (2000 * m) // 5000)
    # within-copy pairs are the de-degenerated quantity (must grow ~M);
    # cross-copy pairs measure the tau=0.4 random-direction collision
    # mass, a d=64 geometry fact (tau/sigma = 0.4*sqrt(64) = 3.2)
    same_copy = (F.col("vec_a") / OFFSET).cast("bigint") == (
        F.col("vec_b") / OFFSET
    ).cast("bigint")
    t0 = time.perf_counter()
    pairs = dedup_embedding_cosine(spark, sf_dir, n_blocks=n_blocks).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(same_copy.cast("bigint")).alias("n_within"),
    ).collect()[0]
    wall_cos = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    sem = pipeline_semantic_dedup(spark, sf_dir, n_blocks=n_blocks).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("keeper_doc_id").alias("n_keepers"),
    ).collect()[0]
    wall_sem = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    return {
        "n_blocks": n_blocks,
        "cosine_pairs": pairs.n_pairs,
        "cosine_pairs_within_copy": int(pairs.n_within),
        "cosine_pairs_cross_copy": int(pairs.n_pairs - pairs.n_within),
        "cosine_wall_sec": wall_cos,
        "semantic_pairs": sem.n_pairs,
        "semantic_keepers": sem.n_keepers,
        "semantic_wall_sec": wall_sem,
    }


def main() -> None:
    from dataframework_spark.session import get_spark

    ms = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    probe(spark, BASE, 1)  # discarded warm-up: JVM/codegen, not the plan
    base = probe(spark, BASE, 1)
    results = {"m1": base}
    for m in ms:
        sf_dir = build_corpus(m)
        add_documents(sf_dir, m)
        r = probe(spark, sf_dir, m)
        r["data_ratio"] = m
        r["within_pairs_ratio_vs_1x"] = round(
            r["cosine_pairs_within_copy"] / base["cosine_pairs"], 2
        )
        r["cosine_pairs_ratio_vs_1x"] = round(r["cosine_pairs"] / base["cosine_pairs"], 2)
        r["cosine_wall_ratio_vs_1x"] = round(
            r["cosine_wall_sec"] / base["cosine_wall_sec"], 2
        )
        r["semantic_pairs_ratio_vs_1x"] = round(
            r["semantic_pairs"] / base["semantic_pairs"], 2
        )
        r["semantic_wall_ratio_vs_1x"] = round(
            r["semantic_wall_sec"] / base["semantic_wall_sec"], 2
        )
        results[f"m{m}"] = r
    out = {
        "probe": "rotation_nonreplica_r8",
        "ops": ["dedup_embedding_cosine", "pipeline_semantic_dedup"],
        "note": (
            "output pairs should grow ~M (rotation removes the replica's "
            "M^2 output degeneracy); the exact tier's COMPUTE is O(n^2 d) "
            "by design — the 100 TB path is the swept approximate tier"
        ),
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
