"""SemDeDup scale probe on a NON-replica corpus (VERDICT r6 #2).

The replica sweeps exclude ``dedup_semdedup`` for a sound reason: an M×
replica puts M identical copies of every vector in one bucket, so
in-cluster pairs grow ~M² BY CONSTRUCTION — a degeneracy real corpora
don't have.  That left SemDeDup's scale story paper-argued rather than
measured.  This probe measures it under the paper's actual operating
condition (Abbas et al. 2023: cluster COUNT grows with the corpus, so
cluster size stays ~constant):

* corpus: M× the sf0.1 embeddings, each copy passed through a SEEDED
  RANDOM ROTATION plus small relative noise (σ_rel = 0.1).  A rotation
  preserves every within-copy pairwise cosine — each copy is a
  structurally faithful image of the base corpus, dense clusters
  included — while pointing its clusters in fresh directions, so the
  corpus's CLUSTER COUNT grows ~M and every cluster keeps its base
  size.  (A pure additive-noise synthesis was tried first and is the
  documented failure mode: the base corpus has a direction-concentrated
  81-vector cluster, and noise keeps its 81·M copies stacked in a few
  hyperplane buckets — in-bucket pairs grew super-linearly BY
  SYNTHESIS, the very degeneracy the replica exclusion exists for.)
* clustering: ``n_planes = 8 + ceil(log2 M)`` random hyperplanes — the
  k-grows-with-n knob ``dedup_semdedup`` exposes — keeping mean bucket
  occupancy ~constant as n grows;
* measured: wall time of the full verdict computation, plus the
  cluster-size distribution (mean/p99/max) and the exact in-bucket pair
  count the join actually prices.

A linear-path result is wall ratio ≲ M with pair count ~linear in n.

Usage:  python tools/probe_semdedup_scale.py [M ...]   (default: 10 100 1000)
Writes .scratch/semdedup_scale/m{M}/embeddings.parquet and
SCALEPROBE_SEMDEDUP_r7.json (one JSON line).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from dataframework_spark.operators.dedup import dedup_semdedup
from dataframework_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch", "semdedup_scale")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALEPROBE_SEMDEDUP_r7.json")
OFFSET = 10_000_000_000
SIGMA_REL = 0.1  # small jitter on top of the per-copy rotation


def build_corpus(m: int) -> str:
    """M rotated-and-jittered copies of the base embeddings, written once
    and cached on disk.  Copy 0 is the base verbatim; copy j>0 applies a
    seeded random rotation (QR of a seeded Gaussian matrix — orthonormal,
    deterministic) plus SIGMA_REL relative noise.  Rotations preserve all
    within-copy cosines, so each copy carries the base corpus's full
    cluster structure pointed in a fresh direction: cluster count grows
    ~M, cluster sizes stay ~constant — the non-degenerate scale-up the
    replica exclusion says real corpora look like."""
    out_dir = os.path.join(SCRATCH, f"m{m}")
    out = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    base = pq.read_table(os.path.join(BASE, "embeddings.parquet"))
    vec_id = base.column("vec_id").to_numpy()
    emb = np.asarray(base.column("embedding").to_pylist(), dtype=np.float32)
    label = base.column("label").to_numpy()
    norms = np.linalg.norm(emb, axis=1, keepdims=True).astype(np.float32)
    writer = pq.ParquetWriter(
        out,
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )
    try:
        for j in range(m):
            if j == 0:
                v = emb
            else:
                rng = np.random.default_rng(j)
                q, _ = np.linalg.qr(rng.standard_normal((emb.shape[1],) * 2))
                noise = rng.standard_normal(emb.shape).astype(np.float32)
                noise /= np.linalg.norm(noise, axis=1, keepdims=True)
                v = (emb @ q.astype(np.float32)) + SIGMA_REL * norms * noise
            writer.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(vec_id + j * OFFSET, pa.int64()),
                        "embedding": pa.array(
                            [row for row in v.tolist()], pa.list_(pa.float32())
                        ),
                        "label": pa.array(label, pa.int32()),
                    }
                )
            )
    finally:
        writer.close()
    return out_dir


def probe(spark, sf_dir: str, n_planes: int | None) -> dict:
    t0 = time.perf_counter()
    df = dedup_semdedup(spark, sf_dir, n_planes=n_planes)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_kept").cast("bigint")).alias("kept"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 3)
    # cluster-size distribution + the exact pair count the join prices
    planes_sql = None
    from dataframework_spark.operators.similarity import _bucket_sql_spark

    planes_sql = _bucket_sql_spark("v") if n_planes is None else _bucket_sql_spark(
        "v", n_planes
    )
    from dataframework_spark.catalog import load_table

    e = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    sizes = e.select(F.expr(planes_sql).alias("b")).groupBy("b").count()
    stats = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(F.avg("count"), 2).alias("mean_sz"),
        F.expr("percentile(count, 0.99)").alias("p99_sz"),
        F.max("count").alias("max_sz"),
        F.sum(F.expr("count * (count - 1) / 2")).cast("bigint").alias("pairs"),
    ).collect()[0]
    spark.catalog.clearCache()
    return {
        "n_vectors": row.n,
        "kept": row.kept,
        "kept_frac": round(row.kept / row.n, 4),
        "n_planes": n_planes if n_planes is not None else 8,
        "n_buckets_occupied": stats.n_buckets,
        "bucket_mean": float(stats.mean_sz),
        "bucket_p99": float(stats.p99_sz),
        "bucket_max": int(stats.max_sz),
        "in_bucket_pairs": int(stats.pairs),
        "wall_sec": wall,
    }


def main() -> None:
    ms = [int(a) for a in sys.argv[1:]] or [10, 100, 1000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    probe(spark, BASE, None)  # discarded warm-up: JVM/codegen, not the plan
    base = probe(spark, BASE, None)
    results["m1"] = base
    for m in ms:
        sf_dir = build_corpus(m)
        r = probe(spark, sf_dir, 8 + math.ceil(math.log2(m)))
        r["wall_ratio_vs_1x"] = round(r["wall_sec"] / base["wall_sec"], 2)
        r["pairs_ratio_vs_1x"] = round(r["in_bucket_pairs"] / base["in_bucket_pairs"], 2)
        r["data_ratio"] = m
        results[f"m{m}"] = r
    out = {"probe": "semdedup_nonreplica", "sigma_rel": SIGMA_REL, "results": results}
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
