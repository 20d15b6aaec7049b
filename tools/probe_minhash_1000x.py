"""1000x probe for the minhash flagship (VERDICT r4 #3).

The M-times replica makes every document an M-way EXACT duplicate, so raw
``dedup_minhash_lsh`` candidate pairs grow as M^2 (every copy shares all 4
band buckets with its M-1 siblings): output-quadratic by replica
construction, the same enumerated-exclusion class as the brute-force eval
tiers.  This tool replaces hand-waving with numbers:

1. The analytic candidate-pair count Sum n(n-1)/2 over (band, bucket) at
   1x/10x/100x/1000x — computed as an AGGREGATE over bucket sizes, no pair
   expansion, so it is cheap even where the expansion itself is not.
2. The linear stages (shingle -> signature -> banding) timed at 1000x —
   the part of the plan whose 100 TB claim is "linear in corpus".
3. The PRODUCTION composition at 1000x: exact-dedup first (md5 fingerprint
   keeper), then minhash over the keepers.  Exact copies are precisely what
   the exact pass removes; every real pipeline orders the passes this way,
   and the composition completes where the raw op's output cannot.

Writes one JSON line (captured as SCALEPROBE1000_MINHASH_r5.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataframework_spark.catalog import load_table
from dataframework_spark.functions.arrays import shingles_sql, tid_sql, tokens
from dataframework_spark.operators.dedup import (
    _band_cols,
    _mh_exprs_spark,
    _JACCARD_THRESHOLD,
    _MH_P,
)
from dataframework_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def _bands(spark, docs):
    """shingle -> signature -> band table (the linear prefix of the op)."""
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    s = docs.withColumn("toks", tokens()).select(
        "doc_id", F.expr(shingles_sql("toks")).alias("sh")
    )
    ft = s.select("doc_id", F.explode("sh").alias("shingle")).select(
        "doc_id", F.expr(tid_sql("shingle", _MH_P)).alias("tid")
    )
    sig = ft.groupBy("doc_id").agg(*[F.expr(e) for e in _mh_exprs_spark()])
    bands = None
    for i, band in enumerate(_band_cols()):
        piece = sig.select("doc_id", F.expr(band).alias("bk"), F.lit(i).alias("band"))
        bands = piece if bands is None else bands.unionByName(piece)
    return s, bands


def candidate_pair_count(spark, sf_dir: str) -> tuple[int, float]:
    """Sum n(n-1)/2 over (band, bucket) — the exact number of pairs the
    in-bucket expansion would emit (pre-distinct), without emitting them."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    _, bands = _bands(spark, docs)
    t0 = time.perf_counter()
    row = (
        bands.groupBy("band", "bk")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"))
        .first()
    )
    return int(row["pairs"]), round(time.perf_counter() - t0, 3)


def exact_then_minhash(spark, sf_dir: str) -> tuple[int, int, float]:
    """The production ordering: exact-dedup keepers, then the FULL minhash
    op (candidates + Jaccard verification) over keepers only."""
    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    keepers = (
        docs.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = docs.join(keepers.hint("shuffle_hash"), "doc_id")
    n_kept = kept.count()
    s, bands = _bands(spark, kept)
    s = s.cache()
    buckets = bands.groupBy("band", "bk").agg(
        F.array_sort(F.collect_set("doc_id")).alias("ids")
    )
    pair_expr = F.expr(
        "flatten(transform(sequence(1, size(ids) - 1), "
        "i -> transform(sequence(i + 1, size(ids)), "
        "j -> struct(element_at(ids, i) as doc_a, element_at(ids, j) as doc_b))))"
    )
    cand = (
        buckets.where(F.size("ids") >= 2)
        .select(F.explode(pair_expr).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    sa = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")).hint("shuffle_hash")
    sb = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")).hint("shuffle_hash")
    ver = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("tot", F.size("sh_a") + F.size("sh_b"))
    )
    jac = F.col("inter") / (F.col("tot") - F.col("inter"))
    n_pairs = ver.where(jac >= _JACCARD_THRESHOLD).count()
    dt = round(time.perf_counter() - t0, 3)
    s.unpersist()
    return n_kept, n_pairs, dt


def main() -> None:
    spark = get_spark(app_name="minhash-1000x-probe", cpus=os.cpu_count() or 8)
    spark.range(1000).selectExpr("sum(id)").collect()  # JIT/session warm
    out = {"op": "dedup_minhash_lsh", "m": 1000, "candidate_pairs": {}, "linear_stages": {}}
    dirs = {1: BASE}
    for m in (10, 100, 1000):
        d = os.path.join(SCRATCH, f"scale{m}x")
        if os.path.exists(os.path.join(d, "documents.parquet")):
            dirs[m] = d
    for m, d in sorted(dirs.items()):
        pairs, dt = candidate_pair_count(spark, d)
        out["candidate_pairs"][f"{m}x"] = pairs
        out["linear_stages"][f"{m}x_sig_band_sec"] = dt
    n_kept, n_pairs, dt = exact_then_minhash(spark, dirs[max(dirs)])
    out["exact_then_minhash_1000x"] = {
        "keepers": n_kept,
        "near_dup_pairs": n_pairs,
        "sec": dt,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
