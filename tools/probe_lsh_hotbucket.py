"""Adversarial hot-bucket probe for ``lsh_serve`` (r10 VERDICT
"Next round" #1c — the boilerplate-heavy crawl batch).

The r10 hazard: the within-batch candidate expansion materialized each
(band, bk) bucket as ONE array row and exploded ~k²/2 pair structs — a
crawl batch that is 50% one boilerplate template (100k identical error
pages, routine in real crawls) would put every copy in the same bucket
and OOM an executor.  r11 hardens the serve path two ways:

1. **exact-hash pre-collapse** — identical texts are decided by digest
   (keeper = min doc_id, rest ``dup_in_delta``) and contribute ONE
   representative to the band buckets;
2. **bucket cap** — a bucket of > 64 DISTINCT texts (a near-dup flood:
   template + per-doc token, so the digest cannot fold it) compares
   members against the bucket representative only — linear, no bucket
   array.

This probe builds BOTH adversarial batches at 1x/10x/100x batch size
and measures the serve wall against a fixed persisted index.  The
claim: wall grows ~linearly in batch size (ratio_vs_1x ≈ size ratio,
constant factors aside) — the unhardened k² expansion would be ~10⁴×
at the 100x point on the exact flood and simply not finish.

Usage: python tools/probe_lsh_hotbucket.py [SIZES ...]  (default 10 100)
Writes SCALEPROBE_HOTBUCKET_r11.json (one JSON line).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "SCALEPROBE_HOTBUCKET_r11.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
B0 = 2_000  # 1x batch size

# ~40 tokens of distinctive boilerplate — long enough that a one-token
# suffix leaves the MinHash signature intact with overwhelming probability
_TEMPLATE = " ".join(
    f"boilerr{i} gateway{i * 3} unavailable{i * 7}" for i in range(13)
)


def _batch(spark, b: int, near: bool):
    """50% one template (exact copies, or near copies with a per-doc
    suffix token when ``near``), 50% unique fresh docs."""
    half = b // 2
    boiler_text = (
        F.concat(F.lit(_TEMPLATE), F.lit(" zztok"), F.col("id").cast("string"))
        if near
        else F.lit(_TEMPLATE)
    )
    boiler = spark.range(half).select(
        (F.col("id") + 50_000_000).alias("doc_id"), boiler_text.alias("text")
    )
    fresh = spark.range(half).select(
        (F.col("id") + 60_000_000).alias("doc_id"),
        F.concat(
            F.lit("fresh alpha"), F.col("id").cast("string"),
            F.lit(" bravo"), (F.col("id") * 7).cast("string"),
            F.lit(" charlie"), (F.col("id") * 13).cast("string"),
            F.lit(" delta echo foxtrot"),
        ).alias("text"),
    )
    return boiler.unionByName(fresh).repartition(
        spark.sparkContext.defaultParallelism
    )


def probe(spark, idx: str, b: int, near: bool) -> dict:
    from dataframework_spark.operators.dedup import lsh_serve

    delta = _batch(spark, b, near)
    t0 = time.perf_counter()
    verdicts, _, dcache = lsh_serve(spark, idx, delta)
    counts = {
        row["verdict"]: row["n"]
        for row in verdicts.groupBy("verdict")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    wall = round(time.perf_counter() - t0, 3)
    dcache.unpersist()
    spark.catalog.clearCache()
    return {"batch_docs": b, "serve_wall_sec": wall, "verdicts": counts}


def main() -> None:
    from dataframework_spark.catalog import load_table
    from dataframework_spark.operators.dedup import lsh_index_build
    from dataframework_spark.session import get_spark

    sizes = [int(x) for x in sys.argv[1:]] or [10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    scratch = os.path.join(ROOT, ".scratch", "hotbucket_probe")
    shutil.rmtree(scratch, ignore_errors=True)

    base = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    idx = os.path.join(scratch, "idx")
    lsh_index_build(spark, base, idx)

    results: dict = {}
    for near, label in ((False, "exact_flood"), (True, "near_flood")):
        probe(spark, idx, B0, near)  # warm-up, discarded (JVM/codegen)
        one = probe(spark, idx, B0, near)
        tier = {"x1": one}
        for m in sizes:
            r = probe(spark, idx, B0 * m, near)
            r["size_ratio"] = m
            r["wall_ratio_vs_1x"] = round(
                r["serve_wall_sec"] / one["serve_wall_sec"], 2
            )
            tier[f"x{m}"] = r
        results[label] = tier

    out = {
        "probe": "lsh_serve_hotbucket_r11",
        "op": "lsh_serve (dedup_lsh_persist_serve / _incremental_append / "
              "stream_lsh_ingest)",
        "sf_dir": SF_DIR,
        "batch_1x_docs": B0,
        "note": (
            "50%-boilerplate crawl batches: exact flood folds to one "
            "representative via md5 pre-collapse; near flood (per-doc "
            "suffix token) exercises the 64-member bucket cap with "
            "representative-only comparison. Claim: serve wall ~linear "
            "in batch size; the unhardened k^2/2 bucket expansion would "
            "be ~10^4x at the 100x point and would not finish"
        ),
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
