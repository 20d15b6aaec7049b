"""Exact-duplicate flood probe for the BATCH pair emitters
(``dedup_minhash_lsh`` / ``dedup_simhash_hamming``) after the r12
pre-collapse port (VERDICT r11 #5 — the serve path was hardened in r11;
this measures the same hazard on the batch path).

Corpus: sf0.01 documents ∪ N exact copies of one boilerplate page
(doc_id 10⁹+i — the "100k identical error pages" crawl shape).  With
pre-collapse ON (the registered semantics), the flood contributes ONE
representative to the band buckets and N-1 linear (keeper, member) star
rows; wall and output must track ~N.  With pre-collapse OFF (the pre-r12
form), one bucket holds all N ids and the pair expansion materializes
C(N,2) structs from a single task — measured at N=1000 (≈ 0.5M pairs)
and cited-not-run at N=10000 (≈ 5×10⁷ structs in one task's collect_set
array, the exact blowup the port removes).

Usage: python tools/probe_pairflood_r12.py [N ...]   (default: 1000 10000)
Writes SCALEPROBE_PAIRFLOOD_r12.json (one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "SCALEPROBE_PAIRFLOOD_r12.json")
SF_DIR = "/root/testdata/sf0.01"
FLOOD_BASE = 1_000_000_000
FLOOD_TXT = (
    "service temporarily unavailable please retry your request later "
    "error code five oh three gateway timeout upstream connect failure"
)


def flooded_docs(spark, n: int):
    from dataframework_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    flood = spark.range(n).select(
        (F.col("id") + FLOOD_BASE).alias("doc_id"), F.lit(FLOOD_TXT).alias("text")
    )
    return docs.unionByName(flood).repartition(
        spark.sparkContext.defaultParallelism
    )


def run(spark, op: str, n: int, precollapse: bool) -> dict:
    from dataframework_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_simhash_hamming,
    )

    fn = dedup_minhash_lsh if op == "minhash" else dedup_simhash_hamming
    docs = flooded_docs(spark, n)
    t0 = time.perf_counter()
    out = fn(spark, SF_DIR, docs=docs, precollapse=precollapse)
    agg = out.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(
            ((F.col("doc_a") >= FLOOD_BASE) | (F.col("doc_b") >= FLOOD_BASE)).cast(
                "bigint"
            )
        ).alias("flood_pairs"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    return {
        "flood_n": n,
        "precollapse": precollapse,
        "wall_sec": wall,
        "pairs_total": int(agg["pairs"]),
        "pairs_touching_flood": int(agg["flood_pairs"] or 0),
    }


def main() -> None:
    from dataframework_spark.session import get_spark

    ns = [int(x) for x in sys.argv[1:]] or [1000, 10000]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    results: dict = {}
    for op in ("minhash", "simhash"):
        run(spark, op, 100, True)  # warm-up, discarded
        rows = [run(spark, op, n, True) for n in ns]
        # the unhardened form, measured at the SMALL flood only: C(N,2)
        # pair structs materialize inside one task's bucket array, so the
        # large flood is cited (5e7 structs at N=10000), not executed
        rows.append(run(spark, op, min(ns), False))
        results[op] = rows
    out = {
        "probe": "pair_emitter_exactdup_flood_r12",
        "ops": ["dedup_minhash_lsh", "dedup_simhash_hamming"],
        "note": (
            "boilerplate flood vs the batch pair emitters: pre-collapse ON "
            "(registered) keeps pairs linear (N-1 star rows + base pairs) "
            "and wall ~N; OFF reproduces the C(N,2) single-bucket expansion "
            "at N=1000 and is cited-not-run at N=10000 (~5e7 structs in one "
            "task) — the blowup the r12 port removes"
        ),
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
