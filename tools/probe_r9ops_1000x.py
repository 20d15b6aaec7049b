"""Scale probe of the r9 operator wave (the per-round discipline since
r5: every round's heaviest newcomers get a measured scale row, not an
argument).

* ``mm_decode_router`` / ``mm_gif_decode`` — embarrassingly parallel
  Arrow mapInPandas, probed at 1000x on the cached .scratch/scale1000x
  replica (per-doc decode, no pair expansion, duplication harmless): the
  router runs one magic-byte dispatch + the routed parser per doc; GIF
  runs one LZW dictionary walk + de-interlace per doc.  The claim is
  pure linearity, the shape already measured for WAV/BMP/PNG/JPEG.
* ``dedup_simhash_hamming`` — NOT probed on the replica (M-way exact
  duplicates share identical 64-bit signatures, so in-band pairs grow
  ~M² by construction — the same degeneracy that excludes the 16-bit
  version).  Probed instead at 10x/100x on the r9 token-renamed corpus
  (``probe_textmut_r9.build_corpus``): per-copy vocabularies are
  disjoint so signatures re-roll per copy, the true pair set grows ~M,
  and any cross-copy pair is a measured 2⁻⁶⁴-scale accident (vs the
  16-bit form's measured n²/2¹⁶ birthday mass — the comparison this
  operator exists to win).

Writes one JSON line (captured as SCALEPROBE_R9OPS_r9.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dataframework_spark.registry import all_queries, get_spec
from dataframework_spark.session import get_spark

all_queries()  # import the operator modules so the registry is populated
from tools.probe_textmut_r9 import OFFSET, build_corpus
from tools.scale_probe import BASE, build_replica

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALEPROBE_R9OPS_r9.json",
)

REPLICA_PROBE = ["mm_decode_router", "mm_gif_decode"]


def timed(spark, name: str, sf_dir: str) -> float:
    fn = get_spec(name).fn
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    dt = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    return dt


def probe_simhash64(spark, sf_dir: str) -> dict:
    fn = get_spec("dedup_simhash_hamming").fn
    same = (F.col("doc_a") / OFFSET).cast("bigint") == (
        F.col("doc_b") / OFFSET
    ).cast("bigint")
    t0 = time.perf_counter()
    row = fn(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(same.cast("bigint")), F.lit(0)).alias("w"),
    ).collect()[0]
    dt = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    return {
        "pairs": row.n,
        "pairs_within_copy": int(row.w),
        "pairs_cross_copy": int(row.n - row.w),
        "wall_sec": dt,
    }


def main() -> None:
    m = 1000
    rep_dir = os.path.join(SCRATCH, f"scale{m}x")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(rep_dir, "documents.parquet")):
        build_replica(spark, m, rep_dir)
    results = {}
    timed(spark, REPLICA_PROBE[0], BASE)  # warm-up: JVM/codegen/worker pool
    for name in REPLICA_PROBE:
        t1 = timed(spark, name, BASE)
        t1000 = timed(spark, name, rep_dir)
        results[name] = {
            "t_1x": t1,
            "t_1000x": t1000,
            "ratio": round(t1000 / t1, 2) if t1 > 0 else None,
        }
        print(f"# {name}: 1x {t1}s  1000x {t1000}s  ratio {results[name]['ratio']}",
              file=sys.stderr)

    sh: dict = {"corpus": "token-renamed (probe_textmut_r9), sf0.1 base"}
    base = probe_simhash64(spark, build_corpus(1))
    sh["m1"] = base
    for mm in (10, 100):
        r = probe_simhash64(spark, build_corpus(mm))
        r["data_ratio"] = mm
        if base["pairs"]:
            r["pairs_ratio_vs_1x"] = round(r["pairs"] / base["pairs"], 2)
        r["wall_ratio_vs_1x"] = round(r["wall_sec"] / base["wall_sec"], 2)
        sh[f"m{mm}"] = r
        print(f"# dedup_simhash_hamming m{mm}: {r}", file=sys.stderr)
    results["dedup_simhash_hamming"] = sh

    out = {"m": m, "results": results}
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
