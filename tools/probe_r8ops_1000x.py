"""1000x probe of the r8 operator wave (the per-round discipline since r5:
every round's heaviest newcomers get a measured 1000x row, not an argument).

Probes, on the cached .scratch/scale1000x replica (2M-doc documents /
2M-vector embeddings):

* ``mm_png_decode`` — embarrassingly parallel Arrow mapInPandas: per doc
  one zlib inflate + a <= 20x17 defilter pass; no shuffle at all.  The
  claim is pure linearity (decode cost ~ docs), the same shape already
  measured for the WAV/BMP tier.
* ``mm_png_resize`` — the same chain + an O(pixels) block downsample.
* ``mm_jpeg_decode`` — same embarrassingly-parallel shape; per doc a
  huffman entropy decode + dequant + 8x8 IDCT over 4-9 blocks.
* ``pipeline_hybrid_search`` — the shared-scan capstone: ONE cached
  (doc, term, tf) inverted index feeds both the BM25 ranking and the RRF
  fusion.  BM25 alone measured 22.2x at 1000x in r7 and rrf 33.1x; the
  capstone should land near the rrf line (it adds one window over the
  shared scored table, not another corpus pass).

The replica's documents are M-way exact duplicates, which is fine here:
the PNG ops are per-doc (no pair expansion), and hybrid search's
per-system lists stay top-20 per query regardless of duplication.

Writes one JSON line (captured as SCALEPROBE1000_R8OPS_r8.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframework_spark.registry import all_queries, get_spec
from dataframework_spark.session import get_spark

all_queries()  # import the operator modules so the registry is populated
from tools.scale_probe import BASE, build_replica

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALEPROBE1000_R8OPS_r8.json",
)

PROBE = [
    "mm_png_decode",
    "mm_png_resize",
    "mm_jpeg_decode",
    "pipeline_hybrid_search",
]


def timed(spark, name: str, sf_dir: str) -> float:
    fn = get_spec(name).fn
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    dt = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()  # hybrid caches tf; don't let it leak across runs
    return dt


def main() -> None:
    m = 1000
    rep_dir = os.path.join(SCRATCH, f"scale{m}x")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(rep_dir, "documents.parquet")):
        build_replica(spark, m, rep_dir)
    results = {}
    # warm-up: JVM/codegen + Python worker pool, not the plans under test
    timed(spark, PROBE[0], BASE)
    for name in PROBE:
        t1 = timed(spark, name, BASE)
        t1000 = timed(spark, name, rep_dir)
        results[name] = {
            "t_1x": t1,
            "t_1000x": t1000,
            "ratio": round(t1000 / t1, 2) if t1 > 0 else None,
        }
        print(f"# {name}: 1x {t1}s  1000x {t1000}s  ratio {results[name]['ratio']}",
              file=sys.stderr)
    out = {"m": m, "results": results}
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
