"""Scale probe of the r10 multimodal newcomers (the per-round discipline
since r5: every round's heaviest newcomers get a measured scale row).

``mm_tiff_decode``, ``mm_flac_decode``, ``mm_jpeg_color_decode`` and
the nine-way ``mm_decode_router`` are embarrassingly parallel Arrow
mapInPandas
decodes — probed at 1000x on the cached .scratch/scale1000x replica
(per-doc decode, no pair expansion, duplication harmless).  TIFF and
FLAC are the heaviest per-doc codecs in the tier (up to 48×32 px over
2-4 LZW strips; 600-800 Rice-coded samples over 3-4 frames with
CRC/MD5 verification), so the claim is the same pure linearity measured
for WAV/BMP/PNG/JPEG/GIF, at a bigger constant.

(The round's other newcomers — the dedup_lsh_* lifecycle pair — carry
their own NON-replica probe, ``probe_lsh_lifecycle.py`` →
SCALEPROBE_LSHLIFE_r10.json, because replica corpora make every doc an
M-way near-dup by construction.)

Writes one JSON line (captured as SCALEPROBE_R10OPS_r10.json).
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
    "SCALEPROBE_R10OPS_r10.json",
)

PROBE = ["mm_tiff_decode", "mm_flac_decode", "mm_jpeg_color_decode", "mm_decode_router"]


def timed(spark, name: str, sf_dir: str) -> float:
    fn = get_spec(name).fn
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    dt = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    return dt


def main() -> None:
    m = 1000
    rep_dir = os.path.join(SCRATCH, f"scale{m}x")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(rep_dir, "documents.parquet")):
        build_replica(spark, m, rep_dir)
    results = {}
    timed(spark, PROBE[0], BASE)  # warm-up: JVM/codegen/worker pool
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
