"""Scale probe of the r11 newcomers (the per-round discipline since r5:
every round's heaviest newcomers get a measured scale row).

``mm_jpeg_progressive_decode`` and ``mm_png_palette_adam7_decode`` are
embarrassingly parallel Arrow mapInPandas decodes (progressive JPEG is
the heaviest per-doc codec yet: six entropy-coded scans per payload);
``mm_decode_router`` is re-probed at its new ELEVEN-way mix.
``text_langid_trained`` is one corpus-sized trigram explode into a
B×L-bounded model plus one held-out scoring pass; ``corpus_mixture_sample_bpe``
is the BPE fit (one corpus pass to the vocab table) plus the mixture's
two corpus passes.  All are linear-tier: the claim is wall ≈ data ratio
× constant, no superlinear stage.

Probed at 1000x on the cached .scratch/scale1000x replica (per-doc /
per-token work — duplication harmless for every op here: the langid
model and BPE merges are count-scaled but value-identical under
replication, so the pipelines do identical per-row work).

(The round's serve-path hardening carries its own NON-replica
adversarial probe, ``probe_lsh_hotbucket.py`` →
SCALEPROBE_HOTBUCKET_r11.json.)

Writes one JSON line (captured as SCALEPROBE_R11OPS_r11.json).
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
    "SCALEPROBE_R11OPS_r11.json",
)

PROBE = [
    "mm_jpeg_progressive_decode",
    "mm_jpeg_color_progressive_decode",
    "mm_jpeg_restart_decode",
    "mm_png_palette_adam7_decode",
    "mm_decode_router",
    "text_langid_trained",
    "corpus_mixture_sample_bpe",
]


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
