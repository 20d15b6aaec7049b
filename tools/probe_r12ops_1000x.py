"""Scale probe of the r12 newcomers (the per-round discipline since r5:
every round's heaviest newcomers get a measured scale row).

``mm_mp4_probe``, ``mm_mp3_probe`` and ``mm_mp4_frame_index`` are
embarrassingly parallel Arrow mapInPandas structure walks (no entropy
coding; the frame index emits ~6 sampled rows per doc — linear).
``stream_sim_ingest`` is NOT probed here: on a replica both its query
batch and its per-cell code count grow ~M (quadratic ADC join by
construction at fixed n_centroids) — its production claim is the fixed
batch vs growing index, measured in SCALEPROBE_SIMLIFE_r12.json, and
its composed stages are probed/swept individually.  ``text_quality_trained`` is
one narrow feature pass into an 80-cell model plus one held-out scoring
pass (the langid shape, token-level).  ``sim_index_serve_recall`` pays
one index build + one persisted serve + one exact-truth scan — all
linear in the corpus.  ``sim_ivfpq_index_compaction`` and
``dedup_lsh_index_compaction`` are the lifecycle ops: build + two
appends + a content-equality anti-diff (linear rows, narrow exchanges) +
one serve.  ``source_mat73_roundtrip`` is a BOUNDED 60-row convert-once
fixture — its claim is FLATNESS (the limit(60) scan is the only
corpus-touching stage), probed to prove the bound, not linearity.

Probed at 1000x on the cached .scratch/scale1000x replica.  Replica
duplication is harmless-by-construction for the per-doc ops, and the
dedup lifecycle PRE-COLLAPSES exact duplicates (the r11/r12 hardening),
so a 1000x-replica corpus — literally an exact-dup flood — is the very
shape those paths are hardened for; the adversarial non-replica evidence
for the new pair-emitter semantics is SCALEPROBE_PAIRFLOOD_r12.json and
for the similarity lifecycle SCALEPROBE_SIMLIFE_r12.json.

Writes one JSON line (captured as SCALEPROBE_R12OPS_r12.json).
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
    "SCALEPROBE_R12OPS_r12.json",
)

PROBE = [
    "mm_mp4_probe",
    "mm_mp3_probe",
    "mm_mp4_frame_index",
    "text_quality_trained",
    "sim_index_serve_recall",
    "sim_ivfpq_index_compaction",
    "dedup_lsh_index_compaction",
    "source_mat73_roundtrip",
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
        try:
            t1 = timed(spark, name, BASE)
            t1000 = timed(spark, name, rep_dir)
            results[name] = {
                "t_1x": t1,
                "t_1000x": t1000,
                "ratio": round(t1000 / t1, 2) if t1 > 0 else None,
            }
        except Exception as exc:  # record, keep probing the rest
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"# {name}: {results[name]}", file=sys.stderr)
    out = {"m": m, "results": results}
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
