"""1000x probe of the r7 operator wave (the per-round discipline since r5:
every round's heaviest newcomers get a measured 1000x row, not an argument).

Probes, on the cached .scratch/scale1000x replica (600M-row lineitem /
2M-doc documents / 2M-vector embeddings):

* ``text_bm25_topk`` — the claim is the inverted-index access pattern:
  tf is cached once, df/query-term tables stay vocabulary-sized and
  broadcast, and the only corpus-wide exchanges are the (doc, term)
  aggregate and the narrow dl join.  Linear in corpus tokens.
* ``sim_rrf_fusion`` — bm25 side as above + a broadcast 5-query dense
  scan; the fusion join touches <= 40 rows per query.  Linear.
* ``text_chi2_keywords`` — presence explode ~ tokens x1 into ONE
  (term, source) aggregate; the scored table is vocabulary-sized and
  does NOT grow with replication (same vocabulary), so the top-k window
  is constant-size.  Linear scan-bound.
* ``corpus_epoch_plan`` — one |sources|-row aggregate.  Scan-bound.

The replica's documents are M-way exact duplicates, which is fine for
these operators: none of them expands pairs — BM25/chi2/epoch collapse
to (doc,term)/(term,source)/source aggregates whose SIZES are honest at
any duplication, and rrf's per-system lists stay top-20 per query.

Writes one JSON line (captured as SCALEPROBE1000_R7OPS_r7.json).
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
    "SCALEPROBE1000_R7OPS_r7.json",
)

PROBE = [
    "text_bm25_topk",
    "sim_rrf_fusion",
    "text_chi2_keywords",
    "corpus_epoch_plan",
]


def timed(spark, name: str, sf_dir: str) -> float:
    fn = get_spec(name).fn
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    dt = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()  # bm25 caches tf; don't let it leak across runs
    return dt


def main() -> None:
    m = 1000
    rep_dir = os.path.join(SCRATCH, f"scale{m}x")
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(rep_dir, "documents.parquet")):
        build_replica(spark, m, rep_dir)
    results = {}
    # warm-up: JVM/codegen, not the plans under test
    timed(spark, PROBE[-1], BASE)
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
