"""Time a named subset of registered queries with bench.py's methodology.

Usage: python tools/bench_queries.py q1_pricing_summary dedup_minhash_lsh ...
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_REPS (default 3).

Same discipline as bench.py: untimed warmups, noop sink, per-rep
clearCache, per-query median + spread.  Used for the r12 optimization
round's before/after evidence on queries outside the headline set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframework_spark.registry import all_queries  # noqa: E402
from dataframework_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or (os.cpu_count() or 4)
    reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    spark = get_spark(app_name="dfx-bench-queries", cpus=cpus)
    specs = all_queries()
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    # same untimed warmups as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(64).toDF("x").mapInPandas(lambda it: it, "x bigint").write.format(
        "noop"
    ).mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            df = specs[name].fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    print(
        json.dumps(
            {
                "queries": {n: round(median(v), 3) for n, v in samples.items()},
                "spread": {n: [min(v), max(v)] for n, v in samples.items()},
                "sf_dir": sf_dir,
                "cpus": int(cpus),
                "reps": reps,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
