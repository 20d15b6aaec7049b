"""Time-shift scale probe for the last output-quadratic-on-replica sweep
exclusion: ``join_interval_overlap``.

The replica exclusion is sound for the TIME dimension too: an M× events
replica stacks M copies of every event AT THE SAME TIMESTAMPS, so every
(day) bucket holds M× the concurrent users and the interval-overlap
join's output grows ~M² by construction (270 s at 10×, measured r3).
Real event history doesn't scale that way — it scales by covering MORE
TIME at a similar concurrency.  This probe synthesizes exactly that:

* copy j shifts every timestamp by ``j · (span + 1 day)`` — copies
  occupy DISJOINT day ranges, so no interval from copy i can share a
  day bucket with copy j ≠ i;
* copy j shifts user_id (and event_id) by ``j · OFFSET`` — pair
  identities stay per-copy.

Within each copy the (user, day) intervals are the base corpus's
verbatim (timestamp translation preserves every within-day min/max and
overlap), so the TRUE pair set grows exactly ~M and the per-bucket
concurrent-user density — the quantity the join is quadratic in — stays
CONSTANT as the corpus grows.  That is the operating condition the
bucket-binning design targets: more data means more buckets, not denser
ones.  Cross-copy pairs are counted and must be exactly zero (disjoint
days make them impossible — an assert, not a hope).

The registered query runs UNGUARDED (exact semantics, the oracle's
twin); production callers use ``interval_overlap_pairs(max_per_bucket=
...)`` — the r4 density guard — when bucket density is not under their
control.  This probe measures the unguarded exact form under the
non-degenerate scale-up.

Usage: python tools/probe_timeshift_r9.py [M ...]    (default: 10 100)
Writes SCALEPROBE_TIMESHIFT_r9.json (one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pyspark.sql import functions as F

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
SCRATCH = os.path.join(ROOT, ".scratch", "timeshift_scale")
OUT = os.path.join(ROOT, "SCALEPROBE_TIMESHIFT_r9.json")
OFFSET = 10_000_000_000
DAY_US = 86_400_000_000


def build_corpus(m: int) -> str:
    """M time-shifted, user-offset copies of the base events, written
    once and cached.  Copy j: ts += j·(span+1 day), user_id/event_id +=
    j·OFFSET.  Timestamps stay timestamp[us] (the r3 testdata encoding
    the loader normalizes)."""
    out_dir = os.path.join(SCRATCH, f"m{m}")
    out = os.path.join(out_dir, "events.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    base = pq.read_table(os.path.join(BASE, "events.parquet"))
    ts_us = pc.cast(base.column("ts"), pa.int64())
    lo = pc.min(ts_us).as_py()
    hi = pc.max(ts_us).as_py()
    stride = ((hi - lo) // DAY_US + 2) * DAY_US  # whole days: buckets disjoint
    writer = pq.ParquetWriter(out, base.schema)
    try:
        for j in range(m):
            t = pa.table(
                {
                    "event_id": pc.add(base.column("event_id"), j * OFFSET),
                    "ts": pc.cast(pc.add(ts_us, j * stride), base.schema.field("ts").type),
                    "user_id": pc.add(base.column("user_id"), j * OFFSET),
                    "event_type": base.column("event_type"),
                    "value": base.column("value"),
                    "props": base.column("props"),
                }
            ).cast(base.schema)
            writer.write_table(t)
    finally:
        writer.close()
    return out_dir


def probe(spark, sf_dir: str) -> dict:
    from dataframework_spark.operators.temporal import join_interval_overlap

    t0 = time.perf_counter()
    same = (F.col("user_a") / OFFSET).cast("bigint") == (
        F.col("user_b") / OFFSET
    ).cast("bigint")
    row = join_interval_overlap(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum(same.cast("bigint")), F.lit(0)).alias("n_within"),
        F.coalesce(F.sum("n_overlap_days"), F.lit(0)).alias("pair_days"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 3)
    spark.catalog.clearCache()
    return {
        "pairs": row.n_pairs,
        "pairs_within_copy": int(row.n_within),
        "pairs_cross_copy": int(row.n_pairs - row.n_within),
        "pair_days": int(row.pair_days),
        "wall_sec": wall,
    }


def main() -> None:
    from dataframework_spark.session import get_spark

    ms = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    d1 = build_corpus(1)
    probe(spark, d1)  # discarded warm-up: JVM/codegen, not the plan
    base = probe(spark, d1)
    results = {"m1": base}
    for m in ms:
        r = probe(spark, build_corpus(m))
        r["data_ratio"] = m
        for k in ("pairs", "pairs_within_copy", "pair_days", "wall_sec"):
            if base[k]:
                r[f"{k}_ratio_vs_1x"] = round(r[k] / base[k], 2)
        results[f"m{m}"] = r
    out = {
        "probe": "timeshift_nonreplica_r9",
        "ops": ["join_interval_overlap"],
        "note": (
            "copies occupy disjoint day ranges at base concurrency: more "
            "data = more buckets, not denser ones — output must grow ~M "
            "with zero cross-copy pairs; the replica's M^2 was bucket "
            "densification, which interval_overlap_pairs(max_per_bucket) "
            "guards against in production"
        ),
        "results": results,
    }
    line = json.dumps(out)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
