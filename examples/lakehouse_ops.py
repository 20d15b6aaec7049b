"""The data-management loop a lake runs between ingests, on this engine.

Every stage is a registered, oracle-checked query (name in parens);
composing them is the operational playbook for a 100 TB lakehouse:

1. LAYOUT   — Z-order-cluster the fact on its two probe columns and
              measure what the layout buys: per-file min/max stats +
              prunable flags vs the naive arrival layout
              (``sink_zorder_layout``).
2. REFRESH  — merge the newly-arrived delta into the persisted
              aggregate state instead of rescanning history
              (``sink_incremental_agg``).
3. GATE     — before publishing: FK orphan audit across the star
              schema (``profile_referential_integrity``) and a PSI
              drift check of the new window against the reference
              (``ml_psi_drift``).
4. DEDUP    — canonicalize crawl URLs and collapse re-crawled
              spellings (``dedup_url_normalize``).
5. DECIDE   — the A/B readout for the experiment the refreshed tables
              serve (``events_ab_test_lift``).

Runnable as-is (~30 s on local[4]):

    python examples/lakehouse_ops.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframework_spark.registry import all_queries
from dataframework_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark(app_name="lakehouse-ops", cpus=4)
    q = {name: spec.fn for name, spec in all_queries().items()}

    print("== 1. layout: z-order clustering vs arrival order ==")
    stats = q["sink_zorder_layout"](spark, SF_DIR).collect()
    for layout in ("zorder", "arrival"):
        rows = [r for r in stats if r.layout == layout]
        pruned = sum(r.prunable for r in rows)
        print(f"  {layout:8s}: {pruned}/{len(rows)} files prunable for the mid-range probe")

    print("== 2. refresh: delta merged into persisted state ==")
    for r in q["sink_incremental_agg"](spark, SF_DIR).orderBy("o_orderpriority").collect():
        print(f"  {r.o_orderpriority:10s} n={r.n_orders:6d} sum={r.sum_price:14.2f}")

    print("== 3a. gate: referential integrity ==")
    for r in q["profile_referential_integrity"](spark, SF_DIR).collect():
        verdict = "ok" if r.ok else f"FAILED ({r.orphan_rows} orphans)"
        print(f"  {r.constraint_name:32s} {verdict}")

    print("== 3b. gate: distribution drift (PSI) ==")
    rows = q["ml_psi_drift"](spark, SF_DIR).collect()
    psi = rows[0].psi_total
    band = "stable" if psi < 0.1 else ("drifting" if psi < 0.25 else "RETRAIN")
    print(f"  PSI = {psi} -> {band}")

    print("== 4. dedup: URL canonicalization ==")
    clusters = q["dedup_url_normalize"](spark, SF_DIR).collect()
    n_docs = sum(r.n_copies for r in clusters)
    merged = sum(r.n_copies - 1 for r in clusters if r.n_copies > 1)
    print(f"  {n_docs} raw URLs -> {len(clusters)} canonical ({merged} re-crawled spellings collapsed)")

    print("== 5. decide: A/B readout ==")
    r = q["events_ab_test_lift"](spark, SF_DIR).collect()[0]
    print(
        f"  A {r.rate_a:.4f} vs B {r.rate_b:.4f}: lift {r.lift:+.2%}, "
        f"z={r.z_score}, significant={bool(r.significant)}"
    )

    spark.stop()


if __name__ == "__main__":
    main()
