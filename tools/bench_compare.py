"""Mechanical BENCHALL ratio accounting (VERDICT r9 "Next round" #2).

Compares two BENCHALL JSONs (median-of-N per query) and emits, verbatim-
quotable for round notes:

  * the common-query total and total ratio,
  * every common query at >= threshold (default 1.5x), ratio-sorted,
  * newcomers / removals and their cost,
  * with ``--old-commit/--new-commit``: the touched/untouched split for
    the >= threshold list, computed from ``git diff`` between the two
    benched commits at FUNCTION granularity (diff hunks overlapping the
    registered query function's source range) with module granularity as
    the coarse tier.

Round notes that hand-count ratios miscount (ROUND9.md claimed 2 queries
at >= 1.5x; the artifacts held 12) — this script IS the count.

Usage:
  python tools/bench_compare.py BENCHALL_r8.json BENCHALL_r9.json \
      [--threshold 1.5] [--old-commit 709244e --new-commit 7fbdf9c]
"""

from __future__ import annotations

import argparse
import inspect
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    return d["queries"]


def _changed_files(old: str, new: str) -> set[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{old}..{new}"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    return {l.strip() for l in out.splitlines() if l.strip()}


def _new_side_hunks(old: str, new: str, relpath: str) -> list[tuple[int, int]]:
    """(start, end) 1-based inclusive line ranges of the NEW file touched
    by the diff."""
    out = subprocess.run(
        ["git", "diff", "-U0", f"{old}..{new}", "--", relpath],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    ranges = []
    for m in re.finditer(r"^@@ -\S+ \+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 1
        if n == 0:  # pure deletion: mark the boundary line
            ranges.append((max(start, 1), max(start, 1)))
        else:
            ranges.append((start, start + n - 1))
    return ranges


def _query_sources() -> dict[str, tuple[str, int, int]]:
    """query name -> (repo-relative file, first line, last line) of its
    registered function in the CURRENT working tree (valid for the
    touched split when HEAD == the new benched commit)."""
    sys.path.insert(0, REPO)
    from dataframework_spark.registry import all_queries

    out = {}
    for name, spec in all_queries().items():
        fn = inspect.unwrap(spec.fn)
        f = inspect.getsourcefile(fn)
        lines, first = inspect.getsourcelines(fn)
        out[name] = (os.path.relpath(f, REPO), first, first + len(lines) - 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_json")
    ap.add_argument("new_json")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--old-commit")
    ap.add_argument("--new-commit")
    args = ap.parse_args()

    qo, qn = _load(args.old_json), _load(args.new_json)
    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))

    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    ratios = {q: (qn[q] / qo[q] if qo[q] > 0 else float("inf")) for q in common}
    hot = sorted((q for q in common if ratios[q] >= args.threshold),
                 key=lambda q: -ratios[q])

    print(f"# bench_compare: {os.path.basename(args.old_json)} -> "
          f"{os.path.basename(args.new_json)} (threshold {args.threshold}x)")
    print(f"common queries: {len(common)}  |  total {tot_o:.3f} s -> "
          f"{tot_n:.3f} s  =  {tot_n / tot_o:.2f}x")
    if added:
        print(f"newcomers ({len(added)}): "
              + ", ".join(f"{q} {qn[q]:.3f}s" for q in added)
              + f"  |  cost {sum(qn[q] for q in added):.2f} s")
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    touched_fn: dict[str, str] = {}
    touched_mod: set[str] = set()
    if args.old_commit and args.new_commit:
        head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              cwd=REPO, capture_output=True, text=True).stdout.strip()
        changed = _changed_files(args.old_commit, args.new_commit)
        srcs = _query_sources()
        hunk_cache: dict[str, list[tuple[int, int]]] = {}
        for q in common:
            relf, a, b = srcs.get(q, (None, 0, 0))
            if relf is None or relf not in changed:
                continue
            touched_mod.add(q)
            if relf not in hunk_cache:
                hunk_cache[relf] = _new_side_hunks(args.old_commit,
                                                   args.new_commit, relf)
            if any(not (e < a or s > b) for s, e in hunk_cache[relf]):
                touched_fn[q] = relf
        print(f"touched split vs git diff {args.old_commit}..{args.new_commit}"
              f" (function ranges read at HEAD {head}):")

    print(f"\n>= {args.threshold}x common queries: {len(hot)}")
    for q in hot:
        mark = ""
        if args.old_commit and args.new_commit:
            if q in touched_fn:
                mark = f"  TOUCHED(fn: {touched_fn[q]})"
            elif q in touched_mod:
                mark = "  touched(module only)"
            else:
                mark = "  untouched"
        print(f"  {ratios[q]:5.2f}x  {q}  {qo[q]:.3f}s -> {qn[q]:.3f}s{mark}")
    if args.old_commit and args.new_commit and hot:
        t = [q for q in hot if q in touched_fn]
        m = [q for q in hot if q in touched_mod and q not in touched_fn]
        u = [q for q in hot if q not in touched_mod]
        print(f"\nsplit: {len(t)} touched(fn), {len(m)} touched(module-only), "
              f"{len(u)} untouched")


if __name__ == "__main__":
    main()
