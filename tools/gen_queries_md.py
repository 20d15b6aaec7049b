"""Generate QUERIES.md: the full registry catalog from live registrations.

Run from the repo root: ``python tools/gen_queries_md.py`` (no Spark
session needed — registration is import-time metadata only).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframework_spark.registry import all_queries  # noqa: E402


def main() -> None:
    specs = all_queries()
    lines = [
        "# QUERIES — the registered operator catalog (generated)",
        "",
        f"{len(specs)} queries; {sum(1 for s in specs.values() if s.oracle)} with "
        "DuckDB value-hash oracles (rest: driver rows-only check).",
        "Regenerate with `python tools/gen_queries_md.py`.",
        "",
        "| query | oracle | module | summary |",
        "|---|---|---|---|",
    ]
    for name in sorted(specs):
        spec = specs[name]
        summary = (spec.doc or "").strip().splitlines()[0].rstrip(".") if spec.doc else ""
        summary = summary.replace("|", "\\|")
        module = spec.fn.__module__.removeprefix("dataframework_spark.")
        lines.append(
            f"| `{name}` | {'hash' if spec.oracle else 'rows-only'} | `{module}` | {summary} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(specs)} queries")


if __name__ == "__main__":
    main()
