"""Source-level policy guards: scale rules the engine must never regress.

These encode the repo's "nothing driver-resident, nothing row-at-a-time"
design rules (SURVEY.md §7) as greps over the engine source — the same
checks the round-1 judge ran by hand.  A hit is a scale bug even when the
sf-test output is correct.
"""

from __future__ import annotations

import io
import pathlib
import re
import tokenize

ENGINE = pathlib.Path(__file__).resolve().parent.parent / "dataframework_spark"


def _source_files():
    return sorted(ENGINE.rglob("*.py"))


def _code_lines(path: pathlib.Path):
    """(lineno, code-only line) pairs: string literals (incl. docstrings)
    and comments are blanked out so policy patterns never fire on prose."""
    text = path.read_text()
    lines = text.splitlines()
    masks: dict[int, list[tuple[int, int]]] = {}
    for tok in tokenize.generate_tokens(io.StringIO(text).readline):
        if tok.type in (tokenize.STRING, tokenize.COMMENT):
            (r0, c0), (r1, c1) = tok.start, tok.end
            for r in range(r0, r1 + 1):
                s = c0 if r == r0 else 0
                e = c1 if r == r1 else len(lines[r - 1]) if r - 1 < len(lines) else 0
                masks.setdefault(r, []).append((s, e))
    for i, line in enumerate(lines, 1):
        # fill with a non-space char so blanked string args don't read as
        # empty parens (partitionBy("x") must not look like partitionBy())
        for s, e in masks.get(i, []):
            line = line[:s] + "_" * (e - s) + line[e:]
        yield i, line


def test_no_row_at_a_time_udfs():
    """Only pandas_udf / applyInPandas / mapInPandas / UDTFs are allowed —
    ``F.udf`` / ``@udf`` run the Python interpreter per ROW."""
    pat = re.compile(r"\bF\.udf\s*\(|^\s*@udf\b|\budf\s*\(\s*lambda")
    hits = [
        f"{p.relative_to(ENGINE)}:{i}: {line.strip()}"
        for p in _source_files()
        for i, line in _code_lines(p)
        if pat.search(line)
    ]
    assert not hits, "row-at-a-time UDFs found:\n" + "\n".join(hits)


def test_no_driver_side_collect_of_tables():
    """``.toPandas()`` materializes a whole DataFrame on the driver — at
    100 TB that is an OOM, full stop (r1: dedup_embedding_cosine).  Build
    broadcast sides from bounded aggregates (``collect`` on vocab-sized /
    limit-guarded frames is reviewed case by case; toPandas is banned)."""
    hits = [
        f"{p.relative_to(ENGINE)}:{i}: {line.strip()}"
        for p in _source_files()
        for i, line in _code_lines(p)
        if ".toPandas()" in line
    ]
    assert not hits, "driver-side toPandas() found:\n" + "\n".join(hits)


def test_no_unpartitioned_ranking_windows():
    """``Window.orderBy(...)`` without a ``partitionBy`` funnels every row
    through ONE task (r1: the MinHash/SimHash vocabulary dictionaries).
    Global rankings must come from aggregate-sized inputs via an explicit
    ``_GLOBAL_WINDOW_OK`` marker comment on the same line, or use
    approxQuantile/partitioned forms."""
    pat = re.compile(r"Window\s*\.\s*orderBy\s*\(|Window\s*\.\s*partitionBy\s*\(\s*\)")
    hits = []
    for p in _source_files():
        raw = p.read_text().splitlines()
        for i, line in _code_lines(p):
            if pat.search(line) and "_GLOBAL_WINDOW_OK" not in raw[i - 1]:
                hits.append(f"{p.relative_to(ENGINE)}:{i}: {raw[i - 1].strip()}")
    assert not hits, (
        "unpartitioned ranking windows found (mark bounded ones with a "
        "_GLOBAL_WINDOW_OK comment stating WHY the input is aggregate-sized):\n"
        + "\n".join(hits)
    )


def test_every_collect_site_carries_a_bound_justification():
    """``.collect()`` on an unbounded frame is a driver OOM at 100 TB.
    Bounded collects are allowed case by case, but the bound must be
    stated WHERE the collect happens: every ``.collect(`` in the engine
    must carry an inline comment containing the word "bounded" (or a
    "bounded" comment within the two preceding lines) naming what bounds
    the row count — r10 VERDICT "What's wrong" #3 turned this repo
    discipline into CI."""
    hits = []
    for p in _source_files():
        raw = p.read_text().splitlines()
        for i, line in _code_lines(p):
            if ".collect(" not in line:
                continue
            window = " ".join(raw[max(0, i - 3) : i]).lower()
            if "bounded" not in window:
                hits.append(f"{p.relative_to(ENGINE)}:{i}: {raw[i - 1].strip()}")
    assert not hits, (
        "collect() sites missing an inline bound justification (add a "
        "comment with the word 'bounded' naming what bounds the rows):\n"
        + "\n".join(hits)
    )
