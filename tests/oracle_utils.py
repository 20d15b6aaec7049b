"""Mini oracle harness mirroring the driver's comparison.

Runs a registered Spark query and its DuckDB oracle SQL side by side and
compares row count, column-name set, and the order-insensitive multiset of
rows with columns sorted by name — i.e. the same thing the driver's value
hash sees.  Values are compared EXACTLY (floats too): the engine's
discipline is to round floats inside the query on both sides, so any
residual difference is a real portability bug, not noise.
"""

from __future__ import annotations

import datetime
import decimal
import math


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        # -0.0 vs 0.0 and NaN normalization only; no rounding here.
        if math.isnan(v):
            return "NaN"
        return v + 0.0
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    return v


def normalized_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_value(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def _negzero_cells(rows: list[tuple]) -> int:
    return sum(
        1
        for row in rows
        for v in row
        if isinstance(v, float) and v == 0.0 and math.copysign(1.0, v) < 0
    )


def compare(spark_df, duck_con, sql: str, max_diff_report: int = 5) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    # Policy: NEITHER side may emit IEEE -0.0.  The normalization below
    # hides the sign, but the driver's canonicalizer may not (string/byte
    # hashing sees '-0.0' ≠ '0.0') — ml_feature_covariance hit exactly
    # this skew.  Queries must collapse it (append `+ 0.0` after ROUND).
    for side, rows in (("spark", s_rows), ("oracle", d_rows)):
        nz = _negzero_cells(rows)
        if nz:
            problems.append(
                f"{side} emits {nz} IEEE -0.0 cell(s); append '+ 0.0' after "
                "the final ROUND so both engines print plain 0.0"
            )

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}")

    sn = normalized_rows(s_cols, s_rows)
    dn = normalized_rows(d_cols, d_rows)
    if sn != dn:
        diffs = []
        s_only = [r for r in sn if r not in set(map(tuple, dn))]
        d_only = [r for r in dn if r not in set(map(tuple, sn))]
        for r in s_only[:max_diff_report]:
            diffs.append(f"  spark-only: {r}")
        for r in d_only[:max_diff_report]:
            diffs.append(f"  duck-only:  {r}")
        problems.append(
            "value mismatch (cols sorted: %s):\n%s" % (sorted(s_cols), "\n".join(diffs))
        )
    return problems
