"""Edge-case unit tests for temporal.asof_join (crafted frames).

The oracle covers the bulk semantics on real data; these pin the corner
cases a backward as-of join must get right: no-prior-match → null, exact
timestamp ties (right row visible at equal ts), multiple right rows at
one timestamp, and key isolation (no cross-key leakage).
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from dataframework_spark.operators.temporal import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(9), 10.0),   # before ANY right row for key 1
            (1, _ts(12), 11.0),  # after right@10 and right@11
            (1, _ts(11), 12.0),  # EXACTLY at right@11 → ties include it
            (2, _ts(12), 20.0),  # key 2: only right@10 exists
            (3, _ts(12), 30.0),  # key 3: no right rows at all
        ],
        "k long, ts timestamp, lv double",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(10), 100.0),
            (1, _ts(11), 110.0),
            (1, _ts(11), 111.0),  # duplicate ts: latest-in-order wins deterministically? see test
            (2, _ts(10), 200.0),
        ],
        "k long, ts timestamp, rv double",
    )
    return left, right


def test_asof_backward_semantics(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k").select("k", "ts", "lv", "rv_asof")
    rows = {(r.k, r.ts.hour): r.rv_asof for r in out.collect()}
    assert rows[(1, 9)] is None          # nothing prior
    assert rows[(1, 12)] in (110.0, 111.0)  # latest right ≤ 12:00 is one of the 11:00 rows
    assert rows[(1, 11)] in (110.0, 111.0)  # tie: right row at equal ts IS visible
    assert rows[(2, 12)] == 200.0        # no leakage from key 1
    assert rows[(3, 12)] is None         # key with no right side at all


def test_asof_row_count_preserved(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k")
    assert out.count() == left.count()  # as-of never fans out or drops left rows


def test_asof_matched_ts_column(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="k")
    rows = {(r.k, r.ts.hour): r for r in out.collect()}
    assert rows[(2, 12)]._asof_ts.hour == 10  # records WHICH right row matched
    assert rows[(3, 12)]._asof_ts is None


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized differential test: asof_join ≡ pandas.merge_asof
    (direction='backward', allow_exact_matches=True) — an independent
    reference implementation — over 300 random left/right rows with
    colliding keys and timestamps."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    left_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 8, 300),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 86400, 300), "s"),
            "lv": np.arange(300, dtype="float64"),
        }
    )
    right_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 10, 200),  # includes keys absent on the left
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 86400, 200), "s"),
            "rv": np.arange(200, dtype="float64") * 10,
        }
    )
    # merge_asof with duplicate right timestamps keeps the LAST duplicate;
    # drop dup (k, ts) on the right to make the expected answer unique
    right_pd = right_pd.drop_duplicates(["k", "ts"], keep="last")

    expected = pd.merge_asof(
        left_pd.sort_values("ts", kind="stable"),
        right_pd.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    exp = {(r.k, r.ts, r.lv): r.rv for r in expected.itertuples()}

    out = asof_join(
        spark.createDataFrame(left_pd), spark.createDataFrame(right_pd), on="k"
    ).collect()
    assert len(out) == len(left_pd)
    for r in out:
        want = exp[(r.k, pd.Timestamp(r.ts), r.lv)]
        got = r.rv_asof
        if pd.isna(want):
            assert got is None, (r.k, r.ts, got, want)
        else:
            assert got == want, (r.k, r.ts, got, want)


# ---------------------------------------------------------------------------
# interval_overlap_pairs density guard (VERDICT r3 #6)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def intervals(spark):
    # day "d1" holds 4 co-active users (6 pairs), day "d2" holds 2 (1 pair)
    rows = [(u, "d1", _ts(9), _ts(17)) for u in range(4)]
    rows += [(10, "d2", _ts(9), _ts(12)), (11, "d2", _ts(10), _ts(11))]
    return spark.createDataFrame(rows, "user_id int, day string, s timestamp, e timestamp")


def test_interval_overlap_unguarded_pair_count(intervals):
    from dataframework_spark.operators.temporal import interval_overlap_pairs

    assert interval_overlap_pairs(intervals).count() == 6 + 1


def test_interval_overlap_guard_errors_before_expansion(intervals):
    from dataframework_spark.operators.temporal import (
        BucketDensityExceeded,
        interval_overlap_pairs,
    )

    with pytest.raises(BucketDensityExceeded, match="d1.*holds 4"):
        interval_overlap_pairs(intervals, max_per_bucket=3)


def test_interval_overlap_guard_prunes_only_dense_bucket(intervals):
    from dataframework_spark.operators.temporal import interval_overlap_pairs

    pruned = interval_overlap_pairs(intervals, max_per_bucket=3, on_exceed="prune")
    rows = pruned.collect()
    assert len(rows) == 1 and rows[0]["id_a"] == 10 and rows[0]["id_b"] == 11


def test_interval_overlap_overdense_report_names_dropped_bucket(intervals):
    from dataframework_spark.operators.temporal import overdense_buckets

    dropped = overdense_buckets(intervals, "day", 3).collect()
    assert [(r["day"], r["n_intervals"]) for r in dropped] == [("d1", 4)]


def test_interval_overlap_guard_cap_met_is_exact(intervals):
    from dataframework_spark.operators.temporal import interval_overlap_pairs

    # cap above the densest bucket: guard must not change the result
    assert interval_overlap_pairs(intervals, max_per_bucket=4).count() == 7
    assert (
        interval_overlap_pairs(intervals, max_per_bucket=4, on_exceed="prune").count()
        == 7
    )


def test_interval_overlap_on_exceed_validated_unconditionally(intervals):
    # ADVICE r4: a typo'd mode (or 'prune' intent with no cap) must fail at
    # entry, never silently run the unguarded quadratic join.
    from dataframework_spark.operators.temporal import interval_overlap_pairs

    with pytest.raises(ValueError, match="on_exceed"):
        interval_overlap_pairs(intervals, on_exceed="purne")
    with pytest.raises(ValueError, match="on_exceed"):
        interval_overlap_pairs(intervals, max_per_bucket=3, on_exceed="drop")


def test_interval_overlap_no_internal_bucket_columns(intervals):
    # ADVICE r4: the internal _bkt/_bkt_b join keys must not leak
    from dataframework_spark.operators.temporal import interval_overlap_pairs

    cols = set(interval_overlap_pairs(intervals).columns)
    assert cols == {"id_a", "s_a", "e_a", "id_b", "s_b", "e_b"}


# ---------------------------------------------------------------------------
# fuzzy_match_pairs density guard (VERDICT r4 #2)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fuzzy_docs(spark):
    # block ("en","web") holds 4 docs (6 candidate pairs), ("fr","web") 2
    rows = [(i, "en", "web", 100 + i, "hello world prefix") for i in range(4)]
    rows += [(10, "fr", "web", 100, "bonjour monde"), (11, "fr", "web", 120, "bonjour tout")]
    return spark.createDataFrame(
        rows, "doc_id int, lang string, source string, n_chars int, prefix string"
    )


def test_fuzzy_match_unguarded_pair_count(fuzzy_docs):
    from dataframework_spark.operators.text import fuzzy_match_pairs

    assert fuzzy_match_pairs(fuzzy_docs).count() == 6 + 1


def test_fuzzy_match_guard_errors_before_expansion(fuzzy_docs):
    from dataframework_spark.operators.temporal import BucketDensityExceeded
    from dataframework_spark.operators.text import fuzzy_match_pairs

    with pytest.raises(BucketDensityExceeded, match="lang='en'.*holds 4"):
        fuzzy_match_pairs(fuzzy_docs, max_per_block=3)


def test_fuzzy_match_guard_prunes_only_dense_block(fuzzy_docs):
    from dataframework_spark.operators.text import fuzzy_match_pairs

    rows = fuzzy_match_pairs(fuzzy_docs, max_per_block=3, on_exceed="prune").collect()
    assert len(rows) == 1 and rows[0]["doc_a"] == 10 and rows[0]["doc_b"] == 11


def test_fuzzy_match_overdense_report_names_dropped_block(fuzzy_docs):
    from dataframework_spark.operators.text import overdense_blocks

    dropped = overdense_blocks(fuzzy_docs, ["lang", "source"], 3).collect()
    assert [(r["lang"], r["source"], r["n_docs"]) for r in dropped] == [("en", "web", 4)]


def test_fuzzy_match_guard_cap_met_is_exact(fuzzy_docs):
    from dataframework_spark.operators.text import fuzzy_match_pairs

    assert fuzzy_match_pairs(fuzzy_docs, max_per_block=4).count() == 7
    assert (
        fuzzy_match_pairs(fuzzy_docs, max_per_block=4, on_exceed="prune").count() == 7
    )


def test_fuzzy_match_on_exceed_validated_unconditionally(fuzzy_docs):
    from dataframework_spark.operators.text import fuzzy_match_pairs

    with pytest.raises(ValueError, match="on_exceed"):
        fuzzy_match_pairs(fuzzy_docs, on_exceed="purne")


def test_fuzzy_match_respects_length_band_and_distance(fuzzy_docs):
    from dataframework_spark.operators.text import fuzzy_match_pairs

    # tighter band: the fr pair differs by 20 chars, drop it with band 10
    assert fuzzy_match_pairs(fuzzy_docs, length_band=10).count() == 6
    # zero edit-distance budget: only identical prefixes survive
    assert fuzzy_match_pairs(fuzzy_docs, max_dist=0).count() == 6
