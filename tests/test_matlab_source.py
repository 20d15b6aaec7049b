"""MAT v5 ingestion round-trips (reference ``tools.py:58-79``,
``preprocess.py:390-426``) — pure-numpy reader/writer, no scipy."""

import numpy as np
import pytest

from dataframework_spark.sources.matlab import (
    adapt_range,
    mat_to_long_df,
    read_mat,
    write_mat,
)


@pytest.fixture()
def ref_mat(tmp_path):
    """Reference-layout fixture: x = 1×3 cells of (features+label) × samples,
    r = 1×3 cells of 1-based permutation rows."""
    rng = np.random.RandomState(7)
    x_cells = np.empty((1, 3), dtype=object)
    r_cells = np.empty((1, 3), dtype=object)
    for i, n in enumerate([4, 5, 3]):
        m = rng.rand(3, n)  # 2 feature rows + 1 label row
        m[-1, :] = i
        x_cells[0, i] = m
        r_cells[0, i] = (rng.permutation(n) + 1).astype(np.float64).reshape(1, n)
    path = str(tmp_path / "db.mat")
    write_mat(path, {"x": x_cells, "r": r_cells})
    return path, x_cells, r_cells


def test_roundtrip_values(ref_mat):
    path, x_cells, r_cells = ref_mat
    data = read_mat(path)
    assert set(data) == {"x", "r"}
    assert data["x"].shape == (1, 3)
    for i in range(3):
        np.testing.assert_allclose(data["x"][0, i], x_cells[0, i])
        np.testing.assert_allclose(data["r"][0, i], r_cells[0, i])


def test_roundtrip_uncompressed(tmp_path):
    path = str(tmp_path / "plain.mat")
    write_mat(path, {"m": np.arange(6.0).reshape(2, 3)}, compress=False)
    data = read_mat(path)
    np.testing.assert_allclose(data["m"], np.arange(6.0).reshape(2, 3))


def test_missing_file_returns_none(tmp_path):
    assert read_mat(str(tmp_path / "nope.mat")) is None


def test_domain_selection(ref_mat):
    path, _, _ = ref_mat
    only_x = read_mat(path, ["x"])
    assert set(only_x) == {"x"}
    with pytest.raises(KeyError, match="zzz"):
        read_mat(path, ["zzz"])


def test_adapt_range_semantics(ref_mat):
    path, x_cells, _ = ref_mat
    data = read_mat(path)
    # range [2, 3] is 1-based inclusive → cells 1 and 2
    out = adapt_range(data, "x", "r", drange=(2, 3), labeled=True)
    assert len(out["x"]) == 2
    # labeled strips the label row, transpose → samples × features
    assert out["x"][0].shape == (5, 2)
    np.testing.assert_allclose(out["x"][0], x_cells[0, 1][:-1].T)
    # permutations were 1-based with max == n → normalized to 0-based
    for r in out["r"]:
        row = r[0] if r.ndim == 2 else r
        assert row.min() == 0 and row.max() == row.shape[-1] - 1


def test_adapt_range_unlabeled_keeps_all_rows(ref_mat):
    path, x_cells, _ = ref_mat
    data = read_mat(path)
    out = adapt_range(data, "x", "r", drange=(-1,), labeled=False)
    assert out["x"][0].shape == (4, 3)  # all 3 rows kept, transposed


def test_mat_to_long_df(spark, ref_mat):
    path, x_cells, _ = ref_mat
    df = mat_to_long_df(spark, path, labeled=True)
    rows = df.collect()
    assert len(rows) == 4 + 5 + 3
    assert df.columns == ["label", "sample_id", "features", "perm_order"]
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
        assert len(r.features) == 2  # label row stripped
        assert r.perm_order >= 0  # every sample got a rank
    assert {k: len(v) for k, v in by_label.items()} == {0: 4, 1: 5, 2: 3}
    # feature values survive the trip: class 0, sample 0 = column 0 of cell 0
    r0 = next(r for r in rows if r.label == 0 and r.sample_id == 0)
    np.testing.assert_allclose(r0.features, x_cells[0, 0][:-1, 0])


def test_roundtrip_property_random_shapes(tmp_path):
    # property: any dict of float64 matrices and 1×N cells of matrices
    # survives write_mat → read_mat bit-exactly (compressed and not).
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    mat_strategy = arrays(
        np.float64,
        st.tuples(st.integers(1, 5), st.integers(1, 6)),
        elements=st.floats(-1e6, 1e6, allow_nan=False),
    )

    @given(mats=st.lists(mat_strategy, min_size=1, max_size=4), compress=st.booleans())
    @settings(max_examples=25, deadline=None)
    def check(mats, compress):
        cells = np.empty((1, len(mats)), dtype=object)
        for i, m in enumerate(mats):
            cells[0, i] = m
        path = str(tmp_path / "prop.mat")
        write_mat(path, {"plain": mats[0], "cells": cells}, compress=compress)
        data = read_mat(path)
        np.testing.assert_array_equal(data["plain"], mats[0])
        assert data["cells"].shape == (1, len(mats))
        for i, m in enumerate(mats):
            np.testing.assert_array_equal(data["cells"][0, i], m)

    check()
