"""MAT v7.3 (HDF5-layout) subset reader/writer tests (S2, settled r12).

The registered query proves the corpus-fixture round-trip by value hash;
these pin the container mechanics and the REJECTED-not-mis-read
contract: truncation, wrong MAT version, superblock drift, chunked
layout, deep B-trees, non-float64 datatypes, header continuations.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataframework_spark.sources.matlab import (
    read_mat,
    read_mat73,
    write_mat,
    write_mat73,
)


def _vars():
    return {
        "alpha": np.arange(12, dtype=np.float64).reshape(3, 4),
        "beta": np.array([[1.5, -2.25], [3.0, 4.0]]),
        "gamma": np.linspace(-1, 1, 9),
    }


def test_roundtrip_values_and_matlab_shapes(tmp_path):
    p = str(tmp_path / "a.mat")
    write_mat73(p, _vars())
    got = read_mat73(p)
    for k, v in _vars().items():
        exp = np.asarray(v, dtype=np.float64)
        if exp.ndim < 2:
            exp = exp.reshape(1, -1)
        assert got[k].shape == exp.shape
        assert np.array_equal(got[k], exp)


def test_dataset_bytes_are_transposed_c_order(tmp_path):
    """The v7.3 convention: MATLAB (m, n) arrays land in the file as
    (n, m) C-order — i.e. the raw bytes are the F-order flatten.  Pin it
    against the bytes so reader and writer can't hide a double
    transpose from each other."""
    p = str(tmp_path / "t.mat")
    arr = np.arange(6, dtype=np.float64).reshape(2, 3)
    write_mat73(p, {"m": arr})
    raw = open(p, "rb").read()
    assert arr.flatten(order="F").tobytes() in raw
    assert arr.flatten(order="C").tobytes() not in raw


def test_more_than_eight_variables_split_across_snods(tmp_path):
    p = str(tmp_path / "many.mat")
    many = {f"v{i:02d}": np.full((2, 2), float(i)) for i in range(20)}
    write_mat73(p, many)
    got = read_mat73(p)
    assert set(got) == set(many)
    assert all(np.array_equal(got[k], many[k]) for k in many)


def test_domain_selection_and_missing_file_contract(tmp_path):
    p = str(tmp_path / "a.mat")
    write_mat73(p, _vars())
    assert list(read_mat73(p, ["beta"])) == ["beta"]
    with pytest.raises(KeyError, match="nope"):
        read_mat73(p, ["nope"])
    assert read_mat73(str(tmp_path / "absent.mat")) is None


def test_v5_and_v73_containers_carry_identical_data(tmp_path):
    """Cross-format consistency: the same variables written v5 and v7.3
    read back identical — the converter contract is container-agnostic."""
    v5, v73 = str(tmp_path / "five.mat"), str(tmp_path / "seven.mat")
    write_mat(v5, _vars(), compress=True)
    write_mat73(v73, _vars())
    a, b = read_mat(v5), read_mat73(v73)
    assert set(a) == set(b)
    for k in a:
        assert np.array_equal(np.asarray(a[k]), b[k]), k


def test_wrong_mat_version_rejected(tmp_path):
    p = str(tmp_path / "a.mat")
    write_mat73(p, _vars())
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<H", raw, 124, 0x0100)  # claim v5 in the userblock
    bad = str(tmp_path / "bad.mat")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="not a MAT v7.3 header"):
        read_mat73(bad)


def test_truncation_rejected(tmp_path):
    p = str(tmp_path / "a.mat")
    write_mat73(p, _vars())
    raw = open(p, "rb").read()
    bad = str(tmp_path / "bad.mat")
    open(bad, "wb").write(raw[:300])
    with pytest.raises(ValueError, match="truncated"):
        read_mat73(bad)
    open(bad, "wb").write(raw[:-40])  # cut into the last dataset's data
    with pytest.raises(ValueError):
        read_mat73(bad)


def test_superblock_signature_and_version_rejected(tmp_path):
    p = str(tmp_path / "a.mat")
    write_mat73(p, _vars())
    raw = bytearray(open(p, "rb").read())
    bad = str(tmp_path / "bad.mat")
    flipped = raw.copy()
    flipped[512] ^= 0xFF
    open(bad, "wb").write(bytes(flipped))
    with pytest.raises(ValueError, match="signature"):
        read_mat73(bad)
    bumped = raw.copy()
    bumped[520] = 1  # superblock version
    open(bad, "wb").write(bytes(bumped))
    with pytest.raises(ValueError, match="superblock version"):
        read_mat73(bad)


def test_chunked_layout_rejected_not_misread(tmp_path):
    p = str(tmp_path / "a.mat")
    write_mat73(p, {"only": np.ones((2, 2))})
    raw = bytearray(open(p, "rb").read())
    # layout message body starts (version=3, class=1); flip class to
    # 2 = chunked — the reader must reject, not misinterpret the span
    i = raw.find(bytes([3, 1]), raw.find(b"SNOD"))
    # locate via the message: search for the 0x0008 message header pattern
    i = raw.find(struct.pack("<HH", 0x0008, 24))
    assert i > 0
    assert raw[i + 8] == 3 and raw[i + 9] == 1
    raw[i + 9] = 2
    bad = str(tmp_path / "bad.mat")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="chunked"):
        read_mat73(bad)


def test_non_f64_datatype_rejected(tmp_path):
    p = str(tmp_path / "a.mat")
    write_mat73(p, {"only": np.ones((2, 2))})
    raw = bytearray(open(p, "rb").read())
    i = raw.find(struct.pack("<HH", 0x0003, 24))
    assert i > 0 and raw[i + 8] == 0x11
    raw[i + 8] = 0x10  # datatype class 0 = fixed-point
    bad = str(tmp_path / "bad.mat")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="float64 datasets only"):
        read_mat73(bad)


def test_deep_btree_rejected(tmp_path):
    p = str(tmp_path / "a.mat")
    write_mat73(p, _vars())
    raw = bytearray(open(p, "rb").read())
    i = raw.find(b"TREE")
    raw[i + 5] = 1  # node level
    bad = str(tmp_path / "bad.mat")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="depth > 0"):
        read_mat73(bad)
