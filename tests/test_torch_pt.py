"""Round-trip property tests for the torch-free .pt reader/writer pair
(sources/torch_pt.py ↔ tools/make_real_pt.py): arbitrary dense tensors
of every supported dtype must survive the genuine torch.save zipfile
format byte-exactly. The writer emits the same records torch.save
writes (GLOBAL refs to torch._utils._rebuild_tensor_v2 + persistent-id
storages), so these tests certify the reader against the real format,
not a private one.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from landsat_tair_data_pipeline_spark.sources.torch_pt import load_pt
from tools.make_real_pt import write_pt

DTYPES = [
    "float64",
    "float32",
    "float16",
    "int64",
    "int32",
    "int16",
    "int8",
    "uint8",
    "bool",
]


def _roundtrip(arr: np.ndarray) -> np.ndarray:
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.pt")
        write_pt(path, arr, "t")
        with open(path, "rb") as f:
            return load_pt(f.read())


@pytest.mark.parametrize("dtype", DTYPES)
def test_roundtrip_every_dtype(dtype):
    rng = np.random.RandomState(7)
    arr = (rng.rand(3, 4, 5) * 100).astype(dtype)
    got = _roundtrip(arr)
    assert got.dtype == np.dtype(dtype)
    assert np.array_equal(got, arr)


@settings(max_examples=30, deadline=None)
@given(
    shape=st.lists(st.integers(1, 6), min_size=1, max_size=4),
    dtype=st.sampled_from(["float32", "int32", "int64", "uint8"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_random_shapes(shape, dtype, seed):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(*shape) * 100).astype(dtype)
    got = _roundtrip(arr)
    assert got.shape == tuple(shape) and got.dtype == np.dtype(dtype)
    assert np.array_equal(got, arr)


def test_roundtrip_noncontiguous_input():
    """Transposed (non-C-contiguous) input is materialized by the
    writer; values and shape survive."""
    arr = np.arange(24, dtype=np.int32).reshape(2, 3, 4).transpose(2, 0, 1)
    got = _roundtrip(arr)
    assert np.array_equal(got, arr)


def test_writer_is_byte_reproducible(tmp_path):
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    p1, p2 = str(tmp_path / "a.pt"), str(tmp_path / "b.pt")
    write_pt(p1, arr, "x")
    write_pt(p2, arr, "x")
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_scalar_zero_dim_tensor():
    arr = np.array(42.5, dtype=np.float64)
    got = _roundtrip(arr)
    assert got.shape == () and float(got) == 42.5


def test_rejects_out_of_bounds_geometry():
    """Crafted tensor geometry must raise UnsupportedPtError BEFORE
    any strided view is built: pickle-supplied shape/stride/offset is
    attacker-controlled and as_strided reads whatever the arithmetic
    reaches."""
    from landsat_tair_data_pipeline_spark.sources.torch_pt import (
        UnsupportedPtError,
        _rebuild_tensor_v2,
    )

    storage = np.zeros(16, dtype=np.int32)
    # reaches element 19 of a 16-element storage
    with pytest.raises(UnsupportedPtError):
        _rebuild_tensor_v2(storage, 4, (4, 4), (4, 1))
    # offset alone out of range (scalar read at index 16)
    with pytest.raises(UnsupportedPtError):
        _rebuild_tensor_v2(storage, 16, (), ())
    # int64-wrapping element count must NOT bypass the check
    with pytest.raises(UnsupportedPtError):
        _rebuild_tensor_v2(storage, 0, (2**32, 2**32), (1, 0))
    # negative strides rejected (torch.save never emits them dense)
    with pytest.raises(UnsupportedPtError):
        _rebuild_tensor_v2(storage, 8, (4,), (-1,))
    # mismatched shape/stride rank
    with pytest.raises(UnsupportedPtError):
        _rebuild_tensor_v2(storage, 0, (4, 4), (4,))
    # and the boundary case that must STILL WORK: exactly-fitting view
    out = _rebuild_tensor_v2(storage, 0, (4, 4), (4, 1))
    assert out.shape == (4, 4)
    # zero-size tensors are fine regardless of strides
    out0 = _rebuild_tensor_v2(storage, 0, (0, 7), (7, 1))
    assert out0.shape == (0, 7)
