"""Property-based codec tests (hypothesis): encode/decode is a bijection for
arbitrary shapes and dtypes (SURVEY.md §5 test plan)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ubparquet_spark.codec import decode_ndarray, encode_ndarray

shapes = st.lists(st.integers(min_value=1, max_value=8), min_size=1, max_size=4)


@given(shape=shapes, seed=st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_float_roundtrip(shape, seed):
    arr = np.random.default_rng(seed).standard_normal(shape)
    flat, s = encode_ndarray(arr)
    assert len(flat) == int(np.prod(shape))
    assert s == list(shape)
    np.testing.assert_array_equal(decode_ndarray(flat, s), arr)


@given(shape=shapes, seed=st.integers(0, 2**32 - 1))
@settings(max_examples=60, deadline=None)
def test_int_roundtrip_dtype_fidelity(shape, seed):
    arr = np.random.default_rng(seed).integers(-(2**62), 2**62, shape, dtype=np.int64)
    flat, s = encode_ndarray(arr)
    back = decode_ndarray(flat, s, dtype=np.int64)
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == np.int64


@given(
    n=st.integers(0, 50),
    k=st.integers(1, 6),
    seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_empty_and_ragged_leading_dim(n, k, seed):
    """(0, k) tensors (empty events) must round-trip too."""
    arr = np.random.default_rng(seed).standard_normal((n, k))
    flat, s = encode_ndarray(arr)
    assert s == [n, k] and len(flat) == n * k
    np.testing.assert_array_equal(decode_ndarray(flat, s), arr)
