"""Native packing library: builds, matches numpy/jnp semantics exactly."""

import numpy as np
import pytest
import jax.numpy as jnp

from smoothquant_tpu.quant import core
from smoothquant_tpu.utils import native


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_library_builds():
    assert native.available(), "g++ -fopenmp build failed"


def test_group_quant_matches_core(rng):
    w = rng.normal(size=(64, 256)).astype(np.float32)
    q, s = native.group_quant(w, 32, 4)
    qj, sj = core.group_quant_params(jnp.asarray(w), 4, 32)
    np.testing.assert_array_equal(q, np.asarray(qj).reshape(64, 256))
    np.testing.assert_allclose(s, np.asarray(sj).reshape(64, -1), rtol=1e-6)
    assert np.abs(q).max() <= 7


def test_permute_cols(rng):
    w = rng.normal(size=(32, 100)).astype(np.float32)
    perm = rng.permutation(100).astype(np.int32)
    np.testing.assert_array_equal(native.permute_cols(w, perm), w[:, perm])


def test_pack_nibbles_split_roundtrip(rng):
    qt = rng.integers(-8, 8, size=(128, 64)).astype(np.int8)
    packed = native.pack_nibbles_split(qt)
    assert packed.shape == (64, 64)
    # nibbles are stored biased by +8 (kernel unbias rides the accumulator)
    lo = ((packed.astype(np.int16) & 0xF) - 8).astype(np.int8)
    hi = (((packed.astype(np.int16) >> 4) & 0xF) - 8).astype(np.int8)
    np.testing.assert_array_equal(lo, qt[:64])
    np.testing.assert_array_equal(hi, qt[64:])


def test_pack_nibbles_native_matches_fallback(rng):
    qt = rng.integers(-8, 8, size=(64, 32)).astype(np.int8)
    native_out = native.pack_nibbles_split(qt)
    lo = (qt[:32].astype(np.int16) + 8).astype(np.uint8) & 0x0F
    hi = ((qt[32:].astype(np.int16) + 8).astype(np.uint8) & 0x0F) << 4
    np.testing.assert_array_equal(native_out, (lo | hi).astype(np.int8))


def test_pack_nibbles_matches_device_pack(rng):
    from smoothquant_tpu.kernels.pack import (
        _nibble_pack_device,
        unpack_nibbles_to_int8,
    )

    qt = rng.integers(-7, 8, size=(96, 16)).astype(np.int8)
    dev = np.asarray(_nibble_pack_device(jnp.asarray(qt)))
    np.testing.assert_array_equal(dev, native.pack_nibbles_split(qt))
    np.testing.assert_array_equal(
        np.asarray(unpack_nibbles_to_int8(jnp.asarray(dev))), qt)


def test_transpose(rng):
    for dtype in (np.int8, np.float32):
        a = rng.integers(-100, 100, size=(65, 130)).astype(dtype)
        np.testing.assert_array_equal(native.transpose(a), a.T)
