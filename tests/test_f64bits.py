"""Tests for the platform-dependent float-bits codec (ops/f64bits.py).

These run on the CPU backend (conftest), where the word is the real IEEE
bit pattern — the oracle is numpy's bit view.  The TPU pair branch is
exercised by the on-device smoke suite (scripts/device_smoke.py) and, for
trace coverage, via jax.jit lowering of the pair functions here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from velox_tpu.ops import f64bits


def _np_bits(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float64).view(np.int64)


def _fuzz_doubles(rng, n=4096) -> np.ndarray:
    # uniform over BIT PATTERNS: exercises every binade, subnormals, and
    # specials far better than uniform-over-values
    bits = rng.integers(np.iinfo(np.int64).min, np.iinfo(np.int64).max, n)
    return bits.view(np.float64)


CASES = np.array(
    [0.0, -0.0, 1.0, -1.0, 0.5, 2.0, 1.5, np.pi, -np.pi, 1e300, -1e300,
     1e-300, 5e-324, 2.2250738585072014e-308,
     1.7976931348623157e308, np.inf, -np.inf],
    dtype=np.float64,
)


def test_cpu_word_is_ieee_bits():
    got = np.asarray(f64bits.f64_to_word(jnp.asarray(CASES)))
    np.testing.assert_array_equal(got, _np_bits(CASES))
    back = np.asarray(f64bits.word_to_f64(jnp.asarray(got)))
    np.testing.assert_array_equal(back, CASES)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_roundtrip(seed):
    rng = np.random.default_rng(seed)
    x = _fuzz_doubles(rng)
    got = np.asarray(f64bits.f64_to_word(jnp.asarray(x)))
    want = _np_bits(x)
    ok = ~np.isnan(x)
    np.testing.assert_array_equal(got[ok], want[ok])
    back = np.asarray(f64bits.word_to_f64(jnp.asarray(want)))
    np.testing.assert_array_equal(back[ok], x[ok])
    assert np.isnan(back[~ok]).all()


def test_ordered_key_matches_float_order():
    rng = np.random.default_rng(7)
    x = _fuzz_doubles(rng, 2000)
    x = x[np.isfinite(x)]
    x = np.concatenate([x, [0.0, -0.0, np.inf, -np.inf]])
    key = np.asarray(f64bits.f64_to_ordered(jnp.asarray(x)))
    order = np.argsort(x, kind="stable")
    xs, ks = x[order], key[order]
    assert (np.diff(ks) >= 0).all()
    tie = np.diff(ks) == 0
    assert (xs[1:][tie] == xs[:-1][tie]).all()


def test_nan_sorts_above_inf_and_is_canonical():
    x = jnp.asarray(np.array([np.nan, -np.nan, np.inf, 1e308], np.float64))
    k = np.asarray(f64bits.f64_to_ordered(x))
    assert k[0] == k[1]  # every NaN canonicalizes to one code
    assert k[0] > k[2] > k[3]


def test_pair_branch_traces():
    # the TPU pair encode/decode must at least trace and lower on CPU
    # (platform coverage runs on the chip in the device smoke suite)
    # values exactly representable as an f32 pair (<= 48-bit mantissas)
    x = jnp.asarray(np.array([1.5, -2.25, 123456.75, 2.0**90, 0.0], np.float64))
    w = jax.jit(f64bits._word_pair)(x)
    back = np.asarray(jax.jit(f64bits._unword_pair)(w))
    np.testing.assert_array_equal(back, np.asarray(x))
    k = np.asarray(jax.jit(f64bits._ordered_pair)(x))
    assert (np.argsort(k) == np.argsort(np.asarray(x), kind="stable")).all()


def test_f32_bits_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1000).astype(np.float32) * 1e5
    w = np.asarray(f64bits.f32_to_bits64(jnp.asarray(x)))
    assert w.dtype == np.int64
    back = np.asarray(f64bits.bits64_to_f32(jnp.asarray(w)))
    np.testing.assert_array_equal(back, x)


def test_u64_wrap_roundtrip():
    u = np.array([0, 7, 2**63 + 5, 2**64 - 1], dtype=np.uint64)
    w = np.asarray(f64bits.u64_to_i64(jnp.asarray(u)))
    np.testing.assert_array_equal(w, u.view(np.int64))
    back = np.asarray(f64bits.i64_to_u64(jnp.asarray(w)))
    np.testing.assert_array_equal(back, u)
