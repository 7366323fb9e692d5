"""Canonical shared sort programs (ops/shared_sort.py) — the split-dispatch
architecture's sort kernel cache (see docs/execution-model.md)."""

import numpy as np
import pytest

import jax.numpy as jnp

from velox_tpu.ops.shared_sort import (
    _BUCKETS,
    payload_bucket,
    shared_sort_ops,
    shared_sort_word,
)


def test_payload_bucket():
    assert payload_bucket(0) == 0
    assert payload_bucket(1) == 1
    assert payload_bucket(3) == 4
    assert payload_bucket(8) == 8
    with pytest.raises(ValueError):
        payload_bucket(9)


def test_word_sort_with_mixed_payloads():
    rng = np.random.default_rng(0)
    n = 1 << 10
    word = jnp.asarray(rng.permutation(n).astype(np.int64))
    pf = jnp.asarray(rng.normal(size=n))
    pi = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))
    pb = jnp.asarray(rng.integers(0, 2, n).astype(bool))
    s, (sf, si, sb) = shared_sort_word(word, [pf, pi, pb])
    order = np.argsort(np.asarray(word))
    np.testing.assert_array_equal(np.asarray(s), np.sort(np.asarray(word)))
    np.testing.assert_array_equal(np.asarray(sf), np.asarray(pf)[order])
    assert sf.dtype == pf.dtype  # float64 bitcast round-trips exactly
    np.testing.assert_array_equal(np.asarray(si), np.asarray(pi)[order])
    assert si.dtype == pi.dtype
    np.testing.assert_array_equal(np.asarray(sb), np.asarray(pb)[order])
    assert sb.dtype == jnp.bool_


def test_negative_float_payload_roundtrip():
    # bitcast (not astype): negative floats must come back bit-exact
    word = jnp.asarray(np.array([2, 0, 1], np.int64))
    pf = jnp.asarray(np.array([-1.5, np.inf, -0.0]))
    _, (sf,) = shared_sort_word(word, [pf])
    np.testing.assert_array_equal(
        np.asarray(sf), np.array([np.inf, -0.0, -1.5])
    )


def test_multi_key_sort_bool_primary():
    n = 1 << 8
    rng = np.random.default_rng(1)
    dead = rng.integers(0, 2, n).astype(bool)
    key = rng.permutation(n).astype(np.int64)
    rid = np.arange(n, dtype=np.int32)
    (s_dead, s_key), (s_rid,) = shared_sort_ops(
        [jnp.asarray(dead), jnp.asarray(key)], [jnp.asarray(rid)]
    )
    order = np.lexsort((key, dead))
    np.testing.assert_array_equal(np.asarray(s_dead), dead[order])
    np.testing.assert_array_equal(np.asarray(s_key), key[order])
    np.testing.assert_array_equal(np.asarray(s_rid), rid[order])
    assert s_dead.dtype == jnp.bool_


def test_float_keys_rejected():
    with pytest.raises(TypeError, match="order-preserving"):
        shared_sort_ops([jnp.asarray(np.array([1.0, 2.0]))], [])


def test_program_cache_shared():
    from velox_tpu.ops import shared_sort as ss

    n = 1 << 9
    w = jnp.arange(n, dtype=jnp.int64)
    before = len(ss._PROGRAMS)
    shared_sort_word(w, [w])
    shared_sort_word(w, [w + 1])  # same signature -> same program
    after = len(ss._PROGRAMS)
    assert after == before + 1


def test_float32_payload_roundtrip():
    # round-4 advisor (high): float32 payloads used to fall through to
    # astype(int64), silently truncating the fraction; they must ride as
    # 32-bit bitcasts and come back bit-exact
    word = jnp.asarray(np.array([2, 0, 1], np.int64))
    pf = jnp.asarray(np.array([1.5, -2.25, 0.75], np.float32))
    _, (sf,) = shared_sort_word(word, [pf])
    assert sf.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(sf), np.array([-2.25, 0.75, 1.5], np.float32)
    )
    # and through the multi-key form
    (s_key,), (sf2,) = shared_sort_ops([word], [pf])
    np.testing.assert_array_equal(
        np.asarray(sf2), np.array([-2.25, 0.75, 1.5], np.float32)
    )


def test_uint64_payload_roundtrip():
    word = jnp.asarray(np.array([1, 0], np.int64))
    pu = jnp.asarray(np.array([2**63 + 5, 7], np.uint64))
    _, (su,) = shared_sort_word(word, [pu])
    assert su.dtype == jnp.uint64
    np.testing.assert_array_equal(
        np.asarray(su), np.array([7, 2**63 + 5], np.uint64)
    )
