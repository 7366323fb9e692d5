"""Vector-layer tests (encodings, decode, masks, host interop).

Mirrors the reference's vector test strategy (velox/vector/tests/VectorTest.cpp):
every encoding must decode to the same flat view.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu import Batch, Column, Encoding, RowType, StringTable


def test_flat_roundtrip():
    data = np.arange(10, dtype=np.int64)
    col = Column.from_numpy(data, vt.BIGINT)
    assert col.encoding == Encoding.FLAT
    values, validity = col.to_numpy(10)
    np.testing.assert_array_equal(values, data)
    assert validity is None


def test_flat_with_nulls():
    data = np.array([1.5, 2.5, 3.5], dtype=np.float64)
    validity = np.array([True, False, True])
    col = Column.from_numpy(data, vt.DOUBLE, validity)
    values, v = col.to_numpy(3)
    np.testing.assert_array_equal(v, validity)
    np.testing.assert_allclose(values[[0, 2]], data[[0, 2]])


def test_constant_decode():
    col = Column.constant(7, vt.BIGINT)
    values, validity = col.decode(5)
    np.testing.assert_array_equal(np.asarray(values), np.full(5, 7))
    assert validity is None

    null_col = Column.constant(0, vt.BIGINT, is_null=True)
    _, validity = null_col.decode(4)
    np.testing.assert_array_equal(np.asarray(validity), np.zeros(4, dtype=bool))


def test_dictionary_decode_and_null_merge():
    base = Column.flat(
        jnp.asarray([10, 20, 30], dtype=jnp.int64),
        vt.BIGINT,
        validity=jnp.asarray([True, False, True]),
    )
    idx = jnp.asarray([2, 1, 0, 2], dtype=jnp.int32)
    dict_validity = jnp.asarray([True, True, True, False])
    col = Column.dictionary(idx, base, dict_validity)
    values, validity = col.decode(4)
    np.testing.assert_array_equal(np.asarray(values), [30, 20, 10, 30])
    # row1 null via base, row3 null via dictionary layer
    np.testing.assert_array_equal(np.asarray(validity), [True, False, True, False])


def test_gather_composes_dictionary():
    base = Column.flat(jnp.asarray([1, 2, 3], dtype=jnp.int64), vt.BIGINT)
    col = Column.dictionary(jnp.asarray([0, 1, 2, 0], dtype=jnp.int32), base)
    gathered = col.gather(jnp.asarray([3, 2], dtype=jnp.int32))
    assert gathered.encoding == Encoding.DICTIONARY  # index composition, no copy
    values, _ = gathered.decode(2)
    np.testing.assert_array_equal(np.asarray(values), [1, 3])


def test_string_column_roundtrip():
    strings = np.asarray(["apple", "banana", "apple", ""], dtype=object)
    col = Column.from_numpy(strings, vt.VARCHAR)
    values, _ = col.to_numpy(4)
    np.testing.assert_array_equal(values, strings)
    # dedup: 'apple' interned once; '' is the reserved code 0
    assert len(col.strings) == 3


def test_string_table_sort_permutation():
    t = StringTable(["pear", "apple", "mango"])
    ranks = t.sort_permutation()
    decoded_order = sorted(t.values())
    for code, s in enumerate(t.values()):
        assert decoded_order[ranks[code]] == s


def test_batch_selection_and_active_mask():
    schema = RowType(["a", "b"], [vt.BIGINT, vt.DOUBLE])
    batch = Batch.from_numpy(
        schema,
        [np.arange(6, dtype=np.int64), np.linspace(0, 1, 6)],
        capacity=8,
    )
    assert batch.capacity == 8
    assert int(batch.length) == 6
    mask = np.asarray(batch.active_mask())
    np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 1, 0, 0])

    sel = jnp.asarray([True, False] * 4)
    narrowed = batch.with_selection(sel)
    assert int(narrowed.num_active()) == 3
    d = narrowed.to_pydict()
    np.testing.assert_array_equal(d["a"], [0, 2, 4])


def test_batch_through_jit():
    schema = RowType(["x"], [vt.BIGINT])
    batch = Batch.from_numpy(schema, [np.arange(4, dtype=np.int64)])

    @jax.jit
    def double(b: Batch) -> Batch:
        col = b.column("x")
        values, validity = col.decode(b.capacity)
        return b.with_columns(
            b.schema, [Column.flat(values * 2, col.dtype, validity)]
        )

    out = double(batch)
    np.testing.assert_array_equal(out.to_pydict()["x"], [0, 2, 4, 6])


def test_decimal_column():
    t = vt.decimal(12, 2)
    col = Column.flat(jnp.asarray([12345, -50], dtype=jnp.int64), t)
    values, _ = col.to_numpy(2)
    np.testing.assert_allclose(values, [123.45, -0.50])


def test_batch_jit_constant_column():
    schema = RowType(["c"], [vt.BIGINT])
    col = Column.constant(9, vt.BIGINT)
    batch = Batch.make(schema, [col], length=3, capacity=4)

    @jax.jit
    def flatten(b):
        return b.column("c").decode(b.capacity)[0]

    np.testing.assert_array_equal(np.asarray(flatten(batch)), [9, 9, 9, 9])


# ---- SEQUENCE / BIAS encodings (velox SequenceVector / BiasVector,
# vector/VectorEncoding.h:32) ---------------------------------------------

def test_sequence_decode():
    base = Column.from_numpy(np.array([10, 20, 30], dtype=np.int64), vt.BIGINT)
    col = Column.sequence(base, [2, 3, 1], capacity=6)
    assert col.encoding == Encoding.SEQUENCE
    values, validity = col.to_numpy(6)
    np.testing.assert_array_equal(values, [10, 10, 20, 20, 20, 30])
    assert validity is None


def test_sequence_run_nulls():
    base = Column.from_numpy(
        np.array([7, 0, 9], dtype=np.int64),
        vt.BIGINT,
        validity=np.array([True, False, True]),
    )
    col = Column.sequence(base, [1, 2, 2], capacity=5)
    values, validity = col.to_numpy(5)
    np.testing.assert_array_equal(validity, [True, False, False, True, True])
    np.testing.assert_array_equal(values[[0, 3, 4]], [7, 9, 9])


def test_sequence_gather_composes_to_dictionary():
    base = Column.from_numpy(np.array([5, 6], dtype=np.int64), vt.BIGINT)
    col = Column.sequence(base, [3, 3], capacity=6)
    g = col.gather(jnp.asarray([5, 0, 2, 4], dtype=jnp.int32))
    assert g.encoding == Encoding.DICTIONARY  # no materialization
    values, _ = g.to_numpy(4)
    np.testing.assert_array_equal(values, [6, 5, 5, 6])


def test_sequence_varchar():
    table = StringTable()
    codes = table.intern_all(["lo", "hi"])
    base = Column.flat(jnp.asarray(codes), vt.VARCHAR, None, table)
    col = Column.sequence(base, [1, 3], capacity=4)
    values, _ = col.to_numpy(4)
    assert list(values) == ["lo", "hi", "hi", "hi"]


def test_bias_decode():
    bias = 1 << 40
    deltas = np.array([-3, 0, 7], dtype=np.int8)
    col = Column.bias(bias, deltas, vt.BIGINT)
    assert col.encoding == Encoding.BIAS
    values, validity = col.to_numpy(3)
    np.testing.assert_array_equal(values, bias + deltas.astype(np.int64))
    assert validity is None


def test_bias_gather_and_nulls():
    col = Column.bias(
        100,
        np.array([1, 2, 3, 4], dtype=np.int16),
        vt.BIGINT,
        validity=jnp.asarray([True, True, False, True]),
    )
    g = col.gather(jnp.asarray([3, 2, 0], dtype=jnp.int32))
    assert g.encoding == Encoding.BIAS  # deltas gathered, bias kept
    values, validity = g.to_numpy(3)
    np.testing.assert_array_equal(validity, [True, False, True])
    np.testing.assert_array_equal(values[[0, 2]], [104, 101])


def test_fuzzer_sequence_bias_equivalence():
    """Fuzzed SEQUENCE/BIAS columns decode identically to their flat copy
    (the reference's encoding-equivalence discipline, VectorFuzzer.h:81)."""
    from velox_tpu.vector.fuzzer import FuzzerOptions, VectorFuzzer

    fz = VectorFuzzer(
        seed=7,
        options=FuzzerOptions(
            sequence_ratio=0.45, bias_ratio=0.45, dictionary_ratio=0.0,
            constant_ratio=0.0,
        ),
    )
    cap = 64
    seen = set()
    for i in range(20):
        for dtype in (vt.BIGINT, vt.INTEGER, vt.VARCHAR):
            col = fz.column(dtype, cap)
            seen.add(col.encoding)
            flat = fz.flat_copy(col, cap)
            v1, m1 = col.to_numpy(cap)
            v2, m2 = flat.to_numpy(cap)
            live = np.ones(cap, bool) if m1 is None else np.asarray(m1)
            if m1 is None:
                assert m2 is None
            else:
                np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
            np.testing.assert_array_equal(v1[live], v2[live])
    assert Encoding.SEQUENCE in seen and Encoding.BIAS in seen
