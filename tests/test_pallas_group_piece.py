"""Exactness of the narrow grouped piece-sum kernel (ops/pallas_group_piece)
against numpy, in pallas interpreter mode (the structure itself is
device-probed by scripts/probe_pallas_onehot.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from velox_tpu.ops.pallas_group_piece import (
    BLOCK,
    PIECE_MAX_PALLAS,
    Factor,
    SpecPlan,
    grouped_piece_sums,
    plan_spec,
)


def _np_oracle(cols, gid, plans, G):
    out = []
    for plan in plans:
        v = np.ones(len(gid), dtype=np.int64)
        for f in plan.factors:
            v = v * (f.scale * cols[f.col].astype(np.int64) + f.offset)
        s = np.zeros(G, np.int64)
        live = gid >= 0
        np.add.at(s, gid[live], v[live])
        out.append(s)
    return out


def test_q1_shaped_specs_exact():
    rng = np.random.default_rng(0)
    n = 4 * BLOCK
    G = 6
    ep = rng.integers(90000, 10500000, n).astype(np.int32)  # l_extendedprice
    qty = rng.integers(100, 5001, n).astype(np.int16)
    d = rng.integers(0, 11, n).astype(np.int8)  # l_discount
    t = rng.integers(0, 9, n).astype(np.int8)  # l_tax
    gid = rng.integers(0, G, n).astype(np.int8)
    gid[rng.random(n) < 0.1] = -1  # dead rows

    f_ep = Factor(0, 1, 0, 90000, 10500000)
    f_qty = Factor(1, 1, 0, 100, 5000)
    f_d = Factor(2, 1, 0, 0, 10)
    f_1md = Factor(2, -1, 100, 90, 100)
    f_1pt = Factor(3, 1, 100, 100, 108)
    specs = [
        [f_qty],  # sum(l_quantity)
        [f_ep],  # sum(l_extendedprice) — needs chunking
        [f_ep, f_1md],  # sum(disc_price)
        [f_ep, f_1md, f_1pt],  # sum(charge) — prefix + rest
        [f_d],  # sum(l_discount)
        [],  # count
    ]
    plans = tuple(plan_spec(s, piece_max=PIECE_MAX_PALLAS) for s in specs)
    assert all(p is not None for p in plans)
    assert plans[1].n_chunks > 1  # ep alone must chunk
    assert plans[3].n_prefix == 2 and plans[3].n_chunks > 1

    cols = tuple(jnp.asarray(c) for c in (ep, qty, d, t))
    got = grouped_piece_sums(
        cols, jnp.asarray(gid), plans, G, interpret=True
    )
    exp = _np_oracle([ep, qty, d, t], gid, plans, G)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g), e)


def test_planner_gates():
    # negative bounds -> refused
    assert plan_spec([Factor(0, 1, 0, -5, 10)]) is None
    # single factor beyond int32 -> refused
    assert plan_spec([Factor(0, 1, 0, 0, 1 << 32)]) is None
    # small products stay single-piece
    p = plan_spec([Factor(0, 1, 0, 0, 100), Factor(1, 1, 0, 0, 100)])
    assert p.n_chunks == 1


def test_large_group_pad_and_min_values():
    rng = np.random.default_rng(1)
    n = 2 * BLOCK
    G = 13  # pads to 16
    x = rng.integers(0, 1000, n).astype(np.int16)
    gid = rng.integers(0, G, n).astype(np.int8)
    plans = (
        plan_spec([Factor(0, 1, 0, 0, 999)], piece_max=PIECE_MAX_PALLAS),
        plan_spec([]),
    )
    got = grouped_piece_sums(
        (jnp.asarray(x),), jnp.asarray(gid), plans, G, interpret=True
    )
    exp = _np_oracle([x], gid, plans, G)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g), e)


def test_xla_form_matches():
    from velox_tpu.ops.pallas_group_piece import grouped_piece_sums_xla

    rng = np.random.default_rng(2)
    n = 2 * BLOCK
    G = 6
    ep = rng.integers(90000, 10500000, n).astype(np.int32)
    d = rng.integers(0, 11, n).astype(np.int8)
    t = rng.integers(0, 9, n).astype(np.int8)
    gid = rng.integers(0, G, n).astype(np.int8)
    gid[rng.random(n) < 0.1] = -1
    f_ep = Factor(0, 1, 0, 90000, 10500000)
    f_1md = Factor(1, -1, 100, 90, 100)
    f_1pt = Factor(2, 1, 100, 100, 108)
    plans = (
        plan_spec([f_ep]),
        plan_spec([f_ep, f_1md]),
        plan_spec([f_ep, f_1md, f_1pt]),
        plan_spec([]),
    )
    got = grouped_piece_sums_xla(
        tuple(jnp.asarray(c) for c in (ep, d, t)), jnp.asarray(gid), plans, G
    )
    exp = _np_oracle([ep, d, t], gid, plans, G)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(np.asarray(g), e)
