"""Pallas grouped-sum kernel (ops/pallas_group_sum.py): exactness in
interpreter mode — negatives, wrap, masks (the chip-side verdict lives in
the module docstring; this TPU stack cannot execute 64-bit pallas operands).
"""

from velox_tpu.ops.pallas_group_sum import selfcheck


def test_grouped_int64_sums_exact_interpret():
    selfcheck(seed=0)
    selfcheck(seed=3, cap=1 << 13, ncols=2, G=3)
