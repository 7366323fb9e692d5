"""Mask→dense compaction (the TPU form of filter result materialization).

Reference: the reference produces dictionary-wrapped vectors after filters
(velox/exec/FilterProject.cpp); here filters narrow a boolean selection mask and
this kernel produces the dense permutation when an operator boundary needs
density (exchange, join build, output).

A stable dense gather: indices of selected rows first (in order), padding rows
after.  Uses argsort on the inverted mask — XLA lowers this to a single sort, no
host round-trip, and it is shape-stable.
"""

from __future__ import annotations

from typing import Tuple

import dataclasses
import jax
import jax.numpy as jnp

from ..vector.column import Batch


def compaction_indices(mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Returns (perm, count): perm is a stable permutation putting selected rows
    first; count is the number selected."""
    # stable argsort of ~mask: False (selected) sorts before True, order kept
    perm = jnp.argsort(~mask, stable=True)
    return perm.astype(jnp.int32), jnp.sum(mask).astype(jnp.int32)


def compact(batch: Batch) -> Batch:
    """Densify a batch: live rows first, selection cleared, length=num_active."""
    mask = batch.active_mask()
    perm, count = compaction_indices(mask)
    cols = tuple(c.gather(perm).flatten(batch.capacity) for c in batch.columns)
    return dataclasses.replace(
        batch, columns=cols, length=count, selection=None
    )
