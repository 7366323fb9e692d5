"""Batch/table persistence for debugging and fuzzer repro.

Reference: velox/vector/VectorSaver.h + docs/develop/debugging/vector-saver.rst
— persist the exact input of a failing operation to disk so it can be replayed
offline; the expression fuzzer's --repro_persist_path uses it.

Here the payload is the page serde (encoding-exact for this engine: device
batches are flat columns + validity + dictionary, all of which pages carry).
``save_batch`` snapshots a traced-or-concrete Batch to one file; ``load_batch``
reconstitutes it with identical values, validity, and dictionaries.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..io.table import Table
from ..serde.page import deserialize_page, serialize_page
from .column import Batch


def batch_to_table(batch: Batch) -> Table:
    """Materialize a Batch's live rows to a host Table."""
    mask = np.asarray(batch.active_mask())
    cols, tables, validities = {}, {}, {}
    for name, col, dtype in zip(
        batch.schema.names, batch.columns, batch.schema.types
    ):
        values, validity = col.decode(batch.capacity)
        cols[name] = np.asarray(values)[mask]
        if validity is not None:
            validities[name] = np.asarray(validity)[mask]
        if col.strings is not None:
            tables[name] = col.strings
    return Table(batch.schema, cols, tables, validities)


def save_batch(batch: Batch, path: str) -> str:
    """Persist a batch's live rows; returns the path (dirs created)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialize_page(batch_to_table(batch)))
    return path


def save_table(table: Table, path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialize_page(table))
    return path


def load_table(path: str) -> Table:
    with open(path, "rb") as f:
        return deserialize_page(f.read())


def load_batch(path: str, capacity: Optional[int] = None) -> Batch:
    table = load_table(path)
    return table.tile(0, capacity or max(table.num_rows, 1))
