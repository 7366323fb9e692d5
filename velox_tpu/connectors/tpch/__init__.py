"""TPC-H connector: on-the-fly generated, parquet-cached tables.

Reference: velox/connectors/tpch/TpchConnector.h:24 (a Connector whose DataSource
generates TPC-H rows on demand, backed by dbgen).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Sequence

from ...io.cache import cached_load_parquet
from ...io.table import Table
from .gen import SCHEMAS, TABLE_NAMES, generate_table

_DEFAULT_CACHE = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")), "velox_tpu"
)


def load_table(
    name: str,
    sf: float = 1.0,
    columns: Optional[Sequence[str]] = None,
    cache_dir: Optional[str] = _DEFAULT_CACHE,
) -> Table:
    """Generate (or load from the parquet cache) a TPC-H table, column-pruned."""
    if columns is not None:
        columns = list(columns)
    if cache_dir is None:
        return generate_table(name, sf, columns)
    os.makedirs(cache_dir, exist_ok=True)
    col_key = ",".join(columns) if columns else "*"
    digest = hashlib.sha1(col_key.encode()).hexdigest()[:10]
    path = os.path.join(cache_dir, f"{name}_sf{sf:g}_{digest}.parquet")
    if os.path.exists(path):
        try:
            # host-RAM cache fronting the parquet file (io/cache.py)
            return cached_load_parquet(path, columns)
        except Exception:
            os.unlink(path)
    table = generate_table(name, sf, columns)
    try:
        table.save_parquet(path)
    except Exception:
        if os.path.exists(path):
            os.unlink(path)
    return table


__all__ = ["SCHEMAS", "TABLE_NAMES", "generate_table", "load_table"]
