"""velox_tpu — a TPU-native vectorized query-execution engine.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the reference engine
(Velox, a C++ vectorized execution library; see SURVEY.md).  Not a port: pipelines
compile to shape-stable XLA programs over HBM-resident column vectors; distribution
is a device mesh with collective exchange instead of serialized shuffles.

Layering (mirrors SURVEY.md §1, re-expressed TPU-first):

  dtypes         logical types -> fixed-width device representations
  vector         fixed-capacity columnar batches (flat/dict/const + validity + masks)
  expr           typed expression IR compiled into jaxprs
  functions      Presto-semantic scalar/aggregate function packages
  plan           plan nodes + PlanBuilder (fully-specified physical plans, no SQL)
  exec           plan -> pipelines -> jitted tile programs; Task orchestration
  ops            compute kernels (masked reductions, sort, hash, partition; Pallas)
  parallel       device mesh, distributed exchange via collectives
  io / connectors  host-side ingestion (Arrow/Parquet), TPC-H generator
  serde          row/page wire formats for external interchange
"""

import os

import jax

# DOUBLE/BIGINT columns need real float64/int64 end-to-end; without x64 JAX silently
# downcasts, which breaks row-exact parity with the reference.
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the remote TPU compiler costs tens of
# seconds per program; caching compiled executables across processes cuts
# repeat-run latency ~6x (measured).  Override dir via VELOX_TPU_XLA_CACHE.
_cache_dir = os.environ.get(
    "VELOX_TPU_XLA_CACHE",
    os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "velox_tpu",
        "xla_cache",
    ),
)
try:
    # honor a pre-import jax.config.update("jax_platforms", "cpu") too —
    # the env var alone misses it and a CPU process would then load
    # TPU-session AOT entries compiled for another host profile
    _platforms = jax.config.jax_platforms or os.environ.get(
        "JAX_PLATFORMS", ""
    )
except Exception:
    _platforms = os.environ.get("JAX_PLATFORMS", "")
if (
    _cache_dir
    and _cache_dir != "off"
    # only for TPU-bound processes: CPU AOT cache entries are machine-profile
    # specific and can SIGILL when shared across hosts
    and ("cpu" not in _platforms.split(",")[:1])
):
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache EVERYTHING: through the remote-compile tunnel even a tiny
        # glue program costs 0.3-0.6 s, and a query builds dozens of them —
        # at the default 1.0 s threshold they re-compiled every process and
        # dominated executor build time (measured round 5: 13 sub-second
        # compiles = 7.5 s of Q3's 17 s cold build)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
    except Exception:  # older jax without the knob
        pass

from . import dtypes  # noqa: E402
from .dtypes import (  # noqa: E402,F401
    BIGINT,
    BOOLEAN,
    DATE,
    DOUBLE,
    INTEGER,
    REAL,
    SMALLINT,
    TIMESTAMP,
    TINYINT,
    UNKNOWN,
    VARBINARY,
    VARCHAR,
    DataType,
    RowType,
    TypeKind,
    decimal,
)
from .vector import Batch, Column, Encoding, StringTable  # noqa: E402,F401
from .functions import presto as _presto_functions  # noqa: E402,F401  (registers fns)
from .functions import spark as _spark_functions  # noqa: E402,F401  (registers fns)


def run_sql(sql, catalog, tile_rows=None):
    """Plan + execute a SQL SELECT over host Tables (sql/planner.py)."""
    from .sql import run_sql as _run

    return _run(sql, catalog, tile_rows)


def run_plan(plan, tile_rows=1 << 20):
    """Execute a PlanNode on the default backend (exec/runner.py)."""
    from .exec.runner import run_plan as _run

    return _run(plan, tile_rows)


__version__ = "0.1.0"
