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

import jax

# DOUBLE/BIGINT columns need real float64/int64 end-to-end; without x64 JAX silently
# downcasts, which breaks row-exact parity with the reference.
jax.config.update("jax_enable_x64", True)

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

__version__ = "0.1.0"
