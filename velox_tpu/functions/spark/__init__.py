"""Spark-semantic function package.

Importing registers the Spark-specific scalar functions into the default
registry (reference: velox/functions/sparksql/Register.cpp).  Functions whose
semantics match the Presto package (abs, length, concat, ...) are shared —
the reference similarly reuses lib/ implementations across packages.
"""

from . import scalar  # noqa: F401

scalar.register_all()
