"""Test utilities: plan-result assertions + fuzzer re-exports.

Reference: velox/exec/tests/utils/QueryAssertions.h:37 (assertQuery against
a DuckDB oracle) and exec/tests/utils/AssertQueryBuilder.h — here the oracle
is a pandas DataFrame the caller computes independently (DuckDB is
unavailable in this environment; see docs/parity-status.md §2.10).
"""

from __future__ import annotations

from typing import Optional, Sequence

from ..vector.fuzzer import FuzzerOptions, VectorFuzzer

__all__ = [
    "FuzzerOptions",
    "VectorFuzzer",
    "assert_plan_result",
    "run_at_tile_sizes",
]


def assert_plan_result(
    plan,
    expected,
    sort_by: Optional[Sequence[str]] = None,
    tile_rows: int = 1 << 20,
    check_dtype: bool = False,
):
    """Execute a plan and compare against a pandas oracle (assertQuery).

    ``sort_by``: columns to sort both sides by first (unordered queries).
    Returns the engine DataFrame for further checks."""
    import pandas as pd

    from ..exec.runner import LocalExecutor

    got = LocalExecutor(plan, tile_rows=tile_rows).run().to_pandas()
    expect = expected.copy()
    if sort_by:
        got = got.sort_values(list(sort_by)).reset_index(drop=True)
        expect = expect.sort_values(list(sort_by)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        expect.reset_index(drop=True),
        check_dtype=check_dtype,
    )
    return got


def run_at_tile_sizes(plan, tile_sizes=(1 << 10, 1 << 14, 1 << 20)):
    """Execute a plan at several tile sizes and assert identical results —
    the tiling-invariance discipline every exact operator must satisfy
    (reference analog: the fuzzers' plan-equivalence checks)."""
    import pandas as pd

    from ..exec.runner import LocalExecutor

    results = [
        LocalExecutor(plan, tile_rows=t).run().to_pandas() for t in tile_sizes
    ]
    for other in results[1:]:
        pd.testing.assert_frame_equal(results[0], other)
    return results[0]
