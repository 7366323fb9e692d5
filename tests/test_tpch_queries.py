"""End-to-end TPC-H parity tests: engine vs exact oracle on identical data.

Mirrors the reference's operator-test topology (plan via PlanBuilder, execute,
diff against an oracle — velox/exec/tests/utils/QueryAssertions.h:37), with the
numpy fixed-point oracle standing in for DuckDB.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.connectors.tpch import generate_table
from velox_tpu.connectors.tpch import plans as tpch_plans
from velox_tpu.connectors.tpch import queries as q
from velox_tpu.exec import run_plan

SF = 0.01
TILE = 1 << 14  # several tiles at this SF, exercising the tile loop


def _tables(num):
    cols = q.QUERY_COLUMNS[num]
    return {t: generate_table(t, SF, columns=c) for t, c in cols.items()}


@pytest.mark.parametrize("num", sorted(tpch_plans.implemented_queries()))
def test_query_parity(num):
    tables = _tables(num)
    plan = tpch_plans.build_query(num, tables)
    result = run_plan(plan, tile_rows=TILE).to_pandas()
    if num in tpch_plans.ENGINE_OUTPUT_ORDER:
        result = result[tpch_plans.ENGINE_OUTPUT_ORDER[num]]
    oracle = tpch_plans.oracle_result(num, tables)
    pd.testing.assert_frame_equal(
        result.reset_index(drop=True), oracle, check_dtype=False
    )


def test_q6_single_tile_equals_multi_tile():
    tables = _tables(6)
    plan = tpch_plans.build_query(6, tables)
    a = run_plan(plan, tile_rows=1 << 22).to_pandas()
    b = run_plan(plan, tile_rows=1 << 12).to_pandas()
    pd.testing.assert_frame_equal(a, b)  # tiling must not change results (exact)


def test_q1_exact_decimal_sums():
    # the engine's decimal sums must be *bit-exact* vs the int64 oracle
    tables = _tables(1)
    plan = tpch_plans.build_query(1, tables)
    result = run_plan(plan, tile_rows=TILE).to_pandas()
    oracle = tpch_plans.oracle_result(1, tables)
    for col in ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge", "count_order"]:
        np.testing.assert_array_equal(
            result[col].to_numpy(), oracle[col].to_numpy(), err_msg=col
        )
