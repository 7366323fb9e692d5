"""TPC-H through the native SQL frontend: run_sql(SQL[q]) must produce the
same rows as the hand-built plans (plans.build_query) on identical data.

Reference analog: velox's DuckDB-based QueryPlanner tests run SQL against
hand-built PlanBuilder plans (velox/exec/tests/utils/QueryAssertions.h); here
the SQL planner is native and the hand-built plan is the oracle.
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.connectors.tpch import generate_table
from velox_tpu.connectors.tpch import plans as tpch_plans
from velox_tpu.connectors.tpch import queries as q
from velox_tpu.exec import run_plan
from velox_tpu.sql import run_sql

SF = 0.01
TILE = 1 << 14

# float ratio outputs: compare with tolerance (both paths compute exact
# integer sums; only the final double division differs in expression shape)
APPROX_COLS = {"mkt_share", "avg_yearly", "promo_revenue", "avg_disc",
               "avg_qty", "avg_price"}


def _tables(num):
    cols = q.QUERY_COLUMNS[num]
    return {t: generate_table(t, SF, columns=c) for t, c in cols.items()}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # row order can legitimately differ on sort ties: compare as sorted sets
    cols = [c for c in df.columns if df[c].dtype != object or True]
    return (
        df.sort_values(list(df.columns), kind="mergesort")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("num", sorted(q.SQL))
def test_sql_matches_plan(num):
    tables = _tables(num)
    got = run_sql(q.SQL[num], tables, tile_rows=TILE).to_pandas()
    want = run_plan(
        tpch_plans.build_query(num, tables), tile_rows=TILE
    ).to_pandas()
    if num in tpch_plans.ENGINE_OUTPUT_ORDER:
        want = want[tpch_plans.ENGINE_OUTPUT_ORDER[num]]
    # align column names (SQL texts use the spec's output names)
    assert set(got.columns) >= set(want.columns), (
        got.columns, want.columns,
    )
    got = got[list(want.columns)]
    assert len(got) == len(want), f"Q{num}: {len(got)} vs {len(want)} rows"
    g, w = _normalize(got), _normalize(want)
    for c in want.columns:
        if c in APPROX_COLS or w[c].dtype.kind == "f":
            np.testing.assert_allclose(
                g[c].astype(float), w[c].astype(float), rtol=1e-9,
                err_msg=f"Q{num}.{c}",
            )
        else:
            assert g[c].tolist() == w[c].tolist(), f"Q{num}.{c}"
