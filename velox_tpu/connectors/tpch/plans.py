"""TPC-H physical plan construction.

Reference: velox/exec/tests/utils/TpchQueryBuilder.h:61 — fully-specified
physical plans per query (the engine ships no optimizer, like the reference).
Plans here are the TPU engine's canonical benchmark plans:

* Q1  — scan + pushed date filter + array-mode grouped aggregation (group keys
        are dictionary codes with a static 3x2 range).
* Q3  — customer semi-reduces orders (broadcast-style unique build), orders
        build-side for the lineitem probe, sort-mode grouped agg, top-N.
* Q6  — scan + pushed filters + ungrouped sum.
* Q13 — anti-LIKE pushed to the o_comment dictionary, count-per-customer
        aggregation, probe-preserving left join, distribution aggregation.
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd

from ...exec import run_plan
from ...io.table import Table
from ...plan import PlanBuilder, PlanNode
from . import load_table
from .queries import (
    Q1_COLUMNS,
    Q3_COLUMNS,
    Q6_COLUMNS,
    Q13_COLUMNS,
    q1_oracle,
    q3_oracle,
    q6_oracle,
    q13_oracle,
)


def build_q1(lineitem: Table) -> PlanNode:
    return (
        PlanBuilder()
        .table_scan(
            lineitem,
            columns=Q1_COLUMNS,
            filter="l_shipdate <= date '1998-12-01' - interval '90' day",
        )
        .aggregation(
            ["l_returnflag", "l_linestatus"],
            [
                "sum(l_quantity) as sum_qty",
                "sum(l_extendedprice) as sum_base_price",
                "sum(l_extendedprice * (1 - l_discount)) as sum_disc_price",
                "sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge",
                "avg(l_quantity) as avg_qty",
                "avg(l_extendedprice) as avg_price",
                "avg(l_discount) as avg_disc",
                "count(*) as count_order",
            ],
        )
        .orderby(["l_returnflag", "l_linestatus"])
        .build()
    )


def build_q3(customer: Table, orders: Table, lineitem: Table) -> PlanNode:
    building = (
        PlanBuilder()
        .table_scan(customer, filter="c_mktsegment = 'BUILDING'")
        .project(["c_custkey"])
    )
    orders_build = (
        PlanBuilder()
        .table_scan(orders, filter="o_orderdate < date '1995-03-15'")
        .hash_join(
            building,
            ["o_custkey"],
            ["c_custkey"],
            output=["o_orderkey", "o_orderdate", "o_shippriority"],
            join_type="left_semi",
        )
    )
    return (
        PlanBuilder()
        .table_scan(lineitem, filter="l_shipdate > date '1995-03-15'")
        .hash_join(
            orders_build,
            ["l_orderkey"],
            ["o_orderkey"],
            output=[
                "l_orderkey",
                "l_extendedprice",
                "l_discount",
                "o_orderdate",
                "o_shippriority",
            ],
        )
        .aggregation(
            ["l_orderkey", "o_orderdate", "o_shippriority"],
            ["sum(l_extendedprice * (1 - l_discount)) as revenue"],
        )
        .topn(["revenue desc", "o_orderdate", "l_orderkey"], 10)
        .build()
    )


def build_q6(lineitem: Table) -> PlanNode:
    return (
        PlanBuilder()
        .table_scan(
            lineitem,
            columns=Q6_COLUMNS,
            filter=(
                "l_shipdate >= date '1994-01-01' "
                "and l_shipdate < date '1994-01-01' + interval '365' day "
                "and l_discount between 0.05 and 0.07 and l_quantity < 24"
            ),
        )
        .aggregation([], ["sum(l_extendedprice * l_discount) as revenue"])
        .build()
    )


def build_q13(customer: Table, orders: Table) -> PlanNode:
    counts = (
        PlanBuilder()
        .table_scan(orders, filter="o_comment not like '%special%requests%'")
        .aggregation(["o_custkey"], ["count(*) as cnt"])
    )
    return (
        PlanBuilder()
        .table_scan(customer)
        .hash_join(
            counts,
            ["c_custkey"],
            ["o_custkey"],
            output=["c_custkey", "cnt"],
            join_type="left",
        )
        .project(["coalesce(cnt, 0) as c_count"])
        .aggregation(["c_count"], ["count(*) as custdist"])
        .orderby(["custdist desc", "c_count desc"])
        .build()
    )


def load_query_tables(num: int, sf: float, cache_dir=None) -> Dict[str, Table]:
    kw = {} if cache_dir is None else {"cache_dir": cache_dir}
    if num == 1:
        return {"lineitem": load_table("lineitem", sf, Q1_COLUMNS, **kw)}
    if num == 3:
        return {t: load_table(t, sf, cols, **kw) for t, cols in Q3_COLUMNS.items()}
    if num == 6:
        return {"lineitem": load_table("lineitem", sf, Q6_COLUMNS, **kw)}
    if num == 13:
        return {t: load_table(t, sf, cols, **kw) for t, cols in Q13_COLUMNS.items()}
    raise KeyError(f"query {num} not implemented")


def build_query(num: int, tables: Dict[str, Table]) -> PlanNode:
    if num == 1:
        return build_q1(tables["lineitem"])
    if num == 3:
        return build_q3(tables["customer"], tables["orders"], tables["lineitem"])
    if num == 6:
        return build_q6(tables["lineitem"])
    if num == 13:
        return build_q13(tables["customer"], tables["orders"])
    raise KeyError(f"query {num} not implemented")


def oracle_result(num: int, tables: Dict[str, Table]) -> pd.DataFrame:
    if num == 1:
        return q1_oracle(tables["lineitem"])
    if num == 3:
        return q3_oracle(tables["customer"], tables["orders"], tables["lineitem"])
    if num == 6:
        return q6_oracle(tables["lineitem"])
    if num == 13:
        return q13_oracle(tables["customer"], tables["orders"])
    raise KeyError(f"query {num} not implemented")


ENGINE_OUTPUT_ORDER = {
    # engine column order may differ from the oracle's; map for comparison
    3: ["l_orderkey", "revenue", "o_orderdate", "o_shippriority"],
}


def run_query(num: int, sf: float, tile_rows: int = 1 << 20, stats=None, cache_dir=None):
    """Run a TPC-H query end-to-end; returns (engine_df, oracle_df)."""
    tables = load_query_tables(num, sf, cache_dir=cache_dir)
    plan = build_query(num, tables)
    result = run_plan(plan, tile_rows=tile_rows, stats=stats).to_pandas()
    if num in ENGINE_OUTPUT_ORDER:
        result = result[ENGINE_OUTPUT_ORDER[num]]
    return result.reset_index(drop=True), oracle_result(num, tables)
