"""Substrait plan interchange (reference: velox/substrait/ bidirectional
converters).  Round-trips plans through the protobuf-JSON message shape and
re-executes them; also consumes a hand-written external Substrait plan."""

import json

import numpy as np
import pandas as pd

from velox_tpu.dtypes import BIGINT, DOUBLE, RowType, VARCHAR
from velox_tpu.exec import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.substrait import from_substrait, to_substrait
from velox_tpu.vector.string_table import StringTable


def tables():
    st = StringTable()
    t = Table(
        RowType(["k", "x", "s"], [BIGINT, DOUBLE, VARCHAR]),
        {
            "k": np.array([1, 2, 1, 3], np.int64),
            "x": np.array([1.5, 2.5, 3.5, 4.5]),
            "s": st.intern_all(["a", "b", "a", "c"]),
        },
        {"s": st},
    )
    r = Table(
        RowType(["rk", "ry"], [BIGINT, BIGINT]),
        {"rk": np.array([1, 3], np.int64), "ry": np.array([100, 300], np.int64)},
    )
    return t, r


def roundtrip(plan, catalog):
    blob = json.dumps(to_substrait(plan))  # must be pure JSON
    return from_substrait(json.loads(blob), catalog)


def test_filter_project_agg_roundtrip():
    t, _ = tables()
    plan = (
        PlanBuilder()
        .table_scan(t)
        .filter("k < 3")
        .project(["k", "x * 2.0 as y"])
        .aggregation(["k"], ["sum(y) as s", "count(y) as c"])
        .build()
    )
    catalog = {plan_scan_name(plan): t}
    plan2 = roundtrip(plan, catalog)
    a = run_plan(plan).to_pandas().sort_values("k").reset_index(drop=True)
    b = run_plan(plan2).to_pandas().sort_values("k").reset_index(drop=True)
    np.testing.assert_allclose(a["s"].to_numpy(), b.iloc[:, 1].to_numpy())
    np.testing.assert_array_equal(a["c"].to_numpy(), b.iloc[:, 2].to_numpy())


def plan_scan_name(node):
    while node.sources:
        node = node.sources[0]
    return node.id


def test_join_orderby_roundtrip():
    t, r = tables()
    plan = (
        PlanBuilder()
        .table_scan(t)
        .hash_join(
            PlanBuilder().table_scan(r).build(),
            ["k"],
            ["rk"],
            output=["k", "x", "ry"],
        )
        .orderby(["k"])
        .build()
    )
    # find both scan ids for the catalog
    scans = {}

    def walk(n):
        for s in n.sources:
            walk(s)
        if not n.sources:
            scans[n.id] = n.table

    walk(plan)
    plan2 = roundtrip(plan, scans)
    a = run_plan(plan).to_pandas().reset_index(drop=True)
    b = run_plan(plan2).to_pandas().reset_index(drop=True)
    np.testing.assert_array_equal(a["k"].to_numpy(), b["k"].to_numpy())
    np.testing.assert_array_equal(a["ry"].to_numpy(), b["ry"].to_numpy())


def test_external_substrait_plan():
    """A Substrait plan as another producer would emit it (hand-written)."""
    t, _ = tables()
    plan = {
        "extensionUris": [{"extensionUriAnchor": 1, "uri": "x"}],
        "extensions": [
            {"extensionFunction": {"functionAnchor": 7, "name": "gt:any_any"}},
            {"extensionFunction": {"functionAnchor": 8, "name": "sum:fp64"}},
        ],
        "relations": [
            {
                "root": {
                    "input": {
                        "aggregate": {
                            "input": {
                                "filter": {
                                    "input": {
                                        "read": {
                                            "baseSchema": {
                                                "names": ["k", "x", "s"],
                                                "struct": {
                                                    "types": [
                                                        {"i64": {}},
                                                        {"fp64": {}},
                                                        {"string": {}},
                                                    ]
                                                },
                                            },
                                            "namedTable": {"names": ["t"]},
                                        }
                                    },
                                    "condition": {
                                        "scalarFunction": {
                                            "functionReference": 7,
                                            "outputType": {"bool": {}},
                                            "arguments": [
                                                {
                                                    "value": {
                                                        "selection": {
                                                            "directReference": {
                                                                "structField": {"field": 0}
                                                            },
                                                            "rootReference": {},
                                                        }
                                                    }
                                                },
                                                {"value": {"literal": {"i64": "1"}}},
                                            ],
                                        }
                                    },
                                }
                            },
                            "groupings": [{"groupingExpressions": []}],
                            "measures": [
                                {
                                    "measure": {
                                        "functionReference": 8,
                                        "outputType": {"fp64": {}},
                                        "arguments": [
                                            {
                                                "value": {
                                                    "selection": {
                                                        "directReference": {
                                                            "structField": {"field": 1}
                                                        },
                                                        "rootReference": {},
                                                    }
                                                }
                                            }
                                        ],
                                    }
                                }
                            ],
                        }
                    },
                    "names": ["total"],
                }
            }
        ],
    }
    node = from_substrait(plan, {"t": t})
    out = run_plan(node).to_pandas()
    # k > 1 -> rows x = 2.5, 4.5
    assert out.iloc[0, 0] == 7.0
