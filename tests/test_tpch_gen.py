"""TPC-H generator sanity tests (cardinalities, distributions, determinism)."""

import numpy as np

from velox_tpu.connectors.tpch import generate_table
from velox_tpu.connectors.tpch import queries as q

SF = 0.001


def test_cardinalities():
    assert generate_table("region", SF).num_rows == 5
    assert generate_table("nation", SF).num_rows == 25
    assert generate_table("customer", SF).num_rows == 150
    assert generate_table("orders", SF).num_rows == 1500
    li = generate_table("lineitem", SF, columns=["l_orderkey"])
    # ~4 lines per order
    assert 1500 * 1 <= li.num_rows <= 1500 * 7


def test_value_ranges():
    li = generate_table("lineitem", SF)
    c = li.columns
    assert c["l_quantity"].min() >= 100 and c["l_quantity"].max() <= 5000
    assert c["l_discount"].min() >= 0 and c["l_discount"].max() <= 10
    assert c["l_tax"].min() >= 0 and c["l_tax"].max() <= 8
    assert (c["l_receiptdate"] > c["l_shipdate"]).all()
    flags = set(li.string_tables["l_returnflag"].decode(c["l_returnflag"]))
    assert flags <= {"R", "A", "N"}


def test_orderkey_sparsity():
    od = generate_table("orders", SF, columns=["o_orderkey"])
    keys = od.columns["o_orderkey"]
    assert len(np.unique(keys)) == len(keys)
    # keys occupy the low 8 slots of each 32-block
    assert ((keys - 1) % 32 < 8).all()


def test_custkey_skips_every_third():
    od = generate_table("orders", SF, columns=["o_custkey"])
    assert (od.columns["o_custkey"] % 3 != 0).all()


def test_determinism_and_pruning_consistency():
    a = generate_table("lineitem", SF)
    b = generate_table("lineitem", SF, columns=["l_extendedprice", "l_shipdate"])
    np.testing.assert_array_equal(a.columns["l_extendedprice"], b.columns["l_extendedprice"])
    np.testing.assert_array_equal(a.columns["l_shipdate"], b.columns["l_shipdate"])


def test_totalprice_consistent_with_lineitems():
    od = generate_table("orders", SF, columns=["o_orderkey", "o_totalprice"])
    li = generate_table(
        "lineitem", SF, columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"]
    )
    import pandas as pd

    ep = li.columns["l_extendedprice"].astype(np.int64)
    disc_price = (ep * (100 - li.columns["l_discount"]) + 50) // 100
    net = (disc_price * (100 + li.columns["l_tax"]) + 50) // 100
    per_order = pd.Series(net).groupby(li.columns["l_orderkey"]).sum()
    got = pd.Series(od.columns["o_totalprice"], index=od.columns["o_orderkey"])
    pd.testing.assert_series_equal(
        got.sort_index(), per_order.sort_index(), check_names=False
    )


def test_oracles_run():
    li = generate_table("lineitem", SF)
    od = generate_table("orders", SF)
    cu = generate_table("customer", SF)
    r1 = q.q1_oracle(li)
    assert set(r1["l_returnflag"]) <= {"R", "A", "N"} and len(r1) >= 3
    r6 = q.q6_oracle(li)
    assert r6["revenue"].iloc[0] > 0
    r3 = q.q3_oracle(cu, od, li)
    assert (r3["revenue"].values[:-1] >= r3["revenue"].values[1:]).all()
    r13 = q.q13_oracle(cu, od)
    assert r13["custdist"].sum() == cu.num_rows


def test_parquet_roundtrip(tmp_path):
    li = generate_table("lineitem", SF, columns=q.Q6_COLUMNS)
    path = str(tmp_path / "li.parquet")
    li.save_parquet(path)
    from velox_tpu.io.table import Table

    back = Table.load_parquet(path)
    assert back.schema == li.schema
    for c in q.Q6_COLUMNS:
        np.testing.assert_array_equal(back.columns[c], li.columns[c])
