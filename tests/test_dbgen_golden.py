"""Golden validation against the TPC-H specification's published answer set.

Breaks the round-1 parity circularity (engine vs its own oracle on its own
data): connectors/tpch/dbgen.py regenerates ORDERS/LINEITEM bit-identically to
TPC's dbgen (verified: SF1 row count 6,001,215 and every Q1/Q6 aggregate match
the spec's validation answers to the penny), and the ENGINE's Q1/Q6 plans run
over that data must reproduce the published numbers — an artifact nobody in
this repo authored.  Reference: velox/tpch/gen/dbgen (the generator whose
output this matches).
"""

import numpy as np
import pandas as pd
import pytest

from velox_tpu.connectors.tpch import dbgen

SF = 1.0

# TPC-H specification, validation answer set for SF1 (Q1 / Q6)
Q1_GOLDEN = pd.DataFrame(
    {
        "l_returnflag": ["A", "N", "N", "R"],
        "l_linestatus": ["F", "F", "O", "F"],
        "sum_qty": [37734107.0, 991417.0, 74476040.0, 37719753.0],
        "sum_base_price": [
            56586554400.73,
            1487504710.38,
            111701729697.74,
            56568041380.90,
        ],
        "sum_disc_price": [
            53758257134.87,
            1413082168.05,
            106118230307.61,
            53741292684.60,
        ],
        "sum_charge": [
            55909065222.83,
            1469649223.19,
            110367043872.50,
            55889619119.83,
        ],
        "count_order": [1478493, 38854, 2920374, 1478870],
    }
)
Q6_GOLDEN = 123141078.23


@pytest.fixture(scope="module")
def raw():
    return dbgen.gen_orders_lineitem(SF)


def test_row_counts(raw):
    assert len(raw["lineitem"]["l_orderkey"]) == 6_001_215
    assert len(raw["orders"]["o_orderkey"]) == 1_500_000


def test_engine_q6_matches_published_answer(raw):
    from velox_tpu.connectors.tpch.plans import build_q6
    from velox_tpu.connectors.tpch.queries import Q6_COLUMNS
    from velox_tpu.exec.runner import LocalExecutor

    t = dbgen.lineitem_table(SF, columns=Q6_COLUMNS, _raw=raw["lineitem"])
    out = LocalExecutor(build_q6(t), tile_rows=1 << 20).run().to_pandas()
    assert round(float(out["revenue"][0]), 2) == Q6_GOLDEN


def test_engine_q1_matches_published_answer(raw):
    from velox_tpu.connectors.tpch.plans import build_q1
    from velox_tpu.connectors.tpch.queries import Q1_COLUMNS
    from velox_tpu.exec.runner import LocalExecutor

    t = dbgen.lineitem_table(SF, columns=Q1_COLUMNS, _raw=raw["lineitem"])
    out = LocalExecutor(build_q1(t), tile_rows=1 << 20).run().to_pandas()
    out = out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(
        drop=True
    )
    got = out[
        [
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "count_order",
        ]
    ].copy()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"):
        got[c] = got[c].astype(float).round(2)
    pd.testing.assert_frame_equal(got, Q1_GOLDEN, check_dtype=False)


def test_unifint_bit_exactness():
    """Spot-check the Park-Miller stream against hand-advanced values."""
    s = 209208115  # L_QTY seed
    vals = []
    x = s
    for _ in range(10):
        x = (x * 16807) % 2147483647
        vals.append(int((x / 2147483647.0) * 50) + 1)
    got = dbgen._unif(
        dbgen._seed_at(s, np.arange(1, 11, dtype=np.int64)), 1, 50
    )
    np.testing.assert_array_equal(got, vals)


# ---------------------------------------------------------------------------
# Round-3 extension: customer/part/supplier/partsupp + the dbgen text pool
# are now bit-exact too (validated against the reference generator compiled
# out-of-tree).  Q3 is free-text-independent, so the engine must reproduce
# the TPC-H specification's OFFICIAL SF1 validation answer.  Q13 depends on
# o_comment, and the reference's dbgen fork uses a 10 MB text pool (classic
# TPC dbgen: 300 MB — DBGenIterator.cpp:38), so its comments deviate from the
# classic tool; the Q13 golden below is therefore the REFERENCE GENERATOR'S
# own answer (computed from its compiled output, an artifact this repo's
# authors did not write), not the spec answer set.

# TPC-H specification validation answer, SF1 Q3 (top 10)
Q3_GOLDEN = [
    (2456423, 406181.0111, "1995-03-05", 0),
    (3459808, 405838.6989, "1995-03-04", 0),
    (492164, 390324.0610, "1995-02-19", 0),
    (1188320, 384537.9359, "1995-03-09", 0),
    (2435712, 378673.0558, "1995-02-26", 0),
    (4878020, 378376.7952, "1995-03-12", 0),
    (5521732, 375153.9215, "1995-03-13", 0),
    (2628192, 373133.3094, "1995-02-22", 0),
    (993600, 371407.4595, "1995-03-05", 0),
    (2300070, 367371.1452, "1995-03-13", 0),
]

Q13_GOLDEN = [
    (0, 50004),
    (10, 6668),
    (9, 6563),
    (11, 6004),
    (8, 5890),
    (12, 5600),
    (13, 5029),
    (19, 4805),
    (7, 4680),
    (18, 4531),
    (20, 4507),
    (14, 4473),
    (15, 4463),
    (17, 4445),
    (16, 4410),
    (21, 4168),
    (22, 3742),
    (6, 3273),
    (23, 3189),
    (24, 2700),
    (25, 2090),
    (5, 1957),
    (26, 1653),
    (27, 1177),
    (4, 1010),
    (28, 901),
    (29, 564),
    (3, 408),
    (30, 378),
    (31, 242),
    (32, 133),
    (2, 128),
    (33, 72),
    (34, 52),
    (35, 32),
    (36, 20),
    (1, 20),
    (37, 8),
    (38, 4),
    (41, 3),
    (40, 3),
    (39, 1),
]


def test_engine_q3_matches_published_answer():
    from velox_tpu.connectors.tpch import dbgen
    from velox_tpu.connectors.tpch.plans import build_q3
    from velox_tpu.exec.runner import LocalExecutor

    cust = dbgen.table("customer", SF, ["c_custkey", "c_mktsegment"])
    orders = dbgen.table(
        "orders", SF, ["o_orderkey", "o_custkey", "o_orderdate", "o_shippriority"]
    )
    li = dbgen.table(
        "lineitem", SF,
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    out = LocalExecutor(build_q3(cust, orders, li), tile_rows=1 << 20).run()
    df = out.to_pandas()
    dates = pd.to_datetime(
        df["o_orderdate"].astype("int64"), unit="D", origin="1970-01-01"
    ).dt.strftime("%Y-%m-%d")
    got = [
        (
            int(r.l_orderkey),
            round(float(r.revenue), 4),
            d,
            int(r.o_shippriority),
        )
        for r, d in zip(df.itertuples(), dates)
    ]
    assert got == Q3_GOLDEN


def test_engine_q13_matches_reference_generator():
    from velox_tpu.connectors.tpch import dbgen
    from velox_tpu.connectors.tpch.plans import build_q13
    from velox_tpu.exec.runner import LocalExecutor

    cust = dbgen.table("customer", SF, ["c_custkey"])
    orders = dbgen.table("orders", SF, ["o_custkey", "o_comment"])
    out = LocalExecutor(build_q13(cust, orders), tile_rows=1 << 20).run()
    df = out.to_pandas()
    got = [(int(r.c_count), int(r.custdist)) for r in df.itertuples()]
    assert got == Q13_GOLDEN


def test_text_pool_prefix():
    """First bytes of the 10 MB pool, pinned from the reference generator."""
    from velox_tpu.connectors.tpch import dbgen

    assert dbgen.text_pool()[:66] == (
        b"furiously special foxes haggle furiously blithely ironic deposits."
    )[:66]
