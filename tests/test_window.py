"""Window operator tests vs pandas (reference: velox window tests in
functions/prestosql/window/tests)."""

import numpy as np
import pandas as pd
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import RowType
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder
from velox_tpu.exec import run_plan


@pytest.fixture
def data():
    rng = np.random.default_rng(7)
    n = 200
    return pd.DataFrame(
        {
            "g": rng.integers(0, 8, n),
            "o": rng.integers(0, 40, n),
            "v": rng.integers(-50, 50, n),
        }
    )


def table_of(df):
    return Table(
        RowType(list(df.columns), [vt.BIGINT] * len(df.columns)),
        {c: df[c].to_numpy() for c in df.columns},
    )


def run_window(df, calls, order=("g", "o", "v")):
    plan = (
        PlanBuilder()
        .table_scan(table_of(df))
        .window(["g"], ["o"], calls)
        .orderby(list(order))
        .build()
    )
    return run_plan(plan).to_pandas()


def test_row_number_rank_dense_rank(data):
    got = run_window(data, ["row_number() as rn", "rank() as rk", "dense_rank() as dr"])
    df = data.sort_values(["g", "o", "v"]).reset_index(drop=True)
    g = data.groupby("g")["o"]
    expect = data.copy()
    expect["rk"] = g.rank(method="min").astype(np.int64)
    expect["dr"] = g.rank(method="dense").astype(np.int64)
    expect = expect.sort_values(["g", "o", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(got["rk"].to_numpy(), expect["rk"].to_numpy())
    np.testing.assert_array_equal(got["dr"].to_numpy(), expect["dr"].to_numpy())
    # row_number within (g): 1..count, increasing along o
    for key, grp in got.groupby("g"):
        rn = grp.sort_values(["o", "rn"])["rn"].to_numpy()
        assert sorted(rn) == list(range(1, len(grp) + 1))


def test_running_sum_range_frame(data):
    got = run_window(data, ["sum(v) as s"])
    # pandas equivalent of RANGE UNBOUNDED PRECEDING..CURRENT ROW with peers:
    # cumulative sum over rows sorted by o, where ties share the total at the
    # last tied row
    rows = []
    for key, grp in data.groupby("g"):
        grp = grp.sort_values("o", kind="stable").copy()
        csum = grp["v"].cumsum()
        peer_total = grp.groupby("o")["v"].transform("sum").groupby(grp["o"]).cumsum()
        # simpler: total of all rows with o <= current o
        totals = [grp.loc[grp["o"] <= o, "v"].sum() for o in grp["o"]]
        grp["s"] = totals
        rows.append(grp)
    expect = (
        pd.concat(rows).sort_values(["g", "o", "v"]).reset_index(drop=True)
    )
    got_sorted = got.sort_values(["g", "o", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(
        got_sorted["s"].to_numpy(), expect["s"].to_numpy()
    )


def test_count_and_avg(data):
    got = run_window(data, ["count(v) as c", "avg(v) as m"])
    for key, grp in got.groupby("g"):
        grp = grp.sort_values(["o", "v"])
        # counts are nondecreasing and end at the partition size
        assert grp["c"].iloc[-1] == len(grp)
        assert (np.diff(grp["c"].to_numpy()) >= 0).all()


def test_lead_lag():
    # unique order keys per partition: lag/lead over ties is nondeterministic
    rng = np.random.default_rng(3)
    rows = []
    for g in range(6):
        o = rng.permutation(30)
        rows.append(pd.DataFrame({"g": g, "o": o, "v": rng.integers(-50, 50, 30)}))
    data = pd.concat(rows).reset_index(drop=True)
    got = run_window(data, ["lag(v) as prev", "lead(v) as nxt"])
    # first row of each partition (in sorted order) has NULL lag
    for key, grp in got.groupby("g"):
        assert pd.isna(grp["prev"].iloc[0])
        assert pd.isna(grp["nxt"].iloc[-1])
        inner_prev = grp["prev"].to_numpy()[1:]
        np.testing.assert_array_equal(
            inner_prev.astype(np.int64), grp["v"].to_numpy()[:-1]
        )


def test_first_last_value(data):
    got = run_window(data, ["first_value(v) as fv", "last_value(v) as lv"])
    for key, grp in got.groupby("g"):
        assert (grp["fv"] == grp["v"].iloc[0]).all()
        assert (grp["lv"] == grp["v"].iloc[-1]).all()


def test_ntile():
    df = pd.DataFrame({"g": [1] * 10, "o": range(10), "v": range(10)})
    got = run_window(df, ["ntile(3) as t"])
    np.testing.assert_array_equal(
        got.sort_values("o")["t"].to_numpy(), [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    )


def test_percent_rank_cume_dist():
    df = pd.DataFrame({"g": [1] * 4, "o": [10, 10, 20, 30], "v": [1, 2, 3, 4]})
    got = run_window(df, ["percent_rank() as pr", "cume_dist() as cd"]).sort_values("v")
    np.testing.assert_allclose(got["pr"].to_numpy(), [0.0, 0.0, 2 / 3, 1.0])
    np.testing.assert_allclose(got["cd"].to_numpy(), [0.5, 0.5, 0.75, 1.0])


def test_nth_value_and_rows_frames():
    import pandas as pd

    t = table_of(
        pd.DataFrame(
            {
                "g": [1, 1, 1, 1, 2, 2, 2],
                "o": [1, 2, 3, 4, 1, 2, 3],
                "v": [10, 20, 30, 40, 5, 6, 7],
            }
        )
    )
    plan = (
        PlanBuilder()
        .table_scan(t)
        .window(
            ["g"], ["o"],
            [
                "nth_value(v, 2) as nv",
                "sum(v) rows between 1 preceding and 1 following as ws",
                "count(v) rows between unbounded preceding and current row as wc",
                "avg(v) rows between 1 preceding and current row as wa",
            ],
        )
        .build()
    )
    out = run_plan(plan).to_pandas().sort_values(["g", "o"]).reset_index(drop=True)
    # nth_value becomes visible once the frame reaches row 2
    assert out["nv"].tolist() == [None, 20, 20, 20, None, 6, 6]
    assert out["ws"].tolist() == [30, 60, 90, 70, 11, 18, 13]
    assert out["wc"].tolist() == [1, 2, 3, 4, 1, 2, 3]
    df = pd.DataFrame({"g": out["g"], "v": [10, 20, 30, 40, 5, 6, 7]})
    expect_wa = (
        df.groupby("g")["v"].rolling(2, min_periods=1).mean().reset_index(drop=True)
    )
    assert out["wa"].tolist() == expect_wa.tolist()


def test_k_bounded_frames_rows_and_range():
    """ROWS min/max via RMQ sparse table; RANGE k bounds via rank merge
    (reference: PlanNode.h:1989 WindowFrame kPreceding/kFollowing)."""
    import numpy as np

    from velox_tpu.dtypes import BIGINT, RowType
    from velox_tpu.exec import run_plan
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder

    t = Table(
        RowType(["g", "o", "x"], [BIGINT, BIGINT, BIGINT]),
        {
            "g": np.array([1, 1, 1, 1, 2, 2], np.int64),
            "o": np.array([1, 2, 5, 6, 1, 9], np.int64),
            "x": np.array([10, 20, 30, 40, 7, 9], np.int64),
        },
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .window(
            ["g"],
            ["o"],
            [
                "min(x) rows between 1 preceding and current row as m1",
                "max(x) rows between current row and 1 following as m2",
                "sum(x) range between 1 preceding and 1 following as rs",
                "min(x) range between 3 preceding and current row as rm",
                "count(x) range between unbounded preceding and 0 following as rc",
            ],
        )
        .build()
    ).to_pandas()
    assert out["m1"].tolist() == [10, 10, 20, 30, 7, 7]
    assert out["m2"].tolist() == [20, 30, 40, 40, 9, 9]
    assert out["rs"].tolist() == [30, 30, 70, 70, 7, 9]
    assert out["rm"].tolist() == [10, 10, 20, 30, 7, 9]
    assert out["rc"].tolist() == [1, 2, 3, 4, 1, 2]


def test_ignore_nulls_lead_lag_first_last():
    import numpy as np
    import pandas as pd

    from velox_tpu.dtypes import BIGINT, RowType
    from velox_tpu.exec import run_plan
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder

    t = Table(
        RowType(["g", "o", "x"], [BIGINT, BIGINT, BIGINT]),
        {
            "g": np.array([1, 1, 1, 1, 1, 2, 2], np.int64),
            "o": np.array([1, 2, 3, 4, 5, 1, 2], np.int64),
            "x": np.array([10, 0, 0, 40, 0, 0, 70], np.int64),
        },
        validities={"x": np.array([1, 0, 0, 1, 0, 0, 1], bool)},
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .window(
            ["g"],
            ["o"],
            [
                "lag(x) ignore nulls as lg",
                "lead(x) ignore nulls as ld",
                "first_value(x) ignore nulls as fv",
                "last_value(x) ignore nulls as lv",
            ],
        )
        .build()
    ).to_pandas()
    norm = lambda c: [None if pd.isna(v) else v for v in c]  # noqa: E731
    assert norm(out["lg"]) == [None, 10, 10, 10, 40, None, None]
    assert norm(out["ld"]) == [40, 40, 40, None, None, 70, None]
    assert norm(out["fv"]) == [10] * 5 + [70] * 2
    assert norm(out["lv"]) == [40] * 5 + [70] * 2


def test_variance_window_aggregates():
    import numpy as np
    import pandas as pd

    from velox_tpu.dtypes import BIGINT, DOUBLE, RowType
    from velox_tpu.exec import run_plan
    from velox_tpu.io.table import Table
    from velox_tpu.plan import PlanBuilder

    t = Table(
        RowType(["g", "o", "x"], [BIGINT, BIGINT, DOUBLE]),
        {
            "g": np.array([1, 1, 1, 2, 2], np.int64),
            "o": np.array([1, 2, 3, 1, 2], np.int64),
            "x": np.array([1.0, 3.0, 5.0, 2.0, 2.0]),
        },
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .window(
            ["g"],
            ["o"],
            [
                "variance(x) as v",
                "stddev_pop(x) as sp",
                "var_pop(x) rows between 1 preceding and current row as vr",
            ],
        )
        .build()
    ).to_pandas()
    norm = lambda c: [None if pd.isna(v) else round(v, 6) for v in c]  # noqa: E731
    assert norm(out["v"]) == [None, 2.0, 4.0, None, 0.0]
    assert norm(out["sp"]) == [0.0, 1.0, round((8 / 3) ** 0.5, 6), 0.0, 0.0]
    assert norm(out["vr"]) == [0.0, 1.0, 1.0, 0.0, 0.0]


def test_multi_tile_window_chunked_partitions():
    """Window input spanning many tiles: whole partitions pack into chunks
    (round 1 raised NotImplementedError past one tile; exec/runner.py
    _materialize_window).  Exactness must not depend on tile size."""
    rng = np.random.default_rng(11)
    n = 60_000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 500, n),
            # unique order keys: RANGE frames treat peers jointly, so a
            # pandas-cumsum oracle needs tie-free ordering
            "o": rng.permutation(n).astype(np.int64),
            "v": rng.integers(-50, 50, n),
        }
    )
    calls = [
        "row_number() as rn",
        "sum(v) as sv",
        "rank() as rk",
    ]
    plan_small = (
        PlanBuilder()
        .table_scan(table_of(df))
        .window(["g"], ["o", "v"], calls)
        .orderby(["g", "o", "v"])
        .build()
    )
    from velox_tpu.exec.runner import LocalExecutor

    small = LocalExecutor(plan_small, tile_rows=4096).run().to_pandas()
    big = LocalExecutor(plan_small, tile_rows=1 << 20).run().to_pandas()
    pd.testing.assert_frame_equal(small, big)
    # oracle spot check: running sum within each partition
    expect = (
        df.sort_values(["g", "o", "v"])
        .assign(sv=lambda d: d.groupby("g")["v"].cumsum())
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(
        small["sv"].to_numpy(), expect["sv"].to_numpy()
    )


def test_multi_tile_window_oversized_partition():
    """One partition larger than the tile gets its own sized program."""
    rng = np.random.default_rng(13)
    n = 20_000
    g = rng.integers(0, 20, n)
    g[: n // 2] = 3  # one partition holds half the input
    df = pd.DataFrame(
        {"g": g, "o": rng.integers(0, 10**6, n), "v": rng.integers(0, 9, n)}
    )
    from velox_tpu.exec.runner import LocalExecutor

    plan = (
        PlanBuilder()
        .table_scan(table_of(df))
        .window(["g"], ["o"], ["row_number() as rn"])
        .orderby(["g", "o"])
        .build()
    )
    out = LocalExecutor(plan, tile_rows=4096).run().to_pandas()
    expect = (
        df.sort_values(["g", "o"])
        .assign(rn=lambda d: d.groupby("g").cumcount() + 1)
        .reset_index(drop=True)
    )
    np.testing.assert_array_equal(out["rn"].to_numpy(), expect["rn"].to_numpy())
