"""Timezone functions (utils/tz.py + functions/presto/tzfuncs.py).

Reference analog: velox/type/tz/tests + DateTimeFunctionsTest.cpp — offsets
validated against an independent oracle (Python zoneinfo) across DST
transitions, half-hour zones, and fixed offsets.
"""

import datetime
from zoneinfo import ZoneInfo

import numpy as np
import pytest

import velox_tpu as vt
from velox_tpu.dtypes import RowType, TIMESTAMP
from velox_tpu.exec.runner import run_plan
from velox_tpu.io.table import Table
from velox_tpu.plan import PlanBuilder

US = 1_000_000


def ts_table(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    # +-2000000000s: 1906..2033, covering many DST eras
    ts = rng.integers(-2_000_000_000, 2_000_000_000, n) * np.int64(US)
    return Table(RowType(["ts"], [TIMESTAMP]), {"ts": ts}), ts


def oracle_offsets(ts_us, zone):
    out = []
    for t in ts_us:
        dt = datetime.datetime.fromtimestamp(
            int(t) // US, tz=datetime.timezone.utc
        )
        out.append(
            int(dt.astimezone(ZoneInfo(zone)).utcoffset().total_seconds()) * US
        )
    return np.asarray(out, np.int64)


@pytest.mark.parametrize(
    "zone", ["America/New_York", "Asia/Kolkata", "Australia/Lord_Howe"]
)
def test_at_timezone_matches_zoneinfo(zone):
    t, ts = ts_table()
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project([f"at_timezone(ts, '{zone}') as local"])
        .build()
    )
    expect = ts + oracle_offsets(ts, zone)
    np.testing.assert_array_equal(np.asarray(out.columns["local"]), expect)


def test_to_utc_roundtrip():
    zone = "Europe/Berlin"
    t, ts = ts_table(seed=9)
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project([f"to_utc(at_timezone(ts, '{zone}'), '{zone}') as back"])
        .build()
    )
    back = np.asarray(out.columns["back"])
    # spring-forward gaps / fall-back overlaps are the only legitimate
    # mismatches; they affect <2h per year around 02:00 local
    mismatch = back != ts
    assert mismatch.mean() < 0.002, mismatch.mean()


def test_timezone_hour_minute():
    t, ts = ts_table(seed=4)
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(
            [
                "timezone_hour(ts, 'Asia/Kolkata') as h",
                "timezone_minute(ts, 'Asia/Kolkata') as m",
                "timezone_hour(ts, '-08:00') as h2",
            ]
        )
        .build()
    )
    # Kolkata eras: LMT +5:53, Madras +5:21, war-time +6:30, modern +5:30
    assert set(np.asarray(out.columns["h"]).tolist()) <= {5, 6}
    assert set(np.asarray(out.columns["m"]).tolist()) <= {21, 30, 53}
    assert set(np.asarray(out.columns["h2"]).tolist()) == {-8}


def test_hour_of_local_time_dst_boundary():
    """hour(at_timezone(...)) flips with DST like the reference's
    timestamp-with-timezone hour()."""
    # 2024-03-10 06:30 UTC == 01:30 EST; 07:30 UTC == 03:30 EDT (gap skips 2)
    vals = np.asarray(
        [
            int(datetime.datetime(2024, 3, 10, 6, 30, tzinfo=datetime.timezone.utc).timestamp()),
            int(datetime.datetime(2024, 3, 10, 7, 30, tzinfo=datetime.timezone.utc).timestamp()),
        ],
        np.int64,
    ) * US
    t = Table(RowType(["ts"], [TIMESTAMP]), {"ts": vals})
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(["hour(at_timezone(ts, 'America/New_York')) as h"])
        .build()
    )
    assert np.asarray(out.columns["h"]).tolist() == [1, 3]


def test_from_unixtime_with_zone():
    t = Table(
        RowType(["x"], [vt.BIGINT]),
        {"x": np.asarray([1700000000], np.int64)},
    )
    out = run_plan(
        PlanBuilder()
        .table_scan(t)
        .project(["hour(from_unixtime(x, 'Asia/Tokyo')) as h"])
        .build()
    )
    # 2023-11-14 22:13 UTC -> 07:13 JST
    assert np.asarray(out.columns["h"]).tolist() == [7]


def test_unknown_zone_raises():
    t, _ = ts_table(10)
    with pytest.raises(ValueError, match="unknown timezone"):
        PlanBuilder().table_scan(t).project(
            ["at_timezone(ts, 'Mars/Olympus') as x"]
        )
