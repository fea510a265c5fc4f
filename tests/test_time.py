"""Time scale tests (Epoch/Duration, hifitime-subset parity)."""

import math

from nyx_tpu.time import Duration, Epoch, Unit, tai_minus_utc


def test_j2000_roundtrips():
    e = Epoch.from_tai_seconds_j2000(0.0)
    assert e.to_jde_tai() == 2_451_545.0
    assert e.to_tt_seconds() == 32.184
    y, mo, d, h, mi, s = e.to_gregorian("TAI")
    assert (y, mo, d, h, mi) == (2000, 1, 1, 12, 0)
    assert abs(s) < 1e-9


def test_leap_seconds():
    # J2000: TAI-UTC = 32 s
    e = Epoch.from_tai_seconds_j2000(0.0)
    assert e.to_tai_seconds() - e.to_utc_seconds() == 32.0
    # After 2017-01-01: 37 s
    e2 = Epoch.from_gregorian_utc(2020, 6, 1)
    assert e2.to_tai_seconds() - e2.to_utc_seconds() == 37.0
    # Before 1999: 31 s mid-1997
    e3 = Epoch.from_gregorian_utc(1998, 1, 2)
    assert e3.to_tai_seconds() - e3.to_utc_seconds() == 31.0


def test_gregorian_roundtrip():
    e = Epoch.from_gregorian_utc(2023, 11, 16, 13, 35, 30.5)
    y, mo, d, h, mi, s = e.to_gregorian("UTC")
    assert (y, mo, d, h, mi) == (2023, 11, 16, 13, 35)
    assert abs(s - 30.5) < 1e-6


def test_str_parse():
    e = Epoch.from_str("2020-01-01T00:00:00 UTC")
    assert e == Epoch.from_gregorian_utc(2020, 1, 1)
    e2 = Epoch.from_str("2020-01-01 12:30:15.25 TAI")
    y, mo, d, h, mi, s = e2.to_gregorian("TAI")
    assert (h, mi, s) == (12, 30, 15.25)


def test_tdb_offset_magnitude():
    # TDB-TT is a ~1.6 ms periodic term
    e = Epoch.from_gregorian_utc(2010, 3, 14)
    dt = e.to_tdb_seconds() - e.to_tt_seconds()
    assert abs(dt) < 2e-3
    # round trip through TDB constructor
    e2 = Epoch.from_tdb_seconds_j2000(e.to_tdb_seconds())
    assert abs((e2 - e).to_seconds()) < 1e-9


def test_duration_arithmetic():
    d = Duration.from_days(1.0)
    assert d.to_seconds() == 86400.0
    assert (d / 2).to_seconds() == 43200.0
    e = Epoch.from_gregorian_tai(2021, 1, 1)
    assert ((e + d) - e).to_seconds() == 86400.0
    assert (e + 1 * Unit.Day) == e + d


def test_epoch_two_part_precision():
    # adding many small durations must not lose precision catastrophically
    e = Epoch.from_gregorian_tai(2021, 1, 1)
    x = e
    for _ in range(1000):
        x = x + 0.1
    assert abs((x - e).to_seconds() - 100.0) < 1e-9
