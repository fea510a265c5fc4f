"""Force-model validation: harmonics vs GMAT/Monte, SRP, drag, point masses, STM.

Mirrors the reference's tests/mission_design/orbitaldyn.rs and
tests/propagation/stm.rs strategies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.constants import GM, NAIF
from nyx_tpu.dynamics import (
    Drag,
    Harmonics,
    OrbitalDynamics,
    PointMasses,
    SolarPressure,
    SpacecraftDynamics,
)
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.io.gravity import GravityFieldData
from nyx_tpu.propagators import IntegratorOptions, Propagator

JGM3 = "/root/reference/data/01_planetary/JGM3.cof.gz"
DT = Epoch.from_tai_seconds_j2000(0.0)
LEO = [-2436.45, -2436.45, 6891.037, 5.088_611, -5.088_611, 0.0]


def _prop_1day(dynamics, orbit, opts=None):
    inst = Propagator.rk89(dynamics, opts or IntegratorOptions()).with_state(
        Spacecraft.from_orbit(orbit)
    )
    final = inst.for_duration(86_400.0)
    return np.concatenate([final.orbit.r_km, final.orbit.v_km_s])


def test_j2_pines_vs_closed_form():
    J2 = 1.08262693637e-3
    stor = GravityFieldData.from_j2(
        -J2 / np.sqrt(5.0), mu_km3_s2=398600.4415, radius_km=6378.1363
    )
    h = Harmonics.from_stor(stor)
    r = np.array([[-2436.45, -2436.45, 6891.037], [7000.0, 100.0, 300.0], [42164.0, 0.0, 1.0]])
    acc = np.asarray(h.accel_body_fixed(jnp.asarray(r)))

    def closed(rv):
        x, y, z = rv
        rm = np.linalg.norm(rv)
        k = -1.5 * J2 * 398600.4415 * 6378.1363**2 / rm**4
        zr2 = (z / rm) ** 2
        return k * np.array(
            [(1 - 5 * zr2) * x / rm, (1 - 5 * zr2) * y / rm, (3 - 5 * zr2) * z / rm]
        )

    for i in range(len(r)):
        cf = closed(r[i])
        assert np.abs(acc[i] - cf).max() / np.abs(cf).max() < 1e-12


def test_harmonics_content_equality():
    """Two Harmonics built from identical field data must hash/compare
    equal (shared jit caches), and differ when coefficients differ."""
    J2 = 1.08262693637e-3
    mk = lambda j2: Harmonics.from_stor(
        GravityFieldData.from_j2(
            -j2 / np.sqrt(5.0), mu_km3_s2=398600.4415, radius_km=6378.1363
        )
    )
    a, b, c = mk(J2), mk(J2), mk(J2 * 1.001)
    assert a == b and hash(a) == hash(b)
    assert a != c


def test_val_earth_sph_harmonics_j2_vs_monte():
    # orbitaldyn.rs:860-930 (assert: 2e-2 km, 2e-5 km/s vs Monte)
    monte_gm = 3.986_004_328_969_392e5
    eme2k = Frames.EME2000.with_mu_km3_s2(monte_gm)
    iau = Frames.IAU_EARTH.with_mu_km3_s2(monte_gm)
    h = Harmonics.from_stor(GravityFieldData.from_j2(-0.000_484_169_325_971, iau))
    orbit = Orbit.cartesian(*LEO, DT, eme2k)
    got = _prop_1day(SpacecraftDynamics.new(OrbitalDynamics.from_model(h, eme2k)), orbit)
    truth = np.array(
        [
            -5.751_472_565_170_783e3, 4.721_183_256_208_691e3, 2.046_020_865_167_045e3,
            -7.976_895_830_677_169e-1, -3.656_498_994_998_706, 6.139_616_747_276_084,
        ]
    )
    assert np.linalg.norm(got[:3] - truth[:3]) < 2e-2
    assert np.linalg.norm(got[3:] - truth[3:]) < 2e-5


@pytest.mark.slow
def test_val_earth_sph_harmonics_70x70_vs_gmat():
    # orbitaldyn.rs:1021-1068 (assert: 0.2 km, 1e-3 km/s vs GMAT)
    stor = GravityFieldData.from_cof(JGM3, 70, 70, True, Frames.IAU_EARTH)
    assert stor.mu_km3_s2 == pytest.approx(398600.4415)
    assert stor.radius_km == pytest.approx(6378.1363)
    h = Harmonics.from_stor(stor)
    orbit = Orbit.cartesian(*LEO, DT, Frames.EME2000)
    got = _prop_1day(
        SpacecraftDynamics.new(OrbitalDynamics.from_model(h, Frames.EME2000)), orbit
    )
    truth = np.array(
        [
            -5_751.924_618_076_704, 4_719.386_612_440_923, 2_048.696_011_823_441,
            -0.795_383_404_365_819_8, -3.658_301_183_319_466, 6.138_865_498_487_843,
        ]
    )
    assert np.linalg.norm(got[:3] - truth[:3]) < 0.2
    assert np.linalg.norm(got[3:] - truth[3:]) < 1e-3


def test_point_mass_third_body_accel():
    alm = Almanac()
    dyn = SpacecraftDynamics.new(
        OrbitalDynamics.point_masses([NAIF.MOON, NAIF.SUN], Frames.EME2000)
    )
    ctx = dyn.build_context(DT, 86_400.0, alm)
    eom = dyn.make_eom()
    y = jnp.asarray(np.array([LEO + [1.8, 2.2, 0.0]] * 2))
    p = dict(dry_mass_kg=100.0, srp_area_m2=0.0, drag_area_m2=0.0)
    ydot = np.asarray(eom(jnp.zeros(2), y, ctx, p))
    # two-body accel plus perturbation; compare against hand computation
    r = np.asarray(y[0, 0:3])
    a_tb = -Frames.EME2000.mu * r / np.linalg.norm(r) ** 3
    pert = ydot[0, 3:6] - a_tb
    # Moon+Sun tidal accel at LEO ~ 1e-9..1e-8 km/s^2
    assert 1e-10 < np.linalg.norm(pert) < 1e-7
    # cross-check vs direct formula using the same almanac
    t = DT.to_tdb_seconds()
    expect = np.zeros(3)
    for body, mu in [(NAIF.MOON, GM.MOON), (NAIF.SUN, GM.SUN)]:
        rb = alm.position(body, NAIF.EARTH, np.array([t]))[0]
        d = rb - r
        expect += mu * (d / np.linalg.norm(d) ** 3 - rb / np.linalg.norm(rb) ** 3)
    np.testing.assert_allclose(pert, expect, rtol=1e-6)


def test_srp_accel_direction_and_magnitude():
    alm = Almanac()
    srp = SolarPressure.default(NAIF.EARTH)
    dyn = SpacecraftDynamics(OrbitalDynamics.two_body(), (srp,))
    ctx = dyn.build_context(DT, 86_400.0, alm)
    t = DT.to_tdb_seconds()
    r_sun = alm.position(NAIF.SUN, NAIF.EARTH, np.array([t]))[0]
    u_sun = r_sun / np.linalg.norm(r_sun)
    # spacecraft on the sun side, fully lit
    r_sc = (7000.0 * u_sun)[None, :]
    v = np.zeros((1, 3))
    sc = dict(
        cr=jnp.array([1.8]), cd=jnp.array([2.2]),
        srp_area_m2=2.0, drag_area_m2=0.0, mass_kg=jnp.array([100.0]),
    )
    a = np.asarray(srp.force_per_mass(ctx, jnp.array([t]), jnp.asarray(r_sc), jnp.asarray(v), sc))[0]
    # magnitude: Cr * A/m * flux/c * (AU/d)^2 (Earth near perihelion in Jan)
    au_scale = (149_597_870.7 / np.linalg.norm(r_sun)) ** 2
    expect_mag = 1.8 * (2.0 / 100.0) * (1367.0 / 299_792_458.0) * 1e-3 * au_scale
    assert np.linalg.norm(a) == pytest.approx(expect_mag, rel=2e-2)
    # direction: away from the sun
    assert np.dot(a, u_sun) < 0

    # spacecraft behind the Earth: umbra, zero SRP
    r_sc2 = (-7000.0 * u_sun)[None, :]
    a2 = np.asarray(srp.force_per_mass(ctx, jnp.array([t]), jnp.asarray(r_sc2), jnp.asarray(v), sc))[0]
    assert np.linalg.norm(a2) < expect_mag * 1e-6


def test_drag_exponential_density():
    d = Drag.earth_exp()
    rho = np.asarray(d.density.density(jnp.array([700.0, 788.667])))
    assert rho[0] == pytest.approx(3.614e-13, rel=1e-10)
    assert rho[1] == pytest.approx(3.614e-13 / np.e, rel=1e-6)


def test_drag_decelerates():
    d = Drag.std_atm1976()
    ctx = SpacecraftDynamics(OrbitalDynamics.two_body(), (d,)).build_context(DT, 100.0)
    r = jnp.asarray([[6778.0, 0.0, 0.0]])
    v = jnp.asarray([[0.0, 7.7, 0.0]])
    sc = dict(cr=jnp.array([1.8]), cd=jnp.array([2.2]), srp_area_m2=0.0,
              drag_area_m2=2.0, mass_kg=jnp.array([100.0]))
    a = np.asarray(d.force_per_mass(ctx, jnp.array([0.0]), r, v, sc))[0]
    assert a[1] < 0  # opposes velocity
    assert 1e-12 < abs(a[1]) < 1e-6


def test_stm_vs_finite_difference():
    # tests/propagation/stm.rs pattern: AD STM at least as good as FD STM
    eme2k = Frames.EME2000.with_mu_km3_s2(GM.GMAT_EARTH)
    orbit = Orbit.cartesian(*LEO, DT, eme2k)
    dyn = SpacecraftDynamics.new(OrbitalDynamics.two_body(eme2k))
    opts = IntegratorOptions.with_adaptive_step(0.1, 30.0, 1e-12)

    sc = Spacecraft.from_orbit(orbit).with_stm()
    inst = Propagator.rk89(dyn, opts).with_state(sc)
    final = inst.for_duration(3 * 3600.0)
    stm = final.stm

    # finite differences: perturb each of the 6 orbit components
    base = _prop_final(dyn, orbit, opts, 3 * 3600.0)
    fd = np.zeros((6, 6))
    h = 1e-4
    for j in range(6):
        vec = np.array(LEO, dtype=float)
        vec[j] += h
        pert = _prop_final(dyn, Orbit.cartesian(*vec, DT, eme2k), opts, 3 * 3600.0)
        fd[:, j] = (pert - base) / h
    rel = np.abs(stm[:6, :6] - fd) / np.maximum(np.abs(fd), 1.0)
    assert rel.max() < 2e-3  # FD truncation dominates; AD must sit inside it

    # STM maps a small initial deviation accurately
    dx0 = np.array([1e-3, -2e-3, 1e-3, 1e-6, 2e-6, -1e-6])
    vec = np.array(LEO, dtype=float) + dx0
    pert = _prop_final(dyn, Orbit.cartesian(*vec, DT, eme2k), opts, 3 * 3600.0)
    dx_lin = stm[:6, :6] @ dx0
    err = np.abs((pert - base) - dx_lin)
    assert err[:3].max() < 1e-6  # mm-level linearization agreement


def _prop_final(dyn, orbit, opts, dur):
    inst = Propagator.rk89(dyn, opts).with_state(Spacecraft.from_orbit(orbit))
    f = inst.for_duration(dur)
    return np.concatenate([f.orbit.r_km, f.orbit.v_km_s])


def test_solid_tides_earth_magnitude():
    """LEO solid-tide acceleration is 1e-9..1e-6 km/s^2 and AD-differentiable
    (the reference's test_solid_tides_earth, solid_tides.rs:658-689)."""
    from nyx_tpu.dynamics import SolidTides
    from nyx_tpu.ephem.almanac import Almanac

    tides = SolidTides.earth_moon_system(Frames.IAU_EARTH)
    epoch = Epoch.from_gregorian_utc(2024, 1, 1, 12, 0, 0)
    dyn = SpacecraftDynamics.new(
        OrbitalDynamics.from_model(tides, Frames.EME2000)
    )
    ctx = dyn.build_context(epoch, 60.0, Almanac())
    r = jnp.asarray([[7000.0, 0.0, 0.0]])
    v = jnp.asarray([[0.0, 7.5, 0.0]])
    t = jnp.asarray([epoch.to_tdb_seconds() - float(ctx.epoch0_tdb)])
    acc = np.asarray(tides.accel(ctx, ctx.epoch0_tdb + t, r, v))[0]
    nrm = np.linalg.norm(acc)
    assert 1e-11 < nrm < 1e-6, nrm  # reference asserts (0, 1e-6)

    # gradient via forward AD (replaces the reference's hyperdual gradient)
    grad = jax.jacfwd(
        lambda rr: tides.accel(ctx, ctx.epoch0_tdb + t, rr[None], v)[0]
    )(r[0])
    assert np.all(np.isfinite(np.asarray(grad)))
    assert np.linalg.norm(np.asarray(grad)) > 0.0


def test_mixed_precision_harmonics_validated_leo():
    """The mixed f64/f32 harmonics split stays sub-meter vs full f64 over a
    1-day LEO arc at the benchmark tolerance (the documented validity
    envelope of precision='mixed')."""
    from nyx_tpu.propagators import IntegratorOptions, Propagator

    stor = GravityFieldData.from_cof(JGM3, 21, 21, True, Frames.IAU_EARTH)
    epoch = Epoch.from_gregorian_utc(2021, 3, 4)
    orbit = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch, Frames.EME2000)
    opts = IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9)
    finals = {}
    for prec in ("f64", "mixed"):
        dyn = SpacecraftDynamics.new(
            OrbitalDynamics.from_model(
                Harmonics.from_stor(stor, precision=prec), Frames.EME2000
            )
        )
        inst = Propagator.rk89(dyn, opts).with_state(Spacecraft.from_orbit(orbit))
        finals[prec] = inst.for_duration(86_400.0).orbit.r_km
    diff = np.linalg.norm(finals["f64"] - finals["mixed"])
    assert diff < 1e-3, f"mixed vs f64 diverged by {diff*1e3:.1f} m over 1 day"


def test_split_precision_harmonics_validated_leo():
    """precision='split' (closed-form f64 J2+J3, the rest of the field as
    one f32 recursion on zeroed tables) stays sub-meter vs full f64 over a
    1-day LEO arc with 21x21 gravity + drag + SRP at the benchmark
    tolerance — the validity envelope of the TPU speed split."""
    from nyx_tpu.dynamics import Drag, SolarPressure
    from nyx_tpu.ephem.almanac import Almanac
    from nyx_tpu.propagators import IntegratorOptions, Propagator

    stor = GravityFieldData.from_cof(JGM3, 21, 21, True, Frames.IAU_EARTH)
    epoch = Epoch.from_gregorian_utc(2021, 3, 4)
    orbit = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch, Frames.EME2000)
    sc = Spacecraft.new(orbit, 100.0, 0.0, 2.0, 2.0, 1.8, 2.2)
    opts = IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9)
    alm = Almanac()
    finals = {}
    for prec in ("f64", "split"):
        dyn = SpacecraftDynamics(
            OrbitalDynamics.from_model(
                Harmonics.from_stor(stor, precision=prec), Frames.EME2000
            ),
            (SolarPressure.default(), Drag.earth_exp()),
        )
        inst = Propagator.rk89(dyn, opts).with_state(sc, alm)
        finals[prec] = inst.for_duration(86_400.0).orbit.r_km
    diff = np.linalg.norm(finals["f64"] - finals["split"])
    assert diff < 1e-3, f"split vs f64 diverged by {diff*1e3:.1f} m over 1 day"


def test_j2j3_closed_form_matches_recursion():
    """The f64 closed-form J2+J3 (_j2j3_accel) matches a degree-3-zonal
    recursion evaluation to machine precision (Vallado vector forms)."""
    import jax.numpy as jnp

    from nyx_tpu.dynamics.gravity import _j2j3_accel

    stor = GravityFieldData.from_cof(JGM3, 3, 0, True, Frames.IAU_EARTH)
    full = Harmonics.from_stor(stor, precision="f64")
    split = Harmonics.from_stor(stor, precision="split")
    rng = np.random.default_rng(4)
    r_bf = jnp.asarray(rng.normal(size=(16, 3)) * 1500 + np.array([6000.0, 1000, 3000]))
    a_full = np.asarray(full.accel_body_fixed(r_bf))
    pole = jnp.asarray(np.tile([0.0, 0.0, 1.0], (16, 1)))
    a_low = np.asarray(
        _j2j3_accel(full.mu_km3_s2, full.radius_km, split.j2, split.j3, r_bf, pole)
    )
    a_rest = np.asarray(split.accel_body_fixed(r_bf))
    # body frame: pole == z, so closed form + zeroed-table recursion == full
    err = np.abs(a_full - (a_low + a_rest)).max()
    scale = np.abs(a_full).max()
    assert err < 1e-9 * scale + 1e-18, (err, scale)


def test_shadr_loader(tmp_path):
    """SHADR .tab loader on a format-true generated file (GRAIL header
    style: comma-separated, Fortran D exponents, m^3/s^2 mu in some
    products; io/gravity.rs:137-180 parity). The loaded field must evaluate
    identically to one built directly from the same coefficients."""
    import gzip

    from nyx_tpu.io.gravity import GravityFieldData
    from nyx_tpu.dynamics import Harmonics

    shadr = (
        "   0.17380000000000D+04,  0.49028001000000D+04,"
        "  0.00000000000000D+00,     3,     3,     1,"
        "  0.00000000000000D+00,  0.00000000000000D+00\n"
        "    2,    0, -0.90880000000000D-04,  0.00000000000000D+00,"
        "  0.1D-09,  0.1D-09\n"
        "    2,    1,  0.12340000000000D-07,  0.45600000000000D-08,"
        "  0.1D-09,  0.1D-09\n"
        "    2,    2,  0.34700000000000D-04, -0.18900000000000D-05,"
        "  0.1D-09,  0.1D-09\n"
        "    3,    0, -0.32100000000000D-05,  0.00000000000000D+00,"
        "  0.1D-09,  0.1D-09\n"
        "    3,    1,  0.26300000000000D-04,  0.54200000000000D-05,"
        "  0.1D-09,  0.1D-09\n"
    )
    p = tmp_path / "gggrx_0003.tab.gz"
    with gzip.open(p, "wt") as f:
        f.write(shadr)

    stor = GravityFieldData.from_shadr(p, 3, 3, gunzipped=True,
                                       frame=Frames.IAU_MOON)
    assert stor.radius_km == pytest.approx(1738.0)
    assert stor.mu_km3_s2 == pytest.approx(4902.8001)
    assert stor.c_nm[2, 0] == pytest.approx(-9.088e-5)
    assert stor.s_nm[2, 2] == pytest.approx(-1.89e-6)
    assert stor.c_nm[3, 1] == pytest.approx(2.63e-5)

    direct = GravityFieldData(
        c_nm=stor.c_nm.copy(), s_nm=stor.s_nm.copy(),
        mu_km3_s2=stor.mu_km3_s2, radius_km=stor.radius_km,
        frame=Frames.IAU_MOON,
    )
    r_bf = jnp.asarray([[1837.4, 500.0, -300.0], [2000.0, -100.0, 900.0]])
    a1 = Harmonics.from_stor(stor).accel_body_fixed(r_bf)
    a2 = Harmonics.from_stor(direct).accel_body_fixed(r_bf)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-14)


def test_pallas_harmonics_backend_matches_xla():
    """backend='pallas' (gravity_pallas.py VMEM-resident Pines kernel, run
    in interpret mode off-TPU) matches the XLA f32 recursion to f32
    round-off, including windowed (q_lo/q_hi) evaluations."""
    stor = GravityFieldData.from_cof(JGM3, 21, 21, True, Frames.IAU_EARTH)
    h_xla = Harmonics.from_stor(stor, precision="f32")
    h_pal = Harmonics.from_stor(stor, precision="f32", backend="pallas")
    rng = np.random.default_rng(3)
    B = 64
    r = rng.normal(size=(B, 3))
    r = r / np.linalg.norm(r, axis=1, keepdims=True) * rng.uniform(
        6700, 42000, (B, 1)
    )
    r32 = jnp.asarray(r, jnp.float32)
    for q_lo, q_hi in ((0, 0), (3, 0)):
        a_x = np.asarray(h_xla._accel_any(r32, q_lo, q_hi))
        a_p = np.asarray(h_pal._accel_any(r32, q_lo, q_hi))
        rel = (
            np.linalg.norm(a_p - a_x, axis=1) / np.linalg.norm(a_x, axis=1)
        ).max()
        assert rel < 2e-5, f"pallas vs xla rel err {rel} (q_lo={q_lo})"


def test_pallas_harmonics_rectangular_field():
    """backend='pallas' on an order < degree field (W-bounded rows with
    degree-only tail): matches the XLA path."""
    stor = GravityFieldData.from_cof(JGM3, 12, 6, True, Frames.IAU_EARTH)
    h_xla = Harmonics.from_stor(stor, precision="f32")
    h_pal = Harmonics.from_stor(stor, precision="f32", backend="pallas")
    rng = np.random.default_rng(9)
    r = rng.normal(size=(32, 3))
    r = r / np.linalg.norm(r, axis=1, keepdims=True) * 7000.0
    r32 = jnp.asarray(r, jnp.float32)
    a_x = np.asarray(h_xla._accel_any(r32))
    a_p = np.asarray(h_pal._accel_any(r32))
    rel = (np.linalg.norm(a_p - a_x, axis=1) / np.linalg.norm(a_x, axis=1)).max()
    assert rel < 2e-5, f"rectangular pallas vs xla rel err {rel}"
