"""Monte Carlo framework tests.

Mirrors the reference's tests/monte_carlo/framework.rs: seeded determinism,
resume with skip, dispersion statistics, plus TPU-specific invariants: the
8-device sharded run and the chunked run must match the plain run bitwise
(lanes are independent).
"""

import numpy as np
import pytest
import jax

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.dynamics import OrbitalDynamics, SpacecraftDynamics
from nyx_tpu.mc import MonteCarlo, MvnSpacecraft, StateDispersion
from nyx_tpu.parallel.mesh import ensemble_mesh
from nyx_tpu.propagators import IntegratorOptions, Propagator

EPOCH = Epoch.from_gregorian_utc(2020, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def setup():
    orbit = Orbit.keplerian(
        7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, EPOCH, Frames.EME2000
    )
    sc = Spacecraft.from_orbit(orbit)
    mvn = MvnSpacecraft(
        sc,
        [
            StateDispersion("sma", 0.5),
            StateDispersion("inc", 0.01),
        ],
    )
    dyn = SpacecraftDynamics.new(OrbitalDynamics.two_body(Frames.EME2000))
    prop = Propagator.rk89(dyn, IntegratorOptions())
    return sc, mvn, prop


def test_dispersion_statistics(setup):
    """Sampled dispersions reproduce the requested standard deviations
    (multivariate.rs sampling validation)."""
    sc, mvn, _ = setup
    states = np.asarray(mvn.sample(jax.random.key(0), 4000))
    assert states.shape == (4000, 9)
    from nyx_tpu.md.param import value
    import jax.numpy as jnp

    smas = np.asarray(value("sma", jnp.asarray(states), sc.frame.mu))
    incs = np.asarray(value("inc", jnp.asarray(states), sc.frame.mu))
    assert abs(np.std(smas) - 0.5) < 0.05
    assert abs(np.mean(smas) - sc.orbit.sma_km) < 0.05
    assert abs(np.std(incs) - 0.01) < 0.002


def test_seeded_determinism_and_resume(setup):
    """Same seed -> identical states; resume(skip=k) reproduces the tail
    (mc/montecarlo.rs:208-224 resume semantics)."""
    sc, mvn, prop = setup
    mc_a = MonteCarlo(mvn, seed=123)
    mc_b = MonteCarlo(mvn, seed=123)
    sa = np.asarray(mc_a.generate_states(64))
    sb = np.asarray(mc_b.generate_states(64))
    np.testing.assert_array_equal(sa, sb)
    tail = np.asarray(mc_b.generate_states(32, skip=32))
    np.testing.assert_array_equal(sa[32:], tail)
    # a different seed changes the draw
    assert not np.allclose(sa, np.asarray(MonteCarlo(mvn, seed=124).generate_states(64)))


def test_run_until_epoch_and_results(setup):
    sc, mvn, prop = setup
    mc = MonteCarlo(mvn, seed=7)
    res = mc.run_until_epoch(prop, None, EPOCH + 5400.0, 64)
    assert res.n_runs == 64 and res.n_ok == 64
    mean_sma, std_sma = res.dispersion_values_of("sma")
    # two-body: sma is invariant, dispersion preserved through propagation
    assert abs(mean_sma - sc.orbit.sma_km) < 0.2
    assert abs(std_sma - 0.5) < 0.15


def test_chunked_matches_single_call(setup):
    """Chunked execution is bitwise identical to one big call."""
    sc, mvn, prop = setup
    mc = MonteCarlo(mvn, seed=9)
    full = mc.run_until_epoch(prop, None, EPOCH + 3600.0, 48)
    mc2 = MonteCarlo(mvn, seed=9)
    chunked = mc2.run_until_epoch(
        prop, None, EPOCH + 3600.0, 48, max_lanes_per_call=16
    )
    np.testing.assert_array_equal(full.y_final, chunked.y_final)
    np.testing.assert_array_equal(full.status, chunked.status)


def test_sharded_matches_unsharded(setup):
    """An 8-device mesh run returns the same trajectories as single-device
    (ensemble propagation needs zero communication, SURVEY.md §2.8)."""
    sc, mvn, prop = setup
    mesh = ensemble_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    mc = MonteCarlo(mvn, seed=11)
    plain = mc.run_until_epoch(prop, None, EPOCH + 3600.0, 64)
    mc2 = MonteCarlo(mvn, seed=11)
    sharded = mc2.run_until_epoch(prop, None, EPOCH + 3600.0, 64, mesh=mesh)
    np.testing.assert_allclose(plain.y_final, sharded.y_final, rtol=0, atol=1e-9)


def test_trajectory_retention_and_queries(setup, tmp_path):
    """n_capture retains per-run trajectories; every_value_of and the
    full-ensemble parquet export work (mc/results.rs:48-242)."""
    sc, mvn, prop = setup
    mc = MonteCarlo(mvn, seed=21)
    res = mc.run_until_epoch(
        prop, None, EPOCH + 10_800.0, 24, n_capture=256
    )
    assert res.has_trajectories
    assert res.traj_len.min() > 3
    # per-run Trajectory round-trip: the last captured state is the final
    tr0 = res.trajectory(0)
    np.testing.assert_allclose(tr0.ys[-1][:6], res.y_final[0][:6], atol=1e-9)
    # sma is a two-body invariant: every_value_of must be flat per run
    ts, smas = res.every_value_of("sma", 300.0)
    assert smas.shape == (24, len(ts))
    assert np.abs(smas - smas[:, :1]).max() < 5e-3  # interpolation-level
    # full-ensemble export: one row per (run, epoch)
    p = res.to_parquet(tmp_path / "ens.pq", trajectories=True, step=600.0)
    import pyarrow.parquet as pq

    table = pq.read_table(p)
    assert table.num_rows == 24 * len(np.arange(0.0, 10_800.0 + 1e-9, 600.0))
    assert "sma" in table.column_names


def test_run_until_nth_event_apoapsis(setup):
    """Event-stopped MC: every lane stops at its 2nd apoapsis
    (mc/montecarlo.rs run_until_nth_event)."""
    from nyx_tpu.md.events import Event

    sc, mvn, prop = setup
    mc = MonteCarlo(mvn, seed=5)
    # LEO period ~6030 s: two apoapses within 4 hours
    res = mc.run_until_nth_event(
        prop, None, 14_400.0, Event.apoapsis(), 2, 16, n_capture=512
    )
    assert res.event_found.all()
    import jax.numpy as jnp

    from nyx_tpu.md.param import value

    tas = np.asarray(
        value("ta", jnp.asarray(res.event_y[:, :9]), sc.frame.mu)
    )
    err = np.abs((tas - 180.0 + 180.0) % 360.0 - 180.0)
    assert err.max() < 0.5, f"apoapsis TA error up to {err.max()} deg"
    # 2nd apoapsis: between one and two periods in
    period = 2 * np.pi * np.sqrt(7136.6**3 / sc.frame.mu)
    assert np.all(res.event_t > period)
    assert np.all(res.event_t < 2.2 * period)
    # the event state is self-consistent with its epoch
    st = res.event_state(3)
    assert abs((st.epoch - EPOCH).to_seconds() - res.event_t[3]) < 1e-6


def test_mc_helpers_dv_errors(setup):
    """unit_vector_from_seed / dv pointing + execution errors
    (mc/helpers.rs:25-80): pointing error preserves magnitude; statistics
    match the requested 3-sigma scales."""
    from nyx_tpu.mc.helpers import (
        dv_execution_error,
        dv_pointing_error,
        unit_vector_from_seed,
    )

    rng = np.random.default_rng(42)
    units = unit_vector_from_seed(rng, 2000)
    np.testing.assert_allclose(np.linalg.norm(units, axis=-1), 1.0, atol=1e-12)
    # uniform on the sphere: component means ~0
    assert np.abs(units.mean(axis=0)).max() < 0.05

    # dv aligned with the current pointing: cur_angle = 0, so the new angle
    # is N(0, err/3) and the cos projection stays within eps of the
    # magnitude (the reference semantics: dv_hat * cos(new_angle) * |dv|)
    v = np.tile([0.0, 7.5, 0.0], (2000, 1))
    dv = np.tile([0.0, 5e-3, 0.0], (2000, 1))
    dv_perr = dv_pointing_error(v, dv, 0.1, rng)
    mags = np.linalg.norm(dv_perr, axis=-1)
    assert np.all(mags <= 5e-3 + 1e-18)  # cos never exceeds 1
    np.testing.assert_allclose(mags, 5e-3, atol=1e-4)  # cos(~5 sigma) tail
    dv_exec = dv_execution_error(v, dv, 0.1, 5e-4, rng)
    emags = np.linalg.norm(dv_exec, axis=-1)
    assert abs(np.std(emags) - 5e-4 / 3.0) < 5e-5
    with pytest.raises(ValueError):
        dv_pointing_error(v, dv, 1.5, rng)


def test_resume_run_until_epoch_skips(setup):
    sc, mvn, prop = setup
    mc = MonteCarlo(mvn, seed=13)
    full = mc.run_until_epoch(prop, None, EPOCH + 1800.0, 32)
    mc2 = MonteCarlo(mvn, seed=13)
    tail = mc2.resume_run_until_epoch(prop, None, EPOCH + 1800.0, skip=16, n=16)
    np.testing.assert_array_equal(full.y_final[16:], tail.y_final)


def test_first_last_values_of(setup):
    """first_values_of sees the dispersed initial states, last_values_of
    the propagated finals (mc/results.rs:117-137)."""
    sc, mvn, prop = setup
    mc = MonteCarlo(mvn, seed=77)
    res = mc.run_until_epoch(prop, None, EPOCH + 1800.0, 256)
    first_sma = res.first_values_of("sma")
    last_sma = res.last_values_of("sma")
    # initial dispersion reproduces the requested sigma
    assert abs(np.std(first_sma) - 0.5) < 0.1
    assert abs(np.mean(first_sma) - sc.orbit.sma_km) < 0.1
    # two-body: sma conserved per-run to integrator tolerance
    np.testing.assert_allclose(last_sma, first_sma, atol=1e-6)
    # chunked path carries initials too
    res_c = MonteCarlo(mvn, seed=77).run_until_epoch(
        prop, None, EPOCH + 1800.0, 256, max_lanes_per_call=64
    )
    np.testing.assert_array_equal(res_c.first_values_of("sma"), first_sma)


def test_encke_deviation_mode():
    """float32 Encke deviation propagation vs the full-state path
    (mc/encke.py): sub-meter agreement over a short arc, and ensemble
    statistics preserved to ~1e-4 of the spread over longer arcs. The
    zero-deviation lane validates the scheme's internal consistency."""
    from nyx_tpu.dynamics import Drag, Harmonics, SolarPressure
    from nyx_tpu.ephem.almanac import Almanac
    from nyx_tpu.io.gravity import GravityFieldData

    epoch = Epoch.from_gregorian_utc(2021, 3, 4)
    orbit = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch,
                            Frames.EME2000)
    sc = Spacecraft.new(orbit, 100.0, 0.0, 2.0, 2.0, 1.8, 2.2)
    stor = GravityFieldData.from_cof(
        "/root/reference/data/01_planetary/JGM3.cof.gz", 21, 21, True,
        Frames.IAU_EARTH,
    )
    dyn = SpacecraftDynamics(
        OrbitalDynamics.from_model(
            Harmonics.from_stor(stor, precision="split"), Frames.EME2000
        ),
        (SolarPressure.default(), Drag.earth_exp()),
    )
    opts = IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9)
    prop_h = Propagator.rk89(dyn, opts)
    mvn = MvnSpacecraft(sc, [
        StateDispersion("sma", 0.5), StateDispersion("inc", 0.01),
    ])
    alm = Almanac()
    B = 8
    end = epoch + 10_000.0

    full = MonteCarlo(mvn, seed=42).run_until_epoch(prop_h, alm, end, B)
    spread = np.linalg.norm(
        full.y_final[:, :3] - full.y_final[:, :3].mean(0), axis=1
    ).max()
    assert spread > 10.0  # km — deviations really grew
    std_full = np.std(full.y_final[:, :3], axis=0)
    # all three deviation integrators: the synchronized fixed-step RK scan
    # (the TPU-fast default), the AB8/AM PECE multistep (2 force evals per
    # step), and the per-lane adaptive while-loop
    for step_mode, integ in (("fixed", "rk"), ("fixed", "abm"),
                             ("adaptive", "rk")):
        enc = MonteCarlo(mvn, seed=42).run_until_epoch_encke(
            prop_h, alm, end, B, step_mode=step_mode, integ=integ
        )
        assert enc.n_ok == B
        err = np.linalg.norm(enc.y_final[:, :3] - full.y_final[:, :3], axis=1)
        assert err.max() < 2e-3, (
            f"encke[{step_mode}/{integ}] vs full max err {err.max()*1e3:.1f} m"
        )
        # ensemble statistics match to a tiny fraction of the dispersion
        std_enc = np.std(enc.y_final[:, :3], axis=0)
        np.testing.assert_allclose(std_enc, std_full, rtol=1e-3)


def test_encke_trajectory_capture():
    """Fixed-step Encke capture (deviations recombined with the f64
    reference on device): time-history queries and event location agree
    with the full-state capture path, for both the RK and ABM main loops.
    Also guards the t=0 sample: both buffers must interpolate the INITIAL
    state exactly (the full-state capture once clamped t~0 queries to the
    first accepted step, ~1,300 km of error)."""
    from nyx_tpu.dynamics import Drag, Harmonics, SolarPressure
    from nyx_tpu.ephem.almanac import Almanac
    from nyx_tpu.io.gravity import GravityFieldData
    from nyx_tpu.md.events import Event

    epoch = Epoch.from_gregorian_utc(2021, 3, 4)
    orbit = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch,
                            Frames.EME2000)
    sc = Spacecraft.new(orbit, 100.0, 0.0, 2.0, 2.0, 1.8, 2.2)
    stor = GravityFieldData.from_cof(
        "/root/reference/data/01_planetary/JGM3.cof.gz", 21, 21, True,
        Frames.IAU_EARTH,
    )
    dyn = SpacecraftDynamics(
        OrbitalDynamics.from_model(
            Harmonics.from_stor(stor, precision="split"), Frames.EME2000
        ),
        (SolarPressure.default(), Drag.earth_exp()),
    )
    opts = IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9)
    prop = Propagator.rk89(dyn, opts)
    mvn = MvnSpacecraft(sc, [
        StateDispersion("sma", 0.5), StateDispersion("inc", 0.01),
    ])
    alm = Almanac()
    B = 4
    end = epoch + 10_000.0
    full = MonteCarlo(mvn, seed=7).run_until_epoch(
        prop, alm, end, B, n_capture=256
    )
    ts = np.arange(0.0, 10_000.0, 600.0)
    yf = full._interp_all(ts)
    # t=0 must reproduce the initial states exactly (prepended sample)
    np.testing.assert_allclose(yf[:, 0, :6], full.y_initial[:, :6],
                               rtol=0, atol=1e-9)
    ev = Event("declination", 0.0)
    full.locate_nth_event(ev, 1)
    for integ in ("rk", "abm"):
        enc = MonteCarlo(mvn, seed=7).run_until_epoch_encke(
            prop, alm, end, B, integ=integ, n_capture=64
        )
        assert enc.has_trajectories
        ye = enc._interp_all(ts)
        np.testing.assert_allclose(ye[:, 0, :6], enc.y_initial[:, :6],
                                   rtol=0, atol=1e-6)
        d = np.linalg.norm(yf[..., :3] - ye[..., :3], axis=-1)
        assert d.max() < 0.05, f"[{integ}] pos diff {d.max()*1e3:.1f} m"
        # sma time history to metre-level of the full path at every grid
        # time (quintic capture interpolant with two-body+J2 end data)
        _, sma_f = full.every_value_of("sma", 600.0)
        _, sma_e = enc.every_value_of("sma", 600.0)
        assert np.abs(sma_f - sma_e).max() < 0.01
        enc.locate_nth_event(ev, 1)
        assert enc.event_found.all()
        assert np.abs(enc.event_t - full.event_t).max() < 0.5


def test_encke_sharded_matches_unsharded(setup):
    """Fixed-step Encke deviations shard over the ensemble mesh with zero
    communication: an 8-device run matches the single-device run exactly
    (including a padding case, B=20 not divisible by 8)."""
    sc, mvn, prop = setup
    end = EPOCH + 7200.0
    plain = MonteCarlo(mvn, seed=13).run_until_epoch_encke(
        prop, None, end, 20, integ="abm"
    )
    mesh = ensemble_mesh()
    sharded = MonteCarlo(mvn, seed=13).run_until_epoch_encke(
        prop, None, end, 20, integ="abm", mesh=mesh
    )
    assert sharded.n_runs == 20
    np.testing.assert_allclose(plain.y_final, sharded.y_final,
                               rtol=0, atol=1e-9)


def test_encke_eccentric_orbit_auto_dt():
    """Auto dt (from the periapsis rate) holds Encke/ABM accuracy on a
    Molniya-class e=0.72 orbit over ~3 revolutions: the deviation
    dynamics' fastest frequency is the two-body rate at perigee, which
    the default LEO-tuned 150 s would also satisfy here, but the auto
    rule must pick it from rp, not sma."""
    orbit = Orbit.keplerian(
        26_562.0, 0.72, 63.4, 50.0, 270.0, 10.0, EPOCH, Frames.EME2000
    )
    sc = Spacecraft.from_orbit(orbit)
    mvn = MvnSpacecraft(sc, [
        StateDispersion("sma", 1.0), StateDispersion("inc", 0.01),
    ])
    dyn = SpacecraftDynamics.new(OrbitalDynamics.two_body(Frames.EME2000))
    prop = Propagator.rk89(
        dyn, IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9)
    )
    end = EPOCH + 3.0 * orbit.period_s
    B = 8
    full = MonteCarlo(mvn, seed=6).run_until_epoch(prop, None, end, B)
    enc = MonteCarlo(mvn, seed=6).run_until_epoch_encke(
        prop, None, end, B, integ="abm"
    )
    assert enc.n_ok == B
    err = np.linalg.norm(enc.y_final[:, :3] - full.y_final[:, :3], axis=1)
    spread = np.linalg.norm(
        full.y_final[:, :3] - full.y_final[:, :3].mean(0), axis=1
    ).max()
    assert spread > 50.0  # km — strong along-track growth at e=0.72
    # ~2e-4 of the >100 km ensemble spread; the ABM coefficient of the
    # auto-dt rule (0.16/(1+e)) is what holds this (0.16 flat gave 335 m)
    assert err.max() < 0.05, f"max err {err.max()*1e3:.1f} m"
