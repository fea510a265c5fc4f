"""Propulsion & guidance tests.

Mirrors the reference's tests/propulsion/ suite: Ruggiero steering vector
against the reference's own unit test (ruggiero.rs:456-510), a closed-loop
SMA-raise (closedloop_single_oe_ruggiero.rs pattern), finite burns vs the
rocket equation, and impulsive maneuvers.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from types import SimpleNamespace

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.constants import STD_GRAVITY_M_S2
from nyx_tpu.cosmic.spacecraft import GuidanceMode, Thruster
from nyx_tpu.dynamics import (
    ImpulsiveManeuver,
    LocalFrame,
    Maneuver,
    OrbitalDynamics,
    Ruggiero,
    SpacecraftDynamics,
)
from nyx_tpu.md.objective import Objective
from nyx_tpu.md.param import StateParameter
from nyx_tpu.propagators import IntegratorOptions, Propagator

EPOCH = Epoch.from_gregorian_utc(2020, 1, 1, 0, 0, 0)
EME2K = Frames.EME2000.with_mu_km3_s2(398_600.433)


def test_ruggiero_direction_vs_reference():
    """The reference's ruggiero_weight unit test (ruggiero.rs:456-510):
    steering for an SMA+ECC raise must match to machine precision."""
    orbit = Orbit.keplerian(7378.1363, 0.01, 0.05, 0.0, 0.0, 1.0, EPOCH, EME2K)
    sc = Spacecraft.from_orbit(orbit)
    objectives = [
        Objective.within_tolerance(StateParameter.SMA, 42164.0, 1.0),
        Objective.within_tolerance(StateParameter.ECC, 0.01, 5e-5),
    ]
    law = Ruggiero.simple(objectives, sc)

    osc = np.array([
        7_303.253_461_441_64, 127.478_714_816_381_75, 0.111_246_193_227_445_4,
        -0.128_284_025_765_195_6, 7.422_889_151_816_439, 0.006_477_694_429_837_2,
    ])
    y9 = jnp.asarray(np.concatenate([osc, [1.8, 2.2, 1.0]]))[None, :]
    ctx = SimpleNamespace(frame=EME2K)
    u, throttle = law.direction_and_throttle(
        ctx, jnp.zeros(1), y9, jnp.full(1, float(GuidanceMode.Thrust))
    )
    expected = np.array([
        -0.017_279_636_133_108_3, 0.999_850_315_226_803, 0.000_872_534_222_883_2,
    ])
    assert np.linalg.norm(np.asarray(u[0]) - expected) < 1e-12
    assert float(throttle[0]) == 1.0
    # coasting lanes produce zero thrust
    u0, t0 = law.direction_and_throttle(
        ctx, jnp.zeros(1), y9, jnp.full(1, float(GuidanceMode.Coast))
    )
    assert float(jnp.linalg.norm(u0)) == 0.0 and float(t0[0]) == 0.0


@pytest.mark.slow
def test_ruggiero_closed_loop_sma_raise():
    """Closed-loop SMA raise converges and switches to Coast
    (closedloop_single_oe_ruggiero.rs pattern, scaled down for CI)."""
    orbit = Orbit.keplerian(7378.1363, 0.01, 28.5, 0.0, 0.0, 1.0, EPOCH, EME2K)
    thruster = Thruster(thrust_N=5.0, isp_s=1650.0)
    sc = Spacecraft.from_thruster(
        orbit, dry_mass_kg=250.0, prop_mass_kg=50.0, thruster=thruster,
        mode=GuidanceMode.Thrust,
    )
    target_sma = 7500.0
    objectives = [Objective.within_tolerance(StateParameter.SMA, target_sma, 1.0)]
    law = Ruggiero.simple(objectives, sc)
    dyn = SpacecraftDynamics.from_guidance_law(
        OrbitalDynamics.two_body(EME2K), law
    )
    inst = Propagator.rk89(dyn, IntegratorOptions(max_step_s=60.0)).with_state(sc)
    # Edelbaum estimate ~62 m/s -> ~3800 s at 1.67e-5 km/s^2; 3x margin
    final = inst.for_duration(4.0 * 3600.0)
    assert abs(final.orbit.sma_km - target_sma) < 2.0, final.orbit.sma_km
    assert final.mode == GuidanceMode.Coast  # objective achieved -> coast
    assert final.prop_mass_kg < sc.prop_mass_kg  # burned propellant
    # mass flow sanity: m_dot = F / (isp g0) while thrusting
    burned = sc.prop_mass_kg - final.prop_mass_kg
    max_burn = 5.0 / (1650.0 * STD_GRAVITY_M_S2) * 4.0 * 3600.0
    assert 0.0 < burned < max_burn


def test_finite_burn_rocket_equation():
    """A prograde VNC finite burn matches the rocket equation
    (tests/propulsion/schedule.rs val_transfer_schedule pattern)."""
    orbit = Orbit.keplerian(8000.0, 0.0, 0.0, 0.0, 0.0, 0.0, EPOCH, EME2K)
    thruster = Thruster(thrust_N=10.0, isp_s=300.0)
    sc = Spacecraft.from_thruster(
        orbit, dry_mass_kg=500.0, prop_mass_kg=100.0, thruster=thruster,
        mode=GuidanceMode.Coast,
    )
    burn_s = 600.0
    mnvr = Maneuver.from_time_invariant(
        EPOCH, EPOCH + burn_s, 1.0, [1.0, 0.0, 0.0], LocalFrame.VNC
    )
    dyn = SpacecraftDynamics.from_guidance_law(
        OrbitalDynamics.two_body(EME2K), mnvr
    )
    inst = Propagator.rk89(dyn, IntegratorOptions(max_step_s=30.0)).with_state(sc)
    final = inst.for_duration(burn_s)

    m0 = sc.total_mass_kg
    mdot = 10.0 / (300.0 * STD_GRAVITY_M_S2)
    mf_expected = m0 - mdot * burn_s
    assert abs(final.total_mass_kg - mf_expected) < 1e-6

    # energy gain: prograde burn raises the orbit energy by ~v*dv
    dv_ideal = 300.0 * STD_GRAVITY_M_S2 * np.log(m0 / mf_expected) / 1e3  # km/s
    de = final.orbit.energy_km2_s2 - sc.orbit.energy_km2_s2
    de_expected = sc.orbit.vmag_km_s * dv_ideal
    assert abs(de - de_expected) / de_expected < 0.01

    # after the burn window the mode drops back to Coast and mass is constant
    final2 = inst.for_duration(600.0)
    assert final2.mode == GuidanceMode.Coast
    assert abs(final2.total_mass_kg - final.total_mass_kg) < 1e-12


def test_impulsive_maneuver_prograde():
    orbit = Orbit.keplerian(8000.0, 0.0, 10.0, 0.0, 0.0, 0.0, EPOCH, EME2K)
    sc = Spacecraft.from_orbit(orbit)
    dv = 0.1  # km/s prograde
    out = ImpulsiveManeuver([dv, 0.0, 0.0], LocalFrame.VNC).apply(sc)
    assert abs(out.orbit.vmag_km_s - (sc.orbit.vmag_km_s + dv)) < 1e-12
    assert out.orbit.sma_km > sc.orbit.sma_km


def test_maneuver_polynomial_angles():
    """Angle-polynomial representation evaluates alpha(t), delta(t)
    (mnvr.rs MnvrRepr::Angles)."""
    mnvr = Maneuver(
        EPOCH, EPOCH + 100.0, 1.0,
        azimuth_poly=np.array([0.001, 0.1]),  # alpha = 0.1 + 0.001 t rad
        elevation_poly=np.array([0.05]),
        frame=LocalFrame.RCN,
    )
    t0 = EPOCH.to_tdb_seconds()
    u0 = np.asarray(mnvr.vector_at(jnp.float64(t0)))
    u50 = np.asarray(mnvr.vector_at(jnp.float64(t0 + 50.0)))
    a0, d0 = np.arctan2(u0[1], u0[0]), np.arcsin(u0[2])
    a50, d50 = np.arctan2(u50[1], u50[0]), np.arcsin(u50[2])
    assert abs(a0 - 0.1) < 1e-12 and abs(d0 - 0.05) < 1e-12
    assert abs(a50 - 0.15) < 1e-12 and abs(d50 - 0.05) < 1e-12
    assert abs(np.linalg.norm(u0) - 1.0) < 1e-12


def test_kluever_sma_raise_direction():
    """Kluever with a single SMA objective steers along-track like Ruggiero
    (kluever.rs blending reduces to the single-objective optimum)."""
    from nyx_tpu.dynamics import Kluever, Ruggiero

    orbit = Orbit.keplerian(7378.1363, 0.05, 28.5, 0.0, 0.0, 45.0, EPOCH, EME2K)
    sc = Spacecraft.from_orbit(orbit)
    objectives = [Objective.within_tolerance(StateParameter.SMA, 42164.0, 1.0)]
    klu = Kluever.new(objectives, [1.0])
    rug = Ruggiero.simple(objectives, sc)
    ctx = SimpleNamespace(frame=EME2K)
    y9 = jnp.asarray(np.concatenate([orbit.r_km, orbit.v_km_s, [1.8, 2.2, 0.0]]))[None]
    mode = jnp.full(1, float(GuidanceMode.Thrust))
    uk, tk = klu.direction_and_throttle(ctx, jnp.zeros(1), y9, mode)
    ur, tr = rug.direction_and_throttle(ctx, jnp.zeros(1), y9, mode)
    assert float(tk[0]) == 1.0
    # single-sma-objective Kluever == Ruggiero steering (same alpha law)
    assert np.abs(np.asarray(uk[0]) - np.asarray(ur[0])).max() < 1e-12
    # coast lanes: zero thrust
    u0, t0 = klu.direction_and_throttle(ctx, jnp.zeros(1), y9,
                                        jnp.full(1, float(GuidanceMode.Coast)))
    assert float(t0[0]) == 0.0 and float(jnp.linalg.norm(u0)) == 0.0


def test_kluever_closed_loop_inc_change():
    """Kluever inclination-only objective reduces inclination."""
    from nyx_tpu.dynamics import Kluever

    orbit = Orbit.keplerian(8000.0, 0.001, 28.5, 10.0, 0.0, 0.0, EPOCH, EME2K)
    thruster = Thruster(thrust_N=10.0, isp_s=1500.0)
    sc = Spacecraft.from_thruster(orbit, 300.0, 100.0, thruster,
                                  mode=GuidanceMode.Thrust)
    objectives = [Objective.within_tolerance(StateParameter.INC, 28.0, 0.01)]
    law = Kluever.new(objectives, [1.0])
    dyn = SpacecraftDynamics.from_guidance_law(OrbitalDynamics.two_body(EME2K), law)
    inst = Propagator.rk89(dyn, IntegratorOptions(max_step_s=60.0)).with_state(sc)
    final = inst.for_duration(3600.0)
    assert final.orbit.inc_deg < sc.orbit.inc_deg - 0.05


def test_thrust_direction_replay():
    """Replaying a recorded prograde burn reproduces the original finite
    burn (guidance/replay.rs round-trip expectation)."""
    from nyx_tpu.dynamics import ThrustDirectionReplay

    orbit = Orbit.keplerian(8000.0, 0.0, 0.0, 0.0, 0.0, 0.0, EPOCH, EME2K)
    thruster = Thruster(thrust_N=10.0, isp_s=300.0)
    sc = Spacecraft.from_thruster(orbit, 500.0, 100.0, thruster,
                                  mode=GuidanceMode.Coast)
    burn_s = 600.0
    # original burn: fixed VNC-prograde
    mnvr = Maneuver.from_time_invariant(EPOCH, EPOCH + burn_s, 1.0,
                                        [1.0, 0.0, 0.0], LocalFrame.VNC)
    dyn = SpacecraftDynamics.from_guidance_law(OrbitalDynamics.two_body(EME2K), mnvr)
    ref, ref_traj = Propagator.rk89(dyn, IntegratorOptions(max_step_s=30.0)) \
        .with_state(sc).for_duration_with_traj(burn_s)

    # record the inertial thrust directions along the FLOWN (powered)
    # trajectory: the VNC-prograde burn thrusts along its own velocity
    epochs, dirs, thr = [], [], []
    for k in range(0, int(burn_s) + 1, 10):
        epochs.append(EPOCH + float(k))
        v = ref_traj.interpolate(float(k))[3:6]
        dirs.append(v / np.linalg.norm(v))
        thr.append(1.0)
    replay = ThrustDirectionReplay.from_samples(epochs, dirs, thr)
    dyn2 = SpacecraftDynamics.from_guidance_law(OrbitalDynamics.two_body(EME2K), replay)
    got = Propagator.rk89(dyn2, IntegratorOptions(max_step_s=30.0)).with_state(sc) \
        .for_duration(burn_s)
    # coarse replay of a rotating direction: sub-km / mm-mass agreement
    assert np.linalg.norm(got.orbit.r_km - ref.orbit.r_km) < 1.0
    assert abs(got.prop_mass_kg - ref.prop_mass_kg) < 1e-4


@pytest.mark.slow
def test_ruggiero_ctx_thresholds_per_lane_parity():
    """Per-lane efficiency thresholds through ctx.guidance_params match
    the static-threshold law lane for lane (the population-per-lane form
    the raise-optim example uses; raise_optim.rs from_ηthresholds)."""
    from nyx_tpu.ephem.almanac import Almanac
    from nyx_tpu.mc import MonteCarlo, MvnSpacecraft, StateDispersion

    orbit = Orbit.keplerian(7378.1363, 0.05, 28.5, 30.0, 40.0, 1.0,
                            EPOCH, EME2K)
    thruster = Thruster(thrust_N=5.0, isp_s=1650.0)
    sc = Spacecraft.from_thruster(
        orbit, dry_mass_kg=250.0, prop_mass_kg=50.0, thruster=thruster,
        mode=GuidanceMode.Thrust,
    )
    objectives = [
        Objective.within_tolerance(StateParameter.SMA, 7500.0, 1.0),
        Objective.within_tolerance(StateParameter.INC, 27.0, 0.01),
    ]
    alm = Almanac()
    end = EPOCH + 1800.0
    thr_rows = np.array([[0.0, 0.0], [0.3, 0.5], [0.9, 0.2]])
    opts = IntegratorOptions(max_step_s=60.0)

    # one batched dispatch, per-lane thresholds traced through the ctx
    law_ctx = Ruggiero.from_ctx_thresholds(objectives, sc)
    dyn_ctx = SpacecraftDynamics.from_guidance_law(
        OrbitalDynamics.two_body(EME2K), law_ctx
    )
    prop_ctx = Propagator.rk89(dyn_ctx, opts)
    mvn = MvnSpacecraft(sc, [StateDispersion.zero_mean("sma", 0.0)])
    y0 = np.tile(np.asarray(sc.to_vector()), (3, 1))
    res = MonteCarlo(mvn, seed=1).run_until_epoch(
        prop_ctx, alm, end, 3, _y0=y0, guidance_params=thr_rows
    )
    assert res.n_ok == 3

    # lane-for-lane against the static-threshold law
    for k in range(3):
        law_k = Ruggiero.from_thresholds(objectives, list(thr_rows[k]), sc)
        dyn_k = SpacecraftDynamics.from_guidance_law(
            OrbitalDynamics.two_body(EME2K), law_k
        )
        res_k = MonteCarlo(mvn, seed=1).run_until_epoch(
            Propagator.rk89(dyn_k, opts), alm, end, 1, _y0=y0[:1]
        )
        np.testing.assert_allclose(
            np.asarray(res.y_final)[k], np.asarray(res_k.y_final)[0],
            rtol=0, atol=1e-9,
        )
    # the thresholds actually bite: lanes must differ from each other
    assert not np.allclose(np.asarray(res.y_final)[0],
                           np.asarray(res.y_final)[2], atol=1e-6)


@pytest.mark.slow
def test_ruggiero_ctx_thresholds_chunked_lanes_parity():
    """guidance_params slicing in the max_lanes_per_call chunked path:
    the 4-lane ensemble split into 2-lane device calls must equal the
    one-call result exactly (lanes are independent)."""
    from nyx_tpu.ephem.almanac import Almanac
    from nyx_tpu.mc import MonteCarlo, MvnSpacecraft, StateDispersion

    orbit = Orbit.keplerian(7378.1363, 0.05, 28.5, 30.0, 40.0, 1.0,
                            EPOCH, EME2K)
    thruster = Thruster(thrust_N=5.0, isp_s=1650.0)
    sc = Spacecraft.from_thruster(
        orbit, dry_mass_kg=250.0, prop_mass_kg=50.0, thruster=thruster,
        mode=GuidanceMode.Thrust,
    )
    objectives = [
        Objective.within_tolerance(StateParameter.SMA, 7500.0, 1.0),
        Objective.within_tolerance(StateParameter.INC, 27.0, 0.01),
    ]
    law = Ruggiero.from_ctx_thresholds(objectives, sc)
    dyn = SpacecraftDynamics.from_guidance_law(
        OrbitalDynamics.two_body(EME2K), law
    )
    prop = Propagator.rk89(dyn, IntegratorOptions(max_step_s=60.0))
    alm = Almanac()
    end = EPOCH + 1200.0
    thr = np.array([[0.0, 0.0], [0.2, 0.6], [0.7, 0.1], [0.9, 0.9]])
    mvn = MvnSpacecraft(sc, [StateDispersion.zero_mean("sma", 0.0)])

    one = MonteCarlo(mvn, seed=2).run_until_epoch(
        prop, alm, end, 4, guidance_params=thr
    )
    chunked = MonteCarlo(mvn, seed=2).run_until_epoch(
        prop, alm, end, 4, max_lanes_per_call=2, guidance_params=thr
    )
    np.testing.assert_array_equal(
        np.asarray(one.y_final), np.asarray(chunked.y_final)
    )
    # shared [P]-shaped params broadcast to every lane in both paths
    shared = MonteCarlo(mvn, seed=2).run_until_epoch(
        prop, alm, end, 4, max_lanes_per_call=2,
        guidance_params=np.array([0.2, 0.6]),
    )
    assert np.all(np.isfinite(np.asarray(shared.y_final)))
