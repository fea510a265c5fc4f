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


def test_resume_run_until_epoch_skips(setup):
    sc, mvn, prop = setup
    mc = MonteCarlo(mvn, seed=13)
    full = mc.run_until_epoch(prop, None, EPOCH + 1800.0, 32)
    mc2 = MonteCarlo(mvn, seed=13)
    tail = mc2.resume_run_until_epoch(prop, None, EPOCH + 1800.0, skip=16, n=16)
    np.testing.assert_array_equal(full.y_final[16:], tail.y_final)
