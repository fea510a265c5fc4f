"""Direct tests for KfEstimate.keplerian_covar and TerrainMask — the two
parity components (kfestimate.rs:190-225, od/ground_station/mod.rs:125-126)
previously exercised only indirectly."""

import numpy as np
import pytest

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.od import KfEstimate
from nyx_tpu.od.ground_station import TerrainMask

EPOCH = Epoch.from_gregorian_utc(2021, 3, 4)


def _leo_estimate(covar):
    orbit = Orbit.keplerian(
        7136.6, 0.02, 51.6, 30.0, 65.0, 80.0, EPOCH, Frames.EME2000
    )
    return KfEstimate.from_covar(Spacecraft.from_orbit(orbit), covar)


class TestKeplerianCovar:
    def test_matches_monte_carlo_linearization(self):
        """The AD-rotated element covariance must match the sample
        covariance of elements computed from Cartesian draws (linear
        regime: small sigmas)."""
        rng = np.random.default_rng(7)
        sig = np.array([0.05, 0.05, 0.05, 5e-5, 5e-5, 5e-5])  # km, km/s
        covar = np.zeros((9, 9))
        covar[:6, :6] = np.diag(sig**2)
        est = _leo_estimate(covar)
        kc = est.keplerian_covar()
        assert kc.shape == (6, 6)
        # symmetric PSD
        assert np.allclose(kc, kc.T)
        assert np.all(np.linalg.eigvalsh(kc) > -1e-12)

        mu = est.nominal.orbit.frame.mu_km3_s2
        rv0 = est.nominal.to_vector()[:6]
        draws = rv0 + rng.standard_normal((4000, 6)) * sig

        from nyx_tpu.cosmic.orbit import keplerian_from_cartesian
        import jax.numpy as jnp

        els = []
        for rv in draws:
            k = keplerian_from_cartesian(jnp.asarray(rv[:3]), jnp.asarray(rv[3:]), mu)
            els.append(
                [
                    float(k["sma"]),
                    float(k["ecc"]),
                    np.rad2deg(float(k["inc"])),
                    np.rad2deg(float(k["raan"])),
                    np.rad2deg(float(k["aop"])),
                    np.rad2deg(float(k["ta"])),
                ]
            )
        sample = np.cov(np.asarray(els).T)
        # 4000 draws: sample stddevs agree with the AD rotation to ~5%
        ad_sig = np.sqrt(np.diag(kc))
        mc_sig = np.sqrt(np.diag(sample))
        assert np.all(np.abs(ad_sig - mc_sig) / mc_sig < 0.08)

    def test_sma_sigma_known_case(self):
        """Pure radial position uncertainty on a circular-ish orbit maps to
        SMA uncertainty ~ 2 a^2/r * sigma_r / r ... sanity-check the scale:
        sigma_sma must be within a factor of a few of sigma_r."""
        covar = np.zeros((9, 9))
        covar[0, 0] = covar[1, 1] = covar[2, 2] = 0.1**2
        est = _leo_estimate(covar)
        kc = est.keplerian_covar()
        sig_sma = np.sqrt(kc[0, 0])
        assert 0.05 < sig_sma < 1.0


class TestTerrainMask:
    def test_step_function_and_wrap(self):
        tm = TerrainMask(
            azimuths_deg=np.array([0.0, 90.0, 180.0, 270.0]),
            elevations_deg=np.array([5.0, 20.0, 8.0, 12.0]),
        )
        assert tm.min_elevation_at(0.0) == 5.0
        assert tm.min_elevation_at(89.9) == 5.0
        assert tm.min_elevation_at(90.0) == 20.0
        assert tm.min_elevation_at(179.9) == 20.0
        assert tm.min_elevation_at(200.0) == 8.0
        assert tm.min_elevation_at(359.9) == 12.0
        assert tm.min_elevation_at(360.0) == 5.0  # wraps
        assert tm.min_elevation_at(-10.0) == 12.0  # wraps into last region

    def test_unsorted_breakpoints_are_sorted(self):
        tm = TerrainMask(
            azimuths_deg=np.array([180.0, 0.0]),
            elevations_deg=np.array([30.0, 5.0]),
        )
        assert tm.min_elevation_at(10.0) == 5.0
        assert tm.min_elevation_at(190.0) == 30.0

    def test_flat_terrain(self):
        tm = TerrainMask.from_flat_terrain(7.5)
        az = np.linspace(0.0, 359.0, 25)
        assert np.all(tm.min_elevation_at(az) == 7.5)

    def test_vectorized_matches_scalar(self):
        tm = TerrainMask(
            azimuths_deg=np.array([0.0, 45.0, 300.0]),
            elevations_deg=np.array([3.0, 15.0, 9.0]),
        )
        az = np.array([0.0, 44.0, 45.0, 299.0, 301.0, 359.0])
        vec = tm.min_elevation_at(az)
        scl = np.array([tm.min_elevation_at(a) for a in az])
        assert np.array_equal(vec, scl)

    def test_mountain_blocks_low_pass(self):
        """A station ringed by a 60-deg mountain to the north must reject
        samples a flat-terrain station accepts (simulator gating,
        od/simulator/arc.rs visibility strands)."""
        from nyx_tpu.dynamics import OrbitalDynamics, SpacecraftDynamics
        from nyx_tpu.od import GroundStation, TrkConfig
        from nyx_tpu.od.simulator import TrackingArcSim
        from nyx_tpu.propagators import IntegratorOptions, Propagator

        orbit = Orbit.keplerian(
            7136.6, 0.001, 51.6, 30.0, 65.0, 80.0, EPOCH, Frames.EME2000
        )
        sc = Spacecraft.from_orbit(orbit)
        dyn = SpacecraftDynamics(OrbitalDynamics.two_body(Frames.EME2000), ())
        prop = Propagator.rk89(dyn, IntegratorOptions())
        _, traj = prop.with_state(sc).for_duration_with_traj(86_400.0 / 2)

        def station(mask):
            gs = GroundStation.dss13_goldstone(5.0)
            gs.terrain_mask = mask
            return gs

        cfg = {"Goldstone": TrkConfig(sampling_s=60.0)}
        flat = TrackingArcSim.with_seed(
            [station(None)], traj, cfg, seed=3
        ).generate_measurements()
        blocked = TrackingArcSim.with_seed(
            [station(TerrainMask(np.array([0.0]), np.array([60.0])))],
            traj,
            cfg,
            seed=3,
        ).generate_measurements()
        assert len(blocked) < len(flat)
        # ignoring the mask restores the flat-terrain schedule
        gs_ign = station(TerrainMask(np.array([0.0]), np.array([60.0])))
        gs_ign.terrain_mask_ignored = True
        ignored = TrackingArcSim.with_seed(
            [gs_ign], traj, cfg, seed=3
        ).generate_measurements()
        assert len(ignored) == len(flat)
