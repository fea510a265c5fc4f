"""Keplerian element conversion tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from nyx_tpu import Epoch, Frames, Orbit
from nyx_tpu.cosmic import orbit as om


EPOCH = Epoch.from_gregorian_utc(2021, 3, 4)


def test_cartesian_keplerian_roundtrip():
    o = Orbit.keplerian(8_191.93, 1e-3, 12.85, 306.614, 314.19, 99.887, EPOCH, Frames.EME2000)
    assert abs(o.sma_km - 8_191.93) < 1e-8
    assert abs(o.ecc - 1e-3) < 1e-12
    assert abs(o.inc_deg - 12.85) < 1e-10
    assert abs(o.raan_deg - 306.614) < 1e-9
    assert abs(o.aop_deg - 314.19) < 1e-8
    assert abs(o.ta_deg - 99.887) < 1e-8


def test_known_leo_elements():
    # ISS-like orbit
    o = Orbit.cartesian(
        -2436.45, -2436.45, 6891.037, 5.088_611, -5.088_611, 0.0, EPOCH, Frames.EME2000
    )
    assert 6700 < o.sma_km < 7800
    assert o.ecc < 0.05
    assert o.period_s == pytest.approx(2 * np.pi * np.sqrt(o.sma_km**3 / o.frame.mu))


def test_vectorized_conversion():
    sma = jnp.array([7000.0, 8000.0, 42164.0])
    ecc = jnp.array([0.01, 0.1, 1e-4])
    inc = jnp.radians(jnp.array([51.6, 28.5, 0.05]))
    z = jnp.zeros(3)
    r, v = om.cartesian_from_keplerian(sma, ecc, inc, z, z, z + 0.3, Frames.EME2000.mu)
    el = om.keplerian_from_cartesian(r, v, Frames.EME2000.mu)
    np.testing.assert_allclose(el["sma"], sma, rtol=1e-12)
    np.testing.assert_allclose(el["ecc"], ecc, rtol=1e-9)
    np.testing.assert_allclose(el["inc"], inc, rtol=1e-12, atol=1e-12)


def test_hyperbolic():
    o = Orbit.keplerian(-25_000.0, 1.5, 30.0, 10.0, 20.0, 5.0, EPOCH, Frames.EME2000)
    assert o.ecc == pytest.approx(1.5, rel=1e-10)
    assert o.sma_km == pytest.approx(-25_000.0, rel=1e-10)
    assert o.c3_km2_s2 > 0


def test_anomaly_chain():
    ta = jnp.radians(jnp.array([0.0, 45.0, 179.0, 181.0, 359.0]))
    ecc = jnp.full(5, 0.3)
    ea = om.true_to_ecc_anomaly(ta, ecc)
    ma = om.ecc_to_mean_anomaly(ea, ecc)
    ea2 = om.mean_to_ecc_anomaly(ma, ecc)
    ta2 = om.ecc_to_true_anomaly(ea2, ecc)
    np.testing.assert_allclose(
        np.mod(np.asarray(ta2), 2 * np.pi), np.mod(np.asarray(ta), 2 * np.pi), atol=1e-10
    )


def test_keplerian_propagate_period():
    o = Orbit.keplerian(8000.0, 0.1, 30.0, 40.0, 50.0, 60.0, EPOCH, Frames.EME2000)
    o2 = o.at_epoch(EPOCH + o.period_s)
    np.testing.assert_allclose(o2.r_km, o.r_km, atol=1e-6)
    np.testing.assert_allclose(o2.v_km_s, o.v_km_s, atol=1e-9)


def test_local_frame_dcms_orthonormal():
    o = Orbit.keplerian(8000.0, 0.1, 30.0, 40.0, 50.0, 60.0, EPOCH, Frames.EME2000)
    r, v = jnp.asarray(o.r_km), jnp.asarray(o.v_km_s)
    for dcm_fn in (om.ric_dcm, om.vnc_dcm, om.rcn_dcm):
        d = np.asarray(dcm_fn(r, v))
        np.testing.assert_allclose(d @ d.T, np.eye(3), atol=1e-14)
        assert np.linalg.det(d) == pytest.approx(1.0)


def test_xmath_vector_utils():
    """tilde_matrix/rotv/projv parity with the reference's utils.rs
    (tilde_matrix:38, rotv, projv)."""
    from nyx_tpu import xmath

    a = jnp.asarray([1.0, 2.0, 3.0])
    b = jnp.asarray([-2.0, 0.5, 4.0])
    np.testing.assert_allclose(
        np.asarray(xmath.tilde_matrix(a) @ b), np.cross(a, b), atol=1e-15
    )
    # rotv: rotating x about z by 90 deg gives y
    out = xmath.rotv(
        jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 1.0]),
        jnp.asarray(np.pi / 2),
    )
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-15)
    # projv: projection onto b is parallel to b, residual orthogonal
    p = np.asarray(xmath.projv(a, b))
    np.testing.assert_allclose(np.cross(p, b), 0.0, atol=1e-12)
    assert abs(np.dot(np.asarray(a) - p, b)) < 1e-12


class TestExtendedStateParameters:
    """Equinoctial / geometric / Brouwer-mean parameters (md/param.rs +
    the ANISE OrbitalElement union of the reference's Dhall schema)."""

    def _state(self):
        from nyx_tpu import Epoch, Frames, Orbit

        e = Epoch.from_gregorian_utc(2021, 3, 4)
        o = Orbit.keplerian(8000.0, 0.15, 35.0, 40.0, 70.0, 120.0, e,
                            Frames.EME2000)
        y = np.concatenate([np.asarray(o.r_km), np.asarray(o.v_km_s),
                            [1.8, 2.2, 0.0]])
        return o, jnp.asarray(y), o.frame.mu, o.frame.radius_km

    def test_equinoctial_consistency(self):
        from nyx_tpu.md.param import value

        o, y, mu, rad = self._state()
        h = float(value("equinoctial_h", y, mu, rad))
        k = float(value("equinoctial_k", y, mu, rad))
        p = float(value("equinoctial_p", y, mu, rad))
        q = float(value("equinoctial_q", y, mu, rad))
        assert abs(np.hypot(h, k) - 0.15) < 1e-12
        assert abs(np.hypot(p, q) - np.tan(np.deg2rad(35.0) / 2)) < 1e-12
        assert abs(np.rad2deg(np.arctan2(h, k)) % 360.0 - 110.0) < 1e-9
        assert abs(np.rad2deg(np.arctan2(p, q)) % 360.0 - 40.0) < 1e-9

    def test_geometric_parameters(self):
        from nyx_tpu.md.param import value

        o, y, mu, rad = self._state()
        a, e = 8000.0, 0.15
        assert abs(float(value("semi_parameter", y, mu, rad)) - a * (1 - e**2)) < 1e-8
        assert abs(float(value("semi_minor_axis", y, mu, rad)) - a * np.sqrt(1 - e**2)) < 1e-8
        tl = float(value("true_longitude", y, mu, rad))
        assert abs(tl - (40.0 + 70.0 + 120.0) % 360.0) < 1e-9
        h = np.cross(np.asarray(o.r_km), np.asarray(o.v_km_s))
        for i, comp in enumerate(("hx", "hy", "hz")):
            assert abs(float(value(comp, y, mu, rad)) - h[i]) < 1e-9
        vd = float(value("velocity_declination", y, mu, rad))
        v = np.asarray(o.v_km_s)
        assert abs(vd - np.rad2deg(np.arcsin(v[2] / np.linalg.norm(v)))) < 1e-9

    def test_brouwer_mean_removes_j2_short_periodics(self):
        """Mean elements are near-constant under J2-only propagation while
        the osculating ones oscillate (BrouwerMeanShort semantics)."""
        from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
        from nyx_tpu.dynamics import (
            Harmonics,
            OrbitalDynamics,
            SpacecraftDynamics,
        )
        from nyx_tpu.io.gravity import GravityFieldData
        from nyx_tpu.md.param import value
        from nyx_tpu.propagators import IntegratorOptions, Propagator

        epoch = Epoch.from_gregorian_utc(2021, 3, 4)
        orbit = Orbit.keplerian(7136.6, 0.01, 51.6, 30.0, 65.0, 0.0, epoch,
                                Frames.EME2000)
        stor = GravityFieldData.from_j2(
            -1.082626925638815e-3 / np.sqrt(5.0), Frames.IAU_EARTH
        )
        dyn = SpacecraftDynamics.new(
            OrbitalDynamics.from_model(Harmonics.from_stor(stor), Frames.EME2000)
        )
        prop = Propagator.rk89(dyn, IntegratorOptions())
        _, traj = prop.with_state(
            Spacecraft.from_orbit(orbit)
        ).for_duration_with_traj(5 * 5925.0)
        ts = np.arange(0.0, 5 * 5925.0, 120.0)
        ys = jnp.asarray(np.stack([traj.interpolate(t) for t in ts]))
        mu, rad = orbit.frame.mu, orbit.frame.radius_km
        for name, factor in (("sma", 50.0), ("ecc", 50.0), ("inc", 5.0)):
            osc = np.asarray(value(name, ys, mu, rad))
            mean = np.asarray(value(f"brouwer_mean_short_{name}", ys, mu, rad))
            assert np.ptp(osc) > factor * np.ptp(mean), (
                f"{name}: osc p2p {np.ptp(osc):.2e} vs mean {np.ptp(mean):.2e}"
            )


def test_ric_difference():
    """Orbit.ric_difference: deltas expressed in the other's RIC frame
    (ANISE Orbit::ric_difference parity)."""
    e = Epoch.from_gregorian_utc(2021, 3, 4)
    a = Orbit.keplerian(7000.0, 0.001, 30.0, 10.0, 20.0, 30.0, e, Frames.EME2000)
    # purely radial offset
    r_hat = np.asarray(a.r_km) / np.linalg.norm(a.r_km)
    b = Orbit.cartesian(*(np.asarray(a.r_km) + 0.5 * r_hat),
                        *np.asarray(a.v_km_s), e, Frames.EME2000)
    d = b.ric_difference(a)
    np.testing.assert_allclose(np.asarray(d.r_km), [0.5, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.v_km_s), 0.0, atol=1e-12)
    assert abs(d.rmag_km - 0.5) < 1e-12
