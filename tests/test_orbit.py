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
