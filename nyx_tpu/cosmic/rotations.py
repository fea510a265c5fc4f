"""Inertial <-> body-fixed orientation models (device functions).

IAU analytic orientation models (IAU WG on Cartographic Coordinates 2009
report values) for the bodies the reference supports through its planetary
constants kernel. The reference delegates rotations to ANISE
(e.g. nyx-core/src/dynamics/gravity_field.rs:168-186 rotates states into the
gravity field's body-fixed frame); here each model is a pure JAX function of
TDB seconds past J2000 returning a 3x3 DCM, differentiable and batchable.

High-precision Earth orientation (ITRF93 from binary PCK Chebyshev data) is
supported through the same interface when a real `.bpc` file is loaded into
the Almanac (see nyx_tpu/ephem/); the analytic IAU model is the fallback.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..xmath import linear_angle_deg, reduce_deg

_D2R = jnp.pi / 180.0
_DAYS_PER_CENTURY = 36_525.0


def rot1(theta):
    """Rotation about X by theta (radians). Frame rotation (transposed vector rot)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, s], -1),
            jnp.stack([z, -s, c], -1),
        ],
        -2,
    )


def rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, z, -s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([s, z, c], -1),
        ],
        -2,
    )


def rot3(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [
            jnp.stack([c, s, z], -1),
            jnp.stack([-s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def dcm_from_euler_ra_dec_w(alpha_deg, delta_deg, w_deg):
    """ICRF -> body-fixed DCM from IAU (RA, DEC, prime meridian) angles.

    Angles are reduced mod 360 in exact arithmetic before the trig calls
    (TPU f64 trig loses accuracy on large arguments; see nyx_tpu.xmath).

    The 3-1-3 composition R3(w) R1(pi/2-delta) R3(pi/2+alpha) is expanded in
    closed form: batched [B,3,3]@[B,3,3] products lower to padded f64
    dot_generals on TPU (~10x the cost of the whole gravity recursion);
    the elementwise expansion stays on the VPU.
    """
    alpha = reduce_deg(alpha_deg) * _D2R
    delta = reduce_deg(delta_deg) * _D2R
    w = reduce_deg(w_deg) * _D2R
    b = jnp.pi / 2 - delta
    c = jnp.pi / 2 + alpha
    cw, sw = jnp.cos(w), jnp.sin(w)
    cb, sb = jnp.cos(b), jnp.sin(b)
    cc, sc = jnp.cos(c), jnp.sin(c)
    # M = R1(b) @ R3(c)
    m00, m01, m02 = cc, sc, jnp.zeros_like(cc)
    m10, m11, m12 = -cb * sc, cb * cc, sb
    m20, m21, m22 = sb * sc, -sb * cc, cb
    # R3(w) @ M
    return jnp.stack(
        [
            jnp.stack([cw * m00 + sw * m10, cw * m01 + sw * m11, cw * m02 + sw * m12], -1),
            jnp.stack([-sw * m00 + cw * m10, -sw * m01 + cw * m11, -sw * m02 + cw * m12], -1),
            jnp.stack([m20, m21, m22], -1),
        ],
        -2,
    )


def iau_earth_angles(t_tdb_s):
    """IAU_EARTH orientation angles (deg) at TDB seconds past J2000."""
    d = t_tdb_s / 86_400.0
    T = d / _DAYS_PER_CENTURY
    alpha = 0.0 - 0.641 * T
    delta = 90.0 - 0.557 * T
    w = linear_angle_deg(190.147, 360.985_623_5, d)
    return alpha, delta, w


def iau_earth_dcm(t_tdb_s):
    """J2000 -> IAU_EARTH body-fixed DCM."""
    a, de, w = iau_earth_angles(t_tdb_s)
    return dcm_from_euler_ra_dec_w(a, de, w)


def iau_earth_dcm32_pole(t_tdb_s):
    """(dcm_f32 [..,3,3], pole_f64 [..,3]) — the TPU split-precision fast
    path for the gravity rotation (Harmonics.accel, precision="split").

    The pole row must stay f64 (it feeds the closed-form J2/J3, whose
    direction sensitivity integrates to meters/day), but it depends only
    on the slow precession angles alpha = -0.641 T and 90 - delta =
    0.557 T deg (|arg| < 1e-2 rad for a century around J2000), so
    small-angle polynomials are f64-exact with ZERO transcendentals.
    The fast rotation angle w only enters rows 0/1, which feed the f32
    field evaluation: f64 angle reduction + f32 trig leaves ~4e-7 rad on
    the field evaluation point — ~1e-13 km/s^2 on the post-J2J3 field
    terms. f64 sin/cos are emulated on TPU (~0.5 ms per [1e5] batch per
    pair); this path eliminates all six.
    """
    d = t_tdb_s / 86_400.0
    T = d / _DAYS_PER_CENTURY
    a = -0.641 * T * _D2R  # alpha (rad), small for |T| < 1 century
    b = 0.557 * T * _D2R  # pi/2 - delta (rad), small
    a2 = a * a
    b2 = b * b
    sb = b * (1.0 - b2 * (1.0 / 6.0))
    cb = 1.0 - b2 * 0.5 * (1.0 - b2 * (1.0 / 12.0))
    # c = pi/2 + alpha: sin(c) = cos(alpha), cos(c) = -sin(alpha)
    sc = 1.0 - a2 * 0.5 * (1.0 - a2 * (1.0 / 12.0))
    cc = -(a * (1.0 - a2 * (1.0 / 6.0)))
    pole = jnp.stack([sb * sc, -sb * cc, cb], -1)  # f64

    w32 = (
        linear_angle_deg(190.147, 360.985_623_5, d) * _D2R
    ).astype(jnp.float32)
    cw, sw = jnp.cos(w32), jnp.sin(w32)
    f32 = jnp.float32
    cb32, sb32 = cb.astype(f32), sb.astype(f32)
    cc32, sc32 = cc.astype(f32), sc.astype(f32)
    m00, m01 = cc32, sc32
    m10, m11, m12 = -cb32 * sc32, cb32 * cc32, sb32
    row0 = jnp.stack([cw * m00 + sw * m10, cw * m01 + sw * m11, sw * m12], -1)
    row1 = jnp.stack(
        [-sw * m00 + cw * m10, -sw * m01 + cw * m11, cw * m12], -1
    )
    dcm32 = jnp.stack([row0, row1, pole.astype(f32)], -2)
    return dcm32, pole


# IAU 2009 lunar orientation series. Angles E1..E13 (deg, deg/day).
_MOON_E = jnp.array(
    [
        [125.045, -0.0529921],
        [250.089, -0.1059842],
        [260.008, 13.0120009],
        [176.625, 13.3407154],
        [357.529, 0.9856003],
        [311.589, 26.4057084],
        [134.963, 13.0649930],
        [276.617, 0.3287146],
        [34.226, 1.7484877],
        [15.134, -0.1589763],
        [119.743, 0.0036096],
        [239.961, 0.1643573],
        [25.053, 12.9590088],
    ]
)

_MOON_ALPHA_SIN = jnp.array(
    [-3.8787, -0.1204, 0.0700, -0.0172, 0.0, 0.0072, 0.0, 0.0, 0.0, -0.0052, 0.0, 0.0, 0.0043]
)
_MOON_DELTA_COS = jnp.array(
    [1.5419, 0.0239, -0.0278, 0.0068, 0.0, -0.0029, 0.0009, 0.0, 0.0, 0.0008, 0.0, 0.0, -0.0009]
)
_MOON_W_SIN = jnp.array(
    [3.5610, 0.1208, -0.0642, 0.0158, 0.0252, -0.0066, -0.0047, -0.0046, 0.0028, 0.0052, 0.0040, 0.0019, -0.0044]
)


def iau_moon_angles(t_tdb_s):
    """IAU_MOON orientation angles (deg); mean-Earth/polar-axis style IAU model."""
    d = t_tdb_s / 86_400.0
    T = d / _DAYS_PER_CENTURY
    e = (
        linear_angle_deg(_MOON_E[:, 0], _MOON_E[:, 1], jnp.expand_dims(d, -1))
        * _D2R
    )
    alpha = 269.9949 + 0.0031 * T + jnp.sum(_MOON_ALPHA_SIN * jnp.sin(e), axis=-1)
    delta = 66.5392 + 0.0130 * T + jnp.sum(_MOON_DELTA_COS * jnp.cos(e), axis=-1)
    w = (
        linear_angle_deg(38.3213, 13.176_358_15, d)
        - 1.4e-12 * d * d
        + jnp.sum(_MOON_W_SIN * jnp.sin(e), axis=-1)
    )
    return alpha, delta, w


def iau_moon_dcm(t_tdb_s):
    a, de, w = iau_moon_angles(t_tdb_s)
    return dcm_from_euler_ra_dec_w(a, de, w)


def iau_mars_dcm(t_tdb_s):
    d = t_tdb_s / 86_400.0
    T = d / _DAYS_PER_CENTURY
    return dcm_from_euler_ra_dec_w(
        317.68143 - 0.1061 * T,
        52.88650 - 0.0609 * T,
        linear_angle_deg(176.630, 350.891_982_26, d),
    )


def iau_sun_dcm(t_tdb_s):
    d = t_tdb_s / 86_400.0
    return dcm_from_euler_ra_dec_w(
        286.13, 63.87, linear_angle_deg(84.176, 14.1844000, d)
    )


def apply_dcm(dcm, v):
    """dcm [...,3,3] @ v [...,3] expanded elementwise (VPU-friendly; the
    einsum/dot_general form pads tiny dims onto the MXU in f64)."""
    return jnp.stack(
        [
            dcm[..., 0, 0] * v[..., 0] + dcm[..., 0, 1] * v[..., 1] + dcm[..., 0, 2] * v[..., 2],
            dcm[..., 1, 0] * v[..., 0] + dcm[..., 1, 1] * v[..., 1] + dcm[..., 1, 2] * v[..., 2],
            dcm[..., 2, 0] * v[..., 0] + dcm[..., 2, 1] * v[..., 1] + dcm[..., 2, 2] * v[..., 2],
        ],
        -1,
    )


def apply_dcm_t(dcm, v):
    """dcm^T [...,3,3] @ v [...,3] expanded elementwise."""
    return jnp.stack(
        [
            dcm[..., 0, 0] * v[..., 0] + dcm[..., 1, 0] * v[..., 1] + dcm[..., 2, 0] * v[..., 2],
            dcm[..., 0, 1] * v[..., 0] + dcm[..., 1, 1] * v[..., 1] + dcm[..., 2, 1] * v[..., 2],
            dcm[..., 0, 2] * v[..., 0] + dcm[..., 1, 2] * v[..., 1] + dcm[..., 2, 2] * v[..., 2],
        ],
        -1,
    )
