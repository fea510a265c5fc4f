"""StateParameter: named scalar state queries.

Counterpart of the reference's `StateParameter` enum (md/param.rs:33-110):
targetable/exportable scalars over the 9-dim spacecraft state. Evaluation is
a pure batched function of the flat state vector plus the frame's GM, so the
same code drives host analysis, device event functions, guidance objectives
and targeter residuals.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cosmic import orbit as om
from ..errors import StateError

_R2D = 180.0 / jnp.pi


class StateParameter:
    SMA = "sma"
    ECC = "ecc"
    INC = "inc"
    RAAN = "raan"
    AOP = "aop"
    TA = "ta"
    EA = "ea"
    MA = "ma"
    RMAG = "rmag"
    VMAG = "vmag"
    X = "x"
    Y = "y"
    Z = "z"
    VX = "vx"
    VY = "vy"
    VZ = "vz"
    ENERGY = "energy"
    FPA = "fpa"
    DECLINATION = "declination"
    RIGHT_ASC = "right_asc"
    PERIAPSIS_RADIUS = "periapsis_radius"
    APOAPSIS_RADIUS = "apoapsis_radius"
    HEIGHT = "height"
    PERIAPSIS_HEIGHT = "periapsis_height"
    APOAPSIS_HEIGHT = "apoapsis_height"
    CR = "cr"
    CD = "cd"
    PROP_MASS = "prop_mass"
    HMAG = "hmag"
    C3 = "c3"
    PERIOD = "period"
    AOL = "aol"  # argument of latitude = aop + ta
    SEMI_PARAMETER = "semi_parameter"
    SEMI_MINOR_AXIS = "semi_minor_axis"
    TRUE_LONGITUDE = "true_longitude"
    VELOCITY_DECLINATION = "velocity_declination"
    HX = "hx"
    HY = "hy"
    HZ = "hz"
    HYPERBOLIC_ANOMALY = "hyperbolic_anomaly"
    EQUINOCTIAL_H = "equinoctial_h"
    EQUINOCTIAL_K = "equinoctial_k"
    EQUINOCTIAL_P = "equinoctial_p"
    EQUINOCTIAL_Q = "equinoctial_q"
    EQUINOCTIAL_LAMBDA = "equinoctial_lambda"
    BROUWER_MEAN_SHORT_SMA = "brouwer_mean_short_sma"
    BROUWER_MEAN_SHORT_ECC = "brouwer_mean_short_ecc"
    BROUWER_MEAN_SHORT_INC = "brouwer_mean_short_inc"
    BROUWER_MEAN_SHORT_RAAN = "brouwer_mean_short_raan"
    BROUWER_MEAN_SHORT_AOP = "brouwer_mean_short_aop"
    BROUWER_MEAN_SHORT_MA = "brouwer_mean_short_ma"
    BDOT_R = "bdot_r"  # hyperbolic B-plane B.R (km)
    BDOT_T = "bdot_t"  # hyperbolic B-plane B.T (km)
    B_LTOF = "b_ltof"  # linearized time of flight (s)
    # spacecraft-level parameters (param.rs Epoch/GuidanceMode/Isp/Thrust*,
    # DryMass/TotalMass): evaluated by Spacecraft.value_of, not by `value`
    # below, because they read the spacecraft config rather than the
    # 9-dim state vector
    EPOCH = "epoch_tai_s"
    GUIDANCE_MODE = "guidance_mode"
    ISP = "isp_s"
    THRUST = "thrust_n"
    THRUST_X = "thrust_x"
    THRUST_Y = "thrust_y"
    THRUST_Z = "thrust_z"
    DRY_MASS = "dry_mass"
    TOTAL_MASS = "total_mass"

    # default event-finding precision per parameter (value units), mirroring
    # md/param.rs default_event_precision
    DEFAULT_PRECISION = {
        "sma": 1e-3, "ecc": 1e-5, "inc": 1e-3, "raan": 1e-3, "aop": 1e-3,
        "ta": 1e-3, "ea": 1e-3, "ma": 1e-3, "rmag": 1e-3, "vmag": 1e-6,
        "height": 1e-3, "declination": 1e-3, "fpa": 1e-3, "aol": 1e-3,
    }

    ANGLES_DEG = {
        "inc", "raan", "aop", "ta", "ea", "ma", "fpa", "declination",
        "right_asc", "aol", "true_longitude", "velocity_declination",
        "hyperbolic_anomaly", "equinoctial_lambda",
        "brouwer_mean_short_inc", "brouwer_mean_short_raan",
        "brouwer_mean_short_aop", "brouwer_mean_short_ma",
    }


def value(param: str, y, mu: float, radius_km: float = 0.0):
    """Evaluate a StateParameter on flat state vectors y [..., >=6]."""
    r = y[..., 0:3]
    v = y[..., 3:6]
    p = param.lower()
    if p == "x":
        return y[..., 0]
    if p == "y":
        return y[..., 1]
    if p == "z":
        return y[..., 2]
    if p == "vx":
        return y[..., 3]
    if p == "vy":
        return y[..., 4]
    if p == "vz":
        return y[..., 5]
    if p == "cr":
        return y[..., 6]
    if p == "cd":
        return y[..., 7]
    if p == "prop_mass":
        return y[..., 8]
    rmag = jnp.linalg.norm(r, axis=-1)
    vmag = jnp.linalg.norm(v, axis=-1)
    if p == "rmag":
        return rmag
    if p == "vmag":
        return vmag
    if p == "height":
        return rmag - radius_km
    if p == "energy":
        return vmag**2 / 2 - mu / rmag
    if p == "hmag":
        return jnp.linalg.norm(jnp.cross(r, v), axis=-1)
    if p == "declination":
        return jnp.arcsin(r[..., 2] / rmag) * _R2D
    if p == "right_asc":
        return jnp.arctan2(r[..., 1], r[..., 0]) % (2 * jnp.pi) * _R2D
    if p == "fpa":
        rdotv = jnp.sum(r * v, axis=-1)
        return jnp.arcsin(rdotv / (rmag * vmag)) * _R2D
    if p == "velocity_declination":
        return jnp.arcsin(v[..., 2] / vmag) * _R2D
    if p in ("hx", "hy", "hz"):
        h = jnp.cross(r, v)
        return h[..., {"hx": 0, "hy": 1, "hz": 2}[p]]

    el = om.keplerian_from_cartesian(r, v, mu)
    if p == "semi_parameter":
        return el["sma"] * (1 - el["ecc"] ** 2)
    if p == "semi_minor_axis":
        return el["sma"] * jnp.sqrt(jnp.abs(1 - el["ecc"] ** 2))
    if p == "true_longitude":
        return (el["raan"] + el["aop"] + el["ta"]) % (2 * jnp.pi) * _R2D
    if p == "hyperbolic_anomaly":
        e, ta = el["ecc"], el["ta"]
        # H from nu: tanh(H/2) = sqrt((e-1)/(e+1)) tan(nu/2)
        th = jnp.sqrt(jnp.abs((e - 1) / (e + 1))) * jnp.tan(ta / 2)
        return jnp.arctanh(jnp.clip(th, -1 + 1e-15, 1 - 1e-15)) * 2 * _R2D
    if p.startswith("equinoctial_"):
        e, i = el["ecc"], el["inc"]
        raan, aop = el["raan"], el["aop"]
        if p == "equinoctial_h":
            return e * jnp.sin(aop + raan)
        if p == "equinoctial_k":
            return e * jnp.cos(aop + raan)
        if p == "equinoctial_p":
            return jnp.tan(i / 2) * jnp.sin(raan)
        if p == "equinoctial_q":
            return jnp.tan(i / 2) * jnp.cos(raan)
        if p == "equinoctial_lambda":
            ea = om.true_to_ecc_anomaly(el["ta"], e)
            ma = om.ecc_to_mean_anomaly(ea, e)
            return (ma + aop + raan) % (2 * jnp.pi) * _R2D
    if p.startswith("brouwer_mean_short_"):
        mean = _brouwer_mean_short(el, mu, radius_km)
        key = p[len("brouwer_mean_short_"):]
        out = mean[key]
        return out * _R2D if key in ("inc", "raan", "aop", "ma") else out
    if p == "sma":
        return el["sma"]
    if p == "ecc":
        return el["ecc"]
    if p == "inc":
        return el["inc"] * _R2D
    if p == "raan":
        return el["raan"] * _R2D
    if p == "aop":
        return el["aop"] * _R2D
    if p == "ta":
        return el["ta"] * _R2D
    if p == "aol":
        return (el["aop"] + el["ta"]) % (2 * jnp.pi) * _R2D
    if p == "ea":
        return om.true_to_ecc_anomaly(el["ta"], el["ecc"]) * _R2D
    if p == "ma":
        ea = om.true_to_ecc_anomaly(el["ta"], el["ecc"])
        return om.ecc_to_mean_anomaly(ea, el["ecc"]) * _R2D
    if p == "periapsis_radius":
        return el["sma"] * (1 - el["ecc"])
    if p == "apoapsis_radius":
        return el["sma"] * (1 + el["ecc"])
    if p == "periapsis_height":
        return el["sma"] * (1 - el["ecc"]) - radius_km
    if p == "apoapsis_height":
        return el["sma"] * (1 + el["ecc"]) - radius_km
    if p == "c3":
        return -mu / el["sma"]
    if p == "period":
        return 2 * jnp.pi * jnp.sqrt(jnp.abs(el["sma"]) ** 3 / mu)
    if p in ("bdot_r", "bdot_t", "b_ltof"):
        from ..cosmic.bplane import bplane_from_rv

        b_r, b_t, ltof, _ = bplane_from_rv(r, v, mu)
        return {"bdot_r": b_r, "bdot_t": b_t, "b_ltof": ltof}[p]
    raise StateError(f"unknown StateParameter {param!r}")


def default_precision(param: str) -> float:
    return StateParameter.DEFAULT_PRECISION.get(param.lower(), 1e-3)


#: Earth J2 (GMAT/EGM96 value) — the BrouwerMeanShort parameters are
#: defined for Earth orbits, as in the reference's ANISE-backed enum
_EARTH_J2 = 1.082626925638815e-3


def _brouwer_mean_short(el, mu, radius_km):
    """First-order J2 osculating -> mean (short-periodics removed) element
    mapping — Brouwer's artillery solution in the Lyddane-stabilized form
    (Schaub & Junkins, "Analytical Mechanics of Space Systems", first-order
    mapping appendix; GMAT's BrouwerMeanShort). Batched, jittable.

    Returns dict(sma, ecc, inc, raan, aop, ma) — angles in radians.
    """
    a, e, i = el["sma"], el["ecc"], el["inc"]
    Om, w, f = el["raan"], el["aop"], el["ta"]
    ea = om.true_to_ecc_anomaly(f, e)
    M = om.ecc_to_mean_anomaly(ea, e)
    req = radius_km if radius_km else 6378.1363

    gma2 = -_EARTH_J2 / 2.0 * (req / a) ** 2  # osc -> mean sign
    eta = jnp.sqrt(1.0 - e**2)
    gma2p = gma2 / eta**4
    th = jnp.cos(i)
    th2 = th * th
    crit = 1.0 - 5.0 * th2  # critical-inclination divisor
    a_r = (1.0 + e * jnp.cos(f)) / eta**2
    cf = jnp.cos(f)

    am = a + a * gma2 * (
        (3 * th2 - 1) * (a_r**3 - 1.0 / eta**3)
        + 3 * (1 - th2) * a_r**3 * jnp.cos(2 * w + 2 * f)
    )

    de1 = (
        gma2p / 8.0 * e * eta**2
        * (1 - 11 * th2 - 40 * th2 * th2 / crit) * jnp.cos(2 * w)
    )
    de = de1 + eta**2 / 2.0 * (
        gma2 * (
            (3 * th2 - 1) / eta**6
            * (e * eta + e / (1 + eta) + 3 * cf + 3 * e * cf**2 + e**2 * cf**3)
            + 3 * (1 - th2) / eta**6
            * (e + 3 * cf + 3 * e * cf**2 + e**2 * cf**3)
            * jnp.cos(2 * w + 2 * f)
        )
        - gma2p * (1 - th2)
        * (3 * jnp.cos(2 * w + f) + jnp.cos(2 * w + 3 * f))
    )

    di = (
        -e * de1 / (eta**2 * jnp.tan(i))
        + gma2p / 2.0 * th * jnp.sqrt(1 - th2)
        * (3 * jnp.cos(2 * w + 2 * f) + 3 * e * jnp.cos(2 * w + f)
           + e * jnp.cos(2 * w + 3 * f))
    )

    mwo = (
        M + w + Om
        + gma2p / 8.0 * eta**3 * (1 - 11 * th2 - 40 * th2 * th2 / crit)
        - gma2p / 16.0 * (
            2 + e**2 - 11 * (2 + 3 * e**2) * th2
            - 40 * (2 + 5 * e**2) * th2 * th2 / crit
            - 400 * e**2 * th2**3 / crit**2
        )
        + gma2p / 4.0 * (
            -6 * crit * (f - M + e * jnp.sin(f))
            + (3 - 5 * th2) * (
                3 * jnp.sin(2 * w + 2 * f) + 3 * e * jnp.sin(2 * w + f)
                + e * jnp.sin(2 * w + 3 * f)
            )
        )
        - gma2p / 8.0 * e**2 * th * (
            11 + 80 * th2 / crit + 200 * th2 * th2 / crit**2
        )
        - gma2p / 2.0 * th * (
            6 * (f - M + e * jnp.sin(f))
            - 3 * jnp.sin(2 * w + 2 * f) - 3 * e * jnp.sin(2 * w + f)
            - e * jnp.sin(2 * w + 3 * f)
        )
    )

    edm = (
        gma2p / 8.0 * e * eta**3 * (1 - 11 * th2 - 40 * th2 * th2 / crit)
        - gma2p / 4.0 * eta**3 * (
            2 * (3 * th2 - 1) * ((a_r * eta) ** 2 + a_r + 1) * jnp.sin(f)
            + 3 * (1 - th2) * (
                (-((a_r * eta) ** 2) - a_r + 1) * jnp.sin(2 * w + f)
                + ((a_r * eta) ** 2 + a_r + 1.0 / 3.0)
                * jnp.sin(2 * w + 3 * f)
            )
        )
    )

    dom = (
        -gma2p / 8.0 * e**2 * th * (
            11 + 80 * th2 / crit + 200 * th2 * th2 / crit**2
        )
        - gma2p / 2.0 * th * (
            6 * (f - M + e * jnp.sin(f))
            - 3 * jnp.sin(2 * w + 2 * f) - 3 * e * jnp.sin(2 * w + f)
            - e * jnp.sin(2 * w + 3 * f)
        )
    )

    # Lyddane combinations avoid small-e / small-i indeterminacy
    d1 = (e + de) * jnp.sin(M) + edm * jnp.cos(M)
    d2 = (e + de) * jnp.cos(M) - edm * jnp.sin(M)
    m_mean = jnp.arctan2(d1, d2) % (2 * jnp.pi)
    e_mean = jnp.sqrt(d1**2 + d2**2)
    si2 = jnp.sin(i / 2)
    d3 = (si2 + jnp.cos(i / 2) * di / 2) * jnp.sin(Om) + si2 * dom * jnp.cos(Om)
    d4 = (si2 + jnp.cos(i / 2) * di / 2) * jnp.cos(Om) - si2 * dom * jnp.sin(Om)
    om_mean = jnp.arctan2(d3, d4) % (2 * jnp.pi)
    i_mean = 2 * jnp.arcsin(jnp.sqrt(d3**2 + d4**2))
    w_mean = (mwo - m_mean - om_mean) % (2 * jnp.pi)

    return dict(
        sma=am, ecc=e_mean, inc=i_mean, raan=om_mean, aop=w_mean, ma=m_mean
    )
