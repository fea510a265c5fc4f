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
        "right_asc", "aol",
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

    el = om.keplerian_from_cartesian(r, v, mu)
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
