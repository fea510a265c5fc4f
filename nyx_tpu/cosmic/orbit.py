"""Orbital state and Keplerian element machinery.

Replaces the ANISE `Orbit` type the reference builds on (constructors
`Orbit::cartesian` / `Orbit::keplerian`, element accessors used throughout
`md/param.rs` StateParameters). Element conversions are pure JAX functions
over trailing-dimension arrays so they vmap/grad cleanly; the host `Orbit`
class is a thin convenience wrapper (scalar states, degrees for angles as in
the reference API).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..time import Epoch
from .frames import Frame, Frames

_EPS = 1e-12


def _norm(x, axis=-1):
    return jnp.sqrt(jnp.sum(x * x, axis=axis))


def keplerian_from_cartesian(r, v, mu):
    """Osculating Keplerian elements from Cartesian state.

    Args:
      r: [..., 3] position, km. v: [..., 3] velocity, km/s. mu: km^3/s^2.
    Returns:
      dict with sma (km), ecc, inc, raan, aop, ta (radians in [0, 2pi)).
    Singular cases (circular/equatorial) resolve to 0 angles, like the
    reference's underlying ANISE implementation.
    """
    rmag = _norm(r)
    vmag = _norm(v)
    h = jnp.cross(r, v)
    hmag = _norm(h)
    n = jnp.stack([-h[..., 1], h[..., 0], jnp.zeros_like(hmag)], axis=-1)
    nmag = _norm(n)
    rdotv = jnp.sum(r * v, axis=-1)
    e_vec = ((vmag**2 - mu / rmag)[..., None] * r - rdotv[..., None] * v) / mu
    ecc = _norm(e_vec)
    energy = vmag**2 / 2 - mu / rmag
    sma = -mu / (2 * energy)
    inc = jnp.arccos(jnp.clip(h[..., 2] / hmag, -1.0, 1.0))

    circ = ecc < 1e-11
    equa = nmag < 1e-11

    # Angles via atan2 rather than quadrant-corrected arccos: identical
    # values, but smooth AD everywhere on the non-singular set — the
    # arccos form has an infinite derivative exactly at ta/aop/raan = 0 or
    # pi, which is where circular-ish test orbits start, and
    # KfEstimate.keplerian_covar differentiates through this map.
    # (atan2(k*sin, k*cos) == atan2(sin, cos) for any k > 0, so the common
    # positive factors are left uncancelled.)
    h_unit = h / hmag[..., None]
    raan = jnp.arctan2(n[..., 1], n[..., 0]) % (2 * jnp.pi)
    raan = jnp.where(equa, 0.0, raan)

    ne = jnp.sum(n * e_vec, axis=-1)
    sin_aop = jnp.sum(jnp.cross(n, e_vec) * h_unit, axis=-1)
    aop = jnp.arctan2(sin_aop, ne) % (2 * jnp.pi)
    # equatorial non-circular: use longitude of periapsis
    aop_eq = jnp.arctan2(e_vec[..., 1], e_vec[..., 0]) % (2 * jnp.pi)
    aop = jnp.where(equa, aop_eq, aop)
    aop = jnp.where(circ, 0.0, aop)

    re = jnp.sum(r * e_vec, axis=-1)
    sin_ta = jnp.sum(jnp.cross(e_vec, r) * h_unit, axis=-1)
    ta = jnp.arctan2(sin_ta, re) % (2 * jnp.pi)
    # circular: argument of latitude relative to node (or true longitude)
    ta_circ = jnp.arctan2(
        jnp.sum(jnp.cross(n, r) * h_unit, axis=-1), jnp.sum(n * r, axis=-1)
    ) % (2 * jnp.pi)
    ta_circ_eq = jnp.arctan2(r[..., 1], r[..., 0]) % (2 * jnp.pi)
    ta = jnp.where(circ, jnp.where(equa, ta_circ_eq, ta_circ), ta)
    return {"sma": sma, "ecc": ecc, "inc": inc, "raan": raan, "aop": aop, "ta": ta}


def cartesian_from_keplerian(sma, ecc, inc, raan, aop, ta, mu):
    """Cartesian state from Keplerian elements (angles in radians).

    Supports elliptic and hyperbolic orbits (sma < 0, ecc > 1).
    Returns (r[...,3], v[...,3]).
    """
    p = sma * (1 - ecc**2)
    rmag = p / (1 + ecc * jnp.cos(ta))
    # perifocal
    cta, sta = jnp.cos(ta), jnp.sin(ta)
    r_pqw = jnp.stack([rmag * cta, rmag * sta, jnp.zeros_like(rmag)], axis=-1)
    f = jnp.sqrt(mu / p)
    v_pqw = jnp.stack([-f * sta, f * (ecc + cta), jnp.zeros_like(rmag)], axis=-1)

    cr, sr = jnp.cos(raan), jnp.sin(raan)
    ci, si = jnp.cos(inc), jnp.sin(inc)
    cw, sw = jnp.cos(aop), jnp.sin(aop)
    # PQW -> IJK rotation (Rz(-raan) Rx(-inc) Rz(-aop))
    row0 = jnp.stack(
        [cr * cw - sr * sw * ci, -cr * sw - sr * cw * ci, sr * si], axis=-1
    )
    row1 = jnp.stack(
        [sr * cw + cr * sw * ci, -sr * sw + cr * cw * ci, -cr * si], axis=-1
    )
    row2 = jnp.stack([sw * si, cw * si, ci], axis=-1)
    dcm = jnp.stack([row0, row1, row2], axis=-2)
    r = jnp.einsum("...ij,...j->...i", dcm, r_pqw)
    v = jnp.einsum("...ij,...j->...i", dcm, v_pqw)
    return r, v


def true_to_ecc_anomaly(ta, ecc):
    """True -> eccentric (elliptic) or hyperbolic anomaly."""
    ell = jnp.arctan2(jnp.sqrt(jnp.clip(1 - ecc**2, _EPS)) * jnp.sin(ta),
                      ecc + jnp.cos(ta))
    # hyperbolic: H = 2 atanh( sqrt((e-1)/(e+1)) tan(ta/2) )
    arg = jnp.sqrt(jnp.clip((ecc - 1) / (ecc + 1), _EPS)) * jnp.tan(ta / 2)
    hyp = 2 * jnp.arctanh(jnp.clip(arg, -1 + _EPS, 1 - _EPS))
    return jnp.where(ecc < 1.0, ell, hyp)


def ecc_to_mean_anomaly(ea, ecc):
    ell = ea - ecc * jnp.sin(ea)
    hyp = ecc * jnp.sinh(ea) - ea
    return jnp.where(ecc < 1.0, ell, hyp)


def mean_to_ecc_anomaly(ma, ecc, iters: int = 20):
    """Kepler's equation by Newton iteration (fixed count: device-safe)."""
    def ell_body(_, ea):
        f = ea - ecc * jnp.sin(ea) - ma
        fp = 1 - ecc * jnp.cos(ea)
        return ea - f / fp

    def hyp_body(_, hh):
        f = ecc * jnp.sinh(hh) - hh - ma
        fp = ecc * jnp.cosh(hh) - 1
        return hh - f / fp

    ea0 = jnp.where(ecc < 0.8, ma, jnp.pi * jnp.ones_like(ma))
    ell = jax.lax.fori_loop(0, iters, ell_body, ea0)
    h0 = jnp.arcsinh(ma / jnp.maximum(ecc, 1 + _EPS))
    hyp = jax.lax.fori_loop(0, iters, hyp_body, h0)
    return jnp.where(ecc < 1.0, ell, hyp)


def ecc_to_true_anomaly(ea, ecc):
    ell = 2 * jnp.arctan2(
        jnp.sqrt(jnp.clip(1 + ecc, _EPS)) * jnp.sin(ea / 2),
        jnp.sqrt(jnp.clip(1 - ecc, _EPS)) * jnp.cos(ea / 2),
    )
    hyp = 2 * jnp.arctan(
        jnp.sqrt(jnp.clip((ecc + 1) / (ecc - 1), _EPS)) * jnp.tanh(ea / 2)
    )
    return jnp.where(ecc < 1.0, ell, hyp)


def keplerian_propagate(r, v, mu, dt, iters: int = 20):
    """Analytic two-body propagation by dt seconds (elliptic), via mean anomaly."""
    el = keplerian_from_cartesian(r, v, mu)
    n = jnp.sqrt(mu / jnp.abs(el["sma"]) ** 3)
    ea0 = true_to_ecc_anomaly(el["ta"], el["ecc"])
    ma0 = ecc_to_mean_anomaly(ea0, el["ecc"])
    ma = ma0 + n * dt
    ea = mean_to_ecc_anomaly(ma, el["ecc"], iters)
    ta = ecc_to_true_anomaly(ea, el["ecc"])
    return cartesian_from_keplerian(
        el["sma"], el["ecc"], el["inc"], el["raan"], el["aop"], ta, mu
    )


# --- local orbital frames (RIC / VNC / RCN), used by maneuvers, SNC, covar ---

def ric_dcm(r, v):
    """DCM from inertial to RIC (radial, in-track, cross-track) frame rows."""
    rhat = r / _norm(r)[..., None]
    h = jnp.cross(r, v)
    chat = h / _norm(h)[..., None]
    ihat = jnp.cross(chat, rhat)
    return jnp.stack([rhat, ihat, chat], axis=-2)


def vnc_dcm(r, v):
    """DCM from inertial to VNC (velocity, normal, co-normal) frame rows."""
    vhat = v / _norm(v)[..., None]
    h = jnp.cross(r, v)
    nhat = h / _norm(h)[..., None]
    chat = jnp.cross(vhat, nhat)
    return jnp.stack([vhat, nhat, chat], axis=-2)


def rcn_dcm(r, v):
    """DCM from inertial to RCN (radial, cross, normal) frame rows."""
    rhat = r / _norm(r)[..., None]
    h = jnp.cross(r, v)
    nhat = h / _norm(h)[..., None]
    chat = jnp.cross(nhat, rhat)
    return jnp.stack([rhat, chat, nhat], axis=-2)


_R2D = 180.0 / np.pi
_D2R = np.pi / 180.0


def _cpu():
    """Host-side scalar work runs on the CPU backend: TPU scalar dispatch is
    slow and TPU transcendentals take a low-precision path for scalar shapes
    (see nyx_tpu.xmath)."""
    return jax.default_device(jax.devices("cpu")[0])


@dataclass
class Orbit:
    """A Cartesian orbital state at an epoch in a frame (host convenience type).

    Mirrors ANISE's Orbit as used by the reference: `Orbit::cartesian`
    (propagators.rs:37-40) and `Orbit::keplerian` with degrees for angles.
    """

    r_km: np.ndarray  # (3,)
    v_km_s: np.ndarray  # (3,)
    epoch: Epoch
    frame: Frame

    @classmethod
    def cartesian(cls, x, y, z, vx, vy, vz, epoch: Epoch, frame: Frame) -> "Orbit":
        return cls(
            np.array([x, y, z], dtype=np.float64),
            np.array([vx, vy, vz], dtype=np.float64),
            epoch,
            frame,
        )

    @classmethod
    def keplerian(
        cls, sma_km, ecc, inc_deg, raan_deg, aop_deg, ta_deg, epoch: Epoch, frame: Frame
    ) -> "Orbit":
        with _cpu():
            r, v = cartesian_from_keplerian(
                jnp.float64(sma_km),
                jnp.float64(ecc),
                jnp.float64(inc_deg * _D2R),
                jnp.float64(raan_deg * _D2R),
                jnp.float64(aop_deg * _D2R),
                jnp.float64(ta_deg * _D2R),
                frame.mu,
            )
        return cls(np.asarray(r), np.asarray(v), epoch, frame)

    @classmethod
    def keplerian_apsis_radii(
        cls, ra_km, rp_km, inc_deg, raan_deg, aop_deg, ta_deg, epoch, frame
    ) -> "Orbit":
        sma = (ra_km + rp_km) / 2
        ecc = (ra_km - rp_km) / (ra_km + rp_km)
        return cls.keplerian(sma, ecc, inc_deg, raan_deg, aop_deg, ta_deg, epoch, frame)

    # -- vector accessors --------------------------------------------
    def to_cartesian_pos_vel(self) -> np.ndarray:
        return np.concatenate([self.r_km, self.v_km_s])

    @property
    def rmag_km(self) -> float:
        return float(np.linalg.norm(self.r_km))

    @property
    def vmag_km_s(self) -> float:
        return float(np.linalg.norm(self.v_km_s))

    def ric_difference(self, other: "Orbit") -> "Orbit":
        """This orbit minus `other`, expressed in OTHER's RIC frame (the
        ANISE Orbit::ric_difference used throughout the reference's OD
        reporting): returns an Orbit whose r/v are the RIC deltas."""
        from dataclasses import replace as _replace

        dcm = np.asarray(
            ric_dcm(jnp.asarray(other.r_km), jnp.asarray(other.v_km_s))
        )
        dr = dcm @ (np.asarray(self.r_km) - np.asarray(other.r_km))
        dv = dcm @ (np.asarray(self.v_km_s) - np.asarray(other.v_km_s))
        return _replace(self, r_km=dr, v_km_s=dv)

    def _kep(self):
        with _cpu():
            return jax.tree_util.tree_map(
                float,
                keplerian_from_cartesian(
                    jnp.asarray(self.r_km), jnp.asarray(self.v_km_s), self.frame.mu
                ),
            )

    @property
    def sma_km(self) -> float:
        return self._kep()["sma"]

    @property
    def ecc(self) -> float:
        return self._kep()["ecc"]

    @property
    def inc_deg(self) -> float:
        return self._kep()["inc"] * _R2D

    @property
    def raan_deg(self) -> float:
        return self._kep()["raan"] * _R2D

    @property
    def aop_deg(self) -> float:
        return self._kep()["aop"] * _R2D

    @property
    def ta_deg(self) -> float:
        return self._kep()["ta"] * _R2D

    @property
    def ea_deg(self) -> float:
        k = self._kep()
        with _cpu():
            return float(true_to_ecc_anomaly(k["ta"], k["ecc"])) * _R2D

    @property
    def ma_deg(self) -> float:
        k = self._kep()
        with _cpu():
            ea = true_to_ecc_anomaly(jnp.float64(k["ta"]), jnp.float64(k["ecc"]))
            return float(ecc_to_mean_anomaly(ea, jnp.float64(k["ecc"]))) * _R2D

    @property
    def energy_km2_s2(self) -> float:
        return self.vmag_km_s**2 / 2 - self.frame.mu / self.rmag_km

    @property
    def period_s(self) -> float:
        sma = self.sma_km
        if sma <= 0:
            return float("nan")
        return 2 * np.pi * np.sqrt(sma**3 / self.frame.mu)

    @property
    def periapsis_km(self) -> float:
        k = self._kep()
        return k["sma"] * (1 - k["ecc"])

    @property
    def apoapsis_km(self) -> float:
        k = self._kep()
        return k["sma"] * (1 + k["ecc"])

    @property
    def periapsis_altitude_km(self) -> float:
        return self.periapsis_km - (self.frame.radius_km or 0.0)

    @property
    def apoapsis_altitude_km(self) -> float:
        return self.apoapsis_km - (self.frame.radius_km or 0.0)

    @property
    def hmag(self) -> float:
        return float(np.linalg.norm(np.cross(self.r_km, self.v_km_s)))

    @property
    def c3_km2_s2(self) -> float:
        return -self.frame.mu / self.sma_km

    @property
    def declination_deg(self) -> float:
        return float(np.degrees(np.arcsin(self.r_km[2] / self.rmag_km)))

    @property
    def right_ascension_deg(self) -> float:
        return float(np.degrees(np.arctan2(self.r_km[1], self.r_km[0])) % 360.0)

    @property
    def fpa_deg(self) -> float:
        rdotv = float(np.dot(self.r_km, self.v_km_s))
        return float(
            np.degrees(np.arcsin(rdotv / (self.rmag_km * self.vmag_km_s)))
        )

    def value(self, param: str) -> float:
        """Evaluate any StateParameter on this orbit (md/param.rs value)."""
        from ..md.param import value as param_value

        y = np.concatenate([self.r_km, self.v_km_s, [0.0, 0.0, 0.0]])
        with _cpu():
            return float(
                param_value(param, jnp.asarray(y), self.frame.mu,
                            self.frame.radius_km or 0.0)
            )

    def at_epoch(self, epoch: Epoch) -> "Orbit":
        """Analytic two-body propagation to another epoch."""
        dt = (epoch - self.epoch).to_seconds()
        with _cpu():
            r, v = keplerian_propagate(
                jnp.asarray(self.r_km), jnp.asarray(self.v_km_s), self.frame.mu, dt
            )
        return Orbit(np.asarray(r), np.asarray(v), epoch, self.frame)

    def __str__(self):
        return (
            f"[{self.frame}] r={self.r_km} km v={self.v_km_s} km/s @ {self.epoch}"
        )


def rss_orbit_errors(a: Orbit, b: Orbit):
    """RSS position and velocity differences (km, km/s), as the reference's
    utils::rss_orbit_errors."""
    dr = float(np.linalg.norm(a.r_km - b.r_km))
    dv = float(np.linalg.norm(a.v_km_s - b.v_km_s))
    return dr, dv
