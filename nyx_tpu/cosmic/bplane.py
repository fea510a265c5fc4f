"""Hyperbolic B-plane: B·R, B·T, linearized time of flight, and targeting.

Counterpart of the reference's `BPlane` (cosmic/bplane.rs:40-150) and
`try_achieve_b_plane` (bplane.rs:328). The reference computes partials with
hyperdual numbers; here the scalar map `bplane_from_rv` is a pure JAX
function and the Jacobian is one `jax.jacfwd` call.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .orbit import Orbit
from ..errors import StateError, TargetingError

__all__ = ["bplane_from_rv", "BPlane", "BPlaneTarget", "try_achieve_b_plane"]


def bplane_from_rv(r, v, mu):
    """(b_r_km, b_t_km, ltof_s, str_dcm[3,3]) of a hyperbolic state.

    Mirrors bplane.rs:57-137: Ŝ along the incoming asymptote, T̂ = Ŝ×K̂,
    R̂ = Ŝ×T̂, B = b(√(1-1/e²) ê − n̂/e) with b the semi-minor axis.
    Batched over leading axes.
    """
    rmag = jnp.linalg.norm(r, axis=-1)
    vmag = jnp.linalg.norm(v, axis=-1)
    h = jnp.cross(r, v)
    hmag = jnp.linalg.norm(h, axis=-1)
    rdotv = jnp.sum(r * v, axis=-1)
    e_vec = ((vmag**2 - mu / rmag)[..., None] * r - rdotv[..., None] * v) / mu
    ecc = jnp.linalg.norm(e_vec, axis=-1)
    e_hat = e_vec / ecc[..., None]
    h_hat = h / hmag[..., None]
    n_hat = jnp.cross(h_hat, e_hat)

    fact = jnp.sqrt(1.0 - (1.0 / ecc) ** 2)  # incoming asymptote factor
    s = e_hat / ecc[..., None] + fact[..., None] * n_hat
    s_hat = s / jnp.linalg.norm(s, axis=-1, keepdims=True)

    energy = vmag**2 / 2.0 - mu / rmag
    sma = -mu / (2.0 * energy)  # < 0 for hyperbolic
    semi_minor = jnp.abs(sma) * jnp.sqrt(ecc**2 - 1.0)
    b_vec = semi_minor[..., None] * (
        fact[..., None] * e_hat - n_hat / ecc[..., None]
    )

    k_hat = jnp.zeros_like(s_hat).at[..., 2].set(1.0)
    t = jnp.cross(s_hat, k_hat)
    t_hat = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    r_hat = jnp.cross(s_hat, t_hat)

    b_r = jnp.sum(b_vec * r_hat, axis=-1)
    b_t = jnp.sum(b_vec * t_hat, axis=-1)
    ltof = jnp.sum(b_vec * s_hat, axis=-1) / vmag
    str_dcm = jnp.stack([s_hat, t_hat, r_hat], axis=-2)
    return b_r, b_t, ltof, str_dcm


@dataclass
class BPlane:
    """Host-facing B-plane values + Jacobians (bplane.rs:40-54)."""

    b_r_km: float
    b_t_km: float
    ltof_s: float
    str_dcm: np.ndarray  # inertial -> B-plane rows (S, T, R)
    jacobian_rv: np.ndarray  # d(b_r, b_t, ltof)/d[r, v]  [3, 6]
    epoch: object = None
    frame: object = None

    @classmethod
    def from_orbit(cls, orbit: Orbit) -> "BPlane":
        if orbit.ecc <= 1.0:
            raise StateError(
                f"B-plane requires a hyperbolic orbit, ecc = {orbit.ecc:.6f}"
            )
        mu = orbit.frame.mu
        rv = jnp.concatenate(
            [jnp.asarray(orbit.r_km), jnp.asarray(orbit.v_km_s)]
        )

        def f(rv6):
            b_r, b_t, ltof, _ = bplane_from_rv(rv6[0:3], rv6[3:6], mu)
            return jnp.stack([b_r, b_t, ltof])

        vals = np.asarray(f(rv))
        jac = np.asarray(jax.jacfwd(f)(rv))
        _, _, _, dcm = bplane_from_rv(rv[0:3], rv[3:6], mu)
        return cls(
            b_r_km=float(vals[0]),
            b_t_km=float(vals[1]),
            ltof_s=float(vals[2]),
            str_dcm=np.asarray(dcm),
            jacobian_rv=jac,
            epoch=orbit.epoch,
            frame=orbit.frame,
        )

    def jacobian(self) -> np.ndarray:
        """d(BR, BT, LTOF)/d(vx, vy, vz) (bplane.rs:150-166)."""
        return self.jacobian_rv[:, 3:6]

    @property
    def b_mag_km(self) -> float:
        return float(np.hypot(self.b_r_km, self.b_t_km))

    @property
    def theta_deg(self) -> float:
        """B-plane angle from T (clock angle)."""
        return float(np.degrees(np.arctan2(self.b_r_km, self.b_t_km)))

    def __str__(self):
        return (
            f"BPlane: B.R = {self.b_r_km:.3f} km, B.T = {self.b_t_km:.3f} km, "
            f"LTOF = {self.ltof_s:.3f} s"
        )


@dataclass
class BPlaneTarget:
    """Desired B-plane (bplane.rs BPlaneTarget): BR/BT (km) + tolerances."""

    b_r_km: float
    b_t_km: float
    tol_b_r_km: float = 1e-3
    tol_b_t_km: float = 1e-3

    @classmethod
    def from_bt_br(cls, b_t_km, b_r_km) -> "BPlaneTarget":
        return cls(b_r_km=b_r_km, b_t_km=b_t_km)


def try_achieve_b_plane(orbit: Orbit, target: BPlaneTarget,
                        max_iter: int = 25):
    """Newton iteration on the velocity to hit a desired (BR, BT) at the
    current epoch (bplane.rs:328-420). Returns (delta_v [3] km/s, BPlane)."""
    v = np.asarray(orbit.v_km_s, dtype=np.float64).copy()
    total_dv = np.zeros(3)
    for _ in range(max_iter):
        osc = Orbit(orbit.r_km.copy(), v, orbit.epoch, orbit.frame)
        bp = BPlane.from_orbit(osc)
        err = np.array(
            [target.b_r_km - bp.b_r_km, target.b_t_km - bp.b_t_km]
        )
        if (
            abs(err[0]) < target.tol_b_r_km
            and abs(err[1]) < target.tol_b_t_km
        ):
            return total_dv, bp
        jac = bp.jacobian()[0:2, :]  # d(BR,BT)/dv  [2, 3]
        dv = np.linalg.pinv(jac) @ err
        v = v + dv
        total_dv = total_dv + dv
    raise TargetingError(
        f"B-plane targeting did not converge in {max_iter} iterations; "
        f"residual {err}"
    )
