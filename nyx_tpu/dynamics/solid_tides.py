"""IERS-2010 solid-tide acceleration (degree 2 + optional degree 3).

Counterpart of the reference's `SolidTides` (dynamics/solid_tides.rs:
40-249): tidal perturbers raise time-varying normalized ΔC_nm/ΔS_nm
corrections (k2/k3 Love numbers), evaluated with the same GMAT-style
normalized-Legendre accumulation. Batched, branchless; the degree-2/3
loops are tiny and fully unrolled. The reference's hyperdual `gradient`
(solid_tides.rs:391+) is unnecessary here — the whole model sits under
`jax.jacfwd` for STM propagation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..constants import GM_BY_NAIF, NAIF, RADIUS_BY_NAIF
from ..cosmic.frames import Frame, Frames

_SQRT2 = np.sqrt(2.0)

# fixed normalization factors for n in {1,2,3}, m in {0..n} --------------
def _vr01(n, m):
    v = np.sqrt((n - m) * (n + m + 1.0))
    return v / _SQRT2 if m == 0 else v


def _vr11(n, m):
    v = np.sqrt((2.0 * n + 1.0) * (n + m + 2.0) * (n + m + 1.0) / (2.0 * n + 3.0))
    return v / _SQRT2 if m == 0 else v


def _b_nm(n, m):
    return np.sqrt(((2.0 * n + 1.0) * (2.0 * n - 1.0)) / ((n + m) * (n - m)))


def _c_nm(n, m):
    return np.sqrt(
        ((2.0 * n + 1.0) * (n + m - 1.0) * (n - m - 1.0))
        / ((n - m) * (n + m) * (2.0 * n - 3.0))
    )


@dataclass(frozen=True)
class TidalPerturber:
    """(solid_tides.rs:56-65): the raising body + degree-3 flag."""

    body: int  # NAIF id
    compute_degree_3: bool = False


@dataclass(frozen=True)
class SolidTides:
    """AccelModel: solid tides on the central body (solid_tides.rs:40-54)."""

    frame: Frame  # body-fixed frame of the deformed central body
    k2: float = 0.3019
    k3: float = 0.093
    perturbers: Tuple[TidalPerturber, ...] = (
        TidalPerturber(NAIF.MOON, True),
        TidalPerturber(NAIF.SUN, False),
    )

    @classmethod
    def earth_moon_system(cls, earth_bf_frame: Frame = Frames.IAU_EARTH) -> "SolidTides":
        """Moon (k3 active) + Sun perturbers, k2=0.3019, k3=0.093
        (solid_tides.rs:177-230)."""
        return cls(frame=earth_bf_frame)

    def required_bodies(self):
        return tuple(p.body for p in self.perturbers)

    # ------------------------------------------------------------------
    def _delta_cs(self, ctx, t_tdb, dcm):
        """Batched ΔC, ΔS dicts keyed (n, m) (solid_tides.rs:67-174)."""
        mu0 = self.frame.mu
        req = self.frame.radius_km
        shape = jnp.shape(t_tdb)
        dc = {(n, m): jnp.zeros(shape) for n in (2, 3) for m in range(n + 1)}
        ds = {(n, m): jnp.zeros(shape) for n in (2, 3) for m in range(n + 1)}

        for pert in self.perturbers:
            idx = ctx.body_index(pert.body)
            rb_j2000 = ctx.table.position(idx, t_tdb)  # [B, 3] wrt center
            rb = jnp.einsum("...ij,...j->...i", dcm, rb_j2000)  # body-fixed
            r_body = jnp.linalg.norm(rb, axis=-1)
            s_b = rb[..., 0] / r_body
            t_b = rb[..., 1] / r_body
            u_b = rb[..., 2] / r_body

            sin_phi = u_b
            cos_phi = jnp.sqrt(jnp.maximum(1.0 - sin_phi**2, 0.0))
            safe = cos_phi > 1e-12
            cos_lam = jnp.where(safe, s_b / jnp.where(safe, cos_phi, 1.0), 1.0)
            sin_lam = jnp.where(safe, t_b / jnp.where(safe, cos_phi, 1.0), 0.0)

            p = {
                (2, 0): 0.5 * (3.0 * sin_phi**2 - 1.0) * np.sqrt(5.0),
                (2, 1): 3.0 * sin_phi * cos_phi * np.sqrt(5.0 / 3.0),
                (2, 2): 3.0 * cos_phi**2 * np.sqrt(5.0 / 12.0),
                (3, 0): 0.5 * (5.0 * sin_phi**3 - 3.0 * sin_phi) * np.sqrt(7.0),
                (3, 1): 1.5 * (5.0 * sin_phi**2 - 1.0) * cos_phi * np.sqrt(7.0 / 6.0),
                (3, 2): 15.0 * sin_phi * cos_phi**2 * np.sqrt(7.0 / 60.0),
                (3, 3): 15.0 * cos_phi**3 * np.sqrt(7.0 / 360.0),
            }
            cos_ml = {
                0: jnp.ones_like(cos_lam),
                1: cos_lam,
                2: cos_lam**2 - sin_lam**2,
                3: cos_lam * (cos_lam**2 - 3.0 * sin_lam**2),
            }
            sin_ml = {
                0: jnp.zeros_like(sin_lam),
                1: sin_lam,
                2: 2.0 * sin_lam * cos_lam,
                3: sin_lam * (3.0 * cos_lam**2 - sin_lam**2),
            }

            gm_ratio = GM_BY_NAIF[pert.body] / mu0
            r_ratio = req / r_body
            max_n = 3 if pert.compute_degree_3 else 2
            for n in range(2, max_n + 1):
                kn = self.k2 if n == 2 else self.k3
                common = kn / (2.0 * n + 1.0) * gm_ratio * r_ratio ** (n + 1)
                for m in range(n + 1):
                    dc[(n, m)] = dc[(n, m)] + common * p[(n, m)] * cos_ml[m]
                    ds[(n, m)] = ds[(n, m)] + common * p[(n, m)] * sin_ml[m]
        return dc, ds

    # ------------------------------------------------------------------
    def accel(self, ctx, t_tdb, r, v):
        """[B, 3] inertial tidal acceleration (solid_tides.rs:258-388)."""
        dcm = self.frame.dcm_from_j2000(t_tdb)  # J2000 -> body fixed [B,3,3]
        dc, ds = self._delta_cs(ctx, t_tdb, dcm)

        r_bf = jnp.einsum("...ij,...j->...i", dcm, r)
        r_ = jnp.linalg.norm(r_bf, axis=-1)
        s_ = r_bf[..., 0] / r_
        t_ = r_bf[..., 1] / r_
        u_ = r_bf[..., 2] / r_

        # normalized Legendre a_nm recursion to n=4 (GMAT scaling)
        a = {}
        a[(0, 0)] = jnp.ones_like(u_)
        for n in range(1, 5):
            a[(n, n)] = np.sqrt(1.0 + 1.0 / (2.0 * n)) * a[(n - 1, n - 1)]
        a[(1, 0)] = u_ * np.sqrt(3.0)
        for n in range(1, 5):
            a[(n + 1, n)] = np.sqrt(2.0 * n + 3.0) * u_ * a[(n, n)]
        for m in range(0, 4):
            for n in range(m + 2, 5):
                a[(n, m)] = u_ * _b_nm(n, m) * a[(n - 1, m)] - _c_nm(n, m) * a[(n - 2, m)]

        r_m = {0: jnp.ones_like(s_)}
        i_m = {0: jnp.zeros_like(s_)}
        for m in range(1, 4):
            r_m[m] = s_ * r_m[m - 1] - t_ * i_m[m - 1]
            i_m[m] = s_ * i_m[m - 1] + t_ * r_m[m - 1]

        req = self.frame.radius_km
        mu = self.frame.mu
        rho = req / r_
        rho_np1 = mu / r_ * rho

        ax = jnp.zeros_like(r_)
        ay = jnp.zeros_like(r_)
        az = jnp.zeros_like(r_)
        aw = jnp.zeros_like(r_)
        for n in range(1, 4):
            rho_np1 = rho_np1 * rho
            if n < 2:
                continue
            sx = jnp.zeros_like(r_)
            sy = jnp.zeros_like(r_)
            sz = jnp.zeros_like(r_)
            sw = jnp.zeros_like(r_)
            for m in range(n + 1):
                c_val = dc[(n, m)]
                s_val = ds[(n, m)]
                d_ = (c_val * r_m[m] + s_val * i_m[m]) * _SQRT2
                if m == 0:
                    e_ = jnp.zeros_like(r_)
                    f_ = jnp.zeros_like(r_)
                else:
                    e_ = (c_val * r_m[m - 1] + s_val * i_m[m - 1]) * _SQRT2
                    f_ = (s_val * r_m[m - 1] - c_val * i_m[m - 1]) * _SQRT2
                zero = jnp.zeros_like(r_)
                sx = sx + m * a[(n, m)] * e_
                sy = sy + m * a[(n, m)] * f_
                # entries with m > n are zero (the reference's fixed-size
                # zero-initialized a_nm array, solid_tides.rs:267)
                sz = sz + _vr01(n, m) * a.get((n, m + 1), zero) * d_
                sw = sw - _vr11(n, m) * a.get((n + 1, m + 1), zero) * d_
            scale = rho_np1 / req
            ax = ax + scale * sx
            ay = ay + scale * sy
            az = az + scale * sz
            aw = aw + scale * sw

        a_bf = jnp.stack(
            [ax + aw * s_, ay + aw * t_, az + aw * u_], axis=-1
        )
        return jnp.einsum("...ji,...j->...i", dcm, a_bf)
