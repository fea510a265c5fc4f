"""Porkchop scans: whole launch-window Lambert grids in one vmapped solve.

The reference exposes the Lambert solvers (tools/lambert/) and leaves
porkchop generation to user loops; here the D x A grid of departure and
arrival epochs is a single `jax.vmap` of the Izzo Householder iteration —
the idiomatic TPU shape (one fused kernel, no per-cell dispatch).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import GM, NAIF
from ..time import Epoch
from .lambert import lambert_izzo_rv


@dataclass
class Porkchop:
    """Grids indexed [departure, arrival]."""

    dep_epochs: list
    arr_epochs: list
    tof_days: np.ndarray  # [D, A]
    c3_km2_s2: np.ndarray  # [D, A] departure C3
    vinf_arrival_km_s: np.ndarray  # [D, A]
    dv_total_km_s: np.ndarray  # [D, A] |v_inf dep| + |v_inf arr|

    def best(self, metric: str = "c3_km2_s2"):
        """(dep_epoch, arr_epoch, value) at the grid minimum of `metric`."""
        grid = getattr(self, metric)
        flat = np.nan_to_num(grid, nan=np.inf)
        i, j = np.unravel_index(np.argmin(flat), grid.shape)
        return self.dep_epochs[i], self.arr_epochs[j], float(grid[i, j])


def porkchop_grid(r1, v1, r2, v2, tof_s, mu, long_way=False):
    """Vectorized Lambert over flattened grids (pure JAX, jittable).

    r1/v1 [N,3] departure body state per cell, r2/v2 [N,3] arrival body
    state per cell, tof_s [N]. Returns (c3, vinf_arr, dv_total) [N].
    """
    solve = jax.vmap(
        lambda a, b, t: lambert_izzo_rv(a, b, t, mu, long_way=long_way)
    )
    v1_l, v2_l = solve(r1, r2, jnp.maximum(tof_s, 1.0))
    vinf_dep = jnp.linalg.norm(v1_l - v1, axis=-1)
    vinf_arr = jnp.linalg.norm(v2_l - v2, axis=-1)
    bad = tof_s <= 0.0
    nan = jnp.where(bad, jnp.nan, 1.0)
    return nan * vinf_dep**2, nan * vinf_arr, nan * (vinf_dep + vinf_arr)


def porkchop(
    almanac,
    departure_body: int,
    arrival_body: int,
    dep_epochs,
    arr_epochs,
    center: int = NAIF.SUN,
    mu: float = None,
    long_way: bool = False,
) -> Porkchop:
    """Launch-window scan between two bodies (heliocentric by default).

    `dep_epochs` / `arr_epochs`: lists of Epoch. Body states come from the
    almanac (SPK or analytic); the whole grid solves in one device call.
    """
    mu = GM.SUN if mu is None else mu
    if center != NAIF.SUN and mu is GM.SUN:
        raise ValueError("pass mu for a non-heliocentric center")

    def states(body, epochs):
        rs, vs = [], []
        for e in epochs:
            r, v = almanac.state(body, center, e)
            rs.append(r)
            vs.append(v)
        return np.stack(rs), np.stack(vs)

    r1, v1 = states(departure_body, dep_epochs)
    r2, v2 = states(arrival_body, arr_epochs)
    t_dep = np.array([e.to_tdb_seconds() for e in dep_epochs])
    t_arr = np.array([e.to_tdb_seconds() for e in arr_epochs])
    D, A = len(dep_epochs), len(arr_epochs)
    tof = t_arr[None, :] - t_dep[:, None]  # [D, A]

    c3, vinf, dv = porkchop_grid(
        jnp.asarray(np.repeat(r1, A, axis=0)),
        jnp.asarray(np.repeat(v1, A, axis=0)),
        jnp.asarray(np.tile(r2, (D, 1))),
        jnp.asarray(np.tile(v2, (D, 1))),
        jnp.asarray(tof.ravel()),
        mu,
        long_way,
    )
    return Porkchop(
        dep_epochs=list(dep_epochs),
        arr_epochs=list(arr_epochs),
        tof_days=tof / 86_400.0,
        c3_km2_s2=np.asarray(c3).reshape(D, A),
        vinf_arrival_km_s=np.asarray(vinf).reshape(D, A),
        dv_total_km_s=np.asarray(dv).reshape(D, A),
    )
