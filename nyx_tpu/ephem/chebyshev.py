"""Chebyshev fitting (host) and evaluation (device).

The device-resident ephemeris is a dense uniform-interval Chebyshev table so
lookups are pure gathers (record index = floor((t-t0)/intlen)) with no
data-dependent control flow — the TPU-native replacement for ANISE's
per-call segment search. Positions are interpolated with Clenshaw recurrence;
velocities come from the exact polynomial derivative, as SPK type 2 does.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fit_chebyshev(fn, t0: float, intlen: float, n_records: int, degree: int) -> np.ndarray:
    """Fit `fn(t)->[...,k]` with per-interval Chebyshev polynomials.

    Returns coeffs [n_records, k, degree+1]. Uses Chebyshev-Gauss-Lobatto
    sampling + the discrete cosine transform relation for interpolation at
    nodes (exact interpolation, near-minimax).
    """
    N = degree
    j = np.arange(N + 1)
    nodes = np.cos(np.pi * j / N)  # [1 .. -1]
    recs = []
    for i in range(n_records):
        mid = t0 + (i + 0.5) * intlen
        half = 0.5 * intlen
        ts = mid + half * nodes
        vals = np.asarray(fn(ts))  # [N+1, k]
        # Clenshaw-Curtis / CGL interpolation coefficients
        # c_m = (2/N) * sum'' f(x_j) cos(pi m j / N)  ('' = halve endpoints)
        w = np.ones(N + 1)
        w[0] = w[-1] = 0.5
        fw = vals * w[:, None]
        m = np.arange(N + 1)
        cosmat = np.cos(np.pi * np.outer(m, j) / N)
        c = (2.0 / N) * (cosmat @ fw)  # [N+1, k]
        c[0] *= 0.5
        c[-1] *= 0.5
        recs.append(c.T)  # [k, N+1]
    return np.stack(recs)


def eval_chebyshev(coeffs, tau):
    """Clenshaw evaluation. coeffs [..., k, D], tau [...] in [-1,1] -> [..., k]."""
    D = coeffs.shape[-1]
    x2 = 2.0 * tau[..., None]
    b1 = jnp.zeros_like(coeffs[..., 0])
    b2 = jnp.zeros_like(b1)
    for n in range(D - 1, 0, -1):
        b1, b2 = coeffs[..., n] + x2 * b1 - b2, b1
    return coeffs[..., 0] + tau[..., None] * b1 - b2


def eval_chebyshev_deriv(coeffs, tau):
    """Derivative d/dtau via the Chebyshev derivative recurrence."""
    D = coeffs.shape[-1]
    # c'_k relation: use Clenshaw on the derivative coefficients computed
    # with the U_n (second kind) expansion: T_n' = n U_{n-1}.
    # Evaluate sum_n c_n n U_{n-1}(tau) with the U-Clenshaw recurrence.
    x2 = 2.0 * tau[..., None]
    b1 = jnp.zeros_like(coeffs[..., 0])
    b2 = jnp.zeros_like(b1)
    for n in range(D - 1, 0, -1):
        b1, b2 = n * coeffs[..., n] + x2 * b1 - b2, b1
    return b1
