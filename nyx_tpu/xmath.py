"""Accuracy-hardened math helpers for TPU float64.

On TPU, XLA emulates float64 as a float32 pair (~48-bit effective mantissa):
+,-,*,/,sqrt are accurate to ~3e-15 relative, and transcendentals are good
(~1e-12) for reduced arguments and shapes >= 2 lanes — but sin/cos of large
arguments lose absolute accuracy as |x| * eps, and scalar-shaped ((), (1,))
transcendentals take a low-precision path. The framework therefore follows
two rules, both enforced here and by the batched propagator (which pads the
lane axis to >= 8):

1. every periodic argument is reduced modulo 2pi/360 BEFORE the trig call,
   in exact arithmetic;
2. linearly-growing angles (rotation models: W = base + rate * days) are
   reduced algebraically via integer-splitting so the angle never grows
   beyond ~1e4 before reduction.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.141592653589793
TWO_PI = 6.283185307179586
DEG2RAD = PI / 180.0
RAD2DEG = 180.0 / PI

# 2*pi split into three parts (24-bit chunks): k*TWO_PI_A and k*TWO_PI_B are
# exact for |k| < 2^24, so Cody-Waite reduction holds to ~|x|*2^-48.
TWO_PI_A = 6.283185303211212
TWO_PI_B = 3.968374073792802e-09
TWO_PI_C = 2.4492935982947064e-16


def reduce_rad(x):
    """x mod 2pi, into [-pi, pi], via three-part Cody-Waite reduction."""
    k = jnp.round(x * (1.0 / TWO_PI))
    return ((x - k * TWO_PI_A) - k * TWO_PI_B) - k * TWO_PI_C


def reduce_deg(x):
    """x mod 360 into [-180, 180] (exact: 360*k is exact for |k| < 2^45)."""
    k = jnp.round(x * (1.0 / 360.0))
    return x - k * 360.0


def sin_rad(x):
    return jnp.sin(reduce_rad(x))


def cos_rad(x):
    return jnp.cos(reduce_rad(x))


def sin_deg(x):
    return jnp.sin(reduce_deg(x) * DEG2RAD)


def cos_deg(x):
    return jnp.cos(reduce_deg(x) * DEG2RAD)


def sincos_deg(x):
    r = reduce_deg(x) * DEG2RAD
    return jnp.sin(r), jnp.cos(r)


def linear_angle_deg(base_deg, rate_deg_per_day, d_days):
    """(base + rate * d) mod 360, accurate for large day counts.

    Splits both rate and day count into integer + fraction so every product
    stays exactly representable before the modulo; the result carries
    ~1e-11 deg error even decades from the reference epoch.
    """
    d_i = jnp.floor(d_days)
    d_f = d_days - d_i
    r_i = jnp.floor(rate_deg_per_day)
    r_f = rate_deg_per_day - r_i
    # r_i * d_i is an exact integer product (< 2^45); reduce it first.
    big = r_i * d_i
    big_mod = big - jnp.round(big * (1.0 / 360.0)) * 360.0
    small = r_i * d_f + r_f * d_days + base_deg
    return reduce_deg(big_mod + small)


def norm(x, axis=-1):
    return jnp.sqrt(jnp.sum(x * x, axis=axis))


def unit(x, axis=-1):
    return x / jnp.linalg.norm(x, axis=axis, keepdims=True)


def tilde_matrix(v):
    """Skew-symmetric cross-product matrix [..., 3, 3] such that
    tilde(a) @ b == a x b (utils.rs tilde_matrix)."""
    z = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def rotv(v, axis, theta_rad):
    """Rodrigues rotation of `v` about unit `axis` by `theta` (utils.rs
    rotv). Batched over leading dims."""
    k = unit(axis)
    c = jnp.cos(theta_rad)[..., None]
    s = jnp.sin(theta_rad)[..., None]
    kxv = jnp.cross(k, v)
    kdv = jnp.sum(k * v, axis=-1, keepdims=True)
    return v * c + kxv * s + k * kdv * (1.0 - c)


def projv(a, b):
    """Projection of `a` onto `b` (utils.rs projv)."""
    bb = jnp.sum(b * b, axis=-1, keepdims=True)
    return b * jnp.sum(a * b, axis=-1, keepdims=True) / bb


def gauss_solve(m, rhs):
    """Batched dense linear solve by unrolled Gaussian elimination with
    partial pivoting: `m` [..., n, n], `rhs` [..., n, k] -> [..., n, k].

    The TPU backend has no f64 LU decomposition (XLA's LuDecomposition
    expander is F32/C64-only), so `jnp.linalg.solve` cannot run in double
    precision on device; for the small fixed-size systems of the filter
    algebra (n <= ~12) an unrolled elimination is both supported and fast
    (every step is a wide batched vector op)."""
    import jax.numpy as jnp

    n = m.shape[-1]
    a = jnp.concatenate([m, rhs], axis=-1)  # [..., n, n+k]
    eye = jnp.eye(n, dtype=m.dtype)
    for col in range(n):
        # partial pivot: strongest remaining row for this column
        colv = jnp.abs(a[..., :, col])
        mask = jnp.arange(n) >= col
        piv = jnp.argmax(jnp.where(mask, colv, -1.0), axis=-1)  # [...]
        # row-swap as a permutation matmul (gather-free, batch-friendly)
        e_p = (piv[..., None, None] == jnp.arange(n)).astype(m.dtype)
        e_c = eye[col][(None,) * (a.ndim - 2) + (None, slice(None))]
        perm = (
            jnp.broadcast_to(eye, a.shape[:-2] + (n, n))
            - e_c * jnp.swapaxes(e_c, -1, -2)
            - e_p * jnp.swapaxes(e_p, -1, -2)
            + e_p * jnp.swapaxes(e_c, -1, -2)
            + e_c * jnp.swapaxes(e_p, -1, -2)
        )
        a = perm @ a
        pivval = a[..., col : col + 1, col : col + 1]
        factors = a[..., col + 1 :, col : col + 1] / pivval
        a = a.at[..., col + 1 :, :].add(-factors * a[..., col : col + 1, :])
    # back substitution (unrolled)
    k = rhs.shape[-1]
    x = jnp.zeros(a.shape[:-2] + (n, k), dtype=m.dtype)
    for col in range(n - 1, -1, -1):
        acc = a[..., col, n:]
        if col < n - 1:
            acc = acc - jnp.einsum(
                "...j,...jk->...k", a[..., col, col + 1 : n], x[..., col + 1 :, :]
            )
        x = x.at[..., col, :].set(acc / a[..., col, col : col + 1])
    return x
