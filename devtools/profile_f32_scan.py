#!/usr/bin/env python
"""Is the sequential 9x9 filter scan's ~0.35 ms/row floor f64 emulation
or per-op issue latency? Time the same Joseph-step chain in f64 vs f32,
plus a UD-style (Bierman op-count) f32 body, at M=1168 rows.

Process-wall cross-checked with a forced readback (axon block_until_ready
mirage — see docs/OD_PIPELINE.md).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

M, D, T = 1168, 9, 2
rng = np.random.default_rng(0)
phi = np.tile(np.eye(D), (M, 1, 1)) + 1e-3 * rng.normal(size=(M, D, D))
q = np.zeros((M, D, D))
h = rng.normal(size=(M, T, D))
z = 1e-3 * rng.normal(size=(M, T))
r = np.full((M, T), 4e-6)
p0 = np.eye(D) * 1e-2


def joseph_scan(dtype):
    fphi = jnp.asarray(phi, dtype)
    fq = jnp.asarray(q, dtype)
    fh = jnp.asarray(h, dtype)
    fz = jnp.asarray(z, dtype)
    fr = jnp.asarray(r, dtype)
    fp0 = jnp.asarray(p0, dtype)

    def step(carry, x):
        dev, p = carry
        phi_i, q_i, h_i, z_i, r_i = x
        p_bar = phi_i @ p @ phi_i.T + q_i
        dev_bar = phi_i @ dev
        prefit = z_i - h_i @ dev_bar
        s = h_i @ p_bar @ h_i.T + jnp.diag(r_i)
        l = jnp.linalg.cholesky(s)
        white = jax.scipy.linalg.solve_triangular(l, prefit, lower=True)
        ratio = jnp.linalg.norm(white)
        k = jax.scipy.linalg.cho_solve((l, True), h_i @ p_bar.T).T
        dev_new = dev_bar + k @ prefit
        ikh = jnp.eye(D, dtype=dtype) - k @ h_i
        p_new = ikh @ p_bar @ ikh.T + k @ jnp.diag(r_i) @ k.T
        p_new = 0.5 * (p_new + p_new.T)
        return (dev_new, p_new), (dev_new, ratio)

    @jax.jit
    def run():
        (_, pf), (devs, ratios) = jax.lax.scan(
            step, (jnp.zeros(D, dtype), fp0), (fphi, fq, fh, fz, fr)
        )
        return devs, ratios, pf

    return run


def ud_scan_f32():
    """Bierman measurement update (vectorized via exclusive cumsum) +
    Thornton-op-count time update proxy (MWGS unrolled 9)."""
    dtype = jnp.float32
    fphi = jnp.asarray(phi, dtype)
    fh = jnp.asarray(h, dtype)
    fz = jnp.asarray(z, dtype)
    fr = jnp.asarray(r, dtype)
    u0 = jnp.eye(D, dtype=dtype)
    d0 = jnp.full((D,), 1e-2, dtype)
    gq = jnp.zeros((D, D), dtype)  # SNC factor columns (zeros here)

    def bierman(u, d, dev, h_i, z_i, r_i):
        f = u.T @ h_i
        v = d * f
        fv = f * v
        alpha = r_i + jnp.cumsum(fv)
        alpha_prev = jnp.concatenate([r_i[None], alpha[:-1]])
        lam = -f / alpha_prev
        d_new = d * alpha_prev / alpha
        kmat = jnp.cumsum(u * v[None, :], axis=1)
        kex = jnp.concatenate([jnp.zeros((D, 1), dtype), kmat[:, :-1]], 1)
        u_new = u + kex * lam[None, :]
        gain = kmat[:, -1] / alpha[-1]
        prefit = z_i - h_i @ dev
        dev_new = dev + gain * prefit
        return u_new, d_new, dev_new, prefit

    def thornton(u, d, phi_i):
        y = jnp.concatenate([phi_i @ u, gq], axis=1)  # [D, 2D]
        dy = jnp.concatenate([d, jnp.ones(D, dtype)])
        u_new = jnp.eye(D, dtype=dtype)
        d_new = jnp.zeros(D, dtype)
        for j in range(D - 1, -1, -1):
            c = y[j] * dy
            dj = jnp.dot(y[j], c)
            d_new = d_new.at[j].set(dj)
            proj = (y @ c) / jnp.maximum(dj, 1e-30)
            mask = (jnp.arange(D) < j).astype(dtype)
            u_new = u_new.at[:, j].add(mask * proj * (jnp.arange(D) != j))
            y = y - (mask * proj)[:, None] * y[j][None, :]
        return u_new, d_new

    def step(carry, x):
        u, d, dev = carry
        phi_i, h_i, z_i, r_i = x
        dev = phi_i @ dev
        u, d = thornton(u, d, phi_i)
        pf = jnp.zeros(T, dtype)
        for t in range(T):
            u, d, dev, p = bierman(u, d, dev, h_i[t], z_i[t], r_i[t])
            pf = pf.at[t].set(p[t] if p.ndim else p)
        return (u, d, dev), (dev, pf)

    def b2(u, d, dev, h_t, z_t, r_t):
        return bierman(u, d, dev, h_t, z_t, r_t)

    def step2(carry, x):
        u, d, dev = carry
        phi_i, h_i, z_i, r_i = x
        dev = phi_i @ dev
        u, d = thornton(u, d, phi_i)
        u, d, dev, _ = bierman(u, d, dev, h_i[0], z_i[0], r_i[0])
        u, d, dev, _ = bierman(u, d, dev, h_i[1], z_i[1], r_i[1])
        return (u, d, dev), dev

    @jax.jit
    def run():
        (_, _, devf), devs = jax.lax.scan(
            step2, (u0, d0, jnp.zeros(D, dtype)), (fphi, fh, fz, fr)
        )
        return devs, devf

    return run


def timeit(name, run, n=5):
    out = run()
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # force
    t0 = time.time()
    for _ in range(n):
        out = run()
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    w = (time.time() - t0) / n
    print(f"{name:24s} {w*1e3:9.2f} ms  ({w/M*1e6:.2f} us/row)", flush=True)
    return w


print(f"platform={jax.default_backend()} M={M}")
timeit("joseph f64", joseph_scan(jnp.float64))
timeit("joseph f32", joseph_scan(jnp.float32))
timeit("ud f32 (bierman x2)", ud_scan_f32())
