"""Pallas TPU kernel for the Pines spherical-harmonics recursion.

The XLA paths in `gravity.py` (`_accel_unrolled` / `_accel_scan`) express the
(n, m) recursion as a chain of `[B, W]` elementwise ops; XLA fuses them well,
but intermediate tiles still round-trip through HBM between fusion islands
and the `[B, W]` layout wastes lanes (W ~ 23 on a 128-lane VPU). This kernel
keeps the ENTIRE recursion in VMEM with the TPU-native layout transposed to
`[W_pad, TILE_B]` — the m-axis lives on sublanes (padded to 8k), the batch
on lanes (multiple of 128) — so every recursion step is one full-width VPU
op and the four per-degree reductions are cheap sublane sums.

Single-dtype (f32 by design: the f64 closed-form J2+J3 "split" path carries
the precision-critical terms, gravity.py:198); used by
`Harmonics.accel_body_fixed` via `backend="pallas"`.

Counterpart of the reference's GravityField recursion
(dynamics/gravity_field.rs:148-268), restructured for the TPU memory
hierarchy rather than translated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SQRT2 = np.sqrt(2.0)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _table_cache_key(_digest, _q_lo, _q_hi):  # pragma: no cover
    return object()


def pack_tables(xs, N: int, W: int, q_lo: int = 0, q_hi: int = 0):
    """Host-side packing of the per-degree recursion rows into one
    `[n_steps, 8, W_pad]` f32 array (+ per-step accumulation gate).

    Row order: b_row*mask, c_row*mask, diag_vec, offdiag_vec, C*sqrt2,
    S*sqrt2, vr01, vr11. The one-hot diagonal seeds of the recursion are
    pre-baked into dense rows so the kernel is pure elementwise work.
    """
    q_hi = q_hi or N
    n_steps = min(N, q_hi)
    W_pad = _round_up(W, 8)
    tab = np.zeros((n_steps, 8, W_pad), np.float32)
    gate = np.zeros(n_steps, np.float32)
    for k in range(n_steps):
        n = int(xs["n_is"][k])
        mask = xs["row_mask"][k]
        tab[k, 0, :W] = xs["b_row"][k] * mask
        tab[k, 1, :W] = xs["c_row"][k] * mask
        if n < W:
            tab[k, 2, n] = xs["diag_n"][k]
        if n - 1 < W:
            tab[k, 3, n - 1] = xs["offdiag_n"][k]
        tab[k, 4, :W] = xs["C_q"][k] * _SQRT2
        tab[k, 5, :W] = xs["S_q"][k] * _SQRT2
        tab[k, 6, :W] = xs["vr01_q"][k]
        tab[k, 7, :W] = xs["vr11_q"][k]
        gate[k] = 1.0 if (k + 1 > q_lo) else 0.0
    return tab, gate


def _pines_kernel(r_ref, tab_ref, acc_ref, rms_ref, ims_ref, *,
                  n_steps, W, W_pad, tile_b, mu, radius, diag1, gate,
                  defer_reduce=True):
    """defer_reduce: accumulate the four per-degree sums as full
    [W_pad, tile_b] arrays and reduce over sublanes ONCE at the end —
    sublane reductions cost ~a dozen VPU ops each, and the eager variant
    pays 4 of them per degree (measured ~25% of the kernel)."""
    f32 = jnp.float32
    x = r_ref[0:1, :]  # [1, TB]
    y = r_ref[1:2, :]
    z = r_ref[2:3, :]
    r2 = x * x + y * y + z * z
    r = jnp.sqrt(r2)
    inv_r = 1.0 / r
    s_ = x * inv_r
    t_ = y * inv_r
    u_ = z * inv_r
    rho = f32(radius) * inv_r
    mu_over_r = f32(mu) * inv_r

    # ---- r_m / i_m recursion, rows on sublanes ----
    rms_ref[:, :] = jnp.zeros((W_pad, tile_b), f32)
    ims_ref[:, :] = jnp.zeros((W_pad, tile_b), f32)
    rm = jnp.ones((1, tile_b), f32)
    im = jnp.zeros((1, tile_b), f32)
    rms_ref[0:1, :] = rm
    for m in range(1, W):
        rm, im = s_ * rm - t_ * im, s_ * im + t_ * rm
        rms_ref[m:m + 1, :] = rm
        ims_ref[m:m + 1, :] = im
    r_ms = rms_ref[:, :]
    i_ms = ims_ref[:, :]
    zrow = jnp.zeros((1, tile_b), f32)
    rm1 = jnp.concatenate([zrow, r_ms[:-1, :]], axis=0)
    im1 = jnp.concatenate([zrow, i_ms[:-1, :]], axis=0)

    # Mosaic's tpu.iota only produces integer vectors; make the float
    # m-index by converting an int32 iota (a float-dtype broadcasted_iota
    # fails verification on real TPU lowering)
    m_f = jax.lax.broadcasted_iota(jnp.int32, (W_pad, 1), 0).astype(f32)

    # ---- seed rows (degree 0 and 1 of the normalized Legendre A-rows,
    # matching gravity.py row0/row1: A00=1, row1 = [u*sqrt3, diag[1]]) ----
    onehot0 = (m_f == 0).astype(f32)
    row_nm2 = onehot0
    onehot1 = (m_f == 1).astype(f32)
    row_nm1 = u_ * f32(np.sqrt(3.0)) * onehot0 + f32(diag1) * onehot1

    # Triangular width blocking: at degree-step k the rows only have
    # nonzero entries for m <= k + 2 (the recursion grows one order per
    # degree), so the row/accumulation ops run at the sublane-rounded
    # active width instead of W_pad — ~35% less VPU work for a 21x21
    # field (and ~half for high-degree fields, where most steps are
    # narrow relative to the final width).
    def w_of(k):
        return min(W_pad, _round_up(min(k + 3, W), 8))

    cur_w = w_of(0)
    row_nm1 = row_nm1[:cur_w]
    row_nm2 = row_nm2[:cur_w]
    if defer_reduce:
        acc_x = jnp.zeros((cur_w, tile_b), f32)
        acc_y = jnp.zeros((cur_w, tile_b), f32)
        acc_z = jnp.zeros((cur_w, tile_b), f32)
        acc_w = jnp.zeros((cur_w, tile_b), f32)
    else:
        acc_x = jnp.zeros((1, tile_b), f32)
        acc_y = jnp.zeros((1, tile_b), f32)
        acc_z = jnp.zeros((1, tile_b), f32)
        acc_w = jnp.zeros((1, tile_b), f32)
    rho_q = mu_over_r * rho

    for k in range(n_steps):
        wk = w_of(k)
        if wk > cur_w:
            pad = jnp.zeros((wk - cur_w, tile_b), f32)
            row_nm1 = jnp.concatenate([row_nm1, pad], axis=0)
            row_nm2 = jnp.concatenate([row_nm2, pad], axis=0)
            if defer_reduce:
                acc_x = jnp.concatenate([acc_x, pad], axis=0)
                acc_y = jnp.concatenate([acc_y, pad], axis=0)
                acc_z = jnp.concatenate([acc_z, pad], axis=0)
                acc_w = jnp.concatenate([acc_w, pad], axis=0)
            cur_w = wk
        b_row = tab_ref[k, 0:1, :].reshape(W_pad, 1)[:wk]
        c_row = tab_ref[k, 1:2, :].reshape(W_pad, 1)[:wk]
        diag_v = tab_ref[k, 2:3, :].reshape(W_pad, 1)[:wk]
        offd_v = tab_ref[k, 3:4, :].reshape(W_pad, 1)[:wk]
        row_n = (u_ * b_row * row_nm1 - c_row * row_nm2
                 + diag_v + offd_v * u_)
        rho_q = rho_q * rho
        if gate[k]:
            c_q = tab_ref[k, 4:5, :].reshape(W_pad, 1)[:wk]
            s_q = tab_ref[k, 5:6, :].reshape(W_pad, 1)[:wk]
            vr01 = tab_ref[k, 6:7, :].reshape(W_pad, 1)[:wk]
            vr11 = tab_ref[k, 7:8, :].reshape(W_pad, 1)[:wk]
            mk = m_f[:wk]
            d_ = c_q * r_ms[:wk] + s_q * i_ms[:wk]
            e_ = c_q * rm1[:wk] + s_q * im1[:wk]
            f_ = s_q * rm1[:wk] - c_q * im1[:wk]
            row_p1 = jnp.concatenate([row_nm1[1:, :], zrow], axis=0)
            row_n_p1 = jnp.concatenate([row_n[1:, :], zrow], axis=0)
            rr = rho_q * f32(1.0 / radius)
            if defer_reduce:
                acc_x += (rr * mk) * row_nm1 * e_
                acc_y += (rr * mk) * row_nm1 * f_
                acc_z += (rr * vr01) * row_p1 * d_
                acc_w -= (rr * vr11) * row_n_p1 * d_
            else:
                acc_x += rr * jnp.sum(mk * row_nm1 * e_, axis=0,
                                      keepdims=True)
                acc_y += rr * jnp.sum(mk * row_nm1 * f_, axis=0,
                                      keepdims=True)
                acc_z += rr * jnp.sum(vr01 * row_p1 * d_, axis=0,
                                      keepdims=True)
                acc_w -= rr * jnp.sum(vr11 * row_n_p1 * d_, axis=0,
                                      keepdims=True)
        row_nm1, row_nm2 = row_n, row_nm1

    if defer_reduce:
        acc_x = jnp.sum(acc_x, axis=0, keepdims=True)
        acc_y = jnp.sum(acc_y, axis=0, keepdims=True)
        acc_z = jnp.sum(acc_z, axis=0, keepdims=True)
        acc_w = jnp.sum(acc_w, axis=0, keepdims=True)
    acc_ref[0:1, :] = acc_x + acc_w * s_
    acc_ref[1:2, :] = acc_y + acc_w * t_
    acc_ref[2:3, :] = acc_z + acc_w * u_


def pines_accel_pallas(r_bf, tab, gate, *, W, mu, radius, diag1,
                       tile_b=512, interpret=False, defer_reduce=True):
    """Non-spherical acceleration [B, 3] (f32) from the packed tables.

    `r_bf` [B, 3] f32 body-fixed positions; `tab` [n_steps, 8, W_pad];
    `gate` host-side tuple of 0/1 accumulation gates.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = r_bf.shape[0]
    n_steps, _, W_pad = tab.shape
    B_pad = _round_up(max(B, tile_b), tile_b)
    rT = jnp.zeros((3, B_pad), jnp.float32)
    rT = rT.at[:, :B].set(r_bf.astype(jnp.float32).T)
    # padded lanes hold zeros -> r=0 divides; seed them at the reference
    # radius so the kernel math stays finite (results are sliced away)
    rT = rT.at[0, B:].set(np.float32(radius))

    kernel = functools.partial(
        _pines_kernel,
        n_steps=n_steps, W=W, W_pad=W_pad, tile_b=tile_b,
        mu=mu, radius=radius, diag1=diag1,
        gate=tuple(bool(g) for g in gate),
        defer_reduce=defer_reduce,
    )
    accT = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, B_pad), jnp.float32),
        grid=(B_pad // tile_b,),
        # index maps: derive every constant coordinate from the i32 grid
        # index (0 * i) — a bare Python 0 traces as i64 under x64 mode and
        # the mixed (i64, i32) index tuple fails Mosaic legalization on
        # real-TPU lowering ("failed to legalize operation 'func.return'";
        # interpret mode doesn't lower and never caught it)
        in_specs=[
            pl.BlockSpec((3, tile_b), lambda i: (0 * i, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_steps, 8, W_pad),
                         lambda i: (0 * i, 0 * i, 0 * i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, tile_b), lambda i: (0 * i, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((W_pad, tile_b), jnp.float32),
            pltpu.VMEM((W_pad, tile_b), jnp.float32),
        ],
        interpret=interpret,
    )(rT, tab)
    return accT[:, :B].T
