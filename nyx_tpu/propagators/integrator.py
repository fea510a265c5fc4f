"""Batched adaptive Runge-Kutta integration kernel.

The TPU-native inversion of the reference's hot loop
(nyx-core/src/propagators/instance.rs:358-493): instead of one scalar
adaptive RK per CPU thread, every Monte Carlo lane advances together inside
one `lax.while_loop`, each lane carrying its own step size, attempt counter
and done flag. Rejected lanes shrink their step and retry on the next global
iteration; finished lanes are masked no-ops until all lanes complete.
Step-size control follows GMAT/Nyx exactly: accept when
err <= tol or |h| <= min_step or attempts >= max; grow by
0.9 (tol/err)^(1/order), shrink by 0.9 (tol/err)^(1/(order-1)); the last
step is clamped to land exactly on the stop time (instance.rs:180-186).

States are flat `[B, N]` float64 arrays; the EOM is a batched pure function
`eom(t_rel_s [B], y [B, N]) -> [B, N]`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .options import IntegratorOptions
from .tableaus import IntegratorMethod

# Lane status codes
RUNNING = 0
DONE = 1
FAILED_NAN = 2


class PropCarry(NamedTuple):
    t: jnp.ndarray  # [B] seconds relative to integration start
    y: jnp.ndarray  # [B, N]
    h: jnp.ndarray  # [B] current (signed) step size, s
    status: jnp.ndarray  # [B] int32
    attempts: jnp.ndarray  # [B] int32 attempts for the current step
    error: jnp.ndarray  # [B] last error estimate
    n_accepted: jnp.ndarray  # [B] int32
    n_rejected: jnp.ndarray  # [B] int32
    it: jnp.ndarray  # [] global iteration counter
    comp: jnp.ndarray  # [B, N] Kahan compensation of the state updates
    traj_t: jnp.ndarray  # [B, K] capture buffer epochs (rel s)
    traj_y: jnp.ndarray  # [B, K, N]
    traj_len: jnp.ndarray  # [B] int32


class PropResult(NamedTuple):
    t: jnp.ndarray
    y: jnp.ndarray
    status: jnp.ndarray
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    error: jnp.ndarray
    step: jnp.ndarray
    traj_t: jnp.ndarray
    traj_y: jnp.ndarray
    traj_len: jnp.ndarray


def _rk_stages(eom, a, b, b_star, c, t, y, h, combo32: bool = False):
    """One full RK stage evaluation for all lanes (unrolled). Returns
    (increment, err_vec): the caller applies `y + increment` (the
    propagate loop does so with Kahan compensation).

    `combo32`: run the a-matrix combinations (which only perturb EOM
    *inputs* by ~h*|f|) in float32. The b-combination (the state
    increment) and the error estimate keep the f64 k's: the error sum
    cancels ~9 orders of magnitude and would drown in f32 rounding.
    """
    stages = b.shape[0]
    # Python-float coefficients and a state-dtype step keep the linear
    # combinations in the state's dtype (float() is weakly typed in JAX;
    # an np.float64 scalar would silently promote an f32 state to f64)
    hb = h.astype(y.dtype)[:, None]
    combo32 = combo32 and y.dtype == jnp.float64
    k = [eom(t, y)]
    kc = [k[0].astype(jnp.float32)] if combo32 else k
    for i in range(1, stages):
        wi = float(a[i, 0]) * kc[0]
        for j in range(1, i):
            if a[i, j] != 0.0:
                wi = wi + float(a[i, j]) * kc[j]
        k.append(eom(t + c[i] * h, y + hb * wi.astype(y.dtype)))
        if combo32:
            kc.append(k[i].astype(jnp.float32))
    acc = float(b[0]) * k[0]
    err = float(b[0] - b_star[0]) * k[0]
    for i in range(1, stages):
        if b[i] != 0.0:
            acc = acc + float(b[i]) * k[i]
        if (b[i] - b_star[i]) != 0.0:
            err = err + float(b[i] - b_star[i]) * k[i]
    return hb * acc, hb * err


def _rk_stages_looped(eom, a, b, b_star, c, t, y, h, unroll: int = 1):
    """Stage evaluation with a scan over stages: one EOM instantiation per
    unrolled body instead of `stages` copies. Essential on TPU, where
    heavyweight EOMs (high-degree gravity) make the 16x-unrolled RK89 body
    prohibitively slow to compile; the extra [S, B, N] stage buffer traffic
    is negligible next to the EOM itself.

    `unroll` trades compile time for loop-iteration overhead: the axon TPU
    runtime pays a fixed per-loop-iteration cost (~0.3 ms at B=2048), so
    processing several stages per iteration cuts the floor proportionally.
    """
    stages = b.shape[0]
    B, N = y.shape
    hb = h.astype(y.dtype)[:, None]
    a_j = jnp.asarray(a, dtype=y.dtype)
    c_j = jnp.asarray(c)
    k_buf = jnp.zeros((stages, B, N), dtype=y.dtype).at[0].set(eom(t, y))

    # The stage combinations are broadcast-multiply + sum, NOT einsum/dot:
    # XLA on the (axon) TPU lowers a float64 contraction at small batch to
    # an MXU dot that silently degrades to ~f32 (measured 2026-08-19:
    # err-estimate norm 4.6e-7 vs 5.3e-11 at B=1, correct at B=8), which
    # collapsed adaptive steps 50x. Elementwise ops keep the proper f64
    # emulation on every shape.
    def wsum(w, kb):
        return jnp.sum(w[:, None, None] * kb, axis=0)

    def step(kb, i):
        wi = wsum(a_j[i], kb)
        ki = eom(t + c_j[i] * h, y + hb * wi)
        return kb.at[i].set(ki), None

    k_buf, _ = jax.lax.scan(
        step, k_buf, jnp.arange(1, stages), unroll=min(unroll, stages - 1)
    )
    acc = wsum(jnp.asarray(b, dtype=y.dtype), k_buf)
    err = wsum(jnp.asarray(b - b_star, dtype=y.dtype), k_buf)
    return hb * acc, hb * err


def propagate(
    eom: Callable,
    y0: jnp.ndarray,
    duration_s,
    options: IntegratorOptions,
    method: IntegratorMethod = IntegratorMethod.RK89,
    t0=None,
    n_capture: int = 0,
    capture_stride: int = 1,
    finally_fn: Optional[Callable] = None,
    eom_args: tuple = (),
    stage_mode: Optional[str] = None,
    steps_per_iter: Optional[int] = None,
    state_dtype=jnp.float64,
) -> PropResult:
    """Propagate a batch of states for `duration_s` (may be negative or per-lane).

    Args:
      eom: batched EOM `(t[B], y[B,N]) -> [B,N]`.
      y0: `[B, N]` initial states (float64).
      duration_s: scalar or `[B]` signed duration in seconds.
      options: integrator options (static).
      method: RK tableau (static).
      t0: optional `[B]` start offsets (default zeros); epochs handed to the
        EOM are `t0 + elapsed`.
      n_capture: if > 0, size of the per-lane accepted-step capture buffer
        (the TPU stand-in for the reference's mpsc trajectory streaming,
        instance.rs:297-326).
      capture_stride: store every k-th accepted step (final state always).
      finally_fn: optional `(t[B], y[B,N]) -> [B,N]` post-step hook, the
        analogue of Dynamics::finally (dynamics/mod.rs:120-137).
      eom_args: extra pytree arguments appended to each `eom`/`finally_fn`
        call (e.g. the ephemeris context), so callers can jit this function
        with those as traced inputs instead of baked closure constants.
      stage_mode: "auto" (loop over stages for >= 8-stage methods),
        "unroll", or "loop".
      steps_per_iter: advance up to K attempted RK steps per `while_loop`
        iteration (every step is masked on lane status, so composing the
        step body K times is exact). The axon TPU runtime pays a fixed
        ~0.3 ms per loop iteration regardless of body size; K > 1 amortizes
        that floor at the cost of K x compile time. Lanes that finish
        mid-body simply mask out the remaining sub-steps.
      state_dtype: dtype of the integrated state (and the RK linear
        combinations, error estimates, capture buffer). Time, steps and
        durations always stay float64. float32 is the deviation-propagation
        mode (mc/encke.py): valid when the state magnitudes carry their
        meaning in ~7 significant digits.
    """
    if eom_args:
        inner_eom, inner_fin = eom, finally_fn
        eom = lambda t, y: inner_eom(t, y, *eom_args)
        if inner_fin is not None:
            finally_fn = lambda t, y: inner_fin(t, y, *eom_args)
    y0 = jnp.asarray(y0, dtype=state_dtype)
    if y0.ndim == 1:
        y0 = y0[None, :]
    B, N = y0.shape
    dur = jnp.broadcast_to(jnp.asarray(duration_s, dtype=jnp.float64), (B,))
    t_start = (
        jnp.zeros(B, dtype=jnp.float64)
        if t0 is None
        else jnp.broadcast_to(jnp.asarray(t0, dtype=jnp.float64), (B,))
    )
    # axon/TPU f64 SOUNDNESS GUARD (measured 2026-08-19): float64
    # elementwise chains whose second-minor dim is 1 evaluate at ~f32
    # precision inside lax loop bodies (the emulation's low word is
    # dropped on sub-sublane shapes) — a B=1 adaptive propagation then
    # sees f32-level error estimates and collapses its steps 50x
    # (12,211 vs 238 accepted steps on the OD bench arc). Padding the
    # batch to the 8-wide VPU sublane is numerically exact and free;
    # padded lanes duplicate lane 0 and are sliced off the result.
    b_real = B
    if B < 8 and state_dtype == jnp.float64 and jax.default_backend() in (
        "tpu", "axon",
    ):
        pad = 8 - B
        y0 = jnp.concatenate([y0, jnp.broadcast_to(y0[:1], (pad, N))], 0)
        dur = jnp.concatenate([dur, jnp.broadcast_to(dur[:1], (pad,))])
        t_start = jnp.concatenate(
            [t_start, jnp.broadcast_to(t_start[:1], (pad,))]
        )
        B = 8
    t_stop = t_start + dur
    sgn = jnp.where(dur < 0, -1.0, 1.0)

    a, b, b_star, c = method.a_matrix, method.b, method.b_star, method.c
    if stage_mode is None:
        stage_mode = options.stage_mode
    if steps_per_iter is None:
        steps_per_iter = options.steps_per_iter
    if stage_mode == "auto":
        stage_mode = "loop" if method.stages >= 8 else "unroll"
    if stage_mode == "loop":
        stage_fn = _rk_stages_looped  # combo_precision: unroll mode only
    else:
        stage_fn = partial(
            _rk_stages, combo32=options.combo_precision == "f32"
        )
    order = float(method.order)
    fixed = options.fixed_step or method.is_fixed_only
    min_step = options.min_step_s
    max_step = options.max_step_s
    tol = options.tolerance
    max_attempts = options.attempts

    h0 = sgn * min(options.init_step_s, options.max_step_s)
    K = max(n_capture, 1)
    # step-size-controller pow at f32 on TPU (see one_step); the factor
    # only needs ~2 significant digits and f64 pow is emulated
    _f32_ctrl = jax.default_backend() in ("tpu", "axon")

    if finally_fn is not None:
        y0 = finally_fn(t_start, y0)

    init = PropCarry(
        t=t_start,
        y=y0,
        h=jnp.full((B,), 1.0) * h0,
        status=jnp.where(dur == 0.0, DONE, RUNNING).astype(jnp.int32),
        attempts=jnp.ones((B,), dtype=jnp.int32),
        error=jnp.zeros((B,)),
        n_accepted=jnp.zeros((B,), dtype=jnp.int32),
        n_rejected=jnp.zeros((B,), dtype=jnp.int32),
        it=jnp.zeros((), dtype=jnp.int32),
        comp=jnp.zeros((B, N), dtype=state_dtype),
        traj_t=jnp.zeros((B, K)),
        # internal layout [B, N, K]: K in the 128-lane minor dim. The
        # public [B, K, N] layout puts N(=9) minor, which TPU tiling pads
        # to 128 lanes — a ~14x physical bloat that turns every loop
        # iteration's capture update into gigabytes of HBM traffic
        # (measured: the ex02 5000-lane 1024-node capture run spent
        # ~20 s/216 iterations on it). Transposed once at extraction.
        traj_y=jnp.zeros((B, N, K), dtype=state_dtype),
        traj_len=jnp.zeros((B,), dtype=jnp.int32),
    )

    def cond(carry: PropCarry):
        return jnp.logical_and(
            jnp.any(carry.status == RUNNING), carry.it < options.max_iterations
        )

    def one_step(carry: PropCarry) -> PropCarry:
        running = carry.status == RUNNING
        # Clamp the final step to land exactly on the stop time
        # (instance.rs:180-186: one fixed step of exactly the remainder).
        overshoot = (carry.t + carry.h) * sgn > t_stop * sgn
        h_use = jnp.where(overshoot, t_stop - carry.t, carry.h)

        inc, err_vec = stage_fn(eom, a, b, b_star, c, carry.t, carry.y, h_use)
        # Kahan-compensated state update: the rounding of y + inc is
        # re-injected into the next accepted step. Exact no-op in exact
        # arithmetic; in float32 deviation mode it removes the dominant
        # |y|*eps-per-step random walk (~10x lower day-scale drift).
        inc_eff = inc + carry.comp
        next_y = carry.y + inc_eff
        comp_new = inc_eff - (next_y - carry.y)

        if fixed:
            err = jnp.zeros((B,))
            accept = jnp.ones((B,), dtype=bool)
        else:
            # f64 step control regardless of the state dtype
            err = options.error_ctrl(err_vec, next_y, carry.y).astype(
                jnp.float64
            )
            # NOTE: a clamped (overshooting) final step is NOT force-
            # accepted: the reference's "one fixed step of the remainder"
            # (instance.rs:180-186) is safe there only because h has
            # already converged by the final step, but here the FIRST step
            # can overshoot (h grows to max_step after one tiny init step,
            # so any duration < max_step clamps immediately) — force-
            # accepting it integrated a whole orbit in one wild RK step.
            # A rejected clamped step shrinks h and retries like any other.
            accept = (
                (err <= tol)
                | (jnp.abs(h_use) <= min_step * (1 + 1e-12))
                | (carry.attempts >= max_attempts)
            )

        t_new = carry.t + h_use
        # Done on the clamped final step, or when a regular step happens to
        # land exactly on (or numerically past) the stop time.
        finished = overshoot | ((t_new - t_stop) * sgn >= 0.0)

        nan_lane = ~jnp.all(jnp.isfinite(next_y), axis=-1)

        do_accept = running & accept
        do_reject = running & ~accept

        # --- step-size adaptation (signed) ---
        safe_err = jnp.maximum(err, 1e-300)
        if _f32_ctrl:
            # the growth/shrink factor needs ~2 significant digits; f64
            # pow is emulated on TPU (~0.3 ms per [B] call at B=1e5).
            # Clamp the ratio into f32 range first (err can be ~1e-300).
            ratio = jnp.clip(tol / safe_err, 1e-30, 1e30).astype(jnp.float32)
            f_grow = (ratio ** jnp.float32(1.0 / order)).astype(jnp.float64)
            f_shrink = (
                ratio ** jnp.float32(1.0 / (order - 1.0))
            ).astype(jnp.float64)
        else:
            f_grow = (tol / safe_err) ** (1.0 / order)
            f_shrink = (tol / safe_err) ** (1.0 / (order - 1.0))
        grow = 0.9 * jnp.abs(carry.h) * f_grow
        shrink = 0.9 * jnp.abs(h_use) * f_shrink
        if fixed:
            h_acc = jnp.abs(carry.h)
        else:
            h_acc = jnp.where(err < tol, jnp.minimum(grow, max_step), jnp.abs(carry.h))
            h_acc = jnp.maximum(h_acc, min_step)
        h_rej = jnp.maximum(shrink, min_step)
        h_new = jnp.where(
            do_accept, sgn * h_acc, jnp.where(do_reject, sgn * h_rej, carry.h)
        )

        y_out = jnp.where(do_accept[:, None], next_y, carry.y)
        comp_out = jnp.where(do_accept[:, None], comp_new, carry.comp)
        if finally_fn is not None:
            y_fin = finally_fn(t_new, y_out)
            y_out = jnp.where(do_accept[:, None], y_fin, y_out)
        t_out = jnp.where(do_accept, t_new, carry.t)

        status_new = jnp.where(
            do_accept & nan_lane,
            FAILED_NAN,
            jnp.where(do_accept & finished, DONE, carry.status),
        )

        n_acc = carry.n_accepted + do_accept.astype(jnp.int32)
        n_rej = carry.n_rejected + do_reject.astype(jnp.int32)
        attempts_new = jnp.where(
            do_accept, 1, jnp.where(do_reject, carry.attempts + 1, carry.attempts)
        )

        # --- trajectory capture ---
        if n_capture > 0:
            want = do_accept & (
                ((n_acc - 1) % capture_stride == 0) | finished
            )
            idx = jnp.minimum(carry.traj_len, n_capture - 1)
            write_idx = jnp.where(want, idx, n_capture + 1)  # OOB -> dropped
            # dense one-hot select, NOT a per-lane scatter: the batched
            # .at[lanes, idx].set lowers to a scatter that runs ~50x
            # slower than the pure-bandwidth select on TPU (measured
            # 27 s -> <1 s on the ex02 5000x1024-capture ensemble)
            hit = jnp.arange(n_capture)[None, :] == write_idx[:, None]
            traj_t = jnp.where(hit, t_new[:, None], carry.traj_t)
            traj_y = jnp.where(hit[:, None, :], next_y[:, :, None],
                               carry.traj_y)
            traj_len = jnp.minimum(
                carry.traj_len + want.astype(jnp.int32), n_capture
            )
        else:
            traj_t, traj_y, traj_len = carry.traj_t, carry.traj_y, carry.traj_len

        return PropCarry(
            t=t_out,
            y=y_out,
            h=h_new,
            status=status_new,
            attempts=attempts_new,
            error=jnp.where(running, err, carry.error),
            n_accepted=n_acc,
            n_rejected=n_rej,
            it=carry.it + 1,
            comp=comp_out,
            traj_t=traj_t,
            traj_y=traj_y,
            traj_len=traj_len,
        )

    def body(carry: PropCarry) -> PropCarry:
        for _ in range(max(1, steps_per_iter)):
            carry = one_step(carry)
        return carry

    if options.loop_mode == "scan":
        # Fixed-trip-count main loop: finished lanes no-op through the
        # masked body, so results are bitwise-identical to the while_loop
        # whenever the trip count covers every lane's attempts (callers
        # check status==RUNNING and retry with a doubled count). Exists
        # because executing ANY while_loop program flips the axon session
        # into a ~400 ms-per-dispatch mode for the remainder of the
        # process (measured 2026-08-20; docs/OD_PIPELINE.md) — an
        # all-scan process keeps the fast dispatch path.
        trips = options.scan_iterations
        if trips <= 0:
            trips = (
                n_capture + n_capture // 4 + 32
                if n_capture > 0
                else options.max_iterations
            )
        trips = -(-trips // max(1, steps_per_iter))

        def scan_body(carry, _):
            return body(carry), None

        final, _ = jax.lax.scan(scan_body, init, None, length=trips)
    else:
        final = jax.lax.while_loop(cond, body, init)
    s = slice(0, b_real)  # drop the axon f64 sublane padding, if any
    return PropResult(
        t=final.t[s],
        y=final.y[s],
        status=final.status[s],
        n_accepted=final.n_accepted[s],
        n_rejected=final.n_rejected[s],
        error=final.error[s],
        step=final.h[s],
        traj_t=final.traj_t[s],
        traj_y=final.traj_y[s].swapaxes(-1, -2),  # -> public [B, K, N]
        traj_len=final.traj_len[s],
    )
