"""Encke deviation propagation: f32 ensemble lanes around one f64 reference.

The MC ensemble's lanes differ from the nominal by km-scale deviations
(dispersion + along-track drift, ~10-200 km over a day), while the states
themselves are ~7,000 km. Propagating the DEVIATION in float32 keeps ~5
significant digits of the deviation (mm-level) at native f32 VPU rate,
avoiding the TPU's emulated-float64 cost for the state update, error
control, and the dominant two-body term:

  1. The NOMINAL lane propagates once at full quality (f64/split), and is
     resampled onto a uniform grid of (r, v, a) rows — position/velocity
     interpolated on device with a quintic Hermite in f64 (sub-mm at a
     60 s grid).
  2. The two-body differential uses Encke's f(q) form, algebraically
     cancelled so no catastrophic subtraction occurs:
       da_2b = -mu/r_ref^3 (delta - f(q) r_full),  f(q) = 1-(1+q)^(-3/2)
     evaluated in f64 (a handful of ops; everything heavy stays f32).
  3. The perturbation differential is P_f32(r_full) - P_table(t), where
     the table stores the SAME f32 perturbation function evaluated on the
     reference grid — the smooth part of the f32 evaluation error is
     common-mode and cancels in the difference.
  4. The deviation tolerance is RELATIVE TO THE DEVIATION (|delta| ~ km),
     so the adaptive RK can run ~3x larger steps than the absolute
     1e-9-tolerance full-state propagation for the same final accuracy.

This is the "deviation propagation" lever of the perf plan; numerically
validated against the full-state path in tests/test_monte_carlo.py.
No guidance/thrust or trajectory capture in this mode (MC statistics use
the recombined final states).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..dynamics.gravity import Harmonics, _j2j3_accel


class EnckeReference(NamedTuple):
    """Device-resident reference tables (pytree)."""

    stride_s: jnp.ndarray  # [] f64
    r: jnp.ndarray  # [K, 3] f64 positions
    v: jnp.ndarray  # [K, 3] f64 velocities
    a: jnp.ndarray  # [K, 3] f64 total accelerations (quintic end data)
    p32: jnp.ndarray  # [K, 3] f32 perturbation accel (same f32 fn as lanes)


def make_perturbation_fn(dyn):
    """f32 perturbation stack P(ctx, t, r32, v32, sc32) matching the
    dynamics' composition; for split-precision harmonics the closed-form
    J2+J3 is re-added in f32 (its zeroed tables skip it)."""
    split_harmonics = [
        m for m in dyn.orbital_dyn.models
        if isinstance(m, Harmonics) and m.precision == "split"
    ]
    force_models = dyn.force_models

    def pert(ctx, t_tdb, r32, v32, sc32):
        a = dyn.orbital_dyn.perturbation_accel(ctx, t_tdb, r32, v32)
        for h in split_harmonics:
            dcm = h.frame.dcm_from_j2000(t_tdb).astype(jnp.float32)
            pole = dcm[..., 2, :]
            # Python floats stay weakly typed: the whole closed form runs
            # in f32 because r32 is f32
            a = a + _j2j3_accel(
                float(h.mu_km3_s2), float(h.radius_km),
                float(h.j2), float(h.j3), r32, pole,
            )
        for fm in force_models:
            a = a + fm.force_per_mass(ctx, t_tdb, r32, v32, sc32)
        # some models promote to f64 (e.g. third-body ephemeris tables);
        # the deviation lanes and the reference table both evaluate THIS
        # function, so a trailing cast keeps the common-mode cancellation
        # while pinning the lane dtype to f32
        return a.astype(jnp.float32)

    return pert


def build_reference(prop, template_sc, duration_s, almanac,
                    stride_s: float = 60.0) -> EnckeReference:
    """Propagate the nominal once (full quality) and build the grid tables."""
    # propagate PAST the grid end: a grid node clamped to the trajectory
    # end would corrupt the last interpolation intervals exactly where
    # every lane finishes
    span = duration_s + 4.0 * stride_s
    inst = prop.with_state(template_sc, almanac)
    n_cap = int(span / 30.0) + 256  # roomy capture for the reference
    _, traj = inst.for_duration_with_traj(span, n_capture=n_cap)

    ts = np.arange(0.0, duration_s + stride_s * 2.5, stride_s)
    ys = np.stack([traj.interpolate(t) for t in ts])
    r = ys[:, 0:3]
    v = ys[:, 3:6]

    dyn = prop.dynamics
    ctx = dyn.build_context(template_sc.epoch, duration_s, almanac)
    t_tdb = jnp.float64(ctx.epoch0_tdb) + jnp.asarray(ts)
    sc32 = dict(
        cr=jnp.float32(template_sc.cr),
        cd=jnp.float32(template_sc.cd),
        srp_area_m2=jnp.float32(template_sc.srp_area_m2),
        drag_area_m2=jnp.float32(template_sc.drag_area_m2),
        mass_kg=jnp.float32(template_sc.total_mass_kg),
    )
    pert = make_perturbation_fn(dyn)
    r32 = jnp.asarray(r, jnp.float32)
    v32 = jnp.asarray(v, jnp.float32)
    p32 = pert(ctx, t_tdb, r32, v32, sc32)
    # total accel for the quintic interpolation end data (f64)
    a_tot = np.asarray(
        dyn.orbital_dyn.two_body_accel(ctx, jnp.asarray(r))
    ) + np.asarray(p32, np.float64)
    return EnckeReference(
        stride_s=jnp.float64(stride_s),
        r=jnp.asarray(r),
        v=jnp.asarray(v),
        a=jnp.asarray(a_tot),
        p32=jnp.asarray(p32, jnp.float32),
    )


def _quintic(ref: EnckeReference, t_rel):
    """f64 (r_ref, v_ref) at per-lane times: two-point quintic Hermite on
    the uniform grid using (r, v, a) end data — interpolation error
    ~(h*omega)^6, sub-mm at 60 s for LEO."""
    h = ref.stride_s
    x = t_rel / h
    K = ref.r.shape[0]
    i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, K - 2)
    s = (x - i.astype(jnp.float64))[..., None]
    r0, r1 = ref.r[i], ref.r[i + 1]
    v0, v1 = ref.v[i] * h, ref.v[i + 1] * h
    a0, a1 = ref.a[i] * h**2, ref.a[i + 1] * h**2
    s2 = s * s
    s3 = s2 * s
    s4 = s3 * s
    s5 = s4 * s
    # quintic Hermite basis (position, velocity, acceleration endpoints)
    h00 = 1 - 10 * s3 + 15 * s4 - 6 * s5
    h10 = s - 6 * s3 + 8 * s4 - 3 * s5
    h20 = 0.5 * s2 - 1.5 * s3 + 1.5 * s4 - 0.5 * s5
    h01 = 10 * s3 - 15 * s4 + 6 * s5
    h11 = -4 * s3 + 7 * s4 - 3 * s5
    h21 = 0.5 * s3 - s4 + 0.5 * s5
    r_ref = h00 * r0 + h10 * v0 + h20 * a0 + h01 * r1 + h11 * v1 + h21 * a1
    # derivative of the basis / h gives velocity
    d00 = (-30 * s2 + 60 * s3 - 30 * s4) / h
    d10 = (1 - 18 * s2 + 32 * s3 - 15 * s4) / h
    d20 = (s - 4.5 * s2 + 6 * s3 - 2.5 * s4) / h
    d01 = (30 * s2 - 60 * s3 + 30 * s4) / h
    d11 = (-12 * s2 + 28 * s3 - 15 * s4) / h
    d21 = (1.5 * s2 - 4 * s3 + 2.5 * s4) / h
    v_ref = d00 * r0 + d10 * v0 + d20 * a0 + d01 * r1 + d11 * v1 + d21 * a1
    return r_ref, v_ref


def _lagrange6_p32(ref: EnckeReference, t_rel):
    """f32 perturbation-table value at per-lane times: 6-point Lagrange on
    the uniform grid. Interpolation error ~(h*omega)^6 of the oscillating
    part of P — a lower-order cubic leaves ~1e-9 km/s^2 of residual that
    integrates to tens of meters per day (measured); at 6th order the
    residual is below the f32 noise floor."""
    h = ref.stride_s
    x = t_rel / h
    K = ref.p32.shape[0]
    # window start: center the 6 nodes around the evaluation segment
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32) - 2, 0, K - 6)
    s = (x - i0.astype(jnp.float64)).astype(jnp.float32)[..., None]
    out = jnp.zeros(t_rel.shape + (3,), jnp.float32)
    for m in range(6):
        w = jnp.ones_like(s[..., 0:1])
        for j in range(6):
            if j != m:
                w = w * (s - j) / float(m - j)
        out = out + w * ref.p32[i0 + m]
    return out


def _adams_coefficients(k: int):
    """Exact Adams-Bashforth (k-step) and Adams-Moulton (k-step, order
    k+1 used PECE) weights, derived by integrating the Lagrange basis
    with `fractions.Fraction` — no transcribed tables to get wrong.

    Returns (beta[k], gamma[k+1]) as float64 arrays; beta pairs with
    f-history nodes s = 0, -1, ..., -(k-1) (newest first) and gamma with
    s = +1, 0, -1, ..., -(k-1)."""
    from fractions import Fraction

    def weights(nodes):
        out = []
        for j, sj in enumerate(nodes):
            # polynomial Π_{i≠j} (s - s_i) / (s_j - s_i), coeffs low->high
            poly = [Fraction(1)]
            denom = Fraction(1)
            for i, si in enumerate(nodes):
                if i == j:
                    continue
                denom *= sj - si
                poly = [Fraction(0)] + poly  # * s
                for d in range(len(poly) - 1):
                    poly[d] -= si * poly[d + 1]
            # ∫_0^1 poly ds
            integ = sum(c / (d + 1) for d, c in enumerate(poly))
            out.append(float(integ / denom))
        return np.asarray(out)

    ab_nodes = [Fraction(-i) for i in range(k)]
    am_nodes = [Fraction(1)] + ab_nodes
    return weights(ab_nodes), weights(am_nodes)


def propagate_fixed(dyn, ref: EnckeReference, y0_dev, duration_s, ctx, p,
                    method, dt_s: float = 150.0, integ: str = "rk",
                    capture_every: int = 0):
    """Synchronized fixed-step deviation propagation: one `lax.scan` where
    EVERY lane shares the same scalar stage times.

    The adaptive deviation path (`make_encke_eom` + the while-loop kernel)
    lets each lane carry its own epoch, so every stage pays per-lane
    [B,3,3] f64 frame rotations and per-lane gathers from the reference
    tables — measured SLOWER than the full-state path at B=10k on TPU
    despite the f32 lanes. Here the step grid is global, so everything
    time-dependent collapses to per-STAGE scalars precomputed in one shot
    before the scan:

      * (r_ref, v_ref) at all n_steps x S stage times — one vectorized
        quintic Hermite evaluation (f64);
      * the reference's f32 perturbation at those exact points — one
        batched call of the same f32 perturbation stack the lanes use, so
        the smooth part of the f32 evaluation error cancels exactly (the
        common-mode trick of the adaptive mode's p32 table, but with zero
        interpolation error);
      * the frame DCM trig inside the lanes' own perturbation call runs
        once per stage (scalar t), broadcast across lanes.

    The hot loop is then pure elementwise VPU work: the f32 perturbation
    recursion on [B,3] plus a ~10-op f64 Encke two-body core. RK89 at
    dt=150 s holds the deviation local error at mm-level (|delta| ~ 1e2 km,
    (h*omega)^9 ~ 1e-7), validated in tests/test_monte_carlo.py.

    With `capture_every` = k > 0, the deviation state is also captured
    every k-th grid node (the scan runs in k-step chunks, emitting once
    per chunk — no [n_steps, B] buffer ever exists), and the return value
    grows capture arrays: (y_fin, n_steps, cap_t [K] f64 relative
    seconds, cap_y [K, B, 9] f32). Without capture, cap_t/cap_y are None.
    """
    S = method.stages
    a_tab = np.asarray(method.a_matrix)
    b_tab = np.asarray(method.b)
    c_tab = np.asarray(method.c)
    n_steps = max(1, int(np.ceil(duration_s / dt_s)))
    ce = int(capture_every)
    use_abm = integ == "abm" and n_steps >= 2 * _ABM_K
    if ce > 0:
        # align the grid so capture chunks tile the main loop exactly
        start = _ABM_K - 1 if use_abm else 0
        n_steps = start + ce * max(1, int(np.ceil((n_steps - start) / ce)))
    dt = float(duration_s) / n_steps  # land exactly on the end epoch

    pert = make_perturbation_fn(dyn)
    mu = ctx.frame.mu
    dt32 = jnp.float32(dt)

    sc32_ref = dict(
        cr=jnp.float32(p.get("cr_ref", 1.8)),
        cd=jnp.float32(p.get("cd_ref", 2.2)),
        srp_area_m2=jnp.float32(p["srp_area_m2"]),
        drag_area_m2=jnp.float32(p["drag_area_m2"]),
        mass_kg=jnp.float32(p.get("mass_ref_kg", p["dry_mass_kg"])),
    )

    def ref_tables(flat_t):
        """(r_ref f64, v_ref f64, p32_ref f32) at shared times [T]."""
        r_ref, v_ref = _quintic(ref, flat_t)
        p32_ref = pert(
            ctx, ctx.epoch0_tdb + flat_t, r_ref.astype(jnp.float32),
            v_ref.astype(jnp.float32), sc32_ref,
        )
        return r_ref, v_ref, p32_ref

    def stage_accel(t_rel_s, y, r_ref_i, v_ref_i, p32_i, sc32):
        """[B, 9] deviation derivative at one shared stage time."""
        dr32, dv32 = y[..., 0:3], y[..., 3:6]
        dr = dr32.astype(jnp.float64)
        r_full = r_ref_i + dr  # broadcast [3] + [B,3]
        rr2 = jnp.sum(r_ref_i * r_ref_i)  # scalar f64
        q = jnp.sum(dr * (dr + 2.0 * r_ref_i), axis=-1, keepdims=True) / rr2
        fq = 1.0 - (1.0 + q) ** (-1.5)
        rr3 = rr2 * jnp.sqrt(rr2)
        da_2b = (-mu / rr3) * (dr - fq * r_full)
        r32 = r_full.astype(jnp.float32)
        v32 = (v_ref_i + dv32.astype(jnp.float64)).astype(jnp.float32)
        dp = pert(ctx, ctx.epoch0_tdb + t_rel_s, r32, v32, sc32) - p32_i
        ddv = da_2b.astype(jnp.float32) + dp
        zeros = jnp.zeros_like(y[..., 6:9])
        return jnp.concatenate([dv32, ddv, zeros], axis=-1)

    y0_dev = jnp.asarray(y0_dev, jnp.float32)
    comp0 = jnp.zeros_like(y0_dev)
    # the parameter columns (cr, cd, prop mass) never change in this mode
    # (no thrust), so the per-lane spacecraft dict is loop-invariant
    sc32 = dict(
        cr=y0_dev[..., 6], cd=y0_dev[..., 7],
        srp_area_m2=jnp.float32(p["srp_area_m2"]),
        drag_area_m2=jnp.float32(p["drag_area_m2"]),
        mass_kg=p["dry_mass_kg"] + y0_dev[..., 8],
    )

    def rk_step(y, comp, t_s, r_s, v_s, p32_s):
        """One S-stage RK step with a Kahan-compensated update."""
        k = [stage_accel(t_s[0], y, r_s[0], v_s[0], p32_s[0], sc32)]
        for i in range(1, S):
            wi = float(a_tab[i, 0]) * k[0]
            for j in range(1, i):
                if a_tab[i, j] != 0.0:
                    wi = wi + float(a_tab[i, j]) * k[j]
            yi = y + dt32 * wi
            k.append(stage_accel(t_s[i], yi, r_s[i], v_s[i], p32_s[i], sc32))
        acc = float(b_tab[0]) * k[0]
        for i in range(1, S):
            if b_tab[i] != 0.0:
                acc = acc + float(b_tab[i]) * k[i]
        inc_eff = dt32 * acc + comp
        y_new = y + inc_eff
        comp_new = inc_eff - (y_new - y)
        return y_new, comp_new

    if use_abm:
        y_fin, cap_t, cap_y = _propagate_abm(
            ref_tables, stage_accel, rk_step, sc32, y0_dev, comp0,
            n_steps, dt, dt32, c_tab, ce,
        )
        return y_fin, n_steps, cap_t, cap_y

    # ---- classic per-step RK scan: stage tables for every step ----------
    t_base = dt * jnp.arange(n_steps, dtype=jnp.float64)
    t_stage = t_base[:, None] + jnp.asarray(c_tab) * dt  # [n, S]
    r_ref, v_ref, p32_ref = ref_tables(t_stage.ravel())
    xs = (
        t_stage,
        r_ref.reshape(n_steps, S, 3),
        v_ref.reshape(n_steps, S, 3),
        p32_ref.reshape(n_steps, S, 3),
    )

    def body(carry, x):
        y, comp = carry
        t_s, r_s, v_s, p32_s = x
        y_new, comp_new = rk_step(y, comp, t_s, r_s, v_s, p32_s)
        return (y_new, comp_new), None

    if ce > 0:
        n_outer = n_steps // ce
        xs_c = jax.tree.map(
            lambda a: a.reshape((n_outer, ce) + a.shape[1:]), xs
        )

        def outer(carry, xc):
            carry, _ = jax.lax.scan(body, carry, xc)
            return carry, carry[0]

        (y_fin, _), caps = jax.lax.scan(outer, (y0_dev, comp0), xs_c)
        cap_t = dt * ce * jnp.arange(n_outer + 1, dtype=jnp.float64)
        cap_y = jnp.concatenate([y0_dev[None], caps], axis=0)
        return y_fin, n_steps, cap_t, cap_y

    (y_fin, _), _ = jax.lax.scan(body, (y0_dev, comp0), xs)
    return y_fin, n_steps, None, None


_ABM_K = 8  # Adams history length (AB8 predictor, AM corrector, PECE)


def _propagate_abm(ref_tables, stage_accel, rk_step, sc32, y0_dev, comp0,
                   n_steps, dt, dt32, c_tab, capture_every=0):
    """Adams-Bashforth-Moulton PECE main loop for the fixed-step Encke
    path: TWO perturbation evaluations per step (predict + correct)
    instead of the S=16 of an RK89 step — the classical fixed-step orbit
    propagation economics (cf. GMAT's ABM integrators), applied to the
    deviation dynamics where the smoothness assumption is safest (the
    differential perturbation is tiny and slowly varying; the only
    discontinuities are shadow crossings whose Encke differential is
    ~1e-10 km/s^2, integrating to sub-micron ringing).

    Startup: k-1 RK steps seed the f-history at the first k grid nodes —
    run as their own small `lax.scan` so the RK stage graph compiles ONCE
    (unrolling it k-1 times made XLA compile the force model ~120 times).
    Coefficients are derived exactly at trace time (_adams_coefficients).
    """
    k_hist = _ABM_K
    beta, gamma = _adams_coefficients(k_hist)
    beta32 = [jnp.float32(b) for b in beta]
    gamma32 = [jnp.float32(g) for g in gamma]
    S = len(c_tab)

    # node tables at every grid point 0..n_steps, [n+1]
    t_nodes = dt * jnp.arange(n_steps + 1, dtype=jnp.float64)
    rN, vN, pN = ref_tables(t_nodes)
    # startup stage tables for steps 0..k-2, [k-1, S]
    t_base = dt * jnp.arange(k_hist - 1, dtype=jnp.float64)
    t_stage = t_base[:, None] + jnp.asarray(c_tab) * dt
    rS, vS, pS = ref_tables(t_stage.ravel())
    su_xs = (
        t_stage,
        rS.reshape(k_hist - 1, S, 3),
        vS.reshape(k_hist - 1, S, 3),
        pS.reshape(k_hist - 1, S, 3),
        t_nodes[1:k_hist], rN[1:k_hist], vN[1:k_hist], pN[1:k_hist],
    )

    def su_body(carry, x):
        y, comp = carry
        t_s, r_s, v_s, p32_s, t1, r1, v1, p1 = x
        y_new, comp_new = rk_step(y, comp, t_s, r_s, v_s, p32_s)
        f1 = stage_accel(t1, y_new, r1, v1, p1, sc32)
        return (y_new, comp_new), (f1, y_new)

    (y, comp), (f_rest, y_su) = jax.lax.scan(su_body, (y0_dev, comp0), su_xs)
    f0 = stage_accel(t_nodes[0], y0_dev, rN[0], vN[0], pN[0], sc32)
    # [k, B, 9], newest first: nodes k-1, k-2, ..., 1, 0
    fhist = jnp.concatenate([f_rest[::-1], f0[None]], axis=0)

    xs = (t_nodes[k_hist:], rN[k_hist:], vN[k_hist:], pN[k_hist:])

    def body(carry, x):
        y, comp, fhist = carry
        t1, r1, v1, p1 = x
        # P: AB8 predictor
        acc_p = beta32[0] * fhist[0]
        for j in range(1, k_hist):
            acc_p = acc_p + beta32[j] * fhist[j]
        y_p = y + dt32 * acc_p
        # E at the predicted point
        f_p = stage_accel(t1, y_p, r1, v1, p1, sc32)
        # C: AM corrector (Kahan-compensated, it defines the solution)
        acc_c = gamma32[0] * f_p
        for j in range(1, k_hist + 1):
            acc_c = acc_c + gamma32[j] * fhist[j - 1]
        inc_eff = dt32 * acc_c + comp
        y_new = y + inc_eff
        comp_new = inc_eff - (y_new - y)
        # E at the corrected point -> becomes the stored history value
        f_c = stage_accel(t1, y_new, r1, v1, p1, sc32)
        fhist_new = jnp.concatenate([f_c[None], fhist[:-1]], axis=0)
        return (y_new, comp_new, fhist_new), None

    if capture_every > 0:
        ce = capture_every
        n_main = n_steps - (k_hist - 1)
        n_outer = n_main // ce
        xs_c = jax.tree.map(
            lambda a: a.reshape((n_outer, ce) + a.shape[1:]), xs
        )

        def outer(carry, xc):
            carry, _ = jax.lax.scan(body, carry, xc)
            return carry, carry[0]

        (y_fin, _, _), caps = jax.lax.scan(outer, (y, comp, fhist), xs_c)
        # capture nodes: 0, 1..k-1 (startup, every node), then chunk ends
        cap_t = jnp.concatenate([
            t_nodes[:k_hist],
            t_nodes[k_hist - 1] + dt * ce * jnp.arange(
                1, n_outer + 1, dtype=jnp.float64
            ),
        ])
        cap_y = jnp.concatenate([y0_dev[None], y_su, caps], axis=0)
        return y_fin, cap_t, cap_y

    (y_fin, _, _), _ = jax.lax.scan(body, (y, comp, fhist), xs)
    return y_fin, None, None


def make_encke_eom(dyn, ref: EnckeReference):
    """Deviation EOM `(t_rel [B], y [B, 9] f32, ctx, p) -> [B, 9] f32`.

    y = [delta_r (km), delta_v (km/s), cr, cd, prop_mass] — the parameter
    columns ride along untouched (no thrust in this mode)."""
    pert = make_perturbation_fn(dyn)

    def eom(t_rel, y, ctx, p):
        dr32 = y[..., 0:3]
        dv32 = y[..., 3:6]
        r_ref, v_ref = _quintic(ref, t_rel)
        dr = dr32.astype(jnp.float64)
        r_full = r_ref + dr
        # --- Encke two-body differential, f64 (cancellation-free) ------
        mu = ctx.frame.mu
        rr2 = jnp.sum(r_ref * r_ref, axis=-1, keepdims=True)
        q = jnp.sum(dr * (dr + 2.0 * r_ref), axis=-1, keepdims=True) / rr2
        fq = 1.0 - (1.0 + q) ** (-1.5)
        rr3 = rr2 * jnp.sqrt(rr2)
        da_2b = (-mu / rr3) * (dr - fq * r_full)
        # --- perturbation differential, f32 ----------------------------
        t_tdb = ctx.epoch0_tdb + t_rel
        r32 = r_full.astype(jnp.float32)
        v32 = (v_ref + dv32.astype(jnp.float64)).astype(jnp.float32)
        mass = p["dry_mass_kg"] + y[..., 8]
        sc32 = dict(
            cr=y[..., 6],
            cd=y[..., 7],
            srp_area_m2=jnp.float32(p["srp_area_m2"]),
            drag_area_m2=jnp.float32(p["drag_area_m2"]),
            mass_kg=mass,
        )
        dp = pert(ctx, t_tdb, r32, v32, sc32) - _lagrange6_p32(ref, t_rel)
        ddv = da_2b.astype(jnp.float32) + dp
        zeros = jnp.zeros_like(y[..., 6:9])
        return jnp.concatenate([dv32, ddv, zeros], axis=-1)

    return eom
