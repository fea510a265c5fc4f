"""Spherical-harmonic gravity: batched Pines/Jones formulation.

Same normalized Helmholtz-polynomial algorithm as GMAT and the reference
(nyx-core/src/dynamics/gravity_field.rs:52-268), re-shaped for the TPU: the
(n,m) triangular recursion becomes a `lax.scan` over degree n whose carry
holds only the previous two Helmholtz rows (O(M) state, nothing triangular
materialized), every row operation is dense-vectorized over the order axis
and the batch axis, and the per-degree force contribution is fused into the
same scan so no [N, M] intermediate ever hits HBM. Normalization tables are
precomputed on host exactly as the reference's a_nm/b_nm/c_nm/vr01/vr11.

Gradients (for STM propagation) come from `jax.jacfwd` straight through the
scan — replacing the reference's duplicated hyperdual code path
(gravity_field.rs:273-431).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..io.gravity import GravityFieldData

_SQRT2 = np.sqrt(2.0)


def _precompute(N: int, M: int):
    """Host-side normalization tables, masked safe (invalid entries -> 0)."""
    W = M + 2  # column count
    n_idx = np.arange(N + 2)[:, None].astype(np.float64)
    m_idx = np.arange(W)[None, :].astype(np.float64)

    with np.errstate(invalid="ignore", divide="ignore"):
        b_nm = np.sqrt((2 * n_idx + 1) * (2 * n_idx - 1) / ((n_idx + m_idx) * (n_idx - m_idx)))
        c_nm = np.sqrt(
            (2 * n_idx + 1)
            * (n_idx + m_idx - 1)
            * (n_idx - m_idx - 1)
            / ((n_idx - m_idx) * (n_idx + m_idx) * (2 * n_idx - 3))
        )
        vr01 = np.sqrt((n_idx - m_idx) * (n_idx + m_idx + 1))
        vr11 = np.sqrt(
            (2 * n_idx + 1) * (n_idx + m_idx + 2) * (n_idx + m_idx + 1) / (2 * n_idx + 3)
        )
    vr01[:, 0] /= _SQRT2
    vr11[:, 0] /= _SQRT2
    for t in (b_nm, c_nm, vr01, vr11):
        t[~np.isfinite(t)] = 0.0

    diag = np.ones(N + 2)
    for n in range(1, N + 2):
        diag[n] = np.sqrt(1.0 + 1.0 / (2.0 * n)) * diag[n - 1]
    return b_nm, c_nm, vr01, vr11, diag


def _j2j3_accel(mu, radius_km, j2, j3, r, pole):
    """Closed-form J2+J3 zonal acceleration in the inertial frame (f64).

    `pole` is the body's spin-axis unit vector expressed inertially (third
    row of the J2000->body DCM); with u = r/|r| and s = pole.u (geocentric
    sin-latitude), the Vallado vector forms are
      a_J2 = -(3/2) J2 mu R^2/r^4 [(1-5 s^2) u + 2 s pole]
      a_J3 = -(5/2) J3 mu R^3/r^5 [(3 s-7 s^3) u + 3(s^2-1/5) pole]
    Only ~35 flops — lets the TPU split precision keep the two dominant
    zonals (the terms whose f32 evaluation-point noise integrates to
    meters/day) in f64 without any f64 trig, rotation or recursion.
    """
    rmag = jnp.linalg.norm(r, axis=-1, keepdims=True)
    u = r / rmag
    s = jnp.sum(pole * u, axis=-1, keepdims=True)
    rho2 = (radius_km / rmag) ** 2
    mu_r2 = mu / (rmag * rmag)
    c2 = -1.5 * j2 * mu_r2 * rho2
    a = c2 * ((1.0 - 5.0 * s * s) * u + (2.0 * s) * pole)
    if j3 != 0.0:
        c3 = -2.5 * j3 * mu_r2 * rho2 * (radius_km / rmag)
        a = a + c3 * (
            (3.0 * s - 7.0 * s**3) * u + 3.0 * (s * s - 0.2) * pole
        )
    return a


@dataclass(frozen=True)
class Harmonics:
    """A gravity-field acceleration model (jit-static wrapper).

    Use `Harmonics.from_stor(gravity_field_data)` mirroring the reference's
    `GravityField::new`. The instance precomputes device-ready tables; the
    `accel_body_fixed` function is pure and batched.
    """

    c_nm: tuple  # static-hashable via id; arrays stored on the side
    _tables: tuple
    mu_km3_s2: float
    radius_km: float
    max_degree: int
    max_order: int
    frame: object = None
    #: "f64": full field in float64 (the reference's precision; default).
    #: "mixed": degrees <= MIXED_SPLIT_DEGREE in f64, the rest of the field
    #: in f32 — TPU-native speed/precision split. High degrees contribute
    #: <= ~1e-7 km/s^2 at LEO, so their f32 rounding (6e-8 relative) lands at
    #: ~1e-14 km/s^2 absolute: centimeters over a 1-day arc even if fully
    #: systematic, while the expensive recursion runs at VPU f32 rate
    #: instead of emulated f64.
    #:
    #: CAVEAT: the f32 jitter acts as a noise floor on the integrator's
    #: error estimate. For very low altitudes (radius ratio near 1, e.g. a
    #: 50 km lunar orbit) combined with tolerances <= 1e-12 the adaptive
    #: step collapses chasing that noise — use "f64" there. Validated for
    #: Earth LEO 21x21 at tolerance 1e-9 (sub-meter vs f64 over 1 day).
    precision: str = "f64"
    #: unnormalized J2/J3 captured for precision="split" (zeroed in tables)
    j2: float = 0.0
    j3: float = 0.0
    #: "auto" (default): the Pallas VMEM kernel for f32 evaluations on a
    #: real TPU (measured +39% MC throughput over the XLA recursion at
    #: B=10k, 2026-08-19 sweep), XLA recursion everywhere else.
    #: "xla": always the XLA unrolled/scan recursion. "pallas": force the
    #: kernel even off-TPU (interpret mode — slow, for numerics tests).
    #: Applies to f32 evaluations only (f64/mixed calls always take the
    #: XLA paths).
    backend: str = "auto"
    #: precision="mixed": degrees <= split_degree evaluate in f64, the rest
    #: in f32 (Pallas on TPU). 3 suits Earth (J2 dominates); bodies with
    #: large low-degree sectorials (the Moon's C22) want ~8.
    split_degree: int = 3
    #: If set, gradients (jacfwd/jvp/linearize) differentiate a field
    #: TRUNCATED to this degree while the primal keeps the full field —
    #: the classic reduced-order variational-equations trick (the
    #: reference's hyperdual STM always carries the full field,
    #: gravity_field.rs:273-431, which is exact but pays the full
    #: recursion 9x per STM stage; degree >~ 8 partials are far below
    #: filter-gain relevance). None = exact AD through the full field.
    jvp_degree: int = None
    MIXED_SPLIT_DEGREE = 3

    @classmethod
    def from_stor(cls, stor: GravityFieldData, precision: str = "f64",
                  backend: str = "auto", split_degree: int = 3,
                  jvp_degree: int = None) -> "Harmonics":
        N, M = stor.max_degree, stor.max_order
        b_nm, c_nm, vr01, vr11, diag = _precompute(N, M)
        W = M + 2
        # Pad C/S to [N+2, W]
        C = np.zeros((N + 2, W))
        S = np.zeros((N + 2, W))
        C[: N + 1, : M + 1] = stor.c_nm
        S[: N + 1, : M + 1] = stor.s_nm
        # precision="split": the two dominant zonals go through the f64
        # closed form (_j2j3_accel); zero them in the recursion tables so
        # the f32 recursion carries only low-sensitivity terms.
        j2 = j3 = 0.0
        if precision == "split":
            if N >= 2:
                j2 = -np.sqrt(5.0) * C[2, 0]  # unnormalize C̄20
                C[2, 0] = 0.0
            if N >= 3:
                j3 = -np.sqrt(7.0) * C[3, 0]
                C[3, 0] = 0.0

        # Pack per-scan-step rows for n = 2..N+1 (accumulating degree q=n-1)
        ns = np.arange(2, N + 2)
        qs = ns - 1
        m_cols = np.arange(W)
        xs = dict(
            b_row=b_nm[ns],
            c_row=c_nm[ns],
            diag_n=diag[ns],
            offdiag_n=np.sqrt(2.0 * (ns - 1) + 3.0) * diag[ns - 1],
            row_mask=(m_cols[None, :] <= ns[:, None] - 2).astype(np.float64),
            C_q=C[qs] * (m_cols[None, :] <= np.minimum(qs, M)[:, None]),
            S_q=S[qs] * (m_cols[None, :] <= np.minimum(qs, M)[:, None]),
            vr01_q=vr01[qs],
            vr11_q=vr11[qs],
            n_is=ns.astype(np.float64),
        )
        # kept as numpy: the unrolled path embeds per-degree rows as literal
        # constants; the scan path converts to device arrays on trace.
        tables = (xs, diag, N, M)
        # content digest of the (post-split) coefficient tables: two
        # Harmonics built from identical field data hash/compare equal, so
        # jit caches keyed on the dynamics tree are shared instead of
        # recompiling per load (identity-keying was round-1 behavior)
        import hashlib

        digest = hashlib.sha1(C.tobytes() + S.tobytes()).hexdigest()
        return cls(
            c_nm=(digest,),
            _tables=tables,
            mu_km3_s2=float(stor.mu_km3_s2),
            radius_km=float(stor.radius_km),
            max_degree=N,
            max_order=M,
            frame=stor.frame,
            precision=precision,
            backend=backend,
            split_degree=int(split_degree),
            jvp_degree=jvp_degree if jvp_degree is None else int(jvp_degree),
            j2=float(j2),
            j3=float(j3),
        )

    def with_jvp_degree(self, q: int) -> "Harmonics":
        """Same field, gradients truncated to degree `q` (see jvp_degree)."""
        from dataclasses import replace

        return replace(self, jvp_degree=int(q))

    def __hash__(self):
        return hash((self.c_nm, self.mu_km3_s2, self.radius_km,
                     self.max_degree, self.max_order, self.precision,
                     self.backend, self.split_degree, self.jvp_degree))

    def __eq__(self, other):
        return self is other or (
            isinstance(other, Harmonics)
            and self.c_nm == other.c_nm  # content digest
            and self.mu_km3_s2 == other.mu_km3_s2
            and self.radius_km == other.radius_km
            and self.max_degree == other.max_degree
            and self.max_order == other.max_order
            and self.precision == other.precision
            and self.backend == other.backend
            and self.split_degree == other.split_degree
            and self.jvp_degree == other.jvp_degree
            and self.frame == other.frame
        )

    def required_bodies(self):
        return ()

    def accel(self, ctx, t_tdb, r, v):
        """Inertial-frame acceleration: rotate to the gravity frame, run the
        Pines recursion, rotate back (gravity_field.rs:148-268).

        The whole computation runs at the dtype of `r`: the orientation
        angles/trig stay f64 (angle reduction at f32 would misplace the
        frame by meters) but the resulting DCM entries are cast, so an f32
        caller pays no emulated-f64 rotation or recursion work.
        """
        from ..cosmic import rotations
        from ..cosmic.rotations import apply_dcm, apply_dcm_t

        if self.precision == "split" and r.dtype == jnp.float64:
            # f64 closed-form J2+J3 at the exact state (their evaluation-
            # point sensitivity is what integrates to meters/day in f32);
            # the rest of the field — whose sensitivity is ~1e3x smaller —
            # runs as a single f32 recursion on the zeroed tables.
            from ..cosmic.frames import iau_orient
            from ..constants import NAIF

            if self.frame.orientation == iau_orient(NAIF.EARTH):
                # zero-transcendental pole + f32 fast-angle rows (the f64
                # DCM trig alone costs ~1 ms/eval at B=1e5 on TPU)
                dcm32, pole = rotations.iau_earth_dcm32_pole(t_tdb)
            else:
                dcm = self.frame.dcm_from_j2000(t_tdb)  # [B, 3, 3] f64
                pole = dcm[..., 2, :]
                dcm32 = dcm.astype(jnp.float32)
            a_low = _j2j3_accel(
                self.mu_km3_s2, self.radius_km, self.j2, self.j3, r, pole
            )
            r_bf32 = apply_dcm(dcm32, r.astype(jnp.float32))
            a32 = self.accel_body_fixed(r_bf32)
            return a_low + apply_dcm_t(dcm32, a32).astype(jnp.float64)
        dcm = self.frame.dcm_from_j2000(t_tdb).astype(r.dtype)
        r_bf = apply_dcm(dcm, r)
        a_bf = self.accel_body_fixed(r_bf)
        return apply_dcm_t(dcm, a_bf)

    # Degrees up to this bound use the fully-unrolled fused path; above it,
    # a lax.scan keeps program size (and compile time) in check.
    UNROLL_MAX_DEGREE = 40

    def accel_body_fixed(self, r_bf):
        """Acceleration (km/s^2) in the body-fixed frame. r_bf: [B, 3] km.

        Includes ONLY the non-spherical terms (degree >= 1), exactly as the
        reference's AccelModel (two-body is applied separately).

        For moderate degrees the (n,m) recursion is unrolled so XLA fuses the
        whole field into one elementwise kernel (no HBM round-trip per
        degree — a scan would spill its [B, M] carry every step, which
        measures ~10x slower on TPU at B=1e4..1e5).
        """
        if self.jvp_degree is not None:
            return self._abf_truncated_jvp(r_bf)
        return self._abf_primal(r_bf)

    def _abf_truncated_jvp(self, r_bf):
        """Full-field primal with gradients through a degree-truncated
        field (see `jvp_degree`). One custom_jvp instance per Harmonics."""
        fn = self.__dict__.get("_trunc_jvp_fn")
        if fn is None:

            @jax.custom_jvp
            def accel(r):
                return self._abf_primal(r)

            @accel.defjvp
            def _jvp(primals, tangents):
                (r,), (dr,) = primals, tangents
                primal = self._abf_primal(r)
                q_t = min(self.jvp_degree, self.max_degree)
                _, tangent = jax.jvp(
                    lambda rr: self._accel_unrolled(rr, q_hi=q_t)
                    if q_t <= self.UNROLL_MAX_DEGREE
                    else self._accel_scan(rr, q_hi=q_t),
                    (r,), (dr,),
                )
                return primal, tangent

            fn = self.__dict__["_trunc_jvp_fn"] = accel
        return fn(r_bf)

    def _abf_primal(self, r_bf):
        split = self.split_degree
        if (
            self.precision == "mixed"
            and self.max_degree > split
            and r_bf.dtype == jnp.float64
        ):
            low = self._accel_any(r_bf, q_hi=split)
            high32 = self._accel_any(
                r_bf.astype(jnp.float32), q_lo=split
            )
            return low + high32.astype(r_bf.dtype)
        # an f32 caller already chose the speed/precision split upstream:
        # one single-dtype recursion
        return self._accel_any(r_bf)

    def _accel_any(self, r_bf, q_lo: int = 0, q_hi: int = 0):
        use_pallas = r_bf.dtype == jnp.float32 and (
            self.backend == "pallas"
            or (self.backend == "auto"
                and jax.default_backend() in ("tpu", "axon"))
        )
        if use_pallas:
            return self._accel_pallas(r_bf, q_lo, q_hi)
        # choose by the EFFECTIVE recursion length: a low-degree block
        # (q_hi << N) of a large field unrolls cheaply even when the full
        # field would not (n_steps = min(N, q_hi) rows are evaluated)
        eff = min(self.max_degree, q_hi) if q_hi else self.max_degree
        if eff <= self.UNROLL_MAX_DEGREE:
            return self._accel_unrolled(r_bf, q_lo, q_hi)
        return self._accel_scan(r_bf, q_lo, q_hi)

    def _accel_pallas(self, r_bf, q_lo: int = 0, q_hi: int = 0):
        """VMEM-resident Pines kernel (gravity_pallas.py); f32 only. Falls
        back to interpret mode off-TPU so numerics tests run anywhere.

        Differentiable: `pallas_call` has no JVP rule, so the kernel is
        wrapped in a `custom_jvp` whose tangent runs through the XLA
        recursion (same math bit-for-bit at f32) — STM propagation, the
        OD filter's `jax.linearize` H-matrices, and AD targeters all work
        with the fast primal."""
        cache = self.__dict__.setdefault("_pallas_jvp_cache", {})
        key = (q_lo, q_hi)
        if key not in cache:

            @jax.custom_jvp
            def accel(r):
                return self._pallas_primal(r, q_lo, q_hi)

            @accel.defjvp
            def _accel_jvp(primals, tangents):
                (r,), (dr,) = primals, tangents
                primal = self._pallas_primal(r, q_lo, q_hi)
                xla_fn = (
                    self._accel_unrolled
                    if self.max_degree <= self.UNROLL_MAX_DEGREE
                    else self._accel_scan
                )
                _, tangent = jax.jvp(
                    lambda rr: xla_fn(rr, q_lo, q_hi), (r,), (dr,)
                )
                return primal, tangent

            cache[key] = accel
        return cache[key](r_bf)

    def _pallas_primal(self, r_bf, q_lo: int = 0, q_hi: int = 0):
        from . import gravity_pallas as gp

        xs, diag, N, M = self._tables
        key = ("pallas_tab", q_lo, q_hi)
        cache = self.__dict__.setdefault("_pallas_cache", {})
        if key not in cache:
            cache[key] = gp.pack_tables(xs, N, M + 2, q_lo, q_hi)
        tab, gate = cache[key]
        interpret = jax.default_backend() not in ("tpu", "axon")
        import os

        # Mosaic stack allocation grows ~linearly with the unrolled step
        # count x tile width (measured: 80 steps x W_pad 88 x tile 512 =
        # 22.5 MB > the 16 MB scoped-vmem limit; 21 x 24 x 512 fits).
        # Budget ~10 MB at ~6.4 B per (step, m-row, lane) and clamp the
        # tile to [128, 512] in VPU-lane multiples.
        n_steps, _, w_pad = np.asarray(tab).shape
        fit = int(10e6 / (max(n_steps, 1) * w_pad * 6.4))
        tile_default = max(128, min(512, (fit // 128) * 128))
        return gp.pines_accel_pallas(
            r_bf, jnp.asarray(tab), gate, W=M + 2,
            mu=self.mu_km3_s2, radius=self.radius_km, diag1=float(diag[1]),
            tile_b=int(os.environ.get("NYX_PALLAS_TILE_B", tile_default)),
            interpret=interpret,
            defer_reduce=os.environ.get("NYX_PALLAS_DEFER", "1") != "0",
        )

    def _prelude(self, r_bf):
        xs, diag, N, M = self._tables
        W = M + 2
        B = r_bf.shape[0]
        r = jnp.sqrt(jnp.sum(r_bf * r_bf, axis=-1))
        s_ = r_bf[:, 0] / r
        t_ = r_bf[:, 1] / r
        u_ = r_bf[:, 2] / r
        rho = self.radius_km / r
        mu_over_r = self.mu_km3_s2 / r
        return xs, diag, N, M, W, B, r, s_, t_, u_, rho, mu_over_r

    def _accel_unrolled(self, r_bf, q_lo: int = 0, q_hi: int = 0):
        """Accumulates degrees q with q_lo < q <= (q_hi or N); the recursion
        always runs from the bottom (rows feed higher degrees)."""
        xs, diag, N, M, W, B, r, s_, t_, u_, rho, mu_over_r = self._prelude(r_bf)
        dt = r_bf.dtype
        q_hi = q_hi or N
        n_steps = min(N, q_hi)  # degree q = k+1 at loop step k

        # r_m / i_m as [B, W], built unrolled (small W)
        rms, ims = [jnp.ones(B, dt)], [jnp.zeros(B, dt)]
        for m in range(1, W):
            rms.append(s_ * rms[-1] - t_ * ims[-1])
            ims.append(s_ * ims[-1] + t_ * rms[-2])
        r_ms = jnp.stack(rms, axis=1)
        i_ms = jnp.stack(ims, axis=1)
        rm1 = jnp.concatenate([jnp.zeros((B, 1), dt), r_ms[:, :-1]], axis=1)
        im1 = jnp.concatenate([jnp.zeros((B, 1), dt), i_ms[:, :-1]], axis=1)

        m_f = jnp.arange(W, dtype=dt)[None, :]
        row0 = jnp.concatenate([jnp.ones((B, 1), dt), jnp.zeros((B, W - 1), dt)], 1)
        seed1 = np.zeros(W)
        seed1[0] = 1.0
        onehot1 = np.zeros(W)
        if W > 1:
            onehot1[1] = 1.0
        row1 = (u_ * dt.type(np.sqrt(3.0)))[:, None] * jnp.asarray(
            seed1, dt
        )[None, :] + dt.type(diag[1]) * jnp.asarray(onehot1, dt)[None, :]

        acc4 = jnp.zeros((B, 4), dt)
        rho_q = mu_over_r * rho
        row_nm1, row_nm2 = row1, row0
        npdt = np.dtype(dt.name)
        for k in range(n_steps):  # scan step k handles n = k+2, degree q = k+1
            b_row = xs["b_row"][k][None, :].astype(npdt)
            c_row = xs["c_row"][k][None, :].astype(npdt)
            mask = xs["row_mask"][k][None, :].astype(npdt)
            n = float(xs["n_is"][k])
            oh_diag = np.zeros(W)
            oh_off = np.zeros(W)
            if int(n) < W:
                oh_diag[int(n)] = 1.0
            if int(n) - 1 < W:
                oh_off[int(n) - 1] = 1.0
            rec = (u_[:, None] * b_row * row_nm1 - c_row * row_nm2) * mask
            row_n = (
                rec
                + npdt.type(xs["diag_n"][k]) * jnp.asarray(oh_diag, dt)[None, :]
                + (npdt.type(xs["offdiag_n"][k]) * u_)[:, None]
                * jnp.asarray(oh_off, dt)[None, :]
            )

            rho_q = rho_q * rho
            if k + 1 > q_lo:  # accumulate degree q = k+1 only above the split
                C_q = xs["C_q"][k][None, :].astype(npdt)
                S_q = xs["S_q"][k][None, :].astype(npdt)
                d_ = (C_q * r_ms + S_q * i_ms) * npdt.type(_SQRT2)
                e_ = (C_q * rm1 + S_q * im1) * npdt.type(_SQRT2)
                f_ = (S_q * rm1 - C_q * im1) * npdt.type(_SQRT2)
                row_q_p1 = jnp.concatenate([row_nm1[:, 1:], jnp.zeros((B, 1), dt)], 1)
                row_q1_p1 = jnp.concatenate([row_n[:, 1:], jnp.zeros((B, 1), dt)], 1)
                sx = jnp.sum(m_f * row_nm1 * e_, axis=1)
                sy = jnp.sum(m_f * row_nm1 * f_, axis=1)
                sz = jnp.sum(xs["vr01_q"][k][None, :].astype(npdt) * row_q_p1 * d_, axis=1)
                sw = -jnp.sum(xs["vr11_q"][k][None, :].astype(npdt) * row_q1_p1 * d_, axis=1)
                rr = rho_q / npdt.type(self.radius_km)
                acc4 = acc4 + rr[:, None] * jnp.stack([sx, sy, sz, sw], axis=1)
            row_nm1, row_nm2 = row_n, row_nm1

        return jnp.stack(
            [
                acc4[:, 0] + acc4[:, 3] * s_,
                acc4[:, 1] + acc4[:, 3] * t_,
                acc4[:, 2] + acc4[:, 3] * u_,
            ],
            axis=1,
        )

    def _accel_scan(self, r_bf, q_lo: int = 0, q_hi: int = 0):
        xs, diag, N, M, W, B, r, s_, t_, u_, rho, mu_over_r = self._prelude(r_bf)
        dt = r_bf.dtype
        q_hi = q_hi or N

        def _rm_step(carry, _):
            rm, im = carry
            return (s_ * rm - t_ * im, s_ * im + t_ * rm), (rm, im)

        (_, _), (r_ms, i_ms) = jax.lax.scan(
            _rm_step, (jnp.ones(B, dt), jnp.zeros(B, dt)), None, length=W
        )
        r_ms = jnp.moveaxis(r_ms, 0, -1)  # [B, W]
        i_ms = jnp.moveaxis(i_ms, 0, -1)
        rm1 = jnp.concatenate([jnp.zeros((B, 1), dt), r_ms[:, :-1]], axis=1)
        im1 = jnp.concatenate([jnp.zeros((B, 1), dt), i_ms[:, :-1]], axis=1)

        m_f = jnp.arange(W, dtype=dt)[None, :]

        row0 = jnp.zeros((B, W), dt).at[:, 0].set(1.0)
        row1 = jnp.zeros((B, W), dt)
        row1 = row1.at[:, 0].set(u_ * dt.type(np.sqrt(3.0)))
        if W > 1:
            row1 = row1.at[:, 1].set(dt.type(diag[1]))

        xs_j = {k: jnp.asarray(v, dt) for k, v in xs.items()}
        # per-step accumulation gate: degree q = step k + 1
        xs_j["acc_gate"] = jnp.asarray(
            (np.arange(1, N + 1) > q_lo) & (np.arange(1, N + 1) <= q_hi), dt
        )
        if q_hi < N:
            # the recursion only feeds upward: degrees past q_hi never
            # contribute, so the scan stops there (a truncated low block
            # of a large field costs O(q_hi), not O(N))
            xs_j = {k: v[:q_hi] for k, v in xs_j.items()}

        def step(carry, x):
            row_nm1, row_nm2, acc4, rho_q = carry
            n = x["n_is"]
            rec = (
                u_[:, None] * x["b_row"][None, :] * row_nm1
                - x["c_row"][None, :] * row_nm2
            ) * x["row_mask"][None, :]
            col = m_f
            row_n = jnp.where(
                col == n, x["diag_n"],
                jnp.where(col == n - 1, x["offdiag_n"] * u_[:, None], rec),
            )
            sq2 = dt.type(_SQRT2)
            d_ = (x["C_q"] * r_ms + x["S_q"] * i_ms) * sq2
            e_ = (x["C_q"] * rm1 + x["S_q"] * im1) * sq2
            f_ = (x["S_q"] * rm1 - x["C_q"] * im1) * sq2
            row_q_p1 = jnp.concatenate([row_nm1[:, 1:], jnp.zeros((B, 1), dt)], axis=1)
            row_q1_p1 = jnp.concatenate([row_n[:, 1:], jnp.zeros((B, 1), dt)], axis=1)
            sx = jnp.sum(m_f * row_nm1 * e_, axis=1)
            sy = jnp.sum(m_f * row_nm1 * f_, axis=1)
            sz = jnp.sum(x["vr01_q"][None, :] * row_q_p1 * d_, axis=1)
            sw = -jnp.sum(x["vr11_q"][None, :] * row_q1_p1 * d_, axis=1)
            rho_q_next = rho_q * rho
            rr = x["acc_gate"] * rho_q_next / dt.type(self.radius_km)
            acc4 = acc4 + rr[:, None] * jnp.stack([sx, sy, sz, sw], axis=1)
            return (row_n, row_nm1, acc4, rho_q_next), None

        init = (row1, row0, jnp.zeros((B, 4), dt), mu_over_r * rho)
        (_, _, acc4, _), _ = jax.lax.scan(step, init, xs_j)

        return jnp.stack(
            [
                acc4[:, 0] + acc4[:, 3] * s_,
                acc4[:, 1] + acc4[:, 3] * t_,
                acc4[:, 2] + acc4[:, 3] * u_,
            ],
            axis=1,
        )
