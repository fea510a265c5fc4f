"""The Almanac: ephemerides + orientations, host loader + device tables.

Plays the role of ANISE's Almanac in the reference (loaded once, shared
read-only — propagators/propagator.rs:88). Sources, in priority order:

1. real SPK kernels (de440s.bsp etc.) parsed by daf.py;
2. the built-in analytic series (analytic.py).

Either way, for device use a `EphemTable` is built: every requested body's
position relative to the integration center is re-fit as uniform-interval
Chebyshev polynomials over the propagation window, so the in-loop lookup is
`gather + Clenshaw` with zero data-dependent control flow (SURVEY.md §7
"foundations"). Velocities are polynomial derivatives.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NAIF
from ..time import Epoch
from . import analytic
from .chebyshev import eval_chebyshev, eval_chebyshev_deriv, fit_chebyshev
from .daf import BPC, SPK


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["t0", "intlen", "coeffs"],
    meta_fields=["bodies"],
)
@dataclasses.dataclass(frozen=True)
class EphemTable:
    """Device-resident Chebyshev ephemeris for N bodies about one center."""

    t0: jnp.ndarray  # scalar, TDB s past J2000 of table start
    intlen: jnp.ndarray  # scalar, record length s
    coeffs: jnp.ndarray  # [n_bodies, n_records, 3, deg+1], km
    bodies: Tuple[int, ...]  # static NAIF ids, in coeffs order

    def index_of(self, body: int) -> int:
        return self.bodies.index(body)

    # Record selection: XLA gathers are slow on TPU (~2 ms at B=1e4); for the
    # small uniform tables used per propagation a masked-sum select is a pure
    # fused elementwise chain and ~100x cheaper.
    _SELECT_MAX_RECORDS = 32
    # Below this record count it is cheaper still to skip coefficient
    # selection entirely: run Clenshaw once per record on [..,3] values and
    # mask-combine the RESULTS (n_rec * D fmas on [..,3]) instead of
    # materializing a per-lane [.., 3, D] coefficient tensor (at B=1e5 f64
    # that tensor is ~60 MB of HBM traffic per call — the dominant cost of
    # the in-EOM sun/third-body lookups that SRP pays 16x per RK step).
    _EVAL_PER_RECORD_MAX = 8

    def _coeff_at(self, idx: int, rec):
        n_rec = self.coeffs.shape[1]
        body_c = self.coeffs[idx]  # [n_rec, 3, D] (static index)
        if n_rec == 1:
            return jnp.broadcast_to(body_c[0], rec.shape + body_c.shape[1:])
        if n_rec <= self._SELECT_MAX_RECORDS:
            sel = (
                rec[..., None, None, None]
                == jnp.arange(n_rec)[None, :, None, None]
            )
            return jnp.sum(jnp.where(sel, body_c, 0.0), axis=-3)
        return body_c[rec]

    def _rec_tau(self, t_tdb_s, dtype=None):
        """Record index + normalized time. For f32 evaluations the whole
        chain after one f64 subtraction runs in f32: `rel` is at most a few
        intervals (~1e6 s), so f32 resolution (~0.06 s) puts ~2e-7 on tau —
        ~0.3 km on the Sun, far below the f32 rounding of the position
        itself. This matters because emulated-f64 div/floor at B=1e5 cost
        ~0.5 ms per lookup on TPU — the entire SRP floor (profile_srp.py)."""
        n_rec = self.coeffs.shape[1]
        rel = t_tdb_s - self.t0
        if dtype is not None and jnp.dtype(dtype).itemsize < 8:
            rel = rel.astype(dtype)
            intlen = self.intlen.astype(dtype)
        else:
            intlen = self.intlen
        rec = jnp.clip(jnp.floor(rel / intlen), 0, n_rec - 1).astype(jnp.int32)
        tau = 2.0 * (rel - rec * intlen) / intlen - 1.0
        return rec, tau

    def position(self, idx: int, t_tdb_s, dtype=None):
        """Position [.., 3] km of body `idx` (static) at TDB seconds [..].

        `dtype=jnp.float32` runs the Clenshaw recurrence at f32 VPU rate
        (record/tau selection stays f64 — the epoch magnitudes need it);
        the ~km-level f32 rounding of planetary positions is negligible for
        the perturbation models that use it (SRP direction, third bodies).
        """
        rec, tau = self._rec_tau(t_tdb_s, dtype)
        n_rec = self.coeffs.shape[1]
        if 1 < n_rec <= self._EVAL_PER_RECORD_MAX:
            tau_e = tau.astype(dtype) if dtype is not None else tau
            body_c = self.coeffs[idx]
            if dtype is not None:
                body_c = body_c.astype(dtype)  # [n_rec,3,D] const, cast free
            out = eval_chebyshev(body_c[0], tau_e)
            for i in range(1, n_rec):
                out = jnp.where(
                    (rec == i)[..., None], eval_chebyshev(body_c[i], tau_e), out
                )
            return out
        c = self._coeff_at(idx, rec)
        if dtype is not None:
            c = c.astype(dtype)
            tau = tau.astype(dtype)
        return eval_chebyshev(c, tau)

    def posvel(self, idx: int, t_tdb_s):
        rec, tau = self._rec_tau(t_tdb_s)
        c = self._coeff_at(idx, rec)
        pos = eval_chebyshev(c, tau)
        vel = eval_chebyshev_deriv(c, tau) * (2.0 / self.intlen)
        return pos, vel


class Almanac:
    """Host-side ephemeris/orientation source and device-table factory."""

    def __init__(
        self,
        spk_paths: Sequence[str | Path] = (),
        bpc_paths: Sequence[str | Path] = (),
    ):
        self.spks = [SPK(p) for p in spk_paths]
        self.bpcs = [BPC(p) for p in bpc_paths]

    # ---------------- host-side queries ------------------------------
    def _spk_with(self, target: int):
        for spk in self.spks:
            if any(s.target == target for s in spk.segments):
                return spk
        return None

    @lru_cache(maxsize=256)
    def _records(self, spk_id: int, target: int):
        spk = self.spks[spk_id]
        seg = spk.segment_for(target)
        rec = spk.chebyshev_records(seg)
        # Chebyshev derivative coefficients for exact velocities
        dcoeffs = np.polynomial.chebyshev.chebder(rec.coeffs, 1, axis=-1)
        return seg, rec, dcoeffs

    def _position_chain(self, body: int, t: np.ndarray) -> np.ndarray:
        """Vectorized position of `body` rel SSB from loaded SPKs, km."""
        return self._state_chain(body, t, with_velocity=False)[0]

    def _state_chain(self, body: int, t: np.ndarray, with_velocity: bool):
        """Vectorized (pos, vel) of `body` rel SSB from loaded SPKs, km and
        km/s. Velocities come from the exact Chebyshev derivative."""
        pos = np.zeros(t.shape + (3,))
        vel = np.zeros(t.shape + (3,)) if with_velocity else None
        while body != 0:
            spk = self._spk_with(body)
            if spk is None:
                # finish the chain analytically (heliocentric; the Sun-vs-
                # SSB convention cancels in the target-center difference
                # as long as both chains end the same way)
                pos = pos + analytic.heliocentric(body, t)
                if with_velocity:
                    h = 2.0
                    vel = vel + (
                        analytic.heliocentric(body, t + h)
                        - analytic.heliocentric(body, t - h)
                    ) / (2.0 * h)
                break
            seg, rec, dcoeffs = self._records(self.spks.index(spk), body)
            i = np.clip(
                ((t - rec.init) // rec.intlen).astype(int), 0, rec.n_records - 1
            )
            tau = 2.0 * (t - rec.init - i * rec.intlen) / rec.intlen - 1.0
            V = np.polynomial.chebyshev.chebvander(tau, rec.degree)
            pos = pos + np.einsum("...kd,...d->...k", rec.coeffs[i, 0:3, :], V)
            if with_velocity:
                vel = vel + np.einsum(
                    "...kd,...d->...k",
                    dcoeffs[i, 0:3, :],
                    V[..., : rec.degree],
                ) * (2.0 / rec.intlen)
            body = seg.center
        return pos, vel

    def position(self, target: int, center: int, t_tdb_s) -> np.ndarray:
        """Position of target rel center at TDB seconds (array ok), EME2000 km."""
        t = np.atleast_1d(np.asarray(t_tdb_s, dtype=np.float64))
        if self.spks:
            try:
                out = self._position_chain(target, t) - self._position_chain(
                    center, t
                )
                return out.reshape(np.shape(t_tdb_s) + (3,))
            except KeyError:
                pass
        out = analytic.state_between(target, center, t)
        return out.reshape(np.shape(t_tdb_s) + (3,))

    def state(self, target: int, center: int, epoch: Epoch):
        """(r, v) of target rel center in EME2000 at an Epoch (host).
        Velocities come from the Chebyshev derivative when an SPK resolves
        the chain (exact), finite differences on the analytic fallback."""
        t = np.atleast_1d(epoch.to_tdb_seconds())
        try:
            rt, vt = self._state_chain(target, t, with_velocity=True)
            rc, vc = self._state_chain(center, t, with_velocity=True)
            return (rt - rc)[0], (vt - vc)[0]
        except KeyError:
            pass
        r = self.position(target, center, t)[0]
        h = 2.0
        v = (
            self.position(target, center, t + h)
            - self.position(target, center, t - h)
        )[0] / (2 * h)
        return r, v

    def translate_to(self, orbit, frame):
        """The orbit re-centered on `frame`'s body (ANISE transform_to for
        translation-only frame changes; both frames must be J2000-aligned —
        rotating targets would also need a DCM, which propagation frames
        never are in the reference's usage, instance.rs:119-142)."""
        from dataclasses import replace as _replace

        if orbit.frame.center == frame.center:
            return _replace(orbit, frame=frame)
        if not (orbit.frame.is_inertial and frame.is_inertial):
            from ..errors import ConfigError

            raise ConfigError(
                "translate_to supports J2000-aligned frames only; use "
                "Trajectory.to_frame for rotating-frame output"
            )
        r_c, v_c = self.state(orbit.frame.center, frame.center, orbit.epoch)
        return _replace(
            orbit,
            r_km=np.asarray(orbit.r_km) + r_c,
            v_km_s=np.asarray(orbit.v_km_s) + v_c,
            frame=frame,
        )

    # ---------------- device-table construction ----------------------
    def build_table(
        self,
        bodies: Sequence[int],
        center: int,
        start: Epoch,
        end: Epoch,
        intlen_days: float = 4.0,
        degree: int = 12,
        pad_days: float = 2.0,
    ) -> EphemTable:
        t0 = start.to_tdb_seconds() - pad_days * 86_400.0
        t1 = end.to_tdb_seconds() + pad_days * 86_400.0
        intlen = intlen_days * 86_400.0
        n_rec = max(1, int(np.ceil((t1 - t0) / intlen)))
        tabs = []
        for b in bodies:
            fn = lambda ts, b=b: self.position(b, center, ts)
            tabs.append(fit_chebyshev(fn, t0, intlen, n_rec, degree))
        coeffs = np.stack(tabs) if tabs else np.zeros((0, n_rec, 3, degree + 1))
        return EphemTable(
            t0=jnp.float64(t0),
            intlen=jnp.float64(intlen),
            coeffs=jnp.asarray(coeffs),
            bodies=tuple(int(b) for b in bodies),
        )


_DEFAULT = None


def _is_real_kernel(p: Path) -> bool:
    """True when `p` looks like an actual DAF kernel rather than a git-LFS
    pointer stub (133-byte text files are common in cloned repos)."""
    try:
        if p.stat().st_size < 2048:
            return False
        with open(p, "rb") as f:
            head = f.read(8)
        return head.startswith(b"DAF/")
    except OSError:
        return False


def default_almanac() -> Almanac:
    """Process-wide Almanac.

    Scans, in order: ``$NYX_TPU_DATA``, the package-adjacent ``data/``
    directory, and ``~/.nyx_tpu/data`` for ``*.bsp``/``*.bpc`` kernels,
    skipping git-LFS pointer stubs. When a real SPK is found the DAF
    Chebyshev path supersedes the analytic series for every body the
    kernel covers (Almanac.position falls back per-body otherwise)."""
    global _DEFAULT
    if _DEFAULT is None:
        import os

        spks, bpcs = [], []
        roots = []
        data_dir = os.environ.get("NYX_TPU_DATA")
        if data_dir:
            roots.append(Path(data_dir))
        roots.append(Path(__file__).resolve().parents[2] / "data")
        roots.append(Path.home() / ".nyx_tpu" / "data")
        for d in roots:
            if not d.is_dir():
                continue
            spks.extend(p for p in sorted(d.glob("*.bsp")) if _is_real_kernel(p))
            bpcs.extend(p for p in sorted(d.glob("*.bpc")) if _is_real_kernel(p))
        try:
            _DEFAULT = Almanac(spks, bpcs)
        except Exception:
            _DEFAULT = Almanac()
    return _DEFAULT
