"""Monte Carlo results: ensemble queries and export.

Counterpart of the reference's `Results`/`Run` (mc/results.rs:48-242), with
queries vectorized over the ensemble axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..cosmic.spacecraft import Spacecraft
from ..md import param as param_mod
from ..time import Epoch
from ..errors import MonteCarloError


def _two_body_j2_accel(r, mu, j2, re):
    """[.., 3] end-node acceleration for the quintic interpolant: two-body
    plus the J2 zonal term about the inertial z-axis (the true pole is
    within ~0.003 rad of z in EME2000; the residual is third-order here).
    Vallado Eq. 8-30 form."""
    rm = np.maximum(np.linalg.norm(r, axis=-1, keepdims=True), 1e-12)
    a = (-mu / rm**3) * r
    if j2 > 0.0 and re > 0.0:
        z2_r2 = (r[..., 2:3] / rm) ** 2
        k = -1.5 * j2 * mu * re**2 / rm**5
        fac = np.concatenate(
            [1.0 - 5.0 * z2_r2, 1.0 - 5.0 * z2_r2, 3.0 - 5.0 * z2_r2],
            axis=-1,
        )
        a = a + k * fac * r
    return a


def _hermite_cubic(t0, t1, y0, y1, t, mu: float = 0.0, j2: float = 0.0,
                   re: float = 0.0):
    """Two-point Hermite on captured steps: y = [.., r(3), v(3), ..];
    QUINTIC on position when `mu` > 0, using the end velocities and the
    analytic two-body accelerations a = -mu r/|r|^3 as end data (the
    neglected perturbation is ~1e-3 of a, cutting interpolation error
    ~1000x vs the plain cubic — km-level sma wiggle between 150 s capture
    nodes becomes metre-level). Velocity is the quintic's derivative;
    everything else is linear. mu = 0 keeps the original cubic. Shapes
    broadcast over leading axes; t in [t0, t1]."""
    h = np.maximum(t1 - t0, 1e-12)
    s = np.clip((t - t0) / h, 0.0, 1.0)[..., None]
    r0, v0 = y0[..., 0:3], y0[..., 3:6]
    r1, v1 = y1[..., 0:3], y1[..., 3:6]
    hN = h[..., None]
    out = y0 + (y1 - y0) * s  # linear for mass/Cr/Cd columns
    s2 = s * s
    s3 = s2 * s
    if mu > 0.0:
        a0 = _two_body_j2_accel(r0, mu, j2, re)
        a1 = _two_body_j2_accel(r1, mu, j2, re)
        s4 = s3 * s
        s5 = s4 * s
        h00 = 1 - 10 * s3 + 15 * s4 - 6 * s5
        h10 = s - 6 * s3 + 8 * s4 - 3 * s5
        h20 = 0.5 * s2 - 1.5 * s3 + 1.5 * s4 - 0.5 * s5
        h01 = 10 * s3 - 15 * s4 + 6 * s5
        h11 = -4 * s3 + 7 * s4 - 3 * s5
        h21 = 0.5 * s3 - s4 + 0.5 * s5
        out[..., 0:3] = (
            h00 * r0 + h10 * hN * v0 + h20 * hN**2 * a0
            + h01 * r1 + h11 * hN * v1 + h21 * hN**2 * a1
        )
        d00 = (-30 * s2 + 60 * s3 - 30 * s4) / hN
        d10 = 1 - 18 * s2 + 32 * s3 - 15 * s4
        d20 = (s - 4.5 * s2 + 6 * s3 - 2.5 * s4) * hN
        d01 = (30 * s2 - 60 * s3 + 30 * s4) / hN
        d11 = -12 * s2 + 28 * s3 - 15 * s4
        d21 = (1.5 * s2 - 4 * s3 + 2.5 * s4) * hN
        out[..., 3:6] = (
            d00 * r0 + d10 * v0 + d20 * a0 + d01 * r1 + d11 * v1 + d21 * a1
        )
        return out
    h00 = 2 * s3 - 3 * s2 + 1
    h10 = s3 - 2 * s2 + s
    h01 = -2 * s3 + 3 * s2
    h11 = s3 - s2
    d00 = (6 * s2 - 6 * s) / hN
    d10 = (3 * s2 - 4 * s + 1)
    d01 = (-6 * s2 + 6 * s) / hN
    d11 = (3 * s2 - 2 * s)
    out[..., 0:3] = h00 * r0 + h10 * hN * v0 + h01 * r1 + h11 * hN * v1
    out[..., 3:6] = d00 * r0 + d10 * v0 + d01 * r1 + d11 * v1
    return out


@dataclass
class Results:
    epoch0: Epoch
    end_epoch: Epoch
    template: Spacecraft
    y_final: np.ndarray  # [B, 9]
    status: np.ndarray  # [B]
    n_accepted: np.ndarray
    n_rejected: np.ndarray
    #: per-run capture buffers (None unless run with n_capture > 0)
    traj_t: Optional[np.ndarray] = None  # [B, K] rel s (valid: traj_len)
    traj_y: Optional[np.ndarray] = None  # [B, K, N]
    traj_len: Optional[np.ndarray] = None  # [B]
    #: set by locate_nth_event
    event_t: Optional[np.ndarray] = None  # [B] rel s of the nth crossing
    event_y: Optional[np.ndarray] = None  # [B, N] state at the crossing
    event_found: Optional[np.ndarray] = None  # [B] bool
    #: dispersed initial states (for first_values_of; mc/results.rs:117-137)
    y_initial: Optional[np.ndarray] = None  # [B, 9]
    #: J2/radius of the propagation's central body, used as end-node
    #: acceleration data by the quintic capture interpolant (0 = two-body)
    interp_j2: float = 0.0
    interp_re_km: float = 0.0

    @property
    def n_runs(self) -> int:
        return self.y_final.shape[0]

    @property
    def has_trajectories(self) -> bool:
        return self.traj_t is not None

    @property
    def n_ok(self) -> int:
        from ..propagators.integrator import DONE

        return int(np.sum(self.status == DONE))

    def final_values_of(self, parameter: str) -> np.ndarray:
        frame = self.template.frame
        return np.asarray(
            param_mod.value(
                parameter, jnp.asarray(self.y_final), frame.mu, frame.radius_km or 0.0
            )
        )

    def dispersion_values_of(self, parameter: str) -> tuple[float, float]:
        vals = self.final_values_of(parameter)
        return float(np.mean(vals)), float(np.std(vals))

    def first_values_of(self, parameter: str) -> np.ndarray:
        """Per-run value at the dispersed INITIAL state
        (mc/results.rs first_values_of)."""
        if self.y_initial is None:
            raise MonteCarloError("initial states were not retained")
        frame = self.template.frame
        return np.asarray(
            param_mod.value(
                parameter, jnp.asarray(self.y_initial[:, :9]), frame.mu,
                frame.radius_km or 0.0,
            )
        )

    def last_values_of(self, parameter: str) -> np.ndarray:
        """Per-run value at the final state (mc/results.rs last_values_of)."""
        return self.final_values_of(parameter)

    def final_state(self, index: int) -> Spacecraft:
        return self.template.set_vector(self.end_epoch, self.y_final[index])

    # -- per-run trajectories (mc/results.rs Run.dispersed_state.traj) ----
    def trajectory(self, index: int):
        """The captured trajectory of one run as a Trajectory."""
        if not self.has_trajectories:
            raise MonteCarloError("run with n_capture > 0 to retain trajectories")
        from ..md.trajectory import Trajectory

        k = int(self.traj_len[index])
        # sample 0 is the initial state (prepended in MonteCarlo._results)
        ts = self.traj_t[index, :k]
        ys = self.traj_y[index, :k]
        return Trajectory.from_capture(self.epoch0, ts, ys, self.template)

    def _interp_all(self, t_rel: np.ndarray) -> np.ndarray:
        """[B, G, N] ensemble states at shared grid epochs `t_rel` [G],
        vectorized two-point cubic Hermite on the capture buffers."""
        if not self.has_trajectories:
            raise MonteCarloError("run with n_capture > 0 to retain trajectories")
        B, K, N = self.traj_y.shape
        G = len(t_rel)
        # native whole-ensemble kernel (nyx_tpu/native/hermite.cpp) — the
        # per-lane Python loop below is the no-toolchain fallback
        from .. import native

        mu = self.template.frame.mu or 0.0
        j2, re = self.interp_j2, self.interp_re_km
        nat = native.hermite_interp_ensemble(
            self.traj_t, self.traj_y, self.traj_len, np.asarray(t_rel),
            mu, j2, re,
        )
        if nat is not None:
            return nat
        out = np.empty((B, G, N))
        for b in range(B):  # searchsorted per lane; vector math per lane
            k = int(self.traj_len[b])
            ts = self.traj_t[b, :k]
            ys = self.traj_y[b, :k]
            idx = np.clip(np.searchsorted(ts, t_rel), 1, k - 1)
            out[b] = _hermite_cubic(
                ts[idx - 1], ts[idx], ys[idx - 1], ys[idx], t_rel, mu, j2, re
            )
        return out

    def every_value_of(self, parameter: str, step, value_if_run_failed=None):
        """(t_rel_s [G], values [B, G]) of a StateParameter sampled at a
        fixed step across the whole ensemble (mc/results.rs every_value_of)."""
        from ..propagators.instance import _secs

        step_s = _secs(step)
        dur = float((self.end_epoch - self.epoch0).to_seconds())
        ts = np.arange(0.0, dur + 1e-9, step_s)
        ys = self._interp_all(ts)
        frame = self.template.frame
        B, G, N = ys.shape
        vals = np.asarray(
            param_mod.value(
                parameter,
                jnp.asarray(ys.reshape(B * G, N)[:, :9]),
                frame.mu,
                frame.radius_km or 0.0,
            )
        ).reshape(B, G)
        if value_if_run_failed is not None:
            from ..propagators.integrator import DONE

            vals[self.status != DONE] = value_if_run_failed
        return ts, vals

    def locate_nth_event(self, event, trigger: int) -> None:
        """Per-lane nth zero-crossing of `event` over the capture buffers:
        batched sign-change count + vectorized bisection on the bracketing
        cubic-Hermite segment. Sets event_t/event_y/event_found."""
        if not self.has_trajectories:
            raise MonteCarloError("run with n_capture > 0 to locate events")
        frame = self.template.frame
        mu, radius = frame.mu, frame.radius_km or 0.0
        B, K, N = self.traj_y.shape
        g = np.asarray(
            event.g(jnp.asarray(self.traj_y.reshape(B * K, N)[:, :9]), mu, radius)
        ).reshape(B, K)
        valid = np.arange(K)[None, :] < self.traj_len[:, None]
        sign_flip = (g[:, :-1] * g[:, 1:] < 0.0) & valid[:, 1:] & valid[:, :-1]
        if event.parameter.lower() in param_mod.StateParameter.ANGLES_DEG:
            # drop wrap-around flips (the event g is already wrapped to
            # +-180, so a genuine crossing has a small |jump|)
            sign_flip &= np.abs(g[:, 1:] - g[:, :-1]) < 180.0
        count = np.cumsum(sign_flip, axis=1)
        hit = sign_flip & (count == trigger)
        found = hit.any(axis=1)
        seg = np.where(found, hit.argmax(axis=1), 0)  # crossing in [seg, seg+1]
        lanes = np.arange(B)
        t_lo = self.traj_t[lanes, seg]
        t_hi = self.traj_t[lanes, seg + 1]
        y_lo = self.traj_y[lanes, seg]
        y_hi = self.traj_y[lanes, seg + 1]

        # vectorized bisection on the Hermite segment (all lanes at once)
        a, b = t_lo.copy(), t_hi.copy()
        g_lo = g[lanes, seg]
        j2, re = self.interp_j2, self.interp_re_km
        for _ in range(40):
            mid = 0.5 * (a + b)
            y_mid = _hermite_cubic(t_lo, t_hi, y_lo, y_hi, mid, mu, j2, re)
            g_mid = np.asarray(event.g(jnp.asarray(y_mid[:, :9]), mu, radius))
            left = g_lo * g_mid > 0.0
            a = np.where(left, mid, a)
            g_lo = np.where(left, g_mid, g_lo)
            b = np.where(left, b, mid)
        t_ev = 0.5 * (a + b)
        y_ev = _hermite_cubic(t_lo, t_hi, y_lo, y_hi, t_ev, mu, j2, re)
        self.event_t = np.where(found, t_ev, self.traj_t[lanes, np.maximum(self.traj_len - 1, 0)])
        self.event_y = np.where(found[:, None], y_ev, self.y_final)
        self.event_found = found

    def event_state(self, index: int) -> Spacecraft:
        if self.event_t is None:
            raise MonteCarloError("call locate_nth_event (or run_until_nth_event) first")
        return self.template.set_vector(
            self.epoch0 + float(self.event_t[index]), self.event_y[index][:9]
        )

    def truncated(self, n: int) -> "Results":
        """First n runs (drops chunk padding)."""
        sl = lambda a: None if a is None else a[:n]
        return Results(
            self.epoch0, self.end_epoch, self.template,
            self.y_final[:n], self.status[:n],
            self.n_accepted[:n], self.n_rejected[:n],
            sl(self.traj_t), sl(self.traj_y), sl(self.traj_len),
            sl(self.event_t), sl(self.event_y), sl(self.event_found),
            sl(self.y_initial), self.interp_j2, self.interp_re_km,
        )

    @classmethod
    def concatenate(cls, chunks: list) -> "Results":
        first = chunks[0]

        def cat(name):
            if getattr(first, name) is None:
                return None
            return np.concatenate([getattr(c, name) for c in chunks])

        return cls(
            first.epoch0, first.end_epoch, first.template,
            cat("y_final"), cat("status"), cat("n_accepted"), cat("n_rejected"),
            cat("traj_t"), cat("traj_y"), cat("traj_len"),
            cat("event_t"), cat("event_y"), cat("event_found"),
            cat("y_initial"), first.interp_j2, first.interp_re_km,
        )

    def to_parquet(
        self,
        path,
        fields=("x", "y", "z", "vx", "vy", "vz", "sma", "ecc", "inc"),
        trajectories: bool = False,
        step=None,
    ) -> str:
        """Final-state ensemble export, or (trajectories=True) the full
        ensemble time history — one row per (run, epoch) — matching the
        reference's whole-ensemble parquet export (mc/results.rs:48-242,
        the JWST example's 5000-run artifact)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..io.export import WATERMARK

        if trajectories:
            from ..propagators.instance import _secs

            if not self.has_trajectories:
                raise MonteCarloError("run with n_capture > 0 to export trajectories")
            if step == "nodes":
                # every captured integration step, per run, at its own
                # adaptive epochs — the reference's full-rate ensemble
                # artifact (mc/results.rs:48-242 exports each step)
                lens = np.asarray(self.traj_len)
                mask = np.arange(self.traj_t.shape[1])[None, :] < lens[:, None]
                flat = np.asarray(self.traj_y)[mask][:, :9]
                frame = self.template.frame
                cols = {
                    "run": np.repeat(
                        np.arange(len(lens)), lens
                    ).astype(np.int32),
                    "epoch_rel_s": np.asarray(self.traj_t)[mask],
                }
                for f in fields:
                    cols[f] = np.asarray(
                        param_mod.value(
                            f, jnp.asarray(flat), frame.mu,
                            frame.radius_km or 0.0,
                        )
                    )
                table = pa.table(cols).replace_schema_metadata(WATERMARK)
                pq.write_table(table, path, compression="zstd")
                return str(path)
            step_s = _secs(step) if step is not None else 60.0
            ts, _ = self.every_value_of("x", step_s)  # grid only
            ys = self._interp_all(ts)
            B, G, N = ys.shape
            frame = self.template.frame
            cols = {
                "run": np.repeat(np.arange(B), G),
                "epoch_rel_s": np.tile(ts, B),
            }
            flat = ys.reshape(B * G, N)[:, :9]
            for f in fields:
                cols[f] = np.asarray(
                    param_mod.value(
                        f, jnp.asarray(flat), frame.mu, frame.radius_km or 0.0
                    )
                )
            table = pa.table(cols).replace_schema_metadata(WATERMARK)
            pq.write_table(table, path, compression="zstd")
            return str(path)

        cols = {"run": np.arange(self.n_runs), "status": self.status}
        for f in fields:
            cols[f] = self.final_values_of(f)
        table = pa.table(cols).replace_schema_metadata(WATERMARK)
        pq.write_table(table, path, compression="zstd")
        return str(path)
