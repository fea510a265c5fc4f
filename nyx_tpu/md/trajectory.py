"""Trajectory storage and Hermite interpolation.

Counterpart of the reference's `Traj<S>` (md/trajectory/traj.rs:54-430):
a chronological store of accepted integrator states with 13-sample sliding-
window Hermite interpolation (INTERPOLATION_SAMPLES=13, interpolatable.rs:22)
on position/velocity pairs, linear interpolation of propellant mass, and
resampling/query helpers. Host-side storage is numpy; the capture buffers
come straight from the batched integrator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from ..cosmic.spacecraft import Spacecraft
from ..time import Duration, Epoch
from . import param as param_mod

INTERPOLATION_SAMPLES = 13


def hermite_eval(ts, ys, yds, t):
    """Hermite interpolation with derivatives at `t`.

    ts [n], ys [n, k] values, yds [n, k] derivatives. Returns (y [k], yd [k]).
    Newton divided-difference formulation on 2n doubled nodes.
    """
    n, k = ys.shape
    m = 2 * n
    z = np.repeat(ts, 2)
    q = np.zeros((m, m, k))
    q[0::2, 0] = ys
    q[1::2, 0] = ys
    # first divided differences: odd rows use the derivative
    for i in range(m - 1):
        if i % 2 == 0:
            q[i, 1] = yds[i // 2]
        else:
            q[i, 1] = (q[i + 1, 0] - q[i, 0]) / (z[i + 1] - z[i])
    for j in range(2, m):
        for i in range(m - j):
            q[i, j] = (q[i + 1, j - 1] - q[i, j - 1]) / (z[i + j] - z[i])
    # Evaluate Newton form and its derivative via Horner-like accumulation
    val = np.zeros(k)
    dval = np.zeros(k)
    prod = 1.0
    dprod = 0.0
    val += q[0, 0]
    for j in range(1, m):
        dprod = dprod * (t - z[j - 1]) + prod
        prod = prod * (t - z[j - 1])
        val = val + q[0, j] * prod
        dval = dval + q[0, j] * dprod
    return val, dval


@dataclass
class Trajectory:
    epoch0: Epoch
    ts: np.ndarray  # [K] seconds relative to epoch0, strictly increasing
    ys: np.ndarray  # [K, N] flat state vectors (N >= 9)
    template: Spacecraft

    @classmethod
    def from_capture(cls, epoch0, ts, ys, template) -> "Trajectory":
        ts = np.asarray(ts, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        order = np.argsort(ts, kind="stable")
        ts, ys = ts[order], ys[order]
        keep = np.concatenate([[True], np.diff(ts) > 0])
        return cls(epoch0, ts[keep], ys[keep], template)

    def __len__(self):
        return len(self.ts)

    @property
    def first(self) -> Spacecraft:
        return self._state_at_index(0)

    @property
    def last(self) -> Spacecraft:
        return self._state_at_index(len(self.ts) - 1)

    @property
    def start_epoch(self) -> Epoch:
        return self.epoch0 + float(self.ts[0])

    @property
    def end_epoch(self) -> Epoch:
        return self.epoch0 + float(self.ts[-1])

    def _state_at_index(self, i: int) -> Spacecraft:
        return self.template.set_vector(self.epoch0 + float(self.ts[i]), self.ys[i])

    # ---------------- interpolation ----------------------------------
    def _window(self, t_rel: float):
        i = int(np.searchsorted(self.ts, t_rel))
        half = INTERPOLATION_SAMPLES // 2
        lo = max(0, min(i - half, len(self.ts) - INTERPOLATION_SAMPLES))
        hi = min(len(self.ts), lo + INTERPOLATION_SAMPLES)
        return lo, hi

    def interpolate(self, t_rel: float) -> np.ndarray:
        """Interpolated flat state at relative seconds (Hermite pos/vel,
        linear mass, exactly the reference's Spacecraft Interpolatable impl)."""
        if not (self.ts[0] - 1e-9 <= t_rel <= self.ts[-1] + 1e-9):
            raise ValueError(
                f"epoch {t_rel} s outside trajectory [{self.ts[0]}, {self.ts[-1]}]"
            )
        lo, hi = self._window(t_rel)
        ts = self.ts[lo:hi]
        ys = self.ys[lo:hi]
        # normalize time for conditioning
        tmid = ts[len(ts) // 2]
        pos, vel = hermite_eval(ts - tmid, ys[:, 0:3], ys[:, 3:6], t_rel - tmid)
        out = self.ys[0].copy()
        out[0:3] = pos
        out[3:6] = vel
        # linear interp of Cr, Cd, prop mass (and any extra columns)
        for col in range(6, self.ys.shape[1]):
            out[col] = np.interp(t_rel, self.ts, self.ys[:, col])
        return out

    def at(self, epoch: Epoch) -> Spacecraft:
        t_rel = (epoch - self.epoch0).to_seconds()
        return self.template.set_vector(epoch, self.interpolate(t_rel)[:9])

    # ---------------- queries ----------------------------------------
    def every(self, step) -> Iterator[Spacecraft]:
        step_s = step.to_seconds() if isinstance(step, Duration) else float(step)
        t = float(self.ts[0])
        while t <= self.ts[-1] + 1e-9:
            yield self.template.set_vector(
                self.epoch0 + t, self.interpolate(min(t, float(self.ts[-1])))[:9]
            )
            t += step_s

    def every_between(self, step, start: Epoch, end: Epoch) -> Iterator[Spacecraft]:
        step_s = step.to_seconds() if isinstance(step, Duration) else float(step)
        t = (start - self.epoch0).to_seconds()
        t_end = (end - self.epoch0).to_seconds()
        while t <= t_end + 1e-9:
            yield self.template.set_vector(self.epoch0 + t, self.interpolate(t)[:9])
            t += step_s

    def sample_values(self, parameter: str, step) -> tuple[np.ndarray, np.ndarray]:
        """(rel_seconds, values) of a StateParameter at a fixed step."""
        import jax.numpy as jnp

        step_s = step.to_seconds() if isinstance(step, Duration) else float(step)
        ts = np.arange(self.ts[0], self.ts[-1] + 1e-9, step_s)
        ys = np.stack([self.interpolate(t) for t in ts])
        frame = self.template.frame
        vals = np.asarray(
            param_mod.value(parameter, jnp.asarray(ys), frame.mu, frame.radius_km or 0.0)
        )
        return ts, vals

    def resample(self, step) -> "Trajectory":
        step_s = step.to_seconds() if isinstance(step, Duration) else float(step)
        ts = np.arange(self.ts[0], self.ts[-1] + 1e-9, step_s)
        ys = np.stack([self.interpolate(t) for t in ts])
        return Trajectory(self.epoch0, ts, ys, self.template)

    # ---------------- export (parquet/OEM in io.export) ---------------
    def to_parquet(self, path, cfg=None):
        from ..io.export import traj_to_parquet

        return traj_to_parquet(self, path, cfg)

    def to_oem(self, path, cfg=None):
        from ..io.export import traj_to_oem

        return traj_to_oem(self, path, cfg)

    def __str__(self):
        return (
            f"Trajectory from {self.start_epoch} to {self.end_epoch} "
            f"({len(self.ts)} states)"
        )
