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
from ..errors import TrajError

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
            raise TrajError(
                f"epoch {t_rel} s outside trajectory [{self.ts[0]}, {self.ts[-1]}]"
            )
        lo, hi = self._window(t_rel)
        ts = self.ts[lo:hi]
        ys = self.ys[lo:hi]
        # thin near-coincident nodes: adaptive-step bursts (eclipse
        # crossings, perigee refinement) can put ~0.06 s nodes next to
        # ~90 s gaps in one window, and the degree-25 Newton divided
        # differences then cancel catastrophically (measured: 1e18 km
        # positions from healthy nodes). Every node lies on the true
        # trajectory, so dropping clustered ones below a quarter of the
        # mean spacing loses nothing.
        if len(ts) > 2:
            min_dt = 0.25 * (ts[-1] - ts[0]) / (len(ts) - 1)
            keep = [0]
            for i in range(1, len(ts)):
                if ts[i] - ts[keep[-1]] >= min_dt or i == len(ts) - 1:
                    keep.append(i)
            if len(keep) < len(ts):
                ts, ys = ts[keep], ys[keep]
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

    def rebuild(self, epochs) -> "Trajectory":
        """New trajectory whose nodes sit exactly at `epochs`
        (traj.rs:388 rebuild): arbitrary — possibly non-uniform — epochs,
        each interpolated from this trajectory."""
        ts = np.asarray(
            [(e - self.epoch0).to_seconds() for e in epochs], dtype=np.float64
        )
        ys = np.stack([self.interpolate(float(t)) for t in ts])
        return Trajectory(self.epoch0, ts, ys, self.template)

    def filter_by_epoch(self, start: Epoch, end: Epoch) -> "Trajectory":
        """Sub-trajectory whose nodes fall in [start, end]
        (traj.rs filter_by_epoch)."""
        s = (start - self.epoch0).to_seconds()
        e = (end - self.epoch0).to_seconds()
        keep = (self.ts >= s - 1e-9) & (self.ts <= e + 1e-9)
        if not np.any(keep):
            raise TrajError("no trajectory nodes in the requested window")
        return Trajectory(self.epoch0, self.ts[keep], self.ys[keep], self.template)

    def filter_by_offset(self, start_offset_s=0.0, end_offset_s=None) -> "Trajectory":
        """Sub-trajectory by offsets (s or Duration) from the first node
        (traj.rs filter_by_offset)."""

        def _s(x):
            return x.to_seconds() if isinstance(x, Duration) else float(x)

        t0 = float(self.ts[0])
        keep = self.ts - t0 >= _s(start_offset_s) - 1e-9
        if end_offset_s is not None:
            keep &= self.ts - t0 <= _s(end_offset_s) + 1e-9
        if not np.any(keep):
            raise TrajError("no trajectory nodes in the requested window")
        return Trajectory(self.epoch0, self.ts[keep], self.ys[keep], self.template)

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


# -- frame transforms & comparisons (md/trajectory/sc_traj.rs) ------------
def _traj_to_frame(self, frame, almanac=None):
    """Bulk transform of every stored state into another frame
    (sc_traj.rs:56-90). Rotation-only when the centers match; with an
    almanac, also translates to a new central body."""
    import jax.numpy as jnp

    from ..cosmic.orbit import Orbit

    old = self.template.frame
    ys = np.array(self.ys, copy=True)
    t_tdb = self.epoch0.to_tdb_seconds() + self.ts
    if frame.center != old.center:
        if almanac is None:
            raise TrajError("changing central bodies requires an almanac")
        delta = almanac.position(old.center, frame.center, t_tdb)
        h = 16.0
        dvel = (
            almanac.position(old.center, frame.center, t_tdb + h)
            - almanac.position(old.center, frame.center, t_tdb - h)
        ) / (2 * h)
        ys[:, 0:3] += delta
        ys[:, 3:6] += dvel
    if frame.orientation is not old.orientation:
        # rotate via J2000: old -> J2000 -> new, batched on device.
        # Velocities need the transport term (dDCM/dt @ r): rotating frames
        # carry omega x r (~0.5 km/s at LEO for IAU_EARTH). dDCM/dt comes
        # from jax.jvp through the orientation model, same scheme as
        # GroundStation.inertial_posvel.
        import jax

        tt = jnp.asarray(t_tdb)
        ones = jnp.ones_like(tt)
        dcm_old, dot_old = jax.jvp(old.dcm_from_j2000, (tt,), (ones,))
        dcm_new, dot_new = jax.jvp(frame.dcm_from_j2000, (tt,), (ones,))
        r_old = jnp.asarray(ys[:, 0:3])
        v_old = jnp.asarray(ys[:, 3:6])
        # old frame -> J2000 (dcm rotates J2000 into the frame, so transpose)
        r_j = jnp.einsum("...ji,...j->...i", dcm_old, r_old)
        v_j = jnp.einsum("...ji,...j->...i", dcm_old, v_old) + jnp.einsum(
            "...ji,...j->...i", dot_old, r_old
        )
        # J2000 -> new frame
        ys[:, 0:3] = np.asarray(jnp.einsum("...ij,...j->...i", dcm_new, r_j))
        ys[:, 3:6] = np.asarray(
            jnp.einsum("...ij,...j->...i", dcm_new, v_j)
            + jnp.einsum("...ij,...j->...i", dot_new, r_j)
        )
    template = self.template.with_orbit(
        Orbit(ys[0, 0:3].copy(), ys[0, 3:6].copy(), self.epoch0 + float(self.ts[0]), frame)
    )
    return Trajectory(self.epoch0, self.ts.copy(), ys, template)


def _traj_groundtrack(self, body_frame=None, step=60.0):
    """(epochs_rel_s, lat_deg, lon_deg, alt_km) ground track under the
    trajectory (sc_traj.rs groundtrack export)."""
    import jax.numpy as jnp

    from ..cosmic.frames import Frames

    body_frame = body_frame or Frames.IAU_EARTH
    from ..propagators.instance import _secs

    step_s = _secs(step)
    ts = np.arange(float(self.ts[0]), float(self.ts[-1]) + 1e-9, step_s)
    rs = np.stack([self.interpolate(t)[:3] for t in ts])
    t_tdb = jnp.asarray(self.epoch0.to_tdb_seconds() + ts)
    dcm = body_frame.dcm_from_j2000(t_tdb)
    r_bf = np.asarray(jnp.einsum("...ij,...j->...i", dcm, jnp.asarray(rs)))
    rmag = np.linalg.norm(r_bf, axis=-1)
    lat = np.degrees(np.arcsin(r_bf[:, 2] / rmag))
    lon = np.degrees(np.arctan2(r_bf[:, 1], r_bf[:, 0]))
    alt = rmag - (body_frame.radius_km or 0.0)
    return ts, lat, lon, alt


def _traj_ric_diff(self, other, step=60.0):
    """(epochs_rel_s, dr_ric [K,3], dv_ric [K,3]) of self minus `other`
    in the RIC frame of `other` (sc_traj.rs ric_diff_to_parquet)."""
    import jax.numpy as jnp

    from ..cosmic.orbit import ric_dcm
    from ..propagators.instance import _secs

    step_s = _secs(step)
    t0 = max(float(self.ts[0]), float((other.epoch0 - self.epoch0).to_seconds() + other.ts[0]))
    t1 = min(float(self.ts[-1]), float((other.epoch0 - self.epoch0).to_seconds() + other.ts[-1]))
    ts = np.arange(t0, t1 + 1e-9, step_s)
    off = (self.epoch0 - other.epoch0).to_seconds()
    mine = np.stack([self.interpolate(t)[:6] for t in ts])
    theirs = np.stack([other.interpolate(t + off)[:6] for t in ts])
    dcm = np.asarray(
        ric_dcm(jnp.asarray(theirs[:, 0:3]), jnp.asarray(theirs[:, 3:6]))
    )
    dr = np.einsum("kij,kj->ki", dcm, mine[:, 0:3] - theirs[:, 0:3])
    dv = np.einsum("kij,kj->ki", dcm, mine[:, 3:6] - theirs[:, 3:6])
    return ts, dr, dv


def _traj_ric_diff_to_parquet(self, other, path, step=60.0):
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts, dr, dv = self.ric_diff(other, step)
    cols = {
        "epoch_rel_s": ts,
        "delta_r_km": np.linalg.norm(dr, axis=-1),
        "delta_v_km_s": np.linalg.norm(dv, axis=-1),
    }
    for i, lbl in enumerate(("radial", "in_track", "cross_track")):
        cols[f"dr_{lbl}_km"] = dr[:, i]
        cols[f"dv_{lbl}_km_s"] = dv[:, i]
    pq.write_table(pa.table(cols), str(path), compression="zstd")
    return str(path)


Trajectory.to_frame = _traj_to_frame
Trajectory.groundtrack = _traj_groundtrack
Trajectory.ric_diff = _traj_ric_diff
Trajectory.ric_diff_to_parquet = _traj_ric_diff_to_parquet


def _traj_from_bsp(cls, almanac, target: int, center: int, frame, template,
                   start, end, step_s: float = 300.0):
    """Build a Trajectory by sampling a loaded SPK/BSP through the almanac
    (md/trajectory/sc_traj.rs from_bsp:90-134)."""
    n = int((end - start).to_seconds() / step_s) + 1
    ts = np.arange(n, dtype=np.float64) * step_s
    ys = np.zeros((n, template.to_vector().shape[0]))
    base = template.to_vector()
    for i, t in enumerate(ts):
        r, v = almanac.state(target, center, start + float(t))
        row = base.copy()
        row[0:3] = r
        row[3:6] = v
        ys[i] = row
    from dataclasses import replace as _replace

    tmpl = template.with_orbit(
        _replace(template.orbit, frame=frame)
    )
    return cls(start, ts, ys, tmpl)


Trajectory.from_bsp = classmethod(_traj_from_bsp)


def _traj_to_ephemeris(self, path, target: int = -10_000, degree: int = 11,
                       intlen_s: Optional[float] = None):
    """Export as a SPICE BSP (SPK type-3 Chebyshev segment), matching the
    reference's to_ephemeris -> ANISE BSP (sc_traj.rs:158)."""
    from ..io.spk import traj_to_bsp

    return traj_to_bsp(self, path, target, degree, intlen_s)


def _traj_from_parquet(cls, path, template) -> "Trajectory":
    """Import a trajectory written by to_parquet (needs the cartesian
    x..vz fields; sc_traj.rs:212 parity). `template` supplies frame and
    spacecraft constants."""
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    cols = table.column_names
    needed = ("epoch_tai_s", "x", "y", "z", "vx", "vy", "vz")
    missing = [c for c in needed if c not in cols]
    if missing:
        raise TrajError(f"parquet trajectory missing columns: {missing}")
    tai = np.asarray(table["epoch_tai_s"])
    epoch0 = Epoch.from_tai_seconds_j2000(float(tai[0]))
    ts = tai - tai[0]
    base = template.to_vector()
    ys = np.tile(base, (len(ts), 1))
    for j, c in enumerate(("x", "y", "z", "vx", "vy", "vz")):
        ys[:, j] = np.asarray(table[c])
    return cls.from_capture(epoch0, ts, ys, template)


Trajectory.to_ephemeris = _traj_to_ephemeris
Trajectory.from_parquet = classmethod(_traj_from_parquet)
