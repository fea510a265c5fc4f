"""Tracking-arc simulation: visibility scheduling + measurement generation.

Counterpart of the reference's `TrackingArcSim` (od/simulator/arc.rs:46-443),
`TrkConfig`/`Strand` (trkconfig.rs:41-327) and `Scheduler`
(scheduler.rs:37-95). TPU-native twist: visibility is computed by sampling
the truth trajectory at the cadence and evaluating every device's elevation
over ALL epochs in one vmapped device call, instead of per-epoch scalar
calls; strand extraction and the handoff logic stay on host (tiny data).
Determinism comes from one numpy PCG64 generator seeded per simulator
(matching the reference's seeded Pcg64Mcg, arc.rs:138).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..time import Duration, Epoch
from .msr import Measurement, TrackingDataArc
from .noise import NoiseState


def _secs(x) -> float:
    return x.to_seconds() if isinstance(x, Duration) else float(x)


class Cadence:
    Continuous = "continuous"
    Intermittent = "intermittent"


@dataclass(frozen=True)
class Scheduler:
    """Visibility-strand post-processing (scheduler.rs:37-95)."""

    handoff: str = "eager"  # 'eager' | 'greedy' | 'overlap'
    cadence: str = Cadence.Continuous
    min_samples: int = 10
    sample_alignment_s: Optional[float] = None
    #: Intermittent cadence: track for `on_s`, stand down for `off_s`
    #: (trkconfig.rs Cadence::Intermittent)
    on_s: Optional[float] = None
    off_s: Optional[float] = None

    @classmethod
    def intermittent(cls, on, off, **kw) -> "Scheduler":
        from ..time import Duration

        def _s(x):
            return x.to_seconds() if isinstance(x, Duration) else float(x)

        return cls(cadence=Cadence.Intermittent, on_s=_s(on), off_s=_s(off), **kw)


@dataclass
class TrkConfig:
    """Per-device tracking configuration (trkconfig.rs:41-80)."""

    sampling_s: float = 60.0
    scheduler: Optional[Scheduler] = None
    strands: Optional[List[Tuple[Epoch, Epoch]]] = None  # manual strands

    @classmethod
    def default(cls) -> "TrkConfig":
        return cls(sampling_s=60.0, scheduler=Scheduler())

    @classmethod
    def from_sample_rate(cls, rate) -> "TrkConfig":
        return cls(sampling_s=_secs(rate), scheduler=Scheduler())


@dataclass
class Strand:
    device: str
    start_idx: int
    end_idx: int  # inclusive sample indices into the sim grid


class TrackingArcSim:
    """devices + truth trajectory + configs + seed (arc.rs:46-138)."""

    def __init__(self, devices: Sequence, trajectory, configs: Dict[str, TrkConfig],
                 seed: int = 0):
        self.devices = list(devices)
        self.traj = trajectory
        self.configs = dict(configs)
        self.seed = seed
        self._schedule: Optional[List[Strand]] = None
        for d in self.devices:
            if d.name not in self.configs:
                self.configs[d.name] = TrkConfig.default()

    @classmethod
    def with_seed(cls, devices, trajectory, configs, seed):
        return cls(devices, trajectory, configs, seed)

    # ------------------------------------------------------------------
    def _sample_grid(self, sampling_s: float):
        """(epoch rel seconds grid, states [K, 6]) over the trajectory.
        Cached per sampling rate — identical configs across devices would
        otherwise redo the host-side Hermite loop once per device."""
        if not hasattr(self, "_grid_cache"):
            self._grid_cache = {}
        if sampling_s not in self._grid_cache:
            t0, t1 = float(self.traj.ts[0]), float(self.traj.ts[-1])
            ts = np.arange(t0, t1 + 1e-6, sampling_s)
            ys = np.stack([self.traj.interpolate(t)[:6] for t in ts])
            self._grid_cache[sampling_s] = (ts, ys)
        return self._grid_cache[sampling_s]

    def _elevations(self, device, ts_rel, ys) -> np.ndarray:
        """Vectorized elevation [K] for one device over all samples.
        Routes through the device's cached batch_azel jit (one program per
        device for the whole sim, padded to bucket shapes) instead of
        compiling a fresh closure here on every schedule build. Devices
        without batch_azel (e.g. PositionDevice) fall back to the inline
        vmapped elevation."""
        t0_tdb = self.traj.epoch0.to_tdb_seconds()
        if hasattr(device, "batch_azel"):
            _, el = device.batch_azel(t0_tdb + np.asarray(ts_rel), ys)
            return np.asarray(el)

        def el_of(t_rel, rv6):
            _, el, _, _ = device.azimuth_elevation_range(
                jnp.float64(t0_tdb) + t_rel, rv6
            )
            return el

        return np.asarray(
            jax.jit(jax.vmap(el_of))(jnp.asarray(ts_rel), jnp.asarray(ys))
        )

    def build_schedule(self, almanac=None) -> List[Strand]:
        """Find visibility strands per device and apply the scheduler
        (arc.rs:293-443)."""
        strands: List[Strand] = []
        grids = {}
        for dev in self.devices:
            cfg = self.configs[dev.name]
            ts, ys = self._sample_grid(cfg.sampling_s)
            grids[dev.name] = (ts, ys)
            if cfg.strands is not None:
                for (s, e) in cfg.strands:
                    i0 = int(np.searchsorted(ts, (s - self.traj.epoch0).to_seconds()))
                    i1 = int(np.searchsorted(ts, (e - self.traj.epoch0).to_seconds(), "right")) - 1
                    if i1 >= i0:
                        strands.append(Strand(dev.name, i0, i1))
                continue
            el = self._elevations(dev, ts, ys)
            visible = el >= dev.elevation_mask_deg
            tm = getattr(dev, "terrain_mask", None)
            if tm is not None and not getattr(dev, "terrain_mask_ignored", False):
                az, el2 = dev.batch_azel(
                    self.traj.epoch0.to_tdb_seconds() + ts, ys[:, :6]
                )
                visible = visible & (el2 >= tm.min_elevation_at(az))
            sched = cfg.scheduler or Scheduler()
            # intermittent cadence: on/off duty cycle from the arc start
            # (scheduler.rs Cadence::Intermittent)
            if sched.cadence == Cadence.Intermittent and sched.on_s:
                period = sched.on_s + (sched.off_s or 0.0)
                visible = visible & ((ts - ts[0]) % period < sched.on_s)
            # contiguous visible runs -> strands
            idx = np.where(visible)[0]
            if len(idx) == 0:
                continue
            cuts = np.where(np.diff(idx) > 1)[0] + 1
            for run in np.split(idx, cuts):
                start = int(run[0])
                # round the strand start up to the alignment grid
                # (scheduler.rs:73-80 sample_alignment)
                if sched.sample_alignment_s:
                    align = sched.sample_alignment_s
                    t_aligned = np.ceil((ts[start] - 1e-9) / align) * align
                    while start <= run[-1] and ts[start] < t_aligned - 1e-9:
                        start += 1
                if run[-1] - start + 1 >= sched.min_samples:
                    strands.append(Strand(dev.name, start, int(run[-1])))

        strands.sort(key=lambda s: s.start_idx)

        # Eager handoff: a new station takes over as soon as it sees the
        # spacecraft; truncate the previous strand (scheduler.rs:47-70).
        sched_by_dev = {
            d.name: (self.configs[d.name].scheduler or Scheduler())
            for d in self.devices
        }
        pruned: List[Strand] = []
        for s in strands:
            if pruned:
                prev = pruned[-1]
                if (
                    sched_by_dev[prev.device].handoff == "eager"
                    and s.device != prev.device
                    and s.start_idx <= prev.end_idx
                ):
                    prev.end_idx = max(prev.start_idx, s.start_idx - 1)
                elif (
                    sched_by_dev[prev.device].handoff == "greedy"
                    and s.device != prev.device
                    and s.start_idx <= prev.end_idx
                ):
                    s = Strand(s.device, prev.end_idx + 1, s.end_idx)
                    if s.start_idx > s.end_idx:
                        continue
            pruned.append(s)
        self._schedule = pruned
        self._grids = grids
        return pruned

    # ------------------------------------------------------------------
    def generate_measurements(self, almanac=None) -> TrackingDataArc:
        """Sample every strand at the device cadence with seeded noise
        (arc.rs:174-256)."""
        if self._schedule is None:
            self.build_schedule(almanac)
        rng = np.random.default_rng(self.seed)
        dev_map = {d.name: d for d in self.devices}

        def _noises(d):
            n = dict(d.stochastic_noises)
            if getattr(d, "timestamp_noise_s", None) is not None:
                n["__timestamp__"] = d.timestamp_noise_s
            return n

        noise_states = {d.name: NoiseState(_noises(d), rng) for d in self.devices}
        epoch0 = self.traj.epoch0
        t0_tdb = epoch0.to_tdb_seconds()
        measurements: List[Measurement] = []
        for strand in self._schedule:
            dev = dev_map[strand.device]
            ts, ys = self._grids[strand.device]
            sl = slice(strand.start_idx, strand.end_idx + 1)
            # one vmapped device call for the whole strand, then host-side
            # noise in deterministic per-epoch order
            vals, els = dev.batch_values(t0_tdb + ts[sl], ys[sl, :6])
            noise_scale = 1.0
            skip_before = -np.inf
            if dev.integration_time_s:
                # two-way: average with the values at t - T_int
                # (types.rs compute_two_way; noise scaled by 1/sqrt(2))
                t_int = float(dev.integration_time_s)
                ts_sl = ts[sl]
                valid = ts_sl - t_int >= float(self.traj.ts[0]) - 1e-9
                ys0 = np.stack(
                    [
                        self.traj.interpolate(max(t - t_int, float(self.traj.ts[0])))[:6]
                        for t in ts_sl
                    ]
                )
                vals0, _ = dev.batch_values(t0_tdb + ts_sl - t_int, ys0)
                vals = 0.5 * (vals + vals0)
                noise_scale = 1.0 / np.sqrt(2.0)
                skip_before = float(self.traj.ts[0]) + t_int
            types = dev.measurement_types
            nstate = noise_states[strand.device]
            tm = getattr(dev, "terrain_mask", None)
            min_el = np.full(len(els), dev.elevation_mask_deg)
            if tm is not None and not getattr(dev, "terrain_mask_ignored", False):
                azs, _ = dev.batch_azel(t0_tdb + ts[sl], ys[sl, :6])
                min_el = np.maximum(min_el, tm.min_elevation_at(azs))
            for k, i in enumerate(range(strand.start_idx, strand.end_idx + 1)):
                if els[k] < min_el[k] or ts[i] < skip_before:
                    continue
                epoch = epoch0 + float(ts[i])
                t_tai = epoch.to_tai_seconds()
                # timestamp noise shifts the tagged epoch, sampled before
                # the per-type noises as in the reference (trk_device.rs:
                # noises[0] is the timestamp noise)
                if getattr(dev, "timestamp_noise_s", None) is not None:
                    epoch = epoch + nstate.sample("__timestamp__", t_tai, rng)
                data = {
                    mtype: float(vals[k, j])
                    + noise_scale * nstate.sample(mtype, t_tai, rng)
                    for j, mtype in enumerate(types)
                }
                measurements.append(Measurement(dev.name, epoch, data))
        return TrackingDataArc.from_measurements(measurements)
