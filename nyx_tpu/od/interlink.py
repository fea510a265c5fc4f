"""Spacecraft-to-spacecraft (interlink) tracking — premium parity.

Counterpart of the reference's `InterlinkTxSpacecraft`
(od/interlink/trk_device.rs:42-100, sensitivity.rs): a transmitter
spacecraft with its own trajectory acts as the tracking device, producing
crosslink range/Doppler. TPU-native design: the transmitter trajectory is
re-sampled into a device-resident grid and interpolated with a cubic
Hermite inside the jitted measurement function, so the same AD-sensitivity
path as ground stations applies unchanged. Visibility is a line-of-sight
test against the central body's sphere (the reference's almanac
obstruction check)."""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..time import Epoch
from .msr import MeasurementType
from .noise import StochasticNoise


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["ts", "ys"],
    meta_fields=[],
)
@dataclass(frozen=True)
class DeviceTrajectory:
    """Device-resident dense trajectory: cubic-Hermite state lookup.

    ts: [K] TDB seconds past J2000 (uniform-ish, sorted)
    ys: [K, 6] position/velocity rows
    """

    ts: object
    ys: object

    @classmethod
    def from_trajectory(cls, traj, step_s: float = 60.0) -> "DeviceTrajectory":
        t0_tdb = traj.epoch0.to_tdb_seconds()
        t_rel = np.arange(float(traj.ts[0]), float(traj.ts[-1]) + 1e-9, step_s)
        if t_rel[-1] < float(traj.ts[-1]) - 1e-6:
            t_rel = np.append(t_rel, float(traj.ts[-1]))
        ys = np.stack([traj.interpolate(t)[:6] for t in t_rel])
        return cls(jnp.asarray(t0_tdb + t_rel), jnp.asarray(ys))

    def state_at(self, t_tdb):
        """[6] state by per-segment cubic Hermite (position+velocity
        endpoints), accurate to sub-mm at a 60 s grid for orbital motion."""
        ts, ys = self.ts, self.ys
        i = jnp.clip(jnp.searchsorted(ts, t_tdb) - 1, 0, ts.shape[0] - 2)
        t0, t1 = ts[i], ts[i + 1]
        h = t1 - t0
        s = (t_tdb - t0) / h
        r0, v0 = ys[i, 0:3], ys[i, 3:6]
        r1, v1 = ys[i + 1, 0:3], ys[i + 1, 3:6]
        s2, s3 = s * s, s * s * s
        h00 = 2 * s3 - 3 * s2 + 1
        h10 = s3 - 2 * s2 + s
        h01 = -2 * s3 + 3 * s2
        h11 = s3 - s2
        r = h00 * r0 + h10 * h * v0 + h01 * r1 + h11 * h * v1
        # derivative of the Hermite basis for velocity
        d00 = (6 * s2 - 6 * s) / h
        d10 = 3 * s2 - 4 * s + 1
        d01 = (-6 * s2 + 6 * s) / h
        d11 = 3 * s2 - 2 * s
        v = d00 * r0 + d10 * v0 + d01 * r1 + d11 * v1
        return jnp.concatenate([r, v])


@dataclass
class InterlinkTxSpacecraft:
    """The transmitter spacecraft as a tracking device
    (od/interlink/trk_device.rs:42-100)."""

    traj: object  # Trajectory of the transmitter (truth or estimated)
    name: str = "interlink-tx"
    measurement_types: Tuple[str, ...] = (
        MeasurementType.RANGE_KM,
        MeasurementType.DOPPLER_KM_S,
    )
    integration_time_s: Optional[float] = None
    stochastic_noises: Dict[str, StochasticNoise] = field(default_factory=dict)
    occulting_radius_km: Optional[float] = None  # central-body LOS radius
    grid_step_s: float = 60.0

    def __post_init__(self):
        self._dev_traj = DeviceTrajectory.from_trajectory(
            self.traj, self.grid_step_s
        )
        if not self.stochastic_noises:
            self.stochastic_noises = {
                MeasurementType.RANGE_KM: StochasticNoise.default_range_km(),
                MeasurementType.DOPPLER_KM_S: StochasticNoise.default_doppler_km_s(),
            }

    # same gating interface as GroundStation: "elevation" is +90 with clear
    # line of sight, -90 when the central body blocks the link
    elevation_mask_deg: float = 0.0

    def _link_values(self, t_tdb, rv6, types):
        tx = self._dev_traj.state_at(t_tdb)
        rho = rv6[0:3] - tx[0:3]
        rho_dot = rv6[3:6] - tx[3:6]
        rng = jnp.linalg.norm(rho)
        rr = jnp.dot(rho, rho_dot) / rng
        table = {
            MeasurementType.RANGE_KM: rng,
            MeasurementType.DOPPLER_KM_S: rr,
            MeasurementType.X_KM: rv6[0],
            MeasurementType.Y_KM: rv6[1],
            MeasurementType.Z_KM: rv6[2],
        }
        return jnp.stack([table[t] for t in types])

    def _los_clear(self, t_tdb, rv6):
        """+90 clear / -90 occluded pseudo-elevation for the scheduler."""
        if self.occulting_radius_km is None:
            return jnp.float64(90.0)
        tx = self._dev_traj.state_at(t_tdb)[0:3]
        rx = rv6[0:3]
        d = tx - rx
        dd = jnp.dot(d, d)
        u = jnp.clip(-jnp.dot(rx, d) / jnp.where(dd > 0, dd, 1.0), 0.0, 1.0)
        closest = rx + u * d
        clear = jnp.linalg.norm(closest) > self.occulting_radius_km
        return jnp.where(clear, 90.0, -90.0)

    # -- GroundStation-compatible interface -----------------------------
    def azimuth_elevation_range(self, t_tdb, rv6):
        el = self._los_clear(t_tdb, rv6)
        vals = self._link_values(
            t_tdb, rv6, (MeasurementType.RANGE_KM, MeasurementType.DOPPLER_KM_S)
        )
        return jnp.float64(0.0), el, vals[0], vals[1]

    def measurement_fn(self, types=None):
        types = tuple(types or self.measurement_types)
        return lambda t, rv6: self._link_values(t, rv6, types)

    def two_way_fn(self, types=None):
        types = tuple(types or self.measurement_types)
        t_int = float(self.integration_time_s or 0.0)

        def h2(t, rv6_t, rv6_tm):
            v1 = self._link_values(t, rv6_t, types)
            v0 = self._link_values(t - t_int, rv6_tm, types)
            return 0.5 * (v0 + v1)

        return h2

    def batch_values(self, ts_tdb_s, ys6, types=None):
        from .ground_station import GroundStation

        types = tuple(types or self.measurement_types)
        if not hasattr(self, "_batch_cache"):
            self._batch_cache = {}
        if types not in self._batch_cache:

            def one(t, rv6):
                return self._link_values(t, rv6, types), self._los_clear(t, rv6)

            from ..compileopts import jit_options

            self._batch_cache[types] = jax.jit(
                jax.vmap(one), compiler_options=jit_options("obs")
            )
        ts_p, ys_p, k = GroundStation._pad_pow2(ts_tdb_s, ys6)
        vals, el = self._batch_cache[types](jnp.asarray(ts_p), jnp.asarray(ys_p))
        return np.asarray(vals)[:k], np.asarray(el)[:k]

    def batch_azel(self, ts_tdb_s, ys6):
        """Vectorized (azimuth, LOS-elevation) — azimuth is meaningless for
        an interlink; the elevation channel carries the occultation gate."""
        from .ground_station import GroundStation

        if not hasattr(self, "_azel_jit"):
            from ..compileopts import jit_options

            self._azel_jit = jax.jit(
                jax.vmap(self._los_clear),
                compiler_options=jit_options("obs"),
            )
        ts_p, ys_p, k = GroundStation._pad_pow2(ts_tdb_s, ys6)
        el = self._azel_jit(jnp.asarray(ts_p), jnp.asarray(ys_p))
        return np.zeros(k), np.asarray(el)[:k]

    def measurement_covar(self, types=None) -> np.ndarray:
        types = tuple(types or self.measurement_types)
        return np.diag([self.stochastic_noises[t].covariance() for t in types])
