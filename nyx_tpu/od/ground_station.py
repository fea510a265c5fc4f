"""Ground stations: geometry, visibility and measurement computation.

Counterpart of the reference's `GroundStation` (od/ground_station/mod.rs:
52-170, builtin.rs for the DSN sites) and its `TrackingDevice` impl
(trk_device.rs:36-230). TPU-native design: the measurement function is a
pure scalar JAX function `h(t_tdb_s, rv6) -> [m]`; the filter's H-tilde is
`jax.jacfwd(h)` (replacing the reference's hand-derived partials in
od/msr/sensitivity.rs:60-239) and the station's inertial velocity comes
from `jax.jvp` through the body-fixed DCM rather than an omega-cross
formula.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmic.frames import Frame, Frames
from ..time import Epoch
from .msr import MeasurementType
from .noise import StochasticNoise


def geodetic_to_body_fixed(lat_deg, lon_deg, height_km, radius_eq_km, flattening):
    """Geodetic coordinates -> body-fixed Cartesian position [3] (km)."""
    lat = jnp.deg2rad(lat_deg)
    lon = jnp.deg2rad(lon_deg)
    e2 = flattening * (2.0 - flattening)
    sin_lat = jnp.sin(lat)
    n = radius_eq_km / jnp.sqrt(1.0 - e2 * sin_lat**2)
    x = (n + height_km) * jnp.cos(lat) * jnp.cos(lon)
    y = (n + height_km) * jnp.cos(lat) * jnp.sin(lon)
    z = (n * (1.0 - e2) + height_km) * sin_lat
    return jnp.stack([x, y, z], axis=-1)


def sez_dcm(lat_deg, lon_deg):
    """DCM body-fixed -> SEZ (South-East-Zenith) topocentric frame."""
    lat = jnp.deg2rad(lat_deg)
    lon = jnp.deg2rad(lon_deg)
    sl, cl = jnp.sin(lat), jnp.cos(lat)
    so, co = jnp.sin(lon), jnp.cos(lon)
    return jnp.array(
        [
            [sl * co, sl * so, -cl],  # South
            [-so, co, 0.0],  # East
            [cl * co, cl * so, sl],  # Zenith
        ]
    )


@dataclass
class TerrainMask:
    """Azimuth-dependent minimum-elevation mask (parity with the ANISE
    `TerrainMask` carried by the reference's GroundStation,
    od/ground_station/mod.rs:125-126 and builtin.rs:41): breakpoints
    `(azimuth_deg, min_elevation_deg)`; between breakpoints the mask holds
    the value of the region's start azimuth (step function, wrapping at
    360 deg). `from_flat_terrain` builds the constant mask the reference
    attaches to every builtin DSN site."""

    azimuths_deg: np.ndarray
    elevations_deg: np.ndarray

    def __post_init__(self):
        az = np.mod(np.asarray(self.azimuths_deg, dtype=np.float64), 360.0)
        el = np.asarray(self.elevations_deg, dtype=np.float64)
        order = np.argsort(az)
        self.azimuths_deg, self.elevations_deg = az[order], el[order]

    @classmethod
    def from_flat_terrain(cls, elevation_deg: float) -> "TerrainMask":
        return cls(np.array([0.0]), np.array([float(elevation_deg)]))

    def min_elevation_at(self, az_deg):
        """Minimum visible elevation (deg) at the given azimuth(s)."""
        az = np.mod(np.asarray(az_deg, dtype=np.float64), 360.0)
        idx = np.searchsorted(self.azimuths_deg, az, side="right") - 1
        # azimuths below the first breakpoint wrap to the last region
        idx = np.where(idx < 0, len(self.azimuths_deg) - 1, idx)
        return self.elevations_deg[idx]


@dataclass
class GroundStation:
    """A tracking ground station (od/ground_station/mod.rs:52-63)."""

    name: str
    latitude_deg: float
    longitude_deg: float
    height_km: float
    frame: Frame = Frames.IAU_EARTH
    elevation_mask_deg: float = 0.0
    measurement_types: Tuple[str, ...] = (
        MeasurementType.RANGE_KM,
        MeasurementType.DOPPLER_KM_S,
    )
    integration_time_s: Optional[float] = None
    light_time_correction: bool = False
    timestamp_noise_s: Optional[StochasticNoise] = None
    stochastic_noises: Dict[str, StochasticNoise] = field(default_factory=dict)
    #: optional azimuth-dependent elevation mask on top of
    #: `elevation_mask_deg` (mod.rs terrain_mask / terrain_mask_ignored)
    terrain_mask: Optional[TerrainMask] = None
    terrain_mask_ignored: bool = False
    #: cross-body tracking (e.g. Earth DSN tracking a lunar orbiter): a
    #: device-resident table of the TRAJECTORY's central body relative to
    #: the STATION's body, added to every spacecraft state before the
    #: topocentric geometry (the reference routes this through ANISE
    #: transform_to; here it's a Chebyshev/Hermite lookup so the whole
    #: measurement stays jittable). Build with `with_target_frame`.
    target_center_offset: object = None

    # -- DSN builtins (builtin.rs), IAU_EARTH geodetic coordinates -------
    @classmethod
    def dss65_madrid(cls, elevation_mask_deg=5.0, frame=Frames.IAU_EARTH):
        gs = cls(
            "Madrid", 40.427_222, 4.250_556, 0.834_939, frame, elevation_mask_deg
        )
        return gs.with_dsn_defaults()

    @classmethod
    def dss34_canberra(cls, elevation_mask_deg=5.0, frame=Frames.IAU_EARTH):
        gs = cls(
            "Canberra", -35.398_333, 148.981_944, 0.691_750, frame, elevation_mask_deg
        )
        return gs.with_dsn_defaults()

    @classmethod
    def dss13_goldstone(cls, elevation_mask_deg=5.0, frame=Frames.IAU_EARTH):
        gs = cls(
            "Goldstone", 35.247_164, 243.205, 1.071_149, frame, elevation_mask_deg
        )
        return gs.with_dsn_defaults()

    def with_dsn_defaults(self) -> "GroundStation":
        self.stochastic_noises = {
            MeasurementType.RANGE_KM: StochasticNoise.default_range_km(),
            MeasurementType.DOPPLER_KM_S: StochasticNoise.default_doppler_km_s(),
        }
        return self

    def with_msr_type(self, mtype: str, noise: StochasticNoise) -> "GroundStation":
        out = replace(self, measurement_types=tuple(
            dict.fromkeys(self.measurement_types + (mtype,))
        ))
        out.stochastic_noises = dict(self.stochastic_noises)
        out.stochastic_noises[mtype] = noise
        return out

    def without_msr_type(self, mtype: str) -> "GroundStation":
        out = replace(
            self,
            measurement_types=tuple(
                t for t in self.measurement_types if t != mtype
            ),
        )
        out.stochastic_noises = dict(self.stochastic_noises)
        out.stochastic_noises.pop(mtype, None)
        return out

    def perfect(self) -> "GroundStation":
        """Zero-noise clone — the reference test pattern ('perfect stations',
        tests/orbit_determination/two_body.rs:31-70)."""
        out = replace(self)
        out.stochastic_noises = {
            t: StochasticNoise.zero() for t in self.measurement_types
        }
        return out

    # ------------------------------------------------------------------
    def body_fixed_position(self) -> jnp.ndarray:
        return geodetic_to_body_fixed(
            self.latitude_deg,
            self.longitude_deg,
            self.height_km,
            self.frame.radius_km,
            self.frame.flattening,
        )

    def inertial_posvel(self, t_tdb_s):
        """Station (position, velocity) in the J2000 frame of its body.

        Velocity by forward-mode AD through the body-fixed DCM series.
        """
        r_bf = self.body_fixed_position()

        def pos(t):
            dcm = self.frame.dcm_from_j2000(t)  # J2000 -> body fixed
            return dcm.T @ r_bf

        return jax.jvp(pos, (t_tdb_s,), (jnp.ones_like(t_tdb_s),))

    def _shift_to_station_center(self, t_tdb_s, rv6):
        """Re-center a spacecraft state from its trajectory's central body
        onto this station's body (no-op without target_center_offset)."""
        if self.target_center_offset is None:
            return rv6
        return rv6 + self.target_center_offset.state_at(t_tdb_s)

    def with_target_frame(self, almanac, center: int, start, end,
                          step_s: float = 300.0) -> "GroundStation":
        """Copy of this station able to track a trajectory centered on
        `center` (NAIF id, e.g. 301 for a lunar orbiter tracked from
        Earth): samples center-relative-to-station-body states over
        [start, end] into a device-resident Hermite table."""
        from dataclasses import replace

        from .interlink import DeviceTrajectory

        t0 = start.to_tdb_seconds() - 2 * step_s
        t1 = end.to_tdb_seconds() + 2 * step_s
        ts = np.arange(t0, t1 + step_s, step_s)
        rs = almanac.position(center, self.frame.center, ts)
        h = 2.0
        vs = (
            almanac.position(center, self.frame.center, ts + h)
            - almanac.position(center, self.frame.center, ts - h)
        ) / (2.0 * h)
        table = DeviceTrajectory(
            jnp.asarray(ts), jnp.asarray(np.concatenate([rs, vs], axis=1))
        )
        out = replace(self, target_center_offset=table)
        out.stochastic_noises = self.stochastic_noises
        return out

    def sez_state(self, t_tdb_s, rv6, _shifted=False):
        """Topocentric SEZ relative position/velocity of a J2000 state."""
        if not _shifted:
            rv6 = self._shift_to_station_center(t_tdb_s, rv6)
        dcm_bf = self.frame.dcm_from_j2000(t_tdb_s)
        r_st, v_st = self.inertial_posvel(t_tdb_s)
        rho = rv6[0:3] - r_st
        rho_dot = rv6[3:6] - v_st
        sez = sez_dcm(self.latitude_deg, self.longitude_deg) @ dcm_bf
        return sez @ rho, sez @ rho_dot

    def azimuth_elevation_range(self, t_tdb_s, rv6, _shifted=False):
        """(az_deg, el_deg, range_km, range_rate_km_s), the ANISE AzElRange
        equivalent used for visibility and angle measurements."""
        rho_sez, rhod_sez = self.sez_state(t_tdb_s, rv6, _shifted)
        rng = jnp.linalg.norm(rho_sez)
        el = jnp.rad2deg(jnp.arcsin(rho_sez[2] / rng))
        az = jnp.rad2deg(jnp.arctan2(rho_sez[1], -rho_sez[0])) % 360.0
        rr = jnp.dot(rho_sez, rhod_sez) / rng
        return az, el, rng, rr

    def _light_time_backdate(self, t_tdb_s, rv6):
        """Downlink light-time (LT aberration) correction: evaluate the
        spacecraft where it was when the received signal left it, i.e. at
        t - tau with tau = rho(t - tau)/c from two fixed-point iterations
        (the reference delegates this to ANISE Aberration::LT,
        trk_device.rs:79-100). The backdating is linear in velocity; the
        tau^2*a/2 truncation is ~mm at LEO ranges. Differentiable and
        vmappable, so filter partials include the correction."""
        from ..constants import SPEED_OF_LIGHT_KM_S

        r_st, _ = self.inertial_posvel(t_tdb_s)
        r, v = rv6[0:3], rv6[3:6]
        tau = jnp.linalg.norm(r - r_st) / SPEED_OF_LIGHT_KM_S
        tau = jnp.linalg.norm(r - tau * v - r_st) / SPEED_OF_LIGHT_KM_S
        return jnp.concatenate([r - tau * v, v])

    # ------------------------------------------------------------------
    def _one_way(self, t_tdb_s, rv6, types):
        rv6 = self._shift_to_station_center(t_tdb_s, rv6)
        if self.light_time_correction:
            rv6 = self._light_time_backdate(t_tdb_s, rv6)
        az, el, rng, rr = self.azimuth_elevation_range(t_tdb_s, rv6,
                                                       _shifted=True)
        table = {
            MeasurementType.RANGE_KM: rng,
            MeasurementType.DOPPLER_KM_S: rr,
            MeasurementType.AZIMUTH_DEG: az,
            MeasurementType.ELEVATION_DEG: el,
            MeasurementType.X_KM: rv6[0],
            MeasurementType.Y_KM: rv6[1],
            MeasurementType.Z_KM: rv6[2],
        }
        return jnp.stack([table[t] for t in types])

    def measurement_fn(self, types: Optional[Sequence[str]] = None):
        """Pure `h(t_tdb_s, rv6) -> [m]` one-way computed-observation
        function (types.rs compute_one_way)."""
        types = tuple(types or self.measurement_types)
        return lambda t, rv6: self._one_way(t, rv6, types)

    def two_way_fn(self, types: Optional[Sequence[str]] = None):
        """Pure `h2(t_tdb_s, rv6_t, rv6_tm) -> [m]`: two-way observation as
        the average of the one-way values at the start (t - T_int) and end
        (t) of the integration interval (types.rs compute_two_way:121-156)."""
        types = tuple(types or self.measurement_types)
        t_int = float(self.integration_time_s or 0.0)

        def h2(t, rv6_t, rv6_tm):
            v1 = self._one_way(t, rv6_t, types)
            v0 = self._one_way(t - t_int, rv6_tm, types)
            return 0.5 * (v0 + v1)

        return h2

    @staticmethod
    def _pad_pow2(ts, ys):
        """Pad a strand to the next power-of-two length (>= 64) by
        repeating the last sample, so the per-device observation programs
        compile for a handful of bucket shapes instead of one shape per
        strand length (a 24 h multi-station arc otherwise triggers tens of
        distinct remote compiles — measured ~4 min of the cold OD path)."""
        ts = np.asarray(ts, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        k = ts.shape[0]
        kp = max(64, 1 << max(0, int(k - 1).bit_length()))
        if kp == k:
            return ts, ys, k
        ts_p = np.concatenate([ts, np.full(kp - k, ts[-1] if k else 0.0)])
        pad_row = ys[-1:] if k else np.zeros((1, ys.shape[1]))
        ys_p = np.concatenate([ys, np.repeat(pad_row, kp - k, axis=0)])
        return ts_p, ys_p, k

    def batch_values(self, ts_tdb_s, ys6, types: Optional[Sequence[str]] = None):
        """Vectorized noiseless observations + elevations over a strand.

        One vmapped device call per strand instead of per-epoch scalar
        dispatch (the TPU-native variant of trk_device.rs:36-230's per-epoch
        `measure`). Returns (values [K, T], elevation_deg [K])."""
        types = tuple(types or self.measurement_types)
        if not hasattr(self, "_batch_cache"):
            self._batch_cache = {}
        if types not in self._batch_cache:

            def one(t, rv6):
                vals = self._one_way(t, rv6, types)
                _, el, _, _ = self.azimuth_elevation_range(t, rv6)
                return vals, el

            from ..compileopts import jit_options

            self._batch_cache[types] = jax.jit(
                jax.vmap(one), compiler_options=jit_options("obs")
            )
        ts_p, ys_p, k = self._pad_pow2(ts_tdb_s, ys6)
        vals, el = self._batch_cache[types](
            jnp.asarray(ts_p), jnp.asarray(ys_p)
        )
        return np.asarray(vals)[:k], np.asarray(el)[:k]

    def batch_azel(self, ts_tdb_s, ys6):
        """Vectorized (azimuth_deg, elevation_deg) over a sample grid."""
        if not hasattr(self, "_azel_jit"):

            def one(t, rv6):
                az, el, _, _ = self.azimuth_elevation_range(t, rv6)
                return az, el

            from ..compileopts import jit_options

            self._azel_jit = jax.jit(
                jax.vmap(one), compiler_options=jit_options("obs")
            )
        ts_p, ys_p, k = self._pad_pow2(ts_tdb_s, ys6)
        az, el = self._azel_jit(jnp.asarray(ts_p), jnp.asarray(ys_p))
        return np.asarray(az)[:k], np.asarray(el)[:k]

    def visible(self, az_deg, el_deg):
        """Host-side visibility gate: flat elevation mask plus the
        optional azimuth-dependent terrain mask (mod.rs:125-126)."""
        el = np.asarray(el_deg)
        vis = el >= self.elevation_mask_deg
        if self.terrain_mask is not None and not self.terrain_mask_ignored:
            vis = vis & (el >= self.terrain_mask.min_elevation_at(az_deg))
        return vis

    def measurement_covar(self, types: Optional[Sequence[str]] = None) -> np.ndarray:
        types = tuple(types or self.measurement_types)
        return np.diag([self.stochastic_noises[t].covariance() for t in types])

    def elevation_of(self, t_tdb_s, rv6) -> float:
        _, el, _, _ = self.azimuth_elevation_range(
            jnp.float64(t_tdb_s), jnp.asarray(rv6)
        )
        return float(el)

    # -- simulation (TrackingDevice::measure, trk_device.rs:36-230) ------
    def measure_instantaneous(
        self, epoch: Epoch, rv6, rng_np: np.random.Generator, noise_state=None
    ):
        """Simulated (noisy) measurement dict at an epoch, or None if the
        spacecraft is below the elevation mask."""
        t = jnp.float64(epoch.to_tdb_seconds())
        rv6 = jnp.asarray(rv6)
        az, el, rng_km, rr = self.azimuth_elevation_range(t, rv6)
        if float(el) < self.elevation_mask_deg:
            return None
        vals = np.asarray(self._one_way(t, rv6, self.measurement_types))
        t_tai = epoch.to_tai_seconds()
        out = {}
        for j, mtype in enumerate(self.measurement_types):
            noise = 0.0
            if noise_state is not None:
                noise = noise_state.sample(mtype, t_tai, rng_np)
            elif mtype in self.stochastic_noises:
                sn = self.stochastic_noises[mtype]
                if sn.white_noise is not None:
                    noise = sn.white_noise.sample(rng_np)
            out[mtype] = float(vals[j]) + noise
        return out

    def __str__(self):
        return (
            f"GroundStation({self.name}, lat {self.latitude_deg:.4f} deg, "
            f"lon {self.longitude_deg:.4f} deg, alt {self.height_km*1e3:.1f} m)"
        )


# -- ConfigRepr-style YAML loaders (io/mod.rs:182) ------------------------
def _gs_load(cls, path):
    """First ground station of a YAML document."""
    from ..io.config import load_ground_stations

    return load_ground_stations(path)[0]


def _gs_load_many(cls, path):
    from ..io.config import load_ground_stations

    return load_ground_stations(path)


def _gs_load_named(cls, path):
    from ..io.config import load_ground_stations

    return {g.name: g for g in load_ground_stations(path)}


def _gs_save(self, path):
    from ..io.config import save_ground_stations

    return save_ground_stations([self], path)


GroundStation.load = classmethod(_gs_load)
GroundStation.load_many = classmethod(_gs_load_many)
GroundStation.load_named = classmethod(_gs_load_named)
GroundStation.save = _gs_save
