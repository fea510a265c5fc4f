"""Ground-point PNT — premium parity.

Counterpart of the reference's `od/groundpnt/` (GroundAsset mod.rs:43-512,
GroundDynamics ground_dynamics.rs:26, trk_device.rs, sensitivity.rs): the
ESTIMATED state is an asset on a celestial surface — geodetic position plus
a slow SEZ velocity — with static dynamics (Φ maps position by velocity;
velocity constant). Ground stations of the same body track it with
range/Doppler/angles. Everything lives in the body-fixed frame, so the
measurement geometry is time-independent and the filter needs no
integrator at all.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmic.frames import Frame, Frames
from ..time import Epoch
from .estimate import Residual
from .ground_station import geodetic_to_body_fixed, sez_dcm
from .msr import Measurement, MeasurementType, TrackingDataArc

STATE_DIM = 6  # body-fixed [x, y, z, vx, vy, vz] km, km/s


@dataclass
class GroundAsset:
    """The estimated surface state (groundpnt/mod.rs:43-120)."""

    name: str
    latitude_deg: float
    longitude_deg: float
    height_km: float
    epoch: Epoch
    v_sez_km_s: np.ndarray = field(default_factory=lambda: np.zeros(3))
    frame: Frame = Frames.IAU_EARTH

    def to_vector(self) -> np.ndarray:
        r = np.asarray(
            geodetic_to_body_fixed(
                self.latitude_deg, self.longitude_deg, self.height_km,
                self.frame.radius_km, self.frame.flattening,
            )
        )
        sez = np.asarray(sez_dcm(self.latitude_deg, self.longitude_deg))
        v = sez.T @ np.asarray(self.v_sez_km_s)
        return np.concatenate([r, v])

    @classmethod
    def from_vector(cls, name, vec, epoch, frame=Frames.IAU_EARTH) -> "GroundAsset":
        r = np.asarray(vec[0:3], dtype=np.float64)
        rmag = np.linalg.norm(r)
        lat = float(np.degrees(np.arcsin(r[2] / rmag)))
        lon = float(np.degrees(np.arctan2(r[1], r[0])))
        # geodetic iteration (flattened body)
        f = frame.flattening
        e2 = f * (2 - f)
        req = frame.radius_km
        p = np.hypot(r[0], r[1])
        lat_r = np.arctan2(r[2], p * (1 - e2))
        for _ in range(6):
            n = req / np.sqrt(1 - e2 * np.sin(lat_r) ** 2)
            h = p / np.cos(lat_r) - n
            lat_r = np.arctan2(r[2], p * (1 - e2 * n / (n + h)))
        lat = float(np.degrees(lat_r))
        n = req / np.sqrt(1 - e2 * np.sin(lat_r) ** 2)
        h = float(p / np.cos(lat_r) - n)
        sez = np.asarray(sez_dcm(lat, lon))
        v_sez = sez @ np.asarray(vec[3:6], dtype=np.float64)
        return cls(name, lat, lon, h, epoch, v_sez, frame)

    def __str__(self):
        return (
            f"GroundAsset({self.name}: lat {self.latitude_deg:.6f} deg, "
            f"lon {self.longitude_deg:.6f} deg, h {self.height_km*1e3:.1f} m)"
        )


def _asset_obs(x6, st_bf, st_sez, types):
    """Observations of the asset from a station, all body-fixed
    (groundpnt/sensitivity.rs geometry)."""
    rho_bf = x6[0:3] - st_bf
    rhod_bf = x6[3:6]
    rho = st_sez @ rho_bf
    rho_dot = st_sez @ rhod_bf
    rng = jnp.linalg.norm(rho)
    el = jnp.rad2deg(jnp.arcsin(rho[2] / rng))
    az = jnp.rad2deg(jnp.arctan2(rho[1], -rho[0])) % 360.0
    rr = jnp.dot(rho, rho_dot) / rng
    table = {
        MeasurementType.RANGE_KM: rng,
        MeasurementType.DOPPLER_KM_S: rr,
        MeasurementType.AZIMUTH_DEG: az,
        MeasurementType.ELEVATION_DEG: el,
    }
    return jnp.stack([table[t] for t in types])


class GroundPntSim:
    """Measurement simulation of a ground asset from stations
    (groundpnt/trk_device.rs)."""

    def __init__(self, stations: Sequence, asset: GroundAsset, sampling_s=60.0,
                 seed=0):
        self.stations = list(stations)
        self.asset = asset
        self.sampling_s = sampling_s
        self.seed = seed

    def generate_measurements(self, duration_s: float) -> TrackingDataArc:
        rng = np.random.default_rng(self.seed)
        x6 = jnp.asarray(self.asset.to_vector())
        out: List[Measurement] = []
        n = int(duration_s / self.sampling_s) + 1
        for k in range(n):
            epoch = self.asset.epoch + k * self.sampling_s
            for gs in self.stations:
                st_bf = gs.body_fixed_position()
                st_sez = sez_dcm(gs.latitude_deg, gs.longitude_deg)
                types = tuple(gs.measurement_types)
                vals = np.asarray(_asset_obs(x6, st_bf, st_sez, types))
                el = float(
                    _asset_obs(
                        x6, st_bf, st_sez, (MeasurementType.ELEVATION_DEG,)
                    )[0]
                )
                if el < gs.elevation_mask_deg:
                    continue
                data = {}
                for j, t in enumerate(types):
                    noise = 0.0
                    sn = gs.stochastic_noises.get(t)
                    if sn is not None and sn.white_noise is not None:
                        noise = sn.white_noise.sample(rng)
                    data[t] = float(vals[j]) + noise
                out.append(Measurement(gs.name, epoch, data))
        return TrackingDataArc.from_measurements(out)


class GroundPntProcess:
    """Kalman filter over the static ground state (groundpnt/mod.rs +
    ground_dynamics.rs: Φ = [[I, dt·I], [0, I]], no process dynamics)."""

    def __init__(self, stations: Sequence, variant: str = "ekf",
                 resid_rejection_sigmas: Optional[float] = None):
        self.stations = {g.name: g for g in stations}
        self.variant = variant
        self.resid_rejection_sigmas = resid_rejection_sigmas

    def process_arc(self, asset: GroundAsset, covar0: np.ndarray,
                    arc: TrackingDataArc):
        """Returns (estimated GroundAsset, covar [6,6], residuals)."""
        x = asset.to_vector()
        p_mat = np.asarray(covar0, dtype=np.float64).copy()
        t_prev = asset.epoch.to_tai_seconds()
        residuals = []
        h_cache = {}
        for i in range(len(arc)):
            msr = arc.measurement(i)
            gs = self.stations.get(msr.tracker)
            if gs is None:
                continue
            dt = msr.epoch.to_tai_seconds() - t_prev
            t_prev = msr.epoch.to_tai_seconds()
            phi = np.eye(STATE_DIM)
            phi[0:3, 3:6] = dt * np.eye(3)
            x = phi @ x
            p_mat = phi @ p_mat @ phi.T

            types = tuple(t for t in gs.measurement_types if t in msr.data)
            if not types:
                continue
            key = (gs.name, types)
            if key not in h_cache:
                st_bf = gs.body_fixed_position()
                st_sez = sez_dcm(gs.latitude_deg, gs.longitude_deg)

                def h(xx, st_bf=st_bf, st_sez=st_sez, types=types):
                    return _asset_obs(xx, st_bf, st_sez, types)

                h_cache[key] = (jax.jit(h), jax.jit(jax.jacfwd(h)))
            h_fn, jac_fn = h_cache[key]
            computed = np.asarray(h_fn(jnp.asarray(x)))
            h_mat = np.asarray(jac_fn(jnp.asarray(x)))
            real = msr.observation(types)
            r_mat = gs.measurement_covar(types)
            prefit = real - computed
            s_mat = h_mat @ p_mat @ h_mat.T + r_mat
            l_chol = np.linalg.cholesky(s_mat)
            ratio = float(
                np.linalg.norm(np.linalg.solve(l_chol, prefit))
                / np.sqrt(len(types))
            )
            rejected = (
                self.resid_rejection_sigmas is not None
                and ratio > self.resid_rejection_sigmas
            )
            if not rejected:
                k_gain = np.linalg.solve(s_mat, h_mat @ p_mat.T).T
                x = x + k_gain @ prefit
                ikh = np.eye(STATE_DIM) - k_gain @ h_mat
                p_mat = ikh @ p_mat @ ikh.T + k_gain @ r_mat @ k_gain.T
                p_mat = 0.5 * (p_mat + p_mat.T)
            postfit = real - np.asarray(h_fn(jnp.asarray(x)))
            residuals.append(
                Residual(msr.epoch, msr.tracker, types, prefit, postfit,
                         ratio, bool(rejected))
            )
        est = GroundAsset.from_vector(
            asset.name, x,
            Epoch.from_tai_seconds_j2000(t_prev), asset.frame,
        )
        return est, p_mat, residuals
