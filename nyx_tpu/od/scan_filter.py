"""Device-side sequential Kalman filter: the whole tracking arc in one
`lax.scan`.

The reference's OD engine (od/process/mod.rs:126-437) drives each
measurement from host code; this kernel is the TPU-native re-design the
survey calls for (SURVEY.md §7 "OD's inherently sequential filter loop"):
the measurement sequence becomes `lax.scan` xs, the inter-measurement
propagation is the adaptive RK `while_loop` nested in the scan body, the
station geometry is gathered by tracker index, absent measurement types are
masked with a huge R (so the same compiled program serves any mix of
range/doppler/angles), and the whole filter is one compiled XLA program.
`vmap` it over initial estimates for batched covariance analysis — the
ensemble-of-filters parallelism of SURVEY.md §2.8.

Filter math matches od/kalman/filtering.rs:33-326: Cholesky-whitened
residual ratio for sigma rejection, Cholesky gain, Joseph covariance update
+ symmetrization, piecewise SNC.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmic.orbit import ric_dcm, vnc_dcm
from ..propagators import integrator
from ..time import Epoch
from .ground_station import geodetic_to_body_fixed, sez_dcm
from .msr import MeasurementType, TrackingDataArc

STATE_DIM = 9


def _station_obs(t_tdb, rv6, lat_deg, lon_deg, height_km, frame, types):
    """[T] noiseless observations for a station given by traced geodetic
    coordinates (the gatherable form of GroundStation._one_way)."""
    r_bf = geodetic_to_body_fixed(
        lat_deg, lon_deg, height_km, frame.radius_km, frame.flattening
    )

    def pos(t):
        return frame.dcm_from_j2000(t).T @ r_bf

    r_st, v_st = jax.jvp(pos, (t_tdb,), (jnp.ones_like(t_tdb),))
    rho_in = rv6[0:3] - r_st
    rhod_in = rv6[3:6] - v_st
    sez = sez_dcm(lat_deg, lon_deg) @ frame.dcm_from_j2000(t_tdb)
    rho = sez @ rho_in
    rho_dot = sez @ rhod_in
    rng = jnp.linalg.norm(rho)
    el = jnp.rad2deg(jnp.arcsin(rho[2] / rng))
    az = jnp.rad2deg(jnp.arctan2(rho[1], -rho[0])) % 360.0
    rr = jnp.dot(rho, rho_dot) / rng
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


@dataclass
class ScanODResult:
    """Stacked filter outputs, one row per measurement."""

    epochs_tai_s: np.ndarray  # [M]
    y_est: np.ndarray  # [M, 9] best estimate (ref + deviation)
    covar: np.ndarray  # [M, 9, 9]
    prefit: np.ndarray  # [M, T]
    postfit: np.ndarray  # [M, T]
    ratio: np.ndarray  # [M]
    rejected: np.ndarray  # [M] bool
    types: Tuple[str, ...] = ()

    @property
    def accepted(self) -> int:
        return int(np.sum(~self.rejected))

    def final_state(self) -> np.ndarray:
        return self.y_est[-1]

    def final_covar(self) -> np.ndarray:
        return self.covar[-1]


class ScanKalmanOD:
    """Compiled-scan OD process over a fixed station set and type tuple.

    The compiled program is cached per (arc length M); re-running with new
    measurements of the same shape does not retrace.
    """

    def __init__(
        self,
        prop,
        devices: Sequence,
        types: Optional[Tuple[str, ...]] = None,
        variant: str = "ckf",
        process_noise=None,
        resid_rejection_sigmas: Optional[float] = None,
        almanac=None,
    ):
        self.prop = prop
        self.devices = list(devices)
        self.types = tuple(types or devices[0].measurement_types)
        self.variant = variant
        self.process_noise = process_noise
        self.resid_rejection_sigmas = resid_rejection_sigmas
        self.almanac = almanac
        frames = {d.frame for d in devices}
        if len(frames) != 1:
            raise ValueError("all scan-filter stations must share a frame")
        self.station_frame = devices[0].frame
        # station parameter tables, gathered by tracker index on device
        self._lat = jnp.asarray([d.latitude_deg for d in devices])
        self._lon = jnp.asarray([d.longitude_deg for d in devices])
        self._hgt = jnp.asarray([d.height_km for d in devices])
        big = 1e30
        rvar = np.full((len(devices), len(self.types)), big)
        for i, d in enumerate(devices):
            for j, t in enumerate(self.types):
                n = d.stochastic_noises.get(t)
                if n is not None and t in d.measurement_types:
                    rvar[i, j] = max(n.covariance(), 1e-32)
        self._rvar = jnp.asarray(rvar)
        self._compiled = {}

    # ------------------------------------------------------------------
    def _snc_q(self, dt_s, y_ref):
        pn = self.process_noise
        if pn is None:
            return jnp.zeros((STATE_DIM, STATE_DIM))
        qd = jnp.asarray(pn.q_diag_km2_s4)
        q3 = jnp.diag(qd)
        if pn.local_frame is not None:
            dcm = (
                ric_dcm(y_ref[0:3], y_ref[3:6])
                if pn.local_frame.lower() == "ric"
                else vnc_dcm(y_ref[0:3], y_ref[3:6])
            )
            q3 = dcm.T @ q3 @ dcm
        q = jnp.zeros((STATE_DIM, STATE_DIM))
        q = q.at[0:3, 0:3].set(q3 * dt_s**4 / 4.0)
        q = q.at[0:3, 3:6].set(q3 * dt_s**3 / 2.0)
        q = q.at[3:6, 0:3].set(q3 * dt_s**3 / 2.0)
        q = q.at[3:6, 3:6].set(q3 * dt_s**2)
        gate = (dt_s > 0.0) & (dt_s <= pn.disable_time_s)
        return jnp.where(gate, q, jnp.zeros_like(q))

    def _build(self, m: int, epoch0: Epoch, arc_span_s: float):
        """Compile the scan over an M-measurement arc."""
        dyn = self.prop.dynamics
        eom = dyn.make_eom(with_stm=True)
        finally_fn = dyn.make_finally()
        opts, method = self.prop.opts, self.prop.method
        types = self.types
        frame = self.station_frame
        lat, lon, hgt, rvar = self._lat, self._lon, self._hgt, self._rvar
        variant = self.variant
        rej_sigmas = self.resid_rejection_sigmas
        epoch0_tdb_minus_rel = epoch0.to_tdb_seconds()

        def step(carry, x, ctx, sc_params):
            t_prev, y_ref, dev, p_mat = carry
            t_rel, trk, obs, avail = x
            dt = t_rel - t_prev

            # 1. propagate reference + STM across the gap (adaptive RK
            #    while_loop nested in the scan body)
            y90 = jnp.concatenate([y_ref, jnp.eye(STATE_DIM).ravel()])
            res = integrator.propagate(
                eom,
                y90[None, :],
                dt,
                opts,
                method,
                t0=t_prev,
                finally_fn=finally_fn,
                eom_args=(ctx, sc_params),
            )
            row = res.y[0]
            y_bar = row[0:STATE_DIM]
            phi = row[STATE_DIM:].reshape(STATE_DIM, STATE_DIM)
            # zero-gap: keep the previous state, identity STM
            zero_gap = jnp.abs(dt) < 1e-12
            y_bar = jnp.where(zero_gap, y_ref, y_bar)
            phi = jnp.where(zero_gap, jnp.eye(STATE_DIM), phi)

            p_bar = phi @ p_mat @ phi.T + self._snc_q(dt, y_ref)
            dev_bar = phi @ dev

            # 2. computed obs + H by forward AD at the reference
            t_tdb = epoch0_tdb_minus_rel + t_rel
            s_lat, s_lon, s_hgt = lat[trk], lon[trk], hgt[trk]

            def h_of_y(y9):
                return _station_obs(
                    t_tdb, y9[0:6], s_lat, s_lon, s_hgt, frame, types
                )

            computed, h_jvp = jax.linearize(h_of_y, y_bar)
            h_mat = jax.vmap(h_jvp)(jnp.eye(STATE_DIM)).T  # [T, 9]

            r_eff = jnp.where(avail, rvar[trk], 1e30)
            prefit = jnp.where(avail, obs - computed - h_mat @ dev_bar, 0.0)

            s_mat = h_mat @ p_bar @ h_mat.T + jnp.diag(r_eff)
            l_chol = jnp.linalg.cholesky(s_mat)
            white = jax.scipy.linalg.solve_triangular(l_chol, prefit, lower=True)
            m_eff = jnp.maximum(jnp.sum(avail), 1)
            ratio = jnp.linalg.norm(white) / jnp.sqrt(m_eff.astype(jnp.float64))

            rejected = (
                (ratio > rej_sigmas) if rej_sigmas is not None else jnp.bool_(False)
            )

            # 3. gain by Cholesky solve: K = P̄ Hᵀ S⁻¹
            k_t = jax.scipy.linalg.cho_solve((l_chol, True), h_mat @ p_bar.T)
            k_gain = jnp.where(rejected, 0.0, k_t.T)  # [9, T]

            dev_new = dev_bar + k_gain @ prefit
            postfit = jnp.where(avail, obs - computed - h_mat @ dev_new, 0.0)
            ikh = jnp.eye(STATE_DIM) - k_gain @ h_mat
            p_new = ikh @ p_bar @ ikh.T + k_gain @ jnp.diag(r_eff) @ k_gain.T
            p_new = 0.5 * (p_new + p_new.T)

            if variant == "ekf":
                y_out = y_bar + dev_new
                dev_out = jnp.zeros(STATE_DIM)
            else:
                y_out = y_bar
                dev_out = dev_new
            outputs = (y_bar + dev_new, p_new, prefit, postfit, ratio, rejected)
            return (t_rel, y_out, dev_out, p_new), outputs

        def run_one(t_rel, trk, obs, avail, y0, p0, ctx, sc_params):
            carry0 = (jnp.float64(0.0), y0, jnp.zeros(STATE_DIM), p0)
            _, out = jax.lax.scan(
                lambda c, x: step(c, x, ctx, sc_params),
                carry0,
                (t_rel, trk, obs, avail),
            )
            return out

        run = jax.jit(run_one)
        # the ensemble-of-filters axis (SURVEY.md §2.8): vmap over initial
        # estimates for batched covariance/robustness analysis — one
        # compiled program runs every filter in lock-step
        run_batch = jax.jit(
            jax.vmap(run_one, in_axes=(None, None, None, None, 0, 0, None, None))
        )
        return run, run_batch

    # ------------------------------------------------------------------
    def process_arc(self, initial_estimate, arc: TrackingDataArc) -> ScanODResult:
        """Run the compiled scan filter over the arc. `initial_estimate`
        is a KfEstimate whose nominal epoch precedes the first measurement."""
        epoch0 = initial_estimate.epoch
        t0_tai = epoch0.to_tai_seconds()
        t_rel = jnp.asarray(arc.epochs_tai_s - t0_tai)
        m = len(arc)
        trk_names = {d.name: i for i, d in enumerate(self.devices)}
        trk = jnp.asarray(
            [trk_names[arc.trackers[i]] for i in arc.tracker_idx],
            dtype=jnp.int32,
        )
        # column-align the arc values to self.types
        obs = np.zeros((m, len(self.types)))
        avail = np.zeros((m, len(self.types)), dtype=bool)
        for j, t in enumerate(self.types):
            if t in arc.types:
                col = arc.types.index(t)
                v = arc.values[:, col]
                good = np.isfinite(v)
                obs[good, j] = v[good]
                avail[:, j] = good

        arc_span = float(t_rel[-1]) if m else 0.0
        key = (m, epoch0.to_tai_seconds())
        if key not in self._compiled:
            self._compiled[key] = self._build(m, epoch0, arc_span)
        run, _ = self._compiled[key]

        dyn = self.prop.dynamics
        ctx = dyn.build_context(epoch0, arc_span, self.almanac)
        nominal = initial_estimate.nominal
        sc_params = dict(
            dry_mass_kg=nominal.dry_mass_kg,
            srp_area_m2=nominal.srp_area_m2,
            drag_area_m2=nominal.drag_area_m2,
        )
        y0 = jnp.asarray(nominal.to_vector())
        p0 = jnp.asarray(initial_estimate.covar)
        y_est, covar, prefit, postfit, ratio, rejected = run(
            t_rel, trk, jnp.asarray(obs), jnp.asarray(avail), y0, p0, ctx,
            sc_params,
        )
        return ScanODResult(
            epochs_tai_s=np.asarray(arc.epochs_tai_s),
            y_est=np.asarray(y_est),
            covar=np.asarray(covar),
            prefit=np.asarray(prefit),
            postfit=np.asarray(postfit),
            ratio=np.asarray(ratio),
            rejected=np.asarray(rejected),
            types=self.types,
        )


    def process_arc_batch(self, initial_estimates, arc: TrackingDataArc):
        """Run an ensemble of filters over the same arc in one vmapped
        program (the reference's "MC of ODs" has no counterpart — rayon
        would fan out whole processes; here the filter ensemble is just
        another batch axis). Returns a list of ScanODResult."""
        first = initial_estimates[0]
        epoch0 = first.epoch
        t0_tai = epoch0.to_tai_seconds()
        t_rel = jnp.asarray(arc.epochs_tai_s - t0_tai)
        m = len(arc)
        trk_names = {d.name: i for i, d in enumerate(self.devices)}
        trk = jnp.asarray(
            [trk_names[arc.trackers[i]] for i in arc.tracker_idx],
            dtype=jnp.int32,
        )
        obs = np.zeros((m, len(self.types)))
        avail = np.zeros((m, len(self.types)), dtype=bool)
        for j, t in enumerate(self.types):
            if t in arc.types:
                col = arc.types.index(t)
                v = arc.values[:, col]
                good = np.isfinite(v)
                obs[good, j] = v[good]
                avail[:, j] = good
        arc_span = float(t_rel[-1]) if m else 0.0
        key = (m, epoch0.to_tai_seconds())
        if key not in self._compiled:
            self._compiled[key] = self._build(m, epoch0, arc_span)
        _, run_batch = self._compiled[key]

        dyn = self.prop.dynamics
        ctx = dyn.build_context(epoch0, arc_span, self.almanac)
        nominal = first.nominal
        sc_params = dict(
            dry_mass_kg=nominal.dry_mass_kg,
            srp_area_m2=nominal.srp_area_m2,
            drag_area_m2=nominal.drag_area_m2,
        )
        y0s = jnp.asarray(np.stack([e.nominal.to_vector() for e in initial_estimates]))
        p0s = jnp.asarray(np.stack([e.covar for e in initial_estimates]))
        y_est, covar, prefit, postfit, ratio, rejected = run_batch(
            t_rel, trk, jnp.asarray(obs), jnp.asarray(avail), y0s, p0s, ctx,
            sc_params,
        )
        out = []
        for k in range(len(initial_estimates)):
            out.append(
                ScanODResult(
                    epochs_tai_s=np.asarray(arc.epochs_tai_s),
                    y_est=np.asarray(y_est[k]),
                    covar=np.asarray(covar[k]),
                    prefit=np.asarray(prefit[k]),
                    postfit=np.asarray(postfit[k]),
                    ratio=np.asarray(ratio[k]),
                    rejected=np.asarray(rejected[k]),
                    types=self.types,
                )
            )
        return out
