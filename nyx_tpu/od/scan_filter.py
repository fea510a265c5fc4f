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


def _station_obs(t_tdb, rv6, lat_deg, lon_deg, height_km, frame, types,
                 lt=0.0):
    """[T] noiseless observations for a station given by traced geodetic
    coordinates (the gatherable form of GroundStation._one_way). `lt` > 0
    applies the downlink light-time backdating (two fixed-point iterations,
    GroundStation._light_time_backdate)."""
    from ..constants import SPEED_OF_LIGHT_KM_S

    r_bf = geodetic_to_body_fixed(
        lat_deg, lon_deg, height_km, frame.radius_km, frame.flattening
    )

    def pos(t):
        return frame.dcm_from_j2000(t).T @ r_bf

    r_st, v_st = jax.jvp(pos, (t_tdb,), (jnp.ones_like(t_tdb),))
    r, v = rv6[0:3], rv6[3:6]
    tau = jnp.linalg.norm(r - r_st) / SPEED_OF_LIGHT_KM_S
    tau = jnp.linalg.norm(r - tau * v - r_st) / SPEED_OF_LIGHT_KM_S
    rv6 = jnp.where(lt > 0.0, jnp.concatenate([r - tau * v, v]), rv6)
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
        prop_mode: str = "fixed",
        substeps: int = 1,
        max_gap_s: Optional[float] = None,
    ):
        """`prop_mode`:

        - "fixed" (default): each scan row advances the reference with
          `substeps` fixed RK steps spanning exactly the inter-measurement
          gap; gaps longer than `max_gap_s` (default min(max_step, 300 s))
          are bridged by inserting masked time-update-only rows on the
          host, mirroring the reference's <=max_step chunking
          (od/process/mod.rs:215-241). No lax loop remains inside the scan
          body — on the axon TPU this is ~10x the adaptive path's filter
          throughput, and sub-steps never exceed the adaptive path's own
          accepted step for these gap sizes, so accuracy is unchanged
          (asserted against the host filter in tests).
        - "adaptive": the round-1 behavior, a nested adaptive-RK
          while_loop per measurement.
        """
        self.prop = prop
        self.devices = list(devices)
        self.types = tuple(types or devices[0].measurement_types)
        self.variant = variant
        self.process_noise = process_noise
        self.resid_rejection_sigmas = resid_rejection_sigmas
        self.almanac = almanac
        self.prop_mode = prop_mode
        self.substeps = int(substeps)
        self.max_gap_s = float(
            max_gap_s
            if max_gap_s is not None
            else min(prop.opts.max_step_s, 300.0)
        )
        frames = {d.frame for d in devices}
        if len(frames) != 1:
            raise ValueError("all scan-filter stations must share a frame")
        self.station_frame = devices[0].frame
        # station parameter tables, gathered by tracker index on device
        self._lat = jnp.asarray([d.latitude_deg for d in devices])
        self._lon = jnp.asarray([d.longitude_deg for d in devices])
        self._hgt = jnp.asarray([d.height_km for d in devices])
        self._lt = jnp.asarray(
            [1.0 if getattr(d, "light_time_correction", False) else 0.0
             for d in devices]
        )
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

    def _build(self, m: int):
        """Compile the scan over an M-row (measurement + filler) arc.

        The epoch only enters as the traced `epoch0_tdb` argument, so arcs
        of equal length never retrace."""
        dyn = self.prop.dynamics
        eom = dyn.make_eom(with_stm=True)
        finally_fn = dyn.make_finally()
        opts, method = self.prop.opts, self.prop.method
        types = self.types
        frame = self.station_frame
        lat, lon, hgt, rvar = self._lat, self._lon, self._hgt, self._rvar
        lt_flags = self._lt
        variant = self.variant
        rej_sigmas = self.resid_rejection_sigmas
        substeps = max(1, self.substeps)
        a_tab = method.a_matrix
        b_tab, bs_tab, c_tab = method.b, method.b_star, method.c

        def prop_fixed(y_ref, t_prev, dt, ctx, sc_params):
            """substeps fixed RK steps spanning [t_prev, t_prev+dt] on the
            [1, 90] reference+STM row; dt == 0 degenerates exactly to the
            identity update."""
            y = jnp.concatenate([y_ref, jnp.eye(STATE_DIM).ravel()])[None, :]
            h = jnp.asarray([dt / substeps])
            eom2 = lambda t, yy: eom(t, yy, ctx, sc_params)
            fin2 = lambda t, yy: finally_fn(t, yy, ctx, sc_params)
            for k in range(substeps):
                t = jnp.asarray([t_prev + k * (dt / substeps)])
                y, _ = integrator._rk_stages(
                    eom2, a_tab, b_tab, bs_tab, c_tab, t, y, h
                )
                y = fin2(t + h, y)
            row = y[0]
            return row[0:STATE_DIM], row[STATE_DIM:].reshape(
                STATE_DIM, STATE_DIM
            )

        def prop_adaptive(y_ref, t_prev, dt, ctx, sc_params):
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
            return y_bar, phi

        prop_gap = prop_fixed if self.prop_mode == "fixed" else prop_adaptive

        def step(carry, x, ctx, sc_params, epoch0_tdb):
            t_prev, y_ref, dev, p_mat = carry
            t_rel, trk, obs, avail = x
            dt = t_rel - t_prev

            # 1. propagate reference + STM across the gap
            y_bar, phi = prop_gap(y_ref, t_prev, dt, ctx, sc_params)

            p_bar = phi @ p_mat @ phi.T + self._snc_q(dt, y_ref)
            dev_bar = phi @ dev

            # 2. computed obs + H by forward AD at the reference
            t_tdb = epoch0_tdb + t_rel
            s_lat, s_lon, s_hgt = lat[trk], lon[trk], hgt[trk]
            s_lt = lt_flags[trk]

            def h_of_y(y9):
                return _station_obs(
                    t_tdb, y9[0:6], s_lat, s_lon, s_hgt, frame, types,
                    lt=s_lt,
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

        def run_one(t_rel, trk, obs, avail, y0, p0, ctx, sc_params,
                    epoch0_tdb):
            carry0 = (jnp.float64(0.0), y0, jnp.zeros(STATE_DIM), p0)
            _, out = jax.lax.scan(
                lambda c, x: step(c, x, ctx, sc_params, epoch0_tdb),
                carry0,
                (t_rel, trk, obs, avail),
            )
            return out

        run = jax.jit(run_one)
        # the ensemble-of-filters axis (SURVEY.md §2.8): vmap over initial
        # estimates for batched covariance/robustness analysis — one
        # compiled program runs every filter in lock-step
        run_batch = jax.jit(
            jax.vmap(
                run_one,
                in_axes=(None, None, None, None, 0, 0, None, None, None),
            )
        )
        return run, run_batch

    # ------------------------------------------------------------------
    def _prepare(self, arc: TrackingDataArc, epoch0: Epoch):
        """Host-side arc layout: per-row (t_rel, trk, obs, avail) arrays
        with masked filler rows inserted so no row spans more than
        max_gap_s (fixed mode), plus the real-measurement mask."""
        t0_tai = epoch0.to_tai_seconds()
        t_rel = np.asarray(arc.epochs_tai_s) - t0_tai
        m = len(arc)
        trk_names = {d.name: i for i, d in enumerate(self.devices)}
        trk = np.asarray(
            [trk_names[arc.trackers[i]] for i in arc.tracker_idx],
            dtype=np.int32,
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

        if self.prop_mode != "fixed":
            return t_rel, trk, obs, avail, np.ones(m, dtype=bool)

        rows_t, rows_trk, rows_obs, rows_avail, real = [], [], [], [], []
        prev = 0.0
        gap_max = self.max_gap_s * max(1, self.substeps)
        for i in range(m):
            gap = t_rel[i] - prev
            if gap > gap_max:
                n_fill = int(np.ceil(gap / gap_max)) - 1
                for k in range(1, n_fill + 1):
                    rows_t.append(prev + gap * k / (n_fill + 1))
                    rows_trk.append(0)
                    rows_obs.append(np.zeros(len(self.types)))
                    rows_avail.append(np.zeros(len(self.types), dtype=bool))
                    real.append(False)
            rows_t.append(t_rel[i])
            rows_trk.append(trk[i])
            rows_obs.append(obs[i])
            rows_avail.append(avail[i])
            real.append(True)
            prev = t_rel[i]
        return (
            np.asarray(rows_t),
            np.asarray(rows_trk, dtype=np.int32),
            np.stack(rows_obs),
            np.stack(rows_avail),
            np.asarray(real),
        )

    # ------------------------------------------------------------------
    def _setup(self, initial_estimate, arc: TrackingDataArc):
        epoch0 = initial_estimate.epoch
        t_rel, trk, obs, avail, real = self._prepare(arc, epoch0)
        m_rows = len(t_rel)
        if m_rows not in self._compiled:
            self._compiled[m_rows] = self._build(m_rows)
        arc_span = float(t_rel[-1]) if m_rows else 0.0
        ctx = self.prop.dynamics.build_context(epoch0, arc_span, self.almanac)
        nominal = initial_estimate.nominal
        sc_params = dict(
            dry_mass_kg=nominal.dry_mass_kg,
            srp_area_m2=nominal.srp_area_m2,
            drag_area_m2=nominal.drag_area_m2,
        )
        args = (
            jnp.asarray(t_rel), jnp.asarray(trk), jnp.asarray(obs),
            jnp.asarray(avail),
        )
        epoch0_tdb = jnp.float64(epoch0.to_tdb_seconds())
        return self._compiled[m_rows], args, ctx, sc_params, epoch0_tdb, real

    def process_arc(self, initial_estimate, arc: TrackingDataArc) -> ScanODResult:
        """Run the compiled scan filter over the arc. `initial_estimate`
        is a KfEstimate whose nominal epoch precedes the first measurement."""
        (run, _), args, ctx, sc_params, epoch0_tdb, real = self._setup(
            initial_estimate, arc
        )
        y0 = jnp.asarray(initial_estimate.nominal.to_vector())
        p0 = jnp.asarray(initial_estimate.covar)
        y_est, covar, prefit, postfit, ratio, rejected = run(
            *args, y0, p0, ctx, sc_params, epoch0_tdb
        )
        return ScanODResult(
            epochs_tai_s=np.asarray(arc.epochs_tai_s),
            y_est=np.asarray(y_est)[real],
            covar=np.asarray(covar)[real],
            prefit=np.asarray(prefit)[real],
            postfit=np.asarray(postfit)[real],
            ratio=np.asarray(ratio)[real],
            rejected=np.asarray(rejected)[real],
            types=self.types,
        )

    def process_arc_batch(self, initial_estimates, arc: TrackingDataArc):
        """Run an ensemble of filters over the same arc in one vmapped
        program (the reference's "MC of ODs" has no counterpart — rayon
        would fan out whole processes; here the filter ensemble is just
        another batch axis). Returns a list of ScanODResult."""
        first = initial_estimates[0]
        (_, run_batch), args, ctx, sc_params, epoch0_tdb, real = self._setup(
            first, arc
        )
        y0s = jnp.asarray(np.stack([e.nominal.to_vector() for e in initial_estimates]))
        p0s = jnp.asarray(np.stack([e.covar for e in initial_estimates]))
        y_est, covar, prefit, postfit, ratio, rejected = run_batch(
            *args, y0s, p0s, ctx, sc_params, epoch0_tdb
        )
        out = []
        for k in range(len(initial_estimates)):
            out.append(
                ScanODResult(
                    epochs_tai_s=np.asarray(arc.epochs_tai_s),
                    y_est=np.asarray(y_est[k])[real],
                    covar=np.asarray(covar[k])[real],
                    prefit=np.asarray(prefit[k])[real],
                    postfit=np.asarray(postfit[k])[real],
                    ratio=np.asarray(ratio[k])[real],
                    rejected=np.asarray(rejected[k])[real],
                    types=self.types,
                )
            )
        return out
