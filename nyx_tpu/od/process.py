"""The OD engine: sequential Kalman processing of a tracking arc.

Counterpart of the reference's `KalmanODProcess::process_arc`
(od/process/mod.rs:51-497). For each measurement epoch: propagate the
nominal with STM from the previous epoch (device-side batched RK kernel,
one jit compile reused for every gap), compute the observation and its
H-tilde by forward-mode AD through the station geometry, run the
measurement update (Joseph/Cholesky/sigma-rejection), optionally swap the
EKF reference, and reset the STM. `predict_for/until` performs pure
covariance mapping at a fixed step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmic.spacecraft import Spacecraft
from ..propagators.propagator import Propagator
from ..time import Duration, Epoch
from .estimate import KfEstimate, Residual
from .kalman import KalmanFilter, KalmanVariant, ProcessNoise
from .msr import TrackingDataArc
from .solution import ODSolution

STATE_DIM = 9


def _secs(x) -> float:
    return x.to_seconds() if isinstance(x, Duration) else float(x)


class KalmanODProcess:
    """devices + propagator + filter configuration (od/process/mod.rs:51-97)."""

    def __init__(
        self,
        prop: Propagator,
        process_noise: Sequence[ProcessNoise] = (),
        variant: str = KalmanVariant.ReferenceUpdate,
        resid_rejection_sigmas: Optional[float] = 3.0,
        max_step=60.0,
        almanac=None,
    ):
        self.prop = prop
        self.process_noise = process_noise
        self.variant = variant
        self.resid_rejection_sigmas = resid_rejection_sigmas
        self.max_step_s = _secs(max_step)
        self.almanac = almanac
        self._h_cache: Dict = {}

    # ------------------------------------------------------------------
    def _h_fns(self, device, types: tuple):
        """(h, jac_h) jitted: computed obs [m] and H-tilde [m, 9] of the
        flat 9-state. AD replaces od/msr/sensitivity.rs:60-239.

        Two-way devices (integration_time_s set) get `h(t, y9, y6_tm)` — the
        averaged observation over the integration interval
        (trk_device.rs:49-138) with partials at the measurement epoch.
        """
        key = (id(device), types)
        if key not in self._h_cache:
            h_rv = device.measurement_fn(types)

            def h_inst(t_tdb_s, y9, y6_tm):
                return h_rv(t_tdb_s, y9[0:6])

            if device.integration_time_s:
                h2 = device.two_way_fn(types)

                def h(t_tdb_s, y9, y6_tm):
                    return h2(t_tdb_s, y9[0:6], y6_tm)

            else:
                h = h_inst

            # H-tilde for two-way devices is the partial of the AVERAGED
            # observable, chained through the linearized backward flow:
            # H = 0.5 (H_t + H_tm @ Phi(t -> t-T)), Phi ~ I with the
            # -T_int r-v block. Differentiating the average with y_tm held
            # FIXED would halve H and mis-scale the gain (measured 2.4 km
            # divergence); the pure instantaneous H_t misses the t-T
            # endpoint's sensitivity entirely — on fast-LOS geometry (low
            # lunar orbit + surface station) that diverges the CKF too
            # (measured 418 m vs 13 m one-way on ex04's 2 h arc). The
            # scan filter implements the identical H (scan_filter.py
            # one_obs), keeping host/device parity exact.
            if device.integration_time_s:
                t_int = float(device.integration_time_s)
                jac_inst = jax.jacfwd(h_inst, argnums=1)
                phi_back = jnp.eye(9).at[0:3, 3:6].set(-t_int * jnp.eye(3))

                def jac(t_tdb_s, y9, y6_tm,
                        _ji=jac_inst, _pb=phi_back, _ti=t_int):
                    h1 = _ji(t_tdb_s, y9, y6_tm)
                    y9_tm = jnp.concatenate([y6_tm, y9[6:9]])
                    h0 = _ji(t_tdb_s - _ti, y9_tm, y6_tm)
                    return 0.5 * (h1 + h0 @ _pb)

            else:
                jac = jax.jacfwd(h_inst, argnums=1)
            self._h_cache[key] = (jax.jit(h), jax.jit(jac))
        return self._h_cache[key]

    def _chunked_time_updates(self, kf, instance, epoch: Epoch, sol=None):
        """Advance toward `epoch` in <= max_step_s chunks, applying a
        filter TIME UPDATE at each intermediate chunk. The reference
        advances every SNC's prev_epoch at each chunk
        (od/process/mod.rs:215-241, snc.rs prev_epoch), so process noise
        accumulates piecewise through measurement gaps — one Q(gap) shot
        both over-weights the dt^4 position block and defeats the
        disable-time gate's purpose. The final <= max_step remainder is
        left for the measurement update's own time update.

        Each intermediate predicted estimate is appended to the solution
        (the reference streams them too), which is also what keeps the RTS
        smoother exact: every stored STM spans exactly one chunk."""
        while True:
            rem = (epoch - instance.state.epoch).to_seconds()
            if rem <= self.max_step_s + 1e-9:
                return
            nominal, stm, dt = self._propagate_stm(
                instance, instance.state.epoch + self.max_step_s
            )
            est = kf.time_update(nominal, stm, dt)
            if sol is not None:
                sol.append(est, None)
            instance.state = nominal.with_stm()

    def _propagate_stm(self, instance, epoch: Epoch):
        """Advance the PropInstance (STM enabled) to `epoch`; returns
        (nominal_spacecraft, phi [9,9], dt_s)."""
        dt = (epoch - instance.state.epoch).to_seconds()
        if abs(dt) < 1e-9:
            return instance.state, np.eye(STATE_DIM), 0.0
        instance.state.stm = np.eye(STATE_DIM)
        sc = instance.for_duration(dt)
        return sc, sc.stm.copy(), dt

    # ------------------------------------------------------------------
    def process_arc(
        self,
        initial_estimate: KfEstimate,
        arc: TrackingDataArc,
        devices: Sequence,
    ) -> ODSolution:
        """Run the filter over every measurement of the arc
        (od/process/mod.rs:126-437)."""
        dev_map = {d.name: d for d in devices}
        kf = KalmanFilter(
            prev_estimate=initial_estimate,
            process_noise=self.process_noise,
            variant=self.variant,
        )
        nominal = initial_estimate.nominal.with_stm()
        instance = self.prop.with_state(nominal, self.almanac)

        sol = ODSolution(
            devices=tuple(dev_map),
            measurement_types=arc.unique_types(),
        )
        sol.append(initial_estimate, None)

        # residual-vs-reference mode: reject everything so the filter never
        # updates and residuals are vs the propagated nominal
        # (process/mod.rs:175-180)
        reject_sigmas = self.resid_rejection_sigmas
        if getattr(arc, "force_reject", False):
            reject_sigmas = 0.0

        n = len(arc)
        accepted = rejected = 0
        from ..tracing import Progress

        progress = Progress(n, "measurements")
        for i in range(n):
            msr = arc.measurement(i)
            device = dev_map.get(msr.tracker)
            if device is None:
                continue
            # 1. propagate nominal + STM to the measurement epoch; two-way
            #    devices stop at t - T_int first to capture the turn-around
            #    state (trk_device.rs:49-138)
            y6_tm = jnp.zeros(6)
            stm_pre = np.eye(STATE_DIM)
            dt_pre = 0.0
            self._chunked_time_updates(kf, instance, msr.epoch, sol)
            if device.integration_time_s:
                mid, stm_pre, dt_pre = self._propagate_stm(
                    instance, msr.epoch - float(device.integration_time_s)
                )
                y6_tm = jnp.asarray(mid.to_vector()[0:6])
            nominal, stm, dt_s = self._propagate_stm(instance, msr.epoch)
            if device.integration_time_s:
                stm = stm @ stm_pre
                dt_s = dt_s + dt_pre

            # 2. computed observation + sensitivity at the nominal
            types = tuple(t for t in device.measurement_types if t in msr.data)
            if not types:
                continue
            h_fn, jac_fn = self._h_fns(device, types)
            t_tdb = jnp.float64(msr.epoch.to_tdb_seconds())
            y9 = jnp.asarray(nominal.to_vector())
            computed = np.asarray(h_fn(t_tdb, y9, y6_tm))
            h_tilde = np.asarray(jac_fn(t_tdb, y9, y6_tm))
            real = msr.observation(types)

            # range-ambiguity moduli (od/process/mod.rs:336-348)
            if arc.moduli:
                for j, t in enumerate(types):
                    if t in arc.moduli:
                        modulus = arc.moduli[t]
                        real[j] = computed[j] + (
                            (real[j] - computed[j] + modulus / 2) % modulus
                            - modulus / 2
                        )

            r_mat = device.measurement_covar(types)

            # 3. filter update
            est, resid = kf.measurement_update(
                nominal,
                real,
                computed,
                r_mat,
                h_tilde,
                stm,
                dt_s,
                reject_sigmas,
                tracker=msr.tracker,
                msr_types=types,
            )
            if resid.rejected:
                rejected += 1
            else:
                accepted += 1

            # 4. EKF reference swap (od/process/mod.rs:367-372)
            if self.variant == KalmanVariant.ReferenceUpdate and not resid.rejected:
                instance.state = est.nominal.with_stm()
            else:
                instance.state = nominal.with_stm()
            sol.append(est, resid, gain=kf.last_gain)
            # 10%-decile progress with accept/reject counts
            # (od/process/mod.rs:403-415)
            progress.step(i, f"{accepted} accepted, {rejected} rejected")

        sol.accepted, sol.rejected = accepted, rejected
        return sol

    # ------------------------------------------------------------------
    def predict_for(
        self, initial_estimate: KfEstimate, duration, step=None
    ) -> ODSolution:
        """Covariance mapping only (od/process/mod.rs predict_for)."""
        step_s = _secs(step) if step is not None else self.max_step_s
        dur_s = _secs(duration)
        kf = KalmanFilter(
            prev_estimate=initial_estimate,
            process_noise=self.process_noise,
            variant=self.variant,
        )
        nominal = initial_estimate.nominal.with_stm()
        instance = self.prop.with_state(nominal, self.almanac)
        sol = ODSolution(devices=(), measurement_types=())
        sol.append(initial_estimate, None)
        t = 0.0
        epoch0 = initial_estimate.epoch
        while t < dur_s - 1e-9:
            dt = min(step_s, dur_s - t)
            t += dt
            nominal, stm, _ = self._propagate_stm(instance, epoch0 + t)
            est = kf.time_update(nominal, stm, dt)
            instance.state = nominal.with_stm()
            sol.append(est, None)
        return sol

    def predict_until(self, initial_estimate: KfEstimate, epoch: Epoch, step=None):
        return self.predict_for(
            initial_estimate, epoch - initial_estimate.epoch, step
        )


def SpacecraftKalmanOD(prop, process_noise=(), variant=KalmanVariant.ReferenceUpdate,
                       resid_rejection_sigmas=3.0, max_step=60.0, almanac=None):
    """Alias matching the reference's SpacecraftKalmanOD (od/mod.rs:76-99)."""
    return KalmanODProcess(
        prop, process_noise, variant, resid_rejection_sigmas, max_step, almanac
    )


class SpacecraftKalmanScalarOD(KalmanODProcess):
    """MsrSize=1 engine (od/mod.rs SpacecraftKalmanScalarOD): every
    measurement type is processed as its own scalar update in sequence —
    the classic scalar-measurement Kalman formulation (no matrix solve per
    update). Implemented by expanding each multi-type measurement row into
    consecutive single-type rows at the same epoch before the standard
    loop."""

    def process_arc(self, initial_estimate, arc, devices):
        return super().process_arc(
            initial_estimate, _expand_scalar(arc), devices
        )


def _expand_scalar(arc):
    """Arc copy with one measurement type per row (same epoch order)."""
    from .msr import TrackingDataArc

    epochs, tidx, rows = [], [], []
    T = len(arc.types)
    for i in range(len(arc)):
        for j in range(T):
            v = arc.values[i, j]
            if not np.isnan(v):
                row = np.full(T, np.nan)
                row[j] = v
                epochs.append(arc.epochs_tai_s[i])
                tidx.append(arc.tracker_idx[i])
                rows.append(row)
    return TrackingDataArc(
        arc.trackers, arc.types, np.asarray(epochs), np.asarray(tidx),
        np.stack(rows) if rows else np.zeros((0, T)), arc.moduli,
        arc.force_reject,
    )
