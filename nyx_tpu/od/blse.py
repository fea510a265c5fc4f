"""Batch least-squares estimation.

Counterpart of the reference's `BatchLeastSquares` (od/blse/mod.rs:52-450):
iterative normal equations (HᵀWH)δx₀ = HᵀWδy about the initial epoch, with
an optional Levenberg-Marquardt damping schedule, converging on the norm of
the position correction. Each iteration re-propagates the reference with
STM and maps every measurement partial back to the initial epoch through
the accumulated Φ(t_i, t₀).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .estimate import KfEstimate
from .msr import TrackingDataArc

STATE_DIM = 9
EST_DIM = 6  # BLSE solves position/velocity only (od/blse/mod.rs:62)


class BLSSolver:
    NormalEquations = "normal_eq"
    LevenbergMarquardt = "lm"


@dataclass
class BLSSolution:
    estimated_state: object
    covariance: np.ndarray
    num_iterations: int
    final_rms: float
    final_corr_pos_km: float
    converged: bool

    def __str__(self):
        return (
            f"BLSSolution({'converged' if self.converged else 'NOT converged'} "
            f"in {self.num_iterations} iters, rms {self.final_rms:.3e}, "
            f"last pos corr {self.final_corr_pos_km:.3e} km)"
        )


class BatchLeastSquares:
    def __init__(
        self,
        prop,
        solver: str = BLSSolver.NormalEquations,
        max_iterations: int = 10,
        tolerance_pos_km: float = 1e-4,
        lm_lambda_init: float = 1e-3,
        almanac=None,
    ):
        self.prop = prop
        self.solver = solver
        self.max_iterations = max_iterations
        self.tolerance_pos_km = tolerance_pos_km
        self.lm_lambda_init = lm_lambda_init
        self.almanac = almanac
        self._h_cache = {}

    def _h_fns(self, device, types):
        key = (id(device), types)
        if key not in self._h_cache:
            h_rv = device.measurement_fn(types)

            def h(t, y9):
                return h_rv(t, y9[0:6])

            self._h_cache[key] = (jax.jit(h), jax.jit(jax.jacfwd(h, argnums=1)))
        return self._h_cache[key]

    def estimate(
        self, initial_guess, arc: TrackingDataArc, devices: Sequence
    ) -> BLSSolution:
        dev_map = {d.name: d for d in devices}
        guess = initial_guess
        lam = self.lm_lambda_init
        prev_rms = np.inf
        converged = False
        it = 0
        corr_pos = np.nan
        rms = np.nan

        for it in range(1, self.max_iterations + 1):
            # propagate reference with STM through the arc, accumulating
            # Phi(t_i, t0) and residuals/partials mapped to t0
            sc = guess.with_stm()
            instance = self.prop.with_state(sc, self.almanac)
            phi0 = np.eye(STATE_DIM)
            htwh = np.zeros((EST_DIM, EST_DIM))
            htwy = np.zeros(EST_DIM)
            sq_sum = 0.0
            m_count = 0
            for i in range(len(arc)):
                msr = arc.measurement(i)
                device = dev_map.get(msr.tracker)
                if device is None:
                    continue
                dt = (msr.epoch - instance.state.epoch).to_seconds()
                if abs(dt) > 1e-9:
                    instance.state.stm = np.eye(STATE_DIM)
                    nominal = instance.for_duration(dt)
                    phi0 = nominal.stm @ phi0
                else:
                    nominal = instance.state
                types = tuple(t for t in device.measurement_types if t in msr.data)
                if not types:
                    continue
                h_fn, jac_fn = self._h_fns(device, types)
                t_tdb = jnp.float64(msr.epoch.to_tdb_seconds())
                y9 = jnp.asarray(nominal.to_vector())
                computed = np.asarray(h_fn(t_tdb, y9))
                h_tilde = np.asarray(jac_fn(t_tdb, y9))
                real = msr.observation(types)
                dy = real - computed
                h0 = (h_tilde @ phi0)[:, :EST_DIM]  # partials wrt x(t0)
                w = np.diag(
                    1.0 / np.maximum(np.diag(device.measurement_covar(types)), 1e-32)
                )
                htwh += h0.T @ w @ h0
                htwy += h0.T @ w @ dy
                sq_sum += float(dy @ w @ dy)
                m_count += len(types)

            rms = np.sqrt(sq_sum / max(m_count, 1))
            a = htwh.copy()
            if self.solver == BLSSolver.LevenbergMarquardt:
                # damping schedule (od/blse/mod.rs:249-296)
                if rms > prev_rms:
                    lam *= 10.0
                else:
                    lam = max(lam / 10.0, 1e-12)
                a += lam * np.diag(np.diag(htwh))
            try:
                dx0 = np.linalg.solve(a, htwy)
            except np.linalg.LinAlgError:
                dx0 = np.linalg.pinv(a) @ htwy
            corr_pos = float(np.linalg.norm(dx0[:3]))

            vec = guess.to_vector()
            vec[:EST_DIM] += dx0
            guess = guess.set_vector(guess.epoch, vec)
            prev_rms = rms
            if corr_pos < self.tolerance_pos_km:
                converged = True
                break

        try:
            cov6 = np.linalg.inv(htwh)
        except np.linalg.LinAlgError:
            cov6 = np.linalg.pinv(htwh)
        cov = np.zeros((STATE_DIM, STATE_DIM))
        cov[:EST_DIM, :EST_DIM] = cov6
        return BLSSolution(
            estimated_state=guess,
            covariance=cov,
            num_iterations=it,
            final_rms=float(rms),
            final_corr_pos_km=corr_pos,
            converged=converged,
        )
