"""Kalman filtering: time/measurement updates, SNC, sigma rejection.

Counterpart of the reference's `KalmanFilter` (od/kalman/mod.rs:38-71,
filtering.rs:33-326) and `ProcessNoise` (od/snc.rs:40-354):

- time update:        P̄ = Φ P Φᵀ + Q_snc                (filtering.rs:59-99)
- innovation covar:   S = H P̄ Hᵀ + R (Cholesky; fall back to R if singular)
- sigma rejection:    ratio = |L⁻¹ r| / sqrt(m) Mahalanobis whitening
                                                       (filtering.rs:165-202)
- gain:               K = P̄ Hᵀ S⁻¹ via Cholesky solve  (filtering.rs:229-249)
- covariance update:  Joseph form + symmetrization     (filtering.rs:290-297)

All updates are pure ndarray functions so an ensemble of filters can be
vmapped for batched covariance analysis.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

from ..cosmic.orbit import ric_dcm, vnc_dcm
from .estimate import KfEstimate, Residual

STATE_DIM = 9


class KalmanVariant:
    """EKF vs CKF (od/kalman/mod.rs:62-71)."""

    ReferenceUpdate = "ekf"  # update the nominal trajectory at each msr
    DeviationTracking = "ckf"  # track the deviation only


@dataclass
class ProcessNoise:
    """Piecewise state-noise compensation (od/snc.rs:40-56).

    Diagonal acceleration PSD q [km^2/s^4] (3,), optionally exponentially
    decaying and/or expressed in a local frame (RIC/VNC), gated by
    `disable_time_s` (no SNC when the time since the last measurement
    exceeds it), with optional chronological switchover via `start_epoch`.
    """

    q_diag_km2_s4: np.ndarray  # (3,) acceleration variances
    disable_time_s: float = 7200.0
    local_frame: Optional[str] = None  # None (inertial), 'ric', 'vnc'
    decay_tau_s: Optional[np.ndarray] = None  # (3,) exponential decay
    start_epoch_tai_s: Optional[float] = None

    @classmethod
    def from_diag(cls, q_diag, disable_time_s=7200.0) -> "ProcessNoise":
        return cls(np.asarray(q_diag, dtype=np.float64), disable_time_s)

    @classmethod
    def from_velocity_km_s(cls, velocity_noise, over_s, disable_time_s=7200.0):
        """SNC from an expected velocity error accumulated over a duration
        (snc.rs:297): q_ii = (dv_i / T)^2."""
        v = np.asarray(velocity_noise, dtype=np.float64)
        return cls((v / over_s) ** 2, disable_time_s)

    def q_matrix(self, dt_s: float, nominal=None, elapsed_s: float = 0.0) -> np.ndarray:
        """9x9 integrated process noise Γ q Γᵀ over dt (snc.rs:210)."""
        q = np.zeros((STATE_DIM, STATE_DIM))
        if dt_s <= 0.0 or dt_s > self.disable_time_s:
            return q
        qd = self.q_diag_km2_s4.copy()
        if self.decay_tau_s is not None:
            qd = qd * np.exp(-elapsed_s / self.decay_tau_s)
        q3 = np.diag(qd)
        if self.local_frame is not None and nominal is not None:
            r, v = nominal.orbit.r_km, nominal.orbit.v_km_s
            dcm = np.asarray(
                ric_dcm(r, v) if self.local_frame.lower() == "ric" else vnc_dcm(r, v)
            )
            q3 = dcm.T @ q3 @ dcm
        q[0:3, 0:3] = q3 * dt_s**4 / 4.0
        q[0:3, 3:6] = q3 * dt_s**3 / 2.0
        q[3:6, 0:3] = q3 * dt_s**3 / 2.0
        q[3:6, 3:6] = q3 * dt_s**2
        return q


@dataclass
class KalmanFilter:
    """The sequential filter. Holds the previous estimate and the SNC models
    (od/kalman/mod.rs:38-60)."""

    prev_estimate: KfEstimate
    process_noise: Sequence[ProcessNoise] = ()
    variant: str = KalmanVariant.ReferenceUpdate

    def __post_init__(self):
        if isinstance(self.process_noise, ProcessNoise):
            self.process_noise = (self.process_noise,)
        # epoch at which SNC was first exercised, anchoring exponential decay
        # (snc.rs:50-51 init_epoch, set by the filter)
        self._snc_init_tai_s = None
        # Kalman gain of the most recent measurement update (None after a
        # rejection or before any update); collected into ODSolution.gains
        self.last_gain = None

    # ------------------------------------------------------------------
    def _snc_q(self, epoch_tai_s, dt_s, nominal) -> np.ndarray:
        q = np.zeros((STATE_DIM, STATE_DIM))
        # latest SNC whose start epoch has passed wins (snc.rs switchover)
        active = None
        for snc in self.process_noise:
            if (
                snc.start_epoch_tai_s is None
                or snc.start_epoch_tai_s <= epoch_tai_s
            ):
                active = snc
        if active is not None:
            if self._snc_init_tai_s is None:
                self._snc_init_tai_s = epoch_tai_s
            anchor = (
                active.start_epoch_tai_s
                if active.start_epoch_tai_s is not None
                else self._snc_init_tai_s
            )
            q = active.q_matrix(
                dt_s, nominal, elapsed_s=max(0.0, epoch_tai_s - anchor)
            )
        return q

    def time_update(self, nominal, stm, dt_s: float) -> KfEstimate:
        """Covariance mapping: P̄ = Φ P Φᵀ + Q (filtering.rs:59-99)."""
        prev = self.prev_estimate
        covar_bar = stm @ prev.covar @ stm.T + self._snc_q(
            nominal.epoch.to_tai_seconds(), dt_s, nominal
        )
        state_bar = stm @ prev.state_deviation
        est = KfEstimate(
            nominal=nominal,
            state_deviation=state_bar,
            covar=covar_bar,
            covar_bar=covar_bar.copy(),
            stm=stm,
            predicted=True,
        )
        self.prev_estimate = est
        return est

    def measurement_update(
        self,
        nominal,
        real_obs: np.ndarray,
        computed_obs: np.ndarray,
        r_matrix: np.ndarray,
        h_tilde: np.ndarray,
        stm: np.ndarray,
        dt_s: float,
        resid_rejection_sigmas: Optional[float] = 3.0,
        tracker: str = "",
        msr_types: tuple = (),
    ):
        """(estimate, residual). Implements filtering.rs:104-316."""
        prev = self.prev_estimate
        epoch = nominal.epoch
        covar_bar = stm @ prev.covar @ stm.T + self._snc_q(
            epoch.to_tai_seconds(), dt_s, nominal
        )
        state_bar = stm @ prev.state_deviation

        h = np.atleast_2d(h_tilde)
        m = h.shape[0]
        real = np.asarray(real_obs, dtype=np.float64)
        comp = np.asarray(computed_obs, dtype=np.float64)
        prefit = real - comp - h @ state_bar

        # innovation covariance, whitened-residual ratio (filtering.rs:165-202)
        s_mat = h @ covar_bar @ h.T + r_matrix
        try:
            l_chol = np.linalg.cholesky(s_mat)
            whitened = np.linalg.solve(l_chol, prefit)
        except np.linalg.LinAlgError:
            # singular S: fall back to R-only whitening (filtering.rs:165-172)
            whitened = prefit / np.sqrt(np.maximum(np.diag(r_matrix), 1e-32))
        ratio = float(np.linalg.norm(whitened) / np.sqrt(m))

        if (
            resid_rejection_sigmas is not None
            and ratio > resid_rejection_sigmas
        ):
            # rejected: time update only (filtering.rs:186-202)
            est = KfEstimate(
                nominal=nominal,
                state_deviation=state_bar,
                covar=covar_bar,
                covar_bar=covar_bar.copy(),
                stm=stm,
                predicted=True,
            )
            self.prev_estimate = est
            self.last_gain = None  # no gain applied on rejection
            resid = Residual(
                epoch, tracker, msr_types, prefit, prefit.copy(), ratio, True,
                real_obs=real.copy(), computed_obs=comp.copy(),
            )
            return est, resid

        # gain via Cholesky solve: K = P̄ Hᵀ S⁻¹ (filtering.rs:229-249)
        try:
            # solve S Kᵀ = H P̄ᵀ (S symmetric PD), LU/pinv fallback
            k_gain = np.linalg.solve(s_mat, h @ covar_bar.T).T
        except np.linalg.LinAlgError:
            k_gain = covar_bar @ h.T @ np.linalg.pinv(s_mat)

        state_hat = state_bar + k_gain @ prefit
        postfit = real - comp - h @ state_hat

        # Joseph-form covariance + symmetrization (filtering.rs:290-297)
        ikh = np.eye(STATE_DIM) - k_gain @ h
        covar = ikh @ covar_bar @ ikh.T + k_gain @ r_matrix @ k_gain.T
        covar = 0.5 * (covar + covar.T)

        est = KfEstimate(
            nominal=nominal,
            state_deviation=state_hat,
            covar=covar,
            covar_bar=covar_bar,
            stm=stm,
            predicted=False,
        )
        if self.variant == KalmanVariant.ReferenceUpdate:
            # EKF: fold the deviation into the reference (process/mod.rs:367)
            est.nominal = est.state()
            est.state_deviation = np.zeros(STATE_DIM)
        self.prev_estimate = est
        self.last_gain = k_gain.copy()  # exposed for ODSolution.gains
        resid = Residual(
            epoch, tracker, msr_types, prefit, postfit, ratio, False,
            real_obs=real.copy(), computed_obs=comp.copy(),
        )
        return est, resid


#: reference alias (od/snc.rs ProcessNoise3D = 3-axis accel SNC)
ProcessNoise3D = ProcessNoise
