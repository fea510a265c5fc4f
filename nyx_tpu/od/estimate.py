"""Filter estimates, residuals, and initial-uncertainty builders.

Counterparts of the reference's `KfEstimate` (od/estimate/kfestimate.rs:
41-191), `Residual` (residual.rs:28-182) and `SpacecraftUncertainty`
(sc_uncertainty.rs:42-141).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

import numpy as np

from ..cosmic.orbit import ric_dcm, vnc_dcm
from ..cosmic.spacecraft import Spacecraft
from ..time import Epoch

STATE_DIM = 9


@dataclass
class KfEstimate:
    """nominal state + deviation + covariances (kfestimate.rs:41-65)."""

    nominal: Spacecraft
    state_deviation: np.ndarray  # [9]
    covar: np.ndarray  # [9, 9]
    covar_bar: np.ndarray  # [9, 9] pre-update
    stm: np.ndarray  # [9, 9] Phi since previous estimate
    predicted: bool = False

    @classmethod
    def from_covar(cls, nominal: Spacecraft, covar: np.ndarray) -> "KfEstimate":
        covar = np.asarray(covar, dtype=np.float64)
        return cls(
            nominal=nominal,
            state_deviation=np.zeros(STATE_DIM),
            covar=covar.copy(),
            covar_bar=covar.copy(),
            stm=np.eye(STATE_DIM),
            predicted=False,
        )

    @classmethod
    def from_diag(cls, nominal: Spacecraft, diag) -> "KfEstimate":
        return cls.from_covar(nominal, np.diag(np.asarray(diag, dtype=np.float64)))

    @property
    def epoch(self) -> Epoch:
        return self.nominal.epoch

    def state(self) -> Spacecraft:
        """Best estimate = nominal + deviation (kfestimate.rs:118-130)."""
        vec = self.nominal.to_vector() + self.state_deviation
        return self.nominal.set_vector(self.nominal.epoch, vec)

    def sigma_for(self, index: int) -> float:
        return float(np.sqrt(self.covar[index, index]))

    def within_sigma(self, truth: Spacecraft, num_sigmas: float) -> bool:
        err = truth.to_vector() - self.state().to_vector()
        sig = np.sqrt(np.diag(self.covar))
        return bool(np.all(np.abs(err[:6]) <= num_sigmas * sig[:6]))

    def deviation_within_sigma(self, num_sigmas: float) -> bool:
        """The reference's Estimate::within_sigma (estimate/mod.rs:75-85):
        is the filter's own state deviation inside N-sigma of its
        covariance (no truth needed)."""
        sig = np.sqrt(np.diag(self.covar))
        return bool(np.all(np.abs(self.state_deviation) <= num_sigmas * sig))

    def within_3sigma(self) -> bool:
        return self.deviation_within_sigma(3.0)

    def keplerian_covar(self) -> np.ndarray:
        """6x6 covariance of (SMA km, ECC, INC deg, RAAN deg, AOP deg,
        TA deg), i.e. the Cartesian covariance rotated through the AD
        Jacobian of the osculating-element map (kfestimate.rs:190-225;
        `jax.jacfwd` replaces the reference's hyperdual OrbitDual)."""
        import jax
        import jax.numpy as jnp

        from ..cosmic.orbit import keplerian_from_cartesian

        mu = self.nominal.orbit.frame.mu_km3_s2

        def elems(rv6):
            k = keplerian_from_cartesian(rv6[0:3], rv6[3:6], mu)
            return jnp.stack(
                [
                    k["sma"],
                    k["ecc"],
                    jnp.rad2deg(k["inc"]),
                    jnp.rad2deg(k["raan"]),
                    jnp.rad2deg(k["aop"]),
                    jnp.rad2deg(k["ta"]),
                ]
            )

        rv6 = jnp.asarray(self.nominal.to_vector()[:6])
        jac = np.asarray(jax.jacfwd(elems)(rv6))
        return jac @ self.covar[0:6, 0:6] @ jac.T

    def covar_in_frame(self, local_frame: str) -> np.ndarray:
        """6x6 position/velocity covariance rotated into RIC or VNC."""
        r = self.nominal.orbit.r_km
        v = self.nominal.orbit.v_km_s
        dcm3 = np.asarray(ric_dcm(r, v) if local_frame.lower() == "ric" else vnc_dcm(r, v))
        dcm6 = np.zeros((6, 6))
        dcm6[0:3, 0:3] = dcm3
        dcm6[3:6, 3:6] = dcm3
        return dcm6 @ self.covar[0:6, 0:6] @ dcm6.T

    def __str__(self):
        sig = np.sqrt(np.diag(self.covar))
        return (
            f"Estimate at {self.epoch} ({'predicted' if self.predicted else 'updated'}), "
            f"sigmas pos {sig[0]:.3e},{sig[1]:.3e},{sig[2]:.3e} km"
        )


@dataclass
class Residual:
    """Pre/post-fit residuals and the rejection ratio (residual.rs:28-90)."""

    epoch: Epoch
    tracker: str
    msr_types: tuple
    prefit: np.ndarray
    postfit: np.ndarray
    ratio: float
    rejected: bool
    # raw observed / computed observations (residual.rs real_obs/computed_obs);
    # kept so the smoother can recompute postfits at the smoothed state
    real_obs: "np.ndarray | None" = None
    computed_obs: "np.ndarray | None" = None

    def __str__(self):
        tag = "REJECTED " if self.rejected else ""
        return (
            f"{tag}residual at {self.epoch} [{self.tracker}]: prefit "
            f"{self.prefit}, ratio {self.ratio:.3f}"
        )


@dataclass
class SpacecraftUncertainty:
    """Initial estimate builder from local-frame sigmas
    (od/estimate/sc_uncertainty.rs:42-141)."""

    nominal: Spacecraft
    frame: str = "ric"  # 'ric', 'vnc' or 'inertial'
    x_km: float = 0.0
    y_km: float = 0.0
    z_km: float = 0.0
    vx_km_s: float = 0.0
    vy_km_s: float = 0.0
    vz_km_s: float = 0.0
    cr: float = 0.0
    cd: float = 0.0
    prop_mass_kg: float = 0.0

    def to_estimate(self) -> KfEstimate:
        sig_pos = np.array([self.x_km, self.y_km, self.z_km])
        sig_vel = np.array([self.vx_km_s, self.vy_km_s, self.vz_km_s])
        p6 = np.diag(np.concatenate([sig_pos, sig_vel]) ** 2)
        if self.frame.lower() in ("ric", "vnc"):
            # the local DCM in HOST numpy, not device jax: with isotropic
            # sigmas the rotated covariance is rotationally degenerate,
            # and a 1e-16 platform difference (TPU-emulated f64 vs CPU)
            # in the matrix swings multivariate_normal's factorization to
            # a DIFFERENT (equally valid) draw — CPU and TPU runs of the
            # same seeded example then disperse to different states.
            # Host numpy makes to_estimate_randomized platform-exact.
            r = np.asarray(self.nominal.orbit.r_km, dtype=np.float64)
            v = np.asarray(self.nominal.orbit.v_km_s, dtype=np.float64)
            if self.frame.lower() == "ric":
                rhat = r / np.linalg.norm(r)
                h = np.cross(r, v)
                chat = h / np.linalg.norm(h)
                dcm3 = np.stack([rhat, np.cross(chat, rhat), chat])
            else:
                vhat = v / np.linalg.norm(v)
                h = np.cross(r, v)
                nhat = h / np.linalg.norm(h)
                dcm3 = np.stack([vhat, nhat, np.cross(vhat, nhat)])
            dcm6 = np.zeros((6, 6))
            dcm6[0:3, 0:3] = dcm3
            dcm6[3:6, 3:6] = dcm3
            # sigmas defined in the local frame: P_inertial = Dᵀ P_local D
            p6 = dcm6.T @ p6 @ dcm6
        p = np.zeros((STATE_DIM, STATE_DIM))
        p[0:6, 0:6] = p6
        p[6, 6] = self.cr**2
        p[7, 7] = self.cd**2
        p[8, 8] = self.prop_mass_kg**2
        return KfEstimate.from_covar(self.nominal, p)

    def to_estimate_randomized(self, rng: np.random.Generator):
        """(estimate, dispersed truth): nominal shifted by a draw from the
        uncertainty, for self-consistent OD tests (sc_uncertainty.rs:141).

        The draw is L z with L the Cholesky factor of the non-degenerate
        covariance block — NOT rng.multivariate_normal, whose internal SVD
        is discontinuous on (rotationally) degenerate covariances: with
        isotropic sigmas a 1e-16 platform difference in the rotated matrix
        produced a completely different — though equally valid — draw, so
        CPU and TPU runs of the same seeded example dispersed to different
        states (round-5 ex05 finding: 911 m vs 14.3 km pure-prop error,
        both correct for their own draw). Cholesky is continuous in the
        matrix, so the draw is platform-stable."""
        est = self.to_estimate()
        p = np.asarray(est.covar)
        mask = np.diag(p) > 0.0
        l_f = np.zeros_like(p)
        if mask.any():
            l_f[np.ix_(mask, mask)] = np.linalg.cholesky(
                p[np.ix_(mask, mask)]
            )
        draw = l_f @ rng.standard_normal(STATE_DIM)
        truth_vec = self.nominal.to_vector() + draw
        truth = self.nominal.set_vector(self.nominal.epoch, truth_vec)
        return est, truth
