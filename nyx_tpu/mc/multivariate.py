"""Multivariate-normal spacecraft sampling in arbitrary parameter spaces.

Counterpart of the reference's `MvnSpacecraft` (mc/multivariate.rs:61-206):
dispersions specified on any StateParameters (orbital elements, Cr/Cd/mass)
are mapped into the 9-dim Cartesian state space through the Jacobian of the
parameter set wrt the state (JAX AD instead of hyperdual duals), the
covariance is rotated with the pseudo-inverse, and samples are drawn with an
SVD square root (sqrt(S) V^T), exactly the reference's scheme.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmic.spacecraft import Spacecraft
from ..md import param as param_mod
from .dispersion import StateDispersion


class MvnSpacecraft:
    def __init__(self, template: Spacecraft, dispersions: Sequence[StateDispersion]):
        self.template = template
        self.dispersions = list(dispersions)
        frame = template.frame
        self.mu = frame.mu
        self.radius_km = frame.radius_km or 0.0
        self._nominal = template.to_vector()

        params = [d.parameter for d in self.dispersions]
        nominal = jnp.asarray(self._nominal)

        def param_vec(y):
            return jnp.stack(
                [param_mod.value(p, y, self.mu, self.radius_km) for p in params]
            )

        # Jacobian dP/dX at the nominal state [n_params, 9] (on host CPU:
        # tiny shapes, and TPU scalar transcendentals are low-precision)
        with jax.default_device(jax.devices("cpu")[0]):
            jac = np.asarray(jax.jacfwd(param_vec)(nominal))
        # Cartesian covariance: pinv(J) diag(sigma^2) pinv(J)^T
        # (multivariate.rs:80-206 pseudo_inverse! + covar rotation)
        sigmas = np.array([d.std_dev for d in self.dispersions])
        means = np.array([d.mean for d in self.dispersions])
        jinv = np.linalg.pinv(jac)
        self.covar = jinv @ np.diag(sigmas**2) @ jinv.T  # [9, 9]
        self.mean_shift = jinv @ means

        # SVD square root for sampling
        u, s, _vt = np.linalg.svd(self.covar, hermitian=True)
        self.sqrt_covar = u @ np.diag(np.sqrt(np.maximum(s, 0.0)))

    @classmethod
    def new(cls, template, dispersions) -> "MvnSpacecraft":
        return cls(template, dispersions)

    @classmethod
    def from_covariance(cls, template: Spacecraft, covar: np.ndarray) -> "MvnSpacecraft":
        self = object.__new__(cls)
        self.template = template
        self.dispersions = []
        frame = template.frame
        self.mu = frame.mu
        self.radius_km = frame.radius_km or 0.0
        self._nominal = template.to_vector()
        c9 = np.zeros((9, 9))
        n = covar.shape[0]
        c9[:n, :n] = covar
        self.covar = c9
        self.mean_shift = np.zeros(9)
        u, s, _ = np.linalg.svd(c9, hermitian=True)
        self.sqrt_covar = u @ np.diag(np.sqrt(np.maximum(s, 0.0)))
        return self

    def sample(self, key, n: int) -> jnp.ndarray:
        """Draw n dispersed state vectors [n, 9] (device array)."""
        z = jax.random.normal(key, (n, 9), dtype=jnp.float64)
        return (
            jnp.asarray(self._nominal + self.mean_shift)
            + z @ jnp.asarray(self.sqrt_covar).T
        )
