"""GNSS/GPS position pseudo-measurement device — premium parity.

Counterpart of the reference's `PositionDevice` (od/position/mod.rs:14,
trk_device.rs:17, sensitivity.rs:81): a post-filtered navigation solution
provides direct X/Y/Z position observations of the estimated spacecraft.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .msr import MeasurementType
from .noise import StochasticNoise, WhiteNoise


@dataclass
class PositionDevice:
    """Always-visible X/Y/Z position device (od/position/mod.rs:14-42)."""

    name: str = "gnss"
    sigma_km: float = 1e-3  # 1 m per axis by default
    measurement_types: Tuple[str, ...] = (
        MeasurementType.X_KM,
        MeasurementType.Y_KM,
        MeasurementType.Z_KM,
    )
    integration_time_s: Optional[float] = None
    elevation_mask_deg: float = -90.0  # never gated
    stochastic_noises: Dict[str, StochasticNoise] = field(default_factory=dict)
    frame: object = None

    def __post_init__(self):
        if not self.stochastic_noises:
            self.stochastic_noises = {
                t: StochasticNoise(WhiteNoise(self.sigma_km))
                for t in self.measurement_types
            }

    def _values(self, t_tdb, rv6, types):
        table = {
            MeasurementType.X_KM: rv6[0],
            MeasurementType.Y_KM: rv6[1],
            MeasurementType.Z_KM: rv6[2],
        }
        return jnp.stack([table[t] for t in types])

    def azimuth_elevation_range(self, t_tdb, rv6):
        return (
            jnp.float64(0.0),
            jnp.float64(90.0),
            jnp.linalg.norm(rv6[0:3]),
            jnp.float64(0.0),
        )

    def measurement_fn(self, types=None):
        types = tuple(types or self.measurement_types)
        return lambda t, rv6: self._values(t, rv6, types)

    def batch_values(self, ts_tdb_s, ys6, types=None):
        types = tuple(types or self.measurement_types)
        ys6 = np.asarray(ys6)
        cols = {
            MeasurementType.X_KM: ys6[:, 0],
            MeasurementType.Y_KM: ys6[:, 1],
            MeasurementType.Z_KM: ys6[:, 2],
        }
        vals = np.stack([cols[t] for t in types], axis=-1)
        return vals, np.full(len(ys6), 90.0)

    def measurement_covar(self, types=None) -> np.ndarray:
        types = tuple(types or self.measurement_types)
        return np.diag([self.stochastic_noises[t].covariance() for t in types])
