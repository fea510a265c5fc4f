"""Measurement noise models.

Counterparts of the reference's `od/noise/` stack: `StochasticNoise`
(white + Gauss-Markov bias, od/noise/mod.rs:68-130), `GaussMarkov`
first-order process (gauss_markov.rs:52) and `WhiteNoise`
(white.rs:37-80), with the DSN default magnitudes. Sampling is host-side
numpy with a caller-provided `numpy.random.Generator` so tracking-arc
simulation stays deterministic under a single seed; the *variances* are
plain floats used device-side in the filter's R matrix.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass(frozen=True)
class WhiteNoise:
    """Zero-mean white noise of constant sigma (white.rs:37-80)."""

    sigma: float

    def covariance(self) -> float:
        return self.sigma**2

    def sample(self, rng: np.random.Generator) -> float:
        return rng.normal(0.0, self.sigma)


@dataclass
class GaussMarkov:
    """First-order Gauss-Markov bias process (gauss_markov.rs:52).

    dx = -x/tau dt + sqrt(q) dw with steady-state sigma `process_noise`.
    Discrete exact update over dt: x' = e^(-dt/tau) x + N(0, s^2 (1-e^(-2dt/tau))).
    """

    tau_s: float
    process_noise: float

    def covariance(self) -> float:
        return self.process_noise**2

    def init_sample(self, rng: np.random.Generator) -> float:
        return rng.normal(0.0, self.process_noise)

    def advance(self, bias: float, dt_s: float, rng: np.random.Generator) -> float:
        if dt_s <= 0.0:
            return bias
        phi = np.exp(-dt_s / self.tau_s)
        s = self.process_noise * np.sqrt(max(0.0, 1.0 - phi * phi))
        return phi * bias + rng.normal(0.0, s)


@dataclass
class StochasticNoise:
    """White noise + optional Gauss-Markov bias (od/noise/mod.rs:68-130)."""

    white_noise: Optional[WhiteNoise] = None
    bias: Optional[GaussMarkov] = None

    ZERO: "StochasticNoise" = None  # set below

    @classmethod
    def default_range_km(cls) -> "StochasticNoise":
        # DSN defaults: 2 m white, 5 km/12.5 d GM bias (od/noise/mod.rs:79-90)
        return cls(
            white_noise=WhiteNoise(2.0e-3),
            bias=GaussMarkov(tau_s=12.5 * 86400.0, process_noise=5.0),
        )

    @classmethod
    def default_doppler_km_s(cls) -> "StochasticNoise":
        # 3 mm/s white, 50 m/s GM (od/noise/mod.rs:92-103)
        return cls(
            white_noise=WhiteNoise(3.0e-6),
            bias=GaussMarkov(tau_s=12.5 * 86400.0, process_noise=50.0e-3),
        )

    @classmethod
    def default_angle_deg(cls) -> "StochasticNoise":
        return cls(white_noise=WhiteNoise(1.0e-2))

    @classmethod
    def zero(cls) -> "StochasticNoise":
        """A perfect (noiseless) measurement — the reference test pattern
        (tests/orbit_determination/two_body.rs:31-70)."""
        return cls(white_noise=WhiteNoise(0.0))

    def covariance(self) -> float:
        """Total variance used in the filter's R (white + bias steady state)."""
        c = 0.0
        if self.white_noise is not None:
            c += self.white_noise.covariance()
        if self.bias is not None:
            c += self.bias.covariance()
        return max(c, 1e-32)


StochasticNoise.ZERO = StochasticNoise(white_noise=WhiteNoise(0.0))


class NoiseState:
    """Per-device running bias states for measurement simulation."""

    def __init__(self, noises: dict, rng: np.random.Generator):
        self.noises = noises
        self.bias = {}
        self.last_epoch_s = {}
        for mtype, n in noises.items():
            if n is not None and n.bias is not None:
                self.bias[mtype] = n.bias.init_sample(rng)
                self.last_epoch_s[mtype] = None

    def sample(self, mtype: str, t_s: float, rng: np.random.Generator) -> float:
        n = self.noises.get(mtype)
        if n is None:
            return 0.0
        out = 0.0
        if n.white_noise is not None:
            out += n.white_noise.sample(rng)
        if n.bias is not None:
            prev_t = self.last_epoch_s.get(mtype)
            dt = 0.0 if prev_t is None else t_s - prev_t
            self.bias[mtype] = n.bias.advance(self.bias[mtype], dt, rng)
            self.last_epoch_s[mtype] = t_s
            out += self.bias[mtype]
        return out
