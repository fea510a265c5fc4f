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


# ---------------------------------------------------------------------------
# Link-budget-derived noise (od/noise/link_specific.rs:40-225)
# ---------------------------------------------------------------------------
class SN0:
    """Signal-power-to-noise-density ratio, returned in Hz (not dB-Hz)."""

    Strong = 10.0 ** 6.5  # 65 dB-Hz
    Average = 10.0 ** 5  # 50 dB-Hz
    Poor = 10.0 ** 4  # 40 dB-Hz

    @staticmethod
    def from_db_hz(db: float) -> float:
        return 10.0 ** (db / 10.0)


class CN0:
    """Carrier-power-to-noise-density ratio, in Hz."""

    Strong = 10.0 ** 7  # 70 dB-Hz
    Average = 10.0 ** 5.5  # 55 dB-Hz
    Poor = 10.0 ** 4.5  # 45 dB-Hz

    @staticmethod
    def from_db_hz(db: float) -> float:
        return 10.0 ** (db / 10.0)


class CarrierFreq:
    """Typical carrier frequencies, Hz (link_specific.rs:122-131)."""

    SBand = 2.2e9
    XBand = 8.4e9
    KaBand = 32e9


class ChipRate:
    """Typical ranging chip rates, chip/s (link_specific.rs:137-168)."""

    Lowest = 1e3
    Low = 1e5
    StandardT4B = 1e6
    High = 1e7
    VeryHigh = 2.5e7


_SPEED_OF_LIGHT_KM_S = 299_792.458
_TAU = 2.0 * np.pi


def _white_from_pr_n0(pr_n0: float, bandwidth_hz: float) -> WhiteNoise:
    """sigma = c / (2 B sqrt(Pr/N0)), km (white.rs:80-86)."""
    return WhiteNoise(_SPEED_OF_LIGHT_KM_S / (2.0 * bandwidth_hz * np.sqrt(pr_n0)))


WhiteNoise.from_pr_n0 = staticmethod(_white_from_pr_n0)


def _from_hardware_range_km(allan_deviation, integration_time_s, chip_rate=ChipRate.StandardT4B,
                            s_n0=SN0.Average) -> "StochasticNoise":
    """High-precision range noise: clock (Allan deviation) + thermal
    (chip rate, S/N0) RSS (link_specific.rs:179-199). Excludes atmosphere
    (~10 cm one-sigma extra)."""
    sigma_thermal = _SPEED_OF_LIGHT_KM_S / (_TAU * chip_rate * np.sqrt(2.0 * s_n0))
    sigma_clock = _SPEED_OF_LIGHT_KM_S * allan_deviation * integration_time_s / np.sqrt(3.0)
    return StochasticNoise(
        white_noise=WhiteNoise(float(np.hypot(sigma_clock, sigma_thermal)))
    )


def _from_hardware_doppler_km_s(allan_deviation, integration_time_s,
                                carrier=CarrierFreq.XBand, c_n0=CN0.Average) -> "StochasticNoise":
    """(link_specific.rs:201-225)."""
    sigma_thermal = _SPEED_OF_LIGHT_KM_S / (
        _TAU * carrier * np.sqrt(2.0 * c_n0 * integration_time_s)
    )
    sigma_clock = _SPEED_OF_LIGHT_KM_S * allan_deviation
    return StochasticNoise(
        white_noise=WhiteNoise(float(np.hypot(sigma_clock, sigma_thermal)))
    )


StochasticNoise.from_hardware_range_km = staticmethod(_from_hardware_range_km)
StochasticNoise.from_hardware_doppler_km_s = staticmethod(_from_hardware_doppler_km_s)
