"""Structured per-layer exception taxonomy.

Counterpart of the reference's error enums: `NyxError`/`StateError`
(errors.rs:30-100), `PropagationError` (propagators/mod.rs:69),
`DynamicsError` (dynamics/mod.rs), `TrajError` (md/trajectory/mod.rs:40),
`TargetingError` (md/opti), `ODError` (od/mod.rs:120-182),
`ConfigError`/`InputOutputError` (io/mod.rs:126-160) and the MC variant of
NyxError. Python re-design: one exception class per layer, each also
subclassing the builtin (`ValueError`/`RuntimeError`/`OSError`) that the
round-1 code raised, so `except ValueError` call sites keep working while
`except NyxError` now catches everything framework-originated.
"""

from __future__ import annotations

__all__ = [
    "NyxError",
    "StateError",
    "ConfigError",
    "InputOutputError",
    "EphemerisError",
    "DynamicsError",
    "GuidanceConfigError",
    "PropagationError",
    "TrajError",
    "EventError",
    "TargetingError",
    "ODError",
    "MeasurementSimError",
    "MonteCarloError",
    "LambertError",
]


class NyxError(Exception):
    """Base class for every framework-originated error (errors.rs:30)."""


class StateError(NyxError, ValueError):
    """Invalid state/parameter access (errors.rs StateError: 'param is
    unavailable in this context', read-only parameters, ...)."""


class ConfigError(NyxError, ValueError):
    """Invalid or inconsistent configuration (io/mod.rs ConfigError)."""


class InputOutputError(NyxError, OSError):
    """File parsing / serialization failures (io/mod.rs
    InputOutputError)."""


class EphemerisError(NyxError, ValueError):
    """Almanac/SPK/BPC lookup or parsing failures (the reference defers
    these to ANISE's AlmanacError)."""


class DynamicsError(NyxError, ValueError):
    """Force-model composition/evaluation errors (dynamics/mod.rs)."""


class GuidanceConfigError(ConfigError):
    """Guidance law configuration errors (errors.rs GuidanceConfigError)."""


class PropagationError(NyxError, RuntimeError):
    """Integrator failures: NaN states, min-step underflow, unreached
    stop conditions (propagators/mod.rs PropagationError)."""


class TrajError(NyxError, ValueError):
    """Trajectory storage/interpolation errors: out-of-bounds epoch,
    empty trajectory, capture overflow (md/trajectory/mod.rs TrajError)."""


class EventError(TrajError):
    """Event search failures: event never found in the arc (md/events)."""


class TargetingError(NyxError, RuntimeError):
    """Differential-correction failures: singular Jacobian, max
    iterations (md/opti TargetingError)."""


class ODError(NyxError, RuntimeError):
    """Orbit-determination failures: too few measurements, singular
    gain/information matrix, filter divergence (od/mod.rs:120-182)."""


class MeasurementSimError(ODError):
    """Measurement simulation errors (od/mod.rs MeasurementSimError)."""


class MonteCarloError(NyxError, ValueError):
    """Monte Carlo setup/execution errors (errors.rs MonteCarlo)."""


class LambertError(NyxError, ValueError):
    """Lambert solver failures: 180-degree geometry, no multi-rev
    solution, iteration limit (errors.rs LambertError)."""
