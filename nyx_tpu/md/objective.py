"""Objective: a desired value of a StateParameter with tolerance.

Counterpart of the reference's `Objective` (md/objective.rs:27-75); used by
the targeter, multiple shooting and the Ruggiero/Kluever guidance laws.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import param as param_mod


@dataclass(frozen=True)
class Objective:
    parameter: str
    desired_value: float
    tolerance: float = 0.1
    # multiplicative/additive factors as the reference (objective.rs:40-46)
    multiplicative_factor: float = 1.0
    additive_factor: float = 0.0

    @classmethod
    def within_tolerance(cls, parameter, desired, tolerance) -> "Objective":
        return cls(parameter, desired, tolerance)

    def assess_raw(self, achieved: float):
        """(ok, error) with the reference's factor convention."""
        err = self.desired_value - (
            self.multiplicative_factor * achieved + self.additive_factor
        )
        if self.parameter in param_mod.StateParameter.ANGLES_DEG:
            err = (err + 180.0) % 360.0 - 180.0
        return abs(err) <= self.tolerance, err

    def assess(self, y, mu, radius_km=0.0):
        import numpy as np

        achieved = float(param_mod.value(self.parameter, y, mu, radius_km))
        return self.assess_raw(achieved)
