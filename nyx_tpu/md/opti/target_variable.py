"""Correction variables for the differential corrector.

Counterpart of the reference's `Variable`/`Vary`
(md/opti/target_variable.rs:28-208): which state component to vary, in
which local frame, with what finite-difference perturbation, initial guess
and min/max bounds.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional


class Vary:
    """Correction-variable tags (target_variable.rs:28-68)."""

    PositionX = "position_x"
    PositionY = "position_y"
    PositionZ = "position_z"
    VelocityX = "velocity_x"
    VelocityY = "velocity_y"
    VelocityZ = "velocity_z"

    POSITIONS = (PositionX, PositionY, PositionZ)
    VELOCITIES = (VelocityX, VelocityY, VelocityZ)

    #: flat 9-state slot each tag perturbs (in the local frame block)
    SLOT = {
        PositionX: 0, PositionY: 1, PositionZ: 2,
        VelocityX: 3, VelocityY: 4, VelocityZ: 5,
    }


@dataclass
class Variable:
    """One correction variable (target_variable.rs:28-120)."""

    component: str  # a Vary tag
    perturbation: float = 1e-4  # finite-difference step (km or km/s)
    init_guess: float = 0.0
    max_step: float = 0.5
    max_value: float = 10.0
    min_value: float = -10.0

    @classmethod
    def from_vary(cls, component: str, perturbation: Optional[float] = None):
        if perturbation is None:
            perturbation = (
                1e-4 if component in Vary.POSITIONS else 1e-6
            )
        return cls(component, perturbation)

    def with_initial_guess(self, guess: float) -> "Variable":
        from dataclasses import replace

        return replace(self, init_guess=guess)

    def with_max_step(self, step: float) -> "Variable":
        from dataclasses import replace

        return replace(self, max_step=step)

    def with_bounds(self, lo: float, hi: float) -> "Variable":
        from dataclasses import replace

        return replace(self, min_value=lo, max_value=hi)

    def apply_bounds(self, value: float) -> float:
        return min(max(value, self.min_value), self.max_value)

    def check_step(self, step: float) -> float:
        """Clamp one Newton step to max_step (target_variable.rs:192-208)."""
        return min(max(step, -self.max_step), self.max_step)

    @property
    def slot(self) -> int:
        return Vary.SLOT[self.component]

    def __str__(self):
        return f"Variable({self.component}, pert {self.perturbation})"
