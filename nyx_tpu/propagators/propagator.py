"""Host-facing Propagator API (mirrors nyx-core/src/propagators/propagator.rs).

Filled in alongside the dynamics layer; see integrator.py for the batched
kernel this wraps.
"""

from __future__ import annotations

from .tableaus import IntegratorMethod
from .options import IntegratorOptions


class Propagator:
    """Immutable propagator setup: dynamics + method + options."""

    def __init__(
        self,
        dynamics,
        method: IntegratorMethod = IntegratorMethod.RK89,
        opts: IntegratorOptions = None,
    ):
        self.dynamics = dynamics
        self.method = method
        self.opts = opts or IntegratorOptions()

    @classmethod
    def rk89(cls, dynamics, opts=None) -> "Propagator":
        return cls(dynamics, IntegratorMethod.RK89, opts)

    @classmethod
    def dp78(cls, dynamics, opts=None) -> "Propagator":
        return cls(dynamics, IntegratorMethod.DormandPrince78, opts)

    @classmethod
    def default(cls, dynamics) -> "Propagator":
        return cls(dynamics)

    def with_state(self, state, almanac=None):
        from .instance import PropInstance

        return PropInstance(self, state, almanac)

    # The reference calls this `with`; that's reserved in Python.
    def with_(self, state, almanac=None):
        return self.with_state(state, almanac)
