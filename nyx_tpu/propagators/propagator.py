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

    @classmethod
    def from_method(cls, dynamics, method: str, opts=None) -> "Propagator":
        """Method by name ('rk89', 'dp78', 'dp45', 'ck45', 'rk4', 'verner56'),
        the IntegratorMethod dispatch of rk_methods/mod.rs:65-79."""
        table = {
            "rk89": IntegratorMethod.RK89,
            "dp78": IntegratorMethod.DormandPrince78,
            "dormandprince78": IntegratorMethod.DormandPrince78,
            "dp45": IntegratorMethod.DormandPrince45,
            "dormandprince45": IntegratorMethod.DormandPrince45,
            "ck45": IntegratorMethod.CashKarp45,
            "cashkarp45": IntegratorMethod.CashKarp45,
            "rk4": IntegratorMethod.RK4Fixed,
            "verner56": IntegratorMethod.Verner56,
        }
        return cls(dynamics, table[method.lower()], opts)

    def with_guidance(self, law) -> "Propagator":
        """A copy whose dynamics run the given guidance law."""
        return Propagator(
            self.dynamics.with_guidance_law(law), self.method, self.opts
        )

    def with_state(self, state, almanac=None):
        from .instance import PropInstance

        return PropInstance(self, state, almanac)

    # The reference calls this `with`; that's reserved in Python.
    def with_(self, state, almanac=None):
        return self.with_state(state, almanac)
