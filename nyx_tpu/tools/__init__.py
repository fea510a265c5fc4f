"""Tools: Lambert solvers and math helpers (counterpart of
nyx-core/src/tools/)."""

from .lambert import (
    LambertInput,
    LambertSolution,
    TransferKind,
    gooding,
    izzo,
    lambert_izzo_rv,
)

__all__ = [
    "LambertInput",
    "LambertSolution",
    "TransferKind",
    "gooding",
    "izzo",
    "lambert_izzo_rv",
]
