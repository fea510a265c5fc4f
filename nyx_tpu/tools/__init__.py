"""Tools: Lambert solvers and math helpers (counterpart of
nyx-core/src/tools/)."""

from .porkchop import Porkchop, porkchop, porkchop_grid
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
    "Porkchop",
    "porkchop",
    "porkchop_grid",
]
