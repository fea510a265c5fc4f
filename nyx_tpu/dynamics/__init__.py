from .orbital import OrbitalDynamics, PointMasses
from .gravity import Harmonics
from .spacecraft_dyn import SpacecraftDynamics
from .drag import Drag, AtmDensity
from .srp import SolarPressure
from .guidance import (
    GuidanceLaw,
    ImpulsiveManeuver,
    LocalFrame,
    Maneuver,
    ManeuverSequence,
    Ruggiero,
)

__all__ = [
    "OrbitalDynamics",
    "PointMasses",
    "Harmonics",
    "SpacecraftDynamics",
    "Drag",
    "AtmDensity",
    "SolarPressure",
    "GuidanceLaw",
    "ImpulsiveManeuver",
    "LocalFrame",
    "Maneuver",
    "ManeuverSequence",
    "Ruggiero",
]
