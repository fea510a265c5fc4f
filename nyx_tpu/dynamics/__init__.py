from .orbital import OrbitalDynamics, PointMasses
from .gravity import Harmonics
from .spacecraft_dyn import SpacecraftDynamics
from .drag import Drag, AtmDensity
from .srp import SolarPressure
from .solid_tides import SolidTides, TidalPerturber
from .sequence import (
    DiscreteEvent,
    DynamicsConfig,
    Phase,
    PhysicalProperties,
    PropagatorConfig,
    SpacecraftSequence,
)
from .guidance import (
    GuidanceLaw,
    Kluever,
    ImpulsiveManeuver,
    LocalFrame,
    Maneuver,
    ManeuverSequence,
    Ruggiero,
    ThrustDirectionReplay,
)

__all__ = [
    "OrbitalDynamics",
    "PointMasses",
    "Harmonics",
    "SpacecraftDynamics",
    "Drag",
    "AtmDensity",
    "SolarPressure",
    "SolidTides",
    "TidalPerturber",
    "DiscreteEvent",
    "DynamicsConfig",
    "Phase",
    "PhysicalProperties",
    "PropagatorConfig",
    "SpacecraftSequence",
    "GuidanceLaw",
    "Kluever",
    "ImpulsiveManeuver",
    "LocalFrame",
    "Maneuver",
    "ManeuverSequence",
    "Ruggiero",
    "ThrustDirectionReplay",
]
