"""Mission sequencing: a timeline of propagation phases with discrete events.

Counterpart of the reference's `SpacecraftSequence` (dynamics/sequence/
mod.rs:48-230), `Phase`/`PropagatorConfig`/`Dynamics` (config.rs:44-157)
and `DiscreteEvent` (discrete_event.rs:29-60). The reference serializes
sequences with Dhall; this build uses YAML (same tree shape) since the
configuration front-end is host-side only.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..cosmic.frames import Frame, Frames
from ..cosmic.spacecraft import GuidanceMode, Spacecraft, Thruster
from ..time import Epoch
from .drag import Drag
from .gravity import Harmonics
from .orbital import OrbitalDynamics, PointMasses
from .solid_tides import SolidTides
from .spacecraft_dyn import SpacecraftDynamics
from .srp import SolarPressure
from ..errors import ConfigError


@dataclass
class PhysicalProperties:
    """Mass/SRP/drag deltas applied by staging/docking
    (discrete_event.rs:44-60)."""

    dry_mass_kg: float = 0.0
    prop_mass_kg: float = 0.0
    srp_area_m2: float = 0.0
    drag_area_m2: float = 0.0


@dataclass
class DiscreteEvent:
    """One-shot state change applied on phase entry (discrete_event.rs:29-43).

    kind: 'staging' (decrements properties), 'docking' (increments),
    'frame_swap' (translates the state to a new central body).
    """

    kind: str
    impulsive_maneuver: Optional[object] = None  # ImpulsiveManeuver
    properties: Optional[PhysicalProperties] = None
    new_frame: Optional[Frame] = None

    def apply(self, state: Spacecraft, almanac=None) -> Spacecraft:
        if self.kind == "frame_swap":
            if self.new_frame is None:
                raise ConfigError("frame_swap needs new_frame")
            if self.new_frame.center == state.frame.center:
                return state.with_orbit(replace(state.orbit, frame=self.new_frame))
            if almanac is None:
                raise ConfigError("frame_swap across centers needs an almanac")
            return state.with_orbit(
                almanac.translate_to(state.orbit, self.new_frame)
            )
        if self.impulsive_maneuver is not None:
            state = self.impulsive_maneuver.apply(state)
        if self.properties is not None:
            sign = -1.0 if self.kind == "staging" else 1.0
            p = self.properties
            state = replace(
                state,
                dry_mass_kg=state.dry_mass_kg + sign * p.dry_mass_kg,
                prop_mass_kg=state.prop_mass_kg + sign * p.prop_mass_kg,
                srp_area_m2=state.srp_area_m2 + sign * p.srp_area_m2,
                drag_area_m2=state.drag_area_m2 + sign * p.drag_area_m2,
            )
        return state


@dataclass
class DynamicsConfig:
    """Declarative dynamics (config.rs Dynamics/AccelModels/ForceModels)."""

    frame: Frame = Frames.EME2000
    point_masses: Tuple[int, ...] = ()
    gravity_field: Optional[dict] = None  # {path, degree, order, frame}
    solid_tides: bool = False
    solar_pressure: bool = False
    drag: Optional[str] = None  # 'exp' | 'constant'

    def build(self, almanac=None) -> SpacecraftDynamics:
        models = []
        if self.point_masses:
            models.append(PointMasses(self.point_masses))
        if self.gravity_field:
            from ..io.gravity import GravityFieldData

            g = self.gravity_field
            stor = GravityFieldData.from_cof(
                g["path"], g.get("degree", 8), g.get("order", 8), True,
                g.get("frame", Frames.IAU_EARTH),
            )
            models.append(Harmonics.from_stor(stor))
        if self.solid_tides:
            models.append(SolidTides.earth_moon_system())
        orbital = OrbitalDynamics.from_models(models, self.frame)
        forces = []
        if self.solar_pressure:
            forces.append(SolarPressure.default())
        if self.drag:
            forces.append(Drag.earth_exp())
        return SpacecraftDynamics.from_models(orbital, forces)


@dataclass
class PropagatorConfig:
    """Dynamics + integrator method + options (config.rs:102-133)."""

    dynamics: DynamicsConfig
    method: str = "rk89"
    options: Optional[object] = None  # IntegratorOptions

    def build(self, almanac=None):
        from ..propagators import IntegratorOptions, Propagator

        dyn = self.dynamics.build(almanac)
        opts = self.options or IntegratorOptions()
        return Propagator.from_method(dyn, self.method, opts)


@dataclass
class Phase:
    """Timeline entry (config.rs:44-55)."""

    name: str = ""
    propagator: str = ""
    guidance: Optional[dict] = None  # {'law': GuidanceLaw, 'thruster_model': str}
    on_entry: Optional[DiscreteEvent] = None
    disabled: bool = False
    terminate: bool = False

    @classmethod
    def Terminate(cls) -> "Phase":
        return cls(terminate=True)

    @classmethod
    def Activity(cls, name, propagator, guidance=None, on_entry=None,
                 disabled=False) -> "Phase":
        return cls(name, propagator, guidance, on_entry, disabled)


@dataclass
class SpacecraftSequence:
    """Timeline of phases (sequence/mod.rs:48-120)."""

    seq: Dict[Epoch, Phase]
    thruster_sets: Dict[str, Thruster] = field(default_factory=dict)
    propagators: Dict[str, PropagatorConfig] = field(default_factory=dict)

    def _sorted(self) -> List[Tuple[Epoch, Phase]]:
        return sorted(self.seq.items(), key=lambda kv: kv[0].to_tai_seconds())

    def validate(self):
        items = self._sorted()
        if not items or not items[-1][1].terminate:
            raise ConfigError("final phase must be a Terminate")
        for epoch, phase in items:
            if phase.terminate:
                continue
            if phase.propagator not in self.propagators:
                raise ConfigError(f"{epoch}: no propagator named `{phase.propagator}`")
            if phase.guidance is not None:
                thruster = phase.guidance.get("thruster_model")
                if thruster not in self.thruster_sets:
                    raise ConfigError(f"{epoch}: no thruster set named {thruster}")

    def setup(self, almanac=None):
        self.validate()
        self._built = {}
        for _, phase in self._sorted():
            if not phase.terminate and not phase.disabled:
                if phase.propagator not in self._built:
                    self._built[phase.propagator] = self.propagators[
                        phase.propagator
                    ].build(almanac)

    def propagate(self, state: Spacecraft, until_phase: Optional[str] = None,
                  almanac=None) -> List:
        """Run the timeline from the state's epoch; returns one Trajectory
        per executed phase (sequence/mod.rs:120-230)."""
        if not hasattr(self, "_built"):
            self.setup(almanac)
        items = [
            (e, p) for e, p in self._sorted()
            if e.to_tai_seconds() >= state.epoch.to_tai_seconds() - 1e-9
        ]
        trajs = []
        for i, (epoch, phase) in enumerate(items):
            if phase.terminate:
                break
            if until_phase is not None and phase.name == until_phase:
                break
            if phase.disabled:
                continue
            if phase.on_entry is not None:
                state = phase.on_entry.apply(state, almanac)
            prop = self._built[phase.propagator]
            if phase.guidance is not None:
                law = phase.guidance["law"]
                thruster = self.thruster_sets[phase.guidance["thruster_model"]]
                prop = prop.with_guidance(law)
                state = replace(state, thruster=thruster, mode=GuidanceMode.Thrust)
            else:
                state = replace(state, mode=GuidanceMode.Coast)
            # phase runs until the next timeline entry
            end_epoch = items[i + 1][0]
            inst = prop.with_state(state, almanac)
            state, traj = inst.until_epoch_with_traj(end_epoch)
            trajs.append(traj)
        return trajs
