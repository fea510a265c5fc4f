"""Event finding on trajectories.

Counterpart of the reference's event stack (propagators/event.rs:48-211 +
ANISE `Event`): an event is a zero-crossing of `value(StateParameter) -
desired` (angle-aware); crossings are located by sign change over the stored
integrator steps, then polished with Brent's method on the Hermite-
interpolated trajectory — the same crossing-count + root-polish design, with
the trajectory already materialized from the capture buffer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from scipy.optimize import brentq

from ..cosmic.spacecraft import Spacecraft
from ..time import Epoch
from . import param as param_mod
from .trajectory import Trajectory


@dataclass(frozen=True)
class Event:
    parameter: str
    desired_value: float = 0.0
    epoch_precision_s: float = 0.1
    value_precision: Optional[float] = None

    @classmethod
    def apoapsis(cls) -> "Event":
        return cls("ta", 180.0)

    @classmethod
    def periapsis(cls) -> "Event":
        return cls("ta", 0.0)

    def g(self, y, mu, radius_km=0.0):
        """Signed event function (batched)."""
        val = param_mod.value(self.parameter, y, mu, radius_km)
        err = val - self.desired_value
        if self.parameter.lower() in param_mod.StateParameter.ANGLES_DEG:
            err = (err + 180.0) % 360.0 - 180.0
        return err

    def __str__(self):
        return f"{self.parameter} = {self.desired_value}"


@dataclass
class EventDetails:
    event: Event
    epoch: Epoch
    state: Spacecraft
    value: float


def find_events(traj: Trajectory, event: Event, max_events: int = 100) -> List[EventDetails]:
    """All sign-change crossings of the event on a trajectory, Brent-refined."""
    frame = traj.template.frame
    mu = frame.mu
    radius = frame.radius_km or 0.0
    g_samples = np.asarray(event.g(jnp.asarray(traj.ys), mu, radius))

    def g_of_t(t_rel: float) -> float:
        y = traj.interpolate(t_rel)
        return float(event.g(jnp.asarray(y[None, :]), mu, radius)[0])

    out: List[EventDetails] = []
    for i in range(len(traj.ts) - 1):
        a, b = g_samples[i], g_samples[i + 1]
        if np.isnan(a) or np.isnan(b):
            continue
        if a == 0.0:
            t_root = float(traj.ts[i])
        elif a * b < 0.0:
            # skip spurious angle-wrap sign changes (|jump| > 180 means wrap)
            if (
                event.parameter.lower() in param_mod.StateParameter.ANGLES_DEG
                and abs(b - a) > 180.0
            ):
                continue
            t_root = brentq(
                g_of_t, float(traj.ts[i]), float(traj.ts[i + 1]),
                xtol=event.epoch_precision_s,
            )
        else:
            continue
        epoch = traj.epoch0 + t_root
        state = traj.template.set_vector(epoch, traj.interpolate(t_root)[:9])
        out.append(EventDetails(event, epoch, state, g_of_t(t_root)))
        if len(out) >= max_events:
            break
    return out


def find_nth_event(
    traj: Trajectory, event: Event, n: int
) -> Optional[EventDetails]:
    """0-indexed n-th event, as the reference's until_nth_event."""
    events = find_events(traj, event, max_events=n + 1)
    if len(events) <= n:
        return None
    return events[n]


def find_minmax(traj: Trajectory, parameter: str, kind: str = "min"):
    """Extremum of a parameter over the trajectory (reference: traj.rs find_minmax)."""
    frame = traj.template.frame
    vals = np.asarray(
        param_mod.value(parameter, jnp.asarray(traj.ys), frame.mu, frame.radius_km or 0.0)
    )
    idx = int(np.argmin(vals) if kind == "min" else np.argmax(vals))
    epoch = traj.epoch0 + float(traj.ts[idx])
    return traj._state_at_index(idx), float(vals[idx]), epoch
