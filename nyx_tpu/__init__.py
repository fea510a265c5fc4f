"""nyx_tpu — a TPU-native, JAX-first spaceflight dynamics framework.

A from-scratch re-design of the capabilities of nyx-space/nyx (high-fidelity
orbit propagation, mission design, Monte Carlo, orbit determination) for
TPU hardware: the Monte Carlo / covariance ensemble is the native array axis,
propagation is a batched `lax.while_loop` with per-lane adaptive step control,
force models are fused pure functions (Pallas kernels on the hot paths), and
scaling is `jax.sharding` over a device mesh rather than CPU threads.

All dynamical computations are float64 (x64 mode is enabled at import).
Positions are in km, velocities km/s, epochs in TAI/TDB seconds past J2000.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.2.0"

from .time import Epoch, Duration, Unit  # noqa: E402
from .constants import GM  # noqa: E402
from .cosmic.frames import Frame, Frames  # noqa: E402
from .cosmic.orbit import Orbit  # noqa: E402
from .cosmic.spacecraft import GuidanceMode, Spacecraft, Thruster  # noqa: E402
from .cosmic.bplane import BPlane, BPlaneTarget, try_achieve_b_plane  # noqa: E402
from .cosmic.eclipse import EclipseState, ShadowModel  # noqa: E402
from .propagators import IntegratorOptions, Propagator  # noqa: E402
from .md.events import Event  # noqa: E402
from .md.objective import Objective  # noqa: E402
from .md.param import StateParameter  # noqa: E402
from .md.trajectory import Trajectory  # noqa: E402
from .tracing import annotate, enable_logging, profile_trace  # noqa: E402

__all__ = [
    "annotate",
    "enable_logging",
    "profile_trace",
    "Epoch",
    "Duration",
    "Unit",
    "GM",
    "Frame",
    "Frames",
    "Orbit",
    "Spacecraft",
    "Thruster",
    "GuidanceMode",
    "BPlane",
    "BPlaneTarget",
    "try_achieve_b_plane",
    "EclipseState",
    "ShadowModel",
    "IntegratorOptions",
    "Propagator",
    "Event",
    "Objective",
    "StateParameter",
    "Trajectory",
]
