"""Impulsive-to-finite-burn conversion (md/opti/convert_impulsive.rs:37).

An instantaneous Δv becomes a full-throttle finite burn centered on the
impulse epoch: the burn duration comes from the rocket equation, the
initial direction from the Δv unit vector, and a thrust-profile targeter
(quadratic direction polynomial, one batched propagation per Newton
iteration) corrects the profile until the post-burn Cartesian state matches
the impulsive trajectory.
"""

from __future__ import annotations

import numpy as np

from ...constants import STD_GRAVITY_M_S2
from ...dynamics.guidance import LocalFrame, Maneuver
from ...errors import TargetingError
from ..objective import Objective
from .targeter import Targeter, TargeterSolution


def convert_impulsive_mnvr(
    spacecraft, dv_km_s, prop, almanac=None,
    settle_time_s: float = 900.0,
    pos_tol_km: float = 0.01,
    vel_tol_km_s: float = 1e-5,
) -> TargeterSolution:
    """Finite-burn equivalent of an impulsive `dv_km_s` (inertial frame)
    applied at `spacecraft.epoch`. Returns a TargeterSolution whose
    `.maneuver` reproduces the impulsive end state to the tolerances at
    `settle_time_s` past the burn."""
    if spacecraft.thruster is None:
        raise TargetingError("impulsive conversion needs a thruster")

    dv = np.asarray(dv_km_s, dtype=np.float64)
    dv_mag = float(np.linalg.norm(dv))
    if dv_mag <= 0.0:
        raise TargetingError("zero delta-v")
    thruster = spacecraft.thruster
    v_ex_m_s = thruster.isp_s * STD_GRAVITY_M_S2
    mass_kg = spacecraft.dry_mass_kg + spacecraft.prop_mass_kg
    # rocket-equation burn duration at full throttle (convert_impulsive.rs:68)
    delta_tfb = (v_ex_m_s * mass_kg / thruster.thrust_N) * (
        1.0 - np.exp(-dv_mag * 1e3 / v_ex_m_s)
    )

    impulse_epoch = spacecraft.epoch
    start = impulse_epoch - 0.5 * delta_tfb
    end = impulse_epoch + 0.5 * delta_tfb
    mnvr0 = Maneuver.from_time_invariant(
        start, end, 1.0, dv / dv_mag, LocalFrame.Inertial
    )

    # target: the impulsive trajectory's state after the settle time
    achieve = end + settle_time_s
    post = prop.with_state(spacecraft.with_dv(dv), almanac).until_epoch(achieve)
    target_vec = post.to_vector()
    objectives = [
        Objective(p, float(target_vec[i]),
                  pos_tol_km if i < 3 else vel_tol_km_s)
        for i, p in enumerate(("x", "y", "z", "vx", "vy", "vz"))
    ]

    # coast back to the burn start and correct the direction profile plus
    # the burn timing (StartEpoch/Duration — the total dv is fixed by the
    # rocket equation at full throttle, so timing absorbs the along-track
    # centroid offset; varying throttle instead creates a dv deficit)
    from .target_variable import Vary

    # correction epoch sits 2 min before the nominal burn start so a
    # negative StartEpoch correction still falls inside the propagation
    # resolve the burn with a max step well below its duration
    from dataclasses import replace as _replace

    opts = prop.opts
    if opts.max_step_s > max(delta_tfb / 4.0, 10.0):
        prop = type(prop)(
            prop.dynamics, prop.method,
            _replace(opts, max_step_s=max(delta_tfb / 4.0, 10.0)),
        )

    pre = prop.with_state(spacecraft, almanac).until_epoch(start - 120.0)
    tgt = Targeter._thrust(
        prop, objectives, mnvr0,
        (Vary.ThrustX, Vary.ThrustY, Vary.ThrustZ,
         Vary.ThrustRateX, Vary.ThrustRateY, Vary.ThrustRateZ,
         Vary.StartEpoch, Vary.Duration),
        almanac=almanac,
    )
    return tgt.try_achieve_from(pre, start - 120.0, achieve)
