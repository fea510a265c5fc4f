#!/usr/bin/env python
"""Example 03 — GEO low-thrust raise + station-keeping analysis
(reference: examples/03_geo_analysis).

Raises a GTO-like orbit toward GEO with the Ruggiero closed-loop law
(eclipse-gated thrusting), then checks the eclipse profile over the drift
orbit — the reference's "GEO raise" and "GEO drift" phases.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import numpy as np
import jax

# Long guidance-loop propagations fault the tunneled axon TPU runtime
# (see examples/04); default to CPU, set NYX_EX03_TPU=1 to try the TPU.
if not os.environ.get("NYX_EX03_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.cosmic.eclipse import ShadowModel
from nyx_tpu.cosmic.spacecraft import GuidanceMode, Thruster
from nyx_tpu.constants import NAIF
from nyx_tpu.dynamics import OrbitalDynamics, Ruggiero, SpacecraftDynamics
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.md.objective import Objective
from nyx_tpu.md.param import StateParameter
from nyx_tpu.propagators import IntegratorOptions, Propagator


def main():
    almanac = Almanac()
    epoch = Epoch.from_gregorian_utc(2024, 3, 1, 0, 0, 0)
    # sub-GEO starting orbit (post-GTO circularization)
    orbit = Orbit.keplerian(39_000.0, 0.01, 1.5, 90.0, 10.0, 0.0, epoch,
                            Frames.EME2000)
    thruster = Thruster(thrust_N=0.75, isp_s=1650.0)  # BPT-4000-like
    sc = Spacecraft.from_thruster(orbit, dry_mass_kg=1800.0,
                                  prop_mass_kg=200.0, thruster=thruster,
                                  mode=GuidanceMode.Thrust)
    objectives = [
        Objective.within_tolerance(StateParameter.SMA, 42_164.0, 5.0),
    ]
    law = Ruggiero.simple(objectives, sc)
    dyn = SpacecraftDynamics.from_guidance_law(
        OrbitalDynamics.two_body(Frames.EME2000), law
    )
    prop = Propagator.rk89(dyn, IntegratorOptions(max_step_s=300.0))
    inst = prop.with_state(sc, almanac)
    print("raising toward GEO with Ruggiero (up to 5 days)...")
    final = inst.for_duration(5.0 * 86_400.0)
    print(f"final sma {final.orbit.sma_km:.1f} km, ecc {final.orbit.ecc:.5f}, "
          f"prop used {sc.prop_mass_kg - final.prop_mass_kg:.2f} kg")
    for line in law.status(final):
        print("  " + line)

    # eclipse analysis over one drift day (reference main.rs eclipse scan)
    dyn2 = SpacecraftDynamics.new(OrbitalDynamics.two_body(Frames.EME2000))
    inst2 = Propagator.rk89(dyn2, IntegratorOptions()).with_state(
        final, almanac
    )
    _, traj = inst2.for_duration_with_traj(86_400.0)
    model = ShadowModel((NAIF.EARTH,), almanac)
    ts, pct = model.percentages(traj, step_s=300.0)
    frac = float(np.mean(pct > 1e-6))
    print(f"eclipse fraction over the drift day: {100*frac:.2f}%")
    events = model.find_eclipse_events(traj, step_s=300.0)
    for when, kind in events[:4]:
        print(f"  eclipse {kind} at {when}")


if __name__ == "__main__":
    main()
