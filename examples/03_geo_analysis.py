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

import json
import os
import time

import numpy as np
import jax

# TPU by default; the round-2 axon faults on very long single device calls
# are avoided by chunking the drift into ~90-day calls (host re-dispatch
# between chunks — the integrator state carries over exactly).
# Set NYX_EX03_CPU=1 to force the CPU platform.
if os.environ.get("NYX_EX03_CPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    os.environ.setdefault("NYX_MIN_LANES", "8")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)


def _write_artifact(name, payload):
    art_dir = Path(__file__).resolve().parent / "artifacts"
    art_dir.mkdir(exist_ok=True)
    (art_dir / name).write_text(json.dumps(payload, indent=1) + "\n")
    print(f"artifact: {art_dir / name}")

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.cosmic.eclipse import ShadowModel
from nyx_tpu.cosmic.spacecraft import GuidanceMode, Thruster
from nyx_tpu.constants import NAIF
from nyx_tpu.dynamics import OrbitalDynamics, Ruggiero, SpacecraftDynamics
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.md.objective import Objective
from nyx_tpu.md.param import StateParameter
from nyx_tpu.propagators import IntegratorOptions, Propagator


def drift_bench():
    """Head-to-head with the reference's headline number: 1095-day GEO
    drift, 21x21 JGM3 + SRP (Earth+Moon shadows) + Sun/Moon point masses,
    RK89 adaptive — ~560 propagated days/min on the reference's hardware
    (examples/03_geo_analysis/README.md:22-33, 1 min 55 s wall).
    NYX_EX03_DAYS overrides the arc length (CPU smoke: set it to ~10)."""
    import time

    from nyx_tpu.dynamics import Harmonics, PointMasses, SolarPressure
    from nyx_tpu.io.gravity import GravityFieldData

    here = Path(__file__).resolve().parent.parent
    almanac = Almanac()
    epoch = Epoch.from_gregorian_utc(2024, 3, 1)
    orbit = Orbit.keplerian(42_164.0, 1e-4, 0.05, 90.0, 10.0, 0.0, epoch,
                            Frames.EME2000)
    sc = Spacecraft.new(orbit, 2000.0, 0.0, 16.0, 16.0, 1.8, 2.2)
    stor = GravityFieldData.from_cof(
        here / "data" / "JGM3.cof.gz", 21, 21, True, Frames.IAU_EARTH
    )
    dyn = SpacecraftDynamics(
        OrbitalDynamics.from_models(
            (
                Harmonics.from_stor(stor, precision="split"),
                PointMasses((NAIF.SUN, NAIF.MOON)),
            ),
            Frames.EME2000,
        ),
        (SolarPressure((NAIF.EARTH, NAIF.MOON)),),
    )
    days = float(os.environ.get("NYX_EX03_DAYS", 1095.0))
    chunk_days = float(os.environ.get("NYX_EX03_CHUNK_DAYS", 90.0))
    prop = Propagator.rk89(
        dyn, IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9)
    )
    inst = prop.with_state(sc, almanac)
    # warm the jit cache on a short arc so the timed region is propagation
    prop.with_state(sc, almanac).for_duration(600.0)
    t0 = time.time()
    remaining = days * 86_400.0
    while remaining > 0.0:
        step = min(remaining, chunk_days * 86_400.0)
        final = inst.for_duration(step)
        remaining -= step
    wall = time.time() - t0
    rate = days / (wall / 60.0)
    print(
        f"GEO drift {days:.0f} d in {wall:.1f} s wall -> "
        f"{rate:.0f} propagated days/min "
        f"(reference: ~560 d/min, 1095 d in 115 s)"
    )
    print(f"final sma {final.orbit.sma_km:.1f} km ecc {final.orbit.ecc:.6f}")
    _write_artifact(f"ex03_drift_{jax.default_backend()}.json", {
        "example": "03_geo_analysis drift bench",
        "platform": jax.default_backend(),
        "days": days,
        "wall_s": round(wall, 1),
        "propagated_days_per_min": round(rate, 1),
        "reference_days_per_min": 560.0,
        "reference_wall_s_1095d": 115.66,
        "final_sma_km": round(float(final.orbit.sma_km), 3),
        "final_ecc": float(final.orbit.ecc),
    })


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
    t0 = time.time()
    # chunked dispatch (1-day device calls): long guidance-loop arcs in a
    # single call faulted the tunneled axon runtime in round 2
    for _day in range(5):
        final = inst.for_duration(86_400.0)
    raise_wall = time.time() - t0
    print(f"final sma {final.orbit.sma_km:.1f} km, ecc {final.orbit.ecc:.5f}, "
          f"prop used {sc.prop_mass_kg - final.prop_mass_kg:.2f} kg "
          f"({raise_wall:.0f}s wall)")
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
    _write_artifact(f"ex03_raise_{jax.default_backend()}.json", {
        "example": "03_geo_analysis Ruggiero raise + eclipse scan",
        "platform": jax.default_backend(),
        "raise_days": 5.0,
        "raise_wall_s": round(raise_wall, 1),
        "final_sma_km": round(float(final.orbit.sma_km), 2),
        "final_ecc": float(final.orbit.ecc),
        "prop_used_kg": round(float(sc.prop_mass_kg - final.prop_mass_kg), 3),
        "eclipse_fraction_pct": round(100 * frac, 2),
    })


if __name__ == "__main__":
    if "--drift-bench" in sys.argv or os.environ.get("NYX_EX03_DRIFT"):
        drift_bench()
    else:
        main()
