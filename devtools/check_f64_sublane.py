#!/usr/bin/env python
"""Class-level tripwire for the TPU f64 sub-sublane demotion bug
(VERDICT r3 item 9; root cause: f64 elementwise chains whose second-minor
dim is 1 evaluate at ~f32 precision inside lax loop bodies on axon).

Propagates the SAME state at B=1 and B=8 through the flagship dynamics
(RK89 adaptive, 21x21 JGM3 + drag + SRP, 2 h) and asserts:
  1. identical accepted/rejected step counts (the bug collapses the step
     controller ~50x, so any demotion shows up here first), and
  2. final states agree to < 1e-9 km.

Exit code 0 = clean; 1 = demotion class detected. Run per sweep on the
real TPU (devtools/r4_sweep.sh); it also passes on CPU (trivially — no
padding path there).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)

import numpy as np

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.dynamics import (
    Drag, Harmonics, OrbitalDynamics, SolarPressure, SpacecraftDynamics,
)
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.io.gravity import GravityFieldData
from nyx_tpu.mc import MonteCarlo, MvnSpacecraft, StateDispersion
from nyx_tpu.propagators import IntegratorOptions, Propagator


def main() -> int:
    here = Path(__file__).resolve().parent.parent
    epoch = Epoch.from_gregorian_utc(2021, 3, 4)
    orbit = Orbit.keplerian(
        7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch, Frames.EME2000
    )
    sc = Spacecraft.new(orbit, 100.0, 0.0, 2.0, 2.0, 1.8, 2.2)
    stor = GravityFieldData.from_cof(
        here / "data" / "JGM3.cof.gz", 21, 21, True, Frames.IAU_EARTH
    )
    dyn = SpacecraftDynamics(
        OrbitalDynamics.from_model(
            Harmonics.from_stor(stor, precision="split"), Frames.EME2000
        ),
        (SolarPressure.default(), Drag.earth_exp()),
    )
    from dataclasses import replace

    opts = replace(
        IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9),
        stage_mode="unroll",
    )
    prop = Propagator.rk89(dyn, opts)
    alm = Almanac()
    end = epoch + 7200.0

    mvn = MvnSpacecraft(sc, [StateDispersion("sma", 0.0)])  # zero spread:
    # every lane is the identical nominal state
    mc = MonteCarlo(mvn, seed=0)
    t0 = time.time()
    r1 = mc.run_until_epoch(prop, alm, end, 1)
    r8 = mc.run_until_epoch(prop, alm, end, 8)
    wall = time.time() - t0
    acc1, rej1 = int(r1.n_accepted[0]), int(r1.n_rejected[0])
    acc8 = [int(x) for x in r8.n_accepted]
    rej8 = [int(x) for x in r8.n_rejected]
    dy = float(np.max(np.abs(r1.y_final[0] - r8.y_final), initial=0.0))
    ok_steps = all(a == acc1 for a in acc8) and all(r == rej1 for r in rej8)
    ok_state = dy < 1e-9
    status = "OK" if (ok_steps and ok_state) else "FAIL"
    print(
        f"f64-sublane tripwire [{jax.default_backend()}]: {status} — "
        f"B=1 steps {acc1}+{rej1}r, B=8 steps {acc8[0]}+{rej8[0]}r "
        f"(all-equal={ok_steps}), max |y1-y8| = {dy:.3e} km "
        f"({wall:.0f}s)"
    )
    if not (ok_steps and ok_state):
        print(
            "  -> the f64 emulation dropped precision on a sub-sublane "
            "shape; check integrator.propagate's padding guard coverage",
            file=sys.stderr,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
