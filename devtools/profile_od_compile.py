#!/usr/bin/env python
"""Cold-path profiler for bench.py --od-only: where do the 1,261 s go?

Times each cold stage separately, and for the big filter program splits
host-side trace+lower (1 CPU core, unaffected by XLA flags) from the
remote XLA compile, optionally with a reduced optimization effort
(NYX_PROF_EFFORT=-1.0 .. 1.0; unset = compiler default).

Uses a throwaway compilation cache (NYX_PROF_CACHE=/tmp/...) so results
reflect a genuinely cold environment without destroying the workspace
cache. Run on the TPU:

    NYX_PROF_CACHE=/tmp/coldcache NYX_PROF_EFFORT=-0.7 \
        python devtools/profile_od_compile.py
"""

import os
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

import jax

jax.config.update("jax_enable_x64", True)
cache = os.environ.get("NYX_PROF_CACHE")
if cache:
    jax.config.update("jax_compilation_cache_dir", cache)

import jax.numpy as jnp
import numpy as np

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.dynamics import Harmonics, OrbitalDynamics, SpacecraftDynamics
from nyx_tpu.io.gravity import GravityFieldData
from nyx_tpu.propagators import IntegratorOptions, Propagator

T0 = time.time()


def mark(msg):
    print(f"[{time.time() - T0:7.1f}s] {msg}", flush=True)


def main():
    effort = os.environ.get("NYX_PROF_EFFORT")
    epoch = Epoch.from_gregorian_utc(2021, 3, 4)
    stor = GravityFieldData.from_cof(
        HERE / "data" / "JGM3.cof.gz", 21, 21, True, Frames.IAU_EARTH
    )
    from dataclasses import replace as _replace

    from nyx_tpu.od import (
        GroundStation,
        MeasurementType,
        SpacecraftUncertainty,
        TrackingArcSim,
        TrkConfig,
    )
    from nyx_tpu.od.noise import StochasticNoise, WhiteNoise
    from nyx_tpu.od.scan_filter import ScanKalmanOD
    from nyx_tpu.od.simulator import Scheduler

    eme2k = Frames.EME2000
    orbit = Orbit.keplerian(22_000.0, 0.01, 30.0, 80.0, 40.0, 0.0, epoch, eme2k)
    truth = Spacecraft.from_orbit(orbit)
    dyn = SpacecraftDynamics(
        OrbitalDynamics.from_model(
            Harmonics.from_stor(stor, precision="split"), eme2k
        ),
        (),
    )
    mark("setup done")
    prop = Propagator.rk89(dyn, IntegratorOptions())
    truth_prop = Propagator.rk89(
        dyn, _replace(IntegratorOptions(), stage_mode="unroll")
    )
    t = time.time()
    _, traj = truth_prop.with_state(truth).for_duration_with_traj(86_400.0)
    mark(f"STAGE truth_traj: {time.time() - t:.1f}s")

    def white(gs):
        gs.stochastic_noises = {
            MeasurementType.RANGE_KM: StochasticNoise(WhiteNoise(2.0e-3)),
            MeasurementType.DOPPLER_KM_S: StochasticNoise(WhiteNoise(3.0e-6)),
        }
        return gs

    stations = [
        white(GroundStation.dss65_madrid(10.0)),
        white(GroundStation.dss34_canberra(10.0)),
        white(GroundStation.dss13_goldstone(10.0)),
    ]
    cfg = TrkConfig(sampling_s=60.0, scheduler=Scheduler(min_samples=5))
    t = time.time()
    sim = TrackingArcSim.with_seed(
        stations, traj, {g.name: cfg for g in stations}, seed=0
    )
    arc = sim.generate_measurements()
    mark(f"STAGE measurements ({len(arc)}): {time.time() - t:.1f}s")

    unc = SpacecraftUncertainty(
        nominal=truth, frame="ric", x_km=0.15, y_km=0.15, z_km=0.15,
        vx_km_s=5e-6, vy_km_s=5e-6, vz_km_s=5e-6,
    )
    est0 = unc.to_estimate()
    scan = ScanKalmanOD(
        prop, stations,
        types=(MeasurementType.RANGE_KM, MeasurementType.DOPPLER_KM_S),
        variant="ckf",
        stm_jvp_degree=8,
        aot_dir=None,  # measure the raw trace/lower/compile path
    )
    if effort is not None:
        os.environ.setdefault("NYX_COMPILE_EFFORT_FILTER", effort)
    os.environ.setdefault("NYX_OD_TRACE", "1")
    t = time.time()
    sol = scan.process_arc(est0, arc)  # staged trace+lower+compile+run
    mark(f"STAGE filter_compile+first_run (effort={effort}): "
         f"{time.time() - t:.1f}s")
    t = time.time()
    sol = scan.process_arc(est0, arc)
    dt = time.time() - t
    mark(f"STAGE filter_run (process_arc wall): {dt:.3f}s -> "
         f"{len(arc) / dt:.0f} steps/s")


if __name__ == "__main__":
    main()
