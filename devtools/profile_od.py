#!/usr/bin/env python
"""Stage-resolved profiler for the OD scan filter at the bench arc shape.

Rebuilds proxies of the batched pipeline's stages (scan_filter._build_batch)
with the bench dynamics and times each on the current backend:
  1. single-lane adaptive reference propagation with dense capture
  2. [M, 90] batched fixed-step STM RK (the 9-jvp stage)
  3. vmapped measurement linearize (one-way)
  4. full process_arc minus (1+2+3) ~= the parallel-scan filter algebra

Usage: python devtools/profile_od.py  (uses the tunneled TPU when up)
"""

import os
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

import jax.numpy as jnp
import numpy as np

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.dynamics import Harmonics, OrbitalDynamics, SpacecraftDynamics
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.io.gravity import GravityFieldData
from nyx_tpu.od import (
    GroundStation, MeasurementType, SpacecraftUncertainty, TrackingArcSim,
    TrkConfig,
)
from nyx_tpu.od.noise import StochasticNoise, WhiteNoise
from nyx_tpu.od.scan_filter import ScanKalmanOD, _station_obs
from nyx_tpu.od.simulator import Scheduler
from nyx_tpu.propagators import IntegratorOptions, Propagator, integrator
from nyx_tpu.propagators.tableaus import IntegratorMethod

here = Path(__file__).resolve().parent.parent
STM_DEG = int(os.environ.get("NYX_PROF_OD_STM_DEG", 8))

epoch = Epoch.from_gregorian_utc(2021, 3, 4)
stor = GravityFieldData.from_cof(
    here / "data" / "JGM3.cof.gz", 21, 21, True, Frames.IAU_EARTH
)
eme2k = Frames.EME2000
orbit = Orbit.keplerian(22_000.0, 0.01, 30.0, 80.0, 40.0, 0.0, epoch, eme2k)
truth = Spacecraft.from_orbit(orbit)
harm = Harmonics.from_stor(stor, precision="split")
dyn = SpacecraftDynamics(OrbitalDynamics.from_model(harm, eme2k), ())
from dataclasses import replace as _replace

prop = Propagator.rk89(dyn, IntegratorOptions())
truth_prop = Propagator.rk89(dyn, _replace(IntegratorOptions(),
                                           stage_mode="unroll"))

print("building truth arc...", flush=True)
_, traj = truth_prop.with_state(truth).for_duration_with_traj(86_400.0)


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
sim = TrackingArcSim.with_seed(
    stations, traj, {g.name: cfg for g in stations}, seed=0
)
arc = sim.generate_measurements()
print(f"{len(arc)} measurements", flush=True)
unc = SpacecraftUncertainty(
    nominal=truth, frame="ric", x_km=0.15, y_km=0.15, z_km=0.15,
    vx_km_s=5e-6, vy_km_s=5e-6, vz_km_s=5e-6,
)
est0 = unc.to_estimate()

scan = ScanKalmanOD(
    prop, stations,
    types=(MeasurementType.RANGE_KM, MeasurementType.DOPPLER_KM_S),
    variant="ckf", stm_jvp_degree=STM_DEG or None,
)
# one full run to set up internals (row layout, compiled program)
sol = scan.process_arc(est0, arc)
t0 = time.time()
sol = scan.process_arc(est0, arc)
full_wall = time.time() - t0
m_rows = len(scan._row_t) if hasattr(scan, "_row_t") else None
print(f"full process_arc (warm): {full_wall*1e3:.0f} ms "
      f"({len(arc)/full_wall:.0f} steps/s)", flush=True)

# ---- stage proxies ----------------------------------------------------
dynS = scan._stm_dynamics(dyn)
eom9 = dyn.make_eom(with_stm=False)
eom90 = dynS.make_eom(with_stm=True)
ctx = dyn.build_context(epoch, 86_400.0, Almanac())
sc_params = dict(dry_mass_kg=truth.dry_mass_kg,
                 srp_area_m2=truth.srp_area_m2,
                 drag_area_m2=truth.drag_area_m2)
ref_opts = _replace(prop.opts, max_step_s=min(prop.opts.max_step_s,
                                              scan.max_gap_s),
                    stage_mode="unroll")
y0 = jnp.asarray(truth.to_vector())
k_cap = 512
arc_span = 86_400.0


def timeit(name, fn, *args, n=5):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} first call (compile): {time.time()-t0:8.1f} s",
          flush=True)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    per = (time.time() - t0) / n
    print(f"{name:46s} {per*1e3:9.1f} ms", flush=True)
    return out


@jax.jit
def stage1(y0, ctx, sc_params):
    return integrator.propagate(
        eom9, y0[None, :], arc_span, ref_opts, IntegratorMethod.RK89,
        n_capture=k_cap, capture_stride=1, eom_args=(ctx, sc_params),
    )

res1 = timeit("stage1: reference prop + capture", stage1, y0, ctx, sc_params)

# stage 2 proxy at the padded row count
t_rel = jnp.asarray(np.linspace(0.0, 86_400.0, 1440))
dt = jnp.diff(t_rel, prepend=0.0)
m = t_rel.shape[0]
meth = IntegratorMethod.RK89
y_prev = jnp.broadcast_to(y0, (m, 9))
eye_flat = jnp.broadcast_to(jnp.eye(9).ravel(), (m, 81))
y90_0 = jnp.concatenate([y_prev, eye_flat], axis=1)


@jax.jit
def stage2(y90, dt, ctx, sc_params):
    eom2 = lambda t, yy: eom90(t, yy, ctx, sc_params)
    inc90, _ = integrator._rk_stages_looped(
        eom2, meth.a_matrix, meth.b, meth.b_star, meth.c, t_rel, y90, dt
    )
    return y90 + inc90

y90 = timeit(f"stage2: [M,90] STM RK (stm_deg={STM_DEG})", stage2,
             y90_0, dt, ctx, sc_params)

lat, lon, hgt = scan._lat, scan._lon, scan._hgt
trk = jnp.zeros(m, dtype=jnp.int32)
types = scan.types
frame = scan.station_frame


@jax.jit
def stage3(t_rel, y_bar, trk):
    t_tdb = ctx.epoch0_tdb + t_rel

    def one_obs(t_i, y_i, trk_i):
        def h_of_y(y9):
            return _station_obs(t_i, y9[0:6], lat[trk_i], lon[trk_i],
                                hgt[trk_i], frame, types)
        computed, h_jvp = jax.linearize(h_of_y, y_i)
        h_mat = jax.vmap(h_jvp)(jnp.eye(9)).T
        return computed, h_mat

    return jax.vmap(one_obs)(t_tdb, y_bar, trk)

_ = timeit("stage3: vmapped measurement linearize", stage3,
           t_rel, y90[:, :9], trk)

print("stage4 (filter algebra) ~= full - (1+2+3) estimates above")
