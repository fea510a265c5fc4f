#!/usr/bin/env python
"""Ablation profiler for the MC bench EOM (north-star config #2).

Times each EOM component at the bench batch size by chaining N calls in a
fori_loop (data-dependent, so XLA can't elide them), and reports the full
propagation's iteration statistics (mean vs max accepted+rejected steps =
lane-divergence waste).

Usage: NYX_PROF_B=100000 python devtools/profile_mc.py
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
from nyx_tpu.dynamics import (
    Drag,
    Harmonics,
    OrbitalDynamics,
    SolarPressure,
    SpacecraftDynamics,
)
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.io.gravity import GravityFieldData
from nyx_tpu.mc import MonteCarlo, MvnSpacecraft, StateDispersion
from nyx_tpu.propagators import IntegratorOptions, Propagator

B = int(os.environ.get("NYX_PROF_B", 100_000))
N_ITER = int(os.environ.get("NYX_PROF_ITERS", 50))

here = Path(__file__).resolve().parent.parent
jgm3 = here / "data" / "JGM3.cof.gz"

epoch = Epoch.from_gregorian_utc(2021, 3, 4)
orbit = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch, Frames.EME2000)
sc = Spacecraft.new(orbit, 100.0, 0.0, 2.0, 2.0, 1.8, 2.2)

stor = GravityFieldData.from_cof(jgm3, 21, 21, True, Frames.IAU_EARTH)
harm = Harmonics.from_stor(stor, precision="split", backend="auto")
dynamics = SpacecraftDynamics(
    OrbitalDynamics.from_model(harm, Frames.EME2000),
    (SolarPressure.default(), Drag.earth_exp()),
)
ctx = dynamics.build_context(epoch, 86_400.0, Almanac())
sc_params = dict(dry_mass_kg=100.0, srp_area_m2=1.8, drag_area_m2=2.2)

mvn = MvnSpacecraft(
    sc,
    [StateDispersion("sma", 0.5), StateDispersion("inc", 0.01),
     StateDispersion("raan", 0.01)],
)
mc = MonteCarlo(mvn, seed=42)
y0 = jnp.asarray(mc.generate_states(B))
t0v = jnp.zeros(B)


def timeit(name, fn, *args):
    """fn(t, y) -> [B,?]; chain N_ITER calls with data dependence."""
    def loop(y):
        def body(i, yy):
            out = fn(t0v + 1e-6 * i, yy)
            return yy + 1e-12 * jnp.pad(
                out, [(0, 0), (0, yy.shape[1] - out.shape[1])]
            ) if out.shape != yy.shape else yy + 1e-12 * out
        return jax.lax.fori_loop(0, N_ITER, body, y)

    jf = jax.jit(loop)
    r = jf(y0)  # compile
    r.block_until_ready()
    t0 = time.time()
    r = jf(y0)
    r.block_until_ready()
    wall = time.time() - t0
    per_call_us = wall / N_ITER * 1e6
    print(f"{name:34s} {per_call_us:10.0f} us/call   "
          f"({wall:.3f} s / {N_ITER} calls, B={B})", flush=True)
    return per_call_us


eom = dynamics.make_eom(False)
full = timeit("full EOM", lambda t, y: eom(t, y, ctx, sc_params))

od = dynamics.orbital_dyn
frame = od.frame


def grav_only(t, y):
    r = y[..., 0:3]
    return jnp.pad(harm.accel(ctx, ctx.epoch0_tdb + t, r, y[..., 3:6]),
                   [(0, 0), (0, 0)])


timeit("two-body f64", lambda t, y: od.two_body_accel(ctx, y[..., 0:3]))
timeit("harmonics.accel (split: dcm+j2j3 f64 + pallas f32)", grav_only)

from nyx_tpu.cosmic import rotations
from nyx_tpu.dynamics.gravity import _j2j3_accel

timeit("iau_earth dcm f64 only",
       lambda t, y: rotations.iau_earth_dcm(ctx.epoch0_tdb + t)[..., 2, :])


def j2j3_only(t, y):
    dcm = rotations.iau_earth_dcm(ctx.epoch0_tdb + t)
    pole = dcm[..., 2, :]
    return _j2j3_accel(harm.mu_km3_s2, harm.radius_km, harm.j2, harm.j3,
                       y[..., 0:3], pole)


timeit("dcm + j2j3 f64", j2j3_only)


def pallas_only(t, y):
    r32 = y[..., 0:3].astype(jnp.float32)
    return harm.accel_body_fixed(r32).astype(jnp.float64)


timeit("pallas f32 recursion only (no rot)", pallas_only)

srp, drag = dynamics.force_models


def force32(fm):
    def f(t, y):
        r32 = y[..., 0:3].astype(jnp.float32)
        v32 = y[..., 3:6].astype(jnp.float32)
        sc32 = dict(cr=y[..., 6].astype(jnp.float32),
                    cd=y[..., 7].astype(jnp.float32),
                    srp_area_m2=1.8, drag_area_m2=2.2,
                    mass_kg=jnp.float32(100.0))
        return fm.force_per_mass(
            ctx, ctx.epoch0_tdb + t, r32, v32, sc32
        ).astype(jnp.float64)
    return f


timeit("SRP f32", force32(srp))
timeit("drag f32", force32(drag))

# RK machinery overhead: trivial EOM through the full step body
from nyx_tpu.propagators import integrator as intg
from nyx_tpu.propagators.tableaus import IntegratorMethod

meth = IntegratorMethod.RK89
triv = lambda t, y: -1e-3 * y


def rk_body(t, y):
    inc, err = intg._rk_stages(triv, meth.a_matrix, meth.b, meth.b_star,
                               meth.c, t, y, jnp.full(y.shape[0], 10.0))
    return inc + 1e-30 * err


timeit("RK89 combos, trivial eom (unroll)", rk_body)


def rk_body_full(t, y):
    inc, err = intg._rk_stages(
        lambda tt, yy: eom(tt, yy, ctx, sc_params),
        meth.a_matrix, meth.b, meth.b_star, meth.c, t, y,
        jnp.full(y.shape[0], 10.0))
    return inc + 1e-30 * err


rk_full = timeit("RK89 full step (16 evals + combos)", rk_body_full)
print(f"  -> eom share: {16 * full / rk_full:.2f}x16-eval vs full step")

# --- full 1-day propagation: wall + iteration stats --------------------
from dataclasses import replace

opts = replace(
    IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9),
    stage_mode="unroll",
)
prop = Propagator.rk89(dynamics, opts)
alm = Almanac()
end = epoch + 86_400.0
mc.run_until_epoch(prop, alm, epoch + 120.0, B)  # compile
t0 = time.time()
res = mc.run_until_epoch(prop, alm, end, B)
wall = time.time() - t0
tot = res.n_accepted + res.n_rejected
print(f"full 1-day prop: {wall:.2f} s  ({B / wall:.0f} traj/s)")
print(f"  steps acc mean={np.mean(res.n_accepted):.1f} "
      f"max={np.max(res.n_accepted)} rej mean={np.mean(res.n_rejected):.2f}")
print(f"  attempts mean={np.mean(tot):.1f} max={np.max(tot)} "
      f"p99={np.percentile(tot, 99):.0f} -> divergence waste "
      f"{np.max(tot) / np.mean(tot) - 1:.1%}")
