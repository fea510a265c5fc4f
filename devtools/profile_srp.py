#!/usr/bin/env python
"""Micro-profiler for the SRP force path (the largest EOM component at
B=100k per devtools/profile_mc.py). Dissects: ephemeris record select +
Clenshaw, eclipse geometry transcendentals, flux/direction math; and
measures a single-record low-degree table variant.

Usage: NYX_PROF_B=100000 python devtools/profile_srp.py
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
from nyx_tpu.constants import AU_KM, NAIF, RADIUS_BY_NAIF, SOLAR_FLUX_W_M2, SPEED_OF_LIGHT_M_S
from nyx_tpu.cosmic.eclipse import illumination_factor
from nyx_tpu.dynamics import Drag, Harmonics, OrbitalDynamics, SolarPressure, SpacecraftDynamics
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.io.gravity import GravityFieldData

B = int(os.environ.get("NYX_PROF_B", 100_000))
N_ITER = int(os.environ.get("NYX_PROF_ITERS", 50))

here = Path(__file__).resolve().parent.parent
epoch = Epoch.from_gregorian_utc(2021, 3, 4)
orbit = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch, Frames.EME2000)

stor = GravityFieldData.from_cof(here / "data" / "JGM3.cof.gz", 21, 21, True, Frames.IAU_EARTH)
harm = Harmonics.from_stor(stor, precision="split", backend="auto")
srp = SolarPressure.default()
dynamics = SpacecraftDynamics(
    OrbitalDynamics.from_model(harm, Frames.EME2000), (srp, Drag.earth_exp())
)
ctx = dynamics.build_context(epoch, 86_400.0, Almanac())
print("table records:", ctx.table.coeffs.shape, flush=True)

rng = np.random.default_rng(0)
r0 = np.asarray(orbit.r_km) + rng.normal(0, 1.0, (B, 3))
v0 = np.asarray(orbit.v_km_s) + rng.normal(0, 1e-3, (B, 3))
y0 = jnp.concatenate(
    [jnp.asarray(r0), jnp.asarray(v0), jnp.full((B, 3), 1.8)], axis=1
)
t0v = jnp.zeros(B)
f32 = jnp.float32


def timeit(name, fn):
    """fn(t, y) -> [B, k<=9]; chained N_ITER times with data dependence."""
    def loop(y):
        def body(i, yy):
            out = fn(t0v + 1e-6 * i, yy)
            out = jnp.pad(out, [(0, 0), (0, yy.shape[1] - out.shape[1])])
            return yy + 1e-12 * out.astype(yy.dtype)
        return jax.lax.fori_loop(0, N_ITER, body, y)

    jf = jax.jit(loop)
    r = jf(y0)
    r.block_until_ready()
    t0 = time.time()
    r = jf(y0)
    r.block_until_ready()
    wall = time.time() - t0
    per = wall / N_ITER * 1e6
    print(f"{name:44s} {per:9.0f} us/call", flush=True)
    return per


sun_idx = ctx.body_index(NAIF.SUN)

timeit("floor (t bcast + slice)", lambda t, y: y[:, 0:3] * 1e-3)
timeit("sun position f32 (select+clenshaw)",
       lambda t, y: ctx.table.position(sun_idx, ctx.epoch0_tdb + t, dtype=f32))
timeit("sun position f64",
       lambda t, y: ctx.table.position(sun_idx, ctx.epoch0_tdb + t))


def rec_tau_only(t, y):
    rec, tau = ctx.table._rec_tau(ctx.epoch0_tdb + t)
    return (tau[:, None] + rec[:, None]) * jnp.ones((1, 3))


timeit("rec/tau f64 only", rec_tau_only)


def rec_tau_f32(t, y):
    rec, tau = ctx.table._rec_tau(ctx.epoch0_tdb + t, jnp.float32)
    return (tau[:, None] + rec[:, None].astype(f32)) * jnp.ones((1, 3), f32)


timeit("rec/tau f32 only", rec_tau_f32)

r_sun_fixed = ctx.table.position(sun_idx, ctx.epoch0_tdb + t0v, dtype=f32)


def eclipse_only(t, y):
    r = y[:, 0:3].astype(f32)
    k = illumination_factor(r_sun_fixed - r, [(-r, RADIUS_BY_NAIF[NAIF.EARTH])])
    return k[:, None] * jnp.ones((1, 3), f32)


timeit("eclipse geometry f32 (fixed sun)", eclipse_only)
timeit("eclipse geometry f32 rerun", eclipse_only)


def flux_dir_only(t, y):
    r = y[:, 0:3].astype(f32)
    rel = r_sun_fixed - r
    d = jnp.linalg.norm(rel, axis=-1)
    fp = (SOLAR_FLUX_W_M2 / SPEED_OF_LIGHT_M_S) * (AU_KM / d) ** 2
    return 1e-3 * fp[:, None] * (-rel / d[:, None])


timeit("flux+direction f32 (fixed sun)", flux_dir_only)

sc32 = dict(cr=jnp.full((B,), 1.8, f32), cd=jnp.full((B,), 2.2, f32),
            srp_area_m2=1.8, drag_area_m2=2.2, mass_kg=jnp.float32(100.0))


def srp_full(t, y):
    r = y[:, 0:3].astype(f32)
    v = y[:, 3:6].astype(f32)
    return srp.force_per_mass(ctx, ctx.epoch0_tdb + t, r, v, sc32)


timeit("SRP full f32", srp_full)

# ---- single-record low-degree table variant --------------------------
alm = Almanac()
fast_tab = alm.build_table([NAIF.SUN], NAIF.EARTH, epoch, epoch + 86_400.0,
                           intlen_days=5.0, degree=5, pad_days=0.5)
err = np.max(np.abs(
    np.asarray(fast_tab.position(0, ctx.epoch0_tdb + jnp.linspace(0, 86400., 97)))
    - np.asarray(ctx.table.position(sun_idx, ctx.epoch0_tdb + jnp.linspace(0, 86400., 97)))
))
print(f"single-record deg-5 table max err vs default: {err:.3f} km", flush=True)
timeit("sun position f32 single-record deg5",
       lambda t, y: fast_tab.position(0, ctx.epoch0_tdb + t, dtype=f32))


def srp_fast_tab(t, y):
    r = y[:, 0:3].astype(f32)
    rel = fast_tab.position(0, ctx.epoch0_tdb + t, dtype=f32) - r
    k = illumination_factor(rel, [(-r, RADIUS_BY_NAIF[NAIF.EARTH])])
    d = jnp.linalg.norm(rel, axis=-1)
    fp = k * (SOLAR_FLUX_W_M2 / SPEED_OF_LIGHT_M_S) * (AU_KM / d) ** 2
    return 1e-3 * (sc32["cr"] * 1.8 / 100.0 * fp)[:, None] * (-rel / d[:, None])


timeit("SRP full f32, single-record deg5 table", srp_fast_tab)
