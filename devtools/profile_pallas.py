#!/usr/bin/env python
"""A/B profiler for the Pallas Pines kernel: tile_b x defer_reduce sweep
at the north-star batch size, plus accuracy vs the f64 XLA recursion.

Usage: NYX_PROF_B=100000 python devtools/profile_pallas.py
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

from nyx_tpu import Epoch, Frames, Orbit
from nyx_tpu.dynamics import Harmonics
from nyx_tpu.dynamics import gravity_pallas as gp
from nyx_tpu.io.gravity import GravityFieldData

B = int(os.environ.get("NYX_PROF_B", 100_000))
N_ITER = int(os.environ.get("NYX_PROF_ITERS", 50))
DEG = int(os.environ.get("NYX_PROF_DEG", 21))

here = Path(__file__).resolve().parent.parent
stor = GravityFieldData.from_cof(
    here / "data" / "JGM3.cof.gz", DEG, DEG, True, Frames.IAU_EARTH
)
harm = Harmonics.from_stor(stor, precision="split", backend="xla")

rng = np.random.default_rng(0)
r = rng.normal(0, 1.0, (B, 3))
r = 7136.6 * r / np.linalg.norm(r, axis=1, keepdims=True)
r32 = jnp.asarray(r, jnp.float32)

xs, diag, N, M = harm._tables
tab, gate = gp.pack_tables(xs, N, M + 2, q_lo=harm.split_degree, q_hi=0)
tabj = jnp.asarray(tab)


def timeit(name, fn):
    def loop(x):
        def body(i, xx):
            return xx + 1e-9 * fn(xx)
        return jax.lax.fori_loop(0, N_ITER, body, x)

    jf = jax.jit(loop)
    out = jf(r32)
    out.block_until_ready()
    t0 = time.time()
    out = jf(r32)
    out.block_until_ready()
    per = (time.time() - t0) / N_ITER * 1e6
    print(f"{name:40s} {per:9.0f} us/call", flush=True)
    return out


def call(tile, defer):
    def f(x):
        # feed back positions so the loop has data dependence; the kernel
        # output (accel ~1e-5) barely changes the radius
        return gp.pines_accel_pallas(
            x, tabj, gate, W=M + 2, mu=harm.mu_km3_s2,
            radius=harm.radius_km, diag1=float(diag[1]),
            tile_b=tile, defer_reduce=defer,
        ) * 1e5
    return f


ref = None
for defer in (False, True):
    for tile in (256, 512, 1024, 2048):
        try:
            out = timeit(f"pallas tile={tile} defer={int(defer)}",
                         call(tile, defer))
            if ref is None:
                ref = out
            else:
                d = float(jnp.max(jnp.abs(out - ref)))
                if d > 1e-8:
                    print(f"  !! mismatch vs first variant: {d:.3e}")
        except Exception as exc:  # noqa: BLE001
            print(f"pallas tile={tile} defer={int(defer)}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)

# accuracy vs f64 XLA recursion on the same truncated block
acc64 = harm._accel_unrolled(jnp.asarray(r), q_lo=harm.split_degree)
acc32 = gp.pines_accel_pallas(
    r32, tabj, gate, W=M + 2, mu=harm.mu_km3_s2, radius=harm.radius_km,
    diag1=float(diag[1]), tile_b=512, defer_reduce=True,
)
rel = float(jnp.max(jnp.linalg.norm(acc32 - acc64, axis=1)
                    / jnp.linalg.norm(acc64, axis=1)))
print(f"defer kernel vs f64 XLA max rel err: {rel:.3e}")
