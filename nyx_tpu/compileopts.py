"""Per-program XLA compiler options, env-tunable.

The axon TPU's remote compiler is the dominant cost of every cold run
(measured: 654 s for the OD filter program, 250 s for the unrolled truth
propagation, at default effort). For programs whose *runtime* is not the
bottleneck — one-shot truth propagations, measurement simulation — a
negative ``exec_time_optimization_effort`` trades a little executable
quality for a much faster compile.

Environment knobs (unset = compiler defaults, no change):

* ``NYX_COMPILE_EFFORT``        — global effort for every nyx program
* ``NYX_COMPILE_EFFORT_<KIND>`` — per-kind override; kinds used today:
  ``PROP`` (trajectory propagation programs), ``OBS`` (ground-station /
  interlink observation batches), ``FILTER`` (the scan OD filter).

Values are XLA's effort scale: floats in [-1, 1], 0 = default. The knob
is semantics-preserving up to floating-point reassociation: optimization
effort can change fusion/scheduling and therefore rounding, so results
may differ in the last bits between efforts (and an AOT-cached executable
compiled at one effort may differ bitwise from a fresh compile at
another — nyx_tpu/aot.py includes the effort in its fingerprint).
"""

from __future__ import annotations

import os
from typing import Optional


def jit_options(kind: str = "") -> Optional[dict]:
    """compiler_options dict for ``jax.jit`` (None = defaults)."""
    v = os.environ.get(f"NYX_COMPILE_EFFORT_{kind.upper()}") if kind else None
    if v is None:
        v = os.environ.get("NYX_COMPILE_EFFORT")
    if v in (None, ""):
        return None
    try:
        return {"exec_time_optimization_effort": float(v)}
    except ValueError:
        return None
