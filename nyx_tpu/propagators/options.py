"""Integrator options (GMAT defaults), reference: propagators/options.rs:42-61."""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable, Optional

from ..time import Duration
from .error_ctrl import ErrorControl


def _secs(x) -> float:
    return x.to_seconds() if isinstance(x, Duration) else float(x)


@dataclass(frozen=True)
class IntegratorOptions:
    init_step_s: float = 60.0
    min_step_s: float = 1e-3
    max_step_s: float = 2700.0
    tolerance: float = 1e-12
    attempts: int = 50
    fixed_step: bool = False
    error_ctrl: Callable = ErrorControl.RSSCartesianStep
    # Static cap on while-loop iterations (attempted steps) per propagate call;
    # generous default, bump for very long arcs with small max_step.
    max_iterations: int = 200_000
    # TPU perf knobs (numerically irrelevant): stage_mode "auto"/"unroll"/
    # "loop" picks how RK stages are emitted (unroll removes the inner lax
    # scan and its ~0.3 ms/iteration axon floor at ~2.5x compile time);
    # steps_per_iter > 1 advances several masked RK steps per while-loop
    # iteration, amortizing that same floor further.
    stage_mode: str = "auto"
    steps_per_iter: int = 1
    # Main-loop construct: "while" (lax.while_loop, early exit when every
    # lane is done) or "scan" (lax.scan over a FIXED `scan_iterations`
    # trip count; finished lanes no-op through the masked body, so the
    # result is bitwise-identical to "while" when the count suffices —
    # lanes still RUNNING at the end surface status=RUNNING). "scan"
    # exists because the axon TPU runtime permanently degrades a
    # session's dispatch latency (~0.2 ms -> ~400 ms per call on a
    # 1,168-iteration scan, measured 2026-08-20) after ANY while_loop
    # program executes; an all-scan process keeps every later program on
    # the fast path (docs/OD_PIPELINE.md).
    loop_mode: str = "while"
    # "scan" trip count; 0 = derive from the capture-buffer size when one
    # is configured (n_capture * 5/4 + 32) else from max_iterations.
    scan_iterations: int = 0
    # "state": RK stage combinations at the state dtype (exact parity).
    # "f32": the intermediate a-matrix combinations (the weighted k-sums
    # that only feed EOM *inputs*) run in float32 while the state update,
    # the b-combination and the error estimate stay f64 — saves ~half the
    # combo cost on TPU (f64 is emulated) for a stage-state perturbation
    # of ~3e-5 km, i.e. ~1e-8 km/step on the solution (validated in
    # tests/test_propagators.py::test_combo_f32_accuracy).
    combo_precision: str = "state"
    # Pad single-state propagations to this many identical lanes before
    # entering the batched kernel (results read lane 0). The tunneled axon
    # TPU runtime faults on 1-lane ephemeris-bearing while-loops; 8 lanes
    # is free on a 128-lane VPU. Env override: NYX_MIN_LANES.
    min_lanes: int = 1
    # Optional frame to transform the state into before propagating
    # (options.rs:42-61 integration_frame); None = propagate in the
    # state's own frame.
    integration_frame: object = None

    @classmethod
    def with_adaptive_step(
        cls, min_step, max_step, tolerance=1e-12, error_ctrl=ErrorControl.RSSCartesianStep
    ) -> "IntegratorOptions":
        return cls(
            init_step_s=_secs(max_step),
            min_step_s=_secs(min_step),
            max_step_s=_secs(max_step),
            tolerance=tolerance,
            attempts=50,
            fixed_step=False,
            error_ctrl=error_ctrl,
        )

    # alias matching the reference's seconds-based constructor
    with_adaptive_step_s = with_adaptive_step

    @classmethod
    def with_fixed_step(cls, step) -> "IntegratorOptions":
        s = _secs(step)
        return cls(
            init_step_s=s,
            min_step_s=s,
            max_step_s=s,
            tolerance=0.0,
            attempts=0,
            fixed_step=True,
        )

    with_fixed_step_s = with_fixed_step

    @classmethod
    def with_max_step(cls, max_step) -> "IntegratorOptions":
        s = _secs(max_step)
        return cls(init_step_s=s, max_step_s=s)

    @classmethod
    def with_tolerance(cls, tolerance: float) -> "IntegratorOptions":
        return cls(tolerance=tolerance)

    def set_max_step(self, max_step) -> "IntegratorOptions":
        s = _secs(max_step)
        return replace(self, max_step_s=s, init_step_s=min(self.init_step_s, s))
