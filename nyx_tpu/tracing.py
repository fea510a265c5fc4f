"""Tracing, logging, and profiling (the reference's log/pretty_env_logger +
indicatif progress instrumentation, propagators/instance.rs:160-238,
od/process/mod.rs:403-415, mc/montecarlo.rs:79-89 — re-shaped for the TPU
execution model).

The reference logs every wall-clock minute *inside* its integrator loop;
here a propagation is one asynchronous device call, so the natural logging
points are dispatch / completion (with steps and throughput) plus per-chunk
progress for chunked Monte Carlo and per-decile progress for the host OD
filter loop. Device-side hot loops are profiled with the JAX profiler
(`profile_trace`), not log statements.

Usage:
    import nyx_tpu
    nyx_tpu.enable_logging("info")         # or NYX_LOG=debug in the env
    with nyx_tpu.profile_trace("/tmp/tb"): # XLA trace for TensorBoard/xprof
        mc.run_until_epoch(...)
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

logger = logging.getLogger("nyx_tpu")


def enable_logging(level: str | int | None = None) -> logging.Logger:
    """Attach a stderr handler to the `nyx_tpu` logger (RUST_LOG analog;
    the NYX_LOG env var is the default level, 'warning' otherwise)."""
    if level is None:
        level = os.environ.get("NYX_LOG", "warning")
    if isinstance(level, str):
        level = getattr(logging, level.upper())
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)-5s %(name)s: %(message)s")
        )
        logger.addHandler(h)
    logger.setLevel(level)
    return logger


if os.environ.get("NYX_LOG"):
    enable_logging()


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2):
    """JAX/XLA profiler trace context (view with TensorBoard or xprof).

    The TPU-side replacement for the reference's external flamegraph
    profiling (nyx-core/Cargo.toml:80-83): captures device timelines, HLO
    op costs, and host callbacks for everything executed inside the
    context.
    """
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the profiler timeline
    (jax.profiler.TraceAnnotation passthrough)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class Progress:
    """Decile progress reporter for host-side loops (the OD engine's
    10%-step log of od/process/mod.rs:403-415 and the MC indicatif bar).

    Logs at most every `deciles`-th of `total` and not more than once per
    `min_interval_s` of wall clock; always logs the final step.
    """

    def __init__(self, total: int, what: str = "steps", deciles: int = 10,
                 min_interval_s: float = 5.0):
        self.total = max(int(total), 1)
        self.what = what
        self.every = max(self.total // max(deciles, 1), 1)
        self.min_interval_s = min_interval_s
        self._t0 = time.time()
        self._last_log = 0.0

    def step(self, i: int, extra: str = ""):
        """Call with the 0-based index of the just-completed item."""
        done = i + 1
        if done != self.total and done % self.every:
            return
        now = time.time()
        if done != self.total and now - self._last_log < self.min_interval_s:
            return
        self._last_log = now
        elapsed = now - self._t0
        rate = done / elapsed if elapsed > 0 else float("inf")
        pct = 100.0 * done / self.total
        msg = (f"{pct:3.0f}% ({done}/{self.total} {self.what}, "
               f"{rate:,.1f}/s)")
        if extra:
            msg += f" — {extra}"
        logger.info(msg)

    def done(self, extra: str = ""):
        elapsed = time.time() - self._t0
        msg = f"{self.total} {self.what} in {elapsed:.2f} s"
        if extra:
            msg += f" — {extra}"
        logger.info(msg)
