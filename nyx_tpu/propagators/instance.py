"""PropInstance: host-facing propagation handle.

Counterpart of the reference's `PropInstance` (propagators/instance.rs:41-
499) minus the hot loop, which lives in integrator.py as the batched
while-loop kernel. This wrapper packs a `Spacecraft` (or a batch) into flat
state vectors, builds the ephemeris context, runs the jitted kernel and
unpacks results. The jitted kernel is cached per (dynamics, method, options,
shape) so repeated propagations (OD, targeting) do not retrace.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmic.spacecraft import Spacecraft
from ..time import Duration, Epoch
from . import integrator
from .integrator import DONE, FAILED_NAN
from ..errors import EventError, PropagationError, TrajError


def _secs(x) -> float:
    if isinstance(x, Duration):
        return x.to_seconds()
    return float(x)


class PropInstance:
    def __init__(self, prop, state: Spacecraft, almanac=None):
        self.prop = prop
        self.state = state
        self.almanac = almanac
        self._eom_cache = {}
        self._jit_cache = {}
        #: optional EomContext override (fault-injection / ephemeris
        #: sensitivity studies — tests/test_ephem_envelope.py); None uses
        #: the context built from the almanac per propagation
        self.ctx_override = None
        # IntegratorOptions.integration_frame: transform the state into the
        # requested frame once, up front, and propagate there — the
        # reference's behavior (instance.rs:119-142); results stay in the
        # integration frame.
        iframe = getattr(prop.opts, "integration_frame", None)
        if iframe is not None and iframe != state.frame:
            from dataclasses import replace as _replace

            from ..tracing import logger

            if iframe.center == state.frame.center:
                orbit = _replace(state.orbit, frame=iframe)
            else:
                if almanac is None:
                    raise PropagationError(
                        "integration_frame with a different center needs an "
                        "almanac"
                    )
                orbit = almanac.translate_to(state.orbit, iframe)
            logger.info("state transformed to integration frame %s", iframe)
            self.state = state.with_orbit(orbit)

    @property
    def dynamics(self):
        return self.prop.dynamics

    def _eom(self, with_stm):
        key = (with_stm, self.state.thruster)
        if key not in self._eom_cache:
            self._eom_cache[key] = self.dynamics.make_eom(
                with_stm, thruster=self.state.thruster
            )
        return self._eom_cache[key]

    def _pack(self, with_stm):
        sc = self.state
        y = sc.to_vector()
        if with_stm:
            y = np.concatenate([y, (sc.stm if sc.stm is not None else np.eye(9)).ravel()])
        if self.dynamics.has_guidance:
            y = np.concatenate([y, [float(sc.mode)]])
        return jnp.asarray(y)[None, :]

    def _unpack(self, epoch: Epoch, y_row: np.ndarray) -> Spacecraft:
        sc = self.state.set_vector(epoch, y_row[0:9])
        if self.state.stm is not None:
            sc.stm = y_row[9:90].reshape(9, 9).copy()
        if self.dynamics.has_guidance:
            sc.mode = int(round(float(y_row[-1])))
        return sc

    def _compiled(self, with_stm, n_capture, capture_stride):
        key = (with_stm, n_capture, capture_stride)
        if key in self._jit_cache:
            return self._jit_cache[key]
        eom = self._eom(with_stm)
        finally_fn = self.dynamics.make_finally()
        opts, method = self.prop.opts, self.prop.method

        from ..compileopts import jit_options

        @partial(jax.jit, compiler_options=jit_options("prop"))
        def run(y0, duration_s, ctx, sc_params):
            return integrator.propagate(
                eom,
                y0,
                duration_s,
                opts,
                method,
                n_capture=n_capture,
                capture_stride=capture_stride,
                finally_fn=finally_fn,
                eom_args=(ctx, sc_params),
            )

        self._jit_cache[key] = run
        return run

    def _sc_params(self):
        sc = self.state
        return dict(
            dry_mass_kg=sc.dry_mass_kg,
            srp_area_m2=sc.srp_area_m2,
            drag_area_m2=sc.drag_area_m2,
        )

    def _run(self, duration_s: float, n_capture: int = 0, capture_stride: int = 1):
        import time as _time

        from ..tracing import logger as _log

        with_stm = self.state.stm is not None
        ctx = self.ctx_override or self.dynamics.build_context(
            self.state.epoch, duration_s, self.almanac
        )
        y0 = self._pack(with_stm)
        # Pad the single lane to opts.min_lanes identical copies (axon TPU
        # workaround, see IntegratorOptions.min_lanes); lane 0 is read back.
        import os as _os

        pad = int(_os.environ.get("NYX_MIN_LANES", 0)) or getattr(
            self.prop.opts, "min_lanes", 1
        )
        if pad > 1:
            y0 = jnp.tile(y0, (pad, 1))
        run = self._compiled(with_stm, n_capture, capture_stride)
        _t0 = _time.time()
        _log.debug(
            "propagating %.1f s from %s (stm=%s, capture=%d)",
            duration_s, self.state.epoch, with_stm, n_capture,
        )
        res = run(y0, duration_s, ctx, self._sc_params())
        status = int(res.status[0])
        if _log.isEnabledFor(10):  # DEBUG — n_accepted forces a sync
            _log.debug(
                "propagation done in %.3f s (%d accepted steps)",
                _time.time() - _t0, int(res.n_accepted[0]),
            )
        if status == FAILED_NAN:
            raise ArithmeticError(
                "propagation diverged to NaN; try another method or smaller steps"
            )
        if status != DONE:
            raise PropagationError(
                f"propagation did not finish (status={status}); increase "
                f"IntegratorOptions.max_iterations (or scan_iterations in "
                f"loop_mode='scan')"
            )
        new_epoch = self.state.epoch + duration_s
        new_state = self._unpack(new_epoch, np.asarray(res.y[0]))
        self.state = new_state
        return res

    # ---------------- reference API ----------------------------------
    def for_duration(self, duration) -> Spacecraft:
        d = _secs(duration)
        if d == 0.0:
            return self.state
        self._run(d)
        return self.state

    def until_epoch(self, epoch: Epoch) -> Spacecraft:
        return self.for_duration(epoch - self.state.epoch)

    def for_duration_with_traj(self, duration, n_capture: int = 8192):
        from ..md.trajectory import Trajectory

        d = _secs(duration)
        epoch0 = self.state.epoch
        template = self.state
        y0 = np.asarray(self._pack(template.stm is not None))[0]
        res = self._run(d, n_capture=n_capture)
        n = int(res.traj_len[0])
        if n >= n_capture:
            raise TrajError(
                f"trajectory capture buffer saturated ({n_capture} accepted "
                "steps): increase n_capture or the integrator tolerance — an "
                "overflowed buffer would interpolate garbage"
            )
        ts = np.concatenate([[0.0], np.asarray(res.traj_t[0, :n])])
        ys = np.concatenate([y0[None, :], np.asarray(res.traj_y[0, :n])])
        traj = Trajectory.from_capture(epoch0, ts, ys, template)
        return self.state, traj

    def until_epoch_with_traj(self, epoch: Epoch, n_capture: int = 8192):
        return self.for_duration_with_traj(epoch - self.state.epoch, n_capture)

    def until_event(self, max_duration, event, n_capture: int = 8192):
        """Propagate until the first occurrence of `event` (or max_duration).

        The reference's `until_event` (propagators/event.rs:48-86):
        propagate with trajectory capture, then root-solve the event
        g-function on the Hermite-interpolated trajectory. Returns
        (state_at_event, traj).
        """
        return self.until_nth_event(max_duration, event, 0, n_capture)

    def until_nth_event(self, max_duration, event, trigger: int,
                        n_capture: int = 8192):
        """Propagate until the (trigger+1)-th event crossing
        (propagators/event.rs:88-211). Raises if not found."""
        from ..md.events import find_events

        _, traj = self.for_duration_with_traj(max_duration, n_capture)
        details = find_events(traj, event, max_events=trigger + 1)
        if len(details) <= trigger:
            raise EventError(
                f"event {event} not found {trigger + 1} time(s) within "
                f"{_secs(max_duration)} s (found {len(details)})"
            )
        hit = details[trigger]
        state = traj.at(hit.epoch)
        self.state = state
        return state, traj

    def latest_details(self) -> dict:
        return dict(step=None, error=None, attempts=None)
