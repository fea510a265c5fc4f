"""Orbital dynamics: two-body + composable acceleration models.

Mirrors the reference's `OrbitalDynamics` (dynamics/orbital.rs:44-197): the
central two-body term plus a list of `AccelModel`s (spherical harmonics,
third-body point masses, solid tides). Here each model is a small config
object exposing a pure batched `accel(ctx, t_tdb_s, r, v) -> [B, 3]`
function; composition happens in SpacecraftDynamics.build_eom, which fuses
everything into a single EOM closure for the integrator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..constants import GM_BY_NAIF, NAIF
from ..cosmic.frames import Frame, Frames


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["epoch0_tdb", "table", "guidance_params"],
    meta_fields=["frame"],
)
@dataclass(frozen=True)
class EomContext:
    """Per-propagation arrays/constants handed to every model (a pytree, so
    it can be a traced argument of jitted propagation — no retrace when the
    epoch or ephemeris window changes)."""

    epoch0_tdb: object  # TDB s past J2000 of t=0 (scalar array)
    table: object  # EphemTable for third bodies / sun (or None)
    frame: Frame  # integration frame (center + J2000 orientation)
    #: parameter vector(s) for parametric guidance laws ([..., P] array, or
    #: None) — a traced leaf, so the finite-burn targeter re-runs one
    #: compiled propagation with corrected/perturbed maneuvers (the
    #: TPU-native form of the reference's parallel FD, targeter.rs thrust_*)
    guidance_params: object = None

    def body_index(self, body: int) -> int:
        return self.table.index_of(body)


@dataclass(frozen=True)
class PointMasses:
    """Third-body point-mass gravity (reference: dynamics/orbital.rs:178-197).

    The light-time aberration option evaluates the perturber at t - |r|/c.
    """

    bodies: Tuple[int, ...]
    light_time_correction: bool = False

    def __init__(self, bodies, light_time_correction=False):
        object.__setattr__(self, "bodies", tuple(int(b) for b in bodies))
        object.__setattr__(self, "light_time_correction", light_time_correction)

    def required_bodies(self):
        return self.bodies

    def accel(self, ctx: EomContext, t_tdb, r, v):
        a = jnp.zeros_like(r)
        for body in self.bodies:
            if body == ctx.frame.center:
                continue
            mu = GM_BY_NAIF[body]
            idx = ctx.body_index(body)
            rb = ctx.table.position(idx, t_tdb)  # [B, 3] body wrt center
            if self.light_time_correction:
                from ..constants import SPEED_OF_LIGHT_KM_S

                dt = jnp.linalg.norm(rb, axis=-1) / SPEED_OF_LIGHT_KM_S
                rb = ctx.table.position(idx, t_tdb - dt)
            d = rb - r  # spacecraft -> body
            # normalize-first formulation: the axon TPU runtime emulates f64
            # with f32-range exponents, so |x|^3-scale intermediates
            # (~1e24 km^3 for the Sun) overflow under forward-mode AD;
            # unit vectors divided twice keep every intermediate near 1
            dmag = jnp.linalg.norm(d, axis=-1, keepdims=True)
            dhat = d / dmag
            rbmag = jnp.linalg.norm(rb, axis=-1, keepdims=True)
            rbhat = rb / rbmag
            a = a + mu * (dhat / (dmag * dmag) - rbhat / (rbmag * rbmag))
        return a


class OrbitalDynamics:
    """Two-body + sum of accel models in a given inertial frame."""

    def __init__(self, models: Sequence = (), frame: Frame = Frames.EME2000):
        self.models = tuple(models)
        self.frame = frame

    @classmethod
    def two_body(cls, frame: Frame = Frames.EME2000) -> "OrbitalDynamics":
        return cls((), frame)

    @classmethod
    def point_masses(cls, bodies, frame: Frame = Frames.EME2000) -> "OrbitalDynamics":
        return cls((PointMasses(bodies),), frame)

    @classmethod
    def from_model(cls, model, frame: Frame = Frames.EME2000) -> "OrbitalDynamics":
        return cls((model,), frame)

    @classmethod
    def from_models(cls, models, frame: Frame = Frames.EME2000) -> "OrbitalDynamics":
        return cls(tuple(models), frame)

    def with_model(self, model) -> "OrbitalDynamics":
        return OrbitalDynamics(self.models + (model,), self.frame)

    def required_bodies(self):
        out = []
        for m in self.models:
            out.extend(getattr(m, "required_bodies", lambda: ())())
        return out

    def two_body_accel(self, ctx: EomContext, r):
        """Central-body term only, in the dtype of `r`."""
        rmag_kd = jnp.linalg.norm(r, axis=-1, keepdims=True)
        rhat = r / rmag_kd
        return -ctx.frame.mu * rhat / (rmag_kd * rmag_kd)

    def perturbation_accel(self, ctx: EomContext, t_tdb, r, v):
        """Sum of the non-two-body models, in the dtype of `r`."""
        a = jnp.zeros_like(r)
        for m in self.models:
            a = a + m.accel(ctx, t_tdb, r, v)
        return a

    def accel(self, ctx: EomContext, t_tdb, r, v):
        """Total acceleration [B,3] including the central two-body term."""
        return self.two_body_accel(ctx, r) + self.perturbation_accel(
            ctx, t_tdb, r, v
        )
