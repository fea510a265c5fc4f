"""SpacecraftDynamics: the composition root.

Counterpart of the reference's `SpacecraftDynamics` (dynamics/spacecraft.rs:
44-364): orbital dynamics + force models (SRP, drag) + optional guidance law
+ propellant decrement. `build_eom` fuses the whole force stack into one
batched EOM closure over `[B, N]` state vectors with the reference's layout
[x,y,z,vx,vy,vz,Cr,Cd,m_prop]; with STM enabled the state widens to
[B, 9+81] and Phi_dot = A Phi is propagated with A from JAX forward-mode AD
(replacing the reference's hyperdual `dual_eom`, spacecraft.rs:312-364).
Guidance-enabled dynamics appends one aux column (guidance mode) handled by
the `finally`-hook equivalent.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import STD_GRAVITY_M_S2
from ..time import Epoch
from .orbital import EomContext, OrbitalDynamics

CORE_DIM = 9
STM_DIM = 81


class SpacecraftDynamics:
    def __init__(
        self,
        orbital_dyn: OrbitalDynamics,
        force_models: Sequence = (),
        guidance=None,
        decrement_mass: bool = True,
        pert_precision: str = "f64",
    ):
        self.orbital_dyn = orbital_dyn
        self.force_models = tuple(force_models)
        self.guidance = guidance
        self.decrement_mass = decrement_mass
        #: "f64": every acceleration at the state dtype (reference parity).
        #: "f32": the TPU speed split — two-body and the state update stay
        #: f64, the ENTIRE perturbation stack (harmonics incl. frame
        #: rotation, third bodies, SRP, drag, tides) evaluates in f32.
        #: Perturbations are <= ~1e-5 km/s^2, so their f32 absolute error
        #: (~1e-12 km/s^2) random-walks to well under a meter over day-long
        #: LEO arcs (validated in tests) while skipping all emulated-f64
        #: work in the hot recursion, trig rotations and shadow geometry.
        self.pert_precision = pert_precision

    # reference constructors: SpacecraftDynamics::new / from_models
    @classmethod
    def new(cls, orbital_dyn) -> "SpacecraftDynamics":
        return cls(orbital_dyn)

    @classmethod
    def from_models(cls, orbital_dyn, force_models) -> "SpacecraftDynamics":
        return cls(orbital_dyn, force_models)

    @classmethod
    def from_guidance_law(cls, orbital_dyn, guidance, decrement_mass=True):
        return cls(orbital_dyn, (), guidance, decrement_mass)

    def with_guidance_law(self, guidance) -> "SpacecraftDynamics":
        return SpacecraftDynamics(
            self.orbital_dyn, self.force_models, guidance, self.decrement_mass
        )

    @property
    def has_guidance(self) -> bool:
        return self.guidance is not None

    def state_dim(self, with_stm: bool = False) -> int:
        n = CORE_DIM + (STM_DIM if with_stm else 0)
        if self.has_guidance:
            n += 1  # guidance mode column (last)
        return n

    def required_bodies(self):
        bodies = list(self.orbital_dyn.required_bodies())
        for fm in self.force_models:
            bodies.extend(fm.required_bodies())
        if self.guidance is not None:
            bodies.extend(getattr(self.guidance, "required_bodies", lambda: ())())
        seen, out = set(), []
        center = self.orbital_dyn.frame.center
        for b in bodies:
            if b != center and b not in seen:
                seen.add(b)
                out.append(b)
        return out

    def build_context(self, epoch0: Epoch, duration_s: float, almanac=None) -> EomContext:
        frame = self.orbital_dyn.frame
        bodies = self.required_bodies()
        table = None
        body_index = {}
        if bodies:
            if almanac is None:
                from ..ephem.almanac import default_almanac

                almanac = default_almanac()
            end = epoch0 + max(duration_s, 0.0)
            start = epoch0 + min(duration_s, 0.0)
            table = almanac.build_table(bodies, frame.center, start, end)
            body_index = {b: i for i, b in enumerate(bodies)}
        return EomContext(
            epoch0_tdb=jnp.float64(epoch0.to_tdb_seconds()),
            table=table,
            frame=frame,
        )

    # ------------------------------------------------------------------
    def make_eom(self, with_stm: bool = False, thruster=None):
        """Returns `eom(t_rel_s [B], y [B, N], ctx, sc_params) -> [B, N]`.

        The EOM is pure in (ctx, sc_params): jit the surrounding propagation
        once per dynamics/shape and feed different epochs/ephemeris windows/
        spacecraft constants without retracing. `sc_params` is a dict with
        dry_mass_kg, srp_area_m2, drag_area_m2 (scalars or per-lane [B]).
        """
        guidance = self.guidance
        has_guidance = self.has_guidance
        decrement_mass = self.decrement_mass

        def core_eom(t_rel, y9, ctx, p, mode=None):
            t_tdb = ctx.epoch0_tdb + t_rel
            r = y9[..., 0:3]
            v = y9[..., 3:6]
            cr = y9[..., 6]
            cd = y9[..., 7]
            m_prop = y9[..., 8]
            mass = p["dry_mass_kg"] + m_prop
            sc = dict(
                cr=cr,
                cd=cd,
                srp_area_m2=p["srp_area_m2"],
                drag_area_m2=p["drag_area_m2"],
                mass_kg=mass,
            )
            if (
                self.pert_precision == "f32"
                and r.dtype == jnp.float64
                and self.orbital_dyn.models
            ):
                a = self.orbital_dyn.two_body_accel(ctx, r)
                ap = self.orbital_dyn.perturbation_accel(
                    ctx, t_tdb, r.astype(jnp.float32), v.astype(jnp.float32)
                )
                a = a + ap.astype(r.dtype)
            else:
                a = self.orbital_dyn.accel(ctx, t_tdb, r, v)
            if self.force_models:
                # Force models (SRP/drag) are <= ~1e-9 km/s^2: evaluate them
                # at f32 VPU rate and cast the sum back up. f32 rounding
                # (6e-8 relative of the force) lands at <= 1e-16 of the total
                # acceleration — far below the integrator tolerance — while
                # skipping the ~100x cost of emulated f64 on TPU.
                fdt = jnp.float32 if r.dtype == jnp.float64 else r.dtype
                r32 = r.astype(fdt)
                v32 = v.astype(fdt)
                sc32 = {
                    k: (vv.astype(fdt) if hasattr(vv, "astype") else vv)
                    for k, vv in sc.items()
                }
                f = jnp.zeros_like(r32)
                for fm in self.force_models:
                    f = f + fm.force_per_mass(ctx, t_tdb, r32, v32, sc32)
                a = a + f.astype(r.dtype)
            mdot = jnp.zeros_like(m_prop)
            if guidance is not None:
                u, throttle = guidance.direction_and_throttle(
                    ctx, t_tdb, y9, mode
                )
                # thrust accel km/s^2 = throttle * F / (m * 1000)
                f_n = throttle * thruster.thrust_N
                a = a + (f_n / (mass * 1e3))[..., None] * u
                if decrement_mass:
                    mdot = -f_n / (thruster.isp_s * STD_GRAVITY_M_S2)
            zeros = jnp.zeros_like(cr)
            return jnp.concatenate(
                [v, a, jnp.stack([zeros, zeros, mdot], axis=-1)], axis=-1
            )

        if not with_stm and not has_guidance:
            return lambda t, y, ctx, p: core_eom(t, y, ctx, p)

        def eom(t_rel, y, ctx, p):
            y9 = y[..., 0:CORE_DIM]
            mode = y[..., -1] if has_guidance else None
            ydot9 = core_eom(t_rel, y9, ctx, p, mode)
            parts = [ydot9]
            if with_stm:
                # A = d(ydot9)/d(y9): 9 forward-mode passes, batched
                def jvp_col(e):
                    return jax.jvp(
                        lambda yy: core_eom(t_rel, yy, ctx, p, mode),
                        (y9,),
                        (jnp.broadcast_to(e, y9.shape),),
                    )[1]

                # cols[j] = A @ e_j -> A[b, i, j] = cols[j, b, i]
                cols = jax.vmap(jvp_col)(jnp.eye(CORE_DIM, dtype=y.dtype))
                a_mat = jnp.moveaxis(cols, 0, -1)  # [B, 9, 9]
                phi = y[..., CORE_DIM : CORE_DIM + STM_DIM].reshape(
                    y.shape[:-1] + (9, 9)
                )
                phi_dot = jnp.einsum("...ij,...jk->...ik", a_mat, phi)
                parts.append(phi_dot.reshape(y.shape[:-1] + (STM_DIM,)))
            if has_guidance:
                parts.append(jnp.zeros_like(y[..., -1:]))  # mode: no dynamics
            return jnp.concatenate(parts, axis=-1)

        return eom

    def make_finally(self):
        """Post-accepted-step hook factory: guidance mode transitions + Cr
        clamp, the analogue of Dynamics::finally (spacecraft.rs:158-189).
        Returns `finally_fn(t_rel, y, ctx, sc_params)`."""
        guidance = self.guidance

        def finally_fn(t_rel, y, ctx, p):
            y = y.at[..., 6].set(jnp.clip(y[..., 6], 0.0, 2.0))
            if guidance is not None:
                t_tdb = ctx.epoch0_tdb + t_rel
                mode = guidance.next_mode(ctx, t_tdb, y[..., 0:CORE_DIM], y[..., -1])
                y = y.at[..., -1].set(mode)
            return y

        return finally_fn
