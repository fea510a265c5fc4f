"""Atmospheric drag force models.

Counterpart of the reference's `Drag`/`ConstantDrag`/`AtmDensity`
(dynamics/drag.rs:41-283): Constant, Exponential and StdAtm-1976 densities,
with F = -1/2 * 1e3 * rho * Cd * A * |v_rel| * v_rel / m (km/s^2).

Note: the reference computes the atmosphere-relative velocity by mixing
rotating-frame and inertial-frame components (drag.rs:224-230, flagged by
its own TODO for nyx-space/nyx#317); here the relative velocity is the
physically-consistent v_rel = v - omega x r in the integration frame, with
omega from the drag frame's rotation model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from ..cosmic.frames import Frame, Frames
from ..errors import ConfigError


@dataclass(frozen=True)
class AtmDensity:
    """Density model config (kg/m^3; altitudes in meters as the reference)."""

    kind: str  # "constant" | "exponential" | "stdatm"
    rho: float = 0.0
    rho0: float = 0.0
    r0_m: float = 0.0
    ref_alt_m: float = 1.0
    max_alt_m: float = 1_000_000.0

    @classmethod
    def constant(cls, rho: float) -> "AtmDensity":
        return cls("constant", rho=rho)

    @classmethod
    def exponential(cls, rho0: float, r0_m: float, ref_alt_m: float) -> "AtmDensity":
        return cls("exponential", rho0=rho0, r0_m=r0_m, ref_alt_m=ref_alt_m)

    @classmethod
    def earth_exponential(cls) -> "AtmDensity":
        # reference defaults: drag.rs:52-58
        return cls.exponential(3.614e-13, 700_000.0, 88_667.0)

    @classmethod
    def std_atm1976(cls, max_alt_m: float = 1_000_000.0) -> "AtmDensity":
        return cls("stdatm", max_alt_m=max_alt_m)

    def density(self, alt_km):
        """rho(altitude above mean equatorial radius), kg/m^3, batched."""
        if self.kind == "constant":
            return jnp.full_like(alt_km, self.rho)
        if self.kind == "exponential":
            return self.rho0 * jnp.exp(
                -(alt_km * 1e3 - self.r0_m) / self.ref_alt_m
            )
        if self.kind == "stdatm":
            # 6th-order log10-density polynomial fit (AVS/Basilisk, as used by
            # the reference drag.rs:252-268), valid below max_alt_m.
            scale = (alt_km - 526.8000) / 292.8563
            logdensity = (
                0.34047 * scale**6
                - 0.5889 * scale**5
                - 0.5269 * scale**4
                + 1.0036 * scale**3
                + 0.60713 * scale**2
                - 2.3024 * scale
                - 12.575
            )
            high = 10.0 ** (-7e-5 * alt_km - 14.464)
            return jnp.where(alt_km > self.max_alt_m / 1e3, high, 10.0**logdensity)
        raise ConfigError(self.kind)


@dataclass(frozen=True)
class Drag:
    """Drag force model; `estimate=True` marks Cd (state slot 7) estimable."""

    density: AtmDensity
    frame: Frame = Frames.IAU_EARTH
    estimate: bool = False

    # Prime-meridian rotation rates, rad/s, by orientation (IAU W-dot).
    _EARTH_OMEGA = 360.985_623_5 * jnp.pi / (180.0 * 86_400.0)

    @classmethod
    def earth_exp(cls) -> "Drag":
        return cls(AtmDensity.earth_exponential())

    @classmethod
    def std_atm1976(cls) -> "Drag":
        return cls(AtmDensity.std_atm1976())

    def required_bodies(self):
        return ()

    def estimation_index(self) -> Optional[int]:
        return 7 if self.estimate else None

    def force_per_mass(self, ctx, t_tdb, r, v, sc):
        """Acceleration [B,3] km/s^2. `sc`: dict with cd, drag_area_m2, mass_kg."""
        rmag = jnp.linalg.norm(r, axis=-1)
        alt_km = rmag - (self.frame.radius_km or 0.0)
        rho = self.density.density(alt_km)
        omega = jnp.array([0.0, 0.0, self._EARTH_OMEGA], dtype=r.dtype)
        v_rel = v - jnp.cross(jnp.broadcast_to(omega, r.shape), r)
        vmag = jnp.linalg.norm(v_rel, axis=-1, keepdims=True)
        aom = sc["drag_area_m2"] / sc["mass_kg"]
        return -0.5e3 * (rho * sc["cd"] * aom)[..., None] * vmag * v_rel
