"""Solar radiation pressure with conical shadow model.

Counterpart of the reference's `SolarPressure` (dynamics/solarpressure.rs:
35-232): cannonball SRP, flux 1367 W/m^2 at 1 AU scaled by (AU/r)^2, Cr * A
area, illumination factor k from the max-occultation shadow model over a
list of shadow bodies. Acceleration points from Sun to spacecraft.
Partials (incl. the d/dCr row, estimation slot 6) come from JAX AD.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp

from ..constants import AU_KM, NAIF, RADIUS_BY_NAIF, SOLAR_FLUX_W_M2, SPEED_OF_LIGHT_M_S
from ..cosmic.eclipse import illumination_factor


@dataclass(frozen=True)
class SolarPressure:
    shadow_bodies: Tuple[int, ...] = (NAIF.EARTH,)
    phi_w_m2: float = SOLAR_FLUX_W_M2
    estimate: bool = False

    @classmethod
    def default(cls, *shadow_bodies) -> "SolarPressure":
        return cls(tuple(shadow_bodies) or (NAIF.EARTH,))

    @classmethod
    def cislunar(cls) -> "SolarPressure":
        return cls((NAIF.EARTH, NAIF.MOON))

    def required_bodies(self):
        return (NAIF.SUN,) + tuple(self.shadow_bodies)

    def estimation_index(self) -> Optional[int]:
        return 6 if self.estimate else None

    def force_per_mass(self, ctx, t_tdb, r, v, sc):
        """Acceleration [B,3] km/s^2. `sc`: dict with cr, srp_area_m2, mass_kg.

        Computed at the dtype of `r`: SRP is <= 1e-9 km/s^2, so f32
        evaluation (see SpacecraftDynamics.force_dtype) costs < 1e-16
        relative of the total acceleration while skipping f64 emulation.
        """
        dt = r.dtype
        sun_idx = ctx.body_index(NAIF.SUN)
        r_sun_c = ctx.table.position(sun_idx, t_tdb, dtype=dt)  # sun wrt center
        r_sc_to_sun = r_sun_c - r
        occulters = []
        for body in self.shadow_bodies:
            radius = RADIUS_BY_NAIF[body]
            if body == ctx.frame.center:
                occulters.append((-r, radius))
            else:
                rb = ctx.table.position(ctx.body_index(body), t_tdb, dtype=dt)
                occulters.append((rb - r, radius))
        k = illumination_factor(r_sc_to_sun, occulters)
        d_sun = jnp.linalg.norm(r_sc_to_sun, axis=-1)
        flux_pressure = (
            k * (self.phi_w_m2 / SPEED_OF_LIGHT_M_S) * (AU_KM / d_sun) ** 2
        )
        u_away = -r_sc_to_sun / d_sun[..., None]
        aom = sc["srp_area_m2"] / sc["mass_kg"]
        return 1e-3 * (sc["cr"] * aom * flux_pressure)[..., None] * u_away
