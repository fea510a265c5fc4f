"""Conical shadow / occultation model (device functions).

Counterpart of the reference's `ShadowModel` (cosmic/eclipse.rs:35-87) and
ANISE's `solar_eclipsing`: percentage of the solar disk occulted by one or
more shadow bodies, computed from apparent-disk overlap. Pure, batched and
differentiable; drives SRP shadowing, umbra/penumbra events and eclipse-
gated guidance.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import MeanRadius


def _apparent_overlap_fraction(ang, r_sun_app, r_occ_app):
    """Fraction of the Sun's apparent disk covered by the occulter's disk."""
    eps = 1e-30
    full = r_occ_app >= r_sun_app + 0.0
    # circle-circle intersection (lens) area
    d = jnp.maximum(ang, eps)
    r1, r2 = r_sun_app, r_occ_app
    d1 = (d * d + r1 * r1 - r2 * r2) / (2 * d)
    d2 = d - d1
    a1 = r1 * r1 * jnp.arccos(jnp.clip(d1 / jnp.maximum(r1, eps), -1, 1)) - d1 * jnp.sqrt(
        jnp.maximum(r1 * r1 - d1 * d1, 0.0)
    )
    a2 = r2 * r2 * jnp.arccos(jnp.clip(d2 / jnp.maximum(r2, eps), -1, 1)) - d2 * jnp.sqrt(
        jnp.maximum(r2 * r2 - d2 * d2, 0.0)
    )
    lens = a1 + a2
    sun_area = jnp.pi * r1 * r1
    frac_partial = jnp.clip(lens / jnp.maximum(sun_area, eps), 0.0, 1.0)

    no_overlap = ang >= r_sun_app + r_occ_app
    contained = ang <= jnp.abs(r_occ_app - r_sun_app)
    frac_contained = jnp.where(
        full, 1.0, jnp.clip((r2 * r2) / jnp.maximum(r1 * r1, eps), 0.0, 1.0)
    )
    return jnp.where(
        no_overlap, 0.0, jnp.where(contained, frac_contained, frac_partial)
    )


def occultation_percentage(r_sc_to_sun, r_sc_to_occ, occ_radius_km, sun_radius_km=MeanRadius.SUN):
    """Occulted fraction of the Sun [0..1]. Inputs [..., 3] km from spacecraft."""
    d_sun = jnp.linalg.norm(r_sc_to_sun, axis=-1)
    d_occ = jnp.linalg.norm(r_sc_to_occ, axis=-1)
    r_sun_app = jnp.arcsin(jnp.clip(sun_radius_km / d_sun, 0.0, 1.0))
    r_occ_app = jnp.arcsin(jnp.clip(occ_radius_km / d_occ, 0.0, 1.0))
    cosang = jnp.sum(r_sc_to_sun * r_sc_to_occ, axis=-1) / (d_sun * d_occ)
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    frac = _apparent_overlap_fraction(ang, r_sun_app, r_occ_app)
    # A body between us and the Sun only occults when it is closer than the Sun
    return jnp.where(d_occ < d_sun, frac, 0.0)


def illumination_factor(r_sc_to_sun, occulters):
    """k in [0..1]: 1 fully lit, 0 umbra. `occulters`: list of
    (r_sc_to_body [...,3], radius_km). Max occultation wins, as the
    reference's ShadowModel::compute (eclipse.rs:69-84)."""
    occ = jnp.zeros(r_sc_to_sun.shape[:-1])
    for r_occ, radius in occulters:
        occ = jnp.maximum(
            occ, occultation_percentage(r_sc_to_sun, r_occ, radius)
        )
    return 1.0 - occ
