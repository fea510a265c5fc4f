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


def _safe_arccos(x):
    """arccos with a finite gradient at |x| -> 1 (the double-where trick:
    arccos'(+-1) is infinite, and under jax.jvp an inf * 0 from a clip
    produces NaN tangents — this NaN'd STM propagation of any SRP-bearing
    dynamics in the common no-eclipse geometry)."""
    inside = jnp.abs(x) < 1.0 - 1e-12
    xs = jnp.where(inside, x, 0.0)
    return jnp.where(inside, jnp.arccos(xs), jnp.where(x > 0.0, 0.0, jnp.pi))


def _safe_sqrt(x):
    good = x > 1e-300
    return jnp.where(good, jnp.sqrt(jnp.where(good, x, 1.0)), 0.0)


def _apparent_overlap_fraction(ang, r_sun_app, r_occ_app):
    """Fraction of the Sun's apparent disk covered by the occulter's disk.

    Branch selection happens on masked inputs so every branch stays
    NaN-free under forward-mode AD (STM propagation differentiates through
    this in the no-overlap regime almost everywhere).
    """
    eps = 1e-30
    full = r_occ_app >= r_sun_app + 0.0
    no_overlap = ang >= r_sun_app + r_occ_app
    contained = ang <= jnp.abs(r_occ_app - r_sun_app)
    partial = (~no_overlap) & (~contained)
    # circle-circle intersection (lens) area, masked to the partial branch
    d = jnp.where(partial, jnp.maximum(ang, eps), 1.0)
    r1, r2 = r_sun_app, r_occ_app
    d1 = (d * d + r1 * r1 - r2 * r2) / (2 * d)
    d2 = d - d1
    a1 = r1 * r1 * _safe_arccos(d1 / jnp.maximum(r1, eps)) - d1 * _safe_sqrt(
        r1 * r1 - d1 * d1
    )
    a2 = r2 * r2 * _safe_arccos(d2 / jnp.maximum(r2, eps)) - d2 * _safe_sqrt(
        r2 * r2 - d2 * d2
    )
    lens = a1 + a2
    sun_area = jnp.pi * r1 * r1
    frac_partial = jnp.clip(lens / jnp.maximum(sun_area, eps), 0.0, 1.0)

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
    r_sun_app = jnp.arcsin(jnp.clip(sun_radius_km / d_sun, 0.0, 1.0 - 1e-12))
    r_occ_app = jnp.arcsin(jnp.clip(occ_radius_km / d_occ, 0.0, 1.0 - 1e-12))
    cosang = jnp.sum(r_sc_to_sun * r_sc_to_occ, axis=-1) / (d_sun * d_occ)
    ang = _safe_arccos(cosang)
    frac = _apparent_overlap_fraction(ang, r_sun_app, r_occ_app)
    # A body between us and the Sun only occults when it is closer than the Sun
    return jnp.where(d_occ < d_sun, frac, 0.0)


def illumination_factor(r_sc_to_sun, occulters):
    """k in [0..1]: 1 fully lit, 0 umbra. `occulters`: list of
    (r_sc_to_body [...,3], radius_km). Max occultation wins, as the
    reference's ShadowModel::compute (eclipse.rs:69-84)."""
    occ = jnp.zeros(r_sc_to_sun.shape[:-1], dtype=r_sc_to_sun.dtype)
    for r_occ, radius in occulters:
        occ = jnp.maximum(
            occ, occultation_percentage(r_sc_to_sun, r_occ, radius)
        )
    return 1.0 - occ


class EclipseState:
    """Occultation result (eclipse.rs EclipseState): percentage in [0, 1]."""

    def __init__(self, percentage: float):
        self.percentage = float(percentage)

    @property
    def is_umbra(self) -> bool:
        return self.percentage >= 1.0 - 1e-9

    @property
    def is_penumbra(self) -> bool:
        return 0.0 < self.percentage < 1.0

    @property
    def is_visible(self) -> bool:
        return self.percentage <= 1e-9

    def __str__(self):
        if self.is_umbra:
            return "Umbra"
        if self.is_visible:
            return "Visibilis"
        return f"Penumbra {self.percentage*100:.2f}%"


class ShadowModel:
    """Max-occultation over a list of shadow bodies (eclipse.rs:35-87)."""

    def __init__(self, shadow_bodies, almanac=None):
        from ..constants import NAIF, RADIUS_BY_NAIF

        self.shadow_bodies = tuple(shadow_bodies)
        self.almanac = almanac

    @classmethod
    def cislunar(cls, almanac=None) -> "ShadowModel":
        from ..constants import NAIF

        return cls((NAIF.EARTH, NAIF.MOON), almanac)

    def _almanac(self):
        if self.almanac is None:
            from ..ephem.almanac import default_almanac

            self.almanac = default_almanac()
        return self.almanac

    def compute(self, orbit, almanac=None) -> EclipseState:
        """Eclipse state of an Orbit (scalar host call)."""
        from ..constants import NAIF, RADIUS_BY_NAIF

        alm = almanac or self._almanac()
        center = orbit.frame.center
        t_tdb = orbit.epoch.to_tdb_seconds()
        r = jnp.asarray(orbit.r_km)
        r_sun = jnp.asarray(alm.position(NAIF.SUN, center, t_tdb)) - r
        pct = 0.0
        for body in self.shadow_bodies:
            if body == center:
                r_occ = -r
            else:
                r_occ = jnp.asarray(alm.position(body, center, t_tdb)) - r
            pct = max(
                pct,
                float(occultation_percentage(r_sun, r_occ, RADIUS_BY_NAIF[body])),
            )
        return EclipseState(pct)

    def percentages(self, traj, step_s: float = 60.0):
        """(epochs_rel_s [K], percentage [K]) sampled along a trajectory,
        vectorized on device — drives umbra/penumbra event search."""
        import numpy as np

        from ..constants import NAIF, RADIUS_BY_NAIF

        alm = self._almanac()
        center = traj.template.frame.center
        ts = np.arange(float(traj.ts[0]), float(traj.ts[-1]) + 1e-9, step_s)
        rs = np.stack([traj.interpolate(t)[:3] for t in ts])
        epoch0 = traj.epoch0
        t_tdb = epoch0.to_tdb_seconds() + ts
        table = alm.build_table(
            [NAIF.SUN] + [b for b in self.shadow_bodies if b != center],
            center, epoch0 + float(ts[0]), epoch0 + float(ts[-1]),
        )
        r = jnp.asarray(rs)
        tt = jnp.asarray(t_tdb)
        r_sun = table.position(table.index_of(NAIF.SUN), tt) - r
        pct = jnp.zeros(len(ts))
        for body in self.shadow_bodies:
            if body == center:
                r_occ = -r
            else:
                r_occ = table.position(table.index_of(body), tt) - r
            pct = jnp.maximum(
                pct, occultation_percentage(r_sun, r_occ, RADIUS_BY_NAIF[body])
            )
        return ts, np.asarray(pct)

    def find_eclipse_events(self, traj, threshold: float = 1e-6,
                            step_s: float = 60.0):
        """Entry/exit epochs of eclipse (percentage > threshold), the
        analogue of to_umbra_events/to_penumbra_events (eclipse.rs:87)."""
        import numpy as np

        ts, pct = self.percentages(traj, step_s)
        inside = pct > threshold
        out = []
        for i in range(len(ts) - 1):
            if inside[i] != inside[i + 1]:
                # bisect the crossing
                lo, hi = ts[i], ts[i + 1]
                for _ in range(30):
                    mid = 0.5 * (lo + hi)
                    state = traj.template.set_vector(
                        traj.epoch0 + float(mid), traj.interpolate(mid)[:9]
                    )
                    p = self.compute(state.orbit).percentage
                    if (p > threshold) == bool(inside[i]):
                        lo = mid
                    else:
                        hi = mid
                kind = "exit" if inside[i] else "entry"
                out.append((traj.epoch0 + float(0.5 * (lo + hi)), kind))
        return out
