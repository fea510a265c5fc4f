"""Ephemeris fidelity envelope (docs/EPHEMERIS_ENVELOPE.md).

The reference flies DE440s + EOP kernels (LFS stubs in this environment);
the repo's analytic fallback (ephem/analytic.py) has published truncation
bounds: Moon (Meeus ch. 47 principal terms) <~ 200 km, Sun/planets
(Standish mean elements) ~ arcminute (<~ 45,000 km at 1 AU). These tests
MEASURE how such worst-case ephemeris offsets propagate into trajectory
error for the framework's flagship configs, so the doc's claims are
test-backed rather than asserted: the third-body acceleration is a tidal
difference, so a source offset delta enters as ~3 a_tide (delta/d) —
meter-level per day even for the Moon's 200 km bound.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from dataclasses import replace

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.constants import NAIF
from nyx_tpu.dynamics import OrbitalDynamics, PointMasses, SpacecraftDynamics
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.propagators import IntegratorOptions, Propagator

EPOCH = Epoch.from_gregorian_utc(2024, 3, 1)


def _final_state_with_offset(orbit, offset_body, offset_km):
    """Propagate 1 day with Sun+Moon point masses; optionally offset one
    body's ephemeris by a constant vector (added to the Chebyshev constant
    term of every record)."""
    alm = Almanac()
    sc = Spacecraft.from_orbit(orbit)
    dyn = SpacecraftDynamics.new(
        OrbitalDynamics.from_models(
            (PointMasses((NAIF.SUN, NAIF.MOON)),), Frames.EME2000
        )
    )
    prop = Propagator.rk89(
        dyn, IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9)
    )
    inst = prop.with_state(sc, alm)
    if offset_body is not None:
        ctx = dyn.build_context(orbit.epoch, 86_400.0, alm)
        idx = ctx.table.index_of(offset_body)
        coeffs = np.asarray(ctx.table.coeffs).copy()
        coeffs[idx, :, :, 0] += np.asarray(offset_km)
        table = replace(ctx.table, coeffs=jnp.asarray(coeffs))
        inst.ctx_override = replace(ctx, table=table)
    return np.asarray(inst.for_duration(86_400.0).to_vector())


@pytest.mark.parametrize(
    "sma_km,body,offset_km,bound_m",
    [
        # Moon offset by its 200 km documented worst-case analytic error
        (7136.6, NAIF.MOON, (200.0, 0.0, 0.0), 2.0),       # LEO
        (42_164.0, NAIF.MOON, (200.0, 0.0, 0.0), 40.0),    # GEO
        # Sun offset by 1 arcminute at 1 AU (~43,500 km, cross-track)
        (7136.6, NAIF.SUN, (0.0, 43_500.0, 0.0), 2.0),     # LEO
        (42_164.0, NAIF.SUN, (0.0, 43_500.0, 0.0), 40.0),  # GEO
    ],
)
def test_third_body_offset_propagated_effect(sma_km, body, offset_km,
                                             bound_m):
    orbit = Orbit.keplerian(sma_km, 1e-3, 28.0, 45.0, 10.0, 0.0, EPOCH,
                            Frames.EME2000)
    nominal = _final_state_with_offset(orbit, None, None)
    shifted = _final_state_with_offset(orbit, body, offset_km)
    delta_m = float(np.linalg.norm(nominal[:3] - shifted[:3])) * 1e3
    print(f"[sma={sma_km} body={body} offset={offset_km}] "
          f"1-day effect: {delta_m:.3f} m", flush=True)
    assert delta_m < bound_m, (
        f"worst-case ephemeris offset propagates to {delta_m:.2f} m/day, "
        f"documented envelope is {bound_m} m"
    )
    assert delta_m > 0.0  # the offset genuinely reached the dynamics
