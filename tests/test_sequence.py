"""Mission-sequencing tests (dynamics/sequence/, tests/propulsion/schedule.rs
pattern): a timeline with a coast, a staging impulse, a finite-burn phase,
and a Terminate."""

import numpy as np
import pytest

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.cosmic.spacecraft import Thruster
from nyx_tpu.dynamics import (
    DiscreteEvent,
    DynamicsConfig,
    ImpulsiveManeuver,
    LocalFrame,
    Maneuver,
    Phase,
    PhysicalProperties,
    PropagatorConfig,
    SpacecraftSequence,
)
from nyx_tpu.propagators import IntegratorOptions

EPOCH = Epoch.from_gregorian_utc(2020, 1, 1, 0, 0, 0)


def _sequence():
    two_body = PropagatorConfig(DynamicsConfig(frame=Frames.EME2000))
    t1 = EPOCH + 1800.0
    t2 = EPOCH + 2400.0
    burn = Maneuver.from_time_invariant(t1, t2, 1.0, [1.0, 0.0, 0.0], LocalFrame.VNC)
    seq = SpacecraftSequence(
        seq={
            EPOCH: Phase.Activity("coast", "two_body"),
            t1: Phase.Activity(
                "burn", "two_body",
                guidance={"law": burn, "thruster_model": "main"},
                on_entry=DiscreteEvent(
                    "staging",
                    properties=PhysicalProperties(dry_mass_kg=20.0),
                ),
            ),
            t2: Phase.Activity("coast2", "two_body"),
            EPOCH + 3000.0: Phase.Terminate(),
        },
        thruster_sets={"main": Thruster(thrust_N=50.0, isp_s=300.0)},
        propagators={"two_body": two_body},
    )
    return seq


def test_validate_requires_terminate():
    seq = _sequence()
    seq.validate()  # ok
    bad = SpacecraftSequence(
        seq={EPOCH: Phase.Activity("a", "two_body")},
        propagators={"two_body": PropagatorConfig(DynamicsConfig())},
    )
    with pytest.raises(ValueError, match="Terminate"):
        bad.validate()
    missing = SpacecraftSequence(
        seq={EPOCH: Phase.Activity("a", "nope"), EPOCH + 1.0: Phase.Terminate()},
    )
    with pytest.raises(ValueError, match="no propagator"):
        missing.validate()


def test_sequence_propagation():
    seq = _sequence()
    orbit = Orbit.keplerian(8000.0, 0.01, 30.0, 0, 0, 0, EPOCH, Frames.EME2000)
    sc = Spacecraft.from_orbit(orbit)
    sc = sc.__class__(
        orbit=orbit, dry_mass_kg=120.0, prop_mass_kg=80.0,
    )
    trajs = seq.propagate(sc)
    assert len(trajs) == 3  # coast, burn, coast2
    # staging dropped 20 kg of dry mass before the burn
    burn_start = trajs[1].first
    assert abs(burn_start.dry_mass_kg - 100.0) < 1e-12
    # the burn consumed propellant at F/(isp*g0)
    burn_end = trajs[1].last
    from nyx_tpu.constants import STD_GRAVITY_M_S2

    expected_burned = 50.0 / (300.0 * STD_GRAVITY_M_S2) * 600.0
    burned = burn_start.prop_mass_kg - burn_end.prop_mass_kg
    assert abs(burned - expected_burned) < 1e-6
    # coast phases preserve mass
    assert abs(trajs[2].last.prop_mass_kg - burn_end.prop_mass_kg) < 1e-12
    # energy increased across the prograde burn
    assert trajs[2].last.orbit.energy_km2_s2 > sc.orbit.energy_km2_s2
    # timeline continuity
    assert abs((trajs[2].last.epoch - EPOCH).to_seconds() - 3000.0) < 1e-6


def test_until_phase_stops_early():
    seq = _sequence()
    orbit = Orbit.keplerian(8000.0, 0.01, 30.0, 0, 0, 0, EPOCH, Frames.EME2000)
    sc = Spacecraft.from_orbit(orbit)
    trajs = seq.propagate(sc, until_phase="burn")
    assert len(trajs) == 1  # only the first coast executed
