"""Tracing/observability: progress logging and JAX profiler hooks
(instance.rs:160-238, od/process/mod.rs:403-415 instrumentation parity)."""

import logging

import jax.numpy as jnp
import numpy as np


def test_progress_logs_deciles(caplog):
    from nyx_tpu.tracing import Progress, logger

    logger.setLevel(logging.INFO)
    with caplog.at_level(logging.INFO, logger="nyx_tpu"):
        p = Progress(100, "measurements", min_interval_s=0.0)
        for i in range(100):
            p.step(i, f"{i + 1} accepted, 0 rejected")
    msgs = [r.message for r in caplog.records]
    assert len(msgs) == 10
    assert "100% (100/100 measurements" in msgs[-1]
    assert "100 accepted" in msgs[-1]


def test_od_process_logs_progress(caplog):
    """The host OD loop emits decile progress with accept/reject counts."""
    from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
    from nyx_tpu.dynamics import OrbitalDynamics, SpacecraftDynamics
    from nyx_tpu.od import (
        GroundStation,
        KalmanODProcess,
        SpacecraftUncertainty,
        TrackingArcSim,
        TrkConfig,
    )
    from nyx_tpu.od.simulator import Scheduler
    from nyx_tpu.propagators import IntegratorOptions, Propagator
    from nyx_tpu.tracing import logger

    epoch = Epoch.from_gregorian_utc(2021, 3, 4)
    orbit = Orbit.keplerian(22000.0, 0.01, 30.0, 80.0, 40.0, 0.0, epoch,
                            Frames.EME2000)
    truth = Spacecraft.from_orbit(orbit)
    dyn = SpacecraftDynamics.new(OrbitalDynamics.two_body(Frames.EME2000))
    prop = Propagator.rk89(dyn, IntegratorOptions())
    _, traj = prop.with_state(truth).for_duration_with_traj(7200.0)
    gs = GroundStation.dss65_madrid(10.0)
    cfg = TrkConfig(sampling_s=120.0, scheduler=Scheduler(min_samples=2))
    sim = TrackingArcSim.with_seed([gs], traj, {gs.name: cfg}, seed=0)
    arc = sim.generate_measurements()
    assert len(arc) > 0
    unc = SpacecraftUncertainty(
        nominal=truth, frame="ric", x_km=0.1, y_km=0.1, z_km=0.1,
        vx_km_s=1e-5, vy_km_s=1e-5, vz_km_s=1e-5,
    )
    proc = KalmanODProcess(prop)
    logger.setLevel(logging.INFO)
    with caplog.at_level(logging.INFO, logger="nyx_tpu"):
        proc.process_arc(unc.to_estimate(), arc, [gs])
    assert any("accepted" in r.message for r in caplog.records)


def test_profile_trace_writes(tmp_path):
    """profile_trace captures an XLA trace directory on any backend."""
    import nyx_tpu

    with nyx_tpu.profile_trace(str(tmp_path)):
        with nyx_tpu.annotate("xmul"):
            jnp.square(jnp.arange(8.0)).block_until_ready()
    assert any(tmp_path.rglob("*")), "no trace artifacts written"
