#!/usr/bin/env python
"""Debug the relinearization back-mapping: after a rejection-off pass,
dev0 = Phi_total^-1 dev_M should approximate -draw (the needed initial
correction)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.dynamics import Harmonics, OrbitalDynamics, SpacecraftDynamics
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.od import (
    GroundStation, MeasurementType, SpacecraftUncertainty,
    TrackingArcSim, TrkConfig,
)
from nyx_tpu.od.noise import StochasticNoise, WhiteNoise
from nyx_tpu.od.scan_filter import ScanKalmanOD, STATE_DIM
from nyx_tpu.od.simulator import Scheduler
from nyx_tpu.propagators import IntegratorOptions, Propagator

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
import importlib

ex04 = importlib.import_module("04_lro_od")

almanac = Almanac()
epoch = Epoch.from_gregorian_utc(2024, 1, 1, 0, 0, 0)
moon_j2000 = Frames.MOON_J2000
orbit = Orbit.keplerian_apsis_radii(
    1737.4 + 110.0, 1737.4 + 50.0, 89.7, 270.0, 30.0, 0.0, epoch,
    moon_j2000.with_mu_km3_s2(4902.800066),
)
truth_sc = Spacecraft.from_orbit(orbit)
field = ex04.kaula_moon_field(8)
dyn = SpacecraftDynamics.new(
    OrbitalDynamics.from_model(Harmonics.from_stor(field), moon_j2000)
)
prop = Propagator.rk89(dyn, IntegratorOptions(max_step_s=60.0, tolerance=1e-10))
_, truth_traj = prop.with_state(truth_sc, almanac).for_duration_with_traj(6 * 3600.0)


def lunar_station(name, lat, lon):
    gs = GroundStation(name, lat, lon, 0.0, frame=Frames.IAU_MOON,
                       elevation_mask_deg=5.0, integration_time_s=60.0)
    gs.stochastic_noises = {
        MeasurementType.RANGE_KM: StochasticNoise(WhiteNoise(2.0e-3)),
        MeasurementType.DOPPLER_KM_S: StochasticNoise(WhiteNoise(3.0e-6)),
    }
    return gs


stations = [lunar_station("Shackleton", -89.5, 0.0),
            lunar_station("Malapert", -86.0, 2.9),
            lunar_station("Peary", 88.6, 33.0),
            lunar_station("Amundsen", -84.5, 69.9)]
cfg = TrkConfig(sampling_s=60.0, scheduler=Scheduler(min_samples=3))
sim = TrackingArcSim.with_seed(stations, truth_traj,
                               {g.name: cfg for g in stations}, seed=4)
arc = sim.generate_measurements(almanac)

rng = np.random.default_rng(42)
unc = SpacecraftUncertainty(nominal=truth_sc, frame="ric",
                            x_km=0.1, y_km=0.1, z_km=0.1,
                            vx_km_s=1e-5, vy_km_s=1e-5, vz_km_s=1e-5)
est0 = unc.to_estimate()
draw = rng.multivariate_normal(np.zeros(9), est0.covar)
est0.nominal = truth_sc.set_vector(epoch, truth_sc.to_vector() + draw)

od = ScanKalmanOD(prop, stations, types=(MeasurementType.RANGE_KM,
                                         MeasurementType.DOPPLER_KM_S),
                  variant="ckf", process_noise=None,
                  resid_rejection_sigmas=None, almanac=almanac)

# manual pass-1 with internals exposed
y0 = jnp.asarray(est0.nominal.to_vector())
p0 = jnp.asarray(est0.covar)
prog, args, ctx, sc_params, epochs0, real = od._setup(est0, arc)
out, n_valid, y_bar, phi = od._run_stages(
    prog["stages"], args, y0, p0, ctx, sc_params, epochs0)
y_est = np.asarray(out[0])
y_bar = np.asarray(y_bar)
phi_h = np.asarray(phi)
dev_all = y_est - y_bar

t0_tai = est0.epoch.to_tai_seconds()
t_rel_rows = np.asarray(args[0])
# true deviation at each row = truth(t) - reference(t) = truth - y_bar
truth_rows = np.stack([truth_traj.interpolate(float(t))[:6]
                       for t in t_rel_rows])
true_dev = truth_rows - y_bar[:, :6]
print("true deviation |pos| m: first %.1f last %.1f max %.1f" % (
    np.linalg.norm(true_dev[0, :3]) * 1e3,
    np.linalg.norm(true_dev[-1, :3]) * 1e3,
    np.max(np.linalg.norm(true_dev[:, :3], axis=1)) * 1e3))
print("filter est dev |pos| m: first %.1f last %.1f" % (
    np.linalg.norm(dev_all[0, :3]) * 1e3,
    np.linalg.norm(dev_all[-1, :3]) * 1e3))
print("est-true dev at last row (m):",
      np.round((dev_all[-1, :3] - true_dev[-1, :3]) * 1e3, 2))

phi_total = np.eye(STATE_DIM)
for k in range(phi_h.shape[0]):
    phi_total = phi_h[k] @ phi_total
print("cond(phi_total) = %.2e" % np.linalg.cond(phi_total))
dev0 = np.linalg.solve(phi_total, dev_all[-1])
print("dev0 (m, pos):", np.round(dev0[:3] * 1e3, 2))
print("-draw (m, pos):", np.round(-draw[:3] * 1e3, 2))
print("dev0 vel (mm/s):", np.round(dev0[3:6] * 1e6, 3))
print("-draw vel (mm/s):", np.round(-draw[3:6] * 1e6, 3))

# sanity: does phi_total map -draw forward to ~ -true_dev[-1]?
fwd = phi_total @ draw
print("phi_total @ draw pos (m):", np.round(fwd[:3] * 1e3, 1))
print("-true_dev[-1] pos (m):", np.round(-true_dev[-1, :3] * 1e3, 1))
