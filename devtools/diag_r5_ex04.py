#!/usr/bin/env python
"""Round-5 diagnostic for the ex04 filter-vs-simulator inconsistency.

Zero-noise arc, initial estimate AT truth, rejection+SNC off. Prefit
residuals should be ~interpolation error (<< 2 m). Bisection:
  A. arc measured values vs GroundStation h evaluated at truth-traj states
     (isolates simulator internals — should be ~0)
  B. filter computed (= measured - prefit) vs GroundStation h at truth
     (isolates the filter's _station_obs + its reference interpolation)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.dynamics import Harmonics, OrbitalDynamics, SpacecraftDynamics
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.od import (
    GroundStation,
    MeasurementType,
    SpacecraftUncertainty,
    TrackingArcSim,
    TrkConfig,
)
from nyx_tpu.od.noise import StochasticNoise
from nyx_tpu.od.scan_filter import ScanKalmanOD
from nyx_tpu.od.simulator import Scheduler
from nyx_tpu.propagators import IntegratorOptions, Propagator

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
import importlib

ex04 = importlib.import_module("04_lro_od")

TWO_WAY = os.environ.get("DIAG_TWO_WAY", "1") == "1"

almanac = Almanac()
epoch = Epoch.from_gregorian_utc(2024, 1, 1, 0, 0, 0)
moon_j2000 = Frames.MOON_J2000
orbit = Orbit.keplerian_apsis_radii(
    1737.4 + 110.0, 1737.4 + 50.0, 89.7, 270.0, 30.0, 0.0, epoch,
    moon_j2000.with_mu_km3_s2(4902.800066),
)
truth_sc = Spacecraft.from_orbit(orbit)

degree = int(os.environ.get("DIAG_DEGREE", 8))
hours = float(os.environ.get("DIAG_HOURS", 6.0))
field = ex04.kaula_moon_field(degree)
dyn = SpacecraftDynamics.new(
    OrbitalDynamics.from_model(Harmonics.from_stor(field), moon_j2000)
)
prop = Propagator.rk89(dyn, IntegratorOptions(max_step_s=60.0, tolerance=1e-10))

t0 = time.time()
_, truth_traj = prop.with_state(truth_sc, almanac).for_duration_with_traj(
    hours * 3600.0
)
print(f"truth prop: {time.time()-t0:.0f}s, {len(np.asarray(truth_traj.ts))} nodes")


def lunar_station(name, lat, lon, sigma_rng, sigma_dop):
    from nyx_tpu.od.noise import WhiteNoise
    gs = GroundStation(
        name, lat, lon, 0.0, frame=Frames.IAU_MOON, elevation_mask_deg=5.0,
        integration_time_s=60.0 if TWO_WAY else None,
    )
    gs.stochastic_noises = {
        MeasurementType.RANGE_KM: StochasticNoise(WhiteNoise(sigma_rng)),
        MeasurementType.DOPPLER_KM_S: StochasticNoise(WhiteNoise(sigma_dop)),
    }
    return gs


SITES = [("Shackleton", -89.5, 0.0), ("Malapert", -86.0, 2.9),
         ("Peary", 88.6, 33.0), ("Amundsen", -84.5, 69.9)]
# simulate with ~zero noise; give the FILTER realistic R (2 m / 3 mm/s)
stations = [lunar_station(n, la, lo, 1e-12, 1e-15) for n, la, lo in SITES]
stations_filter = [lunar_station(n, la, lo, 2.0e-3, 3.0e-6)
                   for n, la, lo in SITES]
cfg = TrkConfig(sampling_s=60.0, scheduler=Scheduler(min_samples=3))
sim = TrackingArcSim.with_seed(
    stations, truth_traj, {g.name: cfg for g in stations}, seed=4
)
arc = sim.generate_measurements(almanac)
print(f"{len(arc)} measurements (two_way={TWO_WAY})")

# ---- A: re-evaluate GroundStation h at truth-traj states per row --------
epoch0 = truth_traj.epoch0
t0_tai = epoch0.to_tai_seconds()
t0_tdb = epoch0.to_tdb_seconds()
t_rel = np.asarray(arc.epochs_tai_s) - t0_tai
types = (MeasurementType.RANGE_KM, MeasurementType.DOPPLER_KM_S)
dev_by_name = {g.name: g for g in stations}
device_names = [arc.trackers[j] for j in arc.tracker_idx]

vals_truth = np.zeros((len(arc), 2))
for i, (tr, dname) in enumerate(zip(t_rel, device_names)):
    dev = dev_by_name[dname]
    y_t = truth_traj.interpolate(float(tr))[:6]
    if TWO_WAY:
        tint = float(dev.integration_time_s)
        y_tm = truth_traj.interpolate(float(tr) - tint)[:6]
        h2 = dev.two_way_fn(types)
        vals_truth[i] = np.asarray(h2(t0_tdb + tr, jnp.asarray(y_t),
                                      jnp.asarray(y_tm)))
    else:
        h1 = dev.measurement_fn(types)
        vals_truth[i] = np.asarray(h1(t0_tdb + tr, jnp.asarray(y_t)))

col = [arc.types.index(t) for t in types]
measured = np.asarray(arc.values)[:, col]
dA = measured - vals_truth
print("\n[A] measured - h(truth interp):")
print(f"  range  (m): median {np.median(np.abs(dA[:,0]))*1e3:.3f}  "
      f"max {np.max(np.abs(dA[:,0]))*1e3:.3f}")
print(f"  doppler(mm/s): median {np.median(np.abs(dA[:,1]))*1e6:.3f}  "
      f"max {np.max(np.abs(dA[:,1]))*1e6:.3f}")

# ---- B: run the scan filter from truth, no SNC, no rejection ------------
unc = SpacecraftUncertainty(
    nominal=truth_sc, frame="ric",
    x_km=0.1, y_km=0.1, z_km=0.1,
    vx_km_s=1e-5, vy_km_s=1e-5, vz_km_s=1e-5,
)
est0 = unc.to_estimate()  # nominal = truth, no draw
od = ScanKalmanOD(
    prop, stations_filter, types=types, variant="ckf",
    process_noise=None, resid_rejection_sigmas=None,
    almanac=almanac,
)
t0 = time.time()
sol = od.process_arc(est0, arc)
print(f"\nfilter ran in {time.time()-t0:.0f}s")
prefit = np.asarray(sol.prefit)
computed = measured - prefit
dB = computed - vals_truth
print("[B] filter computed - h(truth interp):")
print(f"  range  (m): median {np.median(np.abs(dB[:,0]))*1e3:.3f}  "
      f"max {np.max(np.abs(dB[:,0]))*1e3:.3f}")
print(f"  doppler(mm/s): median {np.median(np.abs(dB[:,1]))*1e6:.3f}  "
      f"max {np.max(np.abs(dB[:,1]))*1e6:.3f}")
print("\nprefit range (m): median %.3f max %.3f" % (
    np.median(np.abs(prefit[:,0]))*1e3, np.max(np.abs(prefit[:,0]))*1e3))

# ---- C: the failing flagship config — dispersed est0, realistic noise,
# SNC + 3-sigma rejection — with and without relinearization iterations
from nyx_tpu.od import ProcessNoise

sim_noisy = TrackingArcSim.with_seed(
    stations_filter, truth_traj, {g.name: cfg for g in stations_filter},
    seed=4,
)
arc_noisy = sim_noisy.generate_measurements(almanac)
rng = np.random.default_rng(42)
est0c = unc.to_estimate()
draw = rng.multivariate_normal(np.zeros(9), est0c.covar)
est0c.nominal = truth_sc.set_vector(epoch, truth_sc.to_vector() + draw)
print(f"\n[C] flagship semantics, initial error "
      f"{np.linalg.norm(draw[:3])*1e3:.1f} m, {len(arc_noisy)} msr")
for n_it in (1, 2, 3):
    odc = ScanKalmanOD(
        prop, stations_filter, types=types, variant="ckf",
        process_noise=(ProcessNoise.from_diag([1e-16] * 3, 3600.0),),
        resid_rejection_sigmas=3.0, almanac=almanac, iterations=n_it,
    )
    solc = odc.process_arc(est0c, arc_noisy)
    tf = truth_traj.interpolate(
        float(solc.epochs_tai_s[-1] - t0_tai))[:6]
    errc = np.linalg.norm(solc.final_state()[:3] - tf[:3])
    sigc = np.sqrt(np.diag(solc.final_covar())[:3]).max()
    beyond = float(np.mean(solc.ratio > 3.0)) * 100
    print(f"  iterations={n_it}: final err {errc*1e3:8.2f} m  "
          f"sigma {sigc*1e3:7.2f} m  rejected "
          f"{int(np.sum(solc.rejected))}/{len(arc_noisy)}  "
          f"ratio>3s {beyond:.1f}%  ratio med "
          f"{np.median(solc.ratio):.2f}")

nan_rows = np.where(~np.isfinite(prefit[:, 0]))[0]
print(f"\nNaN prefit rows: {len(nan_rows)} of {len(arc)}"
      + (f", first at idx {nan_rows[0]} t_rel={t_rel[nan_rows[0]]:.1f}s "
         f"dev={device_names[nan_rows[0]]}" if len(nan_rows) else ""))

# worst rows detail
dB = np.where(np.isfinite(dB), dB, np.inf)
worst = np.argsort(-np.abs(dB[:, 0]))[:10]
print("\nworst rows by |dB range|:")
print("  idx  t_rel_s   device        dA_rng_m   dB_rng_m")
for i in worst:
    print(f"  {i:4d} {t_rel[i]:9.1f} {device_names[i]:<12} "
          f"{dA[i,0]*1e3:10.3f} {dB[i,0]*1e3:10.3f}")
