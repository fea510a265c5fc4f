#!/usr/bin/env python
"""Benchmark: Monte Carlo trajectories/sec/chip (BASELINE.json primary metric).

10k-member LEO ensemble, RK89 adaptive, 21x21 JGM3 gravity + exponential
drag + SRP with Earth shadow, propagated 1 day (config #2). Prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against the north-star rate of 10 000 traj/s
(100k members in <10 s on one chip, BASELINE.json).
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path


def _probe_devices_or_fallback():
    """The axon TPU relay can be down for hours; device discovery then hangs
    forever inside `jax.devices()` (C-level, uninterruptible). Probe it in a
    killable subprocess first; on failure re-exec on the CPU backend so the
    driver still gets a (clearly labeled) artifact instead of a hang."""
    if os.environ.get("NYX_BENCH_PLATFORM"):  # already decided (or fallback)
        return
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print(d[0].platform)"],
            capture_output=True, text=True,
            timeout=float(os.environ.get("NYX_BENCH_PROBE_TIMEOUT_S", 180)),
            env=dict(os.environ),
        )
        if probe.returncode == 0:
            os.environ["NYX_BENCH_PLATFORM"] = probe.stdout.strip() or "unknown"
            return
    except subprocess.TimeoutExpired:
        pass
    # relay down: restart ourselves CPU-only with a small ensemble
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["NYX_BENCH_PLATFORM"] = "cpu-fallback"
    env.setdefault("NYX_BENCH_B", "64")
    env.setdefault("NYX_BENCH_OD_TIMEOUT_S", "600")
    env["PYTHONPATH"] = str(Path(__file__).resolve().parent)
    print("# TPU device discovery hung; re-running on CPU fallback",
          file=sys.stderr, flush=True)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


if __name__ == "__main__":
    _probe_devices_or_fallback()

import jax

# the axon plugin IGNORES the JAX_PLATFORMS env var (it still initializes
# and hangs on a dead relay); only the config update reliably forces CPU
if os.environ.get("NYX_BENCH_PLATFORM") == "cpu-fallback":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent / ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from nyx_tpu import Epoch, Frames, Orbit, Spacecraft
from nyx_tpu.dynamics import (
    Drag,
    Harmonics,
    OrbitalDynamics,
    SolarPressure,
    SpacecraftDynamics,
)
from nyx_tpu.ephem.almanac import Almanac
from nyx_tpu.io.gravity import GravityFieldData
from nyx_tpu.mc import MonteCarlo, MvnSpacecraft, StateDispersion
from nyx_tpu.propagators import IntegratorOptions, Propagator

B = int(os.environ.get("NYX_BENCH_B", 10_000))
DURATION_S = float(os.environ.get("NYX_BENCH_DURATION_S", 86_400.0))


def main():
    here = Path(__file__).resolve().parent
    jgm3 = here / "data" / "JGM3.cof.gz"

    epoch = Epoch.from_gregorian_utc(2021, 3, 4)
    orbit = Orbit.keplerian(7136.6, 2e-4, 51.6, 30.0, 65.0, 80.0, epoch, Frames.EME2000)
    sc = Spacecraft.new(orbit, 100.0, 0.0, 2.0, 2.0, 1.8, 2.2)

    stor = GravityFieldData.from_cof(jgm3, 21, 21, True, Frames.IAU_EARTH)
    dynamics = SpacecraftDynamics(
        # split precision: closed-form f64 J2+J3 + the rest of the field in
        # one f32 recursion. Validated sub-meter vs full f64 on the nominal
        # lane over this 1-day arc (tests/test_dynamics.py::
        # test_split_precision_harmonics_validated_leo); across a 10k
        # dispersed ensemble the split-vs-mixed spread is 0.46 m median /
        # 2.6 m max. 1.76x faster than "mixed" on TPU (f32 VPU rate for the
        # whole recursion instead of emulated f64 low degrees).
        # backend="auto" resolves to the VMEM-resident Pallas kernel
        # (gravity_pallas.py) for the f32 part on a real TPU — measured
        # 4,548 vs 3,277 traj/s over the XLA recursion (2026-08-19) — and
        # to the XLA recursion elsewhere; NYX_BENCH_GRAV_BACKEND overrides.
        OrbitalDynamics.from_model(
            Harmonics.from_stor(
                stor, precision="split",
                backend=os.environ.get("NYX_BENCH_GRAV_BACKEND", "auto"),
            ),
            Frames.EME2000,
        ),
        (SolarPressure.default(), Drag.earth_exp()),
    )
    # GMAT-default step bounds (options.rs:42-61); RK89 at 1e-9 tolerance.
    # stage_mode="unroll" removes the inner stage scan and its ~0.3 ms/
    # iteration axon floor (2.5x compile time, cached across runs).
    from dataclasses import replace

    opts = replace(
        IntegratorOptions.with_adaptive_step(0.1, 2700.0, 1e-9),
        stage_mode=os.environ.get("NYX_BENCH_STAGE_MODE", "unroll"),
        steps_per_iter=int(os.environ.get("NYX_BENCH_STEPS_PER_ITER", 1)),
        # scan mode trades the while_loop's early exit for a fixed trip
        # count (sweep row; see docs/OD_PIPELINE.md on the axon
        # while-dispatch degradation). Status is checked via n_ok.
        loop_mode=os.environ.get("NYX_BENCH_LOOP_MODE", "while"),
        scan_iterations=int(os.environ.get("NYX_BENCH_SCAN_ITERS", 768)),
    )
    prop = Propagator.rk89(dynamics, opts)

    mvn = MvnSpacecraft(
        sc,
        [
            StateDispersion("sma", 0.5),
            StateDispersion("inc", 0.01),
            StateDispersion("raan", 0.01),
        ],
    )
    mc = MonteCarlo(mvn, seed=42)
    alm = Almanac()
    end = epoch + DURATION_S

    # One device call for the whole ensemble: the round-1 B>=4096 runtime
    # fault is gone, and a single 10k-lane program beats 2048-lane chunking
    # by ~2x (less per-call dispatch, better VPU occupancy). Set
    # NYX_BENCH_CHUNK>0 to re-enable chunked dispatch.
    chunk = int(os.environ.get("NYX_BENCH_CHUNK", 0))
    kw = dict(max_lanes_per_call=chunk) if chunk else {}

    # NYX_BENCH_MODE=encke: float32 deviation propagation around one f64
    # reference with the AB8/AM PECE fixed-step main loop (mc/encke.py),
    # validated to sub-10 m ensemble accuracy against the full-state
    # propagation (tests/test_monte_carlo.py). Measured SLOWER than the
    # full-state path on the real TPU (1,460 vs 3,220 traj/s, 2026-08-17
    # sweep) — the scan's per-iteration dispatch floor dominates its tiny
    # per-step compute — so the default is the full-state path below.
    if os.environ.get("NYX_BENCH_MODE", "full") == "encke":
        ekw = dict(
            step_mode=os.environ.get("NYX_BENCH_ENCKE_STEP", "fixed"),
            integ=os.environ.get("NYX_BENCH_ENCKE_INTEG", "abm"),
        )
        if os.environ.get("NYX_BENCH_ENCKE_DT"):
            ekw["dt_s"] = float(os.environ["NYX_BENCH_ENCKE_DT"])
        try:
            mc.run_until_epoch_encke(prop, alm, end, B, **ekw)  # compile+ref
            t0 = time.time()
            results = mc.run_until_epoch_encke(prop, alm, end, B, **ekw)
            wall = time.time() - t0
            ok = results.n_ok
            if ok != results.n_runs:
                raise RuntimeError(f"only {ok}/{results.n_runs} lanes ok")
            rate = ok / wall
            print(json.dumps({
                "metric": (
                    "MC traj/s/chip (10k LEO, 21x21 JGM3 + drag + SRP, "
                    f"1 day; encke f32 deviation mode, {ekw['integ']})"
                ),
                "value": round(rate, 2), "unit": "traj/s",
                "vs_baseline": round(rate / 10_000.0, 4),
                "wall_s": round(wall, 3), "n_ok": ok,
                "mean_steps": float(np.mean(results.n_accepted)),
                "platform": os.environ.get("NYX_BENCH_PLATFORM", "unknown"),
                "B": B,
            }))
            return
        except Exception as exc:  # noqa: BLE001 — fall back to full-state
            print(f"# encke mode failed ({exc}); falling back to full-state",
                  file=sys.stderr, flush=True)

    # warmup/compile at the SAME batch size (shape-keyed jit cache), short
    # arc; also pre-compiles the B-sized sampler so the timed region is
    # pure propagation throughput
    mc.run_until_epoch(prop, alm, epoch + 120.0, B, **kw)
    t0 = time.time()
    results = mc.run_until_epoch(prop, alm, end, B, **kw)
    jax.block_until_ready  # results already materialized as numpy
    wall = time.time() - t0

    ok = results.n_ok
    rate = ok / wall

    # secondary driver metric: OD filter steps/sec (scan Kalman filter,
    # range/Doppler arc over a harmonics field). Run in a subprocess with
    # a hard timeout: neither a runtime fault nor a pathological axon
    # compile hang may lose the MC result (signals cannot interrupt a
    # blocking C-level XLA compile call).
    od_rate = None
    od_flagship_rate = None
    failures = []
    try:
        import subprocess

        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--od-only"],
            capture_output=True,
            text=True,
            timeout=float(os.environ.get("NYX_BENCH_OD_TIMEOUT_S", 900)),
            cwd=str(here),
        )
        for line in r.stdout.splitlines():
            if line.startswith("OD_STEPS_PER_S="):
                od_rate = float(line.split("=", 1)[1])
            if line.startswith("OD_FLAGSHIP_STEPS_PER_S="):
                od_flagship_rate = float(line.split("=", 1)[1])
        if od_rate is None:
            failures.append(f"od bench failed: {r.stderr[-300:]}")
            print(f"# od bench failed: {r.stderr[-400:]}", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        failures.append(f"od bench: {exc}")
        print(f"# od bench skipped: {exc}", file=sys.stderr)

    out = {
        "metric": "MC trajectories/sec/chip (10k LEO, RK89 adaptive, 21x21 JGM3 + drag + SRP, 1 day)",
        "value": round(rate, 2),
        "unit": "traj/s",
        "vs_baseline": round(rate / 10_000.0, 4),
        "wall_s": round(wall, 3),
        "n_ok": ok,
        "n_runs": results.n_runs,
        "mean_steps": float(np.mean(results.n_accepted)),
        "platform": os.environ.get("NYX_BENCH_PLATFORM", "unknown"),
        "B": B,
        "duration_s": DURATION_S,
        # explicit null when the OD leg failed: artifacts must fail loudly
        # (a silently missing key cost round 2 half the driver metric)
        "od_filter_steps_per_s": round(od_rate, 1) if od_rate is not None else None,
        # flagship semantics (VERDICT r4 item 4): the same MEO arc with
        # two-way devices + SNC + 3-sigma rejection through the segmented
        # reference-update EKF (reference trk_device.rs:49-138 +
        # filtering.rs:186-202 semantics together)
        "od_flagship_steps_per_s": (
            round(od_flagship_rate, 1) if od_flagship_rate is not None else None
        ),
        "grav_backend": os.environ.get("NYX_BENCH_GRAV_BACKEND", "auto"),
        "git_sha": _git_sha(),
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))


def _git_sha():
    try:
        import subprocess

        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=str(Path(__file__).resolve().parent), timeout=10,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001
        return None


def _od_filter_steps_per_s(epoch, stor):
    """Time the device-side scan Kalman filter over a synthetic MEO
    range/Doppler arc with 21x21 harmonics dynamics (the 'OD filter
    steps/sec' metric of BASELINE.json, on a harmonics-bearing config)."""
    from nyx_tpu.od import (
        GroundStation,
        KfEstimate,
        MeasurementType,
        SpacecraftUncertainty,
        TrackingArcSim,
        TrkConfig,
    )
    from nyx_tpu.od.noise import StochasticNoise, WhiteNoise
    from nyx_tpu.od.scan_filter import ScanKalmanOD
    from nyx_tpu.od.simulator import Scheduler

    eme2k = Frames.EME2000
    orbit = Orbit.keplerian(22_000.0, 0.01, 30.0, 80.0, 40.0, 0.0, epoch, eme2k)
    truth = Spacecraft.from_orbit(orbit)
    dyn = SpacecraftDynamics(
        OrbitalDynamics.from_model(
            Harmonics.from_stor(stor, precision="split"), eme2k
        ),
        (),
    )
    def _stage(msg):
        print(f"# od: {msg} t={time.time() - _T0:.0f}s", file=sys.stderr,
              flush=True)

    _T0 = time.time()
    from dataclasses import replace as _replace

    # Truth propagation runs UNROLLED stages: at B=1 the stage-scan pays
    # the axon per-iteration floor 15x per RK step, and the unrolled
    # 21x21-with-Pallas body is cheap to compile (measured 2026-08-19:
    # 0.27 s run + ~80 s compile vs 15 s run in loop mode). The filter
    # itself is built on default (loop-mode) options — only its internal
    # reference propagation unrolls, which ScanKalmanOD already forces.
    prop = Propagator.rk89(dyn, IntegratorOptions())
    # loop_mode="scan": keep this process free of while_loop programs so
    # every later dispatch (the staged filter especially) stays on the
    # axon fast path — executing ONE while program degrades the session
    # to ~400 ms/dispatch for scan-bearing executables (measured
    # 2026-08-20, docs/OD_PIPELINE.md). 1024 trips cover the ~300
    # attempted steps of this arc with 3x margin (status-checked).
    truth_prop = Propagator.rk89(
        dyn, _replace(IntegratorOptions(), stage_mode="unroll",
                      loop_mode="scan", scan_iterations=1024)
    )
    _, traj = truth_prop.with_state(truth).for_duration_with_traj(86_400.0)
    _stage("truth traj done")

    def white(gs, two_way=False):
        gs.stochastic_noises = {
            MeasurementType.RANGE_KM: StochasticNoise(WhiteNoise(2.0e-3)),
            MeasurementType.DOPPLER_KM_S: StochasticNoise(WhiteNoise(3.0e-6)),
        }
        if two_way:
            gs.integration_time_s = 60.0
        return gs

    def build_arc(two_way):
        stations = [
            white(GroundStation.dss65_madrid(10.0), two_way),
            white(GroundStation.dss34_canberra(10.0), two_way),
            white(GroundStation.dss13_goldstone(10.0), two_way),
        ]
        cfg = TrkConfig(sampling_s=60.0, scheduler=Scheduler(min_samples=5))
        sim = TrackingArcSim.with_seed(
            stations, traj, {g.name: cfg for g in stations}, seed=0
        )
        return stations, sim.generate_measurements()

    stations, arc = build_arc(False)
    _stage(f"{len(arc)} measurements simulated")
    unc = SpacecraftUncertainty(
        nominal=truth, frame="ric", x_km=0.15, y_km=0.15, z_km=0.15,
        vx_km_s=5e-6, vy_km_s=5e-6, vz_km_s=5e-6,
    )
    est0 = unc.to_estimate()
    aot_dir = str(Path(__file__).resolve().parent / ".jax_cache" / "aot")

    def time_filter(scan, est, arc_):
        scan.process_arc(est, arc_)  # compile (or AOT cache load)
        t0 = time.time()
        sol = scan.process_arc(est, arc_)
        rate = len(arc_) / (time.time() - t0)
        # guard against silent TPU numerics regressions (f64 demotion
        # class): the converged filter must track the truth to well under
        # a meter on this self-consistent arc
        truth_fin = traj.at(
            Epoch.from_tai_seconds_j2000(sol.epochs_tai_s[-1])
        ).to_vector()
        err_m = float(
            np.linalg.norm(sol.final_state()[:3] - truth_fin[:3])
        ) * 1e3
        _stage(f"final position error {err_m:.2f} m")
        if not err_m < 100.0:
            raise RuntimeError(
                f"OD bench filter diverged: {err_m:.1f} m final error"
            )
        return rate

    scan = ScanKalmanOD(
        prop, stations,
        types=(MeasurementType.RANGE_KM, MeasurementType.DOPPLER_KM_S),
        variant="ckf",
        # reduced-order variational equations: the [M, 90] STM stage
        # differentiates a degree-8 field (degree > 8 partials are far
        # below gain relevance; <0.2% of the estimate's truth error on
        # the harmonics parity test) — the stage-2 graph shrinks ~7x for
        # both the remote compiler and the runtime
        stm_jvp_degree=8,
        # f32 filter algebra: the latency-bound 9x9 f64-emulation chain
        # was the s4 floor (~0.35 ms/row); the preconditioned f32 scan
        # measures 11.5x faster (devtools/profile_f32_scan.py) and is
        # parity-tested against f64 Joseph (test_f32_matches_f64). Set
        # NYX_BENCH_OD_ALGEBRA=f64 for the reference-precision run.
        filter_algebra=os.environ.get("NYX_BENCH_OD_ALGEBRA", "f32"),
        # AOT executable cache (nyx_tpu/aot.py): the filter program costs
        # ~6 min of host-side tracing/lowering that jax's persistent
        # compilation cache cannot skip; round 2 lost the OD metric to
        # exactly that (BENCH_r02 --od-only timed out at 900 s)
        aot_dir=aot_dir,
    )
    rate = time_filter(scan, est0, arc)
    _stage(f"base od leg {rate:.0f} steps/s")

    # flagship-semantics leg (VERDICT r4 item 4): the same MEO day arc
    # with two-way averaging + SNC + 3-sigma rejection together
    # (trk_device.rs:49-138, filtering.rs:186-202), through the segmented
    # reference-update EKF, from a dispersed initial state.
    flagship_rate = None
    if not os.environ.get("NYX_BENCH_OD_NO_FLAGSHIP"):
        from nyx_tpu.od import ProcessNoise

        stations2, arc2 = build_arc(True)
        _stage(f"{len(arc2)} two-way measurements simulated")
        rng = np.random.default_rng(7)
        est_d = unc.to_estimate()
        draw = rng.multivariate_normal(np.zeros(9), est_d.covar)
        est_d.nominal = truth.set_vector(
            truth.epoch, truth.to_vector() + draw
        )
        scan2 = ScanKalmanOD(
            prop, stations2,
            types=(MeasurementType.RANGE_KM, MeasurementType.DOPPLER_KM_S),
            variant="ekf",
            process_noise=(ProcessNoise.from_diag([1e-16] * 3, 3600.0),),
            resid_rejection_sigmas=3.0,
            stm_jvp_degree=8,
            filter_algebra=os.environ.get("NYX_BENCH_OD_ALGEBRA", "f32"),
            aot_dir=aot_dir,
        )
        flagship_rate = time_filter(scan2, est_d, arc2)
        _stage(f"flagship od leg {flagship_rate:.0f} steps/s")
    return rate, flagship_rate


if __name__ == "__main__":
    if "--od-only" in sys.argv:
        _epoch = Epoch.from_gregorian_utc(2021, 3, 4)
        _stor = GravityFieldData.from_cof(
            Path(__file__).resolve().parent / "data" / "JGM3.cof.gz",
            21, 21, True, Frames.IAU_EARTH,
        )
        _r, _fr = _od_filter_steps_per_s(_epoch, _stor)
        print(f"OD_STEPS_PER_S={_r:.2f}")
        if _fr is not None:
            print(f"OD_FLAGSHIP_STEPS_PER_S={_fr:.2f}")
    else:
        main()
