"""Device-side sequential Kalman filter: the whole tracking arc in one
`lax.scan`.

The reference's OD engine (od/process/mod.rs:126-437) drives each
measurement from host code; this kernel is the TPU-native re-design the
survey calls for (SURVEY.md §7 "OD's inherently sequential filter loop"):
the measurement sequence becomes `lax.scan` xs, the inter-measurement
propagation is the adaptive RK `while_loop` nested in the scan body, the
station geometry is gathered by tracker index, absent measurement types are
masked with a huge R (so the same compiled program serves any mix of
range/doppler/angles), and the whole filter is one compiled XLA program.
`vmap` it over initial estimates for batched covariance analysis — the
ensemble-of-filters parallelism of SURVEY.md §2.8.

Filter math matches od/kalman/filtering.rs:33-326: Cholesky-whitened
residual ratio for sigma rejection, Cholesky gain, Joseph covariance update
+ symmetrization, piecewise SNC.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cosmic.orbit import ric_dcm, vnc_dcm
from ..xmath import gauss_solve
from ..propagators import integrator
from ..time import Epoch
from .ground_station import geodetic_to_body_fixed, sez_dcm
from .msr import MeasurementType, TrackingDataArc
from ..errors import ConfigError, PropagationError

STATE_DIM = 9


def _station_obs(t_tdb, rv6, lat_deg, lon_deg, height_km, frame, types,
                 lt=0.0):
    """[T] noiseless observations for a station given by traced geodetic
    coordinates (the gatherable form of GroundStation._one_way). `lt` > 0
    applies the downlink light-time backdating (two fixed-point iterations,
    GroundStation._light_time_backdate)."""
    from ..constants import SPEED_OF_LIGHT_KM_S

    r_bf = geodetic_to_body_fixed(
        lat_deg, lon_deg, height_km, frame.radius_km, frame.flattening
    )

    def pos(t):
        return frame.dcm_from_j2000(t).T @ r_bf

    r_st, v_st = jax.jvp(pos, (t_tdb,), (jnp.ones_like(t_tdb),))
    r, v = rv6[0:3], rv6[3:6]
    tau = jnp.linalg.norm(r - r_st) / SPEED_OF_LIGHT_KM_S
    tau = jnp.linalg.norm(r - tau * v - r_st) / SPEED_OF_LIGHT_KM_S
    rv6 = jnp.where(lt > 0.0, jnp.concatenate([r - tau * v, v]), rv6)
    rho_in = rv6[0:3] - r_st
    rhod_in = rv6[3:6] - v_st
    sez = sez_dcm(lat_deg, lon_deg) @ frame.dcm_from_j2000(t_tdb)
    rho = sez @ rho_in
    rho_dot = sez @ rhod_in
    rng = jnp.linalg.norm(rho)
    el = jnp.rad2deg(jnp.arcsin(rho[2] / rng))
    az = jnp.rad2deg(jnp.arctan2(rho[1], -rho[0])) % 360.0
    rr = jnp.dot(rho, rho_dot) / rng
    table = {
        MeasurementType.RANGE_KM: rng,
        MeasurementType.DOPPLER_KM_S: rr,
        MeasurementType.AZIMUTH_DEG: az,
        MeasurementType.ELEVATION_DEG: el,
        MeasurementType.X_KM: rv6[0],
        MeasurementType.Y_KM: rv6[1],
        MeasurementType.Z_KM: rv6[2],
    }
    return jnp.stack([table[t] for t in types])


def _table_state(t_tdb, ts_tab, ys_tab):
    """[6] cubic-Hermite state lookup in a device-resident trajectory
    table (DeviceTrajectory.state_at, gatherable form): ts_tab [K],
    ys_tab [K, 6]."""
    i = jnp.clip(jnp.searchsorted(ts_tab, t_tdb) - 1, 0,
                 ts_tab.shape[0] - 2)
    t0, t1 = ts_tab[i], ts_tab[i + 1]
    h = t1 - t0
    s = (t_tdb - t0) / h
    r0, v0 = ys_tab[i, 0:3], ys_tab[i, 3:6]
    r1, v1 = ys_tab[i + 1, 0:3], ys_tab[i + 1, 3:6]
    s2, s3 = s * s, s * s * s
    r = (
        (2 * s3 - 3 * s2 + 1) * r0 + (s3 - 2 * s2 + s) * h * v0
        + (-2 * s3 + 3 * s2) * r1 + (s3 - s2) * h * v1
    )
    v = (
        (6 * s2 - 6 * s) / h * r0 + (3 * s2 - 4 * s + 1) * v0
        + (-6 * s2 + 6 * s) / h * r1 + (3 * s2 - 2 * s) * v1
    )
    return jnp.concatenate([r, v])


def _interlink_obs(t_tdb, rv6, ts_tab, ys_tab, types):
    """[T] noiseless crosslink observations against a transmitter
    trajectory table (the gatherable form of
    InterlinkTxSpacecraft._link_values). ts_tab [K], ys_tab [K, 6] are
    the tracker's gathered table rows."""
    tx = _table_state(t_tdb, ts_tab, ys_tab)
    r_tx, v_tx = tx[0:3], tx[3:6]
    rho = rv6[0:3] - r_tx
    rho_dot = rv6[3:6] - v_tx
    rng = jnp.linalg.norm(rho)
    rr = jnp.dot(rho, rho_dot) / rng
    table = {
        MeasurementType.RANGE_KM: rng,
        MeasurementType.DOPPLER_KM_S: rr,
        MeasurementType.X_KM: rv6[0],
        MeasurementType.Y_KM: rv6[1],
        MeasurementType.Z_KM: rv6[2],
    }
    return jnp.stack([table[t] for t in types])


@dataclass
class ScanODResult:
    """Stacked filter outputs, one row per measurement."""

    epochs_tai_s: np.ndarray  # [M]
    y_est: np.ndarray  # [M, 9] best estimate (ref + deviation)
    covar: np.ndarray  # [M, 9, 9]
    prefit: np.ndarray  # [M, T]
    postfit: np.ndarray  # [M, T]
    ratio: np.ndarray  # [M]
    rejected: np.ndarray  # [M] bool
    types: Tuple[str, ...] = ()
    # estimate_biases=True: per-row Gauss-Markov bias estimates and their
    # variances, one column per estimated (device, type) lane
    bias_est: Optional[np.ndarray] = None  # [M, nb]
    bias_var: Optional[np.ndarray] = None  # [M, nb]
    bias_lanes: Tuple[Tuple[str, str], ...] = ()  # (device name, type)

    @property
    def accepted(self) -> int:
        return int(np.sum(~self.rejected))

    def final_state(self) -> np.ndarray:
        return self.y_est[-1]

    def final_covar(self) -> np.ndarray:
        return self.covar[-1]

    def to_parquet(self, path) -> str:
        """Export the per-row filter outputs (estimate, sigmas, residuals,
        ratios, accept flags) — the scan-filter analogue of
        ODSolution.to_parquet (solution/export.rs)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = {
            "epoch_tai_s": self.epochs_tai_s,
            "rejected": self.rejected,
            "ratio": self.ratio,
        }
        names = ["x_km", "y_km", "z_km", "vx_km_s", "vy_km_s", "vz_km_s",
                 "mass_kg", "cr", "cd"]
        for j, n in enumerate(names[: self.y_est.shape[1]]):
            cols[n] = self.y_est[:, j]
            cols[f"sigma_{n}"] = np.sqrt(self.covar[:, j, j])
        for j, t in enumerate(self.types):
            cols[f"prefit_{t}"] = self.prefit[:, j]
            cols[f"postfit_{t}"] = self.postfit[:, j]
        pq.write_table(pa.table(cols), str(path))
        return str(path)


class ScanKalmanOD:
    """Compiled-scan OD process over a fixed station set and type tuple.

    The compiled program is cached per (arc length M); re-running with new
    measurements of the same shape does not retrace.
    """

    def __init__(
        self,
        prop,
        devices: Sequence,
        types: Optional[Tuple[str, ...]] = None,
        variant: str = "ckf",
        process_noise=None,
        resid_rejection_sigmas: Optional[float] = None,
        almanac=None,
        prop_mode: str = "batch",
        substeps: int = 1,
        max_gap_s: Optional[float] = None,
        filter_mode: str = "auto",
        aot_dir: Optional[str] = None,
        estimate_biases: bool = False,
        stm_jvp_degree: Optional[int] = None,
        iterations: int = 1,
        segment_rows: int = 32,
        filter_algebra: str = "f64",
    ):
        """`prop_mode`:

        - "batch" (default): the TPU-native staged design. With
          variant="ckf" the whole arc is one pipeline pass (optionally
          `iterations` Gauss-Newton relinearization passes); with
          variant="ekf" the arc runs in `segment_rows`-row segments with
          reference-update folding between them (_process_arc_ekf).
          The CKF linearizes about the nominal trajectory, which does not
          depend on the measurements — so (1) the reference is propagated
          ONCE (adaptive RK, single lane, dense capture) and interpolated
          at every row time with a quintic Hermite (endpoint accelerations
          from one batched EOM call; sub-mm at the clamped <= max_gap_s
          node spacing); (2) the per-row STMs Φ(t_{i-1}→t_i) are advanced
          as ONE [M, 90] batched fixed-step RK call (every gap in
          parallel); (3) the measurement models + H matrices are batched
          with vmapped `jax.linearize`. Only the 9×9 filter algebra stays
          sequential — as a `lax.scan`, or, with `filter_mode="parallel"`,
          as a `lax.associative_scan` (the parallel Kalman filter of
          Särkkä & García-Fernández 2021, exact for the linearized CKF),
          which runs the whole arc in O(log M) sequential depth.
        - "fixed": each scan row advances the reference with
          `substeps` fixed RK steps spanning exactly the inter-measurement
          gap; gaps longer than `max_gap_s` (default min(max_step, 300 s))
          are bridged by inserting masked time-update-only rows on the
          host, mirroring the reference's <=max_step chunking
          (od/process/mod.rs:215-241). No lax loop remains inside the scan
          body. Supports a per-row EKF (relinearize about the updated
          estimate every row — sequential; prefer the batched segmented
          EKF unless per-row folding is specifically needed).
        - "adaptive": the round-1 behavior, a nested adaptive-RK
          while_loop per measurement.

        `filter_mode` (batch mode only): "scan" (sequential 9×9 scan,
        exact sigma-rejection semantics), "parallel" (associative scan;
        sigma rejection via an iterated two-pass gate — converges to the
        sequential accept/reject set except for rows right at the
        threshold), or "auto" (= "scan": measured fastest on TPU — the
        tiny fixed-size step body has no per-iteration scan cost, so the
        sequential scan beats the associative scan's heavy compose at
        realistic arc lengths AND avoids its ~8 min remote compile;
        choose "parallel" explicitly for very long arcs).
        """
        self.prop = prop
        self.devices = list(devices)
        # Reduced-order variational equations for stage 2 (the [M, 90]
        # STM propagation): gradients of any Harmonics model are taken
        # through a field truncated to this degree, while the reference
        # trajectory and measurement models keep the full field. Degree
        # >~8 gravity partials are far below filter-gain relevance, and
        # the 9 JVP passes through the full recursion dominate both the
        # stage-2 runtime and the remote-compiler time for high-degree
        # fields (the reference's hyperdual STM always carries the full
        # field, gravity_field.rs:273-431 — exact but 9x the recursion).
        self.stm_jvp_degree = stm_jvp_degree
        self.types = tuple(types or devices[0].measurement_types)
        self.variant = variant
        # full KalmanODProcess SNC semantics: a chronological sequence of
        # ProcessNoise entries — the LAST whose start epoch has passed is
        # active (snc.rs switchover), with optional exponential decay and
        # RIC/VNC local frames; resolved per row on device from static
        # tables (no carry needed: activation is a pure function of the
        # row epoch)
        if process_noise is None:
            process_noise = ()
        elif not isinstance(process_noise, (tuple, list)):
            process_noise = (process_noise,)
        self.process_noise = tuple(process_noise)
        self.resid_rejection_sigmas = resid_rejection_sigmas
        # relinearization passes (batch mode; see process_arc docstring).
        # Long arcs with a dispersed initial state need >= 2: a fixed
        # reference drifts secularly and the 3-sigma gate then starves
        # the filter of honest measurements.
        self.iterations = max(1, int(iterations))
        self.almanac = almanac
        # variant="ekf" + prop_mode="batch" runs the SEGMENTED pipeline:
        # the arc is cut into fixed-row segments, each processed by the
        # batched CKF stages, and the final estimate of each segment is
        # folded into the reference of the next (the reference's
        # KalmanVariant::ReferenceUpdate semantics, kalman/mod.rs:64-71,
        # at segment granularity). Deviations then stay bounded by the
        # per-segment drift, which keeps the linearization — and the
        # sigma gate — honest on day-long arcs with dispersed starts.
        self.segment_rows = int(segment_rows)
        # "f64" (default) or "f32": dtype of the sequential filter-scan
        # algebra. f32 runs the latency-bound 9x9 chain ~11x faster on
        # the TPU (f64 is software-emulated); safe because the algebra is
        # preconditioned by 1/sqrt(diag(P0)) per lane — see the ffn_sel
        # wrapper in _build_batch and devtools/profile_f32_scan.py.
        if filter_algebra not in ("f64", "f32"):
            raise ConfigError("filter_algebra must be 'f64' or 'f32'")
        self.filter_algebra = filter_algebra
        self.prop_mode = prop_mode
        self.filter_mode = filter_mode
        self.substeps = int(substeps)
        # None -> period-aware default, resolved on first _setup (needs the
        # initial estimate's orbit): node spacing T/24 keeps the quintic
        # Hermite reference interpolation far below measurement noise while
        # letting high orbits take proportionally longer reference steps
        # (buffer sizes drive both axon compile time and the sequential
        # step count of the reference propagation).
        self._max_gap_user = max_gap_s
        self.max_gap_s = float(
            max_gap_s
            if max_gap_s is not None
            else min(prop.opts.max_step_s, 300.0)
        )
        # device family: ground stations (geodetic + frame DCM geometry)
        # or interlink transmitters (device-resident trajectory tables,
        # od/interlink/trk_device.rs:42-100). One compiled observation
        # program per family; mixed sets are not supported in one filter.
        is_link = [hasattr(d, "_dev_traj") for d in devices]
        self._interlink = bool(is_link) and all(is_link)
        if any(is_link) and not self._interlink:
            raise ConfigError(
                "scan filter devices must be all ground stations or all "
                "interlink transmitters"
            )
        if self._interlink and self.prop_mode != "batch":
            raise ConfigError(
                "interlink devices need the batched pipeline "
                "(prop_mode='batch')"
            )
        def stack_tables(pairs):
            """Pad per-device (ts [K_i], ys [K_i, 6]) tables to a common
            length by extending the last interval (monotonic times keep
            searchsorted well-defined; queries never land there — the arc
            is inside the table span). Returns [D, K], [D, K, 6]."""
            k_max = max(len(ts) for ts, _ in pairs)
            ts_rows, ys_rows = [], []
            for ts, ys in pairs:
                ts, ys = np.asarray(ts), np.asarray(ys)
                pad = k_max - len(ts)
                if pad:
                    dt_tail = ts[-1] - ts[-2] if len(ts) > 1 else 1.0
                    ts = np.concatenate(
                        [ts, ts[-1] + dt_tail * np.arange(1, pad + 1)]
                    )
                    ys = np.concatenate(
                        [ys, np.repeat(ys[-1:], pad, axis=0)]
                    )
                ts_rows.append(ts)
                ys_rows.append(ys)
            return (jnp.asarray(np.stack(ts_rows)),
                    jnp.asarray(np.stack(ys_rows)))

        if self._interlink:
            self.station_frame = None
            self._tx_ts, self._tx_ys = stack_tables(
                [(d._dev_traj.ts, d._dev_traj.ys) for d in devices]
            )
            self._lat = self._lon = self._hgt = jnp.zeros(len(devices))
            self._off_ts = self._off_ys = None
        else:
            frames = {d.frame for d in devices}
            if len(frames) != 1:
                raise ConfigError(
                    "all scan-filter stations must share a frame"
                )
            self.station_frame = devices[0].frame
            self._tx_ts = self._tx_ys = None
            # station parameter tables, gathered by tracker index on device
            self._lat = jnp.asarray([d.latitude_deg for d in devices])
            self._lon = jnp.asarray([d.longitude_deg for d in devices])
            self._hgt = jnp.asarray([d.height_km for d in devices])
            # cross-body tracking (GroundStation.with_target_frame): the
            # per-station target-center-relative-to-station-body offset
            # becomes another device-resident Hermite table, gathered by
            # tracker index and ADDED to the spacecraft state before the
            # topocentric geometry (mirrors _shift_to_station_center)
            offs = [getattr(d, "target_center_offset", None)
                    for d in devices]
            if any(o is not None for o in offs):
                if not all(o is not None for o in offs):
                    raise ConfigError(
                        "scan-filter stations must all have a target "
                        "frame offset, or none"
                    )
                if self.prop_mode != "batch":
                    raise ConfigError(
                        "cross-body station offsets need the batched "
                        "pipeline (prop_mode='batch')"
                    )
                self._off_ts, self._off_ys = stack_tables(
                    [(o.ts, o.ys) for o in offs]
                )
            else:
                self._off_ts = self._off_ys = None
        self._lt = jnp.asarray(
            [1.0 if getattr(d, "light_time_correction", False) else 0.0
             for d in devices]
        )
        # two-way integration times (0 = instantaneous one-way); handled
        # in the batched pipeline by a second reference interpolation at
        # t - T_int (the "rolling dense-output window" of SURVEY §7),
        # mirroring the host path's averaged observation with partials at
        # the measurement epoch (trk_device.rs:49-138; process.py _h_fns)
        self._tint = jnp.asarray(
            [float(getattr(d, "integration_time_s", None) or 0.0)
             for d in devices]
        )
        self._any_two_way = bool(np.any(np.asarray(self._tint) > 0.0))
        if self._any_two_way and self.prop_mode != "batch":
            raise ConfigError(
                "two-way devices need the batched pipeline "
                "(prop_mode='batch', CKF): the t - T_int reference state "
                "comes from the dense reference interpolant"
            )
        big = 1e30
        rvar = np.full((len(devices), len(self.types)), big)
        for i, d in enumerate(devices):
            for j, t in enumerate(self.types):
                n = d.stochastic_noises.get(t)
                if n is not None and t in d.measurement_types:
                    rvar[i, j] = max(n.covariance(), 1e-32)
        # Estimated Gauss-Markov measurement biases (VERDICT r2 item 7,
        # reference semantics: gauss_markov.rs:52 biases feed the SIMULATED
        # measurements via StochasticNoise — the reference never estimates
        # them; here they can be carried as extra filter state lanes, the
        # classic DSN bias-estimation formulation): one lane per
        # (device, type) whose StochasticNoise carries a GaussMarkov bias.
        # The lane propagates with phi = exp(-dt/tau) and
        # q = sigma_ss^2 (1 - exp(-2 dt/tau)); its H entry is 1 for that
        # device/type row; R then uses the WHITE-only variance (the bias
        # is modeled, not noise).
        self.estimate_biases = bool(estimate_biases)
        lane_dev, lane_type, lane_tau, lane_sig2 = [], [], [], []
        if self.estimate_biases:
            for i, d in enumerate(devices):
                for j, t in enumerate(self.types):
                    n = d.stochastic_noises.get(t)
                    if (n is not None and getattr(n, "bias", None) is not None
                            and t in d.measurement_types):
                        lane_dev.append(i)
                        lane_type.append(j)
                        lane_tau.append(float(n.bias.tau_s))
                        lane_sig2.append(float(n.bias.covariance()))
                        rvar[i, j] = max(
                            n.white_noise.covariance()
                            if n.white_noise is not None else 1e-32,
                            1e-32,
                        )
            if prop_mode != "batch":
                raise ConfigError(
                    "estimate_biases needs the batched pipeline "
                    "(prop_mode='batch')"
                )
        self.n_bias = len(lane_dev)
        self._lane_dev = jnp.asarray(lane_dev, dtype=jnp.int32)
        self._lane_type = jnp.asarray(lane_type, dtype=jnp.int32)
        self._lane_tau = jnp.asarray(np.asarray(lane_tau, dtype=np.float64))
        self._lane_sig2 = jnp.asarray(np.asarray(lane_sig2, dtype=np.float64))
        self._rvar = jnp.asarray(rvar)
        self._compiled = {}
        # AOT executable cache dir (nyx_tpu/aot.py): skips the ~minutes of
        # host-side tracing/lowering of the big filter program on repeat
        # runs in fresh processes. Opt-in because the cache key must cover
        # everything closed over by the traced program; aot.py hashes all
        # package code plus the per-instance fingerprint below.
        self.aot_dir = aot_dir
        self._aot_loaded = {}
        self._aot_cfg = None

    # ------------------------------------------------------------------
    def _stm_dynamics(self, dyn):
        """Dynamics used for the stage-2 STM propagation: Harmonics models
        get jvp_degree=stm_jvp_degree (unless already truncated)."""
        q = self.stm_jvp_degree
        if q is None:
            return dyn
        from ..dynamics.gravity import Harmonics
        from ..dynamics.orbital import OrbitalDynamics
        from ..dynamics.spacecraft_dyn import SpacecraftDynamics

        models = tuple(
            m.with_jvp_degree(q)
            if isinstance(m, Harmonics) and m.jvp_degree is None
            and m.max_degree > q
            else m
            for m in dyn.orbital_dyn.models
        )
        if models == dyn.orbital_dyn.models:
            return dyn
        return SpacecraftDynamics(
            OrbitalDynamics(models, dyn.orbital_dyn.frame),
            dyn.force_models, dyn.guidance, dyn.decrement_mass,
            dyn.pert_precision,
        )

    def _snc_q(self, dt_s, y_ref, t_tai, t0_tai):
        """Per-row 9x9 process noise: chronological SNC switchover
        (last ProcessNoise whose start epoch <= row epoch wins), optional
        exponential decay anchored at the active SNC's start (or the first
        row for start-less SNCs), optional RIC/VNC frame (kalman.py
        _snc_q / snc.rs:210 parity, vectorized)."""
        sncs = self.process_noise
        if not sncs:
            return jnp.zeros((STATE_DIM, STATE_DIM))
        qd_tab = jnp.asarray([s.q_diag_km2_s4 for s in sncs])  # [K, 3]
        dis_tab = jnp.asarray([s.disable_time_s for s in sncs])
        tau_tab = jnp.asarray([
            np.asarray(s.decay_tau_s, dtype=np.float64)
            if s.decay_tau_s is not None else np.full(3, np.inf)
            for s in sncs
        ])
        start_tab = jnp.asarray([
            s.start_epoch_tai_s if s.start_epoch_tai_s is not None
            else -np.inf
            for s in sncs
        ])
        code_tab = jnp.asarray([
            0 if s.local_frame is None
            else (1 if s.local_frame.lower() == "ric" else 2)
            for s in sncs
        ], dtype=jnp.int32)

        started = start_tab <= t_tai  # [K]
        any_active = jnp.any(started)
        k_idx = jnp.argmax(
            jnp.where(started, jnp.arange(len(sncs)), -1)
        )
        anchor = jnp.where(
            jnp.isfinite(start_tab[k_idx]), start_tab[k_idx], t0_tai
        )
        elapsed = jnp.maximum(t_tai - anchor, 0.0)
        qd = qd_tab[k_idx] * jnp.exp(-elapsed / tau_tab[k_idx])
        q3 = jnp.diag(qd)
        dcm_ric = ric_dcm(y_ref[0:3], y_ref[3:6])
        dcm_vnc = vnc_dcm(y_ref[0:3], y_ref[3:6])
        dcm = jnp.stack([jnp.eye(3), dcm_ric, dcm_vnc])[code_tab[k_idx]]
        q3 = dcm.T @ q3 @ dcm
        q = jnp.zeros((STATE_DIM, STATE_DIM))
        q = q.at[0:3, 0:3].set(q3 * dt_s**4 / 4.0)
        q = q.at[0:3, 3:6].set(q3 * dt_s**3 / 2.0)
        q = q.at[3:6, 0:3].set(q3 * dt_s**3 / 2.0)
        q = q.at[3:6, 3:6].set(q3 * dt_s**2)
        gate = (dt_s > 0.0) & (dt_s <= dis_tab[k_idx]) & any_active
        return jnp.where(gate, q, jnp.zeros_like(q))

    def _build(self, m: int):
        """Compile the scan over an M-row (measurement + filler) arc.

        The epoch only enters as the traced `epoch0_tdb` argument, so arcs
        of equal length never retrace."""
        dyn = self.prop.dynamics
        eom = dyn.make_eom(with_stm=True)
        finally_fn = dyn.make_finally()
        opts, method = self.prop.opts, self.prop.method
        types = self.types
        frame = self.station_frame
        lat, lon, hgt, rvar = self._lat, self._lon, self._hgt, self._rvar
        lt_flags = self._lt
        variant = self.variant
        rej_sigmas = self.resid_rejection_sigmas
        substeps = max(1, self.substeps)
        a_tab = method.a_matrix
        b_tab, bs_tab, c_tab = method.b, method.b_star, method.c

        def prop_fixed(y_ref, t_prev, dt, ctx, sc_params):
            """substeps fixed RK steps spanning [t_prev, t_prev+dt] on the
            reference+STM row; dt == 0 degenerates exactly to the identity
            update. The single lane is padded to the 8-wide VPU sublane:
            f64 elementwise chains at sublane 1 inside this scan body
            evaluate at ~f32 on the axon TPU (integrator.propagate guard,
            measured 2026-08-19)."""
            lanes = 8 if jax.default_backend() in ("tpu", "axon") else 1
            y = jnp.tile(
                jnp.concatenate([y_ref, jnp.eye(STATE_DIM).ravel()])[None, :],
                (lanes, 1),
            )
            h = jnp.full((lanes,), dt / substeps)
            eom2 = lambda t, yy: eom(t, yy, ctx, sc_params)
            fin2 = lambda t, yy: finally_fn(t, yy, ctx, sc_params)
            for k in range(substeps):
                t = jnp.full((lanes,), t_prev + k * (dt / substeps))
                inc, _ = integrator._rk_stages(
                    eom2, a_tab, b_tab, bs_tab, c_tab, t, y, h
                )
                y = fin2(t + h, y + inc)
            row = y[0]
            return row[0:STATE_DIM], row[STATE_DIM:].reshape(
                STATE_DIM, STATE_DIM
            )

        def prop_adaptive(y_ref, t_prev, dt, ctx, sc_params):
            y90 = jnp.concatenate([y_ref, jnp.eye(STATE_DIM).ravel()])
            res = integrator.propagate(
                eom,
                y90[None, :],
                dt,
                opts,
                method,
                t0=t_prev,
                finally_fn=finally_fn,
                eom_args=(ctx, sc_params),
            )
            row = res.y[0]
            y_bar = row[0:STATE_DIM]
            phi = row[STATE_DIM:].reshape(STATE_DIM, STATE_DIM)
            # zero-gap: keep the previous state, identity STM
            zero_gap = jnp.abs(dt) < 1e-12
            y_bar = jnp.where(zero_gap, y_ref, y_bar)
            phi = jnp.where(zero_gap, jnp.eye(STATE_DIM), phi)
            return y_bar, phi

        prop_gap = prop_fixed if self.prop_mode == "fixed" else prop_adaptive

        def step(carry, x, ctx, sc_params, epoch0_tdb, epoch0_tai, t0_tai):
            t_prev, y_ref, dev, p_mat = carry
            t_rel, trk, obs, avail = x
            dt = t_rel - t_prev

            # 1. propagate reference + STM across the gap
            y_bar, phi = prop_gap(y_ref, t_prev, dt, ctx, sc_params)

            # SNC frame/DCM from the state at the ROW epoch (the host
            # path hands time_update the nominal at the measurement epoch)
            p_bar = phi @ p_mat @ phi.T + self._snc_q(
                dt, y_bar, epoch0_tai + t_rel, t0_tai)
            dev_bar = phi @ dev

            # 2. computed obs + H by forward AD at the reference
            t_tdb = epoch0_tdb + t_rel
            s_lat, s_lon, s_hgt = lat[trk], lon[trk], hgt[trk]
            s_lt = lt_flags[trk]

            def h_of_y(y9):
                return _station_obs(
                    t_tdb, y9[0:6], s_lat, s_lon, s_hgt, frame, types,
                    lt=s_lt,
                )

            computed, h_jvp = jax.linearize(h_of_y, y_bar)
            h_mat = jax.vmap(h_jvp)(jnp.eye(STATE_DIM)).T  # [T, 9]

            r_eff = jnp.where(avail, rvar[trk], 1e30)
            prefit = jnp.where(avail, obs - computed - h_mat @ dev_bar, 0.0)

            s_mat = h_mat @ p_bar @ h_mat.T + jnp.diag(r_eff)
            l_chol = jnp.linalg.cholesky(s_mat)
            white = jax.scipy.linalg.solve_triangular(l_chol, prefit, lower=True)
            m_eff = jnp.maximum(jnp.sum(avail), 1)
            ratio = jnp.linalg.norm(white) / jnp.sqrt(m_eff.astype(jnp.float64))

            rejected = (
                (ratio > rej_sigmas) if rej_sigmas is not None else jnp.bool_(False)
            )

            # 3. gain by Cholesky solve: K = P̄ Hᵀ S⁻¹
            k_t = jax.scipy.linalg.cho_solve((l_chol, True), h_mat @ p_bar.T)
            k_gain = jnp.where(rejected, 0.0, k_t.T)  # [9, T]

            dev_new = dev_bar + k_gain @ prefit
            postfit = jnp.where(avail, obs - computed - h_mat @ dev_new, 0.0)
            ikh = jnp.eye(STATE_DIM) - k_gain @ h_mat
            p_new = ikh @ p_bar @ ikh.T + k_gain @ jnp.diag(r_eff) @ k_gain.T
            p_new = 0.5 * (p_new + p_new.T)

            if variant == "ekf":
                y_out = y_bar + dev_new
                dev_out = jnp.zeros(STATE_DIM)
            else:
                y_out = y_bar
                dev_out = dev_new
            outputs = (y_bar + dev_new, p_new, prefit, postfit, ratio, rejected)
            return (t_rel, y_out, dev_out, p_new), outputs

        def run_one(t_rel, trk, obs, avail, y0, p0, ctx, sc_params,
                    epoch0_tdb, epoch0_tai):
            carry0 = (jnp.float64(0.0), y0, jnp.zeros(STATE_DIM), p0)
            t0_tai = epoch0_tai + t_rel[0]
            _, out = jax.lax.scan(
                lambda c, x: step(c, x, ctx, sc_params, epoch0_tdb,
                                  epoch0_tai, t0_tai),
                carry0,
                (t_rel, trk, obs, avail),
            )
            return out

        from ..compileopts import jit_options

        run = jax.jit(run_one, compiler_options=jit_options("filter"))
        # the ensemble-of-filters axis (SURVEY.md §2.8): vmap over initial
        # estimates for batched covariance/robustness analysis — one
        # compiled program runs every filter in lock-step
        run_batch = jax.jit(
            jax.vmap(
                run_one,
                in_axes=(None, None, None, None, 0, 0, None, None, None,
                         None),
            ),
            compiler_options=jit_options("filter"),
        )
        return run, run_batch

    # ------------------------------------------------------------------
    def _build_batch(self, m: int, k_cap: int):
        """Compile the three-stage batched CKF (see __init__ docstring).

        `m` is the row count (measurements + filler), `k_cap` the capture
        buffer size for the single-lane reference propagation."""
        from dataclasses import replace as _dc_replace

        dyn = self.prop.dynamics
        eom9 = dyn.make_eom(with_stm=False)
        eom90 = self._stm_dynamics(dyn).make_eom(with_stm=True)
        finally_fn = dyn.make_finally()
        opts, method = self.prop.opts, self.prop.method
        # clamp reference nodes to the filler spacing so the quintic
        # Hermite interpolation stays far below measurement noise
        # Unrolled stages for the single-lane reference: at B=1 a stage
        # *loop* pays the axon per-loop-iteration floor (~0.2 ms) 16x per
        # RK step — ~3 ms/step, which dominated the whole warm filter run.
        # The unrolled 16-stage body of the 9-dim EOM is a moderate graph
        # (same one the MC bench compiles in ~30 s). High-degree fields
        # (> Harmonics.UNROLL_MAX_DEGREE) use the scan gravity recursion
        # inside each stage, keeping the product of the two unrolls in
        # check.
        # loop_mode="scan": the single-lane reference is the ONLY loop-
        # bearing program in the staged pipeline; running it as a fixed-
        # trip-count scan keeps the process off the axon while_loop
        # dispatch-degradation path (docs/OD_PIPELINE.md). The trip count
        # derives from the capture size; lanes still RUNNING at the end
        # surface through stage 1's status output and retry doubled.
        ref_opts = _dc_replace(
            opts,
            max_step_s=min(opts.max_step_s, self.max_gap_s),
            stage_mode="unroll",
            loop_mode="scan",
        )
        types = self.types
        frame = self.station_frame
        lat, lon, hgt, rvar = self._lat, self._lon, self._hgt, self._rvar
        lt_flags = self._lt
        tint = self._tint
        any_two_way = self._any_two_way
        rej_sigmas = self.resid_rejection_sigmas
        substeps = max(1, self.substeps)
        a_tab = method.a_matrix
        b_tab, bs_tab, c_tab = method.b, method.b_star, method.c
        # "auto" resolves to the sequential scan: measured on the real TPU
        # (2026-08-20, M=1157): the 9x9 scan body runs the whole arc in
        # ~0.2 ms and compiles in ~10 s, while the blocked associative
        # scan runs 397 ms and costs 482 s of remote compile — the tiny
        # fixed-size algebra has no per-iteration scan floor, so O(M)
        # sequential depth on one core beats O(log M) with its much
        # heavier per-element compose. "parallel" stays available for
        # very long arcs / future multi-core splits of one filter.
        use_parallel = self.filter_mode == "parallel"
        n_bias = self.n_bias
        lane_dev, lane_type = self._lane_dev, self._lane_type
        lane_tau, lane_sig2 = self._lane_tau, self._lane_sig2

        def interp_quintic(ts_n, ys_n, acc_n, n_valid, tq):
            """Quintic Hermite (pos/vel/acc endpoints) at query times
            tq [M]; ts_n [K] node times (garbage past n_valid), ys_n [K, 9],
            acc_n [K, 3]. Linear interp for columns 6:."""
            big = 1e30
            ts_s = jnp.where(jnp.arange(ts_n.shape[0]) < n_valid, ts_n, big)
            i = jnp.clip(
                jnp.searchsorted(ts_s, tq, side="right") - 1,
                0,
                n_valid - 2,
            )
            t0, t1 = ts_n[i], ts_n[i + 1]
            h = jnp.maximum(t1 - t0, 1e-30)
            s = jnp.clip((tq - t0) / h, 0.0, 1.0)[:, None]
            r0, v0, a0 = ys_n[i, 0:3], ys_n[i, 3:6], acc_n[i]
            r1, v1, a1 = ys_n[i + 1, 0:3], ys_n[i + 1, 3:6], acc_n[i + 1]
            hh = h[:, None]
            s2, s3 = s * s, s * s * s
            s4, s5 = s2 * s2, s2 * s3
            h00 = 1 - 10 * s3 + 15 * s4 - 6 * s5
            h10 = s - 6 * s3 + 8 * s4 - 3 * s5
            h20 = 0.5 * (s2 - 3 * s3 + 3 * s4 - s5)
            h01 = 10 * s3 - 15 * s4 + 6 * s5
            h11 = -4 * s3 + 7 * s4 - 3 * s5
            h21 = 0.5 * (s3 - 2 * s4 + s5)
            r = (
                h00 * r0 + h10 * hh * v0 + h20 * hh * hh * a0
                + h01 * r1 + h11 * hh * v1 + h21 * hh * hh * a1
            )
            d00 = -30 * s2 + 60 * s3 - 30 * s4
            d10 = 1 - 18 * s2 + 32 * s3 - 15 * s4
            d20 = 0.5 * (2 * s - 9 * s2 + 12 * s3 - 5 * s4)
            d01 = 30 * s2 - 60 * s3 + 30 * s4
            d11 = -12 * s2 + 28 * s3 - 15 * s4
            d21 = 0.5 * (3 * s2 - 8 * s3 + 5 * s4)
            v = (
                d00 * r0 / hh + d10 * v0 + d20 * hh * a0
                + d01 * r1 / hh + d11 * v1 + d21 * hh * a1
            )
            rest0, rest1 = ys_n[i, 6:], ys_n[i + 1, 6:]
            rest = rest0 + s * (rest1 - rest0)
            return jnp.concatenate([r, v, rest], axis=-1)  # [M, 9]

        def filter_scan(phi, q_all, h_all, z_all, r_all, avail, p0,
                        rej_thresh):
            """Sequential DxD CKF over precomputed rows (sigma rejection
            supported). D = 9 (+ estimated bias lanes). `rej_thresh` is a
            TRACED scalar so relinearization iterations can gate rejection
            off (pass jnp.inf) without recompiling the stage. Runs in
            p0's dtype (f64, or f32 via filter_algebra="f32") — every
            constant derives its dtype from the carry."""
            d_dim = p0.shape[-1]
            dt_ = p0.dtype

            def step(carry, x):
                dev, p_mat = carry
                phi_i, q_i, h_i, z_i, r_i, av_i = x
                p_bar = phi_i @ p_mat @ phi_i.T + q_i
                dev_bar = phi_i @ dev
                prefit = jnp.where(av_i, z_i - h_i @ dev_bar, 0.0)
                s_mat = h_i @ p_bar @ h_i.T + jnp.diag(r_i)
                l_chol = jnp.linalg.cholesky(s_mat)
                white = jax.scipy.linalg.solve_triangular(
                    l_chol, prefit, lower=True
                )
                m_eff = jnp.maximum(jnp.sum(av_i), 1)
                ratio = jnp.linalg.norm(white) / jnp.sqrt(
                    m_eff.astype(dt_)
                )
                rejected = (
                    (ratio > rej_thresh)
                    if rej_sigmas is not None
                    else jnp.bool_(False)
                )
                k_t = jax.scipy.linalg.cho_solve((l_chol, True), h_i @ p_bar.T)
                k_gain = jnp.where(rejected, jnp.asarray(0.0, dt_), k_t.T)
                dev_new = dev_bar + k_gain @ prefit
                postfit = jnp.where(av_i, z_i - h_i @ dev_new, 0.0)
                ikh = jnp.eye(d_dim, dtype=dt_) - k_gain @ h_i
                p_new = ikh @ p_bar @ ikh.T + k_gain @ jnp.diag(r_i) @ k_gain.T
                p_new = 0.5 * (p_new + p_new.T)
                return (dev_new, p_new), (
                    dev_new, p_new, prefit, postfit, ratio, rejected
                )

            carry0 = (jnp.zeros(d_dim, dtype=dt_), p0)
            _, out = jax.lax.scan(
                step, carry0, (phi, q_all, h_all, z_all, r_all, avail)
            )
            return out

        def filter_parallel(phi, q_all, h_all, z_all, r_all, avail, p0,
                            rej_thresh):
            """Associative-scan CKF (Särkkä & García-Fernández 2021, eqs.
            10-12): each row becomes a 5-tuple (A, b, C, η, J); composition
            is associative, so `lax.associative_scan` yields every filtered
            (deviation, covariance) in O(log M) sequential steps. Exact for
            the linearized CKF (initial deviation mean is zero).

            Sigma rejection runs as an iterated two-pass gate: filter
            without rejection, flag rows whose whitened ratio exceeds the
            threshold, re-run with those rows' R inflated to the masked
            value, and repeat until the reject set stabilizes (3 passes).
            Each pass re-rates EVERY row against the current filtered
            past, so a clear outlier converges to the sequential scan's
            accept/reject set; only marginal rows right at the threshold
            can differ (the sequential filter rates them against a
            past that saw rejections applied strictly in order)."""
            d_dim = p0.shape[-1]
            eye = jnp.eye(d_dim)

            def make_element(phi_i, q_i, h_i, z_i, r_i):
                s_i = h_i @ q_i @ h_i.T + jnp.diag(r_i)
                l_chol = jnp.linalg.cholesky(s_i)
                k_i = jax.scipy.linalg.cho_solve((l_chol, True), h_i @ q_i.T).T
                ikh = eye - k_i @ h_i
                a_i = ikh @ phi_i
                b_i = k_i @ z_i
                c_i = ikh @ q_i
                c_i = 0.5 * (c_i + c_i.T)
                hs = jax.scipy.linalg.cho_solve((l_chol, True), h_i @ phi_i)
                eta_i = hs.T @ z_i
                j_i = hs.T @ (h_i @ phi_i)
                return a_i, b_i, c_i, eta_i, 0.5 * (j_i + j_i.T)

            def make_elems(r_elem):
                return jax.vmap(make_element)(phi, q_all, h_all, z_all,
                                              r_elem)

            def compose(left, right):
                a1, b1, c1, e1, j1 = left
                a2, b2, c2, e2, j2 = right
                # both solves share the coefficient matrix I + J2 C1, since
                # (I + C1 J2)^T = I + J2 C1 for symmetric C1, J2; one
                # batched elimination serves t_mat and u_mat (no f64 LU on
                # TPU — see xmath.gauss_solve)
                sol = gauss_solve(
                    jnp.eye(d_dim) + j2 @ c1,
                    jnp.concatenate(
                        [
                            a2.swapaxes(-1, -2),
                            e2[..., None] - j2 @ b1[..., None],
                            j2 @ a1,
                        ],
                        -1,
                    ),
                )
                t_mat = sol[..., :d_dim].swapaxes(-1, -2)
                ue = sol[..., d_dim]
                uja = sol[..., d_dim + 1 :]
                a_new = t_mat @ a1
                b_new = (
                    t_mat @ (b1[..., None] + c1 @ e2[..., None])
                )[..., 0] + b2
                c_new = t_mat @ c1 @ a2.swapaxes(-1, -2) + c2
                c_new = 0.5 * (c_new + c_new.swapaxes(-1, -2))
                e_new = (a1.swapaxes(-1, -2) @ ue[..., None])[..., 0] + e1
                j_new = a1.swapaxes(-1, -2) @ uja + j1
                j_new = 0.5 * (j_new + j_new.swapaxes(-1, -2))
                return a_new, b_new, c_new, e_new, j_new

            # Two-level blocked scan. A flat associative_scan over all M
            # rows traces an O(M)-sized program that the axon remote
            # compiler cannot digest for day-long arcs; instead an outer
            # `lax.scan` walks fixed-size blocks whose body holds ONE
            # C-row associative scan (program size O(log C)), giving
            # sequential depth M/C with the per-iteration loop floor paid
            # only once per block. The running filter state enters each
            # block as the prior element (A=0, b=dev, C=P): composing a
            # prior-type element on the left of a block-cumulative element
            # is exactly filtering from that prior (Särkkä &
            # García-Fernández 2021, lemma 8), so no per-row fold is
            # needed — the carry starts at (0, P0), which also folds
            # Φ P0 Φᵀ + Q into row 0 through the same composition.
            m_rows = phi.shape[0]
            block = min(128, m_rows)
            n_blocks = -(-m_rows // block)
            pad = n_blocks * block - m_rows
            eye_b = jnp.broadcast_to(jnp.eye(d_dim), (pad, d_dim, d_dim))

            def pad_id(e, idv):
                return jnp.concatenate([e, idv], axis=0)

            def one_pass(elems):
                a_e, b_e, c_e, eta_e, j_e = elems
                # identity element (A=I, rest 0): composing it on the right
                # is a no-op, so padded rows pass the carry through
                a_e = pad_id(a_e, eye_b)
                b_e = pad_id(b_e, jnp.zeros((pad, d_dim)))
                c_e = pad_id(c_e, jnp.zeros((pad, d_dim, d_dim)))
                eta_e = pad_id(eta_e, jnp.zeros((pad, d_dim)))
                j_e = pad_id(j_e, jnp.zeros((pad, d_dim, d_dim)))
                blk = tuple(
                    e.reshape((n_blocks, block) + e.shape[1:])
                    for e in (a_e, b_e, c_e, eta_e, j_e)
                )

                def outer(carry, be):
                    dev_c, p_c = carry
                    cum = jax.lax.associative_scan(compose, be)
                    prior = (
                        jnp.zeros((d_dim, d_dim)), dev_c, p_c,
                        jnp.zeros(d_dim),
                        jnp.zeros((d_dim, d_dim)),
                    )
                    res = jax.vmap(lambda *r: compose(prior, r))(*cum)
                    dev_b, p_b = res[1], res[2]
                    return (dev_b[-1], p_b[-1]), (dev_b, p_b)

                (_, _), (dev_blocks, p_blocks) = jax.lax.scan(
                    outer, (jnp.zeros(d_dim), p0), blk
                )
                dev_all = dev_blocks.reshape(-1, d_dim)[:m_rows]
                p_all = p_blocks.reshape(-1, d_dim, d_dim)[:m_rows]
                return dev_all, p_all

            def rate(dev_all, p_all):
                """Post-hoc residuals/ratios against the ORIGINAL R."""
                dev_prev = jnp.concatenate(
                    [jnp.zeros((1, d_dim)), dev_all[:-1]]
                )
                p_prev = jnp.concatenate([p0[None], p_all[:-1]])
                dev_bar = (phi @ dev_prev[..., None])[..., 0]
                prefit = jnp.where(
                    avail, z_all - (h_all @ dev_bar[..., None])[..., 0], 0.0
                )
                postfit = jnp.where(
                    avail, z_all - (h_all @ dev_all[..., None])[..., 0], 0.0
                )
                p_bar = phi @ p_prev @ phi.swapaxes(-1, -2) + q_all
                s_all = h_all @ p_bar @ h_all.swapaxes(-1, -2) + jax.vmap(
                    jnp.diag
                )(r_all)
                white = gauss_solve(s_all, prefit[..., None])[..., 0]
                m_eff = jnp.maximum(jnp.sum(avail, axis=-1), 1)
                ratio = jnp.sqrt(
                    jnp.maximum(jnp.einsum("mt,mt->m", prefit, white), 0.0)
                    / m_eff.astype(jnp.float64)
                )
                return prefit, postfit, ratio

            dev_all, p_all = one_pass(make_elems(r_all))
            prefit, postfit, ratio = rate(dev_all, p_all)
            if rej_sigmas is None:
                rejected = jnp.zeros(ratio.shape, dtype=bool)
            else:
                for _pass in range(3):
                    rej = ratio > rej_thresh
                    r_gated = jnp.where(rej[:, None], 1e30, r_all)
                    dev_all, p_all = one_pass(make_elems(r_gated))
                    prefit, postfit, ratio = rate(dev_all, p_all)
                rejected = ratio > rej_thresh
            return dev_all, p_all, prefit, postfit, ratio, rejected

        ffn_base = filter_parallel if use_parallel else filter_scan

        if self.filter_algebra == "f32" and not use_parallel:
            # f32 filter algebra (VERDICT r4 item 3 / docs/OD_PIPELINE.md):
            # the sequential 9x9 scan is latency-bound on the f64 EMULATION
            # chain — the identical Joseph step in native f32 measures
            # 11.5x faster on the chip (397 -> 34.6 ms at M=1168,
            # devtools/profile_f32_scan.py, 2026-08-20). f32 is safe here
            # because the algebra is preconditioned first: every state lane
            # is scaled by 1/sqrt(P0_ii) (unestimated zero-variance lanes
            # keep scale 1), so P starts at ~unit diagonal and the
            # pos/vel/parameter dynamic range (1e10 in km-km/s units, vs
            # f32's 1e-7 eps) never meets the subtraction in the Joseph
            # update. Whitened ratios, gains and rejection are
            # scale-invariant; deviations/covariances are rescaled back
            # and the outputs returned in f64.
            def ffn_sel(phi_x, q_x, h_x, z_x, r_x, avail_x, p0_x,
                        rej_thresh):
                f32 = jnp.float32
                pd = jnp.diagonal(p0_x)
                sc = jnp.where(pd > 1e-20, 1.0 / jnp.sqrt(
                    jnp.maximum(pd, 1e-20)), 1.0)
                inv = 1.0 / sc
                phi_s = (phi_x * sc[None, :, None]
                         * inv[None, None, :]).astype(f32)
                q_s = (q_x * sc[None, :, None] * sc[None, None, :]).astype(f32)
                h_s = (h_x * inv[None, None, :]).astype(f32)
                p0_s = (p0_x * sc[:, None] * sc[None, :]).astype(f32)
                # 1e30 mask overflows f32 squares; 1e18 is still ~1e12x
                # any real variance
                r_s = jnp.minimum(r_x, 1e18).astype(f32)
                z_s = z_x.astype(f32)
                # TPU f32 matmuls default to bf16 MXU passes (eps 8e-3) —
                # enough to NaN the Joseph/Cholesky chain. Trace the scan
                # under full-f32 matmul precision (still ~10x faster than
                # the f64 emulation chain).
                with jax.default_matmul_precision("float32"):
                    dev, p_m, prefit, postfit, ratio, rejected = filter_scan(
                        phi_s, q_s, h_s, z_s, r_s, avail_x, p0_s,
                        jnp.asarray(rej_thresh, f32),
                    )
                dev = dev.astype(jnp.float64) * inv[None, :]
                p_m = (p_m.astype(jnp.float64)
                       * inv[None, :, None] * inv[None, None, :])
                return (dev, p_m, prefit.astype(jnp.float64),
                        postfit.astype(jnp.float64),
                        ratio.astype(jnp.float64), rejected)
        else:
            ffn_sel = ffn_base

        # The four stages below compile as SEPARATE programs: the fused
        # single-program filter measured 654 s on the axon remote compiler
        # while the same stages compiled separately sum to ~120 s (XLA
        # compile time is strongly superlinear in program size; measured
        # 2026-08-20, devtools/profile_od_compile.py + profile_od.py).
        # Intermediates stay on device between stage dispatches, and the
        # capture-saturation check lands after stage 1 instead of after a
        # full wasted filter run.

        def stage1_fn(t_rel, y0, ctx, sc_params):
            # ---- stage 1: single-lane reference with dense capture ----
            arc_span = t_rel[-1]
            res = integrator.propagate(
                eom9,
                y0[None, :],
                arc_span,
                ref_opts,
                method,
                n_capture=k_cap,
                capture_stride=1,
                finally_fn=finally_fn,
                eom_args=(ctx, sc_params),
            )
            n_valid = res.traj_len[0] + 1
            ts_n = jnp.concatenate([jnp.zeros((1,)), res.traj_t[0]])
            ys_n = jnp.concatenate([y0[None, :], res.traj_y[0]])
            acc_n = eom9(ts_n, ys_n, ctx, sc_params)[:, 3:6]
            return ts_n, ys_n, acc_n, n_valid, res.status[0]

        def stage2_fn(t_rel, ts_n, ys_n, acc_n, n_valid, ctx, sc_params):
            t_prev = jnp.concatenate([jnp.zeros((1,)), t_rel[:-1]])
            y_prev = interp_quintic(ts_n, ys_n, acc_n, n_valid, t_prev)

            # ---- stage 2: all gap STMs in one batched fixed-step RK ----
            dt = t_rel - t_prev
            eye_flat = jnp.broadcast_to(
                jnp.eye(STATE_DIM).ravel(), (m, STATE_DIM * STATE_DIM)
            )
            y90 = jnp.concatenate([y_prev, eye_flat], axis=1)
            h_sub = dt / substeps
            eom2 = lambda t, yy: eom90(t, yy, ctx, sc_params)
            fin2 = lambda t, yy: finally_fn(t, yy, ctx, sc_params)
            for s_i in range(substeps):
                t_s = t_prev + s_i * h_sub
                # stage-looped: the 90-dim STM EOM (9 jvp passes through
                # the full dynamics) unrolled 16x is a pathologically large
                # graph for the axon remote compiler (>20 min); one scan
                # instantiation compiles ~16x faster at negligible runtime
                # cost (the EOM dominates the stage buffer traffic)
                inc90, _ = integrator._rk_stages_looped(
                    eom2, a_tab, b_tab, bs_tab, c_tab, t_s, y90, h_sub
                )
                y90 = fin2(t_s + h_sub, y90 + inc90)
            y_bar = y90[:, 0:STATE_DIM]
            phi = y90[:, STATE_DIM:].reshape(m, STATE_DIM, STATE_DIM)
            return y_bar, phi, dt

        tx_ts, tx_ys = self._tx_ts, self._tx_ys
        off_ts, off_ys = self._off_ts, self._off_ys

        def scalar_obs(t_i, rv6, trk_i):
            """Noiseless [T] observation for tracker trk_i — ground-station
            (optionally cross-body shifted) or interlink family (chosen at
            build time)."""
            if self._interlink:
                return _interlink_obs(
                    t_i, rv6, tx_ts[trk_i], tx_ys[trk_i], types
                )
            if off_ts is not None:
                rv6 = rv6 + _table_state(
                    t_i, off_ts[trk_i], off_ys[trk_i]
                )
            return _station_obs(
                t_i, rv6, lat[trk_i], lon[trk_i], hgt[trk_i], frame,
                types, lt=lt_flags[trk_i],
            )

        def stage3_fn(t_rel, trk, obs, avail, y_bar, dt, ts_n, ys_n, acc_n,
                      n_valid, epoch0_tdb, epoch0_tai):
            # ---- stage 3: batched measurement models + partials ----
            t_tdb = epoch0_tdb + t_rel
            if any_two_way:
                # two-way rows: the spacecraft state at the START of the
                # integration interval comes from the dense reference
                # interpolant (SURVEY §7's "rolling dense-output window").
                # H is the partial of the AVERAGED observable, chained
                # through the linearized backward flow Phi(t -> t-T) ~ I
                # with the -T_int r-v block (see h_two below; process.py
                # _h_fns matches on the host, trk_device.rs:49-138)
                y_tm = interp_quintic(
                    ts_n, ys_n, acc_n, n_valid,
                    jnp.maximum(t_rel - tint[trk], 0.0),
                )

                def one_obs(t_i, y_i, y_tm_i, trk_i):
                    tint_i = tint[trk_i]

                    def v1_of_y(y9):
                        return scalar_obs(t_i, y9[0:6], trk_i)

                    def v0_of_y(y9):
                        return scalar_obs(t_i - tint_i, y9[0:6], trk_i)

                    v1, h_jvp = jax.linearize(v1_of_y, y_i)
                    h1 = jax.vmap(h_jvp)(jnp.eye(STATE_DIM)).T
                    v0, h0_jvp = jax.linearize(v0_of_y, y_tm_i)
                    h0 = jax.vmap(h0_jvp)(jnp.eye(STATE_DIM)).T
                    # H of the AVERAGED observable, chained through the
                    # linearized backward flow dev(t-T) = Phi(t->t-T)
                    # dev(t), Phi ~ I with the -T_int r-v block (the
                    # gravity-gradient terms are O(|A| T^2 / 2) ~ 4e-3
                    # relative). The v0 endpoint's velocity sensitivity
                    # (-T_int * u row on range) is what a pure
                    # instantaneous H misses — on fast-LOS geometry
                    # (low lunar orbit + surface station) that
                    # mis-modeling diverges the CKF (measured: 418 m
                    # final error vs 13 m one-way on ex04's 2 h arc).
                    phi_back = jnp.eye(STATE_DIM).at[0:3, 3:6].set(
                        -tint_i * jnp.eye(3)
                    )
                    h_two = 0.5 * (h1 + h0 @ phi_back)
                    computed = jnp.where(
                        tint_i > 0.0, 0.5 * (v0 + v1), v1
                    )
                    h_mat = jnp.where(tint_i > 0.0, h_two, h1)
                    return computed, h_mat

                computed, h_all = jax.vmap(one_obs)(t_tdb, y_bar, y_tm, trk)
            else:

                def one_obs(t_i, y_i, trk_i):
                    def h_of_y(y9):
                        return scalar_obs(t_i, y9[0:6], trk_i)

                    computed, h_jvp = jax.linearize(h_of_y, y_i)
                    h_mat = jax.vmap(h_jvp)(jnp.eye(STATE_DIM)).T
                    return computed, h_mat

                computed, h_all = jax.vmap(one_obs)(t_tdb, y_bar, trk)
            z_all = jnp.where(avail, obs - computed, 0.0)
            r_all = jnp.where(avail, rvar[trk], 1e30)
            t0_tai = epoch0_tai + t_rel[0]
            # SNC frame/DCM from the state at the ROW epoch (host parity)
            q_all = jax.vmap(
                lambda d, y, tt: self._snc_q(d, y, tt, t0_tai)
            )(dt, y_bar, epoch0_tai + t_rel)
            return computed, h_all, z_all, r_all, q_all

        def stage4_fn(trk, avail, y_bar, phi, dt, h_all, z_all, r_all,
                      q_all, p0, rej_thresh):
            # ---- stage 4: the filter (only DxD algebra left) ----
            if n_bias:
                # Augment with Gauss-Markov measurement-bias lanes:
                # phi_b = exp(-dt/tau), q_b = sigma_ss^2 (1 - phi_b^2)
                # (the exact discrete GM transition, gauss_markov.rs:52);
                # H gets a 1 in the bias column when this row's tracker
                # owns the lane; the initial covariance block is the GM
                # steady state (zero-mean prior).
                phi_b = jnp.exp(-dt[:, None] / lane_tau[None, :])  # [M, nb]
                q_b = lane_sig2[None, :] * (1.0 - phi_b**2)
                d_dim = STATE_DIM + n_bias

                def aug_mat(m9, diag_b):
                    out = jnp.zeros(m9.shape[:-2] + (d_dim, d_dim))
                    out = out.at[..., :STATE_DIM, :STATE_DIM].set(m9)
                    idx = jnp.arange(STATE_DIM, d_dim)
                    return out.at[..., idx, idx].set(diag_b)

                phi_a = aug_mat(phi, phi_b)
                q_a = aug_mat(q_all, q_b)
                # bias column selector: row m, type t gets lane k iff the
                # lane belongs to (trk[m], t) and the type is observed
                sel = (
                    (lane_dev[None, None, :] == trk[:, None, None])
                    & (lane_type[None, None, :]
                       == jnp.arange(len(types))[None, :, None])
                    & avail[:, :, None]
                )
                h_a = jnp.concatenate(
                    [h_all, sel.astype(h_all.dtype)], axis=-1
                )
                p0_a = aug_mat(p0, jnp.broadcast_to(lane_sig2, (n_bias,)))
                dev_all, p_all, prefit, postfit, ratio, rejected = ffn_sel(
                    phi_a, q_a, h_a, z_all, r_all, avail, p0_a, rej_thresh
                )
                y_est = jnp.concatenate(
                    [y_bar + dev_all[:, :STATE_DIM], dev_all[:, STATE_DIM:]],
                    axis=-1,
                )  # [M, 9 + nb]; the host splits state and bias estimates
            else:
                dev_all, p_all, prefit, postfit, ratio, rejected = ffn_sel(
                    phi, q_all, h_all, z_all, r_all, avail, p0, rej_thresh
                )
                y_est = y_bar + dev_all
            return y_est, p_all, prefit, postfit, ratio, rejected

        from ..compileopts import jit_options

        copts = jit_options("filter")
        stages = {
            "s1": jax.jit(stage1_fn, compiler_options=copts),
            "s2": jax.jit(stage2_fn, compiler_options=copts),
            "s3": jax.jit(stage3_fn, compiler_options=copts),
            "s4": jax.jit(stage4_fn, compiler_options=copts),
        }
        # the ensemble-of-filters axis (SURVEY.md §2.8): each stage is
        # vmapped over the estimate batch; arc/row inputs are broadcast
        stages_b = {
            "s1": jax.jit(
                jax.vmap(stage1_fn, in_axes=(None, 0, None, None)),
                compiler_options=copts,
            ),
            "s2": jax.jit(
                jax.vmap(stage2_fn, in_axes=(None, 0, 0, 0, 0, None, None)),
                compiler_options=copts,
            ),
            "s3": jax.jit(
                jax.vmap(
                    stage3_fn,
                    in_axes=(None, None, None, None, 0, 0, 0, 0, 0, 0,
                             None, None),
                ),
                compiler_options=copts,
            ),
            "s4": jax.jit(
                jax.vmap(
                    stage4_fn,
                    in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0, None),
                ),
                compiler_options=copts,
            ),
        }
        return {"stages": stages, "stages_b": stages_b}

    # ------------------------------------------------------------------
    def _prepare(self, arc: TrackingDataArc, epoch0: Epoch):
        """Host-side arc layout: per-row (t_rel, trk, obs, avail) arrays
        with masked filler rows inserted so no row spans more than
        max_gap_s (fixed mode), plus the real-measurement mask."""
        t0_tai = epoch0.to_tai_seconds()
        t_rel = np.asarray(arc.epochs_tai_s) - t0_tai
        m = len(arc)
        trk_names = {d.name: i for i, d in enumerate(self.devices)}
        trk = np.asarray(
            [trk_names[arc.trackers[i]] for i in arc.tracker_idx],
            dtype=np.int32,
        )
        obs = np.zeros((m, len(self.types)))
        avail = np.zeros((m, len(self.types)), dtype=bool)
        for j, t in enumerate(self.types):
            if t in arc.types:
                col = arc.types.index(t)
                v = arc.values[:, col]
                good = np.isfinite(v)
                obs[good, j] = v[good]
                avail[:, j] = good

        if self.prop_mode == "adaptive":
            return t_rel, trk, obs, avail, np.ones(m, dtype=bool)

        rows_t, rows_trk, rows_obs, rows_avail, real = [], [], [], [], []
        prev = 0.0
        gap_max = self.max_gap_s * max(1, self.substeps)
        for i in range(m):
            gap = t_rel[i] - prev
            if gap > gap_max:
                # stride-based fillers (prev + k*gap_max, remainder last),
                # matching the host loop's <= max_step chunking
                # (od/process/mod.rs:215-241) so the piecewise SNC Q
                # accumulates over the SAME sub-intervals as the host
                # filter (an even split changes Q by O(dt^2) per gap,
                # measured ~10 m over a day arc at q=4e-17)
                n_fill = int(np.ceil(gap / gap_max)) - 1
                for k in range(1, n_fill + 1):
                    rows_t.append(prev + k * gap_max)
                    rows_trk.append(0)
                    rows_obs.append(np.zeros(len(self.types)))
                    rows_avail.append(np.zeros(len(self.types), dtype=bool))
                    real.append(False)
            rows_t.append(t_rel[i])
            rows_trk.append(trk[i])
            rows_obs.append(obs[i])
            rows_avail.append(avail[i])
            real.append(True)
            prev = t_rel[i]
        return (
            np.asarray(rows_t),
            np.asarray(rows_trk, dtype=np.int32),
            np.stack(rows_obs),
            np.stack(rows_avail),
            np.asarray(real),
        )

    # ------------------------------------------------------------------
    def _setup(self, initial_estimate, arc: TrackingDataArc):
        """Host-side setup (arc layout, context build, device transfers),
        memoized on the arc contents + epoch: repeat process_arc calls on
        the same arc (benchmarks, MC-of-OD loops, smoother passes) skip
        ~0.2 s of pure host work per call."""
        import hashlib as _hl

        epoch0 = initial_estimate.epoch
        nominal = initial_estimate.nominal
        # the key covers everything _setup_uncached reads off the
        # estimate: epoch, spacecraft params, and (when max_gap is
        # auto-derived) the orbit period driver — so MC-of-OD calls with
        # different estimates at the same epoch don't share stale entries
        ep_key = (
            round(epoch0.to_tai_seconds(), 9),
            getattr(self, "_kcap_grow", 1),
            float(nominal.dry_mass_kg),
            float(nominal.srp_area_m2),
            float(nominal.drag_area_m2),
            None if self._max_gap_user is not None
            else round(float(nominal.orbit.sma_km), 6),
        )
        h = _hl.sha256()
        h.update(np.ascontiguousarray(arc.epochs_tai_s).tobytes())
        h.update(np.ascontiguousarray(arc.values).tobytes())
        h.update(repr(arc.trackers).encode())
        h.update(np.ascontiguousarray(arc.tracker_idx).tobytes())
        key = (h.hexdigest(), ep_key)
        if not hasattr(self, "_setup_cache"):
            self._setup_cache = {}
        if key in self._setup_cache:
            out, k_cap, max_gap = self._setup_cache[key]
            # restore per-call state captured at build time: a cache hit
            # after arcs of other lengths would otherwise compare n_valid
            # against ANOTHER arc's capture cap (stale saturation checks)
            self._last_k_cap = k_cap
            self.max_gap_s = max_gap
            return out
        out = self._setup_uncached(initial_estimate, arc)
        if len(self._setup_cache) > 8:  # bound: long MC-of-OD sessions
            self._setup_cache.clear()
        self._setup_cache[key] = (
            out, getattr(self, "_last_k_cap", 0), self.max_gap_s
        )
        return out

    def _setup_uncached(self, initial_estimate, arc: TrackingDataArc):
        self._aot_cfg = None
        epoch0 = initial_estimate.epoch
        if self._max_gap_user is None:
            orb = initial_estimate.nominal.orbit
            period = 2.0 * np.pi * np.sqrt(
                max(float(orb.sma_km), 1.0) ** 3 / orb.frame.mu_km3_s2
            )
            self.max_gap_s = float(
                np.clip(period / 24.0, 60.0, self.prop.opts.max_step_s)
            )
        t_rel, trk, obs, avail, real = self._prepare(arc, epoch0)
        m_rows = len(t_rel)
        arc_span = float(t_rel[-1]) if m_rows else 0.0
        if self.prop_mode == "batch":
            # x4 margin over the max-gap spacing (the adaptive reference's
            # natural steps are tolerance-driven, not period-driven);
            # _kcap_grow doubles on observed saturation (see process_arc)
            node_hint = min(self.max_gap_s, self.prop.opts.max_step_s) / 4.0
            k_cap = (int(arc_span / max(node_hint, 1.0)) + 64) * getattr(
                self, "_kcap_grow", 1
            )
            self._last_k_cap = k_cap
            key = (m_rows, k_cap)
            if key not in self._compiled:
                self._compiled[key] = self._build_batch(m_rows, k_cap)
        else:
            key = m_rows
            if key not in self._compiled:
                self._compiled[key] = self._build(m_rows)
        ctx = self.prop.dynamics.build_context(epoch0, arc_span, self.almanac)
        nominal = initial_estimate.nominal
        sc_params = dict(
            dry_mass_kg=nominal.dry_mass_kg,
            srp_area_m2=nominal.srp_area_m2,
            drag_area_m2=nominal.drag_area_m2,
        )
        args = (
            jnp.asarray(t_rel), jnp.asarray(trk), jnp.asarray(obs),
            jnp.asarray(avail),
        )
        epoch0_tdb = jnp.float64(epoch0.to_tdb_seconds())
        epoch0_tai = jnp.float64(epoch0.to_tai_seconds())
        return (self._compiled[key], args, ctx, sc_params,
                (epoch0_tdb, epoch0_tai), real)

    def _aot(self, jitted, example_args, name="scanod"):
        """AOT-cache a compiled filter-stage executable (nyx_tpu/aot.py): a
        fresh process skips the tracing/lowering minutes. The fingerprint
        covers every closure constant of the traced program: propagator
        config, dynamics (incl. gravity tables), station tables, filter
        settings."""
        from .. import aot

        if self._aot_cfg is None:
            self._aot_cfg = aot.deep_fingerprint((
                self.prop.opts, repr(self.prop.method),
                self.prop.dynamics,
                self.types, self.variant, self.prop_mode, self.filter_mode,
                self.filter_algebra, self.segment_rows,
                self.substeps, self.max_gap_s, self.resid_rejection_sigmas,
                self.process_noise,
                self._lat, self._lon, self._hgt, self._lt, self._rvar,
                self._tx_ts, self._tx_ys, self._off_ts, self._off_ys,
                self.estimate_biases, self._lane_dev, self._lane_type,
                self._lane_tau, self._lane_sig2, self._tint,
                self.stm_jvp_degree,
            ))
        cfg = self._aot_cfg
        memo_key = (name, tuple(
            (str(getattr(a, "dtype", "")), getattr(a, "shape", ()))
            for a in jax.tree_util.tree_leaves(example_args)
        ))
        if memo_key not in self._aot_loaded:
            from ..compileopts import jit_options

            self._aot_loaded[memo_key] = aot.get_or_compile(
                self.aot_dir, name, jitted, example_args,
                config_fingerprint=cfg,
                compiler_options=jit_options("filter"),
            )
        return self._aot_loaded[memo_key]

    def _stage(self, stages, key, args):
        """One pipeline stage, AOT-cached when an aot_dir is configured.
        NYX_OD_TRACE=1 prints per-stage walls (first call includes its
        compile) to stderr."""
        import os as _os

        fn = stages[key]
        if self.aot_dir is not None:
            # the capture size k_cap is a CLOSURE constant of the stage
            # programs and does not show in the argument shapes: without
            # it in the name, a saturation retry would reload the stale
            # small-buffer executable and saturate forever
            fn = self._aot(
                fn, args,
                name=f"scanod_{key}_k{getattr(self, '_last_k_cap', 0)}",
            )
        if _os.environ.get("NYX_OD_TRACE"):
            import sys as _sys
            import time as _time

            t0 = _time.time()
            out = jax.block_until_ready(fn(*args))
            print(f"# scanod {key}: {_time.time() - t0:8.3f}s",
                  file=_sys.stderr, flush=True)
            return out
        return fn(*args)

    def _run_stages(self, stages, args, y0, p0, ctx, sc_params, epochs0,
                    rej_thresh=None, defer_check=False):
        """Drive the four-stage batched pipeline (see _build_batch). Returns
        (out6, n_valid, y_bar, phi); intermediates never leave the device.
        `rej_thresh` overrides the configured rejection threshold for this
        pass (traced scalar — used by relinearization iterations).

        With `defer_check=True` the saturation/RUNNING host round-trip is
        skipped entirely and the raw device arrays come back as
        (out6, n_valid, ref_status, aux): the segmented EKF drives hundreds
        of sequential segment calls whose y0/p0 chain lives on the device,
        and a per-segment readback serializes the whole arc on the relay
        round-trip (~300 RTTs of dead time on a tunneled TPU — the ex06
        'hang'). The caller checks all segments in ONE sync after the loop."""
        from ..propagators.integrator import RUNNING as _RUNNING

        t_rel, trk, obs, avail = args
        epoch0_tdb, epoch0_tai = epochs0
        if rej_thresh is None:
            rej_thresh = self.resid_rejection_sigmas
        thresh = jnp.float64(
            rej_thresh if rej_thresh is not None else np.inf
        )
        ts_n, ys_n, acc_n, n_valid, ref_status = self._stage(
            stages, "s1", (t_rel, y0, ctx, sc_params)
        )
        # ALL four stages dispatch before the saturation check: the check
        # forces a host round-trip on s1's outputs, and keeping it between
        # s1 and s2 serialized the pipeline on the axon tunnel (~1 RTT of
        # dead time per call). On the rare saturated retry the queued
        # s2-s4 work computes garbage that is discarded — growth then
        # recompiles only stage 1.
        y_bar, phi, dt = self._stage(
            stages, "s2", (t_rel, ts_n, ys_n, acc_n, n_valid, ctx, sc_params)
        )
        _, h_all, z_all, r_all, q_all = self._stage(
            stages, "s3",
            (t_rel, trk, obs, avail, y_bar, dt, ts_n, ys_n, acc_n, n_valid,
             epoch0_tdb, epoch0_tai),
        )
        out = self._stage(
            stages, "s4",
            (trk, avail, y_bar, phi, dt, h_all, z_all, r_all, q_all, p0,
             thresh),
        )
        aux = dict(y_bar=y_bar, phi=phi, h_all=h_all, z_all=z_all,
                   r_all=r_all, avail=avail)
        if defer_check:
            return out, n_valid, ref_status, aux
        if self._capture_saturated(n_valid) or bool(
            np.any(np.asarray(ref_status) == _RUNNING)
        ):
            return None, n_valid, None, None
        return out, n_valid, y_bar, aux

    def process_arc(self, initial_estimate, arc: TrackingDataArc) -> ScanODResult:
        """Run the compiled scan filter over the arc. `initial_estimate`
        is a KfEstimate whose nominal epoch precedes the first measurement.

        With `iterations` > 1 (batch CKF), the filter relinearizes between
        passes: a Gauss-Newton initial-state correction (_gn_dev0) is
        folded into the reference and the pipeline re-runs (all compiles
        cached — each extra pass is pure run time). A pure CKF holds the
        reference fixed, so an initial-state error grows secularly along
        the arc (km-scale over 24 h in low orbit from a ~100 m draw), the
        linearized observable degrades, and with sigma rejection on,
        honest measurements get gated out — the filter starves.
        Intermediate passes run with rejection DISABLED (threshold inf, a
        traced scalar — no recompile); only the final pass applies the
        configured gate. NOTE: for long arcs in strongly-curved geometry
        (e.g. surface stations at orbital-altitude ranges) prefer
        variant="ekf" — second-order observable terms grow with the
        square of the reference drift and the GN step then converges
        slowly (see _process_arc_ekf).

        With variant="ekf" (batch mode), the arc runs through the
        segmented pipeline instead: reference-update folding every
        `segment_rows` rows (the reference's default
        KalmanVariant::ReferenceUpdate, kalman/mod.rs:64-71)."""
        if self.prop_mode == "batch" and self.variant == "ekf":
            return self._process_arc_ekf(initial_estimate, arc)
        y0 = jnp.asarray(initial_estimate.nominal.to_vector())
        p0 = jnp.asarray(initial_estimate.covar)
        n_iter = self.iterations if self.prop_mode == "batch" else 1
        if arc.force_reject and self.resid_rejection_sigmas is None:
            raise ConfigError(
                "resid-vs-ref arcs (force_reject) need a filter built "
                "with resid_rejection_sigmas (the gate is compiled in)"
            )
        if arc.force_reject:
            # residual-versus-reference mode: every measurement rejected,
            # the solution is the pure propagation
            # (trackingdata/mod.rs:506, process/mod.rs:175-180)
            n_iter = 1
        for it in range(n_iter):
            final_pass = it == n_iter - 1
            thresh = self.resid_rejection_sigmas if final_pass else np.inf
            if arc.force_reject:
                thresh = -np.inf
            for _attempt in range(4):
                prog, args, ctx, sc_params, epochs0, real = self._setup(
                    initial_estimate, arc
                )
                if isinstance(prog, dict):  # batch mode: staged pipeline
                    out, n_valid, y_bar, aux = self._run_stages(
                        prog["stages"], args, y0, p0, ctx, sc_params,
                        epochs0, rej_thresh=thresh,
                    )
                    if out is None:  # capture saturated: double + recompile
                        self._kcap_grow = getattr(self, "_kcap_grow", 1) * 2
                        continue
                else:
                    run, _ = prog
                    all_args = (*args, y0, p0, ctx, sc_params, *epochs0)
                    if self.aot_dir is not None:
                        run = self._aot(run, all_args)
                    out = run(*all_args)
                break
            else:
                self._check_capture(n_valid)  # raises
                raise PropagationError(
                    "scan-filter stage 1 still RUNNING after 4 growth "
                    "retries: the reference propagation exhausted its scan "
                    "trip budget without saturating the capture buffer — "
                    "raise IntegratorOptions.scan_iterations or use "
                    "loop_mode='while'"
                )
            if final_pass:
                break
            y0 = y0 + jnp.asarray(self._gn_dev0(aux, p0))
        y_est, covar, prefit, postfit, ratio, rejected = out
        return self._result(arc, real, y_est, covar, prefit, postfit,
                            ratio, rejected)

    def _process_arc_ekf(self, initial_estimate, arc: TrackingDataArc):
        """Segmented reference-update filtering: the batch-EKF middle
        ground between the host loop (relinearize every measurement,
        od/process.py) and the pure batched CKF (never relinearize).

        The prepared rows are cut into `segment_rows`-row segments; each
        segment runs the four-stage batched pipeline, and the filtered
        estimate at the segment's last row becomes the next segment's
        reference initial state (KalmanVariant::ReferenceUpdate,
        kalman/mod.rs:64-71, applied per segment instead of per row).
        Deviations stay bounded by one segment's drift, so the
        linearization — and therefore the 3-sigma gate — stays honest on
        day-long arcs in strongly-curved measurement geometry where the
        full-arc CKF diverges (lunar surface stations: a 130 m draw grows
        to 7+ km of reference drift and ~100 m second-order observable
        errors against 2 m noise). All segments share one compiled shape
        (padded rows with dt=0 and avail=False pass the carry through).

        Two-way caveat: a row earlier than T_int after a segment boundary
        clamps its t-T_int lookup to the boundary; exact when the cadence
        >= T_int (the DSN configs), sub-sample error otherwise."""
        if self.n_bias:
            raise ConfigError(
                "variant='ekf' does not support estimated bias lanes; "
                "use the CKF with iterations instead"
            )
        if arc.force_reject and self.resid_rejection_sigmas is None:
            raise ConfigError(
                "resid-vs-ref arcs (force_reject) need a filter built "
                "with resid_rejection_sigmas (the gate is compiled in)"
            )
        rej_override = -np.inf if arc.force_reject else None
        for _attempt in range(4):
            segs, real, stages = self._ekf_setup(initial_estimate, arc)
            nominal = initial_estimate.nominal
            sc_params = dict(
                dry_mass_kg=nominal.dry_mass_kg,
                srp_area_m2=nominal.srp_area_m2,
                drag_area_m2=nominal.drag_area_m2,
            )
            y0 = jnp.asarray(nominal.to_vector())
            p0 = jnp.asarray(initial_estimate.covar)
            outs = []
            checks = []
            for (args, epochs0, ctx, n_real) in segs:
                # defer_check: the whole segment chain (y0/p0 carried on
                # the device) enqueues with ZERO host syncs — a
                # per-segment saturation readback costs one relay
                # round-trip each and serialized ~300-segment arcs into a
                # multi-hour crawl on the tunneled TPU
                out, n_valid, ref_status, _ = self._run_stages(
                    stages, args, y0, p0, ctx, sc_params, epochs0,
                    rej_thresh=rej_override, defer_check=True,
                )
                outs.append(out)
                checks.append((n_valid, ref_status))
                # fold: padded rows are dt=0 masked time updates, so the
                # last row equals the segment's last real row
                y0 = out[0][-1][:STATE_DIM]
                p0 = out[1][-1]
            # ONE sync for the whole arc: reduce every segment's check on
            # device, fetch two tiny arrays
            from ..propagators.integrator import RUNNING as _RUNNING

            nv_max = jnp.stack([jnp.max(nv) for nv, _ in checks])
            running = jnp.stack(
                [jnp.any(rs == _RUNNING) for _, rs in checks]
            )
            if not (self._capture_saturated(nv_max)
                    or bool(np.any(np.asarray(running)))):
                break
            self._kcap_grow = getattr(self, "_kcap_grow", 1) * 2
        else:
            raise PropagationError(
                "segmented EKF: capture buffer still saturated (or the "
                "reference scan budget exhausted) after 4 growth retries; "
                "pass a smaller max_gap_s / larger scan_iterations"
            )
        # device-side concat + one fetch per output: 6 transfers instead
        # of 6 x n_segments tiny per-segment readbacks
        s_rows = int(segs[0][0][0].shape[0])
        full = jax.device_get(
            [jnp.concatenate([o[i] for o in outs], axis=0)
             for i in range(6)]
        )
        idx = np.concatenate(
            [np.arange(seg[3]) + k * s_rows for k, seg in enumerate(segs)]
        )
        cat = [np.asarray(f)[idx] for f in full]
        return self._result(arc, real, *cat)

    def _ekf_setup(self, initial_estimate, arc):
        """Host-side segmented layout for _process_arc_ekf, memoized like
        _setup: per-segment padded row arrays, epoch scalars and dynamics
        contexts (rebuilt per segment epoch). Repeat process_arc calls on
        the same arc skip the whole per-segment host loop."""
        import hashlib as _hl

        epoch0 = initial_estimate.epoch
        nominal = initial_estimate.nominal
        ep_key = (
            round(epoch0.to_tai_seconds(), 9),
            getattr(self, "_kcap_grow", 1),
            self.segment_rows,
            None if self._max_gap_user is not None
            else round(float(nominal.orbit.sma_km), 6),
        )
        h = _hl.sha256()
        h.update(np.ascontiguousarray(arc.epochs_tai_s).tobytes())
        h.update(np.ascontiguousarray(arc.values).tobytes())
        h.update(repr(arc.trackers).encode())
        h.update(np.ascontiguousarray(arc.tracker_idx).tobytes())
        key = (h.hexdigest(), ep_key)
        if not hasattr(self, "_ekf_cache"):
            self._ekf_cache = {}
        if key in self._ekf_cache:
            segs, real, stage_key, k_cap, max_gap = self._ekf_cache[key]
            self._last_k_cap = k_cap
            self.max_gap_s = max_gap
            return segs, real, self._compiled[stage_key]["stages"]
        if self._max_gap_user is None:
            orb = nominal.orbit
            period = 2.0 * np.pi * np.sqrt(
                max(float(orb.sma_km), 1.0) ** 3 / orb.frame.mu_km3_s2
            )
            self.max_gap_s = float(
                np.clip(period / 24.0, 60.0, self.prop.opts.max_step_s)
            )
        t_rel, trk, obs, avail, real = self._prepare(arc, epoch0)
        m_rows = len(t_rel)
        s_rows = max(2, min(self.segment_rows, m_rows))
        # segment boundaries: every s_rows rows, shifted left (up to
        # s_rows//2) so the row AFTER each boundary is at least the
        # longest two-way integration time later — the t - T_int lookup
        # of a segment's first row clamps at the segment epoch, and a
        # boundary closer than T_int would evaluate the turnaround state
        # tens of seconds late (a ~50 km range error at orbital speed)
        tint_max = float(np.max(np.asarray(self._tint))) if len(
            self.devices) else 0.0
        bounds = []
        b0 = 0
        while b0 < m_rows:
            b1 = min(b0 + s_rows, m_rows)
            if tint_max > 0.0 and b1 < m_rows:
                shift = 0
                while (
                    shift < s_rows // 2 and b1 - b0 > 2
                    and t_rel[b1] - t_rel[b1 - 1] < tint_max - 1e-9
                ):
                    b1 -= 1
                    shift += 1
            bounds.append((b0, b1))
            b0 = b1
        prev_ts = [0.0] + [float(t_rel[b1 - 1]) for _, b1 in bounds[:-1]]
        spans = [float(t_rel[b1 - 1]) - p
                 for (_, b1), p in zip(bounds, prev_ts)]
        node_hint = min(self.max_gap_s, self.prop.opts.max_step_s) / 4.0
        k_cap = (int(max(spans) / max(node_hint, 1.0)) + 64) * getattr(
            self, "_kcap_grow", 1
        )
        self._last_k_cap = k_cap
        stage_key = ("ekf", s_rows, k_cap)
        if stage_key not in self._compiled:
            self._aot_cfg = None
            self._compiled[stage_key] = self._build_batch(s_rows, k_cap)
        n_types = len(self.types)
        segs = []
        for (b0, b1), t_prev in zip(bounds, prev_ts):
            n_real = b1 - b0
            pad = s_rows - n_real
            ts = np.asarray(t_rel[b0:b1], dtype=np.float64) - t_prev
            ts_p = np.concatenate([ts, np.full(pad, ts[-1])])
            trk_p = np.concatenate([trk[b0:b1], np.zeros(pad, np.int32)])
            obs_p = np.concatenate([obs[b0:b1], np.zeros((pad, n_types))])
            av_p = np.concatenate(
                [avail[b0:b1], np.zeros((pad, n_types), dtype=bool)]
            )
            epoch_seg = epoch0 + t_prev
            ctx = self.prop.dynamics.build_context(
                epoch_seg, float(ts_p[-1]), self.almanac
            )
            args = (jnp.asarray(ts_p), jnp.asarray(trk_p),
                    jnp.asarray(obs_p), jnp.asarray(av_p))
            epochs0 = (
                jnp.float64(epoch_seg.to_tdb_seconds()),
                jnp.float64(epoch_seg.to_tai_seconds()),
            )
            segs.append((args, epochs0, ctx, n_real))
        if len(self._ekf_cache) > 8:
            self._ekf_cache.clear()
        self._ekf_cache[key] = (segs, real, stage_key, k_cap, self.max_gap_s)
        return segs, real, self._compiled[stage_key]["stages"]

    def _gn_dev0(self, aux, p0):
        """Gauss-Newton initial-state correction from one filter pass: map
        every row's measurement partials back to the epoch through the
        forward STM chain (H~_k = H_k Phi(t0->t_k)) and solve the prior-
        regularized normal equations at t0. Host-side 9x9 numpy.

        This — not an RTS smoothing pass — is the right relinearization
        update: with small/zero process noise the smoothed initial
        deviation degenerates to Phi(t0->tM)^-1 dev_M (RTS gain = Phi^-1
        exactly when Q=0), and that backward map amplifies the filtered
        estimate's linearization error through a cond~4e9 inverse
        (measured: an 860 mm/s velocity 'correction' against a 20 mm/s
        draw). The GN normal equations accumulate information FORWARD, so
        nothing is amplified; convergence over relinearization passes is
        the standard quadratic Gauss-Newton rate. Matches the reference's
        BLSE iteration (od/blse.rs normal-equation accumulation) applied
        to the scan pipeline's batched H/z/R products."""
        d = STATE_DIM
        phi = np.asarray(aux["phi"])
        h = np.asarray(aux["h_all"])[:, :, :d]
        z = np.asarray(aux["z_all"])
        r = np.asarray(aux["r_all"])
        avail = np.asarray(aux["avail"])
        m_rows = phi.shape[0]
        a_mat = np.zeros((d, d))
        b_vec = np.zeros(d)
        phi0k = np.eye(d)
        for k in range(m_rows):
            phi0k = phi[k] @ phi0k
            if not avail[k].any():
                continue
            hk = h[k] @ phi0k  # [T, d]
            w = np.where(avail[k], 1.0 / r[k], 0.0)
            hw = hk * w[:, None]
            a_mat += hw.T @ hk
            b_vec += hw.T @ z[k]
        # prior term on the estimated lanes; zero-prior-variance lanes
        # (unestimated parameters) are held fixed (dx = 0)
        p0h = np.asarray(p0)[:d, :d]
        var = np.diag(p0h)
        mask = var > 1e-30
        idx = np.where(mask)[0]
        a_sub = a_mat[np.ix_(idx, idx)] + np.linalg.inv(
            p0h[np.ix_(idx, idx)]
        )
        dx = np.zeros(d)
        dx[idx] = np.linalg.solve(a_sub, b_vec[idx])
        return dx

    def predict_for(self, initial_estimate, duration, step=60.0):
        """Batched covariance mapping (od/process/mod.rs predict_for): time
        updates only, over a uniform `step` grid spanning `duration`.

        TPU-native contrast to the host-loop KalmanODProcess.predict_for:
        the grid rows go through the same staged pipeline as a tracking
        arc — one dense-capture reference propagation, ONE [M, 90] batched
        STM call for every mapping interval, and the filter algebra with
        every row masked (no measurements -> pure time updates). A 9,360-
        estimate 6.5-day mapping is one device pipeline instead of 9,360
        host-driven propagate calls."""
        from ..time import Duration as _Dur

        dur_s = duration.to_seconds() if isinstance(duration, _Dur) else float(duration)
        step_s = step.to_seconds() if isinstance(step, _Dur) else float(step)
        m = max(1, int(round(dur_s / step_s)))
        epoch0 = initial_estimate.epoch
        t_grid = np.arange(1, m + 1) * step_s
        nan = np.full((m, len(self.types)), np.nan)
        name = self.devices[0].name if self.devices else "predict"
        arc = TrackingDataArc(
            epochs_tai_s=epoch0.to_tai_seconds() + t_grid,
            trackers=(name,),
            tracker_idx=np.zeros(m, dtype=np.int32),
            types=self.types,
            values=nan,  # all-NaN -> avail=False -> time updates only
        )
        return self.process_arc(initial_estimate, arc)

    def _result(self, arc, real, y_est, covar, prefit, postfit, ratio,
                rejected):
        # one batched transfer instead of six sequential fetches (each
        # np.asarray pays its own tunnel round trip on axon)
        y_est, covar, prefit, postfit, ratio, rejected = jax.device_get(
            (y_est, covar, prefit, postfit, ratio, rejected)
        )
        bias_est = bias_var = None
        lanes = ()
        if self.n_bias:
            bias_est = y_est[real, STATE_DIM:]
            idx = np.arange(STATE_DIM, STATE_DIM + self.n_bias)
            bias_var = covar[real][:, idx, idx]
            y_est = y_est[:, :STATE_DIM]
            covar = covar[:, :STATE_DIM, :STATE_DIM]
            lanes = tuple(
                (self.devices[int(i)].name, self.types[int(j)])
                for i, j in zip(self._lane_dev, self._lane_type)
            )
        return ScanODResult(
            epochs_tai_s=np.asarray(arc.epochs_tai_s),
            y_est=y_est[real],
            covar=covar[real],
            prefit=np.asarray(prefit)[real],
            postfit=np.asarray(postfit)[real],
            ratio=np.asarray(ratio)[real],
            rejected=np.asarray(rejected)[real],
            types=self.types,
            bias_est=bias_est,
            bias_var=bias_var,
            bias_lanes=lanes,
        )

    def _capture_saturated(self, n_valid) -> bool:
        """True when the reference capture buffer filled completely:
        device writes clamp silently, which would degrade the Hermite
        interpolation (n_valid counts the initial node + traj_len)."""
        k_cap = getattr(self, "_last_k_cap", 0)
        return bool(k_cap) and int(np.max(np.asarray(n_valid))) >= k_cap

    def _check_capture(self, n_valid):
        from ..errors import PropagationError

        if self._capture_saturated(n_valid):
            raise PropagationError(
                "scan-filter reference capture buffer saturated "
                f"({self._last_k_cap} nodes) even after growth; pass a "
                "smaller max_gap_s or an explicit larger buffer"
            )

    def process_arc_batch(self, initial_estimates, arc: TrackingDataArc,
                          mesh=None):
        """Run an ensemble of filters over the same arc in one vmapped
        program (the reference's "MC of ODs" has no counterpart — rayon
        would fan out whole processes; here the filter ensemble is just
        another batch axis). Returns a list of ScanODResult.

        `mesh`: optional jax Mesh — the filter ensemble is sharded over
        its first axis (each device runs its slice of the vmapped filters;
        the arc/reference inputs are replicated; SURVEY §2.8 "OD residual
        aggregation" collective point). The batch is padded to a multiple
        of the device count with copies of lane 0 and sliced back."""
        if self.variant == "ekf":
            # the vmapped ensemble runs the full-arc CKF pipeline; the
            # segmented reference-update fold (per-filter, per-segment
            # host loop) is not vmapped. Erroring beats silently running
            # different filter semantics than process_arc would.
            raise ConfigError(
                "process_arc_batch supports variant='ckf' only; for an "
                "EKF ensemble run process_arc per estimate (or use the "
                "CKF with iterations)"
            )
        first = initial_estimates[0]
        n_real = len(initial_estimates)
        y0s = jnp.asarray(np.stack([e.nominal.to_vector() for e in initial_estimates]))
        p0s = jnp.asarray(np.stack([e.covar for e in initial_estimates]))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_dev = int(mesh.devices.size)
            pad = (-n_real) % n_dev
            if pad:
                y0s = jnp.concatenate(
                    [y0s, jnp.broadcast_to(y0s[:1], (pad,) + y0s.shape[1:])]
                )
                p0s = jnp.concatenate(
                    [p0s, jnp.broadcast_to(p0s[:1], (pad,) + p0s.shape[1:])]
                )
            sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            y0s = jax.device_put(y0s, sh)
            p0s = jax.device_put(p0s, sh)
        for _attempt in range(4):
            prog, args, ctx, sc_params, epochs0, real = (
                self._setup(first, arc)
            )
            if isinstance(prog, dict):  # batch mode: staged pipeline
                outs, n_valid, _, _ = self._run_stages(
                    prog["stages_b"], args, y0s, p0s, ctx, sc_params, epochs0
                )
                if outs is None:  # capture saturated: double and recompile
                    self._kcap_grow = getattr(self, "_kcap_grow", 1) * 2
                    continue
            else:
                _, run_batch = prog
                outs = run_batch(*args, y0s, p0s, ctx, sc_params, *epochs0)
            break
        else:
            self._check_capture(n_valid)  # raises
        y_est, covar, prefit, postfit, ratio, rejected = outs
        return [
            self._result(arc, real, y_est[k], covar[k], prefit[k],
                         postfit[k], ratio[k], rejected[k])
            for k in range(n_real)
        ]
