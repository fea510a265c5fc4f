"""Measurement types and the tracking-data container.

Counterparts of the reference's `od/msr/` stack: `MeasurementType`
(types.rs:36-156), `Measurement` (measurement.rs:39-110) and
`TrackingDataArc` (trackingdata/mod.rs:76-506). Storage is
struct-of-arrays: epochs as float64 TAI seconds past J2000, an integer
tracker index, and a dense `[M, T]` value matrix with NaN marking absent
types — the layout the batched filter kernels consume directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..time import Epoch


class MeasurementType:
    """Measurement type tags (types.rs:36-75). Values are km / km/s / deg."""

    RANGE_KM = "range_km"
    DOPPLER_KM_S = "doppler_km_s"
    AZIMUTH_DEG = "azimuth_deg"
    ELEVATION_DEG = "elevation_deg"
    X_KM = "x_km"
    Y_KM = "y_km"
    Z_KM = "z_km"
    #: raw radiometric frequency observables (Hz / Hz/s). As in the
    #: reference (types.rs:105-116), these cannot be simulated or filtered
    #: directly — the TDM reader converts RECEIVE/TRANSMIT_FREQ pairs into
    #: Doppler range-rate via the turnaround ratio (io_ccsds_tdm.rs:261-370).
    RECEIVE_FREQ_HZ = "receive_freq"
    TRANSMIT_FREQ_HZ = "transmit_freq"
    TRANSMIT_FREQ_RATE_HZ_S = "transmit_freq_rate"

    ALL = (RANGE_KM, DOPPLER_KM_S, AZIMUTH_DEG, ELEVATION_DEG, X_KM, Y_KM, Z_KM,
           RECEIVE_FREQ_HZ, TRANSMIT_FREQ_HZ, TRANSMIT_FREQ_RATE_HZ_S)

    #: types measured in degrees (residual wrapping)
    ANGLES = (AZIMUTH_DEG, ELEVATION_DEG)

    #: raw frequency observables (TDM-parse only)
    FREQUENCIES = (RECEIVE_FREQ_HZ, TRANSMIT_FREQ_HZ, TRANSMIT_FREQ_RATE_HZ_S)

    UNITS = {
        RANGE_KM: "km", DOPPLER_KM_S: "km/s", AZIMUTH_DEG: "deg",
        ELEVATION_DEG: "deg", X_KM: "km", Y_KM: "km", Z_KM: "km",
        RECEIVE_FREQ_HZ: "Hz", TRANSMIT_FREQ_HZ: "Hz",
        TRANSMIT_FREQ_RATE_HZ_S: "Hz/s",
    }


@dataclass
class Measurement:
    """One epoch's observations from one tracker (measurement.rs:39-110)."""

    tracker: str
    epoch: Epoch
    data: Dict[str, float] = field(default_factory=dict)

    def observation(self, types: Sequence[str]) -> np.ndarray:
        return np.array([self.data.get(t, np.nan) for t in types])

    def availability(self, types: Sequence[str]) -> np.ndarray:
        return np.array([t in self.data for t in types])


@dataclass
class TrackingDataArc:
    """Chronologically sorted measurements (trackingdata/mod.rs:76-506).

    epochs_tai_s: [M] float64 TAI s past J2000, non-decreasing
    tracker_idx:  [M] int index into `trackers`
    values:       [M, T] float64, NaN = type absent at that epoch
    types:        T measurement-type tags (column order of `values`)
    moduli:       optional per-type ambiguity modulus (range ambiguity)
    """

    trackers: Tuple[str, ...]
    types: Tuple[str, ...]
    epochs_tai_s: np.ndarray
    tracker_idx: np.ndarray
    values: np.ndarray
    moduli: Optional[Dict[str, float]] = None
    #: residual-versus-reference mode: the OD process rejects every
    #: measurement so residuals are computed against the pure propagation
    #: (trackingdata/mod.rs:506, process/mod.rs:175-180)
    force_reject: bool = False

    # ------------------------------------------------------------------
    @classmethod
    def from_measurements(
        cls, measurements: List[Measurement], moduli=None
    ) -> "TrackingDataArc":
        measurements = sorted(measurements, key=lambda m: m.epoch.to_tai_seconds())
        trackers = tuple(dict.fromkeys(m.tracker for m in measurements))
        types = tuple(
            dict.fromkeys(t for m in measurements for t in m.data.keys())
        )
        tmap = {t: i for i, t in enumerate(trackers)}
        M, T = len(measurements), len(types)
        epochs = np.array([m.epoch.to_tai_seconds() for m in measurements])
        tidx = np.array([tmap[m.tracker] for m in measurements], dtype=np.int64)
        vals = np.full((M, T), np.nan)
        for i, m in enumerate(measurements):
            for j, t in enumerate(types):
                if t in m.data:
                    vals[i, j] = m.data[t]
        return cls(trackers, types, epochs, tidx, vals, moduli)

    def __len__(self) -> int:
        return len(self.epochs_tai_s)

    def __iter__(self):
        for i in range(len(self)):
            yield self.measurement(i)

    def measurement(self, i: int) -> Measurement:
        data = {
            t: float(self.values[i, j])
            for j, t in enumerate(self.types)
            if np.isfinite(self.values[i, j])
        }
        return Measurement(
            self.trackers[self.tracker_idx[i]],
            Epoch.from_tai_seconds_j2000(float(self.epochs_tai_s[i])),
            data,
        )

    @property
    def start_epoch(self) -> Optional[Epoch]:
        if len(self) == 0:
            return None
        return Epoch.from_tai_seconds_j2000(float(self.epochs_tai_s[0]))

    @property
    def end_epoch(self) -> Optional[Epoch]:
        if len(self) == 0:
            return None
        return Epoch.from_tai_seconds_j2000(float(self.epochs_tai_s[-1]))

    def unique_types(self) -> Tuple[str, ...]:
        present = ~np.all(np.isnan(self.values), axis=0)
        return tuple(t for t, p in zip(self.types, present) if p)

    def unique_aliases(self) -> Tuple[str, ...]:
        return tuple(self.trackers[i] for i in np.unique(self.tracker_idx))

    # -------- set operations (trackingdata/mod.rs:393-506) -------------
    def _mask(self, keep: np.ndarray) -> "TrackingDataArc":
        return TrackingDataArc(
            self.trackers,
            self.types,
            self.epochs_tai_s[keep],
            self.tracker_idx[keep],
            self.values[keep],
            self.moduli,
            self.force_reject,
        )

    def resid_vs_ref_check(self) -> "TrackingDataArc":
        """Arc copy whose processing computes residuals against the pure
        propagated reference (every measurement force-rejected,
        trackingdata/mod.rs:506)."""
        from dataclasses import replace

        return replace(self, force_reject=True)

    def filter_by_epoch(self, start: Epoch, end: Epoch) -> "TrackingDataArc":
        s, e = start.to_tai_seconds(), end.to_tai_seconds()
        return self._mask((self.epochs_tai_s >= s) & (self.epochs_tai_s <= e))

    def filter_by_offset(self, start_offset_s=0.0, end_offset_s=None):
        """Keep measurements within [start, end] offsets (seconds or
        Duration) from the arc start (trackingdata filter_by_offset)."""
        from ..time import Duration

        def _s(x):
            return x.to_seconds() if isinstance(x, Duration) else float(x)

        t0 = float(self.epochs_tai_s[0]) if len(self.epochs_tai_s) else 0.0
        rel = self.epochs_tai_s - t0
        keep = rel >= _s(start_offset_s)
        if end_offset_s is not None:
            keep &= rel <= _s(end_offset_s)
        return self._mask(keep)

    def exclude_by_epoch(self, start: Epoch, end: Epoch) -> "TrackingDataArc":
        s, e = start.to_tai_seconds(), end.to_tai_seconds()
        return self._mask((self.epochs_tai_s < s) | (self.epochs_tai_s > e))

    def filter_by_tracker(self, aliases: Sequence[str]) -> "TrackingDataArc":
        ids = [i for i, t in enumerate(self.trackers) if t in set(aliases)]
        return self._mask(np.isin(self.tracker_idx, ids))

    def reject_by_tracker(self, aliases: Sequence[str]) -> "TrackingDataArc":
        ids = [i for i, t in enumerate(self.trackers) if t in set(aliases)]
        return self._mask(~np.isin(self.tracker_idx, ids))

    def filter_by_type(self, types: Sequence[str]) -> "TrackingDataArc":
        cols = [j for j, t in enumerate(self.types) if t in set(types)]
        vals = np.full_like(self.values, np.nan)
        vals[:, cols] = self.values[:, cols]
        keep = ~np.all(np.isnan(vals), axis=1)
        return TrackingDataArc(
            self.trackers,
            self.types,
            self.epochs_tai_s[keep],
            self.tracker_idx[keep],
            vals[keep],
            self.moduli,
        )

    def downsample(self, step) -> "TrackingDataArc":
        """Keep at most one measurement per tracker per `step` interval."""
        from ..time import Duration

        step_s = step.to_seconds() if isinstance(step, Duration) else float(step)
        keep = np.zeros(len(self), dtype=bool)
        last: Dict[int, float] = {}
        for i in range(len(self)):
            trk = int(self.tracker_idx[i])
            t = float(self.epochs_tai_s[i])
            if trk not in last or t - last[trk] >= step_s - 1e-9:
                keep[i] = True
                last[trk] = t
        return self._mask(keep)

    def split_by_gap(self, min_gap) -> List["TrackingDataArc"]:
        from ..time import Duration

        gap_s = min_gap.to_seconds() if isinstance(min_gap, Duration) else float(min_gap)
        if len(self) == 0:
            return [self]
        cuts = np.where(np.diff(self.epochs_tai_s) > gap_s)[0] + 1
        out = []
        for chunk in np.split(np.arange(len(self)), cuts):
            keep = np.zeros(len(self), dtype=bool)
            keep[chunk] = True
            out.append(self._mask(keep))
        return out

    # -------- I/O (trackingdata/io_parquet.rs:47-227) -------------------
    def to_parquet(self, path) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = {
            "epoch_tai_s": self.epochs_tai_s,
            "tracker": [self.trackers[i] for i in self.tracker_idx],
        }
        for j, t in enumerate(self.types):
            cols[t] = self.values[:, j]
        meta = {b"generator": b"nyx_tpu"}
        if self.moduli:
            import json

            meta[b"moduli"] = str.encode(json.dumps(self.moduli))
        table = pa.table(cols).replace_schema_metadata(meta)
        pq.write_table(table, str(path), compression="zstd")
        return str(path)

    @classmethod
    def from_parquet(cls, path) -> "TrackingDataArc":
        import pyarrow.parquet as pq

        table = pq.read_table(str(path))
        names = table.column_names
        epochs = np.asarray(table["epoch_tai_s"], dtype=np.float64)
        tracker_names = [str(x) for x in table["tracker"].to_pylist()]
        trackers = tuple(dict.fromkeys(tracker_names))
        tmap = {t: i for i, t in enumerate(trackers)}
        tidx = np.array([tmap[t] for t in tracker_names], dtype=np.int64)
        types = tuple(n for n in names if n not in ("epoch_tai_s", "tracker"))
        vals = np.stack(
            [np.asarray(table[t], dtype=np.float64) for t in types], axis=-1
        )
        moduli = None
        meta = table.schema.metadata or {}
        if b"moduli" in meta:
            import json

            moduli = json.loads(meta[b"moduli"].decode())
        order = np.argsort(epochs, kind="stable")
        return cls(trackers, types, epochs[order], tidx[order], vals[order], moduli)

    def __str__(self):
        return (
            f"TrackingDataArc: {len(self)} measurements from "
            f"{len(self.trackers)} trackers over "
            f"[{self.start_epoch}, {self.end_epoch}]"
        )
