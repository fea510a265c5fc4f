"""Export: trajectories and ensembles to parquet / CCSDS OEM.

Counterpart of the reference's ExportCfg-driven parquet exports
(io/mod.rs:53-120, md/trajectory/sc_traj.rs:183-212) and watermarking
(io/watermark.rs:29-56).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from .. import __version__
from ..md import param as param_mod
from ..time import Duration, Epoch

WATERMARK = {"Generator": f"nyx-tpu v{__version__}"}

DEFAULT_FIELDS = (
    "x", "y", "z", "vx", "vy", "vz", "sma", "ecc", "inc", "raan", "aop", "ta",
)


@dataclass
class ExportCfg:
    """Field selection, epoch bounds and resampling step for exports
    (reference: io/mod.rs:53-120)."""

    fields: Sequence[str] = DEFAULT_FIELDS
    step: Optional[float] = None  # seconds; None = raw integrator steps
    start_epoch: Optional[Epoch] = None
    end_epoch: Optional[Epoch] = None
    metadata: dict = field(default_factory=dict)
    #: append a UTC timestamp to the filename (io/mod.rs:69-71)
    timestamp: bool = False

    @classmethod
    def default(cls) -> "ExportCfg":
        return cls()

    def actual_path(self, path) -> str:
        if not self.timestamp:
            return str(path)
        import datetime as _dt
        from pathlib import Path as _P

        p = _P(str(path))
        stamp = _dt.datetime.now(_dt.timezone.utc).strftime("%Y-%m-%dT%H-%M-%S")
        return str(p.with_name(f"{p.stem}-{stamp}{p.suffix}"))


def _traj_table(traj, cfg: ExportCfg):
    import jax.numpy as jnp
    import pyarrow as pa

    t = traj
    if cfg.step is not None:
        t = traj.resample(cfg.step)
    ts, ys = t.ts, t.ys
    lo = (
        (cfg.start_epoch - t.epoch0).to_seconds() if cfg.start_epoch else -np.inf
    )
    hi = (cfg.end_epoch - t.epoch0).to_seconds() if cfg.end_epoch else np.inf
    mask = (ts >= lo) & (ts <= hi)
    ts, ys = ts[mask], ys[mask]
    frame = t.template.frame
    cols = {
        "epoch_tai_s": ts + t.epoch0.to_tai_seconds(),
        "epoch_utc": [
            (t.epoch0 + float(dt)).isoformat("UTC") for dt in ts
        ],
    }
    yj = jnp.asarray(ys)
    for f in cfg.fields:
        cols[f] = np.asarray(
            param_mod.value(f, yj, frame.mu, frame.radius_km or 0.0)
        )
    meta = {**WATERMARK, **{str(k): str(v) for k, v in cfg.metadata.items()}}
    table = pa.table(cols)
    return table.replace_schema_metadata(meta)


def traj_to_parquet(traj, path, cfg: Optional[ExportCfg] = None) -> str:
    import pyarrow.parquet as pq

    cfg = cfg or ExportCfg()
    path = cfg.actual_path(path)
    pq.write_table(_traj_table(traj, cfg), path, compression="zstd")
    return str(path)


def traj_to_oem(traj, path, cfg: Optional[ExportCfg] = None) -> str:
    """Write a CCSDS OEM 2.0 ASCII file (reference: sc_traj.rs:183-200)."""
    cfg = cfg or ExportCfg()
    t = traj if cfg.step is None else traj.resample(cfg.step)
    frame = t.template.frame
    lines = [
        "CCSDS_OEM_VERS = 2.0",
        f"CREATION_DATE = {_dt.datetime.now(_dt.timezone.utc).strftime('%Y-%m-%dT%H:%M:%S')}",
        "ORIGINATOR = nyx-tpu",
        "",
        "META_START",
        "OBJECT_NAME = SPACECRAFT",
        "OBJECT_ID = SPACECRAFT",
        f"CENTER_NAME = {frame}",
        "REF_FRAME = EME2000",
        "TIME_SYSTEM = UTC",
        f"START_TIME = {t.start_epoch.isoformat('UTC').rsplit(' ', 1)[0]}",
        f"STOP_TIME = {t.end_epoch.isoformat('UTC').rsplit(' ', 1)[0]}",
        "META_STOP",
        "",
    ]
    for dt, y in zip(t.ts, t.ys):
        ep = (t.epoch0 + float(dt)).isoformat("UTC").rsplit(" ", 1)[0]
        lines.append(
            f"{ep} "
            + " ".join(f"{v:.9e}" for v in y[0:6])
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return str(path)


def read_oem(path, template) -> "object":
    """Read a CCSDS OEM file back into a Trajectory."""
    from ..md.trajectory import Trajectory

    epochs, states = [], []
    with open(path) as f:
        in_meta = False
        for line in f:
            line = line.strip()
            if line == "META_START":
                in_meta = True
                continue
            if line == "META_STOP":
                in_meta = False
                continue
            if in_meta or not line or "=" in line or line.startswith("COMMENT"):
                continue
            toks = line.split()
            if len(toks) < 7:
                continue
            epochs.append(Epoch.from_str(toks[0] + " UTC"))
            states.append([float(v) for v in toks[1:7]])
    epoch0 = epochs[0]
    ts = np.array([(e - epoch0).to_seconds() for e in epochs])
    ys = np.zeros((len(states), 9))
    ys[:, 0:6] = np.asarray(states)
    ys[:, 6] = template.cr
    ys[:, 7] = template.cd
    ys[:, 8] = template.prop_mass_kg
    return Trajectory.from_capture(epoch0, ts, ys, template)
