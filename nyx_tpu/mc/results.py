"""Monte Carlo results: ensemble queries and export.

Counterpart of the reference's `Results`/`Run` (mc/results.rs:48-242), with
queries vectorized over the ensemble axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..cosmic.spacecraft import Spacecraft
from ..md import param as param_mod
from ..time import Epoch


@dataclass
class Results:
    epoch0: Epoch
    end_epoch: Epoch
    template: Spacecraft
    y_final: np.ndarray  # [B, 9]
    status: np.ndarray  # [B]
    n_accepted: np.ndarray
    n_rejected: np.ndarray

    @property
    def n_runs(self) -> int:
        return self.y_final.shape[0]

    @property
    def n_ok(self) -> int:
        from ..propagators.integrator import DONE

        return int(np.sum(self.status == DONE))

    def final_values_of(self, parameter: str) -> np.ndarray:
        frame = self.template.frame
        return np.asarray(
            param_mod.value(
                parameter, jnp.asarray(self.y_final), frame.mu, frame.radius_km or 0.0
            )
        )

    def dispersion_values_of(self, parameter: str) -> tuple[float, float]:
        vals = self.final_values_of(parameter)
        return float(np.mean(vals)), float(np.std(vals))

    def final_state(self, index: int) -> Spacecraft:
        return self.template.set_vector(self.end_epoch, self.y_final[index])

    def truncated(self, n: int) -> "Results":
        """First n runs (drops chunk padding)."""
        return Results(
            self.epoch0, self.end_epoch, self.template,
            self.y_final[:n], self.status[:n],
            self.n_accepted[:n], self.n_rejected[:n],
        )

    @classmethod
    def concatenate(cls, chunks: list) -> "Results":
        first = chunks[0]
        return cls(
            first.epoch0, first.end_epoch, first.template,
            np.concatenate([c.y_final for c in chunks]),
            np.concatenate([c.status for c in chunks]),
            np.concatenate([c.n_accepted for c in chunks]),
            np.concatenate([c.n_rejected for c in chunks]),
        )

    def to_parquet(self, path, fields=("x", "y", "z", "vx", "vy", "vz", "sma", "ecc", "inc")) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..io.export import WATERMARK

        cols = {"run": np.arange(self.n_runs), "status": self.status}
        for f in fields:
            cols[f] = self.final_values_of(f)
        table = pa.table(cols).replace_schema_metadata(WATERMARK)
        pq.write_table(table, path, compression="zstd")
        return str(path)
