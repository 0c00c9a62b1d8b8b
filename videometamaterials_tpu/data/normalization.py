"""Column-wise label/data normalizer.

Re-design of src/normalization.py:5-96 as an immutable numpy-backed pytree:
statistics are fit once (host-side), then `normalize`/`unnormalize` are pure
vectorized transforms usable both on host and inside jitted code (they only
use broadcasting arithmetic).

Strategies (same names/semantics as the reference):
  min-max-1        per-column [0, 1]
  min-max-2        per-column [-1, 1]
  global-min-max-1 whole-tensor [0, 1]
  global-min-max-2 whole-tensor [-1, 1]   <- used for stress-strain labels
                                             (vddp.py:1278)
  mean-std         per-column standardize (std with ddof=1, torch convention)
  none             identity

Categorical one-hot handling of the reference is supported via
`one_hot_categoricals` (host-side only; the diffusion pipeline never uses it).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

_STRATEGIES = ("min-max-1", "min-max-2", "global-min-max-1",
               "global-min-max-2", "mean-std", "none")


@dataclass(frozen=True)
class Normalization:
    mu: np.ndarray
    std: np.ndarray
    min: np.ndarray
    max: np.ndarray
    globalmin: float
    globalmax: float
    strategy: str

    @classmethod
    def fit(cls, data, data_types: Sequence[str] | None = None,
            strategy: str = "global-min-max-2") -> "Normalization":
        data = np.asarray(data, dtype=np.float32)
        if strategy not in _STRATEGIES:
            raise ValueError(f"Incorrect normalization strategy: {strategy}")
        if data_types is not None and any(t != "continuous" for t in data_types):
            raise ValueError("categorical columns: use one_hot_categoricals() "
                             "before fitting")
        return cls(
            mu=data.mean(axis=0),
            std=data.std(axis=0, ddof=1),  # torch.std default is unbiased
            min=data.min(axis=0),
            max=data.max(axis=0),
            globalmin=float(data.min()),
            globalmax=float(data.max()),
            strategy=strategy,
        )

    def normalize(self, data):
        s = self.strategy
        if s == "min-max-1":
            return (data - self.min) / (self.max - self.min)
        if s == "min-max-2":
            return 2.0 * (data - self.min) / (self.max - self.min) - 1.0
        if s == "global-min-max-1":
            return (data - self.globalmin) / (self.globalmax - self.globalmin)
        if s == "global-min-max-2":
            return 2.0 * (data - self.globalmin) / (self.globalmax - self.globalmin) - 1.0
        if s == "mean-std":
            return (data - self.mu) / self.std
        return data

    def unnormalize(self, data):
        s = self.strategy
        if s == "min-max-1":
            return data * (self.max - self.min) + self.min
        if s == "min-max-2":
            return (0.5 * data + 0.5) * (self.max - self.min) + self.min
        if s == "global-min-max-1":
            return data * (self.globalmax - self.globalmin) + self.globalmin
        if s == "global-min-max-2":
            return (0.5 * data + 0.5) * (self.globalmax - self.globalmin) + self.globalmin
        if s == "mean-std":
            return data * self.std + self.mu
        return data

    # serialization for run snapshots / checkpoints
    def to_dict(self) -> dict:
        return {
            "mu": self.mu.tolist(), "std": self.std.tolist(),
            "min": self.min.tolist(), "max": self.max.tolist(),
            "globalmin": self.globalmin, "globalmax": self.globalmax,
            "strategy": self.strategy,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Normalization":
        return cls(
            mu=np.asarray(d["mu"], np.float32), std=np.asarray(d["std"], np.float32),
            min=np.asarray(d["min"], np.float32), max=np.asarray(d["max"], np.float32),
            globalmin=float(d["globalmin"]), globalmax=float(d["globalmax"]),
            strategy=d["strategy"],
        )


def one_hot_categoricals(data: np.ndarray, data_types: Sequence[str]) -> np.ndarray:
    """Move one-hot encodings of categorical columns to the end and drop the
    originals (reference behavior, src/normalization.py:49-62)."""
    data = np.asarray(data)
    cont = [i for i, t in enumerate(data_types) if t == "continuous"]
    cat = [i for i, t in enumerate(data_types) if t == "categorical"]
    if set(cont) | set(cat) != set(range(data.shape[1])):
        raise ValueError("Data type must be either continuous or categorical")
    pieces = [data[:, cont]]
    for i in cat:
        col = data[:, i].astype(np.int64)
        eye = np.eye(int(col.max()) + 1, dtype=data.dtype)
        pieces.append(eye[col])
    return np.concatenate(pieces, axis=1)
