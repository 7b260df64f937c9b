"""Solution storage: in-memory time series of solution vectors.

Reference: src/tools/solutionStorage.hpp:19-110 — stores every accepted
step (forward / adjoint / data-generating) with time-tolerance lookup,
feeding the adjoint reverse sweep and discrete objectives. Here it also
backs checkpoint/restart text dumps (analysisManager.cpp:892
writeSolutionToText, :831 restartSolve).
"""

from __future__ import annotations

import numpy as np

__all__ = ["SolutionStorage"]


class SolutionStorage:
    def __init__(self, max_storage: int = 100, time_tol: float = 1e-10):
        self.max_storage = max_storage
        self.time_tol = time_tol
        self.times: list[float] = []
        self.data: list[np.ndarray] = []

    def store(self, vec, time: float):
        self.times.append(float(time))
        self.data.append(np.asarray(vec))
        if len(self.data) > self.max_storage:
            self.times.pop(0)
            self.data.pop(0)

    def extract(self, time: float):
        """Return the stored vector at `time` (within tolerance) or None."""
        for t, v in zip(self.times, self.data):
            if abs(t - time) < self.time_tol:
                return v
        return None

    def extract_index(self, index: int):
        return self.data[index]

    def __len__(self):
        return len(self.data)

    # ---- disk checkpointing ----

    def write_text(self, prefix: str):
        np.savetxt(f"{prefix}_times.dat", np.asarray(self.times))
        np.savetxt(f"{prefix}_data.dat",
                   np.stack(self.data) if self.data else np.zeros((0, 0)))

    @classmethod
    def read_text(cls, prefix: str, **kw):
        self = cls(**kw)
        times = np.atleast_1d(np.loadtxt(f"{prefix}_times.dat"))
        data = np.atleast_2d(np.loadtxt(f"{prefix}_data.dat"))
        for t, v in zip(times, data):
            self.store(v, t)
        return self
