"""Transition replay buffer.

Reference: the cpprb ``ReplayBuffer`` used by LearnerBase
(scripts/src/learners/learner_base.py:33-64) with env_dict obs/act/next_obs,
plus the C++ ``DataBase`` CSV transition store (include/data_base.hpp,
src/data_base.cpp:52-71).

Implementation: a preallocated numpy ring buffer (host memory — transitions
arrive from the plant on the host; batches are shipped to device per train
step). When the native C++ datastore extension is built
(native/, learning/datastore.py) it transparently provides the storage
backend — same surface either way. CSV export/import matches the C++
DataBase layout for offline-training interchange.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


class ReplayBuffer:
    """Fixed-capacity ring buffer of (obs, act, next_obs) transitions."""

    def __init__(self, capacity: int, s_dim: int, a_dim: int,
                 use_native: bool = True):
        self.capacity = int(capacity)
        self.s_dim = int(s_dim)
        self.a_dim = int(a_dim)
        # monotonic adds counter: len() saturates at capacity, so consumers
        # caching derived views (e.g. the on-device DMD window) key on this
        self.total_added = 0
        self._native = None
        if use_native:
            try:
                from .datastore import NativeDataStore

                self._native = NativeDataStore(capacity, s_dim, a_dim)
            except Exception:
                self._native = None
        if self._native is None:
            self._obs = np.zeros((capacity, s_dim))
            self._act = np.zeros((capacity, a_dim))
            self._next = np.zeros((capacity, s_dim))
            self._idx = 0
            self._size = 0

    def __len__(self) -> int:
        if self._native is not None:
            return len(self._native)
        return self._size

    @property
    def backend(self) -> str:
        return "native" if self._native is not None else "numpy"

    def add(self, obs, act, next_obs) -> None:
        """Append one transition. Reference: learner_base.py:57-58 (add_rb)."""
        obs = np.asarray(obs, np.float64).reshape(-1)
        act = np.asarray(act, np.float64).reshape(-1)
        next_obs = np.asarray(next_obs, np.float64).reshape(-1)
        self.total_added += 1
        if self._native is not None:
            self._native.add(obs, act, next_obs)
            return
        i = self._idx
        self._obs[i] = obs
        self._act[i] = act
        self._next[i] = next_obs
        self._idx = (i + 1) % self.capacity
        self._size = min(self._size + 1, self.capacity)

    def get_all_transitions(self) -> Dict[str, np.ndarray]:
        """All stored transitions, oldest first. Reference: learner_base.py:60-61."""
        if self._native is not None:
            return self._native.get_all()
        n = self._size
        if n < self.capacity:
            sl = slice(0, n)
            return {"obs": self._obs[sl].copy(), "act": self._act[sl].copy(),
                    "next_obs": self._next[sl].copy()}
        order = np.roll(np.arange(self.capacity), -self._idx)
        return {"obs": self._obs[order].copy(), "act": self._act[order].copy(),
                "next_obs": self._next[order].copy()}

    def sample(self, batch: int, rng: Optional[np.random.Generator] = None):
        """Uniform random minibatch — O(batch) fancy indexing into the
        ring (copying the whole buffer per minibatch was O(capacity),
        review finding); fails loudly on an empty buffer."""
        rng = rng or np.random.default_rng()
        n = len(self)
        if n == 0:
            raise ValueError(
                "replay buffer is empty — add transitions before sampling")
        idx = rng.integers(0, n, size=batch)
        if self._native is not None:  # CSV-backed store has no ring view
            data = self.get_all_transitions()
            return {k: v[idx] for k, v in data.items()}
        if self._size >= self.capacity:  # ring full: physical = logical+idx
            idx = (idx + self._idx) % self.capacity
        return {"obs": self._obs[idx].copy(), "act": self._act[idx].copy(),
                "next_obs": self._next[idx].copy()}

    # --- persistence (learner_base.py:54-64, data_base.cpp:52-71) --------
    def save_transitions(self, path: str) -> None:
        """npz for fast reload; .csv extension selects the C++ DataBase-style
        CSV layout (x..., u..., x_next... per row)."""
        data = self.get_all_transitions()
        if path.endswith(".csv"):
            rows = np.concatenate(
                [data["obs"], data["act"], data["next_obs"]], axis=1)
            header = (
                [f"x{i}" for i in range(self.s_dim)]
                + [f"u{i}" for i in range(self.a_dim)]
                + [f"x_next{i}" for i in range(self.s_dim)]
            )
            np.savetxt(path, rows, delimiter=",",
                       header=",".join(header), comments="")
        else:
            np.savez(path, **data)

    def load_transitions(self, path: str) -> None:
        if path.endswith(".csv"):
            rows = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)
            obs = rows[:, : self.s_dim]
            act = rows[:, self.s_dim: self.s_dim + self.a_dim]
            nxt = rows[:, self.s_dim + self.a_dim:]
        else:
            if not os.path.exists(path) and os.path.exists(path + ".npz"):
                path = path + ".npz"
            data = np.load(path)
            obs, act, nxt = data["obs"], data["act"], data["next_obs"]
        for o, a, n in zip(obs, act, nxt):
            self.add(o, a, n)
