"""FIFO replay dataset for (x, y) = ((s, a), s') supervised dynamics data.

Behavioral port of the reference's ``data_collection`` (reference
``utils.py:44-142``): append-only x/y arrays with FIFO eviction at
``max_size``, sequential ``get_next_batch`` with wraparound, uniform
``sample`` with replacement, ``clone`` for preloading.

Host-side numpy by design: the replay lives at the host<->device boundary
(real-env transitions arrive from CPU MuJoCo / host envs); batches are
transferred to device once per jitted training step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class ReplayDataset:
    def __init__(self, max_size: int = int(5e4)):
        self.cur_idx = 0
        self.x: Optional[np.ndarray] = None
        self.y: Optional[np.ndarray] = None
        self.n_data: Optional[int] = None
        self.max_size = int(max_size)

    # -- construction ------------------------------------------------------

    def clone(self, other: "ReplayDataset", first_n: Optional[int] = None):
        assert first_n is None or first_n <= other.n_data, "Not enough data for first_n."
        self.set_data(other.x[:first_n], other.y[:first_n])

    def set_data(self, x: np.ndarray, y: np.ndarray, shuffle: bool = False):
        assert x.shape[0] == y.shape[0]
        self.n_data = x.shape[0]
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.cur_idx %= self.n_data
        self._cap()
        if shuffle:
            self._reshuffle()

    def add_data(self, x_new: np.ndarray, y_new: np.ndarray, shuffle: bool = False):
        assert x_new.shape[0] == y_new.shape[0]
        if self.x is not None:
            self.cur_idx = self.x.shape[0]
            self.x = np.concatenate([self.x, x_new], axis=0)
            self.y = np.concatenate([self.y, y_new], axis=0)
        else:
            self.cur_idx = 0
            self.x = np.asarray(x_new)
            self.y = np.asarray(y_new)
        self.n_data = self.x.shape[0]
        self._cap()
        if shuffle:
            self._reshuffle()

    def _cap(self):
        # FIFO eviction: drop the oldest rows beyond max_size.
        overflow = self.x.shape[0] - self.max_size
        if overflow > 0:
            self.x = self.x[overflow:]
            self.y = self.y[overflow:]
            self.n_data = self.max_size
            self.cur_idx -= overflow

    def _reshuffle(self):
        perm = np.random.permutation(self.n_data)
        self.x = self.x[perm]
        self.y = self.y[perm]

    # -- access ------------------------------------------------------------

    def __len__(self) -> int:
        return 0 if self.n_data is None else self.n_data

    def get_num_data(self) -> int:
        return len(self)

    def get_next_batch(self, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
        """Sequential batch with wraparound (reference utils.py:113-126)."""
        assert batch_size <= self.n_data, (
            f"Batch size {batch_size} is larger than n_data {self.n_data}"
        )
        start = self.cur_idx
        end = self.cur_idx + batch_size
        if end > self.n_data:
            idx = np.concatenate(
                [np.arange(start, self.n_data), np.arange(0, end - self.n_data)]
            )
            self.cur_idx = end - self.n_data
        else:
            idx = np.arange(start, end)
            self.cur_idx = end
        return self.x[idx], self.y[idx]

    def sample(
        self, batch_size: int, rng: Optional[np.random.Generator] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Uniform sample with replacement (reference utils.py:129-131)."""
        if rng is None:
            idx = np.random.randint(0, self.n_data, size=batch_size)
        else:
            idx = rng.integers(0, self.n_data, size=batch_size)
        return self.x[idx], self.y[idx]


def combine_replay_datasets(a: ReplayDataset, b: ReplayDataset) -> ReplayDataset:
    """Merge two datasets, keeping the larger capacity (utils.py:133-142)."""
    out = ReplayDataset(max_size=max(a.max_size, b.max_size))
    if b.max_size < a.max_size:
        x = np.concatenate([a.x, b.x], axis=0)
        y = np.concatenate([a.y, b.y], axis=0)
    else:
        x = np.concatenate([b.x, a.x], axis=0)
        y = np.concatenate([b.y, a.y], axis=0)
    out.set_data(x, y)
    return out
