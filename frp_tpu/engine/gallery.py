"""Device-resident embedding gallery.

The reference keeps embeddings in a Python dict (``state.py:78`` ENCODINGS)
and rebuilds a numpy matrix on *every* compare call (``face_service.py:
409-411``). Here the gallery lives on device as a padded [capacity, D] matrix
plus a validity mask; matching is one matmul against it. Capacity grows by
doubling so recompiles of downstream jit graphs happen O(log N) times.

Also fixes a reference defect: ENCODINGS is never hydrated from storage at
boot (SURVEY.md section 5 checkpoint note) — ``DeviceGallery.load_entries``
is called by the platform layer at startup with the decrypted store contents.
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np


class DeviceGallery:
    """Thread-safe padded gallery: names on host, matrix on device."""

    MIN_CAPACITY = 128

    def __init__(self, embed_dim: int = 128, capacity: int | None = None):
        self.embed_dim = embed_dim
        self._lock = threading.RLock()
        self._names: list[str] = []
        self._index: dict[str, int] = {}
        self._capacity = capacity or self.MIN_CAPACITY
        self._host = np.zeros((self._capacity, embed_dim), np.float32)
        self._valid = np.zeros((self._capacity,), bool)
        self._device = None  # lazily materialized (matrix, valid) jnp pair
        self._device_names: list[str] = []  # names snapshot tied to _device
        self._version = 0

    def __len__(self) -> int:
        return len(self._names)

    @property
    def names(self) -> list[str]:
        with self._lock:
            return list(self._names)

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def version(self) -> int:
        return self._version

    def _grow(self, need: int):
        cap = self._capacity
        while cap < need:
            cap *= 2
        if cap != self._capacity:
            host = np.zeros((cap, self.embed_dim), np.float32)
            valid = np.zeros((cap,), bool)
            host[: self._capacity] = self._host
            valid[: self._capacity] = self._valid
            self._capacity, self._host, self._valid = cap, host, valid

    def add(self, name: str, embedding: np.ndarray) -> None:
        emb = np.asarray(embedding, np.float32).reshape(-1)
        if emb.shape[0] != self.embed_dim:
            raise ValueError(
                f"embedding dim {emb.shape[0]} != gallery dim {self.embed_dim}"
            )
        with self._lock:
            if name in self._index:
                slot = self._index[name]
            else:
                slot = len(self._names)
                self._grow(slot + 1)
                self._names.append(name)
                self._index[name] = slot
            self._host[slot] = emb
            self._valid[slot] = True
            self._device = None
            self._version += 1

    def remove(self, name: str) -> bool:
        with self._lock:
            if name not in self._index:
                return False
            slot = self._index.pop(name)
            last = len(self._names) - 1
            if slot != last:  # swap-remove keeps the valid block contiguous
                last_name = self._names[last]
                self._names[slot] = last_name
                self._index[last_name] = slot
                self._host[slot] = self._host[last]
            self._names.pop()
            self._host[last] = 0
            self._valid[last] = False
            self._device = None
            self._version += 1
            return True

    def get(self, name: str) -> np.ndarray | None:
        with self._lock:
            slot = self._index.get(name)
            return None if slot is None else self._host[slot].copy()

    def clear(self) -> None:
        with self._lock:
            self._names.clear()
            self._index.clear()
            self._host[:] = 0
            self._valid[:] = False
            self._device = None
            self._version += 1

    def load_entries(self, entries: dict) -> int:
        """Bulk hydrate {name: embedding} (startup path)."""
        count = 0
        for name, emb in entries.items():
            try:
                self.add(name, emb)
                count += 1
            except (ValueError, TypeError):
                continue
        return count

    def load_matrix(self, names: list[str], matrix: np.ndarray) -> int:
        """Vectorized bulk hydrate from a [N, D] matrix — the per-entry path
        costs a Python iteration per identity, which matters at the 10^5-10^6
        gallery sizes the device design supports. New names only; rows whose
        name already exists are skipped (use add() to overwrite)."""
        m = np.asarray(matrix, np.float32)
        if m.ndim != 2 or m.shape[1] != self.embed_dim:
            raise ValueError(f"matrix shape {m.shape} != [N, {self.embed_dim}]")
        if len(names) != m.shape[0]:
            raise ValueError("names/matrix length mismatch")
        with self._lock:
            seen: set = set()
            fresh = []
            for i, n in enumerate(names):
                # skip names already enrolled AND duplicates within the batch
                # (two live rows under one name would orphan one on remove)
                if n in self._index or n in seen:
                    continue
                seen.add(n)
                fresh.append((n, i))
            if not fresh:
                return 0
            base = len(self._names)
            self._grow(base + len(fresh))
            rows = np.fromiter((i for _, i in fresh), np.int64, len(fresh))
            self._host[base : base + len(fresh)] = m[rows]
            self._valid[base : base + len(fresh)] = True
            for k, (n, _) in enumerate(fresh):
                self._names.append(n)
                self._index[n] = base + k
            self._device = None
            self._version += 1
            return len(fresh)

    def device_arrays(self):
        """(matrix [capacity, D], valid [capacity]) as device arrays."""
        with self._lock:
            if self._device is None:
                self._device = (
                    jnp.asarray(self._host),
                    jnp.asarray(self._valid),
                )
                self._device_names = list(self._names)
            return self._device

    def device_view(self):
        """(matrix, valid, names) — the names list is POSITIONALLY tied to
        these exact device arrays. Match indices computed on the device must
        resolve against this snapshot, not live state: swap-remove reassigns
        a slot index, so resolving an in-flight best_idx via name_of() could
        attribute a detection to whoever was swapped into the slot."""
        with self._lock:
            mat, valid = self.device_arrays()
            return mat, valid, self._device_names

    def host_arrays(self):
        with self._lock:
            n = len(self._names)
            return self._host[:n].copy(), list(self._names)

    def name_of(self, idx: int) -> str | None:
        with self._lock:
            return self._names[idx] if 0 <= idx < len(self._names) else None
