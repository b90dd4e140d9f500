"""HDF5 trajectory container.

Capability parity with ``fannypack.data.TrajectoriesFile`` as used by the
reference: iterable reader (crossmodal/tasks/_door.py:124-127) and streaming
writer with ``add_timestep / complete_trajectory / abandon_trajectory``
(scripts/door_task/data_collection/simulate_door.py:54,133-145).

Layout: one HDF5 group per trajectory, named by integer index ("0", "1", ...),
one dataset per key; trajectory count in the root attribute ``count``.
"""

from __future__ import annotations

from typing import Dict, Iterator, List

import h5py
import numpy as np


class TrajectoriesFile:
    def __init__(self, path: str, mode: str = "r", verbose: bool = False):
        self.path = path
        self.mode = mode
        self.verbose = verbose
        self._file: h5py.File = None
        self._pending: Dict[str, List[np.ndarray]] = {}

    # -- context manager ----------------------------------------------------
    def __enter__(self) -> "TrajectoriesFile":
        self._file = h5py.File(self.path, self.mode)
        return self

    def __exit__(self, *args):
        self._file.close()
        self._file = None

    def _require_open(self) -> h5py.File:
        assert self._file is not None, "TrajectoriesFile must be used as a context manager"
        return self._file

    # -- reading ------------------------------------------------------------
    def __len__(self) -> int:
        f = self._require_open()
        if "count" in f.attrs:
            return int(f.attrs["count"])
        return len(f.keys())

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        f = self._require_open()
        group = f[str(index)]
        return {k: np.asarray(group[k]) for k in group.keys()}

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]

    # -- writing ------------------------------------------------------------
    def add_timestep(self, content: Dict[str, np.ndarray]) -> None:
        """Buffer one timestep of the in-progress trajectory."""
        for k, v in content.items():
            self._pending.setdefault(k, []).append(np.asarray(v))

    def complete_trajectory(self) -> None:
        """Flush the buffered timesteps as a new trajectory group."""
        f = self._require_open()
        index = len(self)
        group = f.create_group(str(index))
        for k, steps in self._pending.items():
            group.create_dataset(k, data=np.stack(steps, axis=0))
        f.attrs["count"] = index + 1
        self._pending = {}
        if self.verbose:
            print(f"[TrajectoriesFile] wrote trajectory {index} to {self.path}")

    def abandon_trajectory(self) -> None:
        """Drop the in-progress trajectory buffer."""
        self._pending = {}

    def clear(self) -> None:
        f = self._require_open()
        for k in list(f.keys()):
            del f[k]
        f.attrs["count"] = 0
