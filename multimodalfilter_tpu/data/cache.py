"""Dataset file cache.

Capability parity with ``fannypack.data.{set_cache_path, cached_drive_file}``
(reference usage: crossmodal/tasks/_door.py:125, scripts/door_task/
train_door.py:32). This environment has no network egress, so a missing cache
entry cannot be downloaded; instead we optionally synthesize the dataset
locally (see data/synthetic.py) when MMF_TPU_SYNTHESIZE_DATA=1, or raise with
instructions.
"""

from __future__ import annotations

import os
from typing import Optional

_cache_path: Optional[str] = None


def set_cache_path(path: str) -> None:
    global _cache_path
    _cache_path = path
    os.makedirs(path, exist_ok=True)


def get_cache_path() -> str:
    global _cache_path
    if _cache_path is None:
        set_cache_path(os.path.join(os.getcwd(), ".cache"))
    return _cache_path


def cached_file(name: str, url: str = "") -> str:
    """Return the local path of a cached dataset file.

    If absent and MMF_TPU_SYNTHESIZE_DATA is set, generate a synthetic
    stand-in with the same key schema (useful for tests/benchmarks in
    air-gapped environments). Otherwise raise.
    """
    path = os.path.join(get_cache_path(), name)
    if os.path.exists(path):
        return path

    if os.environ.get("MMF_TPU_SYNTHESIZE_DATA", "0") == "1":
        from . import synthetic

        synthetic.synthesize_named_dataset(name, path)
        return path

    raise FileNotFoundError(
        f"Dataset file {name!r} not found in cache ({path}) and this "
        f"environment has no network access to fetch {url!r}. Place the file "
        "there manually, or set MMF_TPU_SYNTHESIZE_DATA=1 to generate a "
        "synthetic stand-in."
    )


# Alias for reference-API familiarity.
cached_drive_file = cached_file
