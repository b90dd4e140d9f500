"""Experiment manager: checkpoints, metadata, named optimizers, logging.

Capability parity with ``fannypack.utils.Buddy`` as used by the reference
(SURVEY §2.4 row "Buddy"): labeled checkpoints per curriculum phase,
submodule-level checkpoint surgery (``load_checkpoint_module`` —
scripts/door_task/train_door.py:270-274, cross-experiment warm starts at
train_door.py:122-124), a clearable dict of named optimizers
(train_door.py:130,150,158), a JSON metadata store, and TensorBoard-style
scalar logging.

Checkpoints are flax-msgpack serialized pytrees (the canonical format):
  {"params": <nested dict>, "steps": int, "optimizers": {name: state_dict}}
Param dict keys mirror torch module paths, so the reference's dotted-path
surgery addresses our pytrees verbatim.

An opt-in orbax backend (``Buddy(..., checkpoint_backend="orbax")`` or
``MMF_TPU_CKPT_BACKEND=orbax``) writes the SAME state pytree through
``orbax.checkpoint.AsyncCheckpointer`` instead: saves return immediately
(serialization overlaps the next training phase — the write is committed by
an atomic directory rename, so readers never observe a partial checkpoint)
and sharded ``jax.Array``s are saved per-shard without a full host gather.
Reads auto-detect the format per label, so msgpack and orbax checkpoints
interoperate within one experiment (incl. ``load_checkpoint_module``
surgery and the latest-checkpoint fallback).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from ..utils.pytree import get_by_path, set_by_path
from .logging import MetricLogger

DEFAULT_CHECKPOINT_DIR = "checkpoints"
DEFAULT_METADATA_DIR = "metadata"
DEFAULT_LOG_DIR = "logs"


class _OptimizerDict(dict):
    """Buddy's named-optimizer dict; `.clear()` (the curricula's
    between-phase optimizer reset) also drops any checkpoint-restored
    warm-start states stashed for not-yet-created optimizers."""

    def __init__(self, owner: "Buddy"):
        super().__init__()
        self._owner = owner

    def clear(self) -> None:
        super().clear()
        self._owner._pending_optimizer_state.clear()


class Buddy:
    def __init__(
        self,
        experiment_name: str,
        model=None,
        *,
        checkpoint_dir: str = DEFAULT_CHECKPOINT_DIR,
        metadata_dir: str = DEFAULT_METADATA_DIR,
        log_dir: str = DEFAULT_LOG_DIR,
        checkpoint_backend: Optional[str] = None,
        verbose: bool = True,
    ):
        self.experiment_name = experiment_name
        self._checkpoint_dir = checkpoint_dir
        self._metadata_dir = metadata_dir
        self._verbose = verbose
        self._model = None
        self._metadata: Dict[str, Any] = {}
        # Checkpointed optimizer states for optimizers that don't exist yet
        # (created lazily by the train loops); consumed by
        # train.optim.get_named_optimizer so a resumed phase starts with
        # warm Adam moments instead of fresh state. Curricula reset
        # optimizers between phases via _optimizer_dict.clear() — that must
        # drop the stash too, or a later same-named optimizer would
        # warm-start from a pre-reset checkpoint.
        self._pending_optimizer_state: Dict[str, Any] = {}
        self._optimizer_dict: Dict[str, Any] = _OptimizerDict(self)
        self._steps = 0
        self._logger = MetricLogger(log_dir, experiment_name)
        backend = checkpoint_backend or os.environ.get(
            "MMF_TPU_CKPT_BACKEND", "msgpack"
        )
        if backend not in ("msgpack", "orbax"):
            raise ValueError(
                f"checkpoint_backend must be 'msgpack' or 'orbax', got {backend!r}"
            )
        self._checkpoint_backend = backend
        self._async_checkpointer = None  # lazily built orbax AsyncCheckpointer

        os.makedirs(self._experiment_checkpoint_dir, exist_ok=True)
        os.makedirs(metadata_dir, exist_ok=True)
        self._load_metadata_file()

        if model is not None:
            self.attach_model(model)

    # -- model ---------------------------------------------------------------
    def attach_model(self, model) -> None:
        self._model = model

    @property
    def model(self):
        assert self._model is not None, "No model attached"
        return self._model

    @property
    def device(self):
        return jax.devices()[0]

    # -- optimizer steps counter ----------------------------------------------
    @property
    def optimizer_steps(self) -> int:
        return self._steps

    def increment_steps(self, n: int = 1) -> None:
        self._steps += n

    # -- metadata --------------------------------------------------------------
    @property
    def metadata(self) -> Dict[str, Any]:
        return self._metadata

    def set_metadata(self, content: Dict[str, Any]) -> None:
        self._metadata = dict(content)
        self._write_metadata_file()

    def add_metadata(self, content: Dict[str, Any]) -> None:
        self._metadata.update(content)
        self._write_metadata_file()

    @property
    def _metadata_path(self) -> str:
        return os.path.join(self._metadata_dir, f"{self.experiment_name}.json")

    def _write_metadata_file(self) -> None:
        with open(self._metadata_path, "w") as f:
            json.dump(self._metadata, f, indent=2, default=str)

    def _load_metadata_file(self) -> None:
        if os.path.exists(self._metadata_path):
            with open(self._metadata_path) as f:
                self._metadata = json.load(f)

    # -- checkpoints -------------------------------------------------------------
    @property
    def _experiment_checkpoint_dir(self) -> str:
        return os.path.join(self._checkpoint_dir, self.experiment_name)

    def _checkpoint_base(
        self, label: Optional[str], experiment_name: Optional[str] = None
    ) -> str:
        """Checkpoint path WITHOUT extension; the msgpack file is
        ``<base>.ckpt``, the orbax directory ``<base>.orbax``."""
        name = experiment_name or self.experiment_name
        label = label if label is not None else f"{self._steps:016d}"
        return os.path.join(self._checkpoint_dir, name, label)

    def _checkpoint_path(
        self, label: Optional[str], experiment_name: Optional[str] = None
    ) -> str:
        return self._checkpoint_base(label, experiment_name) + ".ckpt"

    def _get_async_checkpointer(self):
        if self._async_checkpointer is None:
            import atexit

            import orbax.checkpoint as ocp

            self._async_checkpointer = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler()
            )
            # An interpreter exit mid-save must not strand a tmp directory:
            # wait for the commit rename before teardown.
            atexit.register(self.wait_for_checkpoints)
        return self._async_checkpointer

    def wait_for_checkpoints(self) -> None:
        """Block until all in-flight async (orbax) saves are committed.
        No-op on the msgpack backend or when nothing is in flight."""
        if self._async_checkpointer is not None:
            self._async_checkpointer.wait_until_finished()

    def _gather_state(self) -> Dict[str, Any]:
        return {
            "params": jax.device_get(self.model.params),
            "steps": self._steps,
            "optimizers": {
                name: serialization.to_state_dict(opt["state"])
                for name, opt in self._optimizer_dict.items()
            },
        }

    def save_checkpoint(self, label: Optional[str] = None) -> str:
        if self._checkpoint_backend == "orbax":
            return self._save_checkpoint_orbax(label)
        state = self._gather_state()
        path = self._checkpoint_path(label)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(state))
        if self._verbose:
            print(f"[buddy] saved checkpoint: {path}")
        return path

    def _save_checkpoint_orbax(self, label: Optional[str]) -> str:
        # Async: device arrays are snapshotted synchronously (so training may
        # donate/overwrite them immediately), serialization + fsync overlap
        # whatever runs next, and the final directory rename is atomic.
        # Unlike the msgpack path, params are handed over WITHOUT a host
        # gather — sharded jax.Arrays are written shard-by-shard.
        state = {
            "params": self.model.params,
            "steps": self._steps,
            "optimizers": {
                name: serialization.to_state_dict(opt["state"])
                for name, opt in self._optimizer_dict.items()
            },
        }
        path = os.path.abspath(self._checkpoint_base(label) + ".orbax")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        ckptr = self._get_async_checkpointer()
        ckptr.save(path, state, force=True)
        if self._verbose:
            print(f"[buddy] async checkpoint save started: {path}")
        return path

    def _read_checkpoint(
        self, label: Optional[str], experiment_name: Optional[str] = None
    ) -> Dict[str, Any]:
        # Reads never consult the configured backend: the format is detected
        # per label so msgpack and orbax checkpoints interoperate.
        self.wait_for_checkpoints()
        base = self._checkpoint_base(label, experiment_name)
        path = base + ".ckpt"
        orbax_path = base + ".orbax"
        if not os.path.exists(path) and not os.path.isdir(orbax_path):
            if label is not None:
                raise FileNotFoundError(
                    f"No checkpoint {path} (or {orbax_path})"
                )
            # Fall back to the most recently written checkpoint (the
            # reference Buddy's "latest" semantics), across both formats.
            exp_dir = os.path.join(
                self._checkpoint_dir, experiment_name or self.experiment_name
            )
            candidates = [
                os.path.join(exp_dir, p)
                for p in os.listdir(exp_dir)
                if p.endswith(".ckpt") or p.endswith(".orbax")
            ] if os.path.isdir(exp_dir) else []
            assert candidates, f"No checkpoints found in {exp_dir}"
            newest = max(candidates, key=os.path.getmtime)
            if newest.endswith(".orbax"):
                orbax_path = newest
                path = ""  # force the orbax branch below
            else:
                path = newest
        if os.path.exists(path):
            with open(path, "rb") as f:
                state = serialization.msgpack_restore(f.read())
        else:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                state = ckptr.restore(os.path.abspath(orbax_path))
            path = orbax_path
        if self._verbose:
            print(f"[buddy] read checkpoint: {path}")
        return state

    def load_checkpoint(
        self, label: Optional[str] = None, experiment_name: Optional[str] = None
    ) -> None:
        state = self._read_checkpoint(label, experiment_name)
        self.model.params = jax.tree_util.tree_map(np.asarray, state["params"])
        self._steps = int(state.get("steps", 0))
        # Best-effort optimizer-state restore: only for named optimizers that
        # already exist with a matching pytree structure (training resumes
        # with warm Adam moments; mismatches fall back to fresh state).
        # A full restore defines the complete optimizer state, so any stash
        # left over from an earlier load_checkpoint is stale — purge it
        # before merging (otherwise an optimizer absent from THIS checkpoint
        # could warm-start from a previous one's moments).
        self._pending_optimizer_state.clear()
        for name, saved in state.get("optimizers", {}).items():
            if name not in self._optimizer_dict:
                # Not created yet (optimizers are made lazily at the first
                # train call) — stash so get_named_optimizer warm-starts it
                # when the resumed training phase first asks for it.
                self._pending_optimizer_state[name] = saved
                continue
            opt = self._optimizer_dict[name]
            try:
                opt["state"] = serialization.from_state_dict(opt["state"], saved)
            except (KeyError, ValueError, TypeError):
                if self._verbose:
                    print(f"[buddy] optimizer {name!r} state incompatible; skipped")

    def load_checkpoint_module(
        self,
        source: str,
        target: Optional[str] = None,
        label: Optional[str] = None,
        experiment_name: Optional[str] = None,
    ) -> None:
        """Copy one submodule's parameters from a checkpoint into the attached
        model, addressed by torch-style dotted paths
        (e.g. "filter_models.0.dynamics_model")."""
        state = self._read_checkpoint(label, experiment_name)
        subtree = get_by_path(state["params"], source)
        subtree = jax.tree_util.tree_map(np.asarray, subtree)
        self.model.params = set_by_path(self.model.params, target or source, subtree)
        if self._verbose:
            print(f"[buddy] loaded module {source!r} -> {target or source!r}")

    def load_torch_checkpoint(self, path: str) -> None:
        """Import a trained REFERENCE (PyTorch/fannypack) checkpoint into the
        attached model (see experiments/torch_import.py for the conversion
        rules)."""
        from .torch_import import load_reference_checkpoint

        self.model.params = load_reference_checkpoint(path, self.model.definition)
        if self._verbose:
            print(f"[buddy] imported torch checkpoint: {path}")

    # -- logging -------------------------------------------------------------
    def log_scope(self, scope: str):
        return self._logger.log_scope(scope)

    def log_scalar(self, name: str, value: float) -> None:
        self._logger.log_scalar(name, value, step=self._steps)
