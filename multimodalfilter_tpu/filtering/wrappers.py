"""Imperative wrappers over the functional filter defs.

The reference exposes stateful torch modules (``filter_model.forward(...)``
mutates beliefs in-place; ``model.train()/eval()`` toggles particle counts;
``enabled_models`` is a mutable attribute). This module provides that exact
API surface (so the reference's scripts/curricula port over line-for-line)
while all compute stays in jitted pure functions of (params, belief).

- ``StatefulFilter`` holds {params, belief, rng, train-mode, enabled mask,
  frozen paths} and dispatches to cached jitted functions specialized on the
  static config (train mode, enabled tuple).
- ``ModuleHandle`` is a lightweight view of a submodule (e.g.
  ``filter_model.filter_models[0].dynamics_model``): it carries the dotted
  param path and the sub-definition, which is all the train loops and
  freeze/checkpoint-surgery utilities need.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import GaussianBelief
from ..utils.conversions import to_device
from ..utils.pytree import get_by_path

_FUSION_FIELDS = ("filter_models", "measurement_models", "virtual_sensor_model")


def _mesh_fingerprint(mesh) -> tuple:
    """Stable identity for a Mesh: axis layout + device ids. (id(mesh) is
    unsafe as a cache key — a GC'd Mesh's id can be reused by a new object,
    serving a stale compiled loop closed over the dead mesh.)"""
    return (
        tuple(mesh.shape.items()),
        tuple(int(d.id) for d in mesh.devices.flat),
    )


def pad_time_to_stages(observations, controls, stages: int):
    """Zero-pad the leading time axis of an (obs pytree, controls) pair up
    to a multiple of `stages`. THE padding rule for pipelined rollouts:
    `_pipelined_forward_loop` and `eval_helpers._device_throughput` both
    call this, so the timed program cannot silently diverge from the one
    run_eval executes."""

    def pad_fn(x):
        pad = (-x.shape[0]) % stages
        if not pad:
            return x
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )

    return (
        jax.tree_util.tree_map(pad_fn, observations),
        pad_fn(controls),
    )


def _fusion_count(definition) -> Optional[int]:
    """Number of fused per-modality models, searching one level deep
    (e.g. a PF whose measurement model is a crossmodal fusion)."""
    if not dataclasses.is_dataclass(definition):
        return None
    for field in dataclasses.fields(definition):
        value = getattr(definition, field.name)
        if field.name in _FUSION_FIELDS and isinstance(value, tuple):
            return len(value)
        if dataclasses.is_dataclass(value):
            nested = _fusion_count(value)
            if nested is not None:
                return nested
    return None


def _join(path: str, name: str) -> str:
    return f"{path}.{name}" if path else name


class ModuleHandle:
    """View of a submodule of a StatefulFilter: (root, dotted path, sub-def)."""

    def __init__(self, root: "StatefulFilter", path: str, definition):
        self.root = root
        self.path = path
        self.definition = definition

    # Torch-API compatibility shims -----------------------------------------
    def train(self, mode: bool = True):
        self.root.train(mode)

    def eval(self):
        self.root.train(False)

    @property
    def params(self):
        return get_by_path(self.root.params, self.path)

    @property
    def state_dim(self):
        return self.definition.state_dim

    @property
    def enabled_models(self) -> List[bool]:
        return self.root.enabled_models

    @enabled_models.setter
    def enabled_models(self, value: List[bool]):
        self.root.enabled_models = value

    def __getattr__(self, name: str):
        return _child_accessor(self.root, self.path, self.definition, name)

    def __repr__(self):
        return f"ModuleHandle({self.path!r}, {type(self.definition).__name__})"


class _ListHandle:
    """Handle over a tuple field (reference: nn.ModuleList)."""

    def __init__(self, root, path: str, items: Tuple[Any, ...]):
        self.root = root
        self.path = path
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> ModuleHandle:
        return ModuleHandle(self.root, _join(self.path, str(index)), self.items[index])

    def __iter__(self):
        return (self[i] for i in range(len(self)))


def _child_accessor(root, path: str, definition, name: str):
    if dataclasses.is_dataclass(definition):
        for field in dataclasses.fields(definition):
            if field.name == name:
                value = getattr(definition, name)
                child_path = _join(path, name)
                if isinstance(value, tuple) and name in _FUSION_FIELDS:
                    return _ListHandle(root, child_path, value)
                if dataclasses.is_dataclass(value) and hasattr(value, "init"):
                    return ModuleHandle(root, child_path, value)
                return value
    raise AttributeError(
        f"{type(definition).__name__} has no submodule/attribute {name!r}"
    )


class StatefulFilter:
    """Stateful facade over a FilterDef (torchfilter.base.Filter-equivalent)."""

    def __init__(self, definition, seed: int = 0):
        init_key, self._rng = jax.random.split(jax.random.PRNGKey(seed))
        import os

        from .pf import ParticleFilterDef

        # MMF_TPU_SERVING=1: the one production-serving switch — applies the
        # validated serving stack (Pallas PF kernels + bf16 encoder compute
        # + folded encoder tail, the bench.py `value_saturated_best`
        # configuration) in one knob. Each per-knob env still overrides
        # individually (e.g. MMF_TPU_SERVING=1 MMF_TPU_BF16=0 serves fp32
        # with the rest of the stack on).
        serving = os.environ.get("MMF_TPU_SERVING", "0") == "1"

        def knob(name: str, default_on: bool) -> bool:
            return os.environ.get(name, "1" if default_on else "0") == "1"

        # MMF_TPU_PALLAS=1: fused Pallas PF kernels (ops/pallas_pf.py) for
        # every particle filter built through this facade —
        # bitwise-identical eval resampling, 2.1-2.9x eval loop / +14% BPTT
        # train throughput on TPU (scripts/tpu_smoke.py validates on
        # hardware).
        if (
            knob("MMF_TPU_PALLAS", serving)
            and isinstance(definition, ParticleFilterDef)
            and not definition.pallas_resample
        ):
            definition = dataclasses.replace(definition, pallas_resample=True)
        # MMF_TPU_BF16=1: bf16 encoder compute for every network in the def
        # (params stay fp32; see utils/precision.py). Training-quality sweep
        # on TPU hardware (IMPLEMENTATION_NOTES round 2): door KF and PF
        # curricula converge to RMSE within noise of fp32.
        if knob("MMF_TPU_BF16", serving):
            import jax.numpy as jnp

            from ..utils.precision import with_compute_dtype

            definition = with_compute_dtype(definition, jnp.bfloat16)
        # MMF_TPU_FOLD_ENC=1: fold the linear conv3->[pool]->dense image
        # encoder tail into one matmul (exact same linear map,
        # fp-reassociated; ~13% off the encoder pass — models/encoders.py).
        if knob("MMF_TPU_FOLD_ENC", serving):
            from ..utils.precision import with_fold_tail

            definition = with_fold_tail(definition, True)
        # MMF_TPU_SCAN_UNROLL=k: unroll the filter forward_loop scan by k.
        # Bitwise for deterministic filters; PFs may flip tie-level resample
        # draws (see ParticleFilterDef.scan_unroll). Pays off at small N
        # where the per-step program is op-count-bound (N=1 attribution in
        # docs/PERFORMANCE.md). Not part of the serving default: it
        # multiplies compile time by ~k and is neutral at saturated batches.
        unroll = int(os.environ.get("MMF_TPU_SCAN_UNROLL", "1"))
        if unroll > 1:
            from ..utils.precision import with_scan_unroll

            definition = with_scan_unroll(definition, unroll)
        # MMF_TPU_STACK_ENC=1: run the K independent image encoders that
        # consume the same frame (measurement model + gate / virtual sensor
        # + gate) as ONE channel-stacked pass (models/stacked.py). Exact
        # per-encoder math; params unchanged. NOT part of the serving
        # default: measured on TPU v5e it REGRESSES throughput in every
        # regime (XLA expands grouped convs to block-diagonal full convs,
        # 2x FLOPs, and doubles the live activation set — fp32 N>=256 OOMs;
        # see docs/PERFORMANCE.md "Multi-instance encoder stacking").
        if knob("MMF_TPU_STACK_ENC", False):
            from ..utils.precision import with_stacked_encoders

            definition = with_stacked_encoders(definition, True)
        # MMF_TPU_FUSED_STEP=1: run the whole eval forward_loop as ONE
        # Pallas kernel (ops/pallas_fused_step.py) — the N-small serving
        # endgame (the per-step program is op-count bound; see the N=1
        # attribution in docs/PERFORMANCE.md). Exact recursion,
        # fp-reassociated; tie-level resample draws can flip, so it is a
        # serving knob, NOT part of MMF_TPU_SERVING=1 (which preserves the
        # scan path's reference-comparable streams). Unsupported
        # model/config combos fall back to the scan path silently.
        if knob("MMF_TPU_FUSED_STEP", False):
            from ..utils.precision import with_fused_step

            definition = with_fused_step(definition, True)
        self.definition = definition
        # jit the init: eager flax init dispatches hundreds of small ops,
        # which is pathological over a remote-TPU tunnel.
        self.params = jax.jit(definition.init)(init_key)
        self._training = True
        self._belief = None
        self._fn_cache = {}
        # (mesh, axis_name, num_microbatches, data_axis, particle_axis)
        self._pipeline = None
        self.frozen_paths: set = set()
        count = _fusion_count(definition)
        self._enabled_models: Optional[List[bool]] = (
            [True] * count if count else None
        )

    # -- mode / config --------------------------------------------------------
    def use_pipeline(self, mesh, axis_name: str = "pipe",
                     num_microbatches=None):
        """Route forward_loop through temporal pipeline parallelism: the time
        axis sharded over `mesh`'s `axis_name` with the belief carry relayed
        stage->stage (parallel/temporal_pipeline.py). T is zero-padded up to
        a multiple of the stage count and the padded estimates are dropped;
        note the STORED belief then reflects the padded rollout (harmless
        for eval, where beliefs are re-initialized per run). Pass mesh=None
        to disable.

        num_microbatches=None (default) auto-sizes from the batch at call
        time: the largest divisor of N up to 8 — GPipe efficiency is
        micro/(stages + micro - 1), so micro=8 at 8 stages reaches 53%
        where the old fixed default of 2 sat at 22%.

        A mesh with BOTH a "data" axis and `axis_name` routes through the
        composed 2-D data x pipe grid: the trajectory batch shards
        data-parallel across "data" while each data shard pipelines its own
        time axis (parallel/temporal_pipeline.py data_axis_name). N must
        divide by the data-axis size; microbatch auto-sizing then works on
        the per-shard batch.

        A mesh with a "particle" axis (PF definitions only) additionally
        shards the particle axis M inside each stage — massive-M x long-T
        serving (parallel/temporal_pipeline.py particle_axis_name). All
        three axes compose: a ("data", "pipe", "particle") mesh runs the
        full 3-D grid. M must divide by the particle-axis size."""
        if mesh is None:
            self._pipeline = None
        else:
            if axis_name not in mesh.axis_names:
                raise ValueError(
                    f"pipeline mesh has axes {tuple(mesh.axis_names)} but no "
                    f"'{axis_name}' axis — pass a mesh with a pipeline axis "
                    "(e.g. create_mesh(8, ('pipe',)) or a composed "
                    "('data', 'pipe') grid), or set axis_name to match."
                )
            data_axis = (
                "data"
                if "data" in mesh.axis_names and axis_name != "data"
                else None
            )
            particle_axis = (
                "particle"
                if "particle" in mesh.axis_names and axis_name != "particle"
                else None
            )
            if particle_axis is not None:
                from .pf import ParticleFilterDef

                if not isinstance(self.definition, ParticleFilterDef):
                    raise ValueError(
                        "a 'particle' mesh axis shards the PF particle "
                        "dimension — only ParticleFilterDef filters can "
                        f"pipeline over it (got "
                        f"{type(self.definition).__name__})"
                    )
                if getattr(self.definition, "pallas_resample", False):
                    # The sharded step's resampling is inherently collective
                    # (global CDF via shard mass offsets + all_gather), so the
                    # fused single-chip Pallas kernel cannot apply; be loud
                    # rather than silently serving a different stack than
                    # --serving / MMF_TPU_PALLAS advertised.
                    import warnings

                    warnings.warn(
                        "particle-axis sharding uses the collective jnp "
                        "resampler; the fused Pallas PF kernel "
                        "(MMF_TPU_PALLAS / --serving) is bypassed inside "
                        "the particle-sharded step",
                        stacklevel=2,
                    )
            self._pipeline = (
                mesh, axis_name,
                None if num_microbatches is None else int(num_microbatches),
                data_axis, particle_axis,
            )

    @staticmethod
    def _auto_microbatches(n: int, cap: int = 8) -> int:
        """Largest divisor of n that is <= cap (>=1)."""
        for m in range(min(cap, n), 0, -1):
            if n % m == 0:
                return m
        return 1

    def _resolved_micro(self, batch: Optional[int]) -> int:
        mesh, axis_name, micro, data_axis, _particle_axis = self._pipeline
        if micro is not None:
            return micro
        assert batch is not None, (
            "auto-sized pipeline microbatches need the batch size; pass "
            "batch=N to loop_cache_key()/_get_pipeline_fn() or set "
            "num_microbatches explicitly"
        )
        if data_axis is not None:
            data_size = mesh.shape[data_axis]
            assert batch % data_size == 0, (
                f"eval batch N={batch} not divisible by the pipeline mesh's "
                f"data axis ({data_size})"
            )
            batch = batch // data_size  # microbatches slice the PER-SHARD batch
        return self._auto_microbatches(batch)

    def train(self, mode: bool = True):
        self._training = mode

    def eval(self):
        self.train(False)

    @property
    def training(self) -> bool:
        return self._training

    @property
    def state_dim(self) -> int:
        return self.definition.state_dim

    @property
    def enabled_models(self) -> Optional[List[bool]]:
        return self._enabled_models

    @enabled_models.setter
    def enabled_models(self, value: List[bool]):
        assert self._enabled_models is not None, "Not a fusion filter"
        assert len(value) == len(self._enabled_models)
        self._enabled_models = list(value)

    @property
    def _enabled_tuple(self) -> Optional[Tuple[bool, ...]]:
        return tuple(self._enabled_models) if self._enabled_models else None

    @property
    def know_image_blackout(self) -> bool:
        defn = self.definition
        if hasattr(defn, "know_image_blackout"):
            return defn.know_image_blackout
        try:
            gate = defn.measurement_model.crossmodal_weight_model
            return bool(gate and gate.know_image_blackout)
        except AttributeError:
            return False

    @know_image_blackout.setter
    def know_image_blackout(self, value: bool):
        """Reference scripts flip this attribute post-construction
        (train_door.py:37-38); defs are frozen, so rebuild with the flag."""
        defn = self.definition
        if hasattr(defn, "know_image_blackout") and dataclasses.is_dataclass(defn):
            self.definition = dataclasses.replace(defn, know_image_blackout=value)
        else:
            try:
                gate = defn.measurement_model.crossmodal_weight_model
            except AttributeError:
                gate = None
            if gate is not None:
                new_mm = dataclasses.replace(
                    defn.measurement_model,
                    crossmodal_weight_model=dataclasses.replace(
                        gate, know_image_blackout=value
                    ),
                )
                self.definition = dataclasses.replace(defn, measurement_model=new_mm)
        self._fn_cache.clear()

    # -- submodule handles ------------------------------------------------------
    def __getattr__(self, name: str):
        # Only called when normal attribute lookup fails.
        if name.startswith("_"):
            raise AttributeError(name)
        return _child_accessor(self, "", self.__dict__["definition"], name)

    # -- RNG ---------------------------------------------------------------------
    def _next_key(self):
        self._rng, key = jax.random.split(self._rng)
        return key

    # -- cached jitted entry points -----------------------------------------------
    def _cache_key(self, kind: str, extra=()):
        return (kind, self._training, self._enabled_tuple, id(self.definition)) + tuple(
            extra
        )

    def _get_fn(self, kind: str, maker, extra=()):
        key = self._cache_key(kind, extra)
        if key not in self._fn_cache:
            self._fn_cache[key] = maker()
        return self._fn_cache[key]

    def loop_cache_key(self, batch: Optional[int] = None):
        """The _fn_cache key the NEXT forward_loop call will compile under —
        "pipeloop" (+ pipeline extras) when a pipeline is configured, plain
        "loop" otherwise. Eval warm-up checks must probe THIS key (probing
        "loop" while the pipeline is configured silently double-rolls every
        repeat). `batch` is needed only when the pipeline's microbatch
        count is auto-sized (num_microbatches=None)."""
        if self._pipeline is not None:
            mesh, axis_name, _, data_axis, particle_axis = self._pipeline
            return self._cache_key(
                "pipeloop",
                (axis_name, data_axis, particle_axis,
                 self._resolved_micro(batch), _mesh_fingerprint(mesh)),
            )
        return self._cache_key("loop")

    # -- torchfilter.base.Filter API ------------------------------------------------
    @property
    def belief(self):
        return self._belief

    @belief.setter
    def belief(self, value):
        self._belief = value

    def initialize_beliefs(self, *, mean, covariance):
        defn, train, enabled = self.definition, self._training, self._enabled_tuple
        del enabled  # initialization is enabled-independent in all defs

        def maker():
            return jax.jit(
                lambda params, key, mean, cov: defn.initialize_beliefs(
                    params, key, mean, cov, train=train
                )
            )

        fn = self._get_fn("init", maker)
        self._belief = fn(
            self.params, self._next_key(), to_device(mean), to_device(covariance)
        )

    def measurement_initialize_beliefs(self, observations):
        defn, train, enabled = self.definition, self._training, self._enabled_tuple
        assert hasattr(defn, "measurement_initialize_beliefs"), (
            f"{type(defn).__name__} does not support measurement initialization"
        )

        def maker():
            def fn(params, observations, key):
                try:
                    return defn.measurement_initialize_beliefs(
                        params, observations, key=key, train=train, enabled=enabled
                    )
                except TypeError:
                    return defn.measurement_initialize_beliefs(
                        params, observations, key=key, train=train
                    )

            return jax.jit(fn)

        fn = self._get_fn("measurement_init", maker)
        self._belief = fn(self.params, to_device(observations), self._next_key())

    def forward(self, *, observations, controls):
        assert self._belief is not None, "Call initialize_beliefs first"
        defn, train, enabled = self.definition, self._training, self._enabled_tuple

        def maker():
            return jax.jit(
                lambda params, belief, obs, ctrl, key: defn.step(
                    params, belief, obs, ctrl, key, train=train, enabled=enabled
                )
            )

        fn = self._get_fn("step", maker)
        self._belief, estimate = fn(
            self.params,
            self._belief,
            to_device(observations),
            to_device(controls),
            self._next_key(),
        )
        return estimate

    def forward_loop(self, *, observations, controls):
        assert self._belief is not None, "Call initialize_beliefs first"
        defn, train, enabled = self.definition, self._training, self._enabled_tuple

        if self._pipeline is not None:
            return self._pipelined_forward_loop(observations, controls)

        def maker():
            return jax.jit(
                lambda params, belief, obs, ctrl, key: defn.forward_loop(
                    params, belief, obs, ctrl, key, train=train, enabled=enabled
                )
            )

        fn = self._get_fn("loop", maker)
        self._belief, estimates = fn(
            self.params,
            self._belief,
            to_device(observations),
            to_device(controls),
            self._next_key(),
        )
        return estimates

    def _get_pipeline_fn(self, batch: Optional[int] = None):
        """The compiled pipelined-loop callable for the current config:
        fn(params, belief, obs_seq, ctrl_seq, key) with T divisible by the
        stage count (callers pad — see _pipelined_forward_loop). `batch`
        resolves the auto-sized microbatch count."""
        from ..parallel.temporal_pipeline import (
            make_pipelined_filter_loop,
            make_pipelined_pf_loop,
        )
        from .pf import ParticleFilterDef

        defn, train, enabled = self.definition, self._training, self._enabled_tuple
        mesh, axis_name, _, data_axis, particle_axis = self._pipeline
        micro = self._resolved_micro(batch)

        def maker():
            if isinstance(defn, ParticleFilterDef):
                return make_pipelined_pf_loop(
                    defn, mesh, axis_name=axis_name, num_microbatches=micro,
                    train=train, enabled=enabled, data_axis_name=data_axis,
                    particle_axis_name=particle_axis,
                )
            return make_pipelined_filter_loop(
                defn, mesh, axis_name=axis_name, num_microbatches=micro,
                train=train, enabled=enabled, data_axis_name=data_axis,
            )

        return self._get_fn(
            "pipeloop", maker,
            extra=(axis_name, data_axis, particle_axis, micro,
                   _mesh_fingerprint(mesh)),
        )

    def _pipelined_forward_loop(self, observations, controls):
        """forward_loop over the configured temporal pipeline (use_pipeline),
        with T zero-padded to the stage count and padded estimates dropped."""
        mesh, axis_name, _, _data_axis, _particle_axis = self._pipeline
        stages = mesh.shape[axis_name]
        # Params may be COMMITTED to a different device set by an earlier
        # sharded train/eval call (e.g. 8-device DP training then 4-device
        # pipelined eval); jit refuses to mix them with this mesh's
        # shard_map. Re-place replicated only on an actual mismatch — a
        # device_put is never free through the TPU tunnel (CLAUDE.md #3).
        leaves = jax.tree_util.tree_leaves(self.params)
        if leaves and getattr(leaves[0], "committed", False):
            if set(leaves[0].sharding.device_set) != set(mesh.devices.flat):
                replicated = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()
                )
                self.params = jax.device_put(self.params, replicated)
                if self._belief is not None:
                    self._belief = jax.device_put(self._belief, replicated)
        controls = to_device(controls)
        fn = self._get_pipeline_fn(batch=controls.shape[1])
        observations = to_device(observations)
        t = controls.shape[0]
        observations, controls = pad_time_to_stages(
            observations, controls, stages
        )
        self._belief, estimates = fn(
            self.params, self._belief, observations, controls, self._next_key()
        )
        return estimates[:t]

    # -- convenience -----------------------------------------------------------------
    @property
    def state_covariance_estimate(self):
        """Fused covariance (reference: CrossmodalKalmanFilter.
        state_covariance_estimate, crossmodal_kf.py:188-190)."""
        if isinstance(self._belief, GaussianBelief):
            return self._belief.cov
        return None

    @property
    def weighted_covariances(self):
        return self.state_covariance_estimate

    def num_parameters(self) -> int:
        return sum(
            int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(self.params)
        )


def freeze_module(module) -> None:
    """Mark a wrapper/handle's parameters as frozen for subsequent training
    (capability parity with fannypack.utils.freeze_module — reference usage:
    scripts/door_task/train_door.py:88,111,156-157)."""
    root = module.root if isinstance(module, (ModuleHandle, _ListHandle)) else module
    path = module.path if isinstance(module, (ModuleHandle, _ListHandle)) else ""
    root.frozen_paths.add(path)


def unfreeze_module(module) -> None:
    root = module.root if isinstance(module, (ModuleHandle, _ListHandle)) else module
    path = module.path if isinstance(module, (ModuleHandle, _ListHandle)) else ""
    root.frozen_paths.discard(path)
