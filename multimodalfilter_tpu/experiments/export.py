"""AOT serving export: compile a filter's eval rollout once, ship it as a
self-contained artifact, and run it without the model-building Python stack.

Production TPU serving wants the rollout program frozen at deploy time —
no flax tracing, no model-zoo imports, no recompiles on the serving host.
``jax.export`` serializes the jitted program (StableHLO + calling
convention) to bytes; this module bundles the two programs a deployed
filter needs (``initialize_beliefs`` and the scan-hoisted ``forward_loop``)
together with the trained parameters and enough metadata to validate
shapes at load time.

The reference has no equivalent (torch serving would go through
torch.jit/torchscript); this is TPU-native deployment surface. Pallas
kernels export like any other op (the Mosaic payload is embedded as a
custom call), so the full serving stack — MMF_TPU_SERVING=1's Pallas +
bf16 + folded-tail configuration — freezes into the artifact exactly as
benchmarked.

Bundle layout (a directory):
    meta.json       format version, shapes/dtypes, platforms, jax version
    init.jaxir      serialized Exported: (params, key, mean, cov) -> belief
    loop.jaxir      serialized Exported: (params, belief, obs, ctrl, key)
                    -> (belief, estimates)
    params.msgpack  flax-serialized parameter pytree

Usage:
    from multimodalfilter_tpu.experiments.export import (
        export_serving_bundle, load_serving_bundle)
    export_serving_bundle(filter_model, "bundle/", observations=obs,
                          controls=ctrl)
    served = load_serving_bundle("bundle/")
    served.initialize_beliefs(mean=m, covariance=c)
    estimates = served.forward_loop(observations=obs, controls=ctrl)

The loaded bundle replicates ``StatefulFilter``'s RNG discipline (same
seed -> same key schedule), so a bundle exported from a model reproduces
that model's rollouts exactly (tests/test_export.py asserts bitwise).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..types import GaussianBelief, ParticleBelief

_FORMAT_VERSION = 1
_REGISTERED = False


def _register_serialization() -> None:
    """Register the belief NamedTuples with jax.export (idempotent).

    jax.export serializes the input/output pytree *structure*; custom node
    types (our belief NamedTuples) must be registered once per process on
    both the export and the load side.
    """
    global _REGISTERED
    if _REGISTERED:
        return
    for cls in (GaussianBelief, ParticleBelief):
        try:
            jax.export.register_namedtuple_serialization(
                cls, serialized_name=f"multimodalfilter_tpu.types.{cls.__name__}"
            )
        except ValueError:
            pass  # already registered (e.g. by a previous bundle load)
    _REGISTERED = True


def _spec(x) -> jax.ShapeDtypeStruct:
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def _spec_tree(tree):
    return jax.tree_util.tree_map(_spec, tree)


def _spec_meta(tree) -> Any:
    """JSON-able description of a pytree of specs (for load-time checks)."""
    return jax.tree_util.tree_map(
        lambda s: [list(s.shape), str(s.dtype)], _spec_tree(tree)
    )


def export_serving_bundle(
    filter_model,
    path: str,
    *,
    observations,
    controls,
    mean=None,
    covariance=None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Export ``filter_model``'s eval rollout as a serving bundle at ``path``.

    Args:
        filter_model: a ``StatefulFilter`` (the def's current serving
            transforms — Pallas/bf16/fold, enabled mask — freeze into the
            artifact; train mode is forced off).
        observations / controls: example (T, N, ...) inputs (arrays or
            ShapeDtypeStructs) fixing the exported shapes. XLA serving
            wants static shapes; export one bundle per (T, N) config.
        mean / covariance: example belief-init moments; default zeros of
            (N, state_dim) / (N, state_dim, state_dim).
        platforms: target platform list for cross-platform artifacts
            (e.g. ("tpu", "cpu")); default = the exporting backend only.
            NOTE: a def with Pallas kernels enabled only lowers for tpu.

    Returns the bundle directory path.
    """
    _register_serialization()
    defn = filter_model.definition
    enabled = filter_model._enabled_tuple
    params = filter_model.params

    n = _spec(controls).shape[1]
    t = _spec(controls).shape[0]
    d = defn.state_dim
    if mean is None:
        mean = jax.ShapeDtypeStruct((n, d), jnp.float32)
    if covariance is None:
        covariance = jax.ShapeDtypeStruct((n, d, d), jnp.float32)
    key_spec = _spec(jax.random.PRNGKey(0))

    def init_fn(params, key, mean, cov):
        return defn.initialize_beliefs(params, key, mean, cov, train=False)

    # A pipeline configured on the facade (use_pipeline) freezes into the
    # artifact too: the exported loop is the shard-mapped pipelined program
    # over the facade's mesh (1/2/3-D data x pipe x particle grid), so a
    # pod serving host replays multi-chip rollouts with no model code. The
    # load side needs the same device count; shapes are static, so T must
    # divide by the stage count at EXPORT time (the facade pads dynamically;
    # an artifact can't).
    pipeline_meta = None
    if getattr(filter_model, "_pipeline", None) is not None:
        mesh, axis_name, _, data_axis, particle_axis = filter_model._pipeline
        stages = mesh.shape[axis_name]
        if t % stages != 0:
            raise ValueError(
                f"pipelined export needs timesteps ({t}) divisible by the "
                f"pipeline stage count ({stages}) — pick an exportable T"
            )
        micro = filter_model._resolved_micro(n)
        pipelined = filter_model._get_pipeline_fn(batch=n)
        pipeline_meta = {
            "axes": [str(a) for a in mesh.axis_names],
            "shape": [int(mesh.shape[a]) for a in mesh.axis_names],
            "num_devices": int(mesh.devices.size),
            "stages": int(stages),
            "microbatches": int(micro),
        }

        def loop_fn(params, belief, obs, ctrl, key):
            return pipelined(params, belief, obs, ctrl, key)

        # Export with explicit (replicated) shardings over the mesh: an
        # unspecified-sharding export records a 1-device calling context,
        # which the load side cannot re-expand to the grid. The internal
        # shard_map reshards per its own in_specs either way.
        replicated = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )
        loop_jit = jax.jit(
            loop_fn, in_shardings=replicated, out_shardings=replicated
        )
    else:

        def loop_fn(params, belief, obs, ctrl, key):
            return defn.forward_loop(
                params, belief, obs, ctrl, key, train=False, enabled=enabled
            )

        loop_jit = jax.jit(loop_fn)

    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    param_specs = _spec_tree(params)
    init_exp = jax.export.export(jax.jit(init_fn), **kwargs)(
        param_specs, key_spec, _spec(mean), _spec(covariance)
    )
    belief_specs = jax.eval_shape(
        init_fn, param_specs, key_spec, _spec(mean), _spec(covariance)
    )
    loop_exp = jax.export.export(loop_jit, **kwargs)(
        param_specs,
        belief_specs,
        _spec_tree(observations),
        _spec_tree(controls),
        key_spec,
    )

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "init.jaxir"), "wb") as f:
        f.write(init_exp.serialize())
    with open(os.path.join(path, "loop.jaxir"), "wb") as f:
        f.write(loop_exp.serialize())
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, params)
        ))
    meta: Dict[str, Any] = {
        "format": _FORMAT_VERSION,
        "definition": type(defn).__name__,
        "state_dim": d,
        "enabled": list(enabled) if enabled is not None else None,
        "platforms": list(init_exp.platforms),
        "jax_version": jax.__version__,
        "pipeline": pipeline_meta,
        "observations_spec": _spec_meta(observations),
        "controls_spec": _spec_meta(controls),
        "mean_spec": _spec_meta(mean),
        "covariance_spec": _spec_meta(covariance),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


class ServingBundle:
    """A loaded serving artifact: the StatefulFilter eval API (belief state,
    initialize_beliefs / forward_loop, seeded key schedule) backed entirely
    by deserialized AOT programs — no model code, no flax, no recompiles
    beyond the first call per program."""

    def __init__(self, path: str, seed: int = 0):
        _register_serialization()
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta["format"] != _FORMAT_VERSION:
            raise ValueError(
                f"serving bundle format {self.meta['format']} != "
                f"supported {_FORMAT_VERSION}"
            )
        pipe = self.meta.get("pipeline")
        if pipe is not None and len(jax.devices()) < pipe["num_devices"]:
            raise ValueError(
                f"bundle was exported over a {pipe['num_devices']}-device "
                f"{dict(zip(pipe['axes'], pipe['shape']))} grid; only "
                f"{len(jax.devices())} devices visible"
            )
        with open(os.path.join(path, "init.jaxir"), "rb") as f:
            self._init = jax.export.deserialize(f.read())
        with open(os.path.join(path, "loop.jaxir"), "rb") as f:
            self._loop = jax.export.deserialize(f.read())
        # jit the call wrappers once: Exported.call re-traces per eager
        # invocation, which would put a tracing round-trip in every serving
        # dispatch.
        self._init_call = jax.jit(self._init.call)
        if pipe is not None:
            # A sharded program must be invoked in a matching multi-device
            # context: rebuild the export-time mesh over the first
            # num_devices visible devices and jit with the artifact's own
            # recorded shardings (inputs passed as plain host arrays are
            # placed accordingly).
            from ..parallel.mesh import create_mesh

            mesh = create_mesh(
                pipe["num_devices"], axis_names=tuple(pipe["axes"]),
                shape=tuple(pipe["shape"]),
            )
            # in_shardings_jax returns one sharding per flattened leaf;
            # jit wants them in the args' pytree structure.
            args_shardings, kwargs_shardings = jax.tree_util.tree_unflatten(
                self._loop.in_tree, list(self._loop.in_shardings_jax(mesh))
            )
            assert not kwargs_shardings
            out_shardings = jax.tree_util.tree_unflatten(
                self._loop.out_tree, list(self._loop.out_shardings_jax(mesh))
            )
            self._loop_call = jax.jit(
                self._loop.call,
                in_shardings=args_shardings,
                out_shardings=out_shardings,
            )
        else:
            self._loop_call = jax.jit(self._loop.call)
        with open(os.path.join(path, "params.msgpack"), "rb") as f:
            self.params = serialization.msgpack_restore(f.read())
        # Same key discipline as StatefulFilter.__init__/_next_key, so a
        # bundle with the source model's seed replays its exact rollouts.
        _unused_init_key, self._rng = jax.random.split(jax.random.PRNGKey(seed))
        self._belief = None

    @property
    def state_dim(self) -> int:
        return int(self.meta["state_dim"])

    @property
    def belief(self):
        return self._belief

    def _next_key(self):
        self._rng, key = jax.random.split(self._rng)
        return key

    def initialize_beliefs(self, *, mean, covariance):
        self._belief = self._init_call(
            self.params, self._next_key(), jnp.asarray(mean),
            jnp.asarray(covariance)
        )

    def forward_loop(self, *, observations, controls):
        assert self._belief is not None, "Call initialize_beliefs first"
        observations = jax.tree_util.tree_map(jnp.asarray, observations)
        self._belief, estimates = self._loop_call(
            self.params, self._belief, observations, jnp.asarray(controls),
            self._next_key(),
        )
        return estimates


def load_serving_bundle(path: str, seed: int = 0) -> ServingBundle:
    return ServingBundle(path, seed=seed)
