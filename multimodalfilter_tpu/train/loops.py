"""Training loops.

Capability parity with ``torchfilter.train.{train_dynamics_single_step,
train_dynamics_recurrent, train_particle_filter_measurement,
train_virtual_sensor, train_filter}`` (reference usage:
crossmodal/train_helpers.py:30-162), redesigned for TPU:

- The whole dataset is pushed to device once; each step gathers its batch on
  device with an index array (no host dataloader workers).
- One jitted train step per (loss kind, static config); jits are cached on
  the Buddy keyed by the static config, so curriculum phases that repeat a
  configuration reuse the compiled step.
- Gaussian perturbations for measurement pretraining are generated on device
  inside the step (TPU-side preprocessing).
- Frozen modules are static: their grads are zeroed inside the step.

Losses:
  dynamics single-step / recurrent: MSE of predicted vs true next states
  measurement pretraining:          MSE of predicted vs Gaussian log-density
  virtual sensor:                   MSE of predicted z vs true state
  e2e filter:                       MSE of filter estimates vs true states
                                    (beliefs initialized at ground truth with
                                    initial_cov_scale, or measurement init)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.pytree import get_by_path
from .optim import get_named_optimizer, zero_frozen_grads


def _model_parts(model):
    """(root wrapper, path prefix, sub definition) of a wrapper or handle."""
    root = getattr(model, "root", model)
    path = getattr(model, "path", "")
    return root, path, model.definition


def _strip_serving_transforms(defn):
    """Remove serving-only execution transforms from a def before building a
    TRAIN program: the folded encoder tail, stacked multi-instance
    encoders, AND the bf16 compute dtype. Fold/stack are param-identical
    rewrites of the forward math, so training without them is exact — and
    it avoids (a) rebuilding + differentiating the composed fold weight
    every optimizer step (measured -5% e2e at B=32) and (b) the
    grouped-conv stacking regression ever entering a train program. The
    compute dtype resets to fp32 because bf16 encoders would change
    training NUMERICS, not just the schedule — bench_train opts into bf16
    training explicitly on its own loop. Serving/eval paths
    (StatefulFilter.forward_loop, eval_helpers) keep all three transforms;
    checkpoints are unaffected either way. This is what makes
    MMF_TPU_SERVING=1 (= Pallas + bf16 + fold) safe to leave on across a
    whole train+eval CLI run: training under the switch is BITWISE plain
    training."""
    from ..utils.precision import (
        with_compute_dtype,
        with_fold_tail,
        with_stacked_encoders,
    )

    defn = with_stacked_encoders(with_fold_tail(defn, False), False)
    return with_compute_dtype(defn, None)


def _sub_params(params, path: str):
    return get_by_path(params, path) if path else params


def _device_arrays(**arrays):
    return {k: jax.device_put(v) for k, v in arrays.items() if v is not None}


def _gather(tree, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], tree)


def _epoch_index_matrix(rng: np.random.Generator, n: int, batch_size: int):
    """(num_batches, batch_size) shuffled indices; last partial batch dropped
    (static shapes for the epoch scan)."""
    perm = rng.permutation(n)
    num_batches = n // batch_size
    assert num_batches > 0, f"dataset ({n}) smaller than batch size ({batch_size})"
    return perm[: num_batches * batch_size].reshape(num_batches, batch_size)


def _run_epochs(buddy, root, epoch_fn, opt, data, n, *, epochs, batch_size, loss_name):
    """One device execution per epoch: the whole shuffled epoch is a
    lax.scan over batches inside a single jit (remote-TPU dispatch latency is
    per-execution, so per-batch dispatch would dominate on small models)."""
    rng = np.random.default_rng(buddy.optimizer_steps + 1)
    last_loss = None
    for _ in range(epochs):
        idx_matrix = jnp.asarray(_epoch_index_matrix(rng, n, batch_size))
        key = root._next_key()
        root.params, opt["state"], mean_loss = epoch_fn(
            root.params, opt["state"], data, idx_matrix, key
        )
        buddy.increment_steps(int(idx_matrix.shape[0]))
        last_loss = float(mean_loss)
        buddy.log_scalar(f"train/{loss_name}", last_loss)
    return last_loss


def _make_step(buddy, root, loss_fn, optimizer_name, cache_extra):
    """Build (or fetch) the jitted epoch function for a loss function."""
    frozen = frozenset(root.frozen_paths)
    cache_key = ("epoch", optimizer_name, frozen, cache_extra)
    if not hasattr(buddy, "_jit_cache"):
        buddy._jit_cache = {}
    # Ensure the named optimizer exists even on a jit-cache hit (scripts may
    # have cleared _optimizer_dict between phases — train_door.py:130).
    opt = get_named_optimizer(buddy, optimizer_name, root.params)
    if cache_key in buddy._jit_cache:
        return buddy._jit_cache[cache_key]
    tx = opt["tx"]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(params, opt_state, data, idx_matrix, key):
        def body(carry, inputs):
            params, opt_state = carry
            idx, step_key = inputs
            batch = _gather(data, idx)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_key)
            grads = zero_frozen_grads(grads, frozen)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, idx_matrix.shape[0])
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx_matrix, keys)
        )
        return params, opt_state, jnp.mean(losses)

    buddy._jit_cache[cache_key] = epoch
    return epoch


# ---------------------------------------------------------------------------
# Dynamics
# ---------------------------------------------------------------------------


def train_dynamics_single_step(
    buddy, model, dataset, *, epochs, batch_size=32,
    optimizer_name="train_dynamics_single_step",
):
    root, path, defn = _model_parts(model)
    dyn = defn.dynamics_model
    dyn_path = f"{path}.dynamics_model" if path else "dynamics_model"

    def loss_fn(params, batch, key):
        del key
        pred, _ = dyn.apply(
            _sub_params(params, dyn_path), batch["prev"], batch["controls"]
        )
        return jnp.mean((pred - batch["next"]) ** 2)

    data = _device_arrays(
        prev=dataset.previous_states, next=dataset.states, controls=dataset.controls
    )
    step = _make_step(buddy, root, loss_fn, optimizer_name, ("dyn1", dyn_path, batch_size))
    return _run_epochs(
        buddy, root, step, buddy._optimizer_dict[optimizer_name], data,
        len(dataset), epochs=epochs, batch_size=batch_size, loss_name="dynamics_single_step",
    )


def train_dynamics_recurrent(
    buddy, model, dataset, *, epochs, batch_size=32,
    optimizer_name="train_dynamics_recurrent",
):
    root, path, defn = _model_parts(model)
    dyn = defn.dynamics_model
    dyn_path = f"{path}.dynamics_model" if path else "dynamics_model"
    seq_len = dataset.subsequence_length

    def loss_fn(params, batch, key):
        del key
        states = jnp.swapaxes(batch["states"], 0, 1)  # (L, B, D)
        controls = jnp.swapaxes(batch["controls"], 0, 1)
        pred, _ = dyn.forward_loop(
            _sub_params(params, dyn_path), states[0], controls[1:]
        )
        return jnp.mean((pred - states[1:]) ** 2)

    data = _device_arrays(states=dataset.states, controls=dataset.controls)
    step = _make_step(
        buddy, root, loss_fn, optimizer_name, ("dynR", dyn_path, seq_len, batch_size)
    )
    return _run_epochs(
        buddy, root, step, buddy._optimizer_dict[optimizer_name], data,
        len(dataset), epochs=epochs, batch_size=batch_size, loss_name="dynamics_recurrent",
    )


# ---------------------------------------------------------------------------
# Measurement / virtual sensor pretraining
# ---------------------------------------------------------------------------


def train_pf_measurement(
    buddy, model, dataset, *, epochs, batch_size,
    optimizer_name="train_measurement",
):
    """Pretrain the PF measurement model to regress the Gaussian log-density
    of states perturbed around ground truth (covariance from the dataset).
    Perturbations + targets are generated on device each step."""
    root, path, defn = _model_parts(model)
    mm = _strip_serving_transforms(defn.measurement_model)
    mm_path = f"{path}.measurement_model" if path else "measurement_model"
    enabled = root._enabled_tuple
    cov = jnp.asarray(dataset.covariance)
    chol = jnp.linalg.cholesky(cov)
    # Gaussian log-normalizer: -0.5 (D log(2π) + log det Σ)
    d = cov.shape[0]
    log_norm = -0.5 * (d * jnp.log(2 * jnp.pi) + 2.0 * jnp.sum(jnp.log(jnp.diag(chol))))

    def loss_fn(params, batch, key):
        states = batch["states"]  # (B, D)
        eps = jax.random.normal(key, states.shape)
        noise = eps @ chol.T
        noisy = states + noise
        # log N(noisy; states, Σ): solve via the Cholesky factor.
        white = jax.scipy.linalg.solve_triangular(chol, noise.T, lower=True).T
        target = log_norm - 0.5 * jnp.sum(white**2, axis=-1)
        pred = mm.log_likelihoods(
            _sub_params(params, mm_path), noisy[:, None, :], batch["obs"],
            enabled=enabled,
        )[:, 0]
        return jnp.mean((pred - target) ** 2)

    data = {
        "states": jax.device_put(dataset.states),
        "obs": jax.device_put(dataset.observations),
    }
    n_pairs = dataset.states.shape[0]
    step = _make_step(
        buddy, root, loss_fn, optimizer_name, ("pfmeas", mm_path, enabled, batch_size)
    )
    # Epoch length matches the reference's samples_per_pair expansion.
    epochs_effective = epochs * dataset.samples_per_pair
    return _run_epochs(
        buddy, root, step, buddy._optimizer_dict[optimizer_name], data,
        n_pairs, epochs=epochs_effective, batch_size=batch_size, loss_name="pf_measurement",
    )


def train_virtual_sensor(
    buddy, model, dataset, *, epochs, batch_size=32,
    optimizer_name="train_virtual_sensor",
):
    root, path, defn = _model_parts(model)
    vs = _strip_serving_transforms(defn.virtual_sensor_model)
    vs_path = f"{path}.virtual_sensor_model" if path else "virtual_sensor_model"
    enabled = root._enabled_tuple

    def loss_fn(params, batch, key):
        del key
        z, _ = vs.apply(_sub_params(params, vs_path), batch["obs"], enabled=enabled)
        return jnp.mean((z - batch["next"]) ** 2)

    data = {
        "next": jax.device_put(dataset.states),
        "obs": jax.device_put(dataset.observations),
    }
    step = _make_step(
        buddy, root, loss_fn, optimizer_name, ("vs", vs_path, enabled, batch_size)
    )
    return _run_epochs(
        buddy, root, step, buddy._optimizer_dict[optimizer_name], data,
        len(dataset), epochs=epochs, batch_size=batch_size, loss_name="virtual_sensor",
    )


# ---------------------------------------------------------------------------
# End-to-end filter training (BPTT through the scan)
# ---------------------------------------------------------------------------


def train_e2e(
    buddy, model, dataset, *, epochs, batch_size=32, initial_cov_scale=0.1,
    measurement_initialize=False, optimizer_name="train_filter_recurrent",
    mesh=None, pipeline_mesh=None, pipeline_microbatches=None,
):
    """BPTT through `subsequence_length` filter steps (torchfilter.train.
    train_filter equivalent). Beliefs initialize at ground truth state[0]
    with initial_cov_scale * I (crossmodal/train_helpers.py:124-162).

    With `mesh`, the step is sharded data-parallel over the batch axis (see
    parallel/data_parallel.py). With `pipeline_mesh`, BPTT runs through the
    temporal pipeline instead: the subsequence's time axis sharded over the
    mesh's "pipe" axis with a checkpointed, differentiable GPipe schedule
    (parallel/temporal_pipeline.py) — requires (subsequence_length - 1)
    divisible by the stage count and batch_size by pipeline_microbatches.
    pipeline_microbatches=None (default) auto-sizes exactly like eval
    (StatefulFilter._auto_microbatches: largest divisor of the
    per-data-shard batch up to 8 — GPipe efficiency micro/(stages+micro-1)).
    A "data" axis on the same mesh shards the BPTT batch (2-D grid), and a
    "particle" axis (PF definitions only) shards the particle axis M
    (massive-M BPTT); all three compose into the 3-D training grid.
    Mutually exclusive with `mesh`."""
    assert mesh is None or pipeline_mesh is None, (
        "mesh (batch-DP) and pipeline_mesh (time-pipeline) are exclusive"
    )
    root, path, defn = _model_parts(model)
    defn = _strip_serving_transforms(defn)
    enabled = root._enabled_tuple
    seq_len = dataset.subsequence_length
    state_dim = defn.state_dim

    if pipeline_mesh is not None:
        from ..filtering.pf import ParticleFilterDef
        from ..parallel.temporal_pipeline import (
            make_pipelined_filter_loop,
            make_pipelined_pf_loop,
        )

        stages = pipeline_mesh.shape["pipe"]
        assert (seq_len - 1) % stages == 0, (
            f"subsequence steps {seq_len - 1} not divisible by {stages} stages"
        )
        # A ("data", "pipe") mesh trains on the composed 2-D grid: the BPTT
        # batch shards over "data" while each shard pipelines its time axis.
        data_axis = "data" if "data" in pipeline_mesh.axis_names else None
        if data_axis is not None:
            assert batch_size % pipeline_mesh.shape[data_axis] == 0, (
                f"batch_size {batch_size} not divisible by the pipeline "
                f"mesh's data axis ({pipeline_mesh.shape[data_axis]})"
            )
        # A "particle" axis additionally shards the PF particle axis M
        # inside each stage (massive-M BPTT — the per-stage body becomes
        # particle_sharding.sharded_pf_train_step, which slices the GLOBAL
        # noise stream so grads match the plain loop). All three axes
        # compose into the full 3-D data x pipe x particle training grid.
        particle_axis = (
            "particle" if "particle" in pipeline_mesh.axis_names else None
        )
        if pipeline_microbatches is None:
            from ..filtering.wrappers import StatefulFilter

            per_shard = batch_size
            if data_axis is not None:
                per_shard = batch_size // pipeline_mesh.shape[data_axis]
            pipeline_microbatches = StatefulFilter._auto_microbatches(per_shard)
        if isinstance(defn, ParticleFilterDef):
            if particle_axis is not None:
                m_train = defn.num_particles_train
                assert m_train % pipeline_mesh.shape[particle_axis] == 0, (
                    f"num_particles_train {m_train} not divisible by the "
                    f"mesh's particle axis "
                    f"({pipeline_mesh.shape[particle_axis]})"
                )
            pipelined_loop = make_pipelined_pf_loop(
                defn, pipeline_mesh, num_microbatches=pipeline_microbatches,
                train=True, enabled=enabled, data_axis_name=data_axis,
                particle_axis_name=particle_axis,
            )
        else:
            assert particle_axis is None, (
                "a 'particle' mesh axis shards the PF particle dimension — "
                f"{type(defn).__name__} cannot train over it"
            )
            pipelined_loop = make_pipelined_filter_loop(
                defn, pipeline_mesh, num_microbatches=pipeline_microbatches,
                train=True, enabled=enabled, data_axis_name=data_axis,
            )

        def loop_fn(sub, belief, obs_rest, ctrl_rest, key):
            return pipelined_loop(sub, belief, obs_rest, ctrl_rest, key)

    else:

        def loop_fn(sub, belief, obs_rest, ctrl_rest, key):
            return defn.forward_loop(
                sub, belief, obs_rest, ctrl_rest, key, train=True,
                enabled=enabled,
            )

    def loss_fn(params, batch, key):
        sub = _sub_params(params, path)
        states = jnp.swapaxes(batch["states"], 0, 1)  # (L, B, D)
        controls = jnp.swapaxes(batch["controls"], 0, 1)
        obs = jax.tree_util.tree_map(
            lambda a: jnp.swapaxes(a, 0, 1), batch["obs"]
        )
        k_init, k_loop = jax.random.split(key)
        b = states.shape[1]
        if measurement_initialize:
            obs0 = jax.tree_util.tree_map(lambda a: a[0], obs)
            try:
                belief = defn.measurement_initialize_beliefs(
                    sub, obs0, key=k_init, train=True, enabled=enabled
                )
            except TypeError:
                belief = defn.measurement_initialize_beliefs(
                    sub, obs0, key=k_init, train=True
                )
        else:
            cov = jnp.broadcast_to(
                jnp.eye(state_dim) * initial_cov_scale, (b, state_dim, state_dim)
            )
            belief = defn.initialize_beliefs(sub, k_init, states[0], cov, train=True)
        obs_rest = jax.tree_util.tree_map(lambda a: a[1:], obs)
        _, estimates = loop_fn(sub, belief, obs_rest, controls[1:], k_loop)
        return jnp.mean((estimates - states[1:]) ** 2)

    data = {
        "states": jax.device_put(dataset.states),
        "controls": jax.device_put(dataset.controls),
        "obs": jax.device_put(dataset.observations),
    }
    # Mesh IDENTITY (fingerprint, not a bool / object id) must key the
    # cached epoch fn — a second call with a different mesh would otherwise
    # silently reuse the program compiled for the old one.
    from ..filtering.wrappers import _mesh_fingerprint

    cache_extra = (
        "e2e", path, enabled, seq_len, batch_size, measurement_initialize,
        initial_cov_scale,
        None if mesh is None else _mesh_fingerprint(mesh),
        None if pipeline_mesh is None
        else ("pipe", pipeline_microbatches, _mesh_fingerprint(pipeline_mesh)),
    )
    if mesh is not None:
        from ..parallel.data_parallel import make_sharded_epoch_fn

        frozen = frozenset(root.frozen_paths)
        opt = get_named_optimizer(buddy, optimizer_name, root.params)
        cache_key = ("epoch", optimizer_name, frozen, cache_extra)
        if not hasattr(buddy, "_jit_cache"):
            buddy._jit_cache = {}
        if cache_key not in buddy._jit_cache:
            buddy._jit_cache[cache_key] = make_sharded_epoch_fn(
                loss_fn, opt["tx"], frozen, mesh
            )
        step = buddy._jit_cache[cache_key]
        # Params / opt state may be committed to a DIFFERENT mesh from an
        # earlier sharded call (e.g. a 4-device warm-up then the full mesh);
        # jit refuses mixed device sets, so re-place them replicated on this
        # mesh (no-op copy when already there).
        replicated = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()
        )
        root.params = jax.device_put(root.params, replicated)
        opt["state"] = jax.device_put(opt["state"], replicated)
    else:
        if pipeline_mesh is not None:
            # Same mixed-device hazard as the DP branch above: an earlier
            # sharded/pipelined call may have committed params or optimizer
            # state to a different device set (e.g. a 4-device pipeline then
            # an 8-device data x pipe grid); jit refuses to mix them with
            # this mesh's shard_map, so re-place replicated here.
            opt = get_named_optimizer(buddy, optimizer_name, root.params)
            replicated = jax.sharding.NamedSharding(
                pipeline_mesh, jax.sharding.PartitionSpec()
            )
            root.params = jax.device_put(root.params, replicated)
            opt["state"] = jax.device_put(opt["state"], replicated)
        step = _make_step(buddy, root, loss_fn, optimizer_name, cache_extra)

    return _run_epochs(
        buddy, root, step, buddy._optimizer_dict[optimizer_name], data,
        len(dataset), epochs=epochs, batch_size=batch_size, loss_name="e2e",
    )
