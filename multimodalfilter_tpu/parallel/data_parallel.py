"""Data-parallel training over a device mesh.

Two equivalent mechanisms are provided:

- ``make_sharded_train_step``: GSPMD-style — a jitted step whose batch is
  constrained to shard over the "data" mesh axis; XLA partitions the forward/
  backward pass and inserts the gradient all-reduce over ICI automatically.
- ``make_shardmap_train_step``: explicit ``shard_map`` with a hand-placed
  ``psum`` for loss/grad reduction (per-device closures; useful when you want
  manual control or to compose with Pallas collectives).

Both keep parameters replicated (the models are tiny relative to HBM —
SURVEY §2.5: DP over batch N is the strategy that maps onto this workload).
"""

from __future__ import annotations

from typing import FrozenSet

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec

from ..train.optim import zero_frozen_grads


def shard_batch(batch, mesh, axis_name: str = "data"):
    """Constrain every leaf of a batch pytree to shard along its leading
    (batch) dimension."""

    def constrain(a):
        spec = PartitionSpec(axis_name, *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(constrain, batch)


def make_sharded_train_step(loss_fn, tx, frozen_paths: FrozenSet[str], mesh):
    """Jitted SGD step with the batch sharded over the mesh's data axis."""

    @jax.jit
    def step(params, opt_state, data, idx, key):
        batch = jax.tree_util.tree_map(lambda a: a[idx], data)
        batch = shard_batch(batch, mesh)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        grads = zero_frozen_grads(grads, frozen_paths)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_epoch_fn(loss_fn, tx, frozen_paths: FrozenSet[str], mesh):
    """Epoch-level variant of make_sharded_train_step: one jitted execution
    scans all batches of a shuffled epoch, each batch sharded over the
    mesh's data axis (matches train/loops.py's epoch-scan contract)."""

    @jax.jit
    def epoch(params, opt_state, data, idx_matrix, key):
        def body(carry, inputs):
            params, opt_state = carry
            idx, step_key = inputs
            batch = jax.tree_util.tree_map(lambda a: a[idx], data)
            batch = shard_batch(batch, mesh)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_key)
            grads = zero_frozen_grads(grads, frozen_paths)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, idx_matrix.shape[0])
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx_matrix, keys)
        )
        return params, opt_state, jnp.mean(losses)

    return epoch


def make_shardmap_train_step(
    loss_fn, tx, frozen_paths: FrozenSet[str], mesh, axis_name: str = "data"
):
    """Explicit-collective variant: per-device grads averaged with pmean.

    One jitted dispatch per batch — fine for validation/dryruns, but real
    train loops should use ``make_shardmap_epoch_fn`` below (epoch-level jit
    with donated carries; see CLAUDE.md trap #3 on per-batch dispatch cost).
    """
    from jax import shard_map

    def per_device(params, batch, key):
        # Per-device loss averaged globally with an explicit ICI collective.
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.lax.pmean(grads, axis_name)
        return loss, grads

    batch_spec = PartitionSpec(axis_name)
    replicated = PartitionSpec()

    @jax.jit
    def step(params, opt_state, data, idx, key):
        batch = jax.tree_util.tree_map(lambda a: a[idx], data)
        loss, grads = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(replicated, batch_spec, replicated),
            out_specs=(replicated, replicated),
            check_vma=False,
        )(params, batch, key)
        grads = zero_frozen_grads(grads, frozen_paths)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_shardmap_epoch_fn(
    loss_fn, tx, frozen_paths: FrozenSet[str], mesh, axis_name: str = "data"
):
    """Epoch-level twin of ``make_shardmap_train_step``: one jitted execution
    scans every batch of a shuffled epoch, with the per-batch forward/backward
    run inside an explicit ``shard_map`` and the grad reduction a hand-placed
    ``pmean`` over the mesh's data axis. Same contract as
    ``make_sharded_epoch_fn`` (GSPMD variant) so the two are interchangeable
    in train/loops.py."""
    from jax import shard_map

    batch_spec = PartitionSpec(axis_name)
    replicated = PartitionSpec()

    def per_device(params, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        loss = jax.lax.pmean(loss, axis_name)
        grads = jax.lax.pmean(grads, axis_name)
        return loss, grads

    sharded_grad_fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(replicated, batch_spec, replicated),
        out_specs=(replicated, replicated),
        check_vma=False,
    )

    @jax.jit
    def epoch(params, opt_state, data, idx_matrix, key):
        def body(carry, inputs):
            params, opt_state = carry
            idx, step_key = inputs
            batch = jax.tree_util.tree_map(lambda a: a[idx], data)
            loss, grads = sharded_grad_fn(params, batch, step_key)
            grads = zero_frozen_grads(grads, frozen_paths)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, idx_matrix.shape[0])
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx_matrix, keys)
        )
        return params, opt_state, jnp.mean(losses)

    return epoch
