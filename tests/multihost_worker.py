"""Worker process for the two-process jax.distributed integration test
(tests/test_multihost.py::test_two_process_distributed_dp_step). NOT a test
module — spawned as a subprocess so the distributed runtime can't poison the
pytest host backend.

Each of the 2 processes exposes 4 virtual CPU devices (8 global), builds the
global mesh with create_hybrid_mesh((4,), (2,), ("data",)), feeds ITS half of
a deterministic global batch through global_batch_from_process_local, runs
ONE data-parallel train step (make_sharded_train_step — the same GSPMD step
train_e2e uses), then round-trips the updated params through the Buddy orbax
backend (multiprocess sharded save/restore). Results are written as JSON for
the host test to compare against a single-process 8-device run.

The reference has no distributed layer at all (SURVEY §2.5); this validates
the multi-host on-ramp beyond its degenerate single-process forms (VERDICT
r3 item #2).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_global_data():
    """Deterministic global batch shared by workers and the reference run."""
    import numpy as np

    rng = np.random.default_rng(0)
    return {
        "states": rng.normal(size=(16, 3)).astype(np.float32),
        "controls": rng.normal(size=(16, 7)).astype(np.float32),
        "targets": rng.normal(size=(16, 3)).astype(np.float32),
    }


def run_dp_step(mesh, local_batch):
    """One data-parallel train step of the real door DynamicsNet on `mesh`.

    Returns (loss: float, new_params pytree, param_l1: float). Identical
    given identical global data regardless of process topology (up to fp
    reduction-order noise — the host test compares with allclose).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from multimodalfilter_tpu.models.task_nets import DynamicsNet
    from multimodalfilter_tpu.parallel.data_parallel import (
        make_sharded_train_step,
    )
    from multimodalfilter_tpu.parallel.mesh import (
        global_batch_from_process_local,
    )

    net = DynamicsNet(
        state_dim=3,
        q_scale_tril_diag=(0.05 ** 0.5, 0.01 ** 0.5, 0.01 ** 0.5),
    )
    params = net.init(
        jax.random.PRNGKey(42),
        jnp.zeros((1, 3)), jnp.zeros((1, 7)),
    )

    def loss_fn(params, batch, key):
        del key
        pred, _ = net.apply(params, batch["states"], batch["controls"])
        return jnp.mean((pred - batch["targets"]) ** 2)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    data = global_batch_from_process_local(mesh, local_batch)
    step = make_sharded_train_step(loss_fn, tx, frozenset(), mesh)
    new_params, _, loss = step(
        params, opt_state, data, jnp.arange(16), jax.random.PRNGKey(7)
    )
    leaves = jax.tree_util.tree_leaves(jax.device_get(new_params))
    param_l1 = float(sum(abs(x).sum() for x in leaves))
    return float(loss), new_params, param_l1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    # sitecustomize pins JAX_PLATFORMS=axon in every process; only the
    # config API can switch to CPU (CLAUDE.md environment trap #1).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, REPO)
    from multimodalfilter_tpu.parallel.mesh import (
        create_hybrid_mesh,
        initialize_distributed,
    )

    nproc = initialize_distributed(
        args.coordinator, args.num_processes, args.process_id
    )
    assert nproc == args.num_processes, nproc
    assert jax.process_count() == args.num_processes
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 4 * args.num_processes

    # ICI axis = the 4 local devices, DCN axis = the 2 processes: the
    # hybrid-mesh form a pod-of-slices deployment would use.
    mesh = create_hybrid_mesh((4,), (args.num_processes,), ("data",))

    data = make_global_data()
    rows_per_proc = 16 // args.num_processes
    lo = args.process_id * rows_per_proc
    local = {k: v[lo:lo + rows_per_proc] for k, v in data.items()}
    loss, new_params, param_l1 = run_dp_step(mesh, local)

    # Orbax sharded save/restore through the Buddy backend, multiprocess:
    # every process participates in the collective save; restore must
    # reproduce the params bit-for-bit.
    import numpy as np

    from multimodalfilter_tpu.experiments import Buddy

    class _Shim:
        params = new_params

    buddy = Buddy(
        "multihost_dp",
        _Shim(),
        checkpoint_dir=os.path.join(args.workdir, "checkpoints"),
        metadata_dir=os.path.join(args.workdir, "metadata"),
        log_dir=os.path.join(args.workdir, "logs"),
        checkpoint_backend="orbax",
        verbose=False,
    )
    buddy.save_checkpoint("dp_step")
    buddy.wait_for_checkpoints()
    # Cross-process commit barrier: wait_until_finished only joins THIS
    # process's async save; the final directory rename happens on process 0.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mmf_multihost_ckpt_committed")

    saved = jax.device_get(new_params)
    buddy.model.params = jax.tree_util.tree_map(np.zeros_like, saved)
    buddy.load_checkpoint("dp_step")
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
        buddy.model.params, saved,
    )
    restore_max_diff = max(jax.tree_util.tree_leaves(diffs))

    with open(args.out, "w") as f:
        json.dump({
            "process_id": args.process_id,
            "loss": loss,
            "param_l1": param_l1,
            "restore_max_diff": restore_max_diff,
        }, f)
    print(f"[worker {args.process_id}] loss={loss:.6f} "
          f"param_l1={param_l1:.3f} restore_diff={restore_max_diff}",
          flush=True)


if __name__ == "__main__":
    main()
