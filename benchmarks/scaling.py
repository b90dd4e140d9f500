"""Scaling studies for the flagship door crossmodal particle filter.

Run on the TPU:  python benchmarks/scaling.py [batch|particles|eval_scale]

All timings chain K dependent forward_loops inside one jitted program and
force completion with a host scalar fetch — see CLAUDE.md "environment
traps": single-dispatch timings through the remote-TPU tunnel are dominated
by ~30ms RTT and identical executions are value-cached.

Reference numbers on a v5e chip (round 2, corrected harness — each chain
rep perturbs its inputs so the hoisted encoder pass cannot be elided):
  batch scaling  (M=100, T=100): N=16 -> 150k, N=64 -> 241k, N=128 -> 230k,
                                 N=256 -> 280k filter-steps/s/chip
  particle scaling (N=16, T=100, chained): M=100 -> 146k steps/s
                                 (14.6M particle-updates/s), M=300 -> 127k
                                 (38.2M), M=1000 -> 69k (68.5M)
  eval scale (T=800, N=16, M=300): 131k steps/s steady
"""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp


def make_runner(defn):
    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_chained(params, belief, obs, ctrl, key, reps):
        def body(carry, i):
            b, acc = carry
            # i*1e-12: numerical no-op that keeps inputs loop-variant so the
            # batched encoder pass cannot be hoisted out of the chain (else
            # steps/s reads ~2-4x above fresh-data throughput; see bench.py).
            eps = i.astype(jnp.float32) * 1e-12
            obs_i = jax.tree_util.tree_map(lambda v: v + eps, obs)
            nb, est = defn.forward_loop(
                params, b, obs_i, ctrl + eps, jax.random.fold_in(key, i),
                train=False, enabled=(True, True),
            )
            return (nb, acc + est.sum()), None

        (_, acc), _ = jax.lax.scan(body, (belief, jnp.float32(0)), jnp.arange(reps))
        return acc

    return run_chained


def make_inputs(batch, timesteps, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    obs = {
        "image": jax.random.normal(ks[0], (timesteps, batch, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (timesteps, batch, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (timesteps, batch, 7)),
    }
    return obs, jax.random.normal(ks[3], (timesteps, batch, 7))


def measure(defn, batch, timesteps, chain=8, repeats=3):
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    model = DoorCrossmodalParticleFilter()
    obs, ctrl = make_inputs(batch, timesteps)
    mean = jnp.zeros((batch, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (batch, 3, 3))
    belief = defn.initialize_beliefs(
        model.params, jax.random.PRNGKey(4), mean, cov, train=False
    )
    run = make_runner(defn)
    key = jax.random.PRNGKey(0)
    float(run(model.params, belief, obs, ctrl, key, chain))  # compile
    float(run(model.params, belief, obs, ctrl, jax.random.PRNGKey(9), chain))
    times = []
    for i in range(repeats):
        t0 = time.perf_counter()
        float(run(model.params, belief, obs, ctrl, jax.random.PRNGKey(i + 1), chain))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return timesteps * batch * chain / best


def main():
    from crossmodal.door_models import DoorCrossmodalParticleFilter

    study = sys.argv[1] if len(sys.argv) > 1 else "batch"
    base = DoorCrossmodalParticleFilter().definition

    if study == "batch":
        defn = dataclasses.replace(base, num_particles_eval=100, pallas_resample=True)
        for batch in (16, 64, 128, 256):
            sps = measure(defn, batch, 100)
            print(f"batch={batch}: {sps:.0f} filter-steps/s/chip")
    elif study == "particles":
        for m in (100, 300, 1000):
            defn = dataclasses.replace(
                base, num_particles_eval=m, pallas_resample=True
            )
            sps = measure(defn, 16, 100)
            print(f"particles={m}: {sps:.0f} steps/s ({sps * m / 1e6:.1f}M particle-updates/s)")
    elif study == "eval_scale":
        defn = dataclasses.replace(base, num_particles_eval=300, pallas_resample=True)
        sps = measure(defn, 16, 800, chain=2)
        print(f"T=800, M=300: {sps:.0f} filter-steps/s/chip")
    else:
        sys.exit(f"unknown study {study!r}")


if __name__ == "__main__":
    main()
