"""TPU hardware smoke suite (~2-4 min on the chip; VERDICT r1 weak #4).

Runs on the REAL TPU (the axon backend this environment pins) and checks the
hardware-only behaviors the CPU-forced pytest suite (tests/conftest.py)
cannot see:

  1. Pallas kernels vs the jnp path, compiled by Mosaic on the chip:
     - multinomial small-M kernel: gathered particles BITWISE identical;
       estimates to ~1e-5 (hardware transcendentals + XLA excess-precision
       differ from the CPU interpret path in the last ulps)
     - soft-resampling kernel (alpha < 1): particles bitwise, weights ~1e-4
     - chunked large-M kernel (M > 1024): particles bitwise
     - train-mode fused update+estimate: forward ~1e-5, grads ~1e-4
  2. bf16 encoder compute: finite outputs end-to-end.
  3. One jitted e2e train step (BPTT through the flagship model): finite
     loss, finite grads.
  4. Chained-timing sanity: K dependent forward_loops in one program must
     take >= K/2 x the single-loop device time (catches the tunnel's
     value-caching / non-blocking block_until_ready traps — CLAUDE.md #2).

Usage: python scripts/tpu_smoke.py          (fails loudly, exit code != 0)
"""

import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

PASS = []
FAIL = []


def check(name):
    def deco(fn):
        def run():
            t0 = time.perf_counter()
            try:
                fn()
            except Exception as exc:  # noqa: BLE001 - report and continue
                FAIL.append((name, exc))
                print(f"[tpu_smoke] FAIL {name}: {exc!r}", flush=True)
                return
            PASS.append(name)
            print(
                f"[tpu_smoke] ok   {name} ({time.perf_counter() - t0:.1f}s)",
                flush=True,
            )

        return run

    return deco


def _pf_inputs(n, m, d=3, seed=0):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    particles = jax.random.normal(ks[0], (n, m, d))
    logits = jax.random.normal(ks[1], (n, m))
    lw = logits - jax.scipy.special.logsumexp(logits, axis=1, keepdims=True)
    ll = jax.random.normal(ks[2], (n, m))
    uniforms = jax.random.uniform(ks[3], (n, m))
    return particles, lw, ll, uniforms


def _jnp_update(lw, ll, particles):
    import jax
    import jax.numpy as jnp

    lw_new = lw + ll
    lw_new = lw_new - jax.scipy.special.logsumexp(lw_new, axis=1, keepdims=True)
    est = jnp.einsum("nm,nmd->nd", jnp.exp(lw_new), particles)
    return lw_new, est


def _ref_indices(lw_new, uniforms, mixture=None):
    import jax
    import jax.numpy as jnp

    probs = mixture if mixture is not None else jnp.exp(lw_new)
    cdf = jnp.cumsum(probs, axis=-1)
    cdf = cdf / cdf[..., -1:]
    m = lw_new.shape[1]
    return jnp.clip(jax.vmap(jnp.searchsorted)(cdf, uniforms), 0, m - 1)


@check("pallas multinomial small-M bitwise")
def smoke_pallas_multinomial():
    import jax.numpy as jnp

    from multimodalfilter_tpu.ops.pallas_pf import pf_update_and_resample

    particles, lw, ll, uniforms = _pf_inputs(4, 300)
    p2, lw2, est = pf_update_and_resample(lw, ll, particles, uniforms)
    lw_new, ref_est = _jnp_update(lw, ll, particles)
    idx = _ref_indices(lw_new, uniforms)
    ref_parts = jnp.take_along_axis(particles, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(ref_parts))
    np.testing.assert_allclose(np.asarray(est), np.asarray(ref_est), atol=1e-5)


@check("pallas soft-resample kernel")
def smoke_pallas_soft():
    import jax
    import jax.numpy as jnp

    from multimodalfilter_tpu.ops.pallas_pf import pf_update_and_resample

    alpha = 0.7
    particles, lw, ll, uniforms = _pf_inputs(4, 300, seed=1)
    m = particles.shape[1]
    p2, lw2, est = pf_update_and_resample(
        lw, ll, particles, uniforms, alpha=alpha
    )
    lw_new, _ = _jnp_update(lw, ll, particles)
    mixture = alpha * jnp.exp(lw_new) + (1.0 - alpha) / m
    idx = _ref_indices(lw_new, uniforms, mixture)
    ref_parts = jnp.take_along_axis(particles, idx[:, :, None], axis=1)
    ref_lw = jnp.take_along_axis(lw_new, idx, axis=1) - jnp.take_along_axis(
        jnp.log(mixture), idx, axis=1
    )
    ref_lw = ref_lw - jax.scipy.special.logsumexp(ref_lw, axis=1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(ref_parts))
    np.testing.assert_allclose(np.asarray(lw2), np.asarray(ref_lw), atol=1e-4)


@check("pallas chunked large-M kernel")
def smoke_pallas_chunked():
    import jax.numpy as jnp

    from multimodalfilter_tpu.ops.pallas_pf import pf_update_and_resample

    particles, lw, ll, uniforms = _pf_inputs(2, 2048, seed=2)
    p2, lw2, est = pf_update_and_resample(lw, ll, particles, uniforms)
    lw_new, ref_est = _jnp_update(lw, ll, particles)
    idx = _ref_indices(lw_new, uniforms)
    ref_parts = jnp.take_along_axis(particles, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(ref_parts))
    np.testing.assert_allclose(np.asarray(est), np.asarray(ref_est), atol=1e-5)


@check("pallas chunked kernel at M=8192/16384 (large-M band) + timing")
def smoke_pallas_chunked_large():
    """Round-2 verdict weak #7: the 1024<M<=16384 chunked band had no
    on-chip run above the M=2048 smoke. Parity at the band's top (8k, 16k)
    plus one timed e2e PF loop at M=8192 (numbers land in stderr and
    docs/PERFORMANCE.md)."""
    import functools
    import time

    import jax
    import jax.numpy as jnp

    from multimodalfilter_tpu.ops.pallas_pf import pf_update_and_resample

    for m in (8192, 16384):
        particles, lw, ll, uniforms = _pf_inputs(2, m, seed=4)
        p2, lw2, est = pf_update_and_resample(lw, ll, particles, uniforms)
        lw_new, ref_est = _jnp_update(lw, ll, particles)
        idx = _ref_indices(lw_new, uniforms)
        ref_parts = np.asarray(
            jnp.take_along_axis(particles, idx[:, :, None], axis=1)
        )
        p2_np = np.asarray(p2)
        # Contract at the chunked band's top on HARDWARE: per-draw indices
        # may flip at fp32 cumsum tie boundaries (weights ~1/M at M>=8k;
        # the on-chip cumsum reassociates differently than the kernel's
        # chunk-partial order — measured 6/16384 draws at M=8192; CPU
        # interpret mode and M<=2048 on chip are bitwise). Assert the flip
        # fraction is tiny, every flipped draw is still a VALID particle of
        # its batch row, and the weight update/estimate are exact.
        mismatch = np.any(p2_np != ref_parts, axis=-1)  # (N, M)
        frac = mismatch.mean()
        assert frac < 1e-3, f"M={m}: {frac:.2e} draws differ (not tie-level)"
        src = np.asarray(particles)
        for nrow, mrow in zip(*np.nonzero(mismatch)):
            drawn = p2_np[nrow, mrow]
            assert (src[nrow] == drawn).all(axis=-1).any(), (
                f"M={m}: draw ({nrow},{mrow}) is not a source particle"
            )
        np.testing.assert_allclose(
            np.asarray(est), np.asarray(ref_est), atol=1e-5
        )
        print(
            f"  [large-M] M={m}: parity ok "
            f"({int(mismatch.sum())}/{mismatch.size} tie-boundary flips)",
            file=sys.stderr, flush=True,
        )

    # Timed: flagship PF e2e at M=8192 (chunked kernel inside the scan).
    import dataclasses

    from crossmodal.door_models import DoorCrossmodalParticleFilter

    n, t, m, chain = 4, 25, 8192, 4
    model = DoorCrossmodalParticleFilter()
    defn = dataclasses.replace(
        model.definition, num_particles_eval=m, pallas_resample=True
    )
    obs, controls, belief, key = _flagship_batch_for(defn, model.params, n, t)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(params, belief, obs, ctrl, key, reps: int):
        def body(carry, i):
            b, acc = carry
            eps = i.astype(jnp.float32) * 1e-12
            obs_i = jax.tree_util.tree_map(lambda v: v + eps, obs)
            nb, est = defn.forward_loop(
                params, b, obs_i, ctrl + eps, jax.random.fold_in(key, i),
                train=False, enabled=(True, True),
            )
            return (nb, acc + est.sum()), None

        (_, acc), _ = jax.lax.scan(
            body, (belief, jnp.float32(0)), jnp.arange(reps)
        )
        return acc

    float(chained(model.params, belief, obs, controls, key, chain))
    float(chained(model.params, belief, obs, controls, jax.random.PRNGKey(9), chain))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(chained(model.params, belief, obs, controls,
                      jax.random.PRNGKey(10 + i), chain))
        times.append(time.perf_counter() - t0)
    sps = t * n * chain / min(times)
    print(
        f"  [large-M] M={m}: {sps:.0f} filter-steps/s "
        f"({sps * m / 1e6:.1f}M particle-updates/s, chunked kernel)",
        file=sys.stderr, flush=True,
    )


def _flagship_batch_for(defn, params, n, t, seed=0):
    """(obs_seq, controls_seq, belief, key) for a flagship def at (n, t)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    obs = {
        "image": jax.random.normal(ks[0], (t, n, 32, 32)),
        "gripper_pos": jax.random.normal(ks[1], (t, n, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (t, n, 7)),
    }
    controls = jax.random.normal(ks[3], (t, n, 7))
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(params, ks[4], mean, cov, train=False)
    return obs, controls, belief, key


@check("pallas train-mode custom-VJP kernel")
def smoke_pallas_train():
    import jax
    import jax.numpy as jnp

    from multimodalfilter_tpu.ops.pallas_pf import pf_update_estimate

    particles, lw, ll, _ = _pf_inputs(4, 64, seed=3)

    def loss_pallas(lw, ll, particles):
        lw2, est = pf_update_estimate(lw, ll, particles, False)
        return jnp.sum(est**2) + jnp.sum(jnp.exp(lw2) * jnp.cos(lw2))

    def loss_jnp(lw, ll, particles):
        lw2, est = _jnp_update(lw, ll, particles)
        return jnp.sum(est**2) + jnp.sum(jnp.exp(lw2) * jnp.cos(lw2))

    v1, g1 = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(lw, ll, particles)
    v2, g2 = jax.value_and_grad(loss_jnp, argnums=(0, 1, 2))(lw, ll, particles)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def _flagship_batch(n, t, seed=0):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    obs = {
        "image": jax.random.normal(ks[0], (t, n, 32, 32), jnp.float32),
        "gripper_pos": jax.random.normal(ks[1], (t, n, 3), jnp.float32),
        "gripper_sensors": jax.random.normal(ks[2], (t, n, 7), jnp.float32),
    }
    controls = jax.random.normal(ks[3], (t, n, 7), jnp.float32)
    states = jax.random.normal(ks[4], (t, n, 3), jnp.float32)
    return obs, controls, states


@check("bf16 encoder compute finite")
def smoke_bf16():
    import jax
    import jax.numpy as jnp

    from crossmodal.door_models import DoorCrossmodalParticleFilter
    from multimodalfilter_tpu.utils.precision import with_compute_dtype

    model = DoorCrossmodalParticleFilter()
    defn = with_compute_dtype(model.definition, jnp.bfloat16)
    n, t = 4, 8
    obs, controls, _ = _flagship_batch(n, t)
    key = jax.random.PRNGKey(0)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(model.params, key, mean, cov, train=False)

    @jax.jit
    def run(params, belief, obs, controls, key):
        _, est = defn.forward_loop(
            params, belief, obs, controls, key, train=False, enabled=(True, True)
        )
        return est

    est = run(model.params, belief, obs, controls, key)
    assert np.all(np.isfinite(np.asarray(est))), "bf16 estimates not finite"


@check("fused whole-trajectory step kernel matches scan path on hardware")
def smoke_fused_step():
    """MMF_TPU_FUSED_STEP compiles a Mosaic program (grid carry in VMEM
    scratch) that CPU interpret mode cannot validate — run the fused vs
    scan forward_loop on the chip and compare estimates to fp-reassociation
    tolerance (ops/pallas_fused_step.py; tie-level resample draws may
    flip, same class as the documented large-M cumsum reassociation)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from crossmodal.door_models import DoorCrossmodalParticleFilter
    from multimodalfilter_tpu.ops import pallas_fused_step as pfs
    from multimodalfilter_tpu.utils.precision import with_fused_step

    model = DoorCrossmodalParticleFilter()
    defn = dataclasses.replace(
        model.definition, num_particles_eval=100, pallas_resample=True
    )
    n, t = 2, 16
    obs, controls, _ = _flagship_batch(n, t)
    key = jax.random.PRNGKey(5)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(model.params, key, mean, cov, train=False)

    def run(d, precision=None):
        @jax.jit
        def go(params, belief, obs, controls, key):
            _, est = d.forward_loop(
                params, belief, obs, controls, key, train=False,
                enabled=(True, True),
            )
            return est

        if precision:
            with jax.default_matmul_precision(precision):
                return np.asarray(go(model.params, belief, obs, controls, key))
        return np.asarray(go(model.params, belief, obs, controls, key))

    # The kernel computes its trunk matmuls in true fp32 (HIGHEST); the
    # scan path's flax Dense layers run at XLA:TPU DEFAULT precision
    # (bf16 passes, ~2e-2 relative on this trunk). Compare tightly against
    # a highest-precision scan reference (isolates reassociation from
    # precision policy), and loosely against the production default path.
    fused_defn = with_fused_step(defn, True)
    est_scan_hi = run(defn, precision="highest")
    est_fused_hi = run(fused_defn, precision="highest")
    assert pfs.packing_report() is None, pfs.packing_report()
    np.testing.assert_allclose(est_fused_hi, est_scan_hi, rtol=2e-4, atol=2e-4)
    # Production-default comparison: encoders/rows outside the kernel run
    # at default precision either way; only the trunk differs (bf16-pass
    # scan vs fp32 kernel) — bf16-class agreement expected.
    est_scan_default = run(defn)
    est_fused_default = run(fused_defn)
    np.testing.assert_allclose(
        est_fused_default, est_scan_default, rtol=0.2, atol=0.05
    )


@check("rbg PRNG (RngBitGenerator) rollout on hardware")
def smoke_rbg():
    """MMF_TPU_RBG draws lower to the RngBitGenerator HLO — a TPU hardware
    path the CPU-forced pytest suite exercises only via emulation. Checks
    the flagship PF rollout under unsafe_rbg keys is finite and
    deterministic per key on the chip (utils/rng.py, tests/test_rbg.py)."""
    import jax
    import jax.numpy as jnp

    from crossmodal.door_models import DoorCrossmodalParticleFilter

    model = DoorCrossmodalParticleFilter()
    defn = model.definition
    n, t = 4, 8
    obs, controls, _ = _flagship_batch(n, t)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))

    @jax.jit
    def run(params, belief, obs, controls, key):
        _, est = defn.forward_loop(
            params, belief, obs, controls, key, train=False, enabled=(True, True)
        )
        return est

    old = jax.config.jax_default_prng_impl
    jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    try:
        key = jax.random.PRNGKey(123)
        assert key.shape == (4,), "expected an rbg key"
        belief = defn.initialize_beliefs(model.params, key, mean, cov, train=False)
        a = np.asarray(run(model.params, belief, obs, controls, key))
        b = np.asarray(run(model.params, belief, obs, controls, key))
    finally:
        jax.config.update("jax_default_prng_impl", old)
    assert np.all(np.isfinite(a)), "rbg estimates not finite on hardware"
    assert np.array_equal(a, b), "rbg rollout not deterministic per key"


@check("folded encoder tail matches unfolded on hardware")
def smoke_fold_enc():
    import jax

    from multimodalfilter_tpu.models.encoders import ImageEncoder

    # Compare ENCODER FEATURES, not post-resampling PF estimates: on TPU
    # both paths run their matmuls as bf16 MXU passes
    # (--xla_allow_excess_precision), so each carries ~0.3% pass noise and
    # the PF's discrete resampling amplifies any difference chaotically
    # (first run of this check measured 0.35 estimate drift from a 0.006
    # feature difference). The property that must hold on hardware is that
    # the folded tail produces the same features to bf16-pass tolerance.
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 32, 32))
    enc0 = ImageEncoder(64)
    enc1 = ImageEncoder(64, fold_tail=True)
    params = jax.jit(enc0.init)(key, x)
    y0 = np.asarray(jax.jit(enc0.apply)(params, x))
    y1 = np.asarray(jax.jit(enc1.apply)(params, x))
    scale = np.abs(y0).max()
    err = np.abs(y0 - y1).max()
    assert np.isfinite(y1).all(), "folded encoder produced non-finite"
    assert err < 0.02 * max(scale, 1.0), (
        f"fold-vs-unfold feature drift {err} (scale {scale}) on hardware"
    )


@check("e2e jitted train step finite")
def smoke_train_step():
    import jax
    import jax.numpy as jnp
    import optax

    from crossmodal.door_models import DoorCrossmodalParticleFilter

    model = DoorCrossmodalParticleFilter()
    defn = model.definition
    n, t = 4, 6
    obs, controls, states = _flagship_batch(n, t)
    key = jax.random.PRNGKey(0)

    def loss_fn(params, key):
        k_init, k_loop = jax.random.split(key)
        cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
        belief = defn.initialize_beliefs(params, k_init, states[0], cov, train=True)
        obs_rest = jax.tree_util.tree_map(lambda a: a[1:], obs)
        _, est = defn.forward_loop(
            params, belief, obs_rest, controls[1:], k_loop,
            train=True, enabled=(True, True),
        )
        return jnp.mean((est - states[1:]) ** 2)

    tx = optax.adam(1e-4)

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(model.params, tx.init(model.params), key)
    assert np.isfinite(float(loss)), f"train loss not finite: {loss}"
    finite = jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a: bool(np.all(np.isfinite(np.asarray(a)))), params)
    )
    assert finite, "non-finite params after one train step"


@check("chained-timing sanity")
def smoke_timing():
    import jax
    import jax.numpy as jnp

    from crossmodal.door_models import DoorParticleFilter

    model = DoorParticleFilter()
    defn = dataclasses.replace(model.definition, num_particles_eval=300)
    n, t = 16, 100
    obs, controls, _ = _flagship_batch(n, t)
    key = jax.random.PRNGKey(0)
    mean = jnp.zeros((n, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (n, 3, 3))
    belief = defn.initialize_beliefs(model.params, key, mean, cov, train=False)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def chained(params, belief, obs, controls, key, reps: int):
        def body(carry, i):
            b, acc = carry
            nb, est = defn.forward_loop(
                params, b, obs, controls, jax.random.fold_in(key, i), train=False
            )
            return (nb, acc + est.sum()), None

        (_, acc), _ = jax.lax.scan(body, (belief, jnp.float32(0)), jnp.arange(reps))
        return acc

    def timed(reps, key):
        t0 = time.perf_counter()
        float(chained(model.params, belief, obs, controls, key, reps))
        return time.perf_counter() - t0

    # Warm-up both trace shapes with fresh keys, then time with fresh keys
    # (identical executions are value-cached through the tunnel). A single
    # dispatch hides entirely inside the ~30ms tunnel RTT, so the sanity
    # check works on the DIFFERENCE between two chain lengths: per-loop
    # device time derived from (t32 - t4)/28 must be plausible (real work,
    # not value-cache hits) and the long chain must clearly dominate.
    timed(4, jax.random.PRNGKey(10))
    timed(32, jax.random.PRNGKey(11))
    t4 = min(timed(4, jax.random.PRNGKey(i)) for i in range(20, 23))
    t32 = min(timed(32, jax.random.PRNGKey(i)) for i in range(30, 33))
    per_loop = (t32 - t4) / 28.0
    assert 0.2e-3 < per_loop < 0.5, (
        f"chained timing implausible: t4={t4*1e3:.1f}ms t32={t32*1e3:.1f}ms "
        f"-> {per_loop*1e3:.2f}ms/loop (T={t}, N={n}, M=300) — value-caching "
        "or non-blocking fetch suspected"
    )
    assert t32 > 1.5 * t4, (
        f"chained timing implausible: t32={t32*1e3:.1f}ms not >> t4="
        f"{t4*1e3:.1f}ms — per-dispatch RTT dominates or runs were cached"
    )



@check("AOT export bundle replays the serving stack on-chip")
def smoke_export_replay():
    """Export a CMPF bundle under the full production serving stack
    (Pallas PF kernel + bf16 encoders + folded tail) ON the chip, reload
    it, and replay: estimates must match the live facade bitwise. The CPU
    tests (test_export.py) cannot catch tpu-only lowering issues in the
    serialized Pallas custom calls; this does."""
    import shutil
    import tempfile

    import jax.numpy as jnp

    from crossmodal.tasks import DoorTask
    from multimodalfilter_tpu.experiments.export import (
        export_serving_bundle,
        load_serving_bundle,
    )

    prior_serving = os.environ.get("MMF_TPU_SERVING")
    os.environ["MMF_TPU_SERVING"] = "1"
    try:
        model = DoorTask.model_types["DoorCrossmodalParticleFilter"]()
    finally:
        # Restore (not delete) so a user-set MMF_TPU_SERVING still governs
        # the checks that run after this one.
        if prior_serving is None:
            del os.environ["MMF_TPU_SERVING"]
        else:
            os.environ["MMF_TPU_SERVING"] = prior_serving
    model.eval()
    n, t = 4, 8
    obs, controls, _ = _flagship_batch(n, t)
    mean = np.zeros((n, 3), np.float32)
    cov = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.1, (n, 3, 3)).copy()

    out = tempfile.mkdtemp(prefix="mmf_export_smoke_")
    try:
        bundle = export_serving_bundle(
            model, out, observations=obs, controls=controls
        )
        model.initialize_beliefs(mean=mean, covariance=cov)
        want = np.asarray(
            model.forward_loop(observations=obs, controls=controls)
        )
        served = load_serving_bundle(bundle, seed=0)
        served.initialize_beliefs(mean=mean, covariance=cov)
        got = np.asarray(
            served.forward_loop(observations=obs, controls=controls)
        )
        np.testing.assert_array_equal(want, got)
        assert np.all(np.isfinite(got))
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main():

    import jax

    print(f"[tpu_smoke] devices: {jax.devices()}", flush=True)
    if jax.default_backend() not in ("tpu", "axon") and not any(
        d.platform == "tpu" for d in jax.devices()
    ):
        print(
            f"[tpu_smoke] WARNING: backend is {jax.default_backend()!r}, "
            "not a TPU — results do not validate hardware behavior",
            flush=True,
        )

    smoke_pallas_multinomial()
    smoke_pallas_soft()
    smoke_pallas_chunked()
    smoke_pallas_chunked_large()
    smoke_pallas_train()
    smoke_bf16()
    smoke_fused_step()
    smoke_rbg()
    smoke_fold_enc()
    smoke_train_step()
    smoke_export_replay()
    smoke_timing()

    print(
        f"[tpu_smoke] {len(PASS)} passed, {len(FAIL)} failed", flush=True
    )
    if FAIL:
        for name, exc in FAIL:
            print(f"[tpu_smoke]   FAILED: {name}: {exc!r}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
