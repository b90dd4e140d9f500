"""Benchmark: filter-steps/sec/chip on the flagship door crossmodal particle
filter at 100 particles (eval mode), per the north-star metric
(BASELINE.json: >=20x PyTorch-CPU filter-steps/sec on TPU at 100-particle PF).

Prints ONE JSON line:
  {"metric": "filter_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N / <torch-CPU steps/s>,
   "value_saturated": N at BENCH_SAT_BATCH (default 512 — the throughput
   peak of the batch sweep: 280k @256, 291k @512, OOM @1024, corrected
   loop-variant harness; the chip is under-utilized at the N=16
   like-for-like config),
   "mfu": model FLOPs utilization of the saturated run (XLA cost-analysis
   FLOPs per filter-step x steps/s / chip peak),
   "train_steps_per_sec": e2e BPTT training throughput (reference-curriculum
   config B=32),
   "train_steps_per_sec_saturated_bf16": same at the production config
   (B=512, bf16 encoders — the measured train-side saturation point),
   "latency_us_per_step_n1": single-stream serving latency (N=1,
   production stack; chained timing, tunnel RTT amortized)}

The baseline is an architecture-equivalent PyTorch-CPU implementation of the
same recursion (dynamics propagation + 2 measurement models + gate +
logsumexp fusion + multinomial resampling), timed in-process. One
"filter-step" = one (trajectory, timestep) update, i.e. T*N steps per
forward_loop call.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "16"))
SAT_BATCH = int(os.environ.get("BENCH_SAT_BATCH", "512"))
PARTICLES = int(os.environ.get("BENCH_PARTICLES", "100"))
TIMESTEPS = int(os.environ.get("BENCH_T", "100"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
# Chain K dependent forward_loops inside one jitted program: a single
# dispatch through the remote-TPU tunnel costs ~30ms of round-trip latency,
# which would otherwise dominate the measurement (device time per loop is a
# few ms). A production serving loop keeps work device-resident the same way.
CHAIN = int(os.environ.get("BENCH_CHAIN", "16"))
TORCH_STEPS = int(os.environ.get("BENCH_TORCH_STEPS", "10"))

# Peak MXU throughput used for the MFU estimate: TPU v5 lite (v5e) bf16 peak,
# 197 TFLOP/s. The bf16 number is the right roofline denominator even for the
# default fp32 model: this environment compiles with
# --xla_allow_excess_precision=true, under which XLA executes fp32 matmuls/
# convs as bf16 MXU passes (measured: an fp32-peak denominator yields an
# impossible >100% MFU).
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", "1.97e14"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# JAX/TPU measurement
# ---------------------------------------------------------------------------


def bench_jax(batch: int = BATCH, measure_flops: bool = False, bf16: bool = None,
              fold: bool = False, stack: bool = False, unroll: int = 1,
              hoist_rng: bool = None, hoist_ctrl: bool = None,
              fused: bool = False):
    """Returns (filter_steps_per_sec, flops_per_filter_step | None)."""
    import jax
    import jax.numpy as jnp

    from crossmodal.door_models import DoorCrossmodalParticleFilter

    log(f"[bench] devices: {jax.devices()} (batch={batch})")
    model = DoorCrossmodalParticleFilter()
    # The fused Pallas update/resample kernel is bitwise-identical to the
    # jnp path on TPU (fp32-precision MXU matmuls) and ~30% faster;
    # disable with BENCH_PALLAS=0.
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1" and (
        jax.default_backend() == "tpu"
    )
    defn = dataclasses.replace(
        model.definition,
        num_particles_eval=PARTICLES,
        pallas_resample=use_pallas,
    )
    if bf16 is None:
        bf16 = os.environ.get("BENCH_BF16", "0") == "1"
    if bf16:
        from multimodalfilter_tpu.utils.precision import with_compute_dtype

        defn = with_compute_dtype(defn, jnp.bfloat16)
        log("[bench] bf16 encoder compute enabled")
    if fold:
        from multimodalfilter_tpu.utils.precision import with_fold_tail

        defn = with_fold_tail(defn, True)
        log("[bench] folded encoder tail enabled")
    if stack:
        from multimodalfilter_tpu.utils.precision import with_stacked_encoders

        defn = with_stacked_encoders(defn, True)
        log("[bench] stacked multi-instance encoders enabled")
    if unroll > 1:
        from multimodalfilter_tpu.utils.precision import with_scan_unroll

        defn = with_scan_unroll(defn, unroll)
        log(f"[bench] forward_loop scan unroll={unroll}")
    # A/B knobs for the round-5 scan hoists (both default ON in the defs;
    # None leaves the def untouched).
    if hoist_rng is not None:
        from multimodalfilter_tpu.utils.precision import with_hoist_rng

        defn = with_hoist_rng(defn, hoist_rng)
        log(f"[bench] hoist_rng={hoist_rng}")
    if hoist_ctrl is not None:
        from multimodalfilter_tpu.utils.precision import with_hoist_ctrl

        defn = with_hoist_ctrl(defn, hoist_ctrl)
        log(f"[bench] hoist_ctrl={hoist_ctrl}")
    if fused:
        from multimodalfilter_tpu.utils.precision import with_fused_step

        defn = with_fused_step(defn, True)
        log("[bench] fused whole-trajectory step kernel enabled")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    obs_seq = {
        "image": jax.random.normal(ks[0], (TIMESTEPS, batch, 32, 32), jnp.float32),
        "gripper_pos": jax.random.normal(ks[1], (TIMESTEPS, batch, 3), jnp.float32),
        "gripper_sensors": jax.random.normal(
            ks[2], (TIMESTEPS, batch, 7), jnp.float32
        ),
    }
    controls_seq = jax.random.normal(ks[3], (TIMESTEPS, batch, 7), jnp.float32)
    mean = jnp.zeros((batch, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (batch, 3, 3))
    belief = defn.initialize_beliefs(model.params, ks[4], mean, cov, train=False)

    import functools

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_chained(params, belief, obs_seq, controls_seq, key, reps: int):
        """`reps` dependent forward_loops in one program (belief threads
        through, so none can be elided). Each rep perturbs the observations
        and controls by i*1e-12 — numerically a no-op in fp32 (below eps for
        O(1) data) but it makes the inputs loop-VARIANT, so XLA cannot hoist
        the scan-hoisted (T*N)-batched encoder passes out of the chain.
        Without this the chain re-uses one encode for all reps and the
        measured steps/s is ~2-4x higher than true fresh-data serving
        throughput (this bug shipped in BENCH_r01: 404k at N=16 vs the
        honest 179k)."""

        def body(carry, i):
            b, acc = carry
            eps = i.astype(jnp.float32) * 1e-12
            obs_i = jax.tree_util.tree_map(lambda v: v + eps, obs_seq)
            ctrl_i = controls_seq + eps
            nb, est = defn.forward_loop(
                params, b, obs_i, ctrl_i, jax.random.fold_in(key, i),
                train=False, enabled=(True, True),
            )
            return (nb, acc + est.sum()), None

        (_, acc), _ = jax.lax.scan(
            body, (belief, jnp.float32(0)), jnp.arange(reps)
        )
        return acc

    # Warm-up / compile. NOTE: through the remote-TPU tunnel,
    # block_until_ready does not reliably block and identical executions are
    # cached — so every timed run varies the PRNG key AND forces completion
    # with a host scalar fetch.
    t0 = time.perf_counter()
    float(run_chained(model.params, belief, obs_seq, controls_seq, key, CHAIN))
    log(f"[bench] compile+first run: {time.perf_counter() - t0:.1f}s")
    float(
        run_chained(
            model.params, belief, obs_seq, controls_seq, jax.random.PRNGKey(99),
            CHAIN,
        )
    )  # second warm-up (first fresh-input run pays transfers)

    times = []
    for i in range(REPEATS):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        float(
            run_chained(model.params, belief, obs_seq, controls_seq, k, CHAIN)
        )  # forces full execution + host roundtrip
        times.append(time.perf_counter() - t0)
    best = min(times)
    steps_per_sec = TIMESTEPS * batch * CHAIN / best
    log(
        f"[bench] jax: {best * 1e3:.1f} ms / {CHAIN}x{TIMESTEPS}x{batch} steps "
        f"-> {steps_per_sec:.0f} steps/s (chained; ~30ms tunnel RTT amortized)"
    )

    flops_per_step = None
    if measure_flops:
        try:
            compiled = run_chained.lower(
                model.params, belief, obs_seq, controls_seq, key, 1
            ).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops_per_step = float(ca["flops"]) / (TIMESTEPS * batch)
            log(
                f"[bench] XLA cost analysis: {flops_per_step / 1e6:.2f} "
                "MFLOPs / filter-step"
            )
        except Exception as exc:  # cost analysis is backend-best-effort
            log(f"[bench] cost analysis unavailable: {exc}")
    return steps_per_sec, flops_per_step


def bench_kf_jax(model_name: str = "DoorCrossmodalKalmanFilter",
                 batch: int = 1, bf16: bool = True, fold: bool = True,
                 unroll: int = 10, hoist_ctrl=None, stack_children=None):
    """KF-family serving throughput (house chained-timing method — see
    bench_jax). Shared by the JSON line's latency_us_per_step_n1_cmekf
    config and scripts/bench_kf_n1.py's A/B battery (single source of
    truth for the program under measurement). Returns steps/s."""
    import functools

    import jax
    import jax.numpy as jnp

    import crossmodal.door_models as door_models

    log(f"[bench] devices: {jax.devices()} (kf {model_name}, batch={batch})")
    model = getattr(door_models, model_name)()
    defn = model.definition
    from multimodalfilter_tpu.utils.precision import (
        with_compute_dtype,
        with_fold_tail,
        with_scan_unroll,
    )

    if bf16:
        defn = with_compute_dtype(defn, jnp.bfloat16)
    if fold:
        defn = with_fold_tail(defn, True)
    if unroll > 1:
        defn = with_scan_unroll(defn, unroll)
    if hoist_ctrl is not None:
        from multimodalfilter_tpu.utils.precision import with_hoist_ctrl

        defn = with_hoist_ctrl(defn, hoist_ctrl)
    if stack_children is not None and any(
        f.name == "stack_children" for f in dataclasses.fields(defn)
    ):
        defn = dataclasses.replace(defn, stack_children=stack_children)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    obs_seq = {
        "image": jax.random.normal(
            ks[0], (TIMESTEPS, batch, 32, 32), jnp.float32
        ),
        "gripper_pos": jax.random.normal(ks[1], (TIMESTEPS, batch, 3)),
        "gripper_sensors": jax.random.normal(ks[2], (TIMESTEPS, batch, 7)),
    }
    controls_seq = jax.random.normal(ks[3], (TIMESTEPS, batch, 7))
    mean = jnp.zeros((batch, 3))
    cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (batch, 3, 3))
    belief = defn.initialize_beliefs(
        model.params, ks[4], mean, cov, train=False
    )

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run_chained(params, belief, obs_seq, controls_seq, key, reps: int):
        # Same loop-variant chained structure as bench_jax (see the long
        # comment there): i*1e-12 keeps inputs fresh per rep so the hoisted
        # batched passes cannot be elided from the chain.
        def body(carry, i):
            b, acc = carry
            eps = i.astype(jnp.float32) * 1e-12
            obs_i = jax.tree_util.tree_map(lambda v: v + eps, obs_seq)
            ctrl_i = controls_seq + eps
            nb, est = defn.forward_loop(
                params, b, obs_i, ctrl_i, jax.random.fold_in(key, i),
                train=False,
            )
            return (nb, acc + est.sum()), None

        (_, acc), _ = jax.lax.scan(
            body, (belief, jnp.float32(0)), jnp.arange(reps)
        )
        return acc

    t0 = time.perf_counter()
    float(run_chained(model.params, belief, obs_seq, controls_seq, key, CHAIN))
    log(f"[bench] kf compile+first run: {time.perf_counter() - t0:.1f}s")
    float(
        run_chained(
            model.params, belief, obs_seq, controls_seq,
            jax.random.PRNGKey(99), CHAIN,
        )
    )
    times = []
    for i in range(REPEATS):
        k = jax.random.PRNGKey(i + 1)
        t0 = time.perf_counter()
        float(
            run_chained(model.params, belief, obs_seq, controls_seq, k, CHAIN)
        )
        times.append(time.perf_counter() - t0)
    best = min(times)
    steps_per_sec = TIMESTEPS * batch * CHAIN / best
    log(
        f"[bench] kf {model_name}: {best * 1e3:.1f} ms / "
        f"{CHAIN}x{TIMESTEPS}x{batch} steps -> {steps_per_sec:.0f} steps/s"
    )
    return steps_per_sec


# ---------------------------------------------------------------------------
# PyTorch-CPU baseline (architecture-equivalent)
# ---------------------------------------------------------------------------


def bench_torch() -> float:
    import torch
    import torch.nn as nn

    torch.manual_seed(0)

    units, state_dim, control_dim = 64, 3, 7

    class Resblock(nn.Module):
        def __init__(self, units):
            super().__init__()
            self.block1 = nn.Linear(units, units)
            self.block2 = nn.Linear(units, units)

        def forward(self, x):
            return x + torch.relu(self.block2(torch.relu(self.block1(x))))

    class ConvResblock(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.block1 = nn.Conv2d(ch, ch, 3, padding=1)
            self.block2 = nn.Conv2d(ch, ch, 3, padding=1)

        def forward(self, x):
            return x + torch.relu(self.block2(torch.relu(self.block1(x))))

    def mlp_encoder(in_dim):
        return nn.Sequential(nn.Linear(in_dim, units), nn.ReLU(), Resblock(units))

    def image_encoder():
        return nn.Sequential(
            nn.Conv2d(1, 32, 5, padding=2), nn.ReLU(), ConvResblock(32),
            nn.Conv2d(32, 16, 3, padding=1), nn.ReLU(),
            nn.Conv2d(16, 8, 3, padding=1), nn.Flatten(),
            nn.Linear(8 * 32 * 32, units), nn.ReLU(), Resblock(units),
        )

    class Dynamics(nn.Module):
        def __init__(self):
            super().__init__()
            self.state_enc = mlp_encoder(state_dim)
            self.ctrl_enc = mlp_encoder(control_dim)
            self.trunk = nn.Sequential(
                nn.Linear(units * 2, units), Resblock(units), Resblock(units),
                Resblock(units), nn.Linear(units, state_dim + 1),
            )

        def forward(self, s, c):
            h = self.trunk(torch.cat([self.ctrl_enc(c), self.state_enc(s)], -1))
            return s + h[..., :state_dim] * torch.sigmoid(h[..., -1:])

    class Measurement(nn.Module):
        def __init__(self, image: bool):
            super().__init__()
            self.image = image
            self.obs_encs = nn.ModuleList(
                [image_encoder()] if image else [mlp_encoder(3), mlp_encoder(7)]
            )
            n_obs = len(self.obs_encs)
            self.state_enc = mlp_encoder(state_dim)
            self.trunk = nn.Sequential(
                nn.Linear(units * (n_obs + 1), units), nn.ReLU(),
                Resblock(units), Resblock(units), nn.Linear(units, 1),
            )

        def forward(self, states, obs):
            n, m, _ = states.shape
            if self.image:
                feats = [self.obs_encs[0](obs["image"][:, None])]
            else:
                feats = [
                    self.obs_encs[0](obs["gripper_pos"]),
                    self.obs_encs[1](obs["gripper_sensors"]),
                ]
            f = torch.cat(feats, -1)[:, None, :].expand(n, m, -1)
            merged = torch.cat([f, self.state_enc(states)], -1)
            return self.trunk(merged).squeeze(-1)

    class Gate(nn.Module):
        def __init__(self):
            super().__init__()
            self.img = image_encoder()
            self.pos = mlp_encoder(3)
            self.sens = mlp_encoder(7)
            self.fusion = nn.Sequential(
                nn.Linear(units * 3, units), nn.ReLU(),
                Resblock(units), Resblock(units), Resblock(units),
                nn.Linear(units, 2),
            )

        def forward(self, obs):
            f = torch.cat(
                [
                    self.img(obs["image"][:, None]),
                    self.pos(obs["gripper_pos"]),
                    self.sens(obs["gripper_sensors"]),
                ],
                -1,
            )
            return self.fusion(f)

    dynamics = Dynamics()
    mm_image = Measurement(True)
    mm_force = Measurement(False)
    gate = Gate()
    q_diag = torch.sqrt(torch.tensor([0.05, 0.01, 0.01])) / 8.0

    n, m = BATCH, PARTICLES
    particles = torch.randn(n, m, state_dim)
    log_weights = torch.full((n, m), -np.log(m))

    def step(particles, log_weights, obs, controls):
        flat = particles.reshape(n * m, state_dim)
        ctrl = controls.repeat_interleave(m, dim=0)
        pred = dynamics(flat, ctrl) + torch.randn(n * m, state_dim) * q_diag
        particles = pred.reshape(n, m, state_dim)
        lls = torch.stack(
            [mm_image(particles, obs), mm_force(particles, obs)], dim=2
        )
        lw = gate(obs)
        log_weights = log_weights + torch.logsumexp(lw[:, None, :] + lls, dim=2)
        log_weights = log_weights - torch.logsumexp(log_weights, dim=1, keepdim=True)
        estimate = torch.einsum("nm,nmd->nd", log_weights.exp(), particles)
        idx = torch.multinomial(log_weights.exp(), m, replacement=True)
        particles = torch.gather(
            particles, 1, idx[:, :, None].expand(n, m, state_dim)
        )
        log_weights = torch.full((n, m), -np.log(m))
        return particles, log_weights, estimate

    obs = {
        "image": torch.randn(n, 32, 32),
        "gripper_pos": torch.randn(n, 3),
        "gripper_sensors": torch.randn(n, 7),
    }
    controls = torch.randn(n, 7)

    with torch.no_grad():
        # Warm-up.
        particles, log_weights, _ = step(particles, log_weights, obs, controls)
        t0 = time.perf_counter()
        for _ in range(TORCH_STEPS):
            particles, log_weights, _ = step(particles, log_weights, obs, controls)
        elapsed = time.perf_counter() - t0

    steps_per_sec = TORCH_STEPS * n / elapsed
    log(
        f"[bench] torch-cpu: {elapsed * 1e3:.1f} ms / {TORCH_STEPS}x{n} steps "
        f"-> {steps_per_sec:.0f} steps/s"
    )
    return steps_per_sec


# ---------------------------------------------------------------------------
# Pinned torch-CPU baseline (VERDICT r2 weak #6: the in-process baseline moves
# with host-CPU contention, so round-over-round vs_baseline deltas were
# meaningless). The first run on a given host records the measured baseline +
# a host fingerprint into BASELINE_PIN.json; later runs report vs_baseline
# against the PIN (stable) and the live re-measure separately.
# ---------------------------------------------------------------------------

_PIN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_PIN.json")


def _host_fingerprint() -> dict:
    import platform

    model = None
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return {
        "machine": platform.machine(),
        "cpu_count": os.cpu_count(),
        "cpu_model": model,
    }


def pinned_baseline(live_sps):
    """Returns (pinned_steps_per_sec | None). Records the pin on first use;
    re-pin by deleting BASELINE_PIN.json or setting BENCH_REPIN=1."""
    config = {"batch": BATCH, "particles": PARTICLES,
              "torch_steps": TORCH_STEPS}
    if os.environ.get("BENCH_REPIN", "0") != "1" and os.path.exists(_PIN_PATH):
        try:
            with open(_PIN_PATH) as f:
                pin = json.load(f)
            if pin.get("config") == config:
                if pin.get("host") != _host_fingerprint():
                    log("[bench] WARNING: baseline pin from a different host "
                        "fingerprint; vs_baseline uses it anyway (delete "
                        "BASELINE_PIN.json to re-pin)")
                return float(pin["torch_cpu_steps_per_sec"])
            log("[bench] baseline pin config mismatch; re-pinning")
        except (OSError, ValueError, KeyError) as exc:
            log(f"[bench] unreadable baseline pin ({exc}); re-pinning")
    if live_sps is None:
        return None
    pin = {
        "torch_cpu_steps_per_sec": round(live_sps, 1),
        "config": config,
        "host": _host_fingerprint(),
        "pinned_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "note": "architecture-equivalent torch-CPU PF baseline (bench.py);"
                " vs_baseline divides by this constant so round-over-round"
                " deltas are host-contention-independent",
    }
    try:
        with open(_PIN_PATH, "w") as f:
            json.dump(pin, f, indent=2)
        log(f"[bench] pinned torch-CPU baseline {live_sps:.0f} steps/s "
            f"-> {_PIN_PATH}")
    except OSError as exc:
        log(f"[bench] could not write baseline pin: {exc}")
    return live_sps


def make_train_program(batch: int, bf16: bool, seq_len: int = 16):
    """Build the epoch-jit BPTT train program: model, synthetic device data,
    loss, optimizer, and the donated-buffer jitted epoch fn.

    Shared by bench_train (the reported train throughput/MFU numbers) and
    scripts/profile_serving.py::capture_train (the profiled attribution of
    those numbers) so the two can never silently diverge (advisor r4).
    """
    import dataclasses
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from crossmodal.door_models import DoorCrossmodalParticleFilter
    from multimodalfilter_tpu.train.optim import zero_frozen_grads

    model = DoorCrossmodalParticleFilter()
    # Train-mode fused Pallas update+estimate (custom VJP) — opt-out with
    # BENCH_PALLAS=0.
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1" and (
        jax.default_backend() == "tpu"
    )
    defn = dataclasses.replace(model.definition, pallas_resample=use_pallas)
    if bf16:
        from multimodalfilter_tpu.utils.precision import with_compute_dtype

        defn = with_compute_dtype(defn, jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    n_rows = batch * 2
    data = {
        "states": jax.random.normal(ks[0], (n_rows, seq_len, 3)),
        "controls": jax.random.normal(ks[1], (n_rows, seq_len, 7)),
        "obs": {
            "image": jax.random.normal(ks[2], (n_rows, seq_len, 32, 32)),
            "gripper_pos": jax.random.normal(ks[3], (n_rows, seq_len, 3)),
            "gripper_sensors": jax.random.normal(ks[4], (n_rows, seq_len, 7)),
        },
    }

    def loss_fn(params, batch_data, key):
        states = jnp.swapaxes(batch_data["states"], 0, 1)
        controls = jnp.swapaxes(batch_data["controls"], 0, 1)
        obs = jax.tree_util.tree_map(
            lambda a: jnp.swapaxes(a, 0, 1), batch_data["obs"]
        )
        k_init, k_loop = jax.random.split(key)
        b = states.shape[1]
        cov = jnp.broadcast_to(jnp.eye(3) * 0.1, (b, 3, 3))
        belief = defn.initialize_beliefs(params, k_init, states[0], cov, train=True)
        obs_rest = jax.tree_util.tree_map(lambda a: a[1:], obs)
        _, est = defn.forward_loop(
            params, belief, obs_rest, controls[1:], k_loop,
            train=True, enabled=(True, True),
        )
        return jnp.mean((est - states[1:]) ** 2)

    tx = optax.adam(1e-4)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def epoch(params, opt_state, data, idx_matrix, key):
        def body(carry, inputs):
            params, opt_state = carry
            idx, step_key = inputs
            batch_data = jax.tree_util.tree_map(lambda a: a[idx], data)
            loss, grads = jax.value_and_grad(loss_fn)(params, batch_data, step_key)
            # named_scope marks the optimizer ops so xprof's train rollup
            # (profile_serving.py) can attribute them — optax call-site
            # names do not survive into tf_op_name on their own.
            with jax.named_scope("optimizer"):
                grads = zero_frozen_grads(grads, frozenset())
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, idx_matrix.shape[0])
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idx_matrix, keys)
        )
        return params, opt_state, jnp.mean(losses)

    def make_idx(steps: int):
        return jnp.arange(steps * batch).reshape(steps, batch) % n_rows

    return {
        "model": model, "defn": defn, "data": data, "loss_fn": loss_fn,
        "tx": tx, "epoch": epoch, "make_idx": make_idx,
        "seq_len": seq_len, "batch": batch,
    }


def bench_train(batch: int = 32, bf16: bool = False,
                measure_flops: bool = False):
    """Secondary metric (stderr): e2e BPTT training throughput — filter-steps
    (batch x unrolled timesteps x optimizer steps) per second through the
    epoch-scan train path. Default config matches the reference curriculum
    (B=32, L=16); measured sweep on this chip: fp32 62k @B=32 / 83k @128 /
    74k @256; bf16 66k / 97k / 102k @256 / 110k @512 / 108k @1024
    (benchmarks/train_sweep.py) — so the saturated figure uses bf16 @512."""
    import jax
    import jax.numpy as jnp
    import optax

    steps = 16
    prog = make_train_program(batch, bf16)
    seq_len = prog["seq_len"]
    model, data = prog["model"], prog["data"]
    loss_fn, tx, epoch = prog["loss_fn"], prog["tx"], prog["epoch"]
    key = jax.random.PRNGKey(0)

    idx = prog["make_idx"](steps)
    params, opt_state = model.params, tx.init(model.params)
    flops_per_step = None
    if measure_flops:
        try:
            # Cost-analyze ONE optimizer step, not the epoch: XLA's cost
            # analysis counts a While (the epoch's lax.scan over optimizer
            # steps) body once regardless of trip count, which would
            # under-report epoch FLOPs by `steps`x (observed exactly 16x).
            # The single-step program still has the L-timestep filter scan
            # inside, but its body is the cheap PF update — the dominant
            # encoder fwd+bwd passes are scan-hoisted and counted fully.
            @jax.jit
            def one_step(params, opt_state, batch_data, key):
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, batch_data, key
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            batch0 = jax.tree_util.tree_map(
                lambda a: a[jnp.arange(batch) % a.shape[0]], data
            )
            ca = (
                one_step.lower(params, opt_state, batch0, key)
                .compile()
                .cost_analysis()
            )
            if isinstance(ca, list):
                ca = ca[0]
            flops_per_step = float(ca["flops"]) / (batch * (seq_len - 1))
            log(
                f"[bench] train XLA cost analysis: {flops_per_step / 1e6:.2f}"
                " MFLOPs / train filter-step (fwd+bwd+opt, one-step program)"
            )
        except Exception as exc:
            log(f"[bench] train cost analysis unavailable: {exc}")
    params, opt_state, loss = epoch(params, opt_state, data, idx, key)
    float(loss)
    t0 = time.perf_counter()
    params, opt_state, loss = epoch(
        params, opt_state, data, idx, jax.random.PRNGKey(1)
    )
    float(loss)
    elapsed = time.perf_counter() - t0
    train_sps = steps * batch * (seq_len - 1) / elapsed
    log(
        f"[bench] train e2e: {elapsed * 1e3:.1f} ms / {steps} opt-steps "
        f"(L={seq_len}, B={batch}) -> {train_sps:.0f} train filter-steps/s"
    )
    return train_sps, flops_per_step


def main():
    # NOTE: do NOT enable jax's persistent compilation cache here — through
    # this environment's remote-compile (axon) backend it makes compiles
    # pathologically slow (measured 266s vs ~6s for the same program).
    #
    # Soft time budget: the headline N=16 number always runs; each optional
    # config (saturated / bf16 / train) is skipped once the budget is spent,
    # so the driver always gets the JSON line even on a cold-compile day.
    start = time.perf_counter()
    # The budget clock is restarted after the headline config (see below),
    # so this bounds only the OPTIONAL configs. 900s: on the round-2 host
    # those took ~170s total; the round-3 host compiles ~4x slower, so give
    # them ~700s of headroom before skipping starts.
    budget = float(os.environ.get("BENCH_BUDGET_S", "900"))

    # Hard watchdog: the soft budget only gates BETWEEN configs — it cannot
    # fire if the very first device touch hangs (observed: a TPU-tunnel
    # outage where even jax.devices() blocks forever in a fresh process).
    # If no JSON line has been emitted after BENCH_HARD_TIMEOUT_S, print an
    # honest error line (value 0, error field) and exit so the driver
    # records an artifact instead of a hang. Disabled with <=0.
    import threading

    _result_emitted = threading.Event()
    hard_timeout = float(os.environ.get("BENCH_HARD_TIMEOUT_S", "2700"))
    # Mutable so the deadline can be RE-ARMED once the headline config
    # completes (its compile is unbounded and host-speed dependent —
    # observed ~760s on a slow host; without re-arming, headline-compile +
    # soft budget + the last admitted config could cross the hard deadline
    # and discard an already-measured headline number). If the headline WAS
    # measured when the deadline fires, the watchdog emits it (with an
    # error field) instead of value=0.0.
    _watch = {"deadline": time.monotonic() + hard_timeout, "headline": None}
    if hard_timeout > 0:

        def _watchdog():
            while True:
                remaining = _watch["deadline"] - time.monotonic()
                if _result_emitted.wait(max(remaining, 0.001)):
                    return
                if time.monotonic() >= _watch["deadline"]:
                    break
            headline = _watch["headline"]
            if headline is not None:
                pinned = None
                try:
                    with open(
                        os.path.join(os.path.dirname(__file__), "BASELINE_PIN.json")
                    ) as f:
                        pinned = float(json.load(f)["torch_cpu_steps_per_sec"])
                except Exception:
                    pass
                payload = {
                    "metric": "filter_steps_per_sec_per_chip",
                    "value": round(headline, 1),
                    "unit": "steps/s",
                    "vs_baseline": (
                        round(headline / pinned, 2) if pinned else 0.0
                    ),
                    "error": (
                        f"watchdog: optional configs exceeded "
                        f"{hard_timeout:.0f}s after the headline; headline "
                        "figure is real, saturated/train figures missing"
                    ),
                }
            else:
                payload = {
                    "metric": "filter_steps_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "steps/s",
                    "vs_baseline": 0.0,
                    "error": (
                        f"watchdog: no result within {hard_timeout:.0f}s"
                        " — TPU backend unreachable or a compile hung"
                        " (tunnel outage?); rerun when the device is"
                        " back"
                    ),
                }
            print(json.dumps(payload), flush=True)
            os._exit(1)

        threading.Thread(target=_watchdog, daemon=True).start()

    def over_budget(label):
        if time.perf_counter() - start > budget:
            log(f"[bench] budget exceeded, skipping {label}")
            return True
        return False

    # BENCH_FOLD=1 (default): the folded encoder tail is the exact same
    # linear map (models/encoders.py) and is neutral-or-faster in every
    # measured serving config, so the fp32 figures include it; the bf16
    # figure stays fold-free so the three-way decomposition (fp32+fold /
    # bf16 / bf16+fold) remains visible.
    fold_default = os.environ.get("BENCH_FOLD", "1") == "1"
    jax_sps, _ = bench_jax(fold=fold_default)

    # Restart the budget clock now that the headline config is done: its
    # compile+first-run is host-speed dependent (the SAME program measured
    # 181s on the round-2 host and 760s on the round-3 host — the compile
    # helper runs on this box's CPU), while every subsequent config compiles
    # in ~10s. Counting the first compile against the soft budget nulls all
    # optional figures on a slow host for no benefit; the hard watchdog
    # above still bounds total process time.
    start = time.perf_counter()
    # Re-arm the hard watchdog for the optional configs and record the
    # headline so a late watchdog fire emits a real number, not 0.0.
    _watch["headline"] = jax_sps
    _watch["deadline"] = time.monotonic() + hard_timeout

    # Saturated config + MFU: the like-for-like N=16 number leaves the chip
    # ~4x under-utilized (VERDICT r1 weak #3); report a serving-batch figure
    # and the model-FLOPs utilization it implies.
    sat_sps, mfu = None, None
    if (
        os.environ.get("BENCH_SATURATED", "1") == "1"
        and SAT_BATCH != BATCH
        and not over_budget("saturated config")
    ):
        try:
            sat_sps, flops_per_step = bench_jax(
                batch=SAT_BATCH, measure_flops=True, fold=fold_default
            )
            if flops_per_step:
                mfu = sat_sps * flops_per_step / PEAK_FLOPS
                log(
                    f"[bench] MFU (saturated, N={SAT_BATCH}): {mfu * 100:.2f}% "
                    f"of {PEAK_FLOPS / 1e12:.0f} TFLOP/s peak"
                )
        except Exception as exc:
            log(f"[bench] saturated bench failed: {exc}")

    # bf16 serving config: encoder compute in bfloat16 (params fp32;
    # training-quality validated on hardware — IMPLEMENTATION_NOTES round 2).
    # Reported separately so the headline value stays fp32 like-for-like.
    sat_bf16_sps = None
    if (
        os.environ.get("BENCH_SATURATED", "1") == "1"
        and os.environ.get("BENCH_BF16_SERVING", "1") == "1"
        and not over_budget("bf16 serving config")
    ):
        try:
            sat_bf16_sps, _ = bench_jax(batch=SAT_BATCH, bf16=True)
        except Exception as exc:
            log(f"[bench] bf16 serving bench failed: {exc}")

    # Best production stack: bf16 + folded tail (+ Pallas, the default) —
    # the MMF_TPU_SERVING=1 configuration. Stacked encoders are excluded:
    # measured regression (see the A/B above).
    sat_best_sps = None
    if (
        os.environ.get("BENCH_SATURATED", "1") == "1"
        and os.environ.get("BENCH_BEST_SERVING", "1") == "1"
        and not over_budget("best serving config")
    ):
        try:
            sat_best_sps, _ = bench_jax(batch=SAT_BATCH, bf16=True, fold=True)
        except Exception as exc:
            log(f"[bench] best serving bench failed: {exc}")

    # Single-stream serving latency: ONE trajectory (N=1) under the
    # production stack. Production serving cares about this tail as much
    # as saturated throughput; the chained timer amortizes the ~30ms
    # tunnel RTT so per-step device latency = time / (T * CHAIN).
    latency_us = None
    # The measured N=1 config is recorded in the JSON line (latency_n1_prng /
    # latency_n1_unroll) so round-over-round consumers can tell a PRNG- or
    # unroll-config change from a same-program perf win (advisor r4), and so
    # README/docs/BENCH all quote one canonical, labeled number.
    lat_prng, lat_unroll, lat_fused = None, None, None
    if (
        os.environ.get("BENCH_LATENCY", "1") == "1"
        and not over_budget("N=1 latency config")
    ):
        try:
            # Round-5 N=1 serving stack: the fused whole-trajectory Pallas
            # step kernel (ops/pallas_fused_step.py) + the default scan
            # hoists. Same-boot A/B battery (scripts/ab_hoist_n1.py):
            # round-4 state 37.7 us/step -> 28.8 with the hoists ->
            # ~25-26 fused, all with reference-stream threefry — the
            # hoists moved RNG out of the loop, so the round-4 unsafe_rbg
            # default is no longer needed (29.7 rbg vs 28.8 threefry) and
            # the canonical config is PRNG-caveat-free. BENCH_FUSED_N1=0
            # restores the scan path; BENCH_RBG_N1=1 / BENCH_UNROLL_N1=k
            # re-enable the old knobs for comparison runs.
            import jax as _jax

            use_rbg = os.environ.get("BENCH_RBG_N1", "0") == "1"
            use_fused = os.environ.get("BENCH_FUSED_N1", "1") == "1"
            prev_impl = _jax.config.jax_default_prng_impl
            lat_prng = "unsafe_rbg" if use_rbg else "threefry"
            lat_unroll = int(
                os.environ.get("BENCH_UNROLL_N1", "1" if use_fused else "10")
            )
            lat_fused = use_fused
            if use_rbg:
                _jax.config.update("jax_default_prng_impl", "unsafe_rbg")
                log("[bench] N=1 config: unsafe_rbg PRNG (comparison mode)")
            try:
                lat_sps, _ = bench_jax(
                    batch=1, bf16=True, fold=True, unroll=lat_unroll,
                    fused=use_fused,
                )
            finally:
                if use_rbg:
                    _jax.config.update("jax_default_prng_impl", prev_impl)
            latency_us = 1e6 / lat_sps
            log(
                f"[bench] single-stream latency: {latency_us:.1f} us / "
                "filter-step (N=1, production stack)"
            )
        except Exception as exc:
            log(f"[bench] latency bench failed: {exc}")

    # N=1 latency for the OTHER flagship family — the crossmodal KF
    # (round-5 EKF scan levers: hoist_ctrl + stack_children, both default
    # ON; same-boot A/B in scripts/bench_kf_n1.py put this at 26.4 us vs
    # 34.0 before). BENCH_KF_LATENCY=0 skips.
    kf_latency_us = None
    if (
        os.environ.get("BENCH_KF_LATENCY", "1") == "1"
        and not over_budget("CMEKF N=1 latency config")
    ):
        try:
            kf_sps = bench_kf_jax(batch=1)
            kf_latency_us = 1e6 / kf_sps
            log(
                f"[bench] single-stream latency: {kf_latency_us:.1f} us / "
                "filter-step (N=1, crossmodal KF)"
            )
        except Exception as exc:
            log(f"[bench] kf latency bench failed: {exc}")

    train_sps = None
    if not over_budget("train bench"):
        try:
            train_sps, _ = bench_train()
        except Exception as exc:
            log(f"[bench] train bench failed: {exc}")
    # Saturated training config (B=512, bf16 encoders — RMSE-parity
    # validated): the production-throughput analog of value_saturated, with
    # its cost-analysis MFU (fwd+bwd+opt FLOPs — VERDICT r2 next #10).
    # B=512 is the measured train-side saturation point (round-3 sweep,
    # benchmarks/train_sweep.py: 102k @B=256, 110k @512, 108k @1024 —
    # reproduced twice, no OOM at any size).
    train_sat_sps, train_mfu = None, None
    if (
        os.environ.get("BENCH_TRAIN_SATURATED", "1") == "1"
        and not over_budget("saturated train bench")
    ):
        try:
            train_sat_sps, train_flops = bench_train(
                batch=512, bf16=True, measure_flops=True
            )
            if train_flops:
                train_mfu = train_sat_sps * train_flops / PEAK_FLOPS
                log(
                    f"[bench] train MFU (B=512 bf16): {train_mfu * 100:.2f}% "
                    f"of {PEAK_FLOPS / 1e12:.0f} TFLOP/s peak"
                )
        except Exception as exc:
            log(f"[bench] saturated train bench failed: {exc}")

    # Stacked multi-instance encoders (VERDICT r2 next #1) — the A/B that
    # REFUTED the hypothesis: stacking regresses every measured regime
    # (bf16 N=512: 474k -> 323k; fp32/bf16 N=16: -22%/-13%; fp32 N>=256
    # OOMs at 31.5G — XLA expands grouped convs to block-diagonal full
    # convs and the live activation set doubles). This config keeps the
    # refutation measured per round; BENCH_STACK=0 skips it. It runs LAST,
    # after every headline serving + train config, so budget pressure never
    # sacrifices a headline number to a known-regressing experiment.
    sat_stack_sps = None
    if (
        os.environ.get("BENCH_SATURATED", "1") == "1"
        and os.environ.get("BENCH_STACK", "1") == "1"
        and not over_budget("stacked A/B config")
    ):
        try:
            sat_stack_sps, _ = bench_jax(
                batch=SAT_BATCH, bf16=True, fold=True, stack=True
            )
        except Exception as exc:
            log(f"[bench] stacked A/B bench failed: {exc}")

    try:
        torch_live_sps = bench_torch()
    except Exception as exc:  # torch baseline is best-effort
        log(f"[bench] torch baseline failed: {exc}")
        torch_live_sps = None
    # vs_baseline divides by the PINNED baseline (stable across rounds);
    # the live re-measure is reported alongside for drift visibility.
    torch_pinned_sps = pinned_baseline(torch_live_sps)
    vs_baseline = (jax_sps / torch_pinned_sps) if torch_pinned_sps else None
    vs_baseline_live = (jax_sps / torch_live_sps) if torch_live_sps else None
    # Honest-host framing (VERDICT r4 weak #2): the pin is measured on THIS
    # host's CPUs (1 on this box — torch gets no multi-core help), so the
    # headline ratio flatters vs a production-grade host. Report the pin's
    # core count and a linear extrapolation to an 8-core torch host so the
    # JSON line carries both framings.
    baseline_cpus = None
    try:
        with open(_PIN_PATH) as f:
            baseline_cpus = json.load(f).get("host", {}).get("cpu_count")
    except Exception:
        pass
    if baseline_cpus is None:
        baseline_cpus = os.cpu_count()
    vs_baseline_per_8core = (
        vs_baseline * baseline_cpus / 8.0
        if (vs_baseline and baseline_cpus)
        else None
    )
    _result_emitted.set()  # disarm the watchdog — real result follows
    print(
        json.dumps(
            {
                "metric": "filter_steps_per_sec_per_chip",
                "value": round(jax_sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "vs_baseline_live": (
                    round(vs_baseline_live, 2) if vs_baseline_live else None
                ),
                "baseline_pinned_steps_per_sec": (
                    round(torch_pinned_sps, 1) if torch_pinned_sps else None
                ),
                "baseline_live_steps_per_sec": (
                    round(torch_live_sps, 1) if torch_live_sps else None
                ),
                "baseline_host_cpus": baseline_cpus,
                # vs_baseline extrapolated to an 8-core torch host (linear
                # core scaling assumed — generous to torch).
                "vs_baseline_per_8core": (
                    round(vs_baseline_per_8core, 2)
                    if vs_baseline_per_8core
                    else None
                ),
                "value_saturated": round(sat_sps, 1) if sat_sps else None,
                "saturated_batch": SAT_BATCH if sat_sps else None,
                # bf16+fold+STACKED A/B vs value_saturated_best (bf16+fold):
                # the recorded refutation of multi-instance stacking.
                "value_saturated_stacked_bf16": (
                    round(sat_stack_sps, 1) if sat_stack_sps else None
                ),
                "value_saturated_bf16": (
                    round(sat_bf16_sps, 1) if sat_bf16_sps else None
                ),
                "value_saturated_best": (
                    round(sat_best_sps, 1) if sat_best_sps else None
                ),
                "mfu": round(mfu, 4) if mfu else None,
                "latency_us_per_step_n1": (
                    round(latency_us, 1) if latency_us else None
                ),
                # Canonical N=1 config labels (bf16+fold+Pallas always on for
                # this figure); README/docs quote THIS number + config.
                "latency_n1_prng": lat_prng if latency_us else None,
                "latency_n1_unroll": lat_unroll if latency_us else None,
                "latency_n1_fused": lat_fused if latency_us else None,
                # The crossmodal-KF flagship's N=1 latency (bf16+fold,
                # unroll=10, hoist_ctrl+stack_children default ON).
                "latency_us_per_step_n1_cmekf": (
                    round(kf_latency_us, 1) if kf_latency_us else None
                ),
                "train_steps_per_sec": round(train_sps, 1) if train_sps else None,
                "train_steps_per_sec_saturated_bf16": (
                    round(train_sat_sps, 1) if train_sat_sps else None
                ),
                "train_mfu": round(train_mfu, 4) if train_mfu else None,
            }
        )
    )


if __name__ == "__main__":
    main()
