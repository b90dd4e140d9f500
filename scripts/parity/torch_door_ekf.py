"""Reference-faithful PyTorch Door EKF training path, for training-dynamics
parity checks against the JAX framework (VERDICT r4 missing #1).

This is a torch mirror of the pieces the reference composes for
``DoorKalmanFilter`` (reference crossmodal/door_models/{dynamics.py:11-67,
kf.py:31-126,14-28} + torchfilter's VirtualSensorExtendedKalmanFilter +
torchfilter.train loops as used by crossmodal/train_helpers.py): the same
architecture, the same losses, the same Adam(1e-4), and — deliberately —
the same epoch/batch index streams as multimodalfilter_tpu/train/loops.py
(both sides seed their shuffles from the cumulative optimizer-step count),
so on identical synthetic data with identical copied initial weights the two
frameworks' training trajectories are directly comparable: the only
divergence sources left are framework fp arithmetic and Adam numerics.

Weights are COPIED from the JAX model at t=0 (flax kernels transposed, CNN
flatten order permuted — the same mapping experiments/torch_import.py uses
in the other direction), so both frameworks descend from one initial point.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import torch
import torch.nn as nn

LR = 1e-4  # fannypack Buddy's Adam default (train/optim.py mirrors it)


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x))


# ---------------------------------------------------------------------------
# Torch modules mirroring the flax nets (models/{encoders,task_nets}.py)
# ---------------------------------------------------------------------------


class Resblock(nn.Module):
    def __init__(self, units):
        super().__init__()
        self.block1 = nn.Linear(units, units)
        self.block2 = nn.Linear(units, units)

    def forward(self, x):
        return x + torch.relu(self.block2(torch.relu(self.block1(x))))


class ConvResblock(nn.Module):
    def __init__(self, ch, k=3):
        super().__init__()
        self.block1 = nn.Conv2d(ch, ch, k, padding=k // 2)
        self.block2 = nn.Conv2d(ch, ch, k, padding=k // 2)

    def forward(self, x):
        return x + torch.relu(self.block2(torch.relu(self.block1(x))))


class MLPEncoder(nn.Module):
    def __init__(self, in_dim, units):
        super().__init__()
        self.dense = nn.Linear(in_dim, units)
        self.resblock = Resblock(units)

    def forward(self, x):
        return self.resblock(torch.relu(self.dense(x)))


class ImageEncoder(nn.Module):
    """Door image CNN (reference door layers.py:43-63)."""

    def __init__(self, units):
        super().__init__()
        self.conv1 = nn.Conv2d(1, 32, 5, padding=2)
        self.resblock_conv = ConvResblock(32)
        self.conv2 = nn.Conv2d(32, 16, 3, padding=1)
        self.conv3 = nn.Conv2d(16, 8, 3, padding=1)
        self.dense = nn.Linear(8192, units)
        self.resblock = Resblock(units)

    def forward(self, images):
        x = images[:, None, :, :]
        x = torch.relu(self.conv1(x))
        x = self.resblock_conv(x)
        x = torch.relu(self.conv2(x))
        x = self.conv3(x)
        # flax flattens NHWC; permute NCHW activations to match.
        flat = x.permute(0, 2, 3, 1).reshape(x.shape[0], -1)
        return self.resblock(torch.relu(self.dense(flat)))


class DynamicsModel(nn.Module):
    """Gated residual dynamics + constant diagonal Q (reference
    dynamics.py:11-67; Q = chol(diag(.05, .01, .01)))."""

    def __init__(self, state_dim=3, control_dim=7, units=64,
                 q_diag=(0.05, 0.01, 0.01)):
        super().__init__()
        self.state_dim = state_dim
        self.state_layers = MLPEncoder(state_dim, units)
        self.control_layers = MLPEncoder(control_dim, units)
        self.shared_dense_in = nn.Linear(units * 2, units)
        self.shared_resblocks = nn.ModuleList([Resblock(units) for _ in range(3)])
        self.shared_dense_out = nn.Linear(units, state_dim + 1)
        self.register_buffer(
            "q_tril", torch.diag(torch.sqrt(torch.tensor(q_diag))).float()
        )

    def forward(self, states, controls):
        merged = torch.cat(
            [self.control_layers(controls), self.state_layers(states)], dim=-1
        )
        h = self.shared_dense_in(merged)
        for b in self.shared_resblocks:
            h = b(h)
        h = self.shared_dense_out(h)
        direction = h[..., : self.state_dim]
        gate = torch.sigmoid(h[..., -1:])
        new = states + direction * gate
        tril = self.q_tril.expand(states.shape[0], -1, -1)
        return new, tril

    def forward_loop(self, initial_states, controls_seq):
        """(L-1, B, C) controls -> (L-1, B, D) rollout (no noise — the MSE
        rollout loss, reference torchfilter train_dynamics_recurrent)."""
        s = initial_states
        outs = []
        for i in range(controls_seq.shape[0]):
            s, _ = self.forward(s, controls_seq[i])
            outs.append(s)
        return torch.stack(outs, dim=0)


class VirtualSensorModel(nn.Module):
    """Door virtual sensor (reference kf.py:31-126): obs encoders -> shared
    trunk (2u) -> z/r heads; cov = lt^2 + add_R_noise, scale_tril = sqrt."""

    def __init__(self, state_dim=3, units=64, add_R_noise=1e-6):
        super().__init__()
        self.state_dim = state_dim
        self.units = units
        self.add_R_noise = add_R_noise
        self.image_enc = ImageEncoder(units)
        self.pos_enc = MLPEncoder(3, units)
        self.sensors_enc = MLPEncoder(7, units)
        self.shared_dense_in = nn.Linear(units * 3, units * 2)
        self.shared_resblock0 = Resblock(units * 2)
        self.shared_resblock1 = Resblock(units * 2)

        def head():
            return nn.ModuleDict(
                {
                    "dense_in": nn.Linear(units, state_dim),
                    "resblock": Resblock(state_dim),
                    "dense_out": nn.Linear(state_dim, state_dim),
                }
            )

        self.z_layer = head()
        self.r_layer = head()

    def _head(self, head, x):
        return head["dense_out"](head["resblock"](torch.relu(head["dense_in"](x))))

    def forward(self, obs: Dict[str, torch.Tensor]):
        feats = torch.cat(
            [
                self.image_enc(obs["image"]),
                self.pos_enc(obs["gripper_pos"]),
                self.sensors_enc(obs["gripper_sensors"]),
            ],
            dim=-1,
        )
        shared = self.shared_resblock1(
            self.shared_resblock0(torch.relu(self.shared_dense_in(feats)))
        )
        z = self._head(self.z_layer, shared[:, : self.units])
        lt_hat = self._head(self.r_layer, shared[:, self.units :])
        cov_diag = lt_hat**2 + self.add_R_noise
        tril = torch.diag_embed(torch.sqrt(cov_diag))
        return z, tril


class DoorEKF(nn.Module):
    """torchfilter.filters.VirtualSensorExtendedKalmanFilter equivalent:
    predict via the autograd dynamics Jacobian, identity-observation update
    via a Cholesky solve — the same algebra as filtering/ekf.py."""

    def __init__(self, units=64):
        super().__init__()
        self.state_dim = 3
        self.dynamics_model = DynamicsModel(units=units)
        self.virtual_sensor_model = VirtualSensorModel(units=units)

    def predict(self, mean, cov, controls):
        from torch.func import jacrev, vmap

        def mean_fn(s, c):
            new, tril = self.dynamics_model(s[None], c[None])
            return new[0], (new[0], tril[0])

        f, (pred_mean, q_tril) = vmap(jacrev(mean_fn, has_aux=True))(
            mean, controls
        )
        q = q_tril @ q_tril.transpose(-1, -2)
        pred_cov = f @ cov @ f.transpose(-1, -2) + q
        return pred_mean, pred_cov

    @staticmethod
    def kalman_update(pred_mean, pred_cov, z, r_tril):
        r = r_tril @ r_tril.transpose(-1, -2)
        s = pred_cov + r
        chol = torch.linalg.cholesky(s)
        k = torch.cholesky_solve(pred_cov, chol).transpose(-1, -2)
        mean = pred_mean + torch.einsum("nij,nj->ni", k, z - pred_mean)
        eye = torch.eye(pred_cov.shape[-1], dtype=pred_cov.dtype)
        cov = (eye - k) @ pred_cov
        cov = 0.5 * (cov + cov.transpose(-1, -2))
        return mean, cov

    def step(self, mean, cov, obs, controls):
        z, r_tril = self.virtual_sensor_model(obs)
        pred_mean, pred_cov = self.predict(mean, cov, controls)
        return self.kalman_update(pred_mean, pred_cov, z, r_tril)

    def forward_loop(self, mean, cov, obs_seq, controls_seq):
        """(T, N, ...) sequences -> (T, N, D) estimates. The virtual sensor
        is hoisted into one (T*N) batch, mirroring ekf.py's scan hoist (the
        math is step-identical either way — the sensor is carry-free)."""
        T, N = controls_seq.shape[:2]
        flat_obs = {k: v.reshape((T * N,) + v.shape[2:]) for k, v in obs_seq.items()}
        z, r = self.virtual_sensor_model(flat_obs)
        z = z.reshape(T, N, -1)
        r = r.reshape(T, N, self.state_dim, self.state_dim)
        outs = []
        for i in range(T):
            pred_mean, pred_cov = self.predict(mean, cov, controls_seq[i])
            mean, cov = self.kalman_update(pred_mean, pred_cov, z[i], r[i])
            outs.append(mean)
        return mean, cov, torch.stack(outs, dim=0)


# ---------------------------------------------------------------------------
# Weight copy from the JAX model (flax param dict -> torch modules)
# ---------------------------------------------------------------------------


def _copy_dense(p, linear: nn.Linear):
    with torch.no_grad():
        linear.weight.copy_(t(p["kernel"]).T)
        linear.bias.copy_(t(p["bias"]))


def _copy_conv(p, conv: nn.Conv2d):
    with torch.no_grad():
        conv.weight.copy_(t(np.asarray(p["kernel"]).transpose(3, 2, 0, 1)))
        conv.bias.copy_(t(p["bias"]))


def _copy_resblock(p, block: Resblock):
    _copy_dense(p["block1"], block.block1)
    _copy_dense(p["block2"], block.block2)


def _copy_mlp_encoder(p, enc: MLPEncoder):
    _copy_dense(p["dense"], enc.dense)
    _copy_resblock(p["resblock"], enc.resblock)


def _copy_image_encoder(p, enc: ImageEncoder):
    _copy_conv(p["conv1"], enc.conv1)
    _copy_conv(p["resblock_conv"]["block1"], enc.resblock_conv.block1)
    _copy_conv(p["resblock_conv"]["block2"], enc.resblock_conv.block2)
    _copy_conv(p["conv2"], enc.conv2)
    _copy_conv(p["conv3"], enc.conv3)
    _copy_dense(p["dense"], enc.dense)
    _copy_resblock(p["resblock"], enc.resblock)


def copy_from_jax(model: DoorEKF, jax_params) -> None:
    """Copy a JAX DoorKalmanFilter's params into the torch mirror."""
    dp = jax_params["dynamics_model"]
    dyn = model.dynamics_model
    _copy_mlp_encoder(dp["state_layers"], dyn.state_layers)
    _copy_mlp_encoder(dp["control_layers"], dyn.control_layers)
    _copy_dense(dp["shared_dense_in"], dyn.shared_dense_in)
    for i in range(3):
        _copy_resblock(dp[f"shared_resblock{i}"], dyn.shared_resblocks[i])
    _copy_dense(dp["shared_dense_out"], dyn.shared_dense_out)

    vp = jax_params["virtual_sensor_model"]
    vs = model.virtual_sensor_model
    enc = vp["obs_encoders"]
    _copy_image_encoder(enc["observation_image_layers"], vs.image_enc)
    _copy_mlp_encoder(enc["observation_pos_layers"], vs.pos_enc)
    _copy_mlp_encoder(enc["observation_sensors_layers"], vs.sensors_enc)
    _copy_dense(vp["shared_dense_in"], vs.shared_dense_in)
    _copy_resblock(vp["shared_resblock0"], vs.shared_resblock0)
    _copy_resblock(vp["shared_resblock1"], vs.shared_resblock1)
    for prefix, head in (("z_layer", vs.z_layer), ("r_layer", vs.r_layer)):
        _copy_dense(vp[f"{prefix}_dense_in"], head["dense_in"])
        _copy_resblock(vp[f"{prefix}_resblock"], head["resblock"])
        _copy_dense(vp[f"{prefix}_dense_out"], head["dense_out"])


# ---------------------------------------------------------------------------
# Training loops (mirror of multimodalfilter_tpu/train/loops.py schedules)
# ---------------------------------------------------------------------------


class TorchTrainer:
    """Named-Adam trainer whose epoch/batch index streams replicate
    train/loops.py exactly: shuffles seeded from the cumulative
    optimizer-step count, partial final batches dropped."""

    def __init__(self, model: DoorEKF):
        self.model = model
        self.optimizer_steps = 0
        self._optimizers: Dict[str, torch.optim.Adam] = {}
        self.frozen: List[nn.Module] = []

    def _opt(self, name):
        if name not in self._optimizers:
            self._optimizers[name] = torch.optim.Adam(
                self.model.parameters(), lr=LR
            )
        return self._optimizers[name]

    def freeze(self, module: nn.Module):
        self.frozen.append(module)

    def _epoch_index_matrix(self, rng, n, batch_size):
        perm = rng.permutation(n)
        num_batches = n // batch_size
        assert num_batches > 0
        return perm[: num_batches * batch_size].reshape(num_batches, batch_size)

    def _run_epochs(self, loss_for_batch, n, *, epochs, batch_size, opt_name):
        opt = self._opt(opt_name)
        rng = np.random.default_rng(self.optimizer_steps + 1)
        last = None
        for _ in range(epochs):
            idx_matrix = self._epoch_index_matrix(rng, n, batch_size)
            losses = []
            for idx in idx_matrix:
                opt.zero_grad(set_to_none=True)
                loss = loss_for_batch(idx)
                loss.backward()
                # Frozen modules: grads zeroed before the step (loops.py
                # zero_frozen_grads equivalent — with a fresh Adam state the
                # frozen subtree receives exactly zero updates).
                for mod in self.frozen:
                    for p in mod.parameters():
                        p.grad = None
                opt.step()
                losses.append(float(loss.detach()))
            self.optimizer_steps += len(idx_matrix)
            last = float(np.mean(losses))
        return last

    # -- the four primitives the EKF curriculum uses -----------------------

    def train_dynamics_single_step(self, dataset, *, epochs, batch_size=32):
        prev = t(dataset.previous_states)
        nxt = t(dataset.states)
        ctrl = t(dataset.controls)

        def loss(idx):
            pred, _ = self.model.dynamics_model(prev[idx], ctrl[idx])
            return torch.mean((pred - nxt[idx]) ** 2)

        return self._run_epochs(
            loss, len(dataset), epochs=epochs, batch_size=batch_size,
            opt_name="train_dynamics_single_step",
        )

    def train_dynamics_recurrent(self, dataset, *, epochs, batch_size=32):
        states = t(dataset.states)
        ctrl = t(dataset.controls)

        def loss(idx):
            s = states[idx].transpose(0, 1)  # (L, B, D)
            c = ctrl[idx].transpose(0, 1)
            pred = self.model.dynamics_model.forward_loop(s[0], c[1:])
            return torch.mean((pred - s[1:]) ** 2)

        return self._run_epochs(
            loss, len(dataset), epochs=epochs, batch_size=batch_size,
            opt_name="train_dynamics_recurrent",
        )

    def train_virtual_sensor(self, dataset, *, epochs, batch_size=32):
        nxt = t(dataset.states)
        obs = {k: t(v) for k, v in dataset.observations.items()}

        def loss(idx):
            z, _ = self.model.virtual_sensor_model(
                {k: v[idx] for k, v in obs.items()}
            )
            return torch.mean((z - nxt[idx]) ** 2)

        return self._run_epochs(
            loss, len(dataset), epochs=epochs, batch_size=batch_size,
            opt_name="train_virtual_sensor",
        )

    def train_e2e(self, dataset, *, epochs, batch_size=32,
                  initial_cov_scale=0.1, measurement_initialize=False):
        states = t(dataset.states)
        ctrl = t(dataset.controls)
        obs = {k: t(v) for k, v in dataset.observations.items()}

        def loss(idx):
            s = states[idx].transpose(0, 1)  # (L, B, D)
            c = ctrl[idx].transpose(0, 1)
            o = {k: v[idx].transpose(0, 1) for k, v in obs.items()}
            b = s.shape[1]
            if measurement_initialize:
                mean, r_tril = self.model.virtual_sensor_model(
                    {k: v[0] for k, v in o.items()}
                )
                cov = r_tril @ r_tril.transpose(-1, -2)
            else:
                mean = s[0]
                cov = (
                    torch.eye(self.model.state_dim) * initial_cov_scale
                ).expand(b, -1, -1)
            o_rest = {k: v[1:] for k, v in o.items()}
            _, _, est = self.model.forward_loop(mean, cov, o_rest, c[1:])
            return torch.mean((est - s[1:]) ** 2)

        return self._run_epochs(
            loss, len(dataset), epochs=epochs, batch_size=batch_size,
            opt_name="train_filter_recurrent",
        )


# ---------------------------------------------------------------------------
# Eval (the reference RMSE pipeline, torch side)
# ---------------------------------------------------------------------------


def run_eval(model: DoorEKF, trajectories, measurement_initialize=False):
    """Batched eval + door RMSE metrics (reference eval_helpers.py:70-216),
    with the same short-T burn-in fallback as crossmodal._eval_metrics."""
    min_t = min(traj.states.shape[0] for traj in trajectories)
    states = np.stack([traj.states[:min_t] for traj in trajectories], axis=1)
    controls = t(
        np.stack([traj.controls[:min_t] for traj in trajectories], axis=1)
    )
    obs = {
        k: t(np.stack([traj.observations[k][:min_t] for traj in trajectories],
                      axis=1))
        for k in trajectories[0].observations
    }
    T, N = states.shape[:2]
    with torch.no_grad():
        if measurement_initialize:
            mean, r_tril = model.virtual_sensor_model(
                {k: v[0] for k, v in obs.items()}
            )
            cov = r_tril @ r_tril.transpose(-1, -2)
        else:
            mean = t(states[0])
            cov = (torch.eye(model.state_dim) * 0.1).expand(N, -1, -1)
        o_rest = {k: v[1:] for k, v in obs.items()}
        _, _, est = model.forward_loop(mean, cov, o_rest, controls[1:])
    predicted = est.numpy()
    true_states = states[1:]
    trunc = 30 if (T - 1) > 30 else (T - 1) // 2
    per_batch_mse = np.mean(
        (predicted[trunc:] - true_states[trunc:]) ** 2, axis=0
    )
    raw_rmse = np.sqrt(np.mean(per_batch_mse, axis=0))
    rmse = raw_rmse * np.array([0.39479038, 0.05650279, 0.0565098])
    return {
        "raw_rmse": [float(x) for x in raw_rmse],
        "theta_rmse_deg": float(rmse[0] * 180.0 / np.pi),
        "x_rmse_cm": float(rmse[1] * 100.0),
        "y_rmse_cm": float(rmse[2] * 100.0),
    }
