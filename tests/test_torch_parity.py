"""Numerical parity vs PyTorch: copy flax weights into architecture-
equivalent torch modules and compare outputs within fp32 tolerance
(BASELINE.md: "matching torch checkpoints bit-for-bit within fp32
tolerance" — validated constructively, since no reference checkpoints exist
in-tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from multimodalfilter_tpu.models import (
    DynamicsNet,
    ImageEncoder,
    LinearResblock,
    MLPEncoder,
)

torch.set_grad_enabled(False)


def t(x):
    return torch.from_numpy(np.asarray(x))


def copy_dense(params, linear: nn.Linear):
    linear.weight.copy_(t(params["kernel"]).T)
    linear.bias.copy_(t(params["bias"]))


def copy_conv(params, conv: nn.Conv2d):
    # flax kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
    linear_kernel = np.asarray(params["kernel"]).transpose(3, 2, 0, 1)
    conv.weight.copy_(torch.from_numpy(linear_kernel))
    conv.bias.copy_(t(params["bias"]))


class TorchResblock(nn.Module):
    def __init__(self, units):
        super().__init__()
        self.block1 = nn.Linear(units, units)
        self.block2 = nn.Linear(units, units)

    def forward(self, x):
        return x + torch.relu(self.block2(torch.relu(self.block1(x))))


def copy_resblock(params, block: TorchResblock):
    copy_dense(params["block1"], block.block1)
    copy_dense(params["block2"], block.block2)


def test_linear_resblock_parity():
    units = 16
    module = LinearResblock(units)
    x = np.random.default_rng(0).normal(size=(4, units)).astype(np.float32)
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out_jax = np.asarray(module.apply({"params": params}, jnp.asarray(x)))

    torch_block = TorchResblock(units)
    copy_resblock(params, torch_block)
    out_torch = torch_block(t(x)).numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-5, atol=1e-6)


def test_mlp_encoder_parity():
    units, in_dim = 32, 7
    module = MLPEncoder(units)
    x = np.random.default_rng(1).normal(size=(5, in_dim)).astype(np.float32)
    params = module.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    out_jax = np.asarray(module.apply({"params": params}, jnp.asarray(x)))

    dense = nn.Linear(in_dim, units)
    copy_dense(params["dense"], dense)
    resblock = TorchResblock(units)
    copy_resblock(params["resblock"], resblock)
    out_torch = resblock(torch.relu(dense(t(x)))).numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-5, atol=1e-6)


class TorchConvResblock(nn.Module):
    def __init__(self, ch, k=3):
        super().__init__()
        self.block1 = nn.Conv2d(ch, ch, k, padding=k // 2)
        self.block2 = nn.Conv2d(ch, ch, k, padding=k // 2)

    def forward(self, x):
        return x + torch.relu(self.block2(torch.relu(self.block1(x))))


@pytest.mark.parametrize("spanning", [False, True])
def test_image_encoder_parity(spanning):
    units = 24
    module = ImageEncoder(units, spanning_avg_pool=spanning)
    images = np.random.default_rng(2).normal(size=(3, 32, 32)).astype(np.float32)
    params = module.init(jax.random.PRNGKey(2), jnp.asarray(images))["params"]
    out_jax = np.asarray(module.apply({"params": params}, jnp.asarray(images)))

    conv1 = nn.Conv2d(1, 32, 5, padding=2)
    copy_conv(params["conv1"], conv1)
    resconv = TorchConvResblock(32)
    copy_conv(params["resblock_conv"]["block1"], resconv.block1)
    copy_conv(params["resblock_conv"]["block2"], resconv.block2)
    conv2 = nn.Conv2d(32, 16, 3, padding=1)
    copy_conv(params["conv2"], conv2)
    out_ch = 2 if spanning else 8
    conv3 = nn.Conv2d(16, out_ch, 3, padding=1)
    copy_conv(params["conv3"], conv3)

    x = t(images)[:, None, :, :]
    x = torch.relu(conv1(x))
    x = resconv(x)
    x = torch.relu(conv2(x))
    x = conv3(x)

    if spanning:
        pool_h = nn.AvgPool2d((32, 2))
        pool_w = nn.AvgPool2d((2, 32))
        flat = torch.cat(
            [pool_h(x).flatten(1), pool_w(x).flatten(1)], dim=-1
        ).numpy()
        # flax pools NHWC then flattens (H', W', C); torch flattens (C, H', W').
        n = flat.shape[0]
        h_part = pool_h(x).numpy().reshape(n, out_ch, 16).transpose(0, 2, 1).reshape(n, -1)
        w_part = pool_w(x).numpy().reshape(n, out_ch, 16).transpose(0, 2, 1).reshape(n, -1)
        flat = np.concatenate([h_part, w_part], axis=-1)
    else:
        # flax flattens NHWC (H, W, C); torch NCHW flattens (C, H, W):
        # permute torch activations to NHWC before flattening.
        flat = x.numpy().transpose(0, 2, 3, 1).reshape(x.shape[0], -1)

    dense = nn.Linear(flat.shape[1], units)
    copy_dense(params["dense"], dense)
    resblock = TorchResblock(units)
    copy_resblock(params["resblock"], resblock)
    out_torch = resblock(torch.relu(dense(torch.from_numpy(flat)))).numpy()
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-4, atol=1e-5)


def test_dynamics_net_parity():
    """Full dynamics model: gated residual update + constant Q
    (reference crossmodal/door_models/dynamics.py:37-67)."""
    units, state_dim, control_dim = 16, 3, 7
    q_diag = (0.1, 0.2, 0.3)
    module = DynamicsNet(state_dim=state_dim, q_scale_tril_diag=q_diag, units=units)
    rng = np.random.default_rng(3)
    s = rng.normal(size=(4, state_dim)).astype(np.float32)
    c = rng.normal(size=(4, control_dim)).astype(np.float32)
    params = module.init(jax.random.PRNGKey(3), jnp.asarray(s), jnp.asarray(c))[
        "params"
    ]
    new_jax, tril_jax = module.apply(
        {"params": params}, jnp.asarray(s), jnp.asarray(c)
    )

    def torch_mlp_encoder(p, in_dim):
        dense = nn.Linear(in_dim, units)
        copy_dense(p["dense"], dense)
        resblock = TorchResblock(units)
        copy_resblock(p["resblock"], resblock)
        return lambda x: resblock(torch.relu(dense(x)))

    state_enc = torch_mlp_encoder(params["state_layers"], state_dim)
    ctrl_enc = torch_mlp_encoder(params["control_layers"], control_dim)
    dense_in = nn.Linear(units * 2, units)
    copy_dense(params["shared_dense_in"], dense_in)
    blocks = []
    for i in range(3):
        b = TorchResblock(units)
        copy_resblock(params[f"shared_resblock{i}"], b)
        blocks.append(b)
    dense_out = nn.Linear(units, state_dim + 1)
    copy_dense(params["shared_dense_out"], dense_out)

    merged = torch.cat([ctrl_enc(t(c)), state_enc(t(s))], dim=-1)
    h = dense_in(merged)
    for b in blocks:
        h = b(h)
    h = dense_out(h)
    direction = h[..., :state_dim]
    gate = torch.sigmoid(h[..., -1:])
    new_torch = (t(s) + direction * gate).numpy()

    np.testing.assert_allclose(np.asarray(new_jax), new_torch, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(tril_jax[0]), np.diag(q_diag).astype(np.float32), rtol=1e-6
    )


# ---------------------------------------------------------------------------
# Full task-net parity: measurement model + gates (obs encoders + trunks)
# ---------------------------------------------------------------------------


def _torch_mlp_encoder(params, in_dim, units):
    dense = nn.Linear(in_dim, units)
    copy_dense(params["dense"], dense)
    resblock = TorchResblock(units)
    copy_resblock(params["resblock"], resblock)
    return lambda x: resblock(torch.relu(dense(x)))


def _torch_image_encoder(params, units):
    conv1 = nn.Conv2d(1, 32, 5, padding=2)
    copy_conv(params["conv1"], conv1)
    resconv = TorchConvResblock(32)
    copy_conv(params["resblock_conv"]["block1"], resconv.block1)
    copy_conv(params["resblock_conv"]["block2"], resconv.block2)
    conv2 = nn.Conv2d(32, 16, 3, padding=1)
    copy_conv(params["conv2"], conv2)
    conv3 = nn.Conv2d(16, 8, 3, padding=1)
    copy_conv(params["conv3"], conv3)
    dense = nn.Linear(8192, units)
    copy_dense(params["dense"], dense)
    resblock = TorchResblock(units)
    copy_resblock(params["resblock"], resblock)

    def forward(images):
        x = images[:, None, :, :]
        x = torch.relu(conv1(x))
        x = resconv(x)
        x = torch.relu(conv2(x))
        x = conv3(x)
        # flax flattens NHWC; permute torch NCHW activations to match.
        flat = torch.from_numpy(
            x.numpy().transpose(0, 2, 3, 1).reshape(x.shape[0], -1)
        )
        return resblock(torch.relu(dense(flat)))

    return forward


def _obs_features_torch(params, obs, units):
    img = _torch_image_encoder(params["observation_image_layers"], units)
    pos = _torch_mlp_encoder(params["observation_pos_layers"], 3, units)
    sens = _torch_mlp_encoder(params["observation_sensors_layers"], 7, units)
    return torch.cat(
        [img(t(obs["image"])), pos(t(obs["gripper_pos"])),
         sens(t(obs["gripper_sensors"]))],
        dim=-1,
    )


def _dummy_obs(n=3, seed=10):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(size=(n, 32, 32)).astype(np.float32),
        "gripper_pos": rng.normal(size=(n, 3)).astype(np.float32),
        "gripper_sensors": rng.normal(size=(n, 7)).astype(np.float32),
    }


def test_log_likelihood_net_parity():
    """Full PF measurement model (reference door pf.py:63-107): obs encoders
    broadcast over particles + state trunk -> per-particle log-liks."""
    from multimodalfilter_tpu.models import LogLikelihoodNet

    units, n, m = 32, 3, 5
    net = LogLikelihoodNet(3, ("image", "pos", "sensors"), units)
    obs = _dummy_obs(n)
    states = np.random.default_rng(11).normal(size=(n, m, 3)).astype(np.float32)
    params = net.init(
        jax.random.PRNGKey(7), jnp.asarray(states),
        {k: jnp.asarray(v) for k, v in obs.items()},
    )["params"]
    out_jax = np.asarray(
        net.apply({"params": params}, jnp.asarray(states),
                  {k: jnp.asarray(v) for k, v in obs.items()})
    )

    obs_feat = _obs_features_torch(params["obs_encoders"], obs, units)
    state_enc = _torch_mlp_encoder(params["state_layers"], 3, units)
    dense_in = nn.Linear(units * 4, units)
    copy_dense(params["shared_dense_in"], dense_in)
    rb0, rb1 = TorchResblock(units), TorchResblock(units)
    copy_resblock(params["shared_resblock0"], rb0)
    copy_resblock(params["shared_resblock1"], rb1)
    dense_out = nn.Linear(units, 1)
    copy_dense(params["shared_dense_out"], dense_out)

    obs_b = obs_feat[:, None, :].expand(n, m, units * 3)
    merged = torch.cat([obs_b, state_enc(t(states))], dim=-1)
    out_torch = dense_out(rb1(rb0(torch.relu(dense_in(merged))))).squeeze(-1)
    np.testing.assert_allclose(out_jax, out_torch.numpy(), rtol=2e-4, atol=1e-5)


def test_pf_weight_net_parity():
    """PF gate (reference door crossmodal_pf.py:74-96)."""
    from multimodalfilter_tpu.models import PFWeightNet

    units, n = 32, 3
    net = PFWeightNet(modality_count=2, units=units, num_fusion_resblocks=3)
    obs = _dummy_obs(n, seed=12)
    params = net.init(
        jax.random.PRNGKey(8), {k: jnp.asarray(v) for k, v in obs.items()}
    )["params"]
    out_jax = np.asarray(
        net.apply({"params": params}, {k: jnp.asarray(v) for k, v in obs.items()})
    )

    obs_feat = _obs_features_torch(params["obs_encoders"], obs, units)
    dense_in = nn.Linear(units * 3, units)
    copy_dense(params["fusion_dense_in"], dense_in)
    blocks = []
    for i in range(3):
        b = TorchResblock(units)
        copy_resblock(params[f"fusion_resblock{i}"], b)
        blocks.append(b)
    dense_out = nn.Linear(units, 2)
    copy_dense(params["fusion_dense_out"], dense_out)
    h = torch.relu(dense_in(obs_feat))
    for b in blocks:
        h = b(h)
    out_torch = dense_out(h)
    np.testing.assert_allclose(out_jax, out_torch.numpy(), rtol=2e-4, atol=1e-5)


def test_virtual_sensor_net_parity():
    """Virtual sensor (reference door kf.py:81-126): shared trunk split into
    z/r heads; cov = diag(lt)^2 + add_R_noise*I; returns sqrt(cov)."""
    from multimodalfilter_tpu.models import VirtualSensorNet

    units, n = 32, 3
    net = VirtualSensorNet(3, ("image", "pos", "sensors"), units, add_R_noise=1e-6)
    obs = _dummy_obs(n, seed=13)
    params = net.init(
        jax.random.PRNGKey(9), {k: jnp.asarray(v) for k, v in obs.items()}
    )["params"]
    z_jax, tril_jax = net.apply(
        {"params": params}, {k: jnp.asarray(v) for k, v in obs.items()}
    )

    obs_feat = _obs_features_torch(params["obs_encoders"], obs, units)
    dense_in = nn.Linear(units * 3, units * 2)
    copy_dense(params["shared_dense_in"], dense_in)
    rb0, rb1 = TorchResblock(units * 2), TorchResblock(units * 2)
    copy_resblock(params["shared_resblock0"], rb0)
    copy_resblock(params["shared_resblock1"], rb1)

    def head(prefix, x):
        d_in = nn.Linear(units, 3)
        copy_dense(params[f"{prefix}_dense_in"], d_in)
        rb = TorchResblock(3)
        copy_resblock(params[f"{prefix}_resblock"], rb)
        d_out = nn.Linear(3, 3)
        copy_dense(params[f"{prefix}_dense_out"], d_out)
        return d_out(rb(torch.relu(d_in(x))))

    shared = rb1(rb0(torch.relu(dense_in(obs_feat))))
    z_torch = head("z_layer", shared[:, :units])
    lt_hat = head("r_layer", shared[:, units:])
    cov_diag = lt_hat**2 + 1e-6
    tril_torch = torch.diag_embed(torch.sqrt(cov_diag))

    np.testing.assert_allclose(np.asarray(z_jax), z_torch.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tril_jax), tril_torch.numpy(), rtol=2e-4, atol=1e-5
    )
