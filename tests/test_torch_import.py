"""Torch checkpoint import: build torch models with the REFERENCE's module
structure (nn.Sequential stacks at the exact indices of crossmodal/
door_models + push_models), convert their state_dicts with
experiments/torch_import.py, and verify the imported params reproduce the
torch outputs — i.e. a user's trained reference checkpoint ports over."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from multimodalfilter_tpu.experiments.torch_import import (
    convert_filter_state_dict,
)

torch.set_grad_enabled(False)
torch.manual_seed(0)

UNITS = 32


class Resblock(nn.Module):
    """fannypack-style residual block (block1/block2 children)."""

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
    # Reference layers.py:20-24: Sequential(Linear, ReLU, resblock).
    return nn.Sequential(nn.Linear(in_dim, UNITS), nn.ReLU(), Resblock(UNITS))


class DualSpanningAvgPool(nn.Module):
    # Reference push layers.py:43-65.
    def __init__(self):
        super().__init__()
        self.pool_h = nn.Sequential(nn.AvgPool2d((32, 2)), nn.Flatten())
        self.pool_w = nn.Sequential(nn.AvgPool2d((2, 32)), nn.Flatten())

    def forward(self, x):
        return torch.cat((self.pool_h(x), self.pool_w(x)), dim=-1)


def image_encoder(spanning=False):
    # Reference door layers.py:52-63 / push layers.py:77-104.
    last = (
        [nn.Conv2d(16, 2, 3, padding=1), DualSpanningAvgPool(), nn.Linear(64, UNITS)]
        if spanning
        else [nn.Conv2d(16, 8, 3, padding=1), nn.Flatten(), nn.Linear(8192, UNITS)]
    )
    return nn.Sequential(
        nn.Conv2d(1, 32, 5, padding=2), nn.ReLU(), ConvResblock(32),
        nn.Conv2d(32, 16, 3, padding=1), nn.ReLU(),
        *last, nn.ReLU(), Resblock(UNITS),
    )


class TorchDynamics(nn.Module):
    # Reference dynamics.py:26-34.
    def __init__(self, state_dim=3):
        super().__init__()
        self.state_dim = state_dim
        self.state_layers = mlp_encoder(state_dim)
        self.control_layers = mlp_encoder(7)
        self.shared_layers = nn.Sequential(
            nn.Linear(UNITS * 2, UNITS), Resblock(UNITS), Resblock(UNITS),
            Resblock(UNITS), nn.Linear(UNITS, state_dim + 1),
        )

    def forward(self, states, controls):
        merged = torch.cat(
            [self.control_layers(controls), self.state_layers(states)], -1
        )
        out = self.shared_layers(merged)
        gate = torch.sigmoid(out[..., -1:])
        return states + out[..., : self.state_dim] * gate


class TorchMeasurement(nn.Module):
    # Reference pf.py:43-59 (all modalities).
    def __init__(self, state_dim=3):
        super().__init__()
        self.observation_image_layers = image_encoder()
        self.observation_pos_layers = mlp_encoder(3)
        self.observation_sensors_layers = mlp_encoder(7)
        self.state_layers = mlp_encoder(state_dim)
        self.shared_layers = nn.Sequential(
            nn.Linear(UNITS * 4, UNITS), nn.ReLU(), Resblock(UNITS),
            Resblock(UNITS), nn.Linear(UNITS, 1),
        )

    def forward(self, states, obs):
        n, m, _ = states.shape
        feats = torch.cat(
            [
                self.observation_image_layers(obs["image"][:, None]),
                self.observation_pos_layers(obs["gripper_pos"]),
                self.observation_sensors_layers(obs["gripper_sensors"]),
            ],
            -1,
        )
        feats = feats[:, None, :].expand(n, m, UNITS * 3)
        merged = torch.cat([feats, self.state_layers(states)], -1)
        return self.shared_layers(merged).squeeze(-1)


class TorchVirtualSensor(nn.Module):
    # Reference kf.py:56-78 (all modalities; optionally spanning pool).
    def __init__(self, state_dim=3, spanning=False):
        super().__init__()
        self.state_dim = state_dim
        self.observation_image_layers = image_encoder(spanning)
        self.observation_pos_layers = mlp_encoder(3)
        self.observation_sensors_layers = mlp_encoder(7)
        self.shared_layers = nn.Sequential(
            nn.Linear(UNITS * 3, UNITS * 2), nn.ReLU(),
            Resblock(UNITS * 2), Resblock(UNITS * 2),
        )
        def head():
            return nn.Sequential(
                nn.Linear(UNITS, state_dim), nn.ReLU(), Resblock(state_dim),
                nn.Linear(state_dim, state_dim),
            )
        self.z_layer = head()
        self.r_layer = head()

    def forward(self, obs):
        feats = torch.cat(
            [
                self.observation_image_layers(obs["image"][:, None]),
                self.observation_pos_layers(obs["gripper_pos"]),
                self.observation_sensors_layers(obs["gripper_sensors"]),
            ],
            -1,
        )
        shared = self.shared_layers(feats)
        z = self.z_layer(shared[:, :UNITS])
        lt_hat = self.r_layer(shared[:, UNITS:])
        cov = torch.diag_embed(lt_hat) ** 2 + 1e-6 * torch.eye(self.state_dim)
        return z, torch.sqrt(cov)


class TorchPFContainer(nn.Module):
    def __init__(self):
        super().__init__()
        self.dynamics_model = TorchDynamics()
        self.measurement_model = TorchMeasurement()


def _obs(n=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": rng.normal(size=(n, 32, 32)).astype(np.float32),
        "gripper_pos": rng.normal(size=(n, 3)).astype(np.float32),
        "gripper_sensors": rng.normal(size=(n, 7)).astype(np.float32),
    }


def _jnp_obs(obs):
    return {k: jnp.asarray(v) for k, v in obs.items()}


def test_import_plain_pf_checkpoint():
    """DoorParticleFilter-shaped torch checkpoint: imported dynamics and
    measurement models reproduce the torch forward passes."""
    from multimodalfilter_tpu.filtering import (
        DynamicsDef,
        MeasurementDef,
        ParticleFilterDef,
    )
    from multimodalfilter_tpu.models import DynamicsNet, LogLikelihoodNet

    defn = ParticleFilterDef(
        dynamics_model=DynamicsDef(
            DynamicsNet(state_dim=3, q_scale_tril_diag=(0.1, 0.1, 0.1), units=UNITS),
            state_dim=3,
        ),
        measurement_model=MeasurementDef(
            LogLikelihoodNet(3, ("image", "pos", "sensors"), UNITS), state_dim=3
        ),
        state_dim=3,
    )
    torch_model = TorchPFContainer()
    params = convert_filter_state_dict(torch_model.state_dict(), defn)

    rng = np.random.default_rng(1)
    states = rng.normal(size=(2, 3)).astype(np.float32)
    controls = rng.normal(size=(2, 7)).astype(np.float32)
    out_jax, _ = defn.dynamics_model.apply(
        params["dynamics_model"], jnp.asarray(states), jnp.asarray(controls)
    )
    out_torch = torch_model.dynamics_model(
        torch.from_numpy(states), torch.from_numpy(controls)
    )
    np.testing.assert_allclose(
        np.asarray(out_jax), out_torch.numpy(), rtol=2e-4, atol=1e-5
    )

    obs = _obs()
    particles = rng.normal(size=(2, 4, 3)).astype(np.float32)
    ll_jax = defn.measurement_model.log_likelihoods(
        params["measurement_model"], jnp.asarray(particles), _jnp_obs(obs)
    )
    ll_torch = torch_model.measurement_model(
        torch.from_numpy(particles),
        {k: torch.from_numpy(v) for k, v in obs.items()},
    )
    np.testing.assert_allclose(
        np.asarray(ll_jax), ll_torch.numpy(), rtol=2e-4, atol=1e-5
    )


@pytest.mark.parametrize("spanning", [False, True])
def test_import_virtual_sensor_checkpoint(spanning):
    """EKF-family virtual sensors import correctly, incl. the push task's
    dual-spanning-avg-pool image encoder (different flatten permutation)."""
    from multimodalfilter_tpu.filtering import VirtualSensorDef
    from multimodalfilter_tpu.models import VirtualSensorNet

    vs_def = VirtualSensorDef(
        VirtualSensorNet(
            3, ("image", "pos", "sensors"), UNITS, add_R_noise=1e-6,
            spanning_avg_pool=spanning,
        ),
        state_dim=3,
    )
    torch_vs = TorchVirtualSensor(spanning=spanning)
    # Convert this single component: wrap it at the expected container path.
    state_dict = {
        f"virtual_sensor_model.{k}": v for k, v in torch_vs.state_dict().items()
    }

    import dataclasses

    from multimodalfilter_tpu.filtering import VirtualSensorEKFDef, DynamicsDef
    from multimodalfilter_tpu.models import DynamicsNet

    # Build a minimal EKF container for the walker; dynamics keys included.
    torch_dyn = TorchDynamics()
    state_dict.update(
        {f"dynamics_model.{k}": v for k, v in torch_dyn.state_dict().items()}
    )
    ekf = VirtualSensorEKFDef(
        dynamics_model=DynamicsDef(
            DynamicsNet(state_dim=3, q_scale_tril_diag=(0.1, 0.1, 0.1), units=UNITS),
            state_dim=3,
        ),
        virtual_sensor_model=vs_def,
        state_dim=3,
    )
    params = convert_filter_state_dict(state_dict, ekf)

    obs = _obs(seed=3)
    z_jax, tril_jax = vs_def.apply(params["virtual_sensor_model"], _jnp_obs(obs))
    z_torch, tril_torch = torch_vs({k: torch.from_numpy(v) for k, v in obs.items()})
    np.testing.assert_allclose(
        np.asarray(z_jax), z_torch.numpy(), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(tril_jax), tril_torch.numpy(), rtol=2e-4, atol=1e-5
    )


class TorchPFGate(nn.Module):
    # Reference door crossmodal_pf.py:64-72 (3 fusion resblocks).
    def __init__(self):
        super().__init__()
        self.observation_image_layers = image_encoder()
        self.observation_pos_layers = mlp_encoder(3)
        self.observation_sensors_layers = mlp_encoder(7)
        self.fusion_layers = nn.Sequential(
            nn.Linear(UNITS * 3, UNITS), nn.ReLU(), Resblock(UNITS),
            Resblock(UNITS), Resblock(UNITS), nn.Linear(UNITS, 2),
        )

    def forward(self, obs):
        feats = torch.cat(
            [
                self.observation_image_layers(obs["image"][:, None]),
                self.observation_pos_layers(obs["gripper_pos"]),
                self.observation_sensors_layers(obs["gripper_sensors"]),
            ],
            -1,
        )
        return self.fusion_layers(feats)


def test_import_crossmodal_pf_checkpoint():
    """Crossmodal-PF-shaped checkpoint: nested containers
    (measurement_model.measurement_models.{0,1} + crossmodal_weight_model)
    convert through the def-tree walker, gate output matches torch."""
    from multimodalfilter_tpu.filtering import (
        CrossmodalPFMeasurementDef,
        DynamicsDef,
        MeasurementDef,
        ParticleFilterDef,
        PFWeightDef,
    )
    from multimodalfilter_tpu.models import (
        DynamicsNet,
        LogLikelihoodNet,
        PFWeightNet,
    )

    defn = ParticleFilterDef(
        dynamics_model=DynamicsDef(
            DynamicsNet(state_dim=3, q_scale_tril_diag=(0.1, 0.1, 0.1), units=UNITS),
            state_dim=3,
        ),
        measurement_model=CrossmodalPFMeasurementDef(
            measurement_models=(
                MeasurementDef(
                    LogLikelihoodNet(3, ("image", "pos", "sensors"), UNITS),
                    state_dim=3,
                ),
                MeasurementDef(
                    LogLikelihoodNet(3, ("image", "pos", "sensors"), UNITS),
                    state_dim=3,
                ),
            ),
            crossmodal_weight_model=PFWeightDef(
                PFWeightNet(modality_count=2, units=UNITS, num_fusion_resblocks=3)
            ),
            state_dim=3,
        ),
        state_dim=3,
    )

    state_dict = {}
    torch_dyn = TorchDynamics()
    state_dict.update(
        {f"dynamics_model.{k}": v for k, v in torch_dyn.state_dict().items()}
    )
    torch_mms = [TorchMeasurement(), TorchMeasurement()]
    for i, mm in enumerate(torch_mms):
        state_dict.update(
            {
                f"measurement_model.measurement_models.{i}.{k}": v
                for k, v in mm.state_dict().items()
            }
        )
    torch_gate = TorchPFGate()
    state_dict.update(
        {
            f"measurement_model.crossmodal_weight_model.{k}": v
            for k, v in torch_gate.state_dict().items()
        }
    )

    params = convert_filter_state_dict(state_dict, defn)

    obs = _obs(seed=5)
    gate_jax = defn.measurement_model.crossmodal_weight_model.log_weights(
        params["measurement_model"]["crossmodal_weight_model"], _jnp_obs(obs)
    )
    gate_torch = torch_gate({k: torch.from_numpy(v) for k, v in obs.items()})
    np.testing.assert_allclose(
        np.asarray(gate_jax), gate_torch.numpy(), rtol=2e-4, atol=1e-5
    )

    # Fused log-likelihoods reproduce the reference fusion on imported weights.
    rng = np.random.default_rng(6)
    particles = rng.normal(size=(2, 4, 3)).astype(np.float32)
    ll_fused = defn.measurement_model.log_likelihoods(
        params["measurement_model"], jnp.asarray(particles), _jnp_obs(obs)
    )
    torch_lls = torch.stack(
        [
            mm(torch.from_numpy(particles),
               {k: torch.from_numpy(v) for k, v in obs.items()})
            for mm in torch_mms
        ],
        dim=2,
    )
    expected = torch.logsumexp(gate_torch[:, None, :] + torch_lls, dim=2)
    np.testing.assert_allclose(
        np.asarray(ll_fused), expected.numpy(), rtol=2e-4, atol=1e-5
    )


class TorchKFGate(nn.Module):
    # Reference crossmodal_kf.py:108-123 (sigmoid weighting).
    def __init__(self, state_dim=3):
        super().__init__()
        self.observation_image_layers = image_encoder()
        self.observation_pos_layers = mlp_encoder(3)
        self.observation_sensors_layers = mlp_encoder(7)
        self.fusion_layers = nn.Sequential(
            nn.Linear(UNITS * 3, UNITS), nn.ReLU(), Resblock(UNITS),
            nn.Linear(UNITS, 2 * state_dim), nn.Sigmoid(),
        )

    def forward(self, obs):
        feats = torch.cat(
            [
                self.observation_image_layers(obs["image"][:, None]),
                self.observation_pos_layers(obs["gripper_pos"]),
                self.observation_sensors_layers(obs["gripper_sensors"]),
            ],
            -1,
        )
        return self.fusion_layers(feats)


def test_import_crossmodal_kf_checkpoint():
    """Crossmodal-EKF-shaped checkpoint: filter_models.{0,1} child EKFs +
    crossmodal_weight_model convert; gate weights match torch (up to the
    documented batch-independent reshape + normalization we apply on top of
    the raw sigmoid output)."""
    from multimodalfilter_tpu.filtering import (
        CrossmodalKFDef,
        DynamicsDef,
        KFWeightDef,
        VirtualSensorDef,
        VirtualSensorEKFDef,
    )
    from multimodalfilter_tpu.models import DynamicsNet, KFWeightNet, VirtualSensorNet

    def child():
        return VirtualSensorEKFDef(
            dynamics_model=DynamicsDef(
                DynamicsNet(state_dim=3, q_scale_tril_diag=(0.1, 0.1, 0.1),
                            units=UNITS),
                state_dim=3,
            ),
            virtual_sensor_model=VirtualSensorDef(
                VirtualSensorNet(3, ("image", "pos", "sensors"), UNITS,
                                 add_R_noise=1e-6),
                state_dim=3,
            ),
            state_dim=3,
        )

    defn = CrossmodalKFDef(
        filter_models=(child(), child()),
        crossmodal_weight_model=KFWeightDef(
            KFWeightNet(state_dim=3, modality_count=2, units=UNITS), state_dim=3
        ),
        state_dim=3,
    )

    state_dict = {}
    torch_children = []
    for i in range(2):
        dyn, vs = TorchDynamics(), TorchVirtualSensor()
        torch_children.append((dyn, vs))
        state_dict.update(
            {f"filter_models.{i}.dynamics_model.{k}": v
             for k, v in dyn.state_dict().items()}
        )
        state_dict.update(
            {f"filter_models.{i}.virtual_sensor_model.{k}": v
             for k, v in vs.state_dict().items()}
        )
    torch_gate = TorchKFGate()
    state_dict.update(
        {f"crossmodal_weight_model.{k}": v for k, v in torch_gate.state_dict().items()}
    )

    params = convert_filter_state_dict(state_dict, defn)

    obs = _obs(seed=7)
    w_jax = np.asarray(
        defn.crossmodal_weight_model.apply(
            params["crossmodal_weight_model"], _jnp_obs(obs)
        )
    )  # (K, N, D), normalized over K
    raw = torch_gate({k: torch.from_numpy(v) for k, v in obs.items()}).numpy()
    # Our (documented) batch-independent reshape + modality normalization.
    expected = raw.reshape(raw.shape[0], 2, 3).transpose(1, 0, 2)
    expected = expected / (expected.sum(axis=0) + 1e-9)
    np.testing.assert_allclose(w_jax, expected, rtol=2e-4, atol=1e-5)

    # Child virtual sensors imported correctly too.
    z_jax, _ = defn.filter_models[1].virtual_sensor_model.apply(
        params["filter_models"]["1"]["virtual_sensor_model"], _jnp_obs(obs)
    )
    z_torch, _ = torch_children[1][1](
        {k: torch.from_numpy(v) for k, v in obs.items()}
    )
    np.testing.assert_allclose(
        np.asarray(z_jax), z_torch.numpy(), rtol=2e-4, atol=1e-5
    )


def test_import_gate_reference_reshape():
    """The documented import-parity caveat: with reference_reshape=True the
    imported gate matches the reference's (batch-mixing) semantics EXACTLY at
    N > 1; with the default (batch-independent) reshape it matches the
    reference only at N = 1."""
    import dataclasses

    from multimodalfilter_tpu.filtering import KFWeightDef
    from multimodalfilter_tpu.models import KFWeightNet

    torch_gate = TorchKFGate()
    sub = {k: v for k, v in torch_gate.state_dict().items()}

    from multimodalfilter_tpu.experiments.torch_import import convert_kf_weight

    params = convert_kf_weight(sub)

    def reference_weights(obs, n):
        """The reference forward (crossmodal_kf.py:144-165): raw sigmoid
        output reshaped ROW-MAJOR to (K, N, D), then modality-normalized."""
        raw = torch_gate({k: torch.from_numpy(v) for k, v in obs.items()}).numpy()
        w = raw.reshape(2, n, 3)
        return w / (w.sum(axis=0) + 1e-9)

    # N > 1: reference_reshape=True is bit-faithful to the reference.
    n = 4
    obs = _obs(n=n, seed=11)
    faithful = KFWeightDef(
        KFWeightNet(state_dim=3, modality_count=2, units=UNITS,
                    reference_reshape=True),
        state_dim=3,
    )
    w_faithful = np.asarray(faithful.apply(params, _jnp_obs(obs)))
    np.testing.assert_allclose(
        w_faithful, reference_weights(obs, n), rtol=2e-4, atol=1e-5
    )

    # ... while the default reshape deliberately diverges at N > 1 ...
    fixed = KFWeightDef(
        KFWeightNet(state_dim=3, modality_count=2, units=UNITS), state_dim=3
    )
    w_fixed = np.asarray(fixed.apply(params, _jnp_obs(obs)))
    assert not np.allclose(w_fixed, reference_weights(obs, n), atol=1e-4)

    # ... and both agree with the reference at N = 1.
    obs1 = {k: v[:1] for k, v in obs.items()}
    ref1 = reference_weights(obs1, 1)
    np.testing.assert_allclose(
        np.asarray(fixed.apply(params, _jnp_obs(obs1))), ref1,
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(faithful.apply(params, _jnp_obs(obs1))), ref1,
        rtol=2e-4, atol=1e-5,
    )
