"""Generic task networks, parameterized so one implementation serves both the
door task (state_dim=3) and the push task (state_dim=2).

Architecture parity targets (cited into /root/reference):
  DynamicsNet        <- crossmodal/door_models/dynamics.py:11-134,
                        crossmodal/push_models/dynamics.py:10-67
  LogLikelihoodNet   <- crossmodal/door_models/pf.py:30-107,
                        crossmodal/push_models/pf.py:30-109
  VirtualSensorNet   <- crossmodal/door_models/kf.py:31-126,
                        crossmodal/push_models/kf.py:31-128
  KFWeightNet        <- crossmodal/door_models/crossmodal_kf.py:101-167,
                        crossmodal/push_models/crossmodal_kf.py (same shape)
  PFWeightNet        <- crossmodal/door_models/crossmodal_pf.py:52-106,
                        crossmodal/push_models/crossmodal_pf.py:52-105
  LSTMFilterNet      <- crossmodal/door_models/lstm.py:13-100,
                        crossmodal/push_models/lstm.py:13-100

Known deliberate deviation: the reference's KF weight model reshapes its
(N, K*state_dim) gate output directly to (K, N, state_dim)
(crossmodal/door_models/crossmodal_kf.py:158), which in row-major order mixes
weights across batch elements — making results depend on batch composition.
We use the batch-independent reshape (N, K, D) -> transpose(1, 0, 2), which is
required for data-parallel sharding to be semantics-preserving.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoders import ImageEncoder, MLPEncoder
from .resblocks import LinearResblock

MODALITY_ORDER = ("image", "pos", "sensors")


def _check_modalities(modalities: Tuple[str, ...]) -> Tuple[str, ...]:
    mods = tuple(m for m in MODALITY_ORDER if m in modalities)
    assert len(mods) == len(set(modalities)) and len(mods) > 0, (
        f"Invalid modality set: {modalities}"
    )
    return mods


class _ObservationEncoders(nn.Module):
    """Per-modality observation encoders producing a concatenated feature.

    Encodes only the selected modalities (static specialization — disabled
    branches are never traced, so e.g. a pos+sensors model never runs the
    image CNN).
    """

    units: int
    modalities: Tuple[str, ...]
    spanning_avg_pool: bool = False
    dtype: Any = None  # compute dtype (params stay fp32)
    fold_tail: bool = False  # fuse the linear conv3->dense tail (exact)

    @nn.compact
    def __call__(self, observations) -> jnp.ndarray:
        feats = []
        mods = _check_modalities(self.modalities)
        if "image" in mods:
            # "_image_features": precomputed image-encoder output injected by
            # the multi-instance stacked pass (models/stacked.py) — the K
            # independent image encoders consuming the same frame run as one
            # channel-stacked pass and each consumer receives its slice here
            # instead of re-running its own CNN. Exact same math (grouped
            # convs are block-diagonal), param tree untouched.
            pre = (
                observations.get("_image_features")
                if isinstance(observations, dict)
                else None
            )
            if pre is not None:
                feats.append(pre)
            else:
                feats.append(
                    ImageEncoder(
                        self.units,
                        spanning_avg_pool=self.spanning_avg_pool,
                        dtype=self.dtype,
                        fold_tail=self.fold_tail,
                        name="observation_image_layers",
                    )(observations["image"])
                )
        if "pos" in mods:
            feats.append(
                MLPEncoder(self.units, dtype=self.dtype, name="observation_pos_layers")(
                    observations["gripper_pos"]
                )
            )
        if "sensors" in mods:
            feats.append(
                MLPEncoder(
                    self.units, dtype=self.dtype, name="observation_sensors_layers"
                )(observations["gripper_sensors"])
            )
        out = jnp.concatenate(feats, axis=-1)
        # Features re-enter fp32 math downstream; cast back explicitly.
        return out.astype(jnp.float32) if self.dtype is not None else out


class DynamicsNet(nn.Module):
    """Gated residual dynamics: x' = x + dir * sigmoid(gate), constant
    diagonal process noise sqrt-diag `q_scale_tril_diag`.

    Matches the reference dynamics models; the fixed (non-trainable) process
    noise is config here rather than a frozen torch Parameter.
    """

    state_dim: int
    q_scale_tril_diag: Tuple[float, ...]
    units: int = 64

    def setup(self):
        # setup-style (attribute name = param scope, identical paths to the
        # previous @nn.compact form) so the control encoder can be invoked
        # separately: it is carry-independent, and pf.forward_loop hoists it
        # out of the filter scan (`encode_controls` below).
        self.control_layers = MLPEncoder(self.units)
        self.state_layers = MLPEncoder(self.units)
        self.shared_dense_in = nn.Dense(self.units)
        self.shared_resblock0 = LinearResblock(self.units)
        self.shared_resblock1 = LinearResblock(self.units)
        self.shared_resblock2 = LinearResblock(self.units)
        self.shared_dense_out = nn.Dense(self.state_dim + 1)

    def encode_controls(self, controls):
        """Control features (B, units) — carry-independent (hoistable)."""
        return self.control_layers(controls)

    def from_control_features(self, states, control_features):
        """The carry-dependent remainder of __call__."""
        assert states.shape[-1] == self.state_dim
        state_features = self.state_layers(states)
        # Reference concat order: (control, state) — dynamics.py:53.
        merged = jnp.concatenate([control_features, state_features], axis=-1)

        # Shared trunk: Dense (no activation before first resblock, matching
        # dynamics.py:28-34), 3 resblocks, Dense -> state_dim + 1.
        x = self.shared_dense_in(merged)
        x = self.shared_resblock0(x)
        x = self.shared_resblock1(x)
        x = self.shared_resblock2(x)
        x = self.shared_dense_out(x)

        direction = x[..., : self.state_dim]
        gate = jax.nn.sigmoid(x[..., -1:])
        states_new = states + direction * gate

        q_diag = jnp.asarray(self.q_scale_tril_diag, dtype=states.dtype)
        scale_tril = jnp.broadcast_to(
            jnp.diag(q_diag), states.shape[:-1] + (self.state_dim, self.state_dim)
        )
        return states_new, scale_tril

    def __call__(self, states, controls):
        """states: (B, state_dim); controls: (B, control_dim).
        Returns (new_states (B, D), scale_tril (B, D, D))."""
        return self.from_control_features(
            states, self.encode_controls(controls)
        )


class LogLikelihoodNet(nn.Module):
    """Particle-filter measurement model: per-particle log-likelihoods.

    __call__(states (N, M, D), observations dict) -> (N, M).

    Split into ``encode_obs`` (particle/carry-independent — hoisted out of
    the filter scan and batched over all T*N frames) and ``from_features``
    (the per-particle trunk that stays inside the scan).
    """

    state_dim: int
    modalities: Tuple[str, ...] = MODALITY_ORDER
    units: int = 64
    spanning_avg_pool: bool = False
    dtype: Any = None  # compute dtype for the obs encoders (params stay fp32)
    fold_tail: bool = False

    def setup(self):
        self.obs_encoders = _ObservationEncoders(
            self.units,
            _check_modalities(self.modalities),
            self.spanning_avg_pool,
            dtype=self.dtype,
            fold_tail=self.fold_tail,
            name="obs_encoders",
        )
        self.state_layers = MLPEncoder(self.units, name="state_layers")
        self.shared_dense_in = nn.Dense(self.units, name="shared_dense_in")
        self.shared_resblock0 = LinearResblock(self.units, name="shared_resblock0")
        self.shared_resblock1 = LinearResblock(self.units, name="shared_resblock1")
        self.shared_dense_out = nn.Dense(1, name="shared_dense_out")

    def encode_obs(self, observations) -> jnp.ndarray:
        """(N, ...) observations -> (N, units * num_modalities) features."""
        return self.obs_encoders(observations)

    def from_features(self, states, obs_features) -> jnp.ndarray:
        """states (N, M, D) + obs features (N, F) -> log-likelihoods (N, M)."""
        n, m, d = states.shape
        assert d == self.state_dim
        obs_features = jnp.broadcast_to(
            obs_features[:, None, :], (n, m, obs_features.shape[-1])
        )
        state_features = self.state_layers(states)
        merged = jnp.concatenate([obs_features, state_features], axis=-1)
        x = self.shared_dense_in(merged)
        x = nn.relu(x)
        x = self.shared_resblock0(x)
        x = self.shared_resblock1(x)
        x = self.shared_dense_out(x)
        return jnp.squeeze(x, axis=-1)

    def __call__(self, states, observations):
        return self.from_features(states, self.encode_obs(observations))


class VirtualSensorNet(nn.Module):
    """Virtual sensor: observations -> (predicted state z, diagonal scale_tril).

    Covariance construction matches kf.py:107-126: shared trunk of width
    2*units splits into z head (first half) and r head (second half);
    cov = diag(lt_hat)^2 + add_R_noise * I; returns sqrt(cov) as scale_tril.
    """

    state_dim: int
    modalities: Tuple[str, ...] = MODALITY_ORDER
    units: int = 64
    add_R_noise: float = 1e-6
    spanning_avg_pool: bool = False
    noise_R_tril_diag: Optional[Tuple[float, ...]] = None
    dtype: Any = None
    fold_tail: bool = False

    @nn.compact
    def __call__(self, observations):
        obs_features = _ObservationEncoders(
            self.units,
            _check_modalities(self.modalities),
            self.spanning_avg_pool,
            dtype=self.dtype,
            fold_tail=self.fold_tail,
            name="obs_encoders",
        )(observations)
        n = obs_features.shape[0]

        x = nn.Dense(self.units * 2, name="shared_dense_in")(obs_features)
        x = nn.relu(x)
        x = LinearResblock(self.units * 2, name="shared_resblock0")(x)
        x = LinearResblock(self.units * 2, name="shared_resblock1")(x)

        def _head(h, name):
            h = nn.Dense(self.state_dim, name=f"{name}_dense_in")(h)
            h = nn.relu(h)
            h = LinearResblock(self.state_dim, name=f"{name}_resblock")(h)
            h = nn.Dense(self.state_dim, name=f"{name}_dense_out")(h)
            return h

        z = _head(x[:, : self.units], "z_layer")

        if self.noise_R_tril_diag is None:
            lt_hat = _head(x[:, self.units :], "r_layer")
        else:
            lt_hat = jnp.broadcast_to(
                jnp.asarray(self.noise_R_tril_diag, dtype=x.dtype),
                (n, self.state_dim),
            )

        cov_diag = lt_hat**2 + self.add_R_noise
        scale_tril_diag = jnp.sqrt(cov_diag)
        scale_tril = jax.vmap(jnp.diag)(scale_tril_diag)
        return z, scale_tril


class KFWeightNet(nn.Module):
    """Crossmodal KF gate: observations -> per-state-dim weights
    (modality_count, N, state_dim), normalized over modalities.

    weighting_type in {"sigmoid", "softmax", "absolute"}; reference hardcodes
    "sigmoid" (crossmodal_kf.py:111).

    reference_reshape: the reference reshapes its (N, K*D) gate output
    row-major straight to (K, N, D) (crossmodal_kf.py:158), which mixes
    weights ACROSS batch elements — results then depend on batch composition.
    Default False uses the batch-independent (N, K, D) -> transpose reshape
    (required for data-parallel sharding to be semantics-preserving); a
    checkpoint trained by the reference therefore reproduces reference
    outputs only at N=1 unless this flag is set. Set True (e.g. via
    ``dataclasses.replace`` on the net inside the imported def) for
    bit-faithful validation of imported reference checkpoints at N>1.
    """

    state_dim: int
    modality_count: int = 2
    units: int = 64
    weighting_type: str = "sigmoid"
    dtype: Any = None
    reference_reshape: bool = False
    fold_tail: bool = False

    @nn.compact
    def __call__(self, observations):
        assert self.weighting_type in ("sigmoid", "softmax", "absolute")
        obs_features = _ObservationEncoders(
            self.units, MODALITY_ORDER, False, dtype=self.dtype,
            fold_tail=self.fold_tail, name="obs_encoders"
        )(observations)
        n = obs_features.shape[0]

        x = nn.Dense(self.units, name="fusion_dense_in")(obs_features)
        x = nn.relu(x)
        x = LinearResblock(self.units, name="fusion_resblock0")(x)
        x = nn.Dense(self.modality_count * self.state_dim, name="fusion_dense_out")(x)
        if self.weighting_type == "sigmoid":
            x = jax.nn.sigmoid(x)

        if self.reference_reshape:
            # Bit-faithful replication of the reference's batch-mixing
            # reshape (crossmodal_kf.py:158) — import validation only.
            weights = x.reshape(self.modality_count, n, self.state_dim)
        else:
            # Batch-independent reshape (deliberate fix of the reference's
            # batch-mixing reshape; see class docstring).
            weights = x.reshape(n, self.modality_count, self.state_dim).transpose(
                1, 0, 2
            )

        if self.weighting_type == "absolute":
            weights = jnp.abs(weights)
        elif self.weighting_type == "softmax":
            weights = jax.nn.softmax(weights, axis=0)

        weights = weights / (jnp.sum(weights, axis=0) + 1e-9)
        return weights


class PFWeightNet(nn.Module):
    """Crossmodal PF gate: observations -> per-modality log-weights (N, K).

    Door variant uses 3 fusion resblocks (door crossmodal_pf.py:64-72), push
    uses 1 (push crossmodal_pf.py fusion_layers) — configured via
    num_fusion_resblocks.
    """

    modality_count: int = 2
    units: int = 64
    num_fusion_resblocks: int = 3
    dtype: Any = None
    fold_tail: bool = False

    @nn.compact
    def __call__(self, observations):
        obs_features = _ObservationEncoders(
            self.units, MODALITY_ORDER, False, dtype=self.dtype,
            fold_tail=self.fold_tail, name="obs_encoders"
        )(observations)

        x = nn.Dense(self.units, name="fusion_dense_in")(obs_features)
        x = nn.relu(x)
        for i in range(self.num_fusion_resblocks):
            x = LinearResblock(self.units, name=f"fusion_resblock{i}")(x)
        x = nn.Dense(self.modality_count, name="fusion_dense_out")(x)
        return x


class LSTMFilterNet(nn.Module):
    """LSTM baseline: encode modalities + controls, fuse, 2-layer LSTM
    (hidden 512), linear head to state.

    Exposes two methods for the filter def:
      encode(observations, controls) -> fused features (..., units)
      lstm_step(carry, features (N, units)) -> (carry', state (N, state_dim))
    """

    state_dim: int
    units: int = 64
    lstm_hidden_dim: int = 512
    lstm_num_layers: int = 2
    spanning_avg_pool: bool = False
    fold_tail: bool = False

    def setup(self):
        self.obs_encoders = _ObservationEncoders(
            self.units, MODALITY_ORDER, self.spanning_avg_pool,
            fold_tail=self.fold_tail, name="obs_encoders"
        )
        self.control_layers = MLPEncoder(self.units, name="control_layers")
        self.fusion_dense = nn.Dense(self.units, name="fusion_dense")
        self.fusion_resblock = LinearResblock(self.units, name="fusion_resblock")
        self.lstm_cells = [
            nn.OptimizedLSTMCell(self.lstm_hidden_dim, name=f"lstm_{i}")
            for i in range(self.lstm_num_layers)
        ]
        self.output_dense_in = nn.Dense(self.units, name="output_dense_in")
        self.output_dense_out = nn.Dense(self.state_dim, name="output_dense_out")

    def encode(self, observations, controls):
        """Batched over arbitrary leading dims collapsed to one axis by the
        caller (LSTM filter encodes all T*N frames in one pass)."""
        obs_features = self.obs_encoders(observations)
        ctrl_features = self.control_layers(controls)
        merged = jnp.concatenate([obs_features, ctrl_features], axis=-1)
        x = self.fusion_dense(merged)
        x = nn.relu(x)
        x = self.fusion_resblock(x)
        return x

    def lstm_step(self, carry, features):
        """carry: tuple of per-layer LSTM carries ((c, h), ...)."""
        new_carry = []
        x = features
        for cell, layer_carry in zip(self.lstm_cells, carry):
            layer_carry, x = cell(layer_carry, x)
            new_carry.append(layer_carry)
        state = self.output_dense_out(nn.relu(self.output_dense_in(x)))
        return tuple(new_carry), state

    def __call__(self, observations, controls, carry):
        """Single filter step (used for init/tracing)."""
        features = self.encode(observations, controls)
        return self.lstm_step(carry, features)

    def initial_carry(self, batch_size: int, dtype=jnp.float32):
        return tuple(
            (
                jnp.zeros((batch_size, self.lstm_hidden_dim), dtype),
                jnp.zeros((batch_size, self.lstm_hidden_dim), dtype),
            )
            for _ in range(self.lstm_num_layers)
        )
