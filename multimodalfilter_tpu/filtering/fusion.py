"""Multimodal fusion filters: crossmodal (learned-gate) and unimodal
(precision-weighted) fusion of per-modality filters / measurement models.

Capability parity with ``crossmodal/base_models/`` in the reference:
  weighted_average            <- utility.py:4-11
  CrossmodalPFMeasurementDef  <- crossmodal_pf.py:33-141
  PFWeightDef                 <- crossmodal_pf.py:11-30 (+ blackout logic from
                                 door_models/crossmodal_pf.py:98-104)
  CrossmodalKFDef             <- crossmodal_kf.py:39-240 (+ blackout logic from
                                 door_models/crossmodal_kf.py:43-98)
  KFWeightDef                 <- crossmodal_kf.py:13-36
  CrossmodalVirtualSensorDef  <- crossmodal_kf.py:243-359
  UnimodalKFDef               <- unimodal_kf.py:118-270
  UnimodalVirtualSensorDef    <- unimodal_kf.py:13-115

Replicated effective-behavior quirks (deliberate, for RMSE parity — SURVEY §7
"hard parts"):
  * 1e-9 epsilons at the exact reference positions.
  * CrossmodalVirtualSensor covariance multiplier = prod over modalities and
    state dims of the weights (crossmodal_kf.py:346-354) — the cruder formula.
  * UnimodalVirtualSensor "precision" = elementwise 1/(scale_tril + 1e-9)
    (unimodal_kf.py:85), NOT a matrix inverse; and its second return value is
    a *covariance* in the scale_tril slot (unimodal_kf.py:115) which the
    downstream EKF squares — replicated literally.
  * The PF fusion feeds RAW per-modality log-likelihoods into logsumexp; the
    reference's max-normalization (crossmodal_pf.py:123-129) is computed and
    then discarded, so we don't compute it at all.
  * Blackout overrides use -1e9 instead of the reference's -inf
    (door crossmodal_pf.py:104) to stay NaN-safe under jit/grad.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import GaussianBelief
from .base import DEFAULT_OBS_SPEC, FilterDef, ObsSpec, example_observations
from .ekf import VirtualSensorEKFDef

_BLACKOUT_EPS = 1e-8
_NEG_BIG = 1.0e9


def weighted_average(predictions, weights):
    """Normalize weights over the modality axis 0, weighted sum.

    Matches crossmodal/base_models/utility.py:4-11.
    """
    assert predictions.shape == weights.shape
    weights = weights / (jnp.sum(weights, axis=0) + 1e-9)
    return jnp.sum(weights * predictions, axis=0)


def _blackout_mask(observations) -> jnp.ndarray:
    """(N,) bool: True where the image frame is all (near-)zero."""
    image = observations["image"]
    n = image.shape[0]
    return jnp.sum(jnp.abs(image.reshape(n, -1)), axis=1) < _BLACKOUT_EPS


def _normalize_enabled(enabled: Optional[Tuple[bool, ...]], count: int):
    if enabled is None:
        enabled = (True,) * count
    assert len(enabled) == count and any(enabled)
    return enabled


def _stacked_image_injection(participants, observations):
    """Channel-stack the image encoders of `participants` over the shared
    frame batch (models/stacked.py — the serving MFU lever: K lane-starved
    CNNs become one wide pass).

    participants: list of (pid, net, net_params) whose nets MAY own an
    obs_encoders image encoder. Returns {pid: observations-with-injected
    "_image_features"} for the stacked subset, or None when fewer than two
    participants share an identical encoder architecture (mixed configs fall
    back to the per-instance path).
    """
    from ..models.stacked import (
        encoder_stack_config,
        image_encoder_params,
        stacked_image_features,
    )

    configs = [(p, encoder_stack_config(p[1])) for p in participants]
    stackable = [(p, c) for p, c in configs if c is not None]
    if len(stackable) < 2 or len({c for _, c in stackable}) != 1:
        return None
    cfg = stackable[0][1]
    feats = stacked_image_features(
        [image_encoder_params(net_params) for (_, _, net_params), _ in stackable],
        observations["image"],
        spanning_avg_pool=cfg[1], dtype=cfg[2], fold_tail=cfg[3],
    )
    return {
        pid: {**observations, "_image_features": f}
        for ((pid, _, _), _), f in zip(stackable, feats)
    }


# ---------------------------------------------------------------------------
# Weight models
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class KFWeightDef:
    """Gate over observations -> (modality_count, N, state_dim) weights,
    normalized over modalities."""

    net: Any  # KFWeightNet
    state_dim: int
    modality_count: int = 2
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC

    def init(self, key):
        return self.net.init(key, example_observations(self.obs_spec))["params"]

    def apply(self, params, observations):
        return self.net.apply({"params": params}, observations)


@dataclasses.dataclass(frozen=True)
class PFWeightDef:
    """Gate over observations -> (N, modality_count) log-weights; optional
    image-blackout override on modality 0."""

    net: Any  # PFWeightNet
    modality_count: int = 2
    know_image_blackout: bool = False
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC

    def init(self, key):
        return self.net.init(key, example_observations(self.obs_spec))["params"]

    def log_weights(self, params, observations):
        out = self.net.apply({"params": params}, observations)
        if self.know_image_blackout:
            blackout = _blackout_mask(observations)
            out = out.at[:, 0].add(jnp.where(blackout, -_NEG_BIG, 0.0))
        return out


# ---------------------------------------------------------------------------
# Particle-filter fusion (measurement level)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CrossmodalPFMeasurementDef:
    """K per-modality log-likelihood models fused by
    logsumexp(gate_log_weights + log_likelihoods) over the modality axis.

    With crossmodal_weight_model=None, modalities are weighted equally
    (plain logsumexp) — this is the "unimodal PF" of the reference
    (crossmodal_pf.py:136-139, door_models/unimodal_pf.py:9-29).
    """

    measurement_models: Tuple[Any, ...]  # MeasurementDefs
    crossmodal_weight_model: Optional[PFWeightDef]
    state_dim: int
    # Run the per-modality + gate image encoders as ONE channel-stacked pass
    # (models/stacked.py; MMF_TPU_STACK_ENC=1 via StatefulFilter). Exact
    # same math per encoder; param structure unchanged.
    stack_image_encoders: bool = False

    def _stack_injection(self, params, observations, enabled):
        if not self.stack_image_encoders:
            return None
        parts = [
            (str(i), mm.net, params["measurement_models"][str(i)])
            for i, mm in enumerate(self.measurement_models)
            if enabled[i] and hasattr(mm, "net")
        ]
        if self.crossmodal_weight_model is not None:
            parts.append((
                "_gate",
                self.crossmodal_weight_model.net,
                params["crossmodal_weight_model"],
            ))
        return _stacked_image_injection(parts, observations)

    def init(self, key):
        keys = jax.random.split(key, len(self.measurement_models) + 1)
        params = {
            "measurement_models": {
                str(i): mm.init(keys[i])
                for i, mm in enumerate(self.measurement_models)
            }
        }
        if self.crossmodal_weight_model is not None:
            params["crossmodal_weight_model"] = self.crossmodal_weight_model.init(
                keys[-1]
            )
        return params

    def log_likelihoods(
        self, params, states, observations, enabled: Optional[Tuple[bool, ...]] = None
    ):
        enabled = _normalize_enabled(enabled, len(self.measurement_models))
        if self.stack_image_encoders:
            # encode -> from_features is exactly __call__ split in two
            # (task_nets.py LogLikelihoodNet), and encode_observations is
            # where the stacked pass lives.
            return self.log_likelihoods_from_features(
                params, states,
                self.encode_observations(params, observations, enabled),
                enabled,
            )
        # Static specialization: disabled modality networks are never traced.
        lls = jnp.stack(
            [
                mm.log_likelihoods(
                    params["measurement_models"][str(i)], states, observations
                )
                for i, mm in enumerate(self.measurement_models)
                if enabled[i]
            ],
            axis=2,
        )  # (N, M, K_enabled)

        if self.crossmodal_weight_model is not None:
            log_w = self.crossmodal_weight_model.log_weights(
                params["crossmodal_weight_model"], observations
            )  # (N, K)
            log_w = log_w[:, jnp.array([i for i, e in enumerate(enabled) if e])]
            return jax.scipy.special.logsumexp(log_w[:, None, :] + lls, axis=2)
        return jax.scipy.special.logsumexp(lls, axis=2)

    # Precompute API (carry-independent parts hoisted out of the scan):
    # features = per-enabled-model obs encodings + gate log-weights.
    def encode_observations(
        self, params, observations, enabled: Optional[Tuple[bool, ...]] = None
    ):
        enabled = _normalize_enabled(enabled, len(self.measurement_models))
        inj = self._stack_injection(params, observations, enabled)

        def obs_for(pid):
            return inj[pid] if inj is not None and pid in inj else observations

        features = {
            str(i): mm.encode_observations(
                params["measurement_models"][str(i)], obs_for(str(i))
            )
            for i, mm in enumerate(self.measurement_models)
            if enabled[i]
        }
        if self.crossmodal_weight_model is not None:
            features["_log_weights"] = self.crossmodal_weight_model.log_weights(
                params["crossmodal_weight_model"], obs_for("_gate")
            )
        return features

    def log_likelihoods_from_features(
        self, params, states, features, enabled: Optional[Tuple[bool, ...]] = None
    ):
        enabled = _normalize_enabled(enabled, len(self.measurement_models))
        lls = jnp.stack(
            [
                mm.log_likelihoods_from_features(
                    params["measurement_models"][str(i)], states, features[str(i)]
                )
                for i, mm in enumerate(self.measurement_models)
                if enabled[i]
            ],
            axis=2,
        )
        if self.crossmodal_weight_model is not None:
            log_w = features["_log_weights"]
            log_w = log_w[:, jnp.array([i for i, e in enumerate(enabled) if e])]
            return jax.scipy.special.logsumexp(log_w[:, None, :] + lls, axis=2)
        return jax.scipy.special.logsumexp(lls, axis=2)


# ---------------------------------------------------------------------------
# Kalman-filter fusion (posterior level)
# ---------------------------------------------------------------------------


def _calculate_weighted_states(state_weights, unimodal_states, unimodal_covariances):
    """Means: normalized weighted average. Covariances: sum_k (w w^T) ⊙ Σ_k
    with RAW (unnormalized) weights — matches crossmodal_kf.py:153-167."""
    weighted_states = weighted_average(unimodal_states, state_weights)
    w_outer = state_weights[..., :, None] * state_weights[..., None, :]
    weighted_covariances = jnp.sum(w_outer * unimodal_covariances, axis=0)
    return weighted_states, weighted_covariances


@dataclasses.dataclass(frozen=True)
class CrossmodalKFDef(FilterDef):
    """K per-modality virtual-sensor EKFs whose posteriors are mixed with
    learned per-state-dim weights; the fused belief is written back into every
    child (crossmodal_kf.py:147-149) — i.e. the fused Gaussian IS the single
    recursion carry, and every child predicts from it.
    """

    filter_models: Tuple[VirtualSensorEKFDef, ...]
    crossmodal_weight_model: KFWeightDef
    state_dim: int
    control_dim: int = 7
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC
    know_image_blackout: bool = False
    # Channel-stack the image child's virtual-sensor encoder with the gate's
    # (models/stacked.py; MMF_TPU_STACK_ENC=1 via StatefulFilter).
    stack_image_encoders: bool = False
    # forward_loop lax.scan unroll factor (numerics-identical; serving knob
    # MMF_TPU_SCAN_UNROLL — see ParticleFilterDef.scan_unroll).
    scan_unroll: int = 1
    # vmap the enabled children's in-scan EKF updates over one stacked child
    # axis (the fused carry broadcasts — crossmodal write-back means every
    # child predicts from the same belief). Row math is unchanged (batched
    # dense rows reduce over features only; batched 3x3 Cholesky is
    # elementwise per child) — bitwise-tested in tests/test_ekf_hoist.py.
    # Requires structurally identical child dynamics; falls back to the
    # per-child Python loop otherwise. Halves the tiny-op count per step for
    # the 2-child door/push models — an N=1 latency lever.
    stack_children: bool = True

    def _stack_injection(self, params, observations, enabled, include_gate):
        if not self.stack_image_encoders:
            return None
        parts = [
            (
                str(i),
                fm.virtual_sensor_model.net,
                params["filter_models"][str(i)]["virtual_sensor_model"],
            )
            for i, fm in enumerate(self.filter_models)
            if enabled[i] and hasattr(fm.virtual_sensor_model, "net")
        ]
        if include_gate:
            parts.append((
                "_gate",
                self.crossmodal_weight_model.net,
                params["crossmodal_weight_model"],
            ))
        return _stacked_image_injection(parts, observations)

    def init(self, key):
        keys = jax.random.split(key, len(self.filter_models) + 1)
        return {
            "filter_models": {
                str(i): fm.init(keys[i]) for i, fm in enumerate(self.filter_models)
            },
            "crossmodal_weight_model": self.crossmodal_weight_model.init(keys[-1]),
        }

    def initialize_beliefs(self, params, key, mean, covariance, *, train: bool):
        del params, key, train
        return GaussianBelief(mean, covariance)

    def _child_posteriors(
        self, params, belief, observations, controls, enabled, inj=None
    ):
        means, covs = [], []
        for i, fm in enumerate(self.filter_models):
            if not enabled[i]:
                continue
            obs_i = (
                inj[str(i)] if inj is not None and str(i) in inj else observations
            )
            child_belief, child_mean = fm.step(
                params["filter_models"][str(i)],
                belief,
                obs_i,
                controls,
                key=None,
                train=False,
            )
            means.append(child_mean)
            covs.append(child_belief.cov)
        return jnp.stack(means), jnp.stack(covs)  # (Ke,N,D), (Ke,N,D,D)

    def step(
        self,
        params,
        belief: GaussianBelief,
        observations,
        controls,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        del key, train
        enabled = _normalize_enabled(enabled, len(self.filter_models))
        inj = self._stack_injection(
            params, observations, enabled, include_gate=all(enabled)
        )
        unimodal_states, unimodal_covs = self._child_posteriors(
            params, belief, observations, controls, enabled, inj
        )
        n = unimodal_states.shape[1]

        if not all(enabled):
            # Indicator weights for the enabled subset (crossmodal_kf.py:124-134).
            k_enabled = sum(enabled)
            state_weights = jnp.ones((k_enabled, n, self.state_dim))
        else:
            state_weights = self.crossmodal_weight_model.apply(
                params["crossmodal_weight_model"],
                inj.get("_gate", observations) if inj is not None else observations,
            )
            if self.know_image_blackout:
                # Branchless equivalent of door crossmodal_kf.py:52-96: on
                # all-zero image frames, force (1e-9, 1 - 1e-9); the formula
                # reduces exactly to the gate output on non-blackout frames.
                blackout = _blackout_mask(observations)[:, None]
                image_w = jnp.where(blackout, 1e-9, state_weights[0])
                force_w = jnp.where(blackout, 1.0 - 1e-9, state_weights[1])
                state_weights = jnp.stack([image_w, force_w])

        fused_mean, fused_cov = _calculate_weighted_states(
            state_weights, unimodal_states, unimodal_covs
        )
        return GaussianBelief(fused_mean, fused_cov), fused_mean

    def forward_loop(
        self,
        params,
        belief: GaussianBelief,
        observations_seq,
        controls_seq,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """TPU-optimized unroll: per-child virtual sensors AND the gate are
        carry-independent — both run once over all T*N frames; the scan body
        is K small EKF updates + the weighted fusion."""
        del key, train
        enabled = _normalize_enabled(enabled, len(self.filter_models))
        t, n = controls_seq.shape[:2]

        # Stacked hoisted pass: the image child's virtual-sensor encoder and
        # the gate's run as one channel-stacked (T*N)-batched CNN; each
        # consumer receives its feature slice, reshaped back to (T, N, u)
        # for the children (precompute_virtual re-flattens every leaf).
        inj_flat = None
        if all(enabled):
            flat_obs_all = jax.tree_util.tree_map(
                lambda x: x.reshape((t * n,) + x.shape[2:]), observations_seq
            )
            inj_flat = self._stack_injection(
                params, flat_obs_all, enabled, include_gate=True
            )

        virtuals = {}
        for i, fm in enumerate(self.filter_models):
            if enabled[i]:
                if inj_flat is not None and str(i) in inj_flat:
                    feat = inj_flat[str(i)]["_image_features"]
                    obs_i = {
                        **observations_seq,
                        "_image_features": feat.reshape(
                            (t, n) + feat.shape[1:]
                        ),
                    }
                else:
                    obs_i = observations_seq
                z_seq, r_seq = fm.precompute_virtual(
                    params["filter_models"][str(i)], obs_i
                )
                virtuals[str(i)] = (z_seq, r_seq)

        # Per-child hoisted control features (see VirtualSensorEKFDef.
        # precompute_control_features — bitwise, one batched MLP per child).
        ctrl_feats = {}
        for i, fm in enumerate(self.filter_models):
            if enabled[i]:
                cf = fm.precompute_control_features(
                    params["filter_models"][str(i)], controls_seq
                )
                if cf is not None:
                    ctrl_feats[str(i)] = cf

        if not all(enabled):
            weights_seq = jnp.ones((t, sum(enabled), n, self.state_dim))
        else:
            flat_obs = flat_obs_all
            w = self.crossmodal_weight_model.apply(
                params["crossmodal_weight_model"],
                inj_flat.get("_gate", flat_obs)
                if inj_flat is not None else flat_obs,
            )  # (K, T*N, D)
            k = w.shape[0]
            weights_seq = w.reshape(k, t, n, self.state_dim).transpose(1, 0, 2, 3)
            if self.know_image_blackout:
                blackout = _blackout_mask(
                    {"image": flat_obs["image"]}
                ).reshape(t, n, 1)
                image_w = jnp.where(blackout, 1e-9, weights_seq[:, 0])
                force_w = jnp.where(blackout, 1.0 - 1e-9, weights_seq[:, 1])
                weights_seq = jnp.stack([image_w, force_w], axis=1)

        # Stacked-children fast path (see the `stack_children` field): one
        # vmapped EKF update over a (K, ...) child axis instead of K separate
        # op chains per scan step. Static trace-time gate; the fused carry
        # broadcasts into every child (crossmodal write-back semantics).
        en_idx = [i for i in range(len(self.filter_models)) if enabled[i]]
        fm0 = self.filter_models[en_idx[0]]
        can_stack = (
            self.stack_children
            and len(en_idx) > 1
            and all(
                self.filter_models[i].dynamics_model == fm0.dynamics_model
                and self.filter_models[i].hoist_ctrl == fm0.hoist_ctrl
                for i in en_idx
            )
        )

        if can_stack:
            z_st = jnp.stack([virtuals[str(i)][0] for i in en_idx], axis=1)
            r_st = jnp.stack([virtuals[str(i)][1] for i in en_idx], axis=1)
            dyn_st = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[
                    params["filter_models"][str(i)]["dynamics_model"]
                    for i in en_idx
                ],
            )
            cf_st = (
                jnp.stack([ctrl_feats[str(i)] for i in en_idx], axis=1)
                if all(str(i) in ctrl_feats for i in en_idx)
                else None
            )

            if cf_st is not None:

                def scan_step(carry, inputs):
                    z_t, r_t, cf_t, weights_t = inputs

                    def one_child(dyn_p, z_i, r_i, cf_i):
                        b, m = fm0.update_from_virtual(
                            {"dynamics_model": dyn_p}, carry, z_i, r_i,
                            None, ctrl_feat=cf_i,
                        )
                        return m, b.cov

                    means, covs = jax.vmap(one_child)(dyn_st, z_t, r_t, cf_t)
                    fused_mean, fused_cov = _calculate_weighted_states(
                        weights_t, means, covs
                    )
                    return GaussianBelief(fused_mean, fused_cov), fused_mean

                xs = (z_st, r_st, cf_st, weights_seq)
            else:

                def scan_step(carry, inputs):
                    z_t, r_t, weights_t, ctrl_t = inputs

                    def one_child(dyn_p, z_i, r_i):
                        b, m = fm0.update_from_virtual(
                            {"dynamics_model": dyn_p}, carry, z_i, r_i,
                            ctrl_t,
                        )
                        return m, b.cov

                    means, covs = jax.vmap(one_child)(dyn_st, z_t, r_t)
                    fused_mean, fused_cov = _calculate_weighted_states(
                        weights_t, means, covs
                    )
                    return GaussianBelief(fused_mean, fused_cov), fused_mean

                xs = (z_st, r_st, weights_seq, controls_seq)

            final_belief, estimates = jax.lax.scan(
                scan_step, belief, xs, unroll=self.scan_unroll,
            )
            return final_belief, estimates

        def scan_step(carry, inputs):
            virtuals_t, cf_t, weights_t, ctrl_t = inputs
            means, covs = [], []
            for i, fm in enumerate(self.filter_models):
                if not enabled[i]:
                    continue
                z_t, r_t = virtuals_t[str(i)]
                child_belief, child_mean = fm.update_from_virtual(
                    params["filter_models"][str(i)], carry, z_t, r_t, ctrl_t,
                    ctrl_feat=cf_t.get(str(i)),
                )
                means.append(child_mean)
                covs.append(child_belief.cov)
            fused_mean, fused_cov = _calculate_weighted_states(
                weights_t, jnp.stack(means), jnp.stack(covs)
            )
            return GaussianBelief(fused_mean, fused_cov), fused_mean

        final_belief, estimates = jax.lax.scan(
            scan_step, belief,
            (virtuals, ctrl_feats, weights_seq, controls_seq),
            unroll=self.scan_unroll,
        )
        return final_belief, estimates

    def measurement_initialize_beliefs(
        self, params, observations, *, key=None, train=False,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """Belief from the children's virtual sensors + gate
        (crossmodal_kf.py:208-240)."""
        enabled = _normalize_enabled(enabled, len(self.filter_models))
        zs, covs = [], []
        for i, fm in enumerate(self.filter_models):
            if not enabled[i]:
                continue
            z, tril = fm.virtual_sensor_model.apply(
                params["filter_models"][str(i)]["virtual_sensor_model"], observations
            )
            zs.append(z)
            covs.append(tril @ jnp.swapaxes(tril, -1, -2))
        unimodal_states = jnp.stack(zs)
        unimodal_covs = jnp.stack(covs)

        state_weights = self.crossmodal_weight_model.apply(
            params["crossmodal_weight_model"], observations
        )
        state_weights = state_weights[jnp.array([i for i, e in enumerate(enabled) if e])]

        mean = weighted_average(unimodal_states, state_weights)
        cov_multiplier = jnp.prod(jnp.prod(state_weights, axis=-1), axis=0)[
            :, None, None
        ]
        cov = cov_multiplier * jnp.sum(unimodal_covs, axis=0)
        return GaussianBelief(mean, cov)


@dataclasses.dataclass(frozen=True)
class UnimodalKFDef(FilterDef):
    """K per-modality EKFs evolving INDEPENDENT beliefs (no write-back —
    unimodal_kf.py:162-250 never fuses back into children), with
    precision-weighted product-of-Gaussians output fusion."""

    filter_models: Tuple[VirtualSensorEKFDef, ...]
    state_dim: int
    control_dim: int = 7
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC
    # forward_loop lax.scan unroll factor (numerics-identical; serving knob
    # MMF_TPU_SCAN_UNROLL — see ParticleFilterDef.scan_unroll).
    scan_unroll: int = 1
    # vmap the enabled children's in-scan EKF updates over one stacked child
    # axis (see CrossmodalKFDef.stack_children; here the per-child beliefs
    # stack into the carry as well — they evolve independently). Bitwise vs
    # the per-child loop (tests/test_ekf_hoist.py).
    stack_children: bool = True

    def init(self, key):
        keys = jax.random.split(key, len(self.filter_models))
        return {
            "filter_models": {
                str(i): fm.init(keys[i]) for i, fm in enumerate(self.filter_models)
            }
        }

    def initialize_beliefs(self, params, key, mean, covariance, *, train: bool):
        del params, key, train
        return tuple(GaussianBelief(mean, covariance) for _ in self.filter_models)

    def measurement_initialize_beliefs(
        self, params, observations, *, key=None, train=False,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """Per-child measurement initialization: each child EKF starts from
        its own virtual sensor's (z, R). (The door UEKF curriculum trains
        e2e with measurement_initialize=True — train_door.py:443-457; the
        reference's UnimodalKalmanFilter never defines this method, so we
        implement the evident unimodal semantics.)"""
        del key, train, enabled
        beliefs = []
        for i, fm in enumerate(self.filter_models):
            z, tril = fm.virtual_sensor_model.apply(
                params["filter_models"][str(i)]["virtual_sensor_model"],
                observations,
            )
            cov = tril @ jnp.swapaxes(tril, -1, -2)
            beliefs.append(GaussianBelief(z, cov))
        return tuple(beliefs)

    def step(
        self,
        params,
        belief: Tuple[GaussianBelief, ...],
        observations,
        controls,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        del key, train
        enabled = _normalize_enabled(enabled, len(self.filter_models))

        new_beliefs = []
        means, covs = [], []
        for i, fm in enumerate(self.filter_models):
            if enabled[i]:
                child_belief, child_mean = fm.step(
                    params["filter_models"][str(i)],
                    belief[i],
                    observations,
                    controls,
                    key=None,
                    train=False,
                )
                new_beliefs.append(child_belief)
                means.append(child_mean)
                covs.append(child_belief.cov)
            else:
                new_beliefs.append(belief[i])  # disabled child: belief stale

        if len(means) == 1:
            fused_mean = means[0]
        else:
            unimodal_means = jnp.stack(means)  # (K, N, D)
            unimodal_covs = jnp.stack(covs)  # (K, N, D, D)
            # Literal replication of unimodal_kf.py:204-242: scalar 1e-9 added
            # to every covariance entry before the matrix inverse.
            precisions = jnp.linalg.inv(unimodal_covs + 1e-9)
            fused_cov = jnp.linalg.inv(jnp.sum(precisions, axis=0) + 1e-9)
            weighted_unnorm = jnp.sum(
                jnp.einsum("knij,knj->kni", precisions, unimodal_means), axis=0
            )
            fused_mean = jnp.einsum("nij,nj->ni", fused_cov, weighted_unnorm)

        return tuple(new_beliefs), fused_mean

    def forward_loop(
        self,
        params,
        belief: Tuple[GaussianBelief, ...],
        observations_seq,
        controls_seq,
        key,
        *,
        train: bool,
        enabled: Optional[Tuple[bool, ...]] = None,
    ):
        """TPU-optimized unroll: per-child virtual sensors hoisted out of the
        scan; the scan body is K independent EKF updates + precision fusion."""
        del key, train
        enabled = _normalize_enabled(enabled, len(self.filter_models))

        virtuals = {}
        ctrl_feats = {}
        for i, fm in enumerate(self.filter_models):
            if enabled[i]:
                virtuals[str(i)] = fm.precompute_virtual(
                    params["filter_models"][str(i)], observations_seq
                )
                cf = fm.precompute_control_features(
                    params["filter_models"][str(i)], controls_seq
                )
                if cf is not None:
                    ctrl_feats[str(i)] = cf

        # Stacked-children fast path (see the `stack_children` field): the
        # independent per-child beliefs stack into a (K, ...) carry and one
        # vmapped EKF update replaces the per-child op chains. Static gate;
        # bitwise vs the loop below (tests/test_ekf_hoist.py).
        en_idx = [i for i in range(len(self.filter_models)) if enabled[i]]
        fm0 = self.filter_models[en_idx[0]]
        can_stack = (
            self.stack_children
            and len(en_idx) > 1
            and all(
                self.filter_models[i].dynamics_model == fm0.dynamics_model
                and self.filter_models[i].hoist_ctrl == fm0.hoist_ctrl
                for i in en_idx
            )
        )
        if can_stack:
            z_st = jnp.stack([virtuals[str(i)][0] for i in en_idx], axis=1)
            r_st = jnp.stack([virtuals[str(i)][1] for i in en_idx], axis=1)
            dyn_st = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[
                    params["filter_models"][str(i)]["dynamics_model"]
                    for i in en_idx
                ],
            )
            cf_available = all(str(i) in ctrl_feats for i in en_idx)
            cf_st = (
                jnp.stack([ctrl_feats[str(i)] for i in en_idx], axis=1)
                if cf_available
                else None
            )
            mean_st = jnp.stack([belief[i].mean for i in en_idx])
            cov_st = jnp.stack([belief[i].cov for i in en_idx])
            xs = (
                (z_st, r_st, cf_st)
                if cf_available
                else (z_st, r_st, controls_seq)
            )

            def scan_step(carry, inputs):
                m_st, c_st = carry
                z_t, r_t, third = inputs

                def one_child(dyn_p, bm, bc, z_i, r_i, cf_i):
                    b, m = fm0.update_from_virtual(
                        {"dynamics_model": dyn_p}, GaussianBelief(bm, bc),
                        z_i, r_i, None if cf_available else third,
                        ctrl_feat=cf_i,
                    )
                    return b.mean, b.cov, m

                if cf_available:
                    nm, nc, means = jax.vmap(one_child)(
                        dyn_st, m_st, c_st, z_t, r_t, third
                    )
                else:
                    nm, nc, means = jax.vmap(
                        lambda dp, bm, bc, z_i, r_i: one_child(
                            dp, bm, bc, z_i, r_i, None
                        )
                    )(dyn_st, m_st, c_st, z_t, r_t)

                precisions = jnp.linalg.inv(nc + 1e-9)
                fused_cov = jnp.linalg.inv(
                    jnp.sum(precisions, axis=0) + 1e-9
                )
                weighted_unnorm = jnp.sum(
                    jnp.einsum("knij,knj->kni", precisions, means), axis=0
                )
                fused_mean = jnp.einsum(
                    "nij,nj->ni", fused_cov, weighted_unnorm
                )
                return (nm, nc), fused_mean

            (final_m, final_c), estimates = jax.lax.scan(
                scan_step, (mean_st, cov_st), xs, unroll=self.scan_unroll,
            )
            new_beliefs = list(belief)
            for j, i in enumerate(en_idx):
                new_beliefs[i] = GaussianBelief(final_m[j], final_c[j])
            return tuple(new_beliefs), estimates

        def scan_step(carry, inputs):
            virtuals_t, cf_t, ctrl_t = inputs
            new_beliefs = []
            means, covs = [], []
            for i, fm in enumerate(self.filter_models):
                if enabled[i]:
                    z_t, r_t = virtuals_t[str(i)]
                    child_belief, child_mean = fm.update_from_virtual(
                        params["filter_models"][str(i)], carry[i], z_t, r_t,
                        ctrl_t, ctrl_feat=cf_t.get(str(i)),
                    )
                    new_beliefs.append(child_belief)
                    means.append(child_mean)
                    covs.append(child_belief.cov)
                else:
                    new_beliefs.append(carry[i])

            if len(means) == 1:
                fused_mean = means[0]
            else:
                unimodal_means = jnp.stack(means)
                unimodal_covs = jnp.stack(covs)
                precisions = jnp.linalg.inv(unimodal_covs + 1e-9)
                fused_cov = jnp.linalg.inv(jnp.sum(precisions, axis=0) + 1e-9)
                weighted_unnorm = jnp.sum(
                    jnp.einsum("knij,knj->kni", precisions, unimodal_means), axis=0
                )
                fused_mean = jnp.einsum("nij,nj->ni", fused_cov, weighted_unnorm)
            return tuple(new_beliefs), fused_mean

        final_belief, estimates = jax.lax.scan(
            scan_step, belief, (virtuals, ctrl_feats, controls_seq),
            unroll=self.scan_unroll,
        )
        return final_belief, estimates


# ---------------------------------------------------------------------------
# Virtual-sensor (measurement-level) fusion
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class CrossmodalVirtualSensorDef:
    """K virtual sensors fused into one virtual measurement for a single EKF
    (crossmodal_kf.py:243-359). Returns (mean, cholesky(fused_cov))."""

    virtual_sensor_model: Tuple[Any, ...]  # VirtualSensorDefs (tuple; reference attr is a ModuleList named singular)
    crossmodal_weight_model: KFWeightDef
    state_dim: int
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC
    # Channel-stack the image virtual sensor's encoder with the gate's
    # (models/stacked.py; MMF_TPU_STACK_ENC=1 via StatefulFilter).
    stack_image_encoders: bool = False

    def init(self, key):
        keys = jax.random.split(key, len(self.virtual_sensor_model) + 1)
        return {
            # Param path name matches the reference attribute
            # `virtual_sensor_model` (nn.ModuleList, crossmodal_kf.py:255).
            "virtual_sensor_model": {
                str(i): vs.init(keys[i])
                for i, vs in enumerate(self.virtual_sensor_model)
            },
            "crossmodal_weight_model": self.crossmodal_weight_model.init(keys[-1]),
        }

    def apply(self, params, observations, enabled: Optional[Tuple[bool, ...]] = None):
        enabled = _normalize_enabled(enabled, len(self.virtual_sensor_model))
        inj = None
        if self.stack_image_encoders and all(enabled):
            parts = [
                (str(i), vs.net, params["virtual_sensor_model"][str(i)])
                for i, vs in enumerate(self.virtual_sensor_model)
                if hasattr(vs, "net")
            ]
            parts.append((
                "_gate",
                self.crossmodal_weight_model.net,
                params["crossmodal_weight_model"],
            ))
            inj = _stacked_image_injection(parts, observations)

        def obs_for(pid):
            return inj[pid] if inj is not None and pid in inj else observations

        zs, covs = [], []
        for i, vs in enumerate(self.virtual_sensor_model):
            if not enabled[i]:
                continue
            z, tril = vs.apply(
                params["virtual_sensor_model"][str(i)], obs_for(str(i))
            )
            zs.append(z)
            covs.append(tril @ jnp.swapaxes(tril, -1, -2))
        unimodal_states = jnp.stack(zs)
        unimodal_covs = jnp.stack(covs)
        n = unimodal_states.shape[1]

        if not all(enabled):
            state_weights = jnp.ones((sum(enabled), n, self.state_dim))
        else:
            state_weights = self.crossmodal_weight_model.apply(
                params["crossmodal_weight_model"], obs_for("_gate")
            )

        mean = weighted_average(unimodal_states, state_weights)
        cov_multiplier = jnp.prod(jnp.prod(state_weights, axis=-1), axis=0)[
            :, None, None
        ]
        cov = cov_multiplier * jnp.sum(unimodal_covs, axis=0)
        return mean, jnp.linalg.cholesky(cov)


@dataclasses.dataclass(frozen=True)
class UnimodalVirtualSensorDef:
    """K virtual sensors fused by (elementwise-reciprocal) precision weighting
    (unimodal_kf.py:13-115). NOTE: replicates the reference's literal return
    of a covariance (not a scale_tril) in the multi-modality path."""

    virtual_sensor_model: Tuple[Any, ...]
    state_dim: int
    obs_spec: ObsSpec = DEFAULT_OBS_SPEC

    def init(self, key):
        keys = jax.random.split(key, len(self.virtual_sensor_model))
        return {
            "virtual_sensor_model": {
                str(i): vs.init(keys[i])
                for i, vs in enumerate(self.virtual_sensor_model)
            }
        }

    def apply(self, params, observations, enabled: Optional[Tuple[bool, ...]] = None):
        enabled = _normalize_enabled(enabled, len(self.virtual_sensor_model))
        zs, trils = [], []
        for i, vs in enumerate(self.virtual_sensor_model):
            if not enabled[i]:
                continue
            z, tril = vs.apply(params["virtual_sensor_model"][str(i)], observations)
            zs.append(z)
            trils.append(tril)
        unimodal_states = jnp.stack(zs)
        unimodal_trils = jnp.stack(trils)
        unimodal_covs = unimodal_trils @ jnp.swapaxes(unimodal_trils, -1, -2)

        if len(zs) == 1:
            # Literal unimodal_kf.py:81-83: returns the covariance.
            return unimodal_states[0], unimodal_covs[0]

        # Elementwise "precision" (unimodal_kf.py:85) — replicated literally.
        precisions = 1.0 / (unimodal_trils + 1e-9)
        weights = jnp.diagonal(precisions, axis1=-2, axis2=-1)  # (K, N, D)
        mean = weighted_average(unimodal_states, weights)
        cov = jnp.linalg.inv(jnp.sum(precisions, axis=0) + 1e-9)
        return mean, cov
