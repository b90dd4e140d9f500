"""Whole-trajectory fused PF step kernel: the N-small serving endgame.

Round 4's N=1 attribution (docs/PERFORMANCE.md) showed the sequential filter
step is occupancy/op-count bound: ~49 tiny XLA ops x ~0.16us fixed cost per
step, with arithmetic content of only ~2-3us. Round 5 hoisted the RNG and
control-encoder work out of the scan; this module removes the dispatch
overhead entirely by running the ENTIRE forward_loop as ONE Pallas kernel:

  - grid = (N, T); TPU grid steps execute sequentially, so the particle
    belief lives in VMEM scratch across the whole trajectory (the scan carry
    becomes a scratch buffer; t==0 loads it, t==T-1 stores it).
  - all network weights are packed into stacked operands with constant
    index maps, so Pallas keeps them VMEM-resident across steps instead of
    re-dispatching ~30 small HBM-resident matmuls per step.
  - activations are FEATURE-MAJOR (features in sublanes, particles in
    lanes), which makes every dense layer a (64,64)x(64,M_pad) MXU matmul
    with no transposes anywhere in the kernel.
  - the step tail (weight update + estimate + multinomial resample) is the
    same math as ops/pallas_pf.py::_pf_kernel at R=1 — reused verbatim so
    the tail stays semantics-identical to the frozen bitwise kernel.

The kernel computes the exact reference recursion (torchfilter PF semantics,
crossmodal raw-logsumexp fusion — filtering/fusion.py), but re-associates fp
reductions (the concat->dense layers are split into per-source partial
matmuls whose carry-independent halves are hoisted out of the scan, like
the round-2 folded encoder tail). Estimates match the unfused path to fp
tolerance; tie-level resampling draws can flip, same class as the
documented large-M cumsum reassociation. Serving-only knob:
MMF_TPU_FUSED_STEP=1 via StatefulFilter, or ParticleFilterDef(fused_step=
True); anything the packer does not recognize falls back to the normal
scan silently (use packing_report() to see why).

Supported: eval mode (resampling on), multinomial (alpha >= 1),
weighted_average estimate, units=64 task nets (DynamicsNet +
LogLikelihoodNet trunks, optionally under CrossmodalPFMeasurementDef with
a PFWeightNet gate), constant diagonal process noise, M <= 512.
Reference behavior covered: crossmodal/door_models/pf.py + crossmodal_pf.py
measurement fusion; torchfilter ParticleFilter eval recursion.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30
UNITS = 64
FUSED_M_MAX = 512  # tail is the O(M^2) small-kernel math; stay well in VMEM

_HIGH = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Packing: flax param trees -> stacked, transposed, padded weight operands
# ---------------------------------------------------------------------------


def _wt(kernel, out_rows: int = UNITS, in_cols: int = UNITS):
    """Transpose a flax (in, out) Dense kernel to feature-major (out, in),
    zero-padded to (out_rows, in_cols)."""
    w = jnp.asarray(kernel).T
    o, i = w.shape
    return jnp.pad(w, ((0, out_rows - o), (0, in_cols - i)))


def _bias(b, rows: int = UNITS):
    b = jnp.asarray(b)
    return jnp.pad(b, (0, rows - b.shape[0]))


def _mlp_layers(p):
    """MLPEncoder subtree -> 3 (W, b) pairs: dense, resblock.block1/2."""
    return [
        (p["dense"]["kernel"], p["dense"]["bias"]),
        (p["resblock"]["block1"]["kernel"], p["resblock"]["block1"]["bias"]),
        (p["resblock"]["block2"]["kernel"], p["resblock"]["block2"]["bias"]),
    ]


class _Unsupported(Exception):
    pass


def _require(cond: bool, why: str):
    if not cond:
        raise _Unsupported(why)


def _pack_dynamics(dyn_params, d: int):
    """DynamicsNet trunk -> (Wd (11,64,64), Bd (64,11), W_in_ctrl (64,64),
    b_in (64,)). The dense_in layer is split: control half runs in the
    hoisted pre-scan batch, state half in-kernel (models/task_nets.py:136
    concat order is (control, state))."""
    for key in ("state_layers", "shared_dense_in", "shared_resblock0",
                "shared_resblock1", "shared_resblock2", "shared_dense_out"):
        _require(key in dyn_params, f"dynamics missing {key}")
    kin = jnp.asarray(dyn_params["shared_dense_in"]["kernel"])
    _require(kin.shape == (2 * UNITS, UNITS),
             f"dynamics dense_in {kin.shape} != (128, 64) (units != 64?)")
    layers = _mlp_layers(dyn_params["state_layers"])
    layers.append((kin[UNITS:], jnp.zeros((UNITS,))))  # state half; bias in row
    for r in range(3):
        rb = dyn_params[f"shared_resblock{r}"]
        layers.append((rb["block1"]["kernel"], rb["block1"]["bias"]))
        layers.append((rb["block2"]["kernel"], rb["block2"]["bias"]))
    out = dyn_params["shared_dense_out"]
    _require(jnp.asarray(out["kernel"]).shape == (UNITS, d + 1),
             "dynamics dense_out is not (units, D+1)")
    layers.append((out["kernel"], out["bias"]))
    wd = jnp.stack([_wt(w) for w, _ in layers])
    bd = jnp.stack([_bias(b) for _, b in layers], axis=1)  # (64, 11)
    w_in_ctrl = kin[:UNITS]  # (64, 64), flax (in, out) orientation
    b_in = jnp.asarray(dyn_params["shared_dense_in"]["bias"])
    return wd, bd, w_in_ctrl, b_in


def _pack_measurement(mm_params, d: int):
    """LogLikelihoodNet trunk -> (Wm (9,64,64), Bm (64,9), W_in_obs (F,64),
    b_in (64,), F). dense_in split as in _pack_dynamics; concat order there
    is (obs_features, state_features) — task_nets.py:213."""
    for key in ("state_layers", "shared_dense_in", "shared_resblock0",
                "shared_resblock1", "shared_dense_out"):
        _require(key in mm_params, f"measurement missing {key}")
    kin = jnp.asarray(mm_params["shared_dense_in"]["kernel"])
    _require(kin.ndim == 2 and kin.shape[1] == UNITS and
             kin.shape[0] > UNITS, f"measurement dense_in {kin.shape}")
    f = kin.shape[0] - UNITS
    layers = _mlp_layers(mm_params["state_layers"])
    layers.append((kin[f:], jnp.zeros((UNITS,))))  # state half
    for r in range(2):
        rb = mm_params[f"shared_resblock{r}"]
        layers.append((rb["block1"]["kernel"], rb["block1"]["bias"]))
        layers.append((rb["block2"]["kernel"], rb["block2"]["bias"]))
    out = mm_params["shared_dense_out"]
    _require(jnp.asarray(out["kernel"]).shape == (UNITS, 1),
             "measurement dense_out is not (units, 1)")
    layers.append((out["kernel"], out["bias"]))
    wm = jnp.stack([_wt(w) for w, _ in layers])
    bm = jnp.stack([_bias(b) for _, b in layers], axis=1)  # (64, 9)
    return wm, bm, kin[:f], jnp.asarray(mm_params["shared_dense_in"]["bias"]), f


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _fused_kernel(parts0_ref, lw0_ref, noise_ref, u_ref, rows_ref, gate_ref,
                  wd_ref, bd_ref, wm_ref, bm_ref,
                  est_ref, outp_ref, outlw_ref,
                  parts_s, lw_s, *, m_real: int, d: int, K: int, t_total: int):
    """One (n, t) grid step = one full filter timestep for batch row n.

    parts0_ref (1, D, M) / lw0_ref (1, 1, M): initial belief (read at t==0).
    noise_ref (1, 1, D, M): pre-drawn q_diag-scaled dynamics noise.
    u_ref (1, 1, 1, M): resampling uniforms. (Singleton dims exist so every
        VMEM block's last two dims equal the array's — a Mosaic tiling
        requirement once N > 1.)
    rows_ref (1, 1, 64, 1+K): hoisted dense_in contributions — col 0 the
        dynamics (control@W_ctrl + b_in) row, col 1+k modality k's
        (obs_features@W_obs + b_in) row.
    gate_ref (1, 1, K) SMEM: per-step modality log-weights (0 when ungated).
    wd_ref (11, 64, 64) / bd_ref (64, 11): packed dynamics trunk.
    wm_ref (K, 9, 64, 64) / bm_ref (K, 64, 9): packed measurement trunks.
    est_ref (1, 1, 128): this step's estimate row.
    outp_ref / outlw_ref: final belief (written at t == T-1).
    parts_s (1, D, M) / lw_s (1, M): the belief carry (VMEM scratch; TPU
        grid steps run sequentially, so this persists across t).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        parts_s[:] = parts0_ref[:]
        lw_s[:] = lw0_ref[0]

    parts2d = parts_s[0]  # (D, M) feature-major
    m_pad = parts2d.shape[-1]

    def mm(w, v):
        return jax.lax.dot_general(
            w, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGH,
        )

    def pad_rows(v):
        return jnp.concatenate(
            [v, jnp.zeros((UNITS - v.shape[0], m_pad), jnp.float32)], axis=0
        )

    def dense(wref, bref, i, v):
        return mm(wref[i], v) + bref[:, i:i + 1]

    def resblock(wref, bref, i, v):
        h = jnp.maximum(dense(wref, bref, i, v), 0.0)
        h = jnp.maximum(dense(wref, bref, i + 1, h), 0.0)
        return v + h

    rows = rows_ref[0, 0]  # (64, 1+K)

    # --- dynamics trunk (task_nets.py DynamicsNet.from_control_features) ---
    h = jnp.maximum(dense(wd_ref, bd_ref, 0, pad_rows(parts2d)), 0.0)
    h = resblock(wd_ref, bd_ref, 1, h)
    z = mm(wd_ref[3], h) + rows[:, 0:1]  # dense_in: no activation (ref quirk)
    z = resblock(wd_ref, bd_ref, 4, z)
    z = resblock(wd_ref, bd_ref, 6, z)
    z = resblock(wd_ref, bd_ref, 8, z)
    o = dense(wd_ref, bd_ref, 10, z)  # rows 0..d-1 direction, row d gate logit
    newp = (
        parts2d + o[0:d] * jax.nn.sigmoid(o[d:d + 1]) + noise_ref[0, 0]
    )  # (D, M)

    # --- per-modality measurement trunks + raw-logsumexp fusion ---
    newx = pad_rows(newp)
    lls = []
    for k in range(K):

        def mdense(i, v, k=k):
            return mm(wm_ref[k, i], v) + bm_ref[k, :, i:i + 1]

        def mres(i, v, mdense=mdense):
            h = jnp.maximum(mdense(i, v), 0.0)
            h = jnp.maximum(mdense(i + 1, h), 0.0)
            return v + h

        hm = jnp.maximum(mdense(0, newx), 0.0)
        hm = mres(1, hm)
        zm = jnp.maximum(mm(wm_ref[k, 3], hm) + rows[:, 1 + k:2 + k], 0.0)
        zm = mres(4, zm)
        zm = mres(6, zm)
        llk = mdense(8, zm)  # (64, M), row 0 is the log-likelihood
        lls.append(llk[0:1] + gate_ref[0, 0, 0, k])
    if K == 1:
        ll = lls[0]  # exact: logsumexp over one term is the identity
    else:
        mx = lls[0]
        for v in lls[1:]:
            mx = jnp.maximum(mx, v)
        ll = mx + jnp.log(sum(jnp.exp(v - mx) for v in lls))

    # --- tail: ops/pallas_pf.py::_pf_kernel math at R=1 ---
    parts3d = newp[None]  # (1, D, M)
    lw = lw_s[:] + ll  # (1, M); padding lanes stay ~NEG_INF
    lw_max = jnp.max(lw, axis=1, keepdims=True)
    probs_unnorm = jnp.exp(lw - lw_max)
    total = jnp.sum(probs_unnorm, axis=1, keepdims=True)
    probs = probs_unnorm / total

    est = jax.lax.dot_general(
        parts3d, probs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )  # (1, D)
    est_ref[:] = jnp.concatenate(
        [est, jnp.zeros((1, est_ref.shape[-1] - d), jnp.float32)], axis=1
    )[None, None]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 0)
    col_ids2 = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 1)
    lower_tri = (col_ids2 <= row_ids).astype(jnp.float32)
    cdf = jax.lax.dot_general(
        probs, lower_tri,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )  # (1, M)
    uniforms = u_ref[0, 0]  # (1, M)
    mask = (cdf[:, None, :] < uniforms[:, :, None]).astype(jnp.float32)
    indices = jnp.sum(mask, axis=2).astype(jnp.int32)
    indices = jnp.minimum(indices, m_real - 1)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad, m_pad), 2)
    onehot = (col_ids == indices[:, :, None]).astype(jnp.float32)
    resampled = jax.lax.dot_general(
        parts3d, onehot,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HIGH,
    )  # (1, D, M)
    parts_s[:] = resampled
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
    lw_s[:] = jnp.where(lane_ids < m_real, -jnp.log(float(m_real)), NEG_INF)

    @pl.when(t == t_total - 1)
    def _():
        outp_ref[:] = parts_s[:]
        outlw_ref[:] = lw_s[:][None]


# ---------------------------------------------------------------------------
# Host-side wrapper
# ---------------------------------------------------------------------------

_last_fallback_reason: Optional[str] = None


def packing_report() -> Optional[str]:
    """Why the last try_fused_forward call fell back (None = it ran)."""
    return _last_fallback_reason


def _normalize_modalities(defn, params, features_seq, enabled):
    """-> (mm_param_list, feature_list, gate_lw (T, N, K) or None)."""
    mm = defn.measurement_model
    if hasattr(mm, "measurement_models"):  # CrossmodalPFMeasurementDef
        en = enabled if enabled is not None else (True,) * len(
            mm.measurement_models
        )
        mm_params, feats = [], []
        for i, sub in enumerate(mm.measurement_models):
            if not en[i]:
                continue
            _require(hasattr(sub, "net"), "submodel without net")
            mm_params.append(params["measurement_model"]["measurement_models"][str(i)])
            feats.append(features_seq[str(i)])
        _require(len(mm_params) >= 1, "no enabled modalities")
        gate = None
        if mm.crossmodal_weight_model is not None:
            log_w = features_seq["_log_weights"]  # (T, N, K_full)
            idx = jnp.array([i for i, e in enumerate(en) if e])
            gate = log_w[..., idx]
        return mm_params, feats, gate
    # plain MeasurementDef
    _require(not isinstance(features_seq, dict), "unrecognized feature pytree")
    return [params["measurement_model"]], [features_seq], None


def try_fused_forward(defn, params, belief, features_seq, ctrl_feat_seq,
                      eps_seq, uni_seq, enabled, *, interpret: bool):
    """Run forward_loop as one fused kernel, or return None (caller falls
    back to the scan path). Inputs are pf.forward_loop's hoisted arrays:
    features_seq (per-modality (T, N, F) + optional '_log_weights'),
    ctrl_feat_seq (T, N, units), eps_seq (T, N*M, D), uni_seq (T, N, M)."""
    global _last_fallback_reason
    try:
        out = _fused_forward(defn, params, belief, features_seq,
                             ctrl_feat_seq, eps_seq, uni_seq, enabled,
                             interpret=interpret)
        _last_fallback_reason = None
        return out
    except _Unsupported as exc:
        _last_fallback_reason = str(exc)
        return None


def _fused_forward(defn, params, belief, features_seq, ctrl_feat_seq,
                   eps_seq, uni_seq, enabled, *, interpret: bool):
    particles, log_weights = belief.particles, belief.log_weights
    n, m, d = particles.shape
    t = jax.tree_util.tree_leaves(features_seq)[0].shape[0]
    _require(m <= FUSED_M_MAX, f"M={m} > {FUSED_M_MAX}")
    _require(defn.estimation_method == "weighted_average", "estimation method")
    _require(defn.soft_resample_alpha >= 1.0, "soft resampling")
    _require(ctrl_feat_seq is not None, "control hoist off/unsupported")
    _require(eps_seq is not None and uni_seq is not None, "rng hoist off")
    dyn_net = defn.dynamics_model.net
    _require(hasattr(dyn_net, "q_scale_tril_diag"),
             "dynamics noise is not constant-diagonal")
    _require(getattr(dyn_net, "units", None) == UNITS, "dynamics units != 64")
    _require(ctrl_feat_seq.shape[-1] == UNITS, "control features != 64")

    mm_params, feats, gate = _normalize_modalities(
        defn, params, features_seq, enabled
    )
    K = len(mm_params)

    wd, bd, w_in_ctrl, b_in_dyn = _pack_dynamics(params["dynamics_model"], d)
    packed_m = [_pack_measurement(p, d) for p in mm_params]
    for (_, _, w_obs, _, f), feat in zip(packed_m, feats):
        _require(feat.ndim == 3 and feat.shape[-1] == f,
                 f"feature width {feat.shape} != dense_in obs rows {f}")
    wm = jnp.stack([pm[0] for pm in packed_m])  # (K, 9, 64, 64)
    bm = jnp.stack([pm[1] for pm in packed_m])  # (K, 64, 9)

    # --- hoisted per-step dense_in contributions (carry-independent) ---
    dyn_rows = (
        jnp.einsum("tnu,uv->tnv", ctrl_feat_seq, w_in_ctrl) + b_in_dyn
    )  # (T, N, 64)
    meas_rows = [
        jnp.einsum("tnf,fv->tnv", feat, pm[2]) + pm[3]
        for pm, feat in zip(packed_m, feats)
    ]
    rows = jnp.stack([dyn_rows] + meas_rows, axis=-1)  # (T, N, 64, 1+K)

    gate_arr = (
        gate if gate is not None else jnp.zeros((t, n, K), jnp.float32)
    ).astype(jnp.float32)[:, :, None, :]  # (T, N, 1, K)

    # --- noise / uniforms / belief, feature-major + padded ---
    q_diag = jnp.asarray(dyn_net.q_scale_tril_diag, jnp.float32)
    m_pad = _round_up(m, 128)
    noise = (eps_seq.reshape(t, n, m, d) * q_diag).transpose(0, 1, 3, 2)
    noise = jnp.pad(noise, ((0, 0), (0, 0), (0, 0), (0, m_pad - m)))
    unis = jnp.pad(
        uni_seq, ((0, 0), (0, 0), (0, m_pad - m))
    )[:, :, None, :]  # (T, N, 1, M_pad)
    parts0 = jnp.pad(
        particles.astype(jnp.float32).transpose(0, 2, 1),
        ((0, 0), (0, 0), (0, m_pad - m)),
    )  # (N, D, M_pad)
    lw0 = jnp.pad(
        log_weights.astype(jnp.float32), ((0, 0), (0, m_pad - m)),
        constant_values=NEG_INF,
    )[:, None, :]  # (N, 1, M_pad)

    kernel = functools.partial(
        _fused_kernel, m_real=m, d=d, K=K, t_total=t
    )
    est, outp, outlw = pl.pallas_call(
        kernel,
        grid=(n, t),
        in_specs=[
            pl.BlockSpec((1, d, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, m_pad), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, m_pad), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, UNITS, 1 + K), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, K), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((11, UNITS, UNITS), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((UNITS, 11), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 9, UNITS, UNITS), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, UNITS, 9), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, 128), lambda i, j: (j, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, n, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, d, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, m_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d, m_pad), jnp.float32),
            pltpu.VMEM((1, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(parts0, lw0, noise, unis, rows, gate_arr, wd, bd, wm, bm)

    from ..types import ParticleBelief

    new_belief = ParticleBelief(
        outp[:, :, :m].transpose(0, 2, 1), outlw[:, 0, :m]
    )
    return new_belief, est[:, :, 0, :d]
