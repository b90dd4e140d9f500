"""Hand-computed checks of the fusion math quirks that define the
reference's numerics (SURVEY §2.1 "behavioral details that MUST be
reproduced"): epsilon placement, covariance mixing formulas, elementwise
precision, and the equal-weight PF path."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalfilter_tpu.filtering.fusion import (
    CrossmodalPFMeasurementDef,
    UnimodalVirtualSensorDef,
    _calculate_weighted_states,
    weighted_average,
)


def test_weighted_average_epsilon():
    """weights / (sum + 1e-9) then weighted sum (utility.py:4-11)."""
    preds = jnp.asarray([[[2.0]], [[4.0]]])  # (K=2, N=1, D=1)
    weights = jnp.asarray([[[1.0]], [[3.0]]])
    out = weighted_average(preds, weights)
    expected = (1 * 2 + 3 * 4) / (4 + 1e-9)
    np.testing.assert_allclose(float(out[0, 0]), expected, rtol=1e-7)

    # All-zero weights do not NaN (the epsilon's purpose).
    out = weighted_average(preds, jnp.zeros_like(weights))
    assert np.isfinite(float(out[0, 0]))


def test_crossmodal_kf_covariance_mixing():
    """Fused cov = sum_k (w w^T) ⊙ Σ_k with RAW weights; fused mean uses
    normalized weights (crossmodal_kf.py:153-167)."""
    rng = np.random.default_rng(0)
    k, n, d = 2, 3, 2
    w = jnp.asarray(rng.uniform(0.2, 0.8, (k, n, d)).astype(np.float32))
    means = jnp.asarray(rng.normal(size=(k, n, d)).astype(np.float32))
    covs = jnp.asarray(rng.normal(size=(k, n, d, d)).astype(np.float32))

    fused_mean, fused_cov = _calculate_weighted_states(w, means, covs)

    w_np, means_np, covs_np = map(np.asarray, (w, means, covs))
    norm = w_np / (w_np.sum(axis=0) + 1e-9)
    expected_mean = (norm * means_np).sum(axis=0)
    expected_cov = np.zeros((n, d, d), np.float32)
    for ki in range(k):
        for ni in range(n):
            outer = np.outer(w_np[ki, ni], w_np[ki, ni])
            expected_cov[ni] += outer * covs_np[ki, ni]
    np.testing.assert_allclose(np.asarray(fused_mean), expected_mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(fused_cov), expected_cov, rtol=1e-5)


class _ConstVirtualSensor:
    """Duck-typed virtual sensor returning fixed (z, tril)."""

    def __init__(self, z, tril):
        self.z, self.tril = jnp.asarray(z), jnp.asarray(tril)

    def init(self, key):
        return {}

    def apply(self, params, observations, enabled=None):
        return self.z, self.tril


def test_unimodal_virtual_sensor_elementwise_precision():
    """Precision = elementwise 1/(tril + 1e-9) — NOT a matrix inverse
    (unimodal_kf.py:85); fused cov = inv(sum precision + 1e-9)."""
    z0 = np.array([[1.0, 2.0]], np.float32)
    z1 = np.array([[3.0, 6.0]], np.float32)
    tril0 = np.array([[[0.5, 0.0], [0.0, 1.0]]], np.float32)
    tril1 = np.array([[[1.0, 0.0], [0.0, 0.5]]], np.float32)

    fusion = UnimodalVirtualSensorDef(
        virtual_sensor_model=(
            _ConstVirtualSensor(z0, tril0),
            _ConstVirtualSensor(z1, tril1),
        ),
        state_dim=2,
    )
    params = {"virtual_sensor_model": {"0": {}, "1": {}}}
    mean, cov = fusion.apply(params, observations={})

    # Weights per dim = diag of elementwise reciprocal of tril.
    w0 = 1.0 / (np.diag(tril0[0]) + 1e-9)
    w1 = 1.0 / (np.diag(tril1[0]) + 1e-9)
    norm0, norm1 = w0 / (w0 + w1 + 1e-9), w1 / (w0 + w1 + 1e-9)
    expected_mean = norm0 * z0[0] + norm1 * z1[0]
    np.testing.assert_allclose(np.asarray(mean[0]), expected_mean, rtol=1e-5)

    # Fused "cov" = inv(sum of elementwise-reciprocal matrices + 1e-9) —
    # including the giant off-diagonals from 1/(0 + 1e-9).
    prec = 1.0 / (tril0[0] + 1e-9) + 1.0 / (tril1[0] + 1e-9)
    expected_cov = np.linalg.inv(prec + 1e-9)
    np.testing.assert_allclose(
        np.asarray(cov[0]), expected_cov, rtol=1e-3, atol=1e-6
    )


def test_unimodal_virtual_sensor_single_enabled_returns_covariance():
    """With one modality enabled the reference returns tril @ tril^T — a
    covariance in the scale_tril slot (unimodal_kf.py:81-83), replicated."""
    z0 = np.array([[1.0, 2.0]], np.float32)
    tril0 = np.array([[[0.5, 0.0], [0.3, 1.0]]], np.float32)
    fusion = UnimodalVirtualSensorDef(
        virtual_sensor_model=(
            _ConstVirtualSensor(z0, tril0),
            _ConstVirtualSensor(z0, tril0),
        ),
        state_dim=2,
    )
    params = {"virtual_sensor_model": {"0": {}, "1": {}}}
    mean, out = fusion.apply(params, observations={}, enabled=(True, False))
    np.testing.assert_allclose(np.asarray(mean), z0, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out[0]), tril0[0] @ tril0[0].T, rtol=1e-6
    )


class _ConstMeasurement:
    def __init__(self, ll):
        self.ll = jnp.asarray(ll)

    def init(self, key):
        return {}

    def log_likelihoods(self, params, states, observations, enabled=None):
        return self.ll

    def encode_observations(self, params, observations, enabled=None):
        return observations

    def log_likelihoods_from_features(self, params, states, features, enabled=None):
        return self.ll


def test_pf_fusion_equal_weights_is_plain_logsumexp():
    """crossmodal_weight_model=None -> logsumexp over the RAW per-modality
    log-likelihoods (crossmodal_pf.py:136-139; the reference's discarded
    max-normalization is NOT applied)."""
    ll0 = np.array([[0.0, 1.0, -2.0]], np.float32)  # (N=1, M=3)
    ll1 = np.array([[1.0, -1.0, 0.5]], np.float32)
    fusion = CrossmodalPFMeasurementDef(
        measurement_models=(_ConstMeasurement(ll0), _ConstMeasurement(ll1)),
        crossmodal_weight_model=None,
        state_dim=3,
    )
    params = {"measurement_models": {"0": {}, "1": {}}}
    out = fusion.log_likelihoods(params, jnp.zeros((1, 3, 3)), observations={})
    expected = np.logaddexp(ll0, ll1)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-6)

    # Subset-enabled path drops the disabled modality entirely.
    out = fusion.log_likelihoods(
        params, jnp.zeros((1, 3, 3)), observations={}, enabled=(False, True)
    )
    np.testing.assert_allclose(np.asarray(out), ll1, rtol=1e-6)
