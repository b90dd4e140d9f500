"""Training-dynamics parity vs torch (VERDICT r4 missing #1): run an
abbreviated door-EKF curriculum in BOTH frameworks — this repo's JAX
training stack and the reference-faithful torch mirror
(scripts/parity/torch_door_ekf.py) — from identical copied initial weights
on identical synthetic data with identical batch-index streams, and assert
the per-phase eval RMSE agrees.

What the tolerances mean (measured, /tmp + docs/parity_training_r5.md):
  - init + the two dynamics-only phases (pure MLP paths) track to ~1e-3
    relative — the frameworks follow the SAME optimization trajectory;
  - the conv-heavy virtual-sensor phase accumulates framework conv
    arithmetic differences (~2% RMSE);
  - the short e2e phase sits in a flat/noisy region, so x/y wander more
    (tolerance reflects measured run-to-run spread, not looseness of the
    claim — theta, the observable dimension, stays within a few %).
"""

import os
import sys

import pytest

sys.path.insert(0, "scripts/parity")


@pytest.fixture(scope="module")
def parity_rows(tmp_path_factory):
    from train_dynamics_parity import run_parity

    workdir = str(tmp_path_factory.mktemp("parity"))
    prev = os.environ.get("MMF_TPU_EVAL_DEVICE_THROUGHPUT")
    os.environ["MMF_TPU_EVAL_DEVICE_THROUGHPUT"] = "0"
    try:
        # use_cpu=False: conftest already pinned the CPU backend; calling
        # jax.config.update after backend init is fine but unnecessary.
        rows = run_parity(full=False, synth_traj=4, synth_t=48,
                          workdir=workdir, use_cpu=False)
    finally:
        if prev is None:
            os.environ.pop("MMF_TPU_EVAL_DEVICE_THROUGHPUT", None)
        else:
            os.environ["MMF_TPU_EVAL_DEVICE_THROUGHPUT"] = prev
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], {})[r["framework"]] = r
    return by_phase


def _rel(a, b):
    return abs(a - b) / max(abs(a), abs(b), 1e-9)


def test_initial_weights_identical(parity_rows):
    init = parity_rows["init (copied weights)"]
    for k in ("theta_rmse_deg", "x_rmse_cm", "y_rmse_cm"):
        assert _rel(init["jax"][k], init["torch"][k]) < 1e-4, (k, init)


def test_dynamics_phases_track_identically(parity_rows):
    """Single-step + recurrent dynamics training (MLP-only paths): the two
    frameworks' optimization trajectories should be near-identical."""
    for phase in ("phase0 dyn-single e2", "phase1 dyn-rec L4 e1"):
        row = parity_rows[phase]
        for k in ("theta_rmse_deg", "x_rmse_cm", "y_rmse_cm"):
            assert _rel(row["jax"][k], row["torch"][k]) < 5e-3, (phase, k, row)


def test_virtual_sensor_phase_tracks(parity_rows):
    row = parity_rows["phase2 vsensor e2"]
    for k in ("theta_rmse_deg", "x_rmse_cm", "y_rmse_cm"):
        assert _rel(row["jax"][k], row["torch"][k]) < 0.10, (k, row)


def test_e2e_phase_tracks(parity_rows):
    row = parity_rows["phase3 e2e L4 e1"]
    # theta is the well-conditioned dimension on this task; x/y sit in a
    # flat region after one abbreviated epoch (see module docstring).
    assert _rel(row["jax"]["theta_rmse_deg"],
                row["torch"]["theta_rmse_deg"]) < 0.10, row
    for k in ("x_rmse_cm", "y_rmse_cm"):
        assert _rel(row["jax"][k], row["torch"][k]) < 0.40, (k, row)


def test_both_frameworks_learn(parity_rows):
    """Both sides improve hugely from the untrained init — the parity claim
    is about matched LEARNING, not just matched inference."""
    init = parity_rows["init (copied weights)"]
    after_dyn = parity_rows["phase0 dyn-single e2"]
    for fw in ("jax", "torch"):
        assert after_dyn[fw]["theta_rmse_deg"] < 0.25 * init[fw]["theta_rmse_deg"]
