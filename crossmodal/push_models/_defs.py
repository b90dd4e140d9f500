"""Push-task filter-def builders (state_dim=2, control_dim=7).

Deltas from the door task (SURVEY §2.3):
  - Q_tril = chol(diag(.02, .02)); single dynamics variant
    (crossmodal/push_models/dynamics.py:16-19)
  - image encoder: spanning-avg-pool variant for the virtual sensor
    (kf.py:49-52) and LSTM (lstm.py:25-27); flatten variant for the PF
    measurement model (pf.py:43-46)
  - PF gate uses 1 fusion resblock (crossmodal_pf.py fusion_layers)
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

from multimodalfilter_tpu.filtering import (
    DynamicsDef,
    KFWeightDef,
    MeasurementDef,
    PFWeightDef,
    VirtualSensorDef,
)
from multimodalfilter_tpu.models import (
    DynamicsNet,
    KFWeightNet,
    LogLikelihoodNet,
    PFWeightNet,
    VirtualSensorNet,
)

STATE_DIM = 2
CONTROL_DIM = 7
ALL_MODALITIES = ("image", "pos", "sensors")

Q_DIAG = tuple(math.sqrt(v) for v in (0.02, 0.02))


def _mods(modalities) -> Tuple[str, ...]:
    return tuple(m for m in ALL_MODALITIES if m in set(modalities))


def dynamics_def(units: int = 64) -> DynamicsDef:
    return DynamicsDef(
        DynamicsNet(state_dim=STATE_DIM, q_scale_tril_diag=Q_DIAG, units=units),
        state_dim=STATE_DIM,
        control_dim=CONTROL_DIM,
    )


def measurement_def(units: int = 64, modalities=ALL_MODALITIES) -> MeasurementDef:
    return MeasurementDef(
        LogLikelihoodNet(STATE_DIM, _mods(modalities), units, spanning_avg_pool=False),
        state_dim=STATE_DIM,
    )


def virtual_sensor_def(
    units: int = 64,
    modalities=ALL_MODALITIES,
    add_R_noise: float = 1e-6,
    noise_R_tril: Optional[Tuple[float, ...]] = None,
) -> VirtualSensorDef:
    return VirtualSensorDef(
        VirtualSensorNet(
            STATE_DIM,
            _mods(modalities),
            units,
            add_R_noise=add_R_noise,
            spanning_avg_pool=True,
            noise_R_tril_diag=noise_R_tril,
        ),
        state_dim=STATE_DIM,
    )


def kf_weight_def(units: int = 64, state_dim: int = STATE_DIM) -> KFWeightDef:
    return KFWeightDef(
        KFWeightNet(state_dim=state_dim, modality_count=2, units=units),
        state_dim=state_dim,
    )


def pf_weight_def(know_image_blackout: bool = False, units: int = 64) -> PFWeightDef:
    return PFWeightDef(
        PFWeightNet(modality_count=2, units=units, num_fusion_resblocks=1),
        modality_count=2,
        know_image_blackout=know_image_blackout,
    )
