"""The 11 push-task model classes (API parity with
``crossmodal/push_models/__init__.py:5-21``).

Two latent reference bugs are implemented as their evident intent (SURVEY §7,
"known reference bugs"):
  - PushMeasurementCrossmodalKalmanFilter passes the PushDynamicsModel CLASS,
    not an instance (push crossmodal_kf.py:175) — we instantiate it.
  - PushMeasurementUnimodalKalmanFilter omits the required state_dim kwarg
    (push unimodal_kf.py:40-47) — we pass state_dim=2.
"""

from __future__ import annotations

from multimodalfilter_tpu.filtering import (
    CrossmodalKFDef,
    CrossmodalPFMeasurementDef,
    CrossmodalVirtualSensorDef,
    LSTMFilterDef,
    ParticleFilterDef,
    UnimodalKFDef,
    UnimodalVirtualSensorDef,
    VirtualSensorEKFDef,
)
from multimodalfilter_tpu.filtering.wrappers import StatefulFilter
from multimodalfilter_tpu.models import LSTMFilterNet

from ..tasks import PushTask
from . import _defs

PushDynamicsModel = _defs.dynamics_def
PushMeasurementModel = _defs.measurement_def
PushVirtualSensorModel = _defs.virtual_sensor_def
PushCrossmodalKalmanFilterWeightModel = _defs.kf_weight_def
PushCrossmodalWeightModel = _defs.pf_weight_def


def _two_child_ekfs():
    return (
        VirtualSensorEKFDef(
            dynamics_model=PushDynamicsModel(),
            virtual_sensor_model=PushVirtualSensorModel(modalities={"image"}),
            state_dim=_defs.STATE_DIM,
        ),
        VirtualSensorEKFDef(
            dynamics_model=PushDynamicsModel(),
            virtual_sensor_model=PushVirtualSensorModel(
                modalities={"pos", "sensors"}
            ),
            state_dim=_defs.STATE_DIM,
        ),
    )


class PushParticleFilter(StatefulFilter, PushTask.Filter):
    """Plain PF (reference push_models/pf.py:14-27)."""

    def __init__(self):
        super().__init__(
            ParticleFilterDef(
                dynamics_model=PushDynamicsModel(),
                measurement_model=PushMeasurementModel(),
                state_dim=_defs.STATE_DIM,
            )
        )


class PushKalmanFilter(StatefulFilter, PushTask.Filter):
    """Virtual-sensor EKF (reference push_models/kf.py:14-28)."""

    def __init__(self, dynamics_model=None, virtual_sensor_model=None):
        if dynamics_model is None and virtual_sensor_model is None:
            dynamics_model = PushDynamicsModel()
            virtual_sensor_model = PushVirtualSensorModel()
        super().__init__(
            VirtualSensorEKFDef(
                dynamics_model=dynamics_model,
                virtual_sensor_model=virtual_sensor_model,
                state_dim=_defs.STATE_DIM,
            )
        )


class PushCrossmodalParticleFilter(StatefulFilter, PushTask.Filter):
    """Crossmodal PF (reference push_models/crossmodal_pf.py:18-40)."""

    def __init__(self, know_image_blackout: bool = False):
        super().__init__(
            ParticleFilterDef(
                dynamics_model=PushDynamicsModel(),
                measurement_model=CrossmodalPFMeasurementDef(
                    measurement_models=(
                        PushMeasurementModel(modalities={"image"}),
                        PushMeasurementModel(modalities={"pos", "sensors"}),
                    ),
                    crossmodal_weight_model=PushCrossmodalWeightModel(
                        know_image_blackout=know_image_blackout
                    ),
                    state_dim=_defs.STATE_DIM,
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class PushCrossmodalParticleFilterSeq5(PushCrossmodalParticleFilter, PushTask.Filter):
    """Blackout-aware crossmodal PF (reference push_models/crossmodal_pf.py:43-49)."""

    def __init__(self):
        super().__init__(know_image_blackout=True)


class PushUnimodalParticleFilter(StatefulFilter, PushTask.Filter):
    """Equal-weight PF fusion (reference push_models/unimodal_pf.py:9-29)."""

    def __init__(self):
        super().__init__(
            ParticleFilterDef(
                dynamics_model=PushDynamicsModel(),
                measurement_model=CrossmodalPFMeasurementDef(
                    measurement_models=(
                        PushMeasurementModel(modalities={"image"}),
                        PushMeasurementModel(modalities={"pos", "sensors"}),
                    ),
                    crossmodal_weight_model=None,
                    state_dim=_defs.STATE_DIM,
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class PushCrossmodalKalmanFilter(StatefulFilter, PushTask.Filter):
    """Crossmodal EKF fusion (reference push_models/crossmodal_kf.py:20-98)."""

    def __init__(self, know_image_blackout: bool = False):
        super().__init__(
            CrossmodalKFDef(
                filter_models=_two_child_ekfs(),
                crossmodal_weight_model=PushCrossmodalKalmanFilterWeightModel(
                    state_dim=_defs.STATE_DIM
                ),
                state_dim=_defs.STATE_DIM,
                know_image_blackout=know_image_blackout,
            )
        )


class PushMeasurementCrossmodalKalmanFilter(StatefulFilter, PushTask.Filter):
    """Single EKF over crossmodal virtual-sensor fusion
    (reference push_models/crossmodal_kf.py:170-186)."""

    def __init__(self):
        super().__init__(
            VirtualSensorEKFDef(
                dynamics_model=PushDynamicsModel(),
                virtual_sensor_model=CrossmodalVirtualSensorDef(
                    virtual_sensor_model=(
                        PushVirtualSensorModel(modalities={"image"}),
                        PushVirtualSensorModel(modalities={"pos", "sensors"}),
                    ),
                    crossmodal_weight_model=PushCrossmodalKalmanFilterWeightModel(
                        state_dim=_defs.STATE_DIM
                    ),
                    state_dim=_defs.STATE_DIM,
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class PushUnimodalKalmanFilter(StatefulFilter, PushTask.Filter):
    """Precision-weighted EKF fusion (reference push_models/unimodal_kf.py:14-32)."""

    def __init__(self):
        super().__init__(
            UnimodalKFDef(
                filter_models=_two_child_ekfs(),
                state_dim=_defs.STATE_DIM,
            )
        )


class PushMeasurementUnimodalKalmanFilter(StatefulFilter, PushTask.Filter):
    """Single EKF over unimodal virtual-sensor fusion
    (reference push_models/unimodal_kf.py:35-48)."""

    def __init__(self):
        super().__init__(
            VirtualSensorEKFDef(
                dynamics_model=PushDynamicsModel(),
                virtual_sensor_model=UnimodalVirtualSensorDef(
                    virtual_sensor_model=(
                        PushVirtualSensorModel(modalities={"image"}),
                        PushVirtualSensorModel(modalities={"pos", "sensors"}),
                    ),
                    state_dim=_defs.STATE_DIM,
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class PushLSTMFilter(StatefulFilter, PushTask.Filter):
    """LSTM baseline with spanning-avg-pool image encoder
    (reference push_models/lstm.py:13-100, :25-27)."""

    def __init__(self, units: int = 64):
        super().__init__(
            LSTMFilterDef(
                net=LSTMFilterNet(
                    state_dim=_defs.STATE_DIM, units=units, spanning_avg_pool=True
                ),
                state_dim=_defs.STATE_DIM,
            )
        )
