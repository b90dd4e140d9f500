"""The 10 door-task model classes (API parity with
``crossmodal/door_models/__init__.py:5-19``); each registers itself as a
``--model-type`` choice by subclassing ``DoorTask.Filter``.

All classes are thin StatefulFilter facades over functional filter defs.
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

from ..tasks import DoorTask
from . import _defs

# Factory aliases with reference class names (constructible components).
DoorDynamicsModel = _defs.dynamics_def


def DoorDynamicsModelBrent(units: int = 64):
    return _defs.dynamics_def(units=units, brent=True)


DoorMeasurementModel = _defs.measurement_def
DoorVirtualSensorModel = _defs.virtual_sensor_def
DoorCrossmodalKalmanFilterWeightModel = _defs.kf_weight_def
DoorCrossmodalWeightModel = _defs.pf_weight_def


class DoorParticleFilter(StatefulFilter, DoorTask.Filter):
    """Plain PF: single measurement model over all modalities
    (reference door_models/pf.py:14-27; 30 particles train / 300 eval)."""

    def __init__(self):
        super().__init__(
            ParticleFilterDef(
                dynamics_model=DoorDynamicsModelBrent(),
                measurement_model=DoorMeasurementModel(),
                state_dim=_defs.STATE_DIM,
            )
        )


class DoorKalmanFilter(StatefulFilter, DoorTask.Filter):
    """Virtual-sensor EKF (reference door_models/kf.py:14-28)."""

    def __init__(self, dynamics_model=None, virtual_sensor_model=None):
        if dynamics_model is None and virtual_sensor_model is None:
            dynamics_model = DoorDynamicsModel()
            virtual_sensor_model = DoorVirtualSensorModel()
        super().__init__(
            VirtualSensorEKFDef(
                dynamics_model=dynamics_model,
                virtual_sensor_model=virtual_sensor_model,
                state_dim=_defs.STATE_DIM,
            )
        )


class DoorCrossmodalParticleFilter(StatefulFilter, DoorTask.Filter):
    """PF over image-MM + pos/sensors-MM with a learned log-weight gate
    (reference door_models/crossmodal_pf.py:18-40)."""

    def __init__(self, know_image_blackout: bool = False):
        super().__init__(
            ParticleFilterDef(
                dynamics_model=DoorDynamicsModelBrent(),
                measurement_model=CrossmodalPFMeasurementDef(
                    measurement_models=(
                        DoorMeasurementModel(modalities={"image"}),
                        DoorMeasurementModel(modalities={"pos", "sensors"}),
                    ),
                    crossmodal_weight_model=DoorCrossmodalWeightModel(
                        know_image_blackout=know_image_blackout
                    ),
                    state_dim=_defs.STATE_DIM,
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class DoorCrossmodalParticleFilterSeq5(DoorCrossmodalParticleFilter, DoorTask.Filter):
    """Blackout-aware crossmodal PF, for the seq5 dataset
    (reference door_models/crossmodal_pf.py:43-49)."""

    def __init__(self):
        super().__init__(know_image_blackout=True)


class DoorUnimodalParticleFilter(StatefulFilter, DoorTask.Filter):
    """Crossmodal PF measurement fusion with no gate (equal weights)
    (reference door_models/unimodal_pf.py:9-29)."""

    def __init__(self):
        super().__init__(
            ParticleFilterDef(
                dynamics_model=DoorDynamicsModelBrent(),
                measurement_model=CrossmodalPFMeasurementDef(
                    measurement_models=(
                        DoorMeasurementModel(modalities={"image"}),
                        DoorMeasurementModel(modalities={"pos", "sensors"}),
                    ),
                    crossmodal_weight_model=None,
                    state_dim=_defs.STATE_DIM,
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class DoorCrossmodalKalmanFilter(StatefulFilter, DoorTask.Filter):
    """Two child EKFs (image; pos+sensors) fused by a learned per-state-dim
    gate (reference door_models/crossmodal_kf.py:20-98)."""

    def __init__(self, know_image_blackout: bool = False):
        super().__init__(
            CrossmodalKFDef(
                filter_models=(
                    VirtualSensorEKFDef(
                        dynamics_model=DoorDynamicsModel(),
                        virtual_sensor_model=DoorVirtualSensorModel(
                            modalities={"image"}
                        ),
                        state_dim=_defs.STATE_DIM,
                    ),
                    VirtualSensorEKFDef(
                        dynamics_model=DoorDynamicsModel(),
                        virtual_sensor_model=DoorVirtualSensorModel(
                            modalities={"pos", "sensors"}
                        ),
                        state_dim=_defs.STATE_DIM,
                    ),
                ),
                crossmodal_weight_model=DoorCrossmodalKalmanFilterWeightModel(
                    state_dim=_defs.STATE_DIM
                ),
                state_dim=_defs.STATE_DIM,
                know_image_blackout=know_image_blackout,
            )
        )


class DoorMeasurementCrossmodalKalmanFilter(StatefulFilter, DoorTask.Filter):
    """Single EKF over a crossmodal virtual-sensor fusion
    (reference door_models/crossmodal_kf.py:170-186)."""

    def __init__(self):
        super().__init__(
            VirtualSensorEKFDef(
                dynamics_model=DoorDynamicsModel(),
                virtual_sensor_model=CrossmodalVirtualSensorDef(
                    virtual_sensor_model=(
                        DoorVirtualSensorModel(modalities={"image"}),
                        DoorVirtualSensorModel(modalities={"pos", "sensors"}),
                    ),
                    crossmodal_weight_model=DoorCrossmodalKalmanFilterWeightModel(
                        state_dim=_defs.STATE_DIM
                    ),
                    state_dim=_defs.STATE_DIM,
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class DoorUnimodalKalmanFilter(StatefulFilter, DoorTask.Filter):
    """Two independent per-modality EKFs fused by precision weighting
    (reference door_models/unimodal_kf.py:14-32)."""

    def __init__(self):
        super().__init__(
            UnimodalKFDef(
                filter_models=(
                    VirtualSensorEKFDef(
                        dynamics_model=DoorDynamicsModel(),
                        virtual_sensor_model=DoorVirtualSensorModel(
                            modalities={"image"}
                        ),
                        state_dim=_defs.STATE_DIM,
                    ),
                    VirtualSensorEKFDef(
                        dynamics_model=DoorDynamicsModel(),
                        virtual_sensor_model=DoorVirtualSensorModel(
                            modalities={"pos", "sensors"}
                        ),
                        state_dim=_defs.STATE_DIM,
                    ),
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class DoorMeasurementUnimodalKalmanFilter(StatefulFilter, DoorTask.Filter):
    """Single EKF over a unimodal (precision-weighted) virtual-sensor fusion
    (reference door_models/unimodal_kf.py:35-48)."""

    def __init__(self):
        super().__init__(
            VirtualSensorEKFDef(
                dynamics_model=DoorDynamicsModel(),
                virtual_sensor_model=UnimodalVirtualSensorDef(
                    virtual_sensor_model=(
                        DoorVirtualSensorModel(modalities={"image"}),
                        DoorVirtualSensorModel(modalities={"pos", "sensors"}),
                    ),
                    state_dim=_defs.STATE_DIM,
                ),
                state_dim=_defs.STATE_DIM,
            )
        )


class DoorLSTMFilter(StatefulFilter, DoorTask.Filter):
    """LSTM baseline (reference door_models/lstm.py:13-100)."""

    def __init__(self, units: int = 64):
        super().__init__(
            LSTMFilterDef(
                net=LSTMFilterNet(state_dim=_defs.STATE_DIM, units=units),
                state_dim=_defs.STATE_DIM,
            )
        )
