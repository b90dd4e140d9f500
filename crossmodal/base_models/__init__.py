"""Fusion abstractions (API parity with the reference's
``crossmodal/base_models/__init__.py:1-11``); implementations live in
``multimodalfilter_tpu.filtering.fusion``."""

from multimodalfilter_tpu.filtering.fusion import (  # noqa: F401
    CrossmodalKFDef as CrossmodalKalmanFilter,
    CrossmodalPFMeasurementDef as CrossmodalParticleFilterMeasurementModel,
    CrossmodalVirtualSensorDef as CrossmodalVirtualSensorModel,
    KFWeightDef as CrossmodalKalmanFilterWeightModel,
    PFWeightDef as CrossmodalWeightModel,
    UnimodalKFDef as UnimodalKalmanFilter,
    UnimodalVirtualSensorDef as UnimodalVirtualSensorModel,
    weighted_average,
)
