from .base import (  # noqa: F401
    DEFAULT_OBS_SPEC,
    DynamicsDef,
    FilterDef,
    MeasurementDef,
    VirtualSensorDef,
    example_observations,
)
from .ekf import VirtualSensorEKFDef  # noqa: F401
from .pf import ParticleFilterDef  # noqa: F401
from .fusion import (  # noqa: F401
    CrossmodalKFDef,
    CrossmodalPFMeasurementDef,
    CrossmodalVirtualSensorDef,
    KFWeightDef,
    PFWeightDef,
    UnimodalKFDef,
    UnimodalVirtualSensorDef,
    weighted_average,
)
from .lstm import LSTMFilterDef  # noqa: F401
