from .resblocks import Conv2dResblock, LinearResblock  # noqa: F401
from .encoders import (  # noqa: F401
    ControlEncoder,
    ImageEncoder,
    MLPEncoder,
    StateEncoder,
)
from .task_nets import (  # noqa: F401
    DynamicsNet,
    KFWeightNet,
    LogLikelihoodNet,
    LSTMFilterNet,
    PFWeightNet,
    VirtualSensorNet,
)
