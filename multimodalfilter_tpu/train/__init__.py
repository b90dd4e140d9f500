from .optim import make_optimizer, zero_frozen_grads  # noqa: F401
from .loops import (  # noqa: F401
    train_dynamics_recurrent,
    train_dynamics_single_step,
    train_e2e,
    train_pf_measurement,
    train_virtual_sensor,
)
