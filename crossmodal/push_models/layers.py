"""Push-task encoder factories (API parity with the reference's
``crossmodal/push_models/layers.py:5-136``, incl. the spanning-avg-pool image
variant)."""

from multimodalfilter_tpu.models import ImageEncoder, MLPEncoder

state_dim = 2
control_dim = 7
obs_pos_dim = 3
obs_sensors_dim = 7


def state_layers(units: int):
    return MLPEncoder(units)


def control_layers(units: int):
    return MLPEncoder(units)


def observation_image_layers(units: int, spanning_avg_pool: bool = False):
    return ImageEncoder(units, spanning_avg_pool=spanning_avg_pool)


def observation_pos_layers(units: int):
    return MLPEncoder(units)


def observation_sensors_layers(units: int):
    return MLPEncoder(units)
