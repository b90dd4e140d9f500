"""Door-task encoder factories (API parity with the reference's
``crossmodal/door_models/layers.py:5-95``; implementations live in
``multimodalfilter_tpu.models.encoders``)."""

from multimodalfilter_tpu.models import ImageEncoder, MLPEncoder

state_dim = 3
control_dim = 7
obs_pos_dim = 3
obs_sensors_dim = 7


def state_layers(units: int):
    return MLPEncoder(units)


def control_layers(units: int):
    return MLPEncoder(units)


def observation_image_layers(units: int):
    return ImageEncoder(units)


def observation_pos_layers(units: int):
    return MLPEncoder(units)


def observation_sensors_layers(units: int):
    return MLPEncoder(units)
