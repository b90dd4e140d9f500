"""Device-side sensor-fault injection.

The reference samples image-blackout masks host-side with np.random at
dataset-load time (crossmodal/tasks/_door.py:190-197) and re-loads the whole
eval set for each of the 20 stochastic eval repeats. Here the blackout is a
jittable op over device-resident images (north star: TPU-side preprocessing),
so eval repeats re-mask in microseconds instead of re-reading HDF5.

Distribution parity: iid Bernoulli(keep = 1 - ratio) per frame, mask
broadcast over pixels — identical to the reference's np.random.uniform mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def apply_image_blackout(key, images, ratio):
    """Zero out each frame independently with probability `ratio`.

    images: (..., H, W) with arbitrary leading frame axes.
    """
    frame_shape = images.shape[:-2]
    keep = jax.random.uniform(key, frame_shape) > ratio
    return images * keep[..., None, None].astype(images.dtype)


def apply_sequential_rate(images, rate: int, axis: int = 0):
    """Keep one frame every `rate` along `axis`, zero the rest (the
    deterministic variant — reference _door.py:187-189)."""
    length = images.shape[axis]
    mask = (jnp.arange(length) % rate) == 0
    shape = [1] * images.ndim
    shape[axis] = length
    return images * mask.reshape(shape).astype(images.dtype)
