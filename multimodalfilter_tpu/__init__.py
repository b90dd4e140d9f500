"""multimodalfilter_tpu: a TPU-native differentiable-filtering framework.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
brentyi/multimodalfilter (IROS 2020, "Multimodal Sensor Fusion with
Differentiable Filters") together with the slices of `torchfilter` and
`fannypack` that it depends on.

Design principles (TPU-first, not a port):

- Beliefs are explicit pytree carries threaded through pure ``step`` functions
  and unrolled with ``jax.lax.scan`` — never mutable module attributes.
- Networks are ``flax.linen`` modules; filters are *static* frozen dataclasses
  ("filter defs") holding module definitions plus config, so they hash/compare
  structurally and can be closed over by ``jax.jit``.
- Parameters live in plain nested dicts whose keys mirror the reference's
  torch module paths (e.g. ``filter_models.0.dynamics_model``) so that
  checkpoint surgery (partial module restore) is a pytree prefix swap.
- Batch (N) and particle (M) axes are vmapped/reshaped into MXU-friendly
  matmuls; data parallelism shards N over a ``jax.sharding.Mesh``.
"""

# MMF_TPU_RBG: opt-in RngBitGenerator-backed PRNG for serving (see
# utils/rng.py). Applied at import so every PRNGKey site in the process —
# facade key streams, eval CLI rollout keys, bench rep keys — picks it up.
from .utils.rng import configure_prng_from_env as _configure_prng

_configure_prng()

from . import data  # noqa: F401
from . import experiments  # noqa: F401
from . import filtering  # noqa: F401
from . import models  # noqa: F401
from . import ops  # noqa: F401
from . import parallel  # noqa: F401
from . import train  # noqa: F401
from . import types  # noqa: F401
from . import utils  # noqa: F401

__version__ = "0.1.0"
