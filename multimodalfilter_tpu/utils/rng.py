"""PRNG implementation switch for serving (MMF_TPU_RBG).

The N=1 serving-latency attribution (docs/PERFORMANCE.md, round 4) measured
~23% of per-step op self-time in threefry RNG ops — at small batch the
counter-based threefry hash runs as a chain of tiny VPU ops while the MXU
idles. TPUs expose a hardware path for this: the ``RngBitGenerator`` HLO,
reached through JAX's ``rbg``/``unsafe_rbg`` PRNG implementations.

``MMF_TPU_RBG`` switches the *default* PRNG implementation for the process
(every ``jax.random.PRNGKey`` call site: the StatefulFilter facade's key
stream, the eval CLIs' rollout keys, bench rep keys):

- unset / ``0``  — threefry2x32 (JAX default; reference-comparable key
  streams, the repo-wide baseline for every bitwise test).
- ``1`` / ``rbg`` — threefry-derived keys, RngBitGenerator draws.
- ``unsafe`` / ``unsafe_rbg`` — cheap key derivation AND RngBitGenerator
  draws (fastest; ``split``/``fold_in`` are no longer cryptographic-quality,
  which is acceptable for resampling/process-noise draws in serving).

Semantics, not just speed: draw STREAMS change. Particle-filter estimates
stay distributionally equivalent but are not bitwise-comparable with
threefry runs, and a fresh ``definition.init`` under the switch initializes
different params. Deterministic filters (KFs/EKFs in eval, LSTM) never
materialize key draws into math, so their outputs are bitwise-unchanged
(tested: tests/test_rbg.py). This is a SERVING knob: load checkpointed
params, don't flip it mid-experiment, and keep it out of training-numerics
comparisons. It is deliberately NOT part of ``MMF_TPU_SERVING=1`` — the
serving default preserves reference-comparable key streams.

Reference context: the torch reference seeds torch's global RNG
(fannypack Buddy / train scripts); there is no per-impl choice to mirror —
this lever exists only because of how TPUs execute counter-based hashes.
"""

from __future__ import annotations

import os
from typing import Optional

_VALID = {
    "": None,
    "0": None,
    "off": None,
    "false": None,
    "1": "rbg",
    "rbg": "rbg",
    "unsafe": "unsafe_rbg",
    "unsafe_rbg": "unsafe_rbg",
}


def prng_impl_from_env(env: Optional[dict] = None) -> Optional[str]:
    """Map MMF_TPU_RBG to a jax prng impl name (None = leave the default)."""
    raw = (env if env is not None else os.environ).get("MMF_TPU_RBG", "0")
    key = raw.strip().lower()
    if key not in _VALID:
        raise ValueError(
            f"MMF_TPU_RBG={raw!r}: expected one of 0/1/rbg/unsafe/unsafe_rbg"
        )
    return _VALID[key]


def configure_prng_from_env() -> Optional[str]:
    """Apply MMF_TPU_RBG to ``jax_default_prng_impl`` (idempotent, import-time).

    Returns the impl name applied, or None if the default was left alone.
    """
    impl = prng_impl_from_env()
    if impl is not None:
        import jax

        jax.config.update("jax_default_prng_impl", impl)
    return impl
