"""Debug affordances.

Capability parity with the reference's debug tooling (SURVEY §4.4):
  pdb_safety_net        <- fannypack.utils.pdb_safety_net
                           (scripts/door_task/train_door.py:33)
  get_git_commit_hash   <- fannypack.utils.get_git_commit_hash
                           (train_door.py:45)
plus TPU-native replacements for the reference's pervasive inline shape
asserts (SURVEY §4.1): a checkify-based finite-ness guard for jitted filter
steps, and a jax.profiler trace context for the bench/eval hot loops.
"""

from __future__ import annotations

import contextlib
import os
import pdb
import subprocess
import sys
import traceback
from typing import Optional


def pdb_safety_net() -> None:
    """Drop into pdb on any uncaught exception (interactive runs only)."""

    def excepthook(exc_type, exc_value, exc_traceback):
        traceback.print_exception(exc_type, exc_value, exc_traceback)
        if sys.stdin.isatty():
            pdb.post_mortem(exc_traceback)

    sys.excepthook = excepthook


def get_git_commit_hash(path: Optional[str] = None) -> str:
    try:
        cwd = os.path.dirname(path) if path else None
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=cwd, stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except Exception:
        return "(unknown)"


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """jax.profiler trace context around a hot region (SURVEY §5 tracing row).

    View with TensorBoard's profile plugin or xprof.
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def checkify_filter_step(step_fn):
    """Wrap a filter step with checkify NaN/finiteness guards — the
    functional replacement for the reference's inline runtime asserts
    (e.g. crossmodal/base_models/crossmodal_kf.py:112-143). Returns
    (error, result); call error.throw() host-side to surface failures."""
    from jax.experimental import checkify

    return checkify.checkify(
        step_fn, errors=checkify.float_checks | checkify.user_checks
    )
