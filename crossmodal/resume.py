"""Preemption-safe curriculum resume (``--resume`` on the train CLIs).

The reference has no resume story: an interrupted ``train_door.py`` run
restarts from scratch (fannypack's Buddy can restore a checkpoint, but the
curriculum in ``scripts/door_task/train_door.py:61-460`` re-runs every
phase regardless).  For long production training this matters — TPU jobs
get preempted — so this module makes the *unchanged* curricula resumable.

Design: **two passes over the unchanged ``run_curriculum``**, with the
``(buddy, train_helpers, eval_helpers)`` triple wrapped in proxies.

1. **Probe pass** — every expensive call (``train_helpers.train_*``,
   ``eval_helpers.log_eval``, ``buddy.load_checkpoint_module`` surgery) is
   a no-op; ``buddy.save_checkpoint(label)`` checks whether the labeled
   checkpoint exists on disk.  The *resume frontier* is the last label in
   an unbroken existing chain from the start; the probe aborts (private
   restart exception) at the first missing label.  If the probe runs to
   completion, every phase is already done: the frontier checkpoint is
   restored (so the CLI's trailing eval sees the trained weights) and
   nothing re-runs.
2. **Fast-forward pass** — ``run_curriculum`` runs again from the top.
   Expensive calls stay no-ops *until* ``save_checkpoint(frontier)`` is
   reached; at that exact point the frontier checkpoint is restored
   (params + step counter + optimizer state, via ``Buddy.load_checkpoint``)
   and everything switches to live passthrough for the rest of the run.

Why two passes instead of defer-and-replay: the curricula interleave
*eager, direct* model mutations (``freeze_module`` / ``unfreeze_module``,
``enabled_models = [...]``, ``buddy._optimizer_dict.clear()``) between
their train calls — e.g. ``train_door.py``'s unimodal-KF branch flips
``enabled_models`` around each per-modality ``train_e2e``.  A deferred
train call replayed later would run under the *final* mutation state of
its segment, not the state at its call site.  Re-running the curriculum
from the top re-applies every mutation in order (they are all absolute
assignments, so re-application is idempotent), and the restore happens at
the frontier's original position in that order — so post-restore clears
still drop restored optimizer state exactly as an uninterrupted run would,
and each live train call sees exactly the freeze/enabled state an
uninterrupted run would have given it.

Deferred surgery keeps its call-site error contract: the
DoorCrossmodalParticleFilter curriculum wraps ``load_checkpoint_module``
in try/except FileNotFoundError for the warm-start fallback
(train_door.py:122-124 in the reference), so in the skipping modes the
proxy still validates the source checkpoint's existence eagerly (raising
the same exception types as Buddy) and the curriculum's branch choice is
identical across passes.

Constraints (both hold for every curriculum in both CLIs, and are handled
gracefully if violated): phase labels should be unique within one
curriculum — a repeated or ``None`` label ends the skippable prefix there,
so everything from that point re-runs live; trailing gated calls after the
final save re-run live on resume.
"""

from __future__ import annotations

import os
from typing import Optional


def _labeled_checkpoint_exists(buddy, label, experiment_name=None) -> bool:
    """Mirror Buddy._read_checkpoint's path resolution without reading."""
    if label is not None:
        base = buddy._checkpoint_base(label, experiment_name)
        return os.path.exists(base + ".ckpt") or os.path.isdir(base + ".orbax")
    exp_dir = os.path.join(
        buddy._checkpoint_dir, experiment_name or buddy.experiment_name
    )
    if not os.path.isdir(exp_dir):
        return False
    return any(
        p.endswith(".ckpt") or p.endswith(".orbax") for p in os.listdir(exp_dir)
    )


class _Restart(Exception):
    """Private: aborts the probe pass at the first incomplete phase."""


class _GatingProxy:
    """Pass every attribute through to `real`, except callables named in
    `gated`: while the controller is not in live mode those are no-ops
    (the fast-forward pass re-runs them live past the restore point)."""

    def __init__(self, controller: "ResumableCurriculum", real, gated):
        self._rc = controller
        self._real = real
        self._gated = frozenset(gated)

    def __getattr__(self, name: str):
        attr = getattr(self._real, name)
        if name in self._gated and callable(attr) and self._rc._mode != "live":

            def gate(*args, **kwargs):
                if self._rc._mode == "live":  # activated since lookup
                    return attr(*args, **kwargs)
                self._rc._trailing = True
                self._rc._skipped += 1
                return None

            return gate
        return attr


class _BuddyProxy(_GatingProxy):
    def __init__(self, controller, buddy):
        super().__init__(controller, buddy, gated=())

    def save_checkpoint(self, label: Optional[str] = None):
        rc = self._rc
        real = self._real
        if rc._mode == "live":
            return real.save_checkpoint(label)
        if rc._mode == "probe":
            # A None / repeated label can't key a resume point: end the
            # skippable prefix here (everything after re-runs live).
            if (
                label is None
                or label in rc._seen
                or not _labeled_checkpoint_exists(real, label)
            ):
                raise _Restart
            rc._seen.add(label)
            rc._frontier = label
            rc._trailing = False
            n, rc._skipped = rc._skipped, 0
            print(
                f"[resume] phase '{label}' already complete — skipped "
                f"({n} call{'s' if n != 1 else ''})"
            )
            return real._checkpoint_path(label)
        assert rc._mode == "fastforward"
        if label == rc._target:
            print(f"[resume] restoring '{label}' and resuming live")
            real.load_checkpoint(label=label)
            rc._mode = "live"
        return real._checkpoint_path(label)

    def load_checkpoint_module(self, source, target=None, label=None,
                               experiment_name=None):
        rc = self._rc
        if rc._mode == "live":
            return self._real.load_checkpoint_module(
                source, target=target, label=label,
                experiment_name=experiment_name,
            )
        # Keep the call-site error contract: raise now if the source
        # checkpoint is missing (curricula catch FileNotFoundError /
        # AssertionError for warm-start fallbacks); skip only the load.
        if not _labeled_checkpoint_exists(self._real, label, experiment_name):
            if label is not None:
                base = self._real._checkpoint_base(label, experiment_name)
                raise FileNotFoundError(
                    f"No checkpoint {base}.ckpt (or {base}.orbax)"
                )
            raise AssertionError(
                f"No checkpoints found for "
                f"{experiment_name or self._real.experiment_name}"
            )
        rc._trailing = True
        rc._skipped += 1
        return None


_TRAIN_GATED = (
    "train_e2e",
    "train_pf_dynamics_single_step",
    "train_pf_dynamics_recurrent",
    "train_pf_measurement",
    "train_virtual_sensor",
)
_EVAL_GATED = ("log_eval",)


class ResumableCurriculum:
    """Wrap (buddy, train_helpers, eval_helpers) so an unchanged
    ``run_curriculum`` resumes from the latest completed phase checkpoint.

    Usage (the train CLIs)::

        rc = ResumableCurriculum(buddy, train_helpers, eval_helpers,
                                 enabled=args.resume)
        rc.run(run_curriculum, filter_model)

    ``run`` invokes ``run_curriculum(*args, buddy, train_helpers,
    eval_helpers)`` with the proxied triple (once when nothing or
    everything is resumable, twice — probe then fast-forward — when
    resuming mid-curriculum; the probe pass executes no training).
    """

    def __init__(self, buddy, train_helpers, eval_helpers, enabled: bool = True):
        self._real_buddy = buddy
        self._enabled = bool(enabled)
        self._mode = "probe" if enabled else "live"
        self._frontier: Optional[str] = None
        self._target: Optional[str] = None
        self._seen: set = set()
        self._trailing = False  # gated calls after the last completed save
        self._skipped = 0
        self.buddy = _BuddyProxy(self, buddy) if enabled else buddy
        self.train_helpers = (
            _GatingProxy(self, train_helpers, _TRAIN_GATED)
            if enabled else train_helpers
        )
        self.eval_helpers = (
            _GatingProxy(self, eval_helpers, _EVAL_GATED)
            if enabled else eval_helpers
        )

    def run(self, run_curriculum, *args) -> None:
        triple = (self.buddy, self.train_helpers, self.eval_helpers)
        if not self._enabled:
            run_curriculum(*args, *triple)
            return
        # Pass 1 (probe): find the resume frontier without training.
        self._mode = "probe"
        try:
            run_curriculum(*args, *triple)
            if not self._trailing:
                # Every phase complete: restore the final checkpoint so the
                # caller's trailing eval sees the trained weights.
                if self._frontier is not None:
                    print(
                        f"[resume] curriculum complete; restoring "
                        f"'{self._frontier}'"
                    )
                    self._real_buddy.load_checkpoint(label=self._frontier)
                else:
                    print("[resume] curriculum has no phase checkpoints")
                self._mode = "live"
                return
            # Gated calls after the final save: fast-forward and re-run them.
        except _Restart:
            pass
        # Pass 2 (fast-forward): re-run from the top, restore at the
        # frontier's original position, then go live.
        self._target = self._frontier
        self._seen = set()
        self._skipped = 0
        if self._target is None:
            print("[resume] nothing completed yet; training from scratch")
            self._mode = "live"
        else:
            print(f"[resume] fast-forwarding to '{self._target}'")
            self._mode = "fastforward"
        run_curriculum(*args, *triple)
