"""Preemption-safe curriculum resume (``--resume`` on the train CLIs).

The reference has no resume story: an interrupted ``train_door.py`` run
restarts from scratch (fannypack's Buddy can restore a checkpoint, but the
curriculum in ``scripts/door_task/train_door.py:61-460`` re-runs every
phase regardless).  For long production training this matters — TPU jobs
get preempted — so this module makes the *unchanged* curricula resumable:

``ResumableCurriculum`` wraps the ``(buddy, train_helpers, eval_helpers)``
triple that every ``run_curriculum`` receives.  While phases are already
complete it runs in **skip mode**:

- expensive calls (``train_helpers.train_*``, ``eval_helpers.log_eval``,
  ``buddy.load_checkpoint_module`` surgery) are deferred, not executed;
- cheap state mutations pass through eagerly — ``freeze_module`` /
  ``unfreeze_module`` and attribute sets like ``enabled_models`` are
  called directly on the model by the curricula (not through these
  proxies), so the wrapper's correctness rests on the invariant that the
  reference curricula apply them at *segment start*, before the segment's
  train calls (true of every curriculum in both CLIs);
- ``buddy.save_checkpoint(label)`` is the phase boundary: if the labeled
  checkpoint already exists on disk, the whole pending segment is
  discarded (phase complete — skipped) and the label is remembered as the
  resume frontier.  At the first label that does NOT exist, the frontier
  checkpoint is restored (params + optimizer state + step counter), the
  pending segment replays in order, and everything switches to
  passthrough for the rest of the run.

A fully-complete run therefore skips every phase and ``finish()`` just
restores the final checkpoint (so the CLI's trailing ``run_eval`` sees the
trained weights); a fresh run defers-then-replays its first segment, which
is semantically identical to running it inline.

Deferred surgery keeps its call-site error contract: the
DoorCrossmodalParticleFilter curriculum wraps ``load_checkpoint_module``
in try/except FileNotFoundError for the warm-start fallback
(train_door.py:122-124 in the reference), so the proxy validates the
source checkpoint's existence eagerly and defers only the load.
"""

from __future__ import annotations

import os
from typing import Any, Callable, List, Optional, Tuple


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


class _DeferringProxy:
    """Pass every attribute through to `real`, except callables named in
    `deferred`: in skip mode those are queued on the controller instead of
    executed."""

    def __init__(self, controller: "ResumableCurriculum", real, deferred):
        self._rc = controller
        self._real = real
        self._deferred = frozenset(deferred)

    def __getattr__(self, name: str):
        attr = getattr(self._real, name)
        if (
            name in self._deferred
            and callable(attr)
            and self._rc._skipping
        ):

            def defer(*args, **kwargs):
                if not self._rc._skipping:  # activated since lookup
                    return attr(*args, **kwargs)
                self._rc._pending.append(
                    (f"{name}", lambda: attr(*args, **kwargs))
                )
                return None

            return defer
        return attr


class _BuddyProxy(_DeferringProxy):
    def __init__(self, controller, buddy):
        super().__init__(controller, buddy, deferred=())

    def save_checkpoint(self, label: Optional[str] = None):
        rc = self._rc
        if not rc._skipping:
            return self._real.save_checkpoint(label)
        if label is not None and _labeled_checkpoint_exists(self._real, label):
            rc._frontier = label
            n = len(rc._pending)
            rc._pending.clear()
            print(
                f"[resume] phase '{label}' already complete — skipped "
                f"({n} deferred call{'s' if n != 1 else ''} dropped)"
            )
            return self._real._checkpoint_path(label)
        rc._activate(reason=f"checkpoint '{label}' not found")
        return self._real.save_checkpoint(label)

    def load_checkpoint_module(self, source, target=None, label=None,
                               experiment_name=None):
        rc = self._rc
        if not rc._skipping:
            return self._real.load_checkpoint_module(
                source, target=target, label=label,
                experiment_name=experiment_name,
            )
        # Keep the call-site error contract: raise now if the source
        # checkpoint is missing (curricula catch FileNotFoundError /
        # AssertionError for warm-start fallbacks), defer only the load.
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
        real = self._real
        rc._pending.append((
            "load_checkpoint_module",
            lambda: real.load_checkpoint_module(
                source, target=target, label=label,
                experiment_name=experiment_name,
            ),
        ))
        return None


_TRAIN_DEFERRED = (
    "train_e2e",
    "train_pf_dynamics_single_step",
    "train_pf_dynamics_recurrent",
    "train_pf_measurement",
    "train_virtual_sensor",
)
_EVAL_DEFERRED = ("log_eval",)


class ResumableCurriculum:
    """Wrap (buddy, train_helpers, eval_helpers) so an unchanged
    ``run_curriculum`` resumes from the latest completed phase checkpoint.

    Usage (the train CLIs)::

        rc = ResumableCurriculum(buddy, train_helpers, eval_helpers,
                                 enabled=args.resume)
        run_curriculum(filter_model, rc.buddy, rc.train_helpers,
                       rc.eval_helpers)
        rc.finish()
    """

    def __init__(self, buddy, train_helpers, eval_helpers, enabled: bool = True):
        self._real_buddy = buddy
        self._skipping = bool(enabled)
        self._pending: List[Tuple[str, Callable[[], Any]]] = []
        self._frontier: Optional[str] = None
        self.buddy = _BuddyProxy(self, buddy) if enabled else buddy
        self.train_helpers = (
            _DeferringProxy(self, train_helpers, _TRAIN_DEFERRED)
            if enabled else train_helpers
        )
        self.eval_helpers = (
            _DeferringProxy(self, eval_helpers, _EVAL_DEFERRED)
            if enabled else eval_helpers
        )

    def _activate(self, reason: str) -> None:
        """Leave skip mode: restore the frontier checkpoint, replay the
        pending (incomplete) segment in order, then pass everything through."""
        assert self._skipping
        self._skipping = False
        if self._frontier is not None:
            print(f"[resume] restoring '{self._frontier}' ({reason})")
            self._real_buddy.load_checkpoint(label=self._frontier)
        else:
            print(f"[resume] nothing completed yet ({reason}); from scratch")
        pending, self._pending = self._pending, []
        for name, call in pending:
            print(f"[resume] replaying deferred {name}")
            call()

    def finish(self) -> None:
        """Call after run_curriculum returns: if every phase was already
        complete, restore the final checkpoint so the caller's trailing
        eval sees the trained weights (plus any trailing deferred calls)."""
        if self._skipping:
            self._activate(reason="curriculum complete")
