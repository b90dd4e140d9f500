"""Task registry.

API parity with the reference's ``crossmodal/tasks/_task.py:8-48``: each Task
subclass gets a per-task ``Filter`` marker class; any model listing
``DoorTask.Filter`` / ``PushTask.Filter`` as a base is auto-registered into
``Task.model_types`` under its class name, which is exactly the set of
``--model-type`` CLI choices.

(The reference's dead ``PushTaskKloss`` stub — _task.py:51-68, references an
undefined ``_push_data`` — is intentionally not reproduced; the kloss data
path is instead a first-class ``--kloss_dataset`` flag on PushTask, as in the
reference's working code path.)
"""

from __future__ import annotations

import abc
import argparse
from typing import Dict

from multimodalfilter_tpu.filtering.wrappers import StatefulFilter


class Task(abc.ABC):
    model_types: Dict[str, type] = {}
    Filter: type = None

    def __init__(self, *unused_args, **unused_kwargs):
        assert False, "Cannot instantiate task object"

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        cls.model_types = {}

        class Filter:
            def __init_subclass__(cls_inner, **inner_kwargs):
                super().__init_subclass__(**inner_kwargs)
                assert issubclass(cls_inner, StatefulFilter)
                cls.model_types[cls_inner.__name__] = cls_inner

        cls.Filter = Filter

    @classmethod
    @abc.abstractmethod
    def add_dataset_arguments(cls, parser: argparse.ArgumentParser) -> None:
        ...

    @classmethod
    @abc.abstractmethod
    def get_dataset_args(cls, args: argparse.Namespace) -> Dict:
        ...

    @classmethod
    @abc.abstractmethod
    def get_train_trajectories(cls, **dataset_args):
        ...

    @classmethod
    @abc.abstractmethod
    def get_eval_trajectories(cls, **dataset_args):
        ...
