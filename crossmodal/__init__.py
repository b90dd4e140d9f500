"""crossmodal: reference-compatible API surface over multimodalfilter_tpu.

Mirrors the reference's public import surface
(``crossmodal/__init__.py:1`` re-exports all six submodules).
"""

from . import base_models  # noqa: F401
from . import door_models  # noqa: F401
from . import eval_helpers  # noqa: F401
from . import push_models  # noqa: F401
from . import tasks  # noqa: F401
from . import train_helpers  # noqa: F401
