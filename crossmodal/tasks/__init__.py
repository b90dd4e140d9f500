from ._door import DoorTask  # noqa: F401
from ._push import PushTask  # noqa: F401
from ._task import Task  # noqa: F401
