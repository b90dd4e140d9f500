from .cache import cached_file, set_cache_path  # noqa: F401
from .datasets import (  # noqa: F401
    ParticleFilterMeasurementDataset,
    SingleStepDataset,
    SubsequenceDataset,
)
from .trajectories_file import TrajectoriesFile  # noqa: F401
