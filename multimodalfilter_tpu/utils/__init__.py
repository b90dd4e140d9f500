from .conversions import to_device, to_numpy  # noqa: F401
from .debug import (  # noqa: F401
    checkify_filter_step,
    get_git_commit_hash,
    pdb_safety_net,
    profile_trace,
)
from .rng import configure_prng_from_env, prng_impl_from_env  # noqa: F401
from .pytree import (  # noqa: F401
    get_by_path,
    set_by_path,
    path_matches_prefix,
    torch_path_segments,
)
from .slice_wrapper import SliceWrapper  # noqa: F401
