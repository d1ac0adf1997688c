from .base import filter_kwargs, derive_seed, derive_key, key_for_prompt, tree_size_bytes
from .noise_schedule import TimeSampler, flow_match_sigma, TIMESTEP_MAX, fraction_range_to_t_bounds
from .trajectory import compute_trajectory_indices, build_store_maps, TrajectoryIndexMaps

__all__ = [
    "filter_kwargs",
    "derive_seed",
    "derive_key",
    "key_for_prompt",
    "tree_size_bytes",
    "TimeSampler",
    "flow_match_sigma",
    "TIMESTEP_MAX",
    "fraction_range_to_t_bounds",
    "compute_trajectory_indices",
    "build_store_maps",
    "TrajectoryIndexMaps",
]
