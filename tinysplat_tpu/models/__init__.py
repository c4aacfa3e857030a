from .gaussians import (
    GaussianParams,
    GaussianState,
    init_from_pcd,
    from_state_dict,
    state_dict,
    grow_capacity,
)

__all__ = [
    "GaussianParams",
    "GaussianState",
    "init_from_pcd",
    "from_state_dict",
    "state_dict",
    "grow_capacity",
]
