"""Device-mesh parallelism for training (SURVEY.md §2.5 TPU-native plan).

The reference is strictly single-process/single-GPU; here scaling is
first-class: a camera-batch data-parallel axis with per-Gaussian gradient
all-reduce over ICI (psum inside shard_map), replicated field state, and
deterministic per-device RNG. Gaussian-axis / tile-axis sharding of a single
camera render is the planned round-2 extension (ppermute splat exchange).
"""

from .mesh import make_mesh  # noqa: F401
from .sharded_step import make_dp_train_step  # noqa: F401
from .gauss_sharded import (  # noqa: F401
    make_gauss_mesh, make_gauss_sharded_rasterize, shard_field_arrays)
