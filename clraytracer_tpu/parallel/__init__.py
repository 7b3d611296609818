"""Multi-chip / multi-host parallelism.

New design territory relative to the single-GPU reference (SURVEY.md §2):
the pixel/ray grid is the data-parallel axis; scene state (BVH, triangle
arena, texture atlas, materials) is replicated across the device mesh;
parameter gradients are all-reduced (psum) over ICI during the backward pass.
"""

from clraytracer_tpu.parallel.sharding import (  # noqa: F401
    make_device_mesh,
    render_sharded,
    train_step_sharded,
)
