"""Compute ops: intersection, traversal, shading, post-processing.

The device-kernel layer (reference kernels/kernel_main.cl + MathAndSTL.cl)
rebuilt as jnp/Pallas ops. Every op is batched over rays; the branchless
select forms of the reference kernels (integer ``passed`` masks,
kernel_main.cl:99-104) translate directly to ``jnp.where``.
"""

from clraytracer_tpu.ops.intersect import (  # noqa: F401
    intersect_aabb,
    intersect_tris,
)
from clraytracer_tpu.ops.shade import sample_skybox, sample_texture, shade_hits  # noqa: F401
from clraytracer_tpu.ops.post import post_process  # noqa: F401
