"""clraytracer_tpu — a TPU-native differentiable ray-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
benanil/CLRayTracer (single-GPU OpenCL Whitted ray tracer): OBJ/MTL import,
binned-SAH BVH, instanced two-bounce Phong tracing with packed texture-atlas
sampling and an equirect skybox, and a saturation/Reinhard/gamma/vignette
(+FXAA) post chain — rebuilt TPU-first:

* SoA scene arrays instead of AoS ``Tri`` records (reference
  ResourceManager.hpp:54-67), so every op is vectorized.
* Ray-tile data parallelism over a ``jax.sharding.Mesh`` instead of a single
  OpenCL command queue (reference Renderer.cpp:341-363).
* A wavefront / flash-style Pallas traversal instead of per-thread stacks with
  ``goto`` (reference kernels/kernel_main.cl:124-160).
* End-to-end differentiability (new capability; the reference has none).
"""

__version__ = "0.1.0"

from clraytracer_tpu.config import CameraConfig, RenderConfig  # noqa: F401
