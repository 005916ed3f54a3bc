"""renderer_tpu — a TPU-native rendering framework (JAX/XLA/Pallas).

Rebuilds the capabilities of farnoy/renderer (a Rust/Vulkan GPU-driven renderer,
see SURVEY.md) as an idiomatic TPU program:

- the ECS scene state becomes structure-of-arrays pytrees resident in HBM
  (``renderer_tpu.scene``),
- the macro-generated frame graph becomes a declarative Python graph compiler
  that validates resource claims and emits fused, jitted frame programs
  (``renderer_tpu.graph``),
- vertex transform / culling / draw compaction become batched matmuls and
  masked segment reductions (``renderer_tpu.ops.geometry``, ``ops.cull``),
- the shader stages become Pallas kernels, most notably a tile-based software
  rasterizer with depth testing (``renderer_tpu.ops.raster_pallas``),
- Vulkan queues/semaphores/barriers are replaced by XLA program order and
  buffer donation (``renderer_tpu.runtime``),
- the one native component (the reference's C++ VMA wrapper, vma/) is rebuilt
  as a C++ host staging-arena allocator with live stats
  (``renderer_tpu.native``).
"""

__version__ = "0.1.0"
