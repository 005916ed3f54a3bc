"""Compute kernels: geometry transforms, culling/compaction, rasterization,
texture sampling, shading — the TPU equivalents of the reference's GLSL
shaders (/root/reference/src/shaders/)."""
