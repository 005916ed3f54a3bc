"""Multi-chip SPMD rendering: a thin driver over the frame graph.

The graph itself is SPMD-aware (passes.pipeline.build_forward_graph with
PipelineConfig.spmd_devices > 1): instance-sharded geometry, ONE all-gather
of the culled draw stream over ICI, row-sharded raster/shade, and a final
row all-gather in the present pass. Renderer(spmd_mesh=mesh) wraps the whole
compiled plan in a single shard_map whose per-resource partition specs come
from the graph declarations — every runtime switch (shadows, occlusion
culling, rt, freeze, hud, ssaa, skinning) runs under SPMD through the SAME
plan, bit-identical to single-device given adequate per-device capacity
(tests/test_parallel.py).

This module keeps only mesh construction and a convenience one-shot driver;
the round-1 hand-rolled SPMD pipeline is gone (it forked feature work).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

AXIS = "sp"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def render_frame_spmd(
    scene,
    camera,
    mesh: Mesh,
    width: int,
    height: int,
    tri_capacity_per_device: int = 2048,
    shading: str = "pbr",
    background=(0.05, 0.05, 0.08),
    interpret: bool = None,  # None: interpret off-TPU (CPU meshes)
    **switches,
):
    """One frame through the SPMD frame graph. Returns (image, depth, tri_id)
    — image fully assembled (replicated), depth/tri_id row-sharded arrays."""
    from renderer_tpu.passes.pipeline import PipelineConfig
    from renderer_tpu.runtime import Renderer

    n_dev = mesh.shape[AXIS]
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    cfg = PipelineConfig(
        width=width,
        height=height,
        tri_capacity=tri_capacity_per_device * n_dev,
        use_pallas=True,
        pallas_interpret=interpret,
        shading=shading,
        background=background,
        spmd_devices=n_dev,
        spmd_axis=AXIS,
    )
    r = Renderer(scene, cfg, outputs=("image", "vis"), spmd_mesh=mesh)
    if switches:
        r.set_config(**switches)
        r.apply_config_now()
    out = r.render(camera)
    return out["image"], out["vis"].depth, out["vis"].tri_id
