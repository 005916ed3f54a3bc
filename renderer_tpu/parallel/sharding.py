"""SPMD frame rendering with shard_map: instance-sharded geometry +
row-sharded raster/shade, joined by one all-gather over ICI."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from renderer_tpu.mathx.camera import Camera
from renderer_tpu.ops import geometry
from renderer_tpu.ops.cull import compact_soup
from renderer_tpu.ops.geometry import TriangleSoup
from renderer_tpu.ops.raster_jax import rasterize
from renderer_tpu.scene.types import Scene

AXIS = "sp"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), (axis,))


def render_frame_spmd(
    scene: Scene,
    camera: Camera,
    mesh: Mesh,
    width: int,
    height: int,
    tri_capacity_per_device: int = 2048,
    shading: str = "pbr",
    background=(0.05, 0.05, 0.08),
    use_pallas: bool = False,  # Pallas raster per shard (y0-offset tiles)
):
    """One frame, SPMD over `mesh`'s single axis. Returns (image, vis) fully
    replicated... no: image is returned row-sharded (a pjit output with
    sharding P(axis)); callers on host can np.asarray it (auto-gather).

    Requirements: instance count % n_devices == 0 (fixed-capacity tables
    satisfy this), height % n_devices == 0.
    """
    n_dev = mesh.shape[AXIS]
    assert height % n_dev == 0, (height, n_dev)
    rows = height // n_dev
    n_inst = scene.instances.mesh_id.shape[0]
    assert n_inst % n_dev == 0, (n_inst, n_dev)

    # replicate scene/camera, shard nothing upfront; shard_map splits
    # instance columns internally by slicing per device index.
    inst_specs = P(AXIS)  # per-instance columns sharded

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        # image/depth/tri_id row-sharded; bary is channel-first (3, rows, W)
        out_specs=(P(AXIS), P(AXIS), P(None, AXIS, None), P(AXIS)),
    )
    def frame(scene_rep: Scene, camera: Camera):
        dev = jax.lax.axis_index(AXIS)
        shard = n_inst // n_dev
        start = dev * shard

        # --- geometry (instance-parallel): each device culls its shard ----
        inst = scene_rep.instances
        my_inst = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, start, shard, axis=0)
            if x.ndim > 0
            else x,
            inst,
        )
        my_scene = scene_rep._replace(instances=my_inst)
        model = geometry.instance_matrices(my_scene)
        vp, clip_mats = geometry.camera_clip_matrices(camera, model)
        visible = geometry.coarse_cull(my_scene, model, vp)
        lod = geometry.select_lod(my_scene, camera, model)
        soup = geometry.expand_draw_stream(
            my_scene, visible, lod, clip_mats, model, tri_capacity_per_device
        )
        soup = geometry.cull_triangles(soup)
        soup = compact_soup(soup)
        # instance ids are shard-local; lift to global for material lookup
        soup = soup._replace(instance=soup.instance + start)

        # --- gather the culled draw stream over ICI -----------------------
        def gather(x):
            if x.ndim == 0:
                return x  # counts summed below
            g = jax.lax.all_gather(x, AXIS)  # (n_dev, cap, ...)
            return g.reshape((-1,) + x.shape[1:])

        full_soup = TriangleSoup(
            clip=gather(soup.clip),
            normal=gather(soup.normal),
            uv=gather(soup.uv),
            tangent=gather(soup.tangent),
            instance=gather(soup.instance),
            valid=gather(soup.valid),
            count=jax.lax.psum(soup.count, AXIS),
            tex_lod=gather(soup.tex_lod),
            tri_idx=gather(soup.tri_idx),
        )
        full_soup = geometry.finalize_tex_lod(
            full_soup, width, height, scene_rep.atlas.level_size[0]
        )

        # --- raster + shade (image-parallel): my rows only ----------------
        y0 = dev * rows
        if use_pallas:
            from renderer_tpu.ops.raster_pallas import rasterize_pallas

            vis = rasterize_pallas(
                full_soup.clip, full_soup.valid, width, rows,
                y0=y0, full_height=height,
            )
        else:
            vis = rasterize(
                full_soup.clip,
                full_soup.valid,
                width,
                rows,
                strip_rows=min(16, rows),
                y0=y0,
                full_height=height,
            )
        vp_inv = jnp.linalg.inv(vp)
        if shading == "pbr":
            from renderer_tpu.ops.pbr import shade_pbr

            rec = geometry.build_shade_records(full_soup, scene_rep)
            img = shade_pbr(
                vis, rec, scene_rep, camera.position, viewproj_inv=vp_inv,
                background=background, y0=y0, full_height=height,
            )
        else:
            from renderer_tpu.ops.shading import shade_lambert

            img = shade_lambert(
                vis, full_soup, scene_rep, camera.position, viewproj_inv=vp_inv,
                background=background, y0=y0, full_height=height,
            )
        return img, vis.depth, vis.bary, vis.tri_id

    img, depth, bary, tri_id = frame(scene, camera)
    return img, depth, tri_id
