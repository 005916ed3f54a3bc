"""Per-stage timing of the bench frame on the real chip.

Isolates geometry / raster / shade (and shade sub-parts) as separately
jitted programs over realistic captured inputs so optimization follows
measurement, not memory. Run: python scripts/profile_stages.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer


def timeit(name, fn, *args, iters=10, **kwargs):
    f = jax.jit(fn, **kwargs)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<44s} {ms:8.2f} ms")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--gathers", action="store_true", help="gather microbench only")
    args = ap.parse_args()
    iters = 3 if args.quick else 10

    if args.gathers:
        gather_microbench(iters)
        return

    scene = sponza_like_scene(N_INSTANCES)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        trilinear=False,
    )
    camera = make_camera(0.35)
    rw, rh = cfg.width, cfg.height

    # capture realistic intermediates via the production renderer
    r = Renderer(scene, cfg, outputs=("image", "soup", "vis", "shade_rec"))
    out = r.render(camera)
    jax.block_until_ready(out["image"])
    soup = out["soup"]
    vis = out["vis"]
    shade_rec = out["shade_rec"]
    print(f"visible triangles: {int(np.asarray(soup.count))}")

    # full frame (the bench number)
    def full(scene, camera):
        plan = r.plans.plan(r.config.as_dict())
        o, _ = plan.execute(r.state, scene=scene, camera=camera, time=jnp.float32(0))
        return o["image"]

    timeit("FULL frame", full, scene, camera, iters=iters)

    # --- geometry ----------------------------------------------------------
    def geo(scene, camera):
        model = geometry.instance_matrices(scene)
        vp, clip_mats = geometry.camera_clip_matrices(camera, model)
        visible = geometry.coarse_cull(scene, model, vp)
        lod = geometry.select_lod(scene, camera, model)
        s, rec = geometry.build_draw_stream(
            scene, visible, lod, clip_mats, model,
            cfg.expand_capacity, cfg.tri_capacity, rw, rh,
        )
        return s.clip, s.valid, rec

    timeit("geometry (fused build_draw_stream + prepare)", geo, scene, camera, iters=iters)

    def geo_prepare(scene, camera):
        model = geometry.instance_matrices(scene)
        vp, clip_mats = geometry.camera_clip_matrices(camera, model)
        visible = geometry.coarse_cull(scene, model, vp)
        lod = geometry.select_lod(scene, camera, model)
        return model, clip_mats, visible, lod

    model, clip_mats, visible, lod = jax.jit(geo_prepare)(scene, camera)
    timeit("  prepare only (matrices+coarse+lod)", geo_prepare, scene, camera, iters=iters)

    def geo_expand(scene, visible, lod, clip_mats, model):
        s = geometry.expand_cull_sort_two_phase(
            scene, visible, lod, clip_mats, model,
            cfg.expand_capacity, cfg.tri_capacity, rw, rh,
        )
        return s.clip, s.valid
    timeit("  two-phase expand+cull+sort", geo_expand, scene, visible, lod,
           clip_mats, model, iters=iters)

    def geo_records(soup, scene):
        return geometry.build_shade_records(soup, scene)
    timeit("  build_shade_records", geo_records, soup, scene, iters=iters)

    # --- raster --------------------------------------------------------------
    from renderer_tpu.ops.raster_pallas import rasterize_pallas

    def rast(clip, valid):
        v = rasterize_pallas(clip, valid, rw, rh)
        return v.depth
    timeit("raster (pallas)", rast, soup.clip, soup.valid, iters=iters)

    # --- shade ---------------------------------------------------------------
    from renderer_tpu.ops.pbr import shade_pbr

    vp_inv = jnp.linalg.inv(geometry.camera_clip_matrices(
        camera, jax.jit(geometry.instance_matrices)(scene))[0])

    def shade(vis, shade_rec, scene):
        return shade_pbr(
            vis, shade_rec, scene, camera.position, viewproj_inv=vp_inv,
            enable_textures=True, enable_normal_maps=False, trilinear=False,
        )
    timeit("shade (pbr, bilinear, no normal maps)", shade, vis, shade_rec, scene, iters=iters)

    # shade sub-parts
    safe_id = jnp.maximum(vis.tri_id, 0)

    def sub_gather(shade_rec, safe_id):
        return shade_rec[safe_id]
    rows = timeit("  record row-gather (H,W,128)", sub_gather, shade_rec, safe_id, iters=iters)

    def sub_unproject(vis):
        return geometry.unproject_depth(vis.depth, vp_inv, rw, rh)
    timeit("  unproject_depth", sub_unproject, vis, iters=iters)

    from renderer_tpu.ops.geometry import SR_BC_LAYER, SR_TEXLOD, SR_UV
    from renderer_tpu.ops.texture import sample_atlas_cf

    rows_arr = jax.jit(sub_gather)(shade_rec, safe_id)
    b0, b1, b2 = vis.bary[0], vis.bary[1], vis.bary[2]
    u = b0 * rows_arr[..., SR_UV] + b1 * rows_arr[..., SR_UV + 2] + b2 * rows_arr[..., SR_UV + 4]
    v_ = b0 * rows_arr[..., SR_UV + 1] + b1 * rows_arr[..., SR_UV + 3] + b2 * rows_arr[..., SR_UV + 5]
    layer = rows_arr[..., SR_BC_LAYER].astype(jnp.int32)
    tlod = rows_arr[..., SR_TEXLOD]

    def sub_tex(scene, layer, u, v_, tlod):
        return sample_atlas_cf(scene.atlas, layer, u, v_, tlod, trilinear=False)
    timeit("  texture sample (bilinear+nearest mip)", sub_tex, scene, layer, u, v_, tlod, iters=iters)

    def sub_tex_tri(scene, layer, u, v_, tlod):
        return sample_atlas_cf(scene.atlas, layer, u, v_, tlod, trilinear=True)
    timeit("  texture sample (trilinear)", sub_tex_tri, scene, layer, u, v_, tlod, iters=iters)

    gather_microbench(iters)


def gather_microbench(iters):
    """Gather cost vs index count and row width on this chip."""
    print("\n--- gather microbench ---")
    key = jax.random.PRNGKey(0)
    n_px = WIDTH * HEIGHT
    for n_idx, rows, width in [
        (n_px, 1 << 17, 128),   # the shade-record gather
        (n_px, 1 << 20, 1),     # one u32-ish tap (atlas-style flat gather)
        (n_px, 1 << 20, 4),     # quad-row gather (padded lanes)
        (n_px, 1 << 20, 8),     # two-level quad row
        (n_px // 4, 1 << 20, 1),  # quarter-index tap
        (4 * n_px, 1 << 20, 1),   # 4x-index tap (merged-4-tap idea)
    ]:
        tbl = jax.random.normal(key, (rows, width), jnp.float32) if width > 1 else (
            jax.random.normal(key, (rows,), jnp.float32))
        idx = jax.random.randint(key, (n_idx,), 0, rows, jnp.int32)

        def g(tbl, idx):
            return tbl[idx]
        f = jax.jit(g)
        out = f(tbl, idx)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(tbl, idx)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"gather idx={n_idx/1e6:5.2f}M rows={rows} width={width:<4d} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
