"""In-frame stage split by dead-code elimination.

Standalone stage benches don't reproduce the fused frame's cost, so measure
the REAL split: jit progressively larger prefixes of the actual frame
function and difference them. Reduced outputs keep XLA from DCE-ing the
prefix while dropping everything after it.

  A geometry only  (raster+shade DCE'd)
  B geometry+raster (shade DCE'd)
  C full frame (the bench program)
=> raster = B-A, shade = C-B, geometry+prepare = A.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry
from renderer_tpu.ops.raster_pallas import rasterize_pallas
from renderer_tpu.ops.pbr import shade_pbr
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def timeit(name, f, *args, iters=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<46s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    cam = make_camera(0.35)
    E, T = 2 * TRI_CAPACITY, TRI_CAPACITY

    def frame(scene, cam, upto):
        prepared = geometry.prepare_frame_columns(scene, cam)
        model, vp, clip_mats, visible, lod = prepared[:5]
        soup, rec = geometry.build_draw_stream(
            scene, visible, lod, clip_mats, model, E, T, WIDTH, HEIGHT
        )
        if upto == "geo":
            return jnp.sum(soup.clip), jnp.sum(rec), soup.count
        vis = rasterize_pallas(
            soup.clip, soup.valid, WIDTH, HEIGHT, with_bary=False
        )
        if upto == "raster":
            return jnp.sum(vis.depth), jnp.sum(vis.tri_id)
        img = shade_pbr(
            vis, rec, scene, cam.position, viewproj_inv=prepared[7],
            enable_textures=True, enable_normal_maps=False, trilinear=False,
            bary_from_records=True,
            _upto=upto[1:] if upto.startswith("s") else None,
        )
        return jnp.sum(img)

    which = sys.argv[1] if len(sys.argv) > 1 else "grf"
    results = {}
    stages = (
        ("g", "geo"), ("r", "raster"),
        # shade internals (pbr.py _upto): records-gather / attr-interp /
        # +texture-sampling prefixes
        ("1", "sgather"), ("2", "sinterp"), ("3", "stex"),
        ("f", "full"),
    )
    for tag, name in stages:
        if tag in which:
            f = jax.jit(lambda s, c, u=name: frame(s, c, u))
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(scene, cam))
            print(f"{name} compile {time.perf_counter()-t0:.0f}s", flush=True)
            results[name] = timeit(f"{name} prefix", f, scene, cam)
    if {"geo", "raster", "full"} <= results.keys():
        print(f"=> geometry+prepare {results['geo']:.1f}  "
              f"raster {results['raster']-results['geo']:.1f}  "
              f"shade {results['full']-results['raster']:.1f}", flush=True)
    if "b" in which:  # the real Renderer loop (adds present/host tail)
        from renderer_tpu.passes.pipeline import PipelineConfig
        from renderer_tpu.runtime import Renderer

        cfg = PipelineConfig(
            width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
            use_pallas=True, shading="pbr", enable_normal_maps=False,
            trilinear=False,
        )
        r = Renderer(scene, cfg, outputs=("image",))
        cams = [make_camera(0.3 + 0.01 * k) for k in range(30)]
        jax.block_until_ready(r.render(cams[0])["image"])
        t0 = time.perf_counter()
        for c in cams:
            out = r.render(c)
        jax.block_until_ready(out["image"])
        print(f"renderer loop {(time.perf_counter()-t0)/30*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
