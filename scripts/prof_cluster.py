"""Cluster (meshlet) culling cost/benefit by scene class.

The 10k LOD-heavy bench culls only ~2.5% of clusters (coarse LODs make
32-tri normal cones near-hemispheric) and pays ~5 ms — cluster_cull
defaults off. This measures the knob on a DETAILED-geometry scene (dense
spheres/tori, no LOD chains) where cones stay tight and ~half the
clusters backface, to document the scene class where it pays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import WIDTH, HEIGHT, TRI_CAPACITY, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    # detailed scene class: full-resolution meshes only (no LOD chains),
    # fewer instances so the triangle budget matches the bench
    scene = sponza_like_scene(2000, with_lods=False)
    assert scene.meshes.cluster_data is not None
    cam = make_camera(0.35)
    prepared = jax.jit(geometry.prepare_frame_columns)(scene, cam)
    model, vp, clip_mats, visible, lod = prepared[:5]
    E, T = 2 * TRI_CAPACITY, TRI_CAPACITY

    def run(use_clusters):
        kw = dict(camera_pos=cam.position, vp=vp) if use_clusters else {}
        f = jax.jit(lambda s, v, l, cm, m: geometry.build_draw_stream(
            s, v, l, cm, m, E, T, WIDTH, HEIGHT, **kw))
        t0 = time.time()
        soup, rec = f(scene, visible, lod, clip_mats, model)
        jax.block_until_ready(soup.clip)
        print(f"  compile {time.time()-t0:.0f}s count={int(soup.count)}", flush=True)
        t0 = time.time()
        for _ in range(20):
            soup, rec = f(scene, visible, lod, clip_mats, model)
        jax.block_until_ready((soup.clip, rec))
        return (time.time() - t0) / 20 * 1e3

    off = run(False)
    print(f"cluster_cull OFF: {off:.2f} ms", flush=True)
    on = run(True)
    print(f"cluster_cull ON:  {on:.2f} ms  (delta {on-off:+.2f})", flush=True)


if __name__ == "__main__":
    main()
