"""Round-4 item 1 groundwork: where does the shadows=True frame cost go?

Measures (bench scene, 1080p, 10k instances, chained-fetch timing):
  A. frame shadows=False, full rate          (the round-3 exact headline)
  B. frame shadows=True,  full rate          (PERF session 6: ~78 ms)
  C. frame shadows=True,  checkerboard+fix   (does cb halve the lookup?)
  D. the shadow pass ALONE (mats + per-light cull/expand/raster, 4x512^2)

B - A - D ~= per-pixel lookup cost. D is what atlas caching can remove.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry
from renderer_tpu.ops.shadow import light_matrices_cube, render_shadow_atlas_per_light
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache

FRAMES = 20


def time_renderer(renderer, label):
    out = renderer.render(make_camera(0.3))
    float(np.asarray(out["image"][0, 0, 0]))  # compile + drain
    t0 = time.perf_counter()
    for k in range(FRAMES):
        out = renderer.render(make_camera(0.3 + 0.01 * k))
    float(np.asarray(out["image"][0, 0, 0]))
    ms = (time.perf_counter() - t0) / FRAMES * 1e3
    print(f"{label}: {ms:.2f} ms ({1000.0/ms:.1f} FPS)", flush=True)
    return ms


def main():
    enable_persistent_cache()
    import os as _os

    scene = sponza_like_scene(N_INSTANCES)
    _ss = int(_os.environ.get("RT_SHADOW_SIZE", "512"))
    cfg = PipelineConfig(
        shadow_size=_ss,
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        trilinear=False,
    )

    which = sys.argv[1] if len(sys.argv) > 1 else "abcd"

    if "a" in which:
        r = Renderer(scene, cfg, outputs=("image",))
        a = time_renderer(r, "A shadows=False full")
        del r

    if "b" in which:
        r = Renderer(scene, dataclasses.replace(cfg, shadow_cache=False),
                     outputs=("image",))
        r.set_config(shadows=True)
        r.apply_config_now()
        b = time_renderer(r, "B shadows=True  full uncached")
        del r

    if "c" in which:
        r = Renderer(
            scene,
            dataclasses.replace(
                cfg, shadow_cache=False,
                shade_rate="checkerboard", shade_fix=True,
            ),
            outputs=("image",),
        )
        r.set_config(shadows=True)
        r.apply_config_now()
        c = time_renderer(r, "C shadows=True  cb+fix uncached")
        del r

    if "e" in which:
        r = Renderer(scene, cfg, outputs=("image",))
        r.set_config(shadows=True)
        r.apply_config_now()
        time_renderer(r, "E shadows=True  full CACHED")
        del r

    if "f" in which:
        r = Renderer(
            scene,
            dataclasses.replace(cfg, shade_rate="checkerboard", shade_fix=True),
            outputs=("image",),
        )
        r.set_config(shadows=True)
        r.apply_config_now()
        time_renderer(r, "F shadows=True  cb+fix CACHED")
        del r

    if "d" not in which:
        return

    # D: the shadow pass alone, chained
    cam = make_camera(0.35)
    prepared = jax.jit(geometry.prepare_frame_columns)(scene, cam)
    model, lod = prepared[0], prepared[4]
    smin, smax = prepared[5], prepared[6]

    @jax.jit
    def atlas_fn(s, seed, mo, lo):
        mats = light_matrices_cube(s.lights, smin, smax)
        atlas = render_shadow_atlas_per_light(
            s, mats, s.lights, mo, lo, cfg.shadow_slots, cfg.shadow_size,
            cfg.tri_capacity, use_pallas=True,
        )
        return atlas + seed

    from scripts.timing import timeit_chained

    d = timeit_chained(lambda s: atlas_fn(scene, s, model, lod), n=10)
    print(f"D shadow atlas alone: {d:.2f} ms", flush=True)
    print(f"=> lookup cost ~= B - A - D = {b - a - d:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
