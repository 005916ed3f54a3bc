"""A/B runtime switches at the bench config: occlusion culling and cluster
culling — do they pay for themselves at the current kernel cost structure?"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def loop(r, label, frames=30):
    cams = [make_camera(0.3 + 0.01 * k) for k in range(frames)]
    out = r.render(cams[0])
    jax.block_until_ready(out["image"])
    out = r.render(cams[1])  # second plan warm (two-frame latch)
    jax.block_until_ready(out["image"])
    t0 = time.perf_counter()
    for c in cams:
        out = r.render(c)
    jax.block_until_ready(out["image"])
    print(f"{label:<28s} {(time.perf_counter()-t0)/frames*1e3:7.2f} ms", flush=True)


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    base = dict(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        trilinear=False,
    )
    r = Renderer(scene, PipelineConfig(**base), outputs=("image",))
    loop(r, "baseline")
    r.set_config(occlusion_culling=True)
    r.apply_config_now()
    loop(r, "occlusion_culling=True")
    r.set_config(occlusion_culling=False)
    r.apply_config_now()

    rc = Renderer(
        scene, PipelineConfig(**base, cluster_cull=True), outputs=("image",)
    )
    loop(rc, "cluster_cull=True")


if __name__ == "__main__":
    main()
