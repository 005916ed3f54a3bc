"""Standalone raster kernel bench at the headline scene (soup from probe)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops.raster_pallas import rasterize_pallas
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer


def main():
    scene = sponza_like_scene(N_INSTANCES)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        trilinear=False,
    )
    r = Renderer(scene, cfg, outputs=("soup",))
    soup = r.render(make_camera(0.35))["soup"]
    clip = jax.block_until_ready(soup.clip)
    valid = soup.valid
    print(f"count={int(np.asarray(soup.count))}", flush=True)

    for wb in (False, True):
        f = jax.jit(
            lambda c, v: rasterize_pallas(
                c, v, WIDTH, HEIGHT, with_bary=wb
            ).tri_id
        )
        out = jax.block_until_ready(f(clip, valid))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = f(clip, valid)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"rasterize_pallas with_bary={wb}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
