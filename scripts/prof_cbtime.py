"""Quick A/B: checkerboard+fix frame time + PSNR vs the exact path.

bench.py's cb section only (skips the probe and the full-rate timing loop)
so a fix-path change can be measured in ~2 min. Run alone on the TPU.
"""
import dataclasses
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bench import FRAMES, HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    import jax

    platform = jax.devices()[0].platform
    scene = sponza_like_scene(N_INSTANCES)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=(platform == "tpu"), shading="pbr",
        enable_normal_maps=False, trilinear=False,
    )

    def sync(o):
        return float(np.asarray(o["image"][0, 0, 0]))

    cam_ref = make_camera(0.3 + 0.005 * FRAMES)
    exact = Renderer(scene, cfg, outputs=("image",))
    img_exact = np.clip(np.asarray(exact.render(cam_ref)["image"]), 0.0, 1.0)
    del exact

    cb = Renderer(
        scene,
        dataclasses.replace(cfg, shade_rate="checkerboard", shade_fix=True),
        outputs=("image",),
    )
    out = cb.render(make_camera(0.3))
    sync(out)
    for trial in range(3):
        t0 = time.perf_counter()
        for k in range(FRAMES):
            out = cb.render(make_camera(0.3 + 0.01 * k))
        sync(out)
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"trial {trial}: cb+fix frame {dt * 1e3:.2f} ms  ({1.0 / dt:.2f} FPS)")
    img_cb = np.clip(np.asarray(cb.render(cam_ref)["image"]), 0.0, 1.0)
    mse = float(np.mean(np.square(img_exact - img_cb)))
    print(f"display-clamped PSNR: {10.0 * math.log10(1.0 / max(mse, 1e-12)):.2f} dB")


if __name__ == "__main__":
    main()
