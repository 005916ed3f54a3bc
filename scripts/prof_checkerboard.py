"""A/B the checkerboard shade tier at the bench config: PSNR + frame time.

Run alone on the TPU (PERF.md measurement hygiene)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

import bench
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.models import sponza_like_scene

FRAMES = 30


def run(rate, scene, fix=False):
    cfg = PipelineConfig(
        width=bench.WIDTH, height=bench.HEIGHT, tri_capacity=bench.TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        trilinear=False, shade_rate=rate, shade_fix=fix,
    )
    r = Renderer(scene, cfg, outputs=("image",))
    out = r.render(bench.make_camera(0.3))
    jax.block_until_ready(out["image"])
    img = np.asarray(out["image"])
    t0 = time.perf_counter()
    for k in range(FRAMES):
        out = r.render(bench.make_camera(0.3 + 0.01 * k))
    jax.block_until_ready(out["image"])
    ms = (time.perf_counter() - t0) / FRAMES * 1e3
    return img, ms


def main():
    scene = sponza_like_scene(bench.N_INSTANCES)
    full_img, full_ms = run("full", scene)
    cb_img, cb_ms = run("checkerboard", scene)
    fix_img, fix_ms = run("checkerboard", scene, fix=True)
    print(
        f"full: {full_ms:.2f} ms  checkerboard: {cb_ms:.2f} ms  "
        f"cb+fix: {fix_ms:.2f} ms"
    )
    # raw HDR PSNR is dominated by a handful of unclamped specular spikes
    # (err max ~57 on a 1.0 peak); the display-clamped metric is what a
    # PNG/viewer shows, so report both
    for tag, img in (("cb", cb_img), ("cb+fix", fix_img)):
        for name, a, b in (
            ("HDR", img, full_img),
            ("display-clamped", np.clip(img, 0, 1), np.clip(full_img, 0, 1)),
        ):
            mse = float(np.mean((a - b) ** 2))
            psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
            print(f"PSNR({tag} vs full, {name}) = {psnr:.2f} dB")


if __name__ == "__main__":
    main()
