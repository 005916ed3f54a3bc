"""Shade-rate tier A/B at the bench: full vs checkerboard+fix vs quarter+fix.

Times each tier with the bench's donated-state chained orbit and reports
min-over-poses display-clamped PSNR vs the SAME run's full-rate frames
(the bench gate's basis). SH=1 also measures the shadows-on tier.

Run alone on the TPU (PERF.md measurement hygiene).
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import (
    HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, _measure_mode, psnr_min,
)
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    base = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=True, aa="edge",
        trilinear=False,
    )
    shadows = os.environ.get("SH", "0") == "1"
    frames_full = None
    for rate in ("full", "checkerboard", "quarter"):
        cfg = dataclasses.replace(
            base, shade_rate=rate, shade_fix=(rate != "full")
        )
        dt, frames = _measure_mode(scene, cfg, shadows=shadows)
        if rate == "full":
            frames_full = frames
            psnr = float("inf")
        else:
            psnr = psnr_min(frames_full, frames)
        print(
            f"shadows={int(shadows)} rate={rate:<13s} "
            f"{dt*1e3:6.2f} ms/frame ({1.0/dt:5.1f} FPS)  "
            f"min-pose PSNR vs full: {psnr:.2f} dB",
            flush=True,
        )


if __name__ == "__main__":
    main()
