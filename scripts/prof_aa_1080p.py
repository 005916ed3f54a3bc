"""Bench-scale (1080p) edge-AA evidence (VERDICT r4 item 8).

The 64x64 toy inequality in tests/test_aa.py is not evidence at production
resolution, so: render the bench scene at the gate pose three ways —
aliased (aa=none), the production edge-AA tier, and the SSAA 2x2
box-resolved reference (the quality-parity stand-in for the reference's
always-on 4xMSAA, renderer.rs:1047-1087) — and report PSNR vs the SSAA
frame plus error stats restricted to triangle-ID edge pixels (where AA is
supposed to act).

Run alone on the TPU.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    cam = make_camera(0.35)
    base = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=True,
        trilinear=False,
    )

    def render(**kw):
        r = Renderer(scene, dataclasses.replace(base, **kw),
                     outputs=("image", "vis"))
        out = r.render(cam)
        img = np.clip(np.asarray(out["image"]), 0, 1)
        tri = np.asarray(out["vis"].tri_id) if "vis" in out else None
        del r
        return img, tri

    plain, tri = render(aa="none")
    edge, _ = render(aa="edge")
    ssaa, _ = render(aa="none", ssaa=2)

    p_plain = psnr(plain, ssaa)
    p_edge = psnr(edge, ssaa)
    print(f"1080p vs SSAA4 reference: aliased {p_plain:.2f} dB, "
          f"edge-AA {p_edge:.2f} dB (delta {p_edge - p_plain:+.2f})",
          flush=True)

    # edge-pixel restriction: pixels whose tri id differs from any 4-neighbor
    t = tri
    e = np.zeros(t.shape, bool)
    e[1:, :] |= t[1:, :] != t[:-1, :]
    e[:-1, :] |= t[:-1, :] != t[1:, :]
    e[:, 1:] |= t[:, 1:] != t[:, :-1]
    e[:, :-1] |= t[:, :-1] != t[:, 1:]
    for name, img in (("aliased", plain), ("edge-AA", edge)):
        err = np.abs(img - ssaa).max(axis=-1)[e]
        print(f"  {name:8s} edge pixels ({e.sum()}): mean {err.mean():.4f} "
              f"p90 {np.percentile(err, 90):.4f} p99 "
              f"{np.percentile(err, 99):.4f}", flush=True)


if __name__ == "__main__":
    main()
