"""VERDICT r3 item 5 'Done' check: pass_timings must be REAL on the tunnel.

execute_timed now uses chained-fetch timing per pass (graph/core.py) —
block_until_ready does not synchronize through the axon relay. This
validates the table: the per-pass sum should land in the same ballpark as
the chained whole-frame time (above it, since per-pass jits lose cross-pass
fusion and each pays a dispatch round-trip)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=True, aa="edge",
        trilinear=False,
    )
    r = Renderer(scene, cfg, outputs=("image",))

    # chained whole-frame reference
    out = r.render(make_camera(0.3))
    float(np.asarray(out["image"][0, 0, 0]))
    t0 = time.perf_counter()
    n = 20
    for k in range(n):
        out = r.render(make_camera(0.3 + 0.01 * k))
    float(np.asarray(out["image"][0, 0, 0]))
    frame_ms = (time.perf_counter() - t0) / n * 1e3

    timings = r.pass_timings(make_camera(0.35), iters=5)
    total = sum(timings.values())
    print(f"whole frame (chained): {frame_ms:.2f} ms")
    for name, ms in timings.items():
        print(f"  {name:<16s} {ms:8.2f} ms")
    print(f"pass_timings sum: {total:.2f} ms "
          f"(frame x{total / frame_ms:.2f} — expected >= 1: per-pass jits "
          f"lose fusion and pay per-call dispatch)")
    assert total > 0.7 * frame_ms, (
        "per-pass timings sum far below the real frame — the timing path "
        "is not synchronizing (the old block_until_ready bug)"
    )
    print("OK: pass timings are device-real on the tunnel")


if __name__ == "__main__":
    main()
