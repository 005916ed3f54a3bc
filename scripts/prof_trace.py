"""Per-HLO-op device profile of the real bench frame (XPlane -> hlo_stats).

DCE-prefix attribution can't see inside fused regions and distorts them
(PERF.md round-3); this captures a jax.profiler device trace of the actual
frame program and prints the top ops by self time, via
tensorboard_plugin_profile's trace converter.
"""
import glob
import json
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


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(
        N_INSTANCES, n_textures=int(os.environ.get("RT_NTEX", "2"))
    )
    cb = os.environ.get("RT_CB", "") == "1"  # trace the checkerboard tier
    rate = os.environ.get("RT_RATE", "checkerboard" if cb else "full")
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr",
        enable_normal_maps=os.environ.get("RT_NM", "0") == "1",
        aa="edge" if os.environ.get("RT_AA", "0") == "1" else "none",
        trilinear=False,
        shade_rate=rate, shade_fix=(rate != "full"),
    )
    r = Renderer(scene, cfg, outputs=("image",))
    if os.environ.get("RT_SHADOWS", "") == "1":  # attribute the shadowed frame
        r.set_config(shadows=True)
        r.apply_config_now()
    cams = [make_camera(0.3 + 0.01 * k) for k in range(8)]
    jax.block_until_ready(r.render(cams[0])["image"])  # compile
    t0 = time.perf_counter()
    out = None
    for c in cams + cams:
        out = r.render(c)
    jax.block_until_ready(out["image"])
    print(f"frame {((time.perf_counter()-t0)/16)*1e3:.2f} ms", flush=True)

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rt_trace"
    with jax.profiler.trace(logdir):
        out = None
        for c in cams:
            out = r.render(c)
        jax.block_until_ready(out["image"])
    print("trace captured", flush=True)

    # parse the chrome-trace json directly (the tensorboard profile plugin's
    # proto stubs are incompatible with the installed protobuf)
    import collections
    import gzip

    paths = sorted(
        glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    )
    print("trace files:", paths, flush=True)
    if not paths:
        return
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    print("--- top 40 by total time over 8 frames ---", flush=True)
    for name, us in tot.most_common(40):
        print(f"{us/8/1000:9.3f} ms/frame x{cnt[name]:4d}  {name[:100]}",
              flush=True)


if __name__ == "__main__":
    main()
