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
    scene = sponza_like_scene(N_INSTANCES)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, shading="pbr", enable_normal_maps=False,
        trilinear=False,
    )
    r = Renderer(scene, cfg, outputs=("image",))
    cams = [make_camera(0.3 + 0.01 * k) for k in range(8)]
    jax.block_until_ready(r.render(cams[0])["image"])  # compile

    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rt_trace"
    with jax.profiler.trace(logdir):
        out = None
        for c in cams:
            out = r.render(c)
        jax.block_until_ready(out["image"])
    print("trace captured", flush=True)

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    print("xplane files:", paths, flush=True)
    if not paths:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "hlo_stats", {}
    )
    out_path = os.path.join(logdir, "hlo_stats.json")
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    with open(out_path, "w") as f:
        f.write(data)
    print("wrote", out_path, flush=True)
    # quick textual top-20 by self-time if the payload is JSON
    try:
        j = json.loads(data)
        rows = j if isinstance(j, list) else j.get("data", [])
        print("top rows:", rows[:3], flush=True)
    except Exception as e:  # formats vary by plugin version; file has it all
        print("non-json payload (see file):", type(data), e, flush=True)


if __name__ == "__main__":
    main()
