"""Full-frame attribution: map EVERY device op in a captured trace to its
HLO metadata (op_name scope + source line), then aggregate by scope.

Usage: python scripts/prof_hlomap.py [trace_dir]
Reuses an existing trace dir (from prof_trace.py) — reparses the newest
*.trace.json.gz — and compiles the same bench program to dump optimized HLO.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops.overlay import Overlay
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/rt_trace3"
    enable_persistent_cache()
    scene = sponza_like_scene(
        N_INSTANCES, n_textures=int(os.environ.get("RT_NTEX", "2"))
    )
    cb = os.environ.get("RT_CB", "") == "1"  # attribute the checkerboard tier
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
    plan = r.plans.plan(r.config.as_dict())
    declared = r._external_names()

    def run(state, scene, camera, t, overlay):
        ext = {"scene": scene, "camera": camera, "time": t, "overlay": overlay}
        return plan.execute(
            state, **{k: v for k, v in ext.items() if k in declared}
        )

    cam = make_camera(0.35)
    lowered = jax.jit(run, donate_argnums=0).lower(
        r.state, scene, cam, jnp.float32(0.0), Overlay.empty()
    )
    hlo = lowered.compile().as_text()
    with open("/tmp/bench_opt.hlo", "w") as f:
        f.write(hlo)
    print(f"HLO dumped: {len(hlo)} bytes", flush=True)

    # instr name -> (op_name scope, source)
    meta = {}
    pat = re.compile(
        r"^\s*(?:ROOT )?%?([\w.\-]+) = .*?metadata={([^}]*)}", re.M
    )
    for m in pat.finditer(hlo):
        name, md = m.group(1), m.group(2)
        op = re.search(r'op_name="([^"]*)"', md)
        src = re.search(r'source_file="([^"]*)"', md)
        line = re.search(r"source_line=(\d+)", md)
        meta[name] = (
            op.group(1) if op else "",
            f"{os.path.basename(src.group(1)) if src else '?'}:{line.group(1) if line else '?'}",
        )

    paths = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(paths[-1]) as f:
        trace = json.load(f)
    # device ops only: events whose name matches an HLO instruction
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    n_frames = 8

    rows = []
    covered = 0.0
    for name, us in tot.items():
        if name in meta:
            rows.append((us / n_frames / 1000.0, cnt[name], name) + meta[name])
            covered += us
    rows.sort(reverse=True)
    print(f"--- per-op (HLO-matched), {covered/n_frames/1000:.1f} ms/frame covered ---")
    for ms, c, name, op, src in rows[:60]:
        print(f"{ms:8.3f} ms x{c:4d}  {name[:28]:<28s} {src:<22s} {op[:90]}")

    # aggregate by top-2 scope levels
    agg = collections.Counter()
    for ms, c, name, op, src in rows:
        scope = "/".join(op.split("/")[:2]) if op else f"({name.split('.')[0]})"
        agg[scope] += ms
    print("--- by scope (top-2 levels) ---")
    for scope, ms in agg.most_common(40):
        print(f"{ms:8.3f} ms  {scope}")


if __name__ == "__main__":
    main()
