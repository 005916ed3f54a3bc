"""Real-2-chip readiness artifact (VERDICT r3 item 10).

This environment has ONE physical TPU chip; the SPMD frame plan is
correctness-complete on virtual CPU meshes (tests/test_parallel.py,
__graft_entry__.dryrun_multichip) but its claimed ~18-19 ms 2-chip frame
cannot be timed here. This script prepares everything a future multi-chip
environment needs to validate the claim immediately:

  1. traces + lowers the FULL bench-shape SPMD frame (1920x1088, 10k
     instances, 128k tri capacity, row-sharded raster/shade) over an
     n-device mesh of whatever backend is present — virtual CPU devices
     (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=N)
     reproduce the exact same partitioned StableHLO a TPU mesh would get;
  2. saves the lowered module (diagnostics/spmd_aot_nN.stablehlo.txt) and
     prints its collective inventory (all-gathers/psums over the mesh axis);
  3. prints the expected per-chip frame-time derivation from the measured
     single-chip split (PERF.md "round-4 levers" #4).

On a real multi-chip host, run:
  python scripts/spmd_aot.py --devices N --compile
then benchmark with Renderer(spmd_mesh=make_mesh()) exactly as bench.py
does single-chip (the plan and switches are THE SAME).
"""
import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=2)
    ap.add_argument("--compile", action="store_true",
                    help="run backend compile too (minutes on CPU)")
    ap.add_argument("--real", action="store_true",
                    help="use the host's real devices (a multi-chip TPU "
                         "host) instead of the virtual CPU mesh")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    n = args.devices

    import jax

    if not args.real:
        # virtual CPU mesh: same partitioned StableHLO a TPU mesh would get.
        # The CPU backend initializes lazily, so XLA_FLAGS still applies even
        # though this environment's sitecustomize pre-imported jax (the
        # platform itself must be forced through jax.config, not env; and
        # jax.devices() must not be touched before the switch — it would
        # pin the axon backend).
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            )
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()[:n]
    assert len(devices) == n, (jax.devices(), n)
    on_tpu = devices[0].platform == "tpu"

    from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
    from renderer_tpu.models import sponza_like_scene
    from renderer_tpu.ops.overlay import Overlay
    from renderer_tpu.parallel import make_mesh
    from renderer_tpu.passes.pipeline import PipelineConfig
    from renderer_tpu.runtime import Renderer

    # real bench shapes; per-device tri capacity = total / n (the strided
    # instance sharding balances shards, tests/test_parallel.py)
    cfg = PipelineConfig(
        width=WIDTH, height=HEIGHT, tri_capacity=TRI_CAPACITY,
        use_pallas=True, pallas_interpret=not on_tpu,
        shading="pbr", enable_normal_maps=True, aa="edge", trilinear=False,
        # the round-5 headline configuration: the checkerboard+fix VRS tier
        # with the amortized shadow atlas on (the reference's always-on
        # shadows), per-band signatures + progressive band units included
        shade_rate="checkerboard", shade_fix=True,
        shadow_update_budget=1, shadow_progressive=8,
        spmd_devices=n,
    )
    scene = sponza_like_scene(N_INSTANCES)
    mesh = make_mesh(devices)
    r = Renderer(scene, cfg, outputs=("image",), spmd_mesh=mesh)
    r.set_config(shadows=True)
    r.apply_config_now()
    plan = r.plans.plan(r.config.as_dict())

    import numpy as np

    fn = r._jit_for(plan).lower(
        r.state, scene, make_camera(0.35), np.float32(0.0), Overlay.empty()
    )
    txt = fn.as_text()
    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "diagnostics",
        f"spmd_aot_n{n}.stablehlo.txt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write(txt)

    colls = {}
    for kind in ("all_gather", "all_reduce", "collective_permute",
                 "reduce_scatter", "psum", "ppermute"):
        c = len(re.findall(rf"\b{kind}\b", txt))
        if c:
            colls[kind] = c
    print(f"lowered SPMD frame (n={n}, {devices[0].platform}): "
          f"{len(txt)} chars -> {out}")
    print(f"collectives in module: {colls}")

    if args.compile:
        import time

        t0 = time.time()
        fn.compile()
        print(f"backend compile OK in {time.time() - t0:.0f}s")

    print(
        "\nexpected 2-chip frame (from the measured single-chip split,\n"
        "PERF.md round-3 close: shade 16.6 + raster 8.0 row-shardable,\n"
        "cull ~3.8 instance-sharded + 1 ICI all-gather of the 128k-record\n"
        "stream ~0.5 ms at 4.5 GB/s/link, prepare 0.5 replicated):\n"
        "  ~ (16.6 + 8.0 + 3.8) / 2 + 0.5 + 0.5 + host ~1.5 = ~17-19 ms"
    )


if __name__ == "__main__":
    main()
