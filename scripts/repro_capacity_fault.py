"""Regression repro for the capacity-dependent TPU worker fault (r5).

rasterize_pallas at tri capacities whose bin-list width was 10 or 12
SMEM sublane rows (81920 -> 1280 blocks, 98304 -> 1536) crashed the TPU
worker deterministically: HBM->SMEM DMA destinations need sublane counts
<= 8 or multiples of 8 (4/8/16/32-row shapes were always fine). Fixed by
quantizing the bin-list and mask widths to 1024 entries (8 rows x 128);
this script drives every capacity standalone in subprocesses so a
regression names itself without killing the run.

Run on the TPU: python scripts/repro_capacity_fault.py
"""
import os
import subprocess
import sys

CAP = sys.argv[1] if len(sys.argv) > 1 else None
if CAP is None:
    ok = True
    for cap in (32768, 65536, 81920, 98304, 131072):
        r = subprocess.run(
            [sys.executable, __file__, str(cap)],
            capture_output=True, text=True, timeout=900,
        )
        good = "PROBE_OK" in r.stdout
        ok &= good
        print(f"capacity {cap}: {'OK' if good else 'FAIL'}", flush=True)
    sys.exit(0 if ok else 1)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax.numpy as jnp

from renderer_tpu.ops.raster_pallas import rasterize_pallas

cap = int(CAP)
rng = np.random.default_rng(1)
n_real = min(cap, 5000)
clip = np.zeros((cap, 3, 4), np.float32)
pts = rng.uniform(-1, 1, (n_real, 3, 2)).astype(np.float32)
clip[:n_real, :, 0] = pts[..., 0]
clip[:n_real, :, 1] = pts[..., 1]
clip[:n_real, :, 2] = rng.uniform(0.1, 0.9, (n_real, 3)).astype(np.float32)
clip[:n_real, :, 3] = 1.0
valid = np.zeros((cap,), bool)
valid[:n_real] = True
vis = rasterize_pallas(
    jnp.asarray(clip), jnp.asarray(valid), 512, 64,
    cull_backface=False, with_bary=False,
)
d = np.asarray(vis.depth)
assert np.isfinite(d).all()
print("PROBE_OK")
