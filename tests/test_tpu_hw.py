"""Real-TPU (Mosaic) kernel tests — opt-in, run with RENDERER_TPU_TESTS=1.

The rest of the suite runs the Pallas kernels in interpret mode on a virtual
CPU mesh (tests/conftest.py), which validates semantics but not Mosaic
compilation or on-chip numerics. This test drives the flagship rasterizer on
the actual TPU in a subprocess (the conftest pins this process to CPU, so a
clean interpreter is required) and cross-checks against the interpret-mode
result.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RENDERER_TPU_TESTS") != "1",
    reason="set RENDERER_TPU_TESTS=1 to run on real TPU hardware",
)

_SCRIPT = r"""
import jax, jax.numpy as jnp, numpy as np, sys
assert jax.devices()[0].platform == "tpu", jax.devices()
sys.path.insert(0, "__REPO__")
from renderer_tpu.mathx.camera import Camera
from renderer_tpu.models import textured_scene
from renderer_tpu.ops import geometry
from renderer_tpu.ops.raster_pallas import rasterize_pallas
from renderer_tpu.scene import SceneLimits

scene = textured_scene(SceneLimits.tiny(), atlas_size=16)
cam = Camera.create(position=jnp.array([0.0, 1.2, 4.0]), fov_y=0.9, near=0.1, far=60.0)
model = geometry.instance_matrices(scene)
vp, clip_mats = geometry.camera_clip_matrices(cam, model)
visible = geometry.coarse_cull(scene, model, vp)
lod = geometry.select_lod(scene, cam, model)
soup, rec = geometry.build_draw_stream(
    scene, visible, lod, clip_mats, model, 2048, 1024, 256, 64)
vis_hw = rasterize_pallas(soup.clip, soup.valid, 256, 64)          # Mosaic
vis_it = rasterize_pallas(soup.clip, soup.valid, 256, 64, interpret=True)
id_hw = np.asarray(vis_hw.tri_id); id_it = np.asarray(vis_it.tri_id)
d_hw = np.asarray(vis_hw.depth); d_it = np.asarray(vis_it.depth)
assert (id_hw != -1).mean() > 0.2, "TPU raster drew almost nothing"
agree = (id_hw == id_it).mean()
assert agree > 0.999, f"Mosaic vs interpret id agreement {agree}"
assert np.abs(d_hw - d_it).max() < 1e-5, np.abs(d_hw - d_it).max()
print("TPU_KERNEL_OK", agree)
"""


def test_pallas_raster_on_real_tpu():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__REPO__", repo)],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "TPU_KERNEL_OK" in out.stdout
