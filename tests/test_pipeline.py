"""Pipeline-as-frame-graph + Renderer runtime tests."""

import numpy as np
import jax.numpy as jnp

from renderer_tpu import mathx
from renderer_tpu.mathx.camera import Camera
from renderer_tpu.ops.raster_spec import NO_TRIANGLE
from renderer_tpu.passes.pipeline import PipelineConfig, build_forward_graph
from renderer_tpu.runtime import Renderer
from renderer_tpu.scene import SceneBuilder, SceneLimits, primitives


def small_scene():
    b = SceneBuilder(SceneLimits.tiny())
    box = b.add_mesh(primitives.box())
    m = b.add_material(base_color=(0.9, 0.4, 0.2, 1.0))
    b.add_instance(box, m)
    b.add_instance(box, m, translation=(1.5, 0, -1.0), scale=0.5)
    b.add_light(position=(2.0, 3.0, 4.0), intensity=20.0)
    return b.build()


def cam(x=0.0):
    return Camera.create(position=jnp.array([x, 0.5, 3.0]), near=0.1, far=50.0)


# lambert: graph-semantics tests want camera-independent shading so a frozen
# soup renders bit-identically under a moved camera
CFG = PipelineConfig(width=64, height=64, tri_capacity=256, shading="lambert")


def test_renderer_basic_frame():
    r = Renderer(small_scene(), CFG)
    out = r.render(cam())
    img = np.asarray(out["image"])
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert (np.asarray(out["vis"].tri_id) != NO_TRIANGLE).sum() > 50
    assert r.frame_number == 2
    assert r.stats["compiles"] == 1


def test_jit_cache_reused_across_frames():
    r = Renderer(small_scene(), CFG)
    for i in range(4):
        out = r.render(cam(0.1 * i))
    assert r.stats["compiles"] == 1
    assert r.stats["frames"] == 4


def test_freeze_culling_reuses_last_soup():
    """With freeze_culling on, the persistent soup is pinned. The soup stores
    clip-space positions, so a frozen frame renders identically even when the
    camera moves (ref: cull_pipeline.rs:331-421 freeze + bypass)."""
    r = Renderer(small_scene(), CFG)
    out1 = r.render(cam())  # normal frame, fills soup
    r.set_config(freeze_culling=True)
    out2 = r.render(cam())  # latches config; still unfrozen this frame
    out3 = r.render(cam(2.0))  # frozen: same soup as frame 2 despite new camera
    img2 = np.asarray(out2["image"])
    img3 = np.asarray(out3["image"])
    np.testing.assert_array_equal(img2, img3)
    # unfreeze: image changes
    r.set_config(freeze_culling=False)
    r.render(cam(2.0))  # latch frame
    out5 = r.render(cam(2.0))
    assert np.abs(np.asarray(out5["image"]) - img2).max() > 1e-3


def test_debug_aabbs_switch():
    r = Renderer(small_scene(), CFG)
    out_normal = r.render(cam())
    r.set_config(debug_aabbs=True)
    r.render(cam())
    out_dbg = r.render(cam())
    # AABB view covers at least as much as the mesh view (boxes enclose meshes)
    cov_n = (np.asarray(out_normal["vis"].tri_id) != NO_TRIANGLE).sum()
    cov_d = (np.asarray(out_dbg["vis"].tri_id) != NO_TRIANGLE).sum()
    assert cov_d >= cov_n
    # two distinct plans compiled
    assert r.stats["compiles"] == 2
    # debug colors differ from lambert shading
    assert np.abs(np.asarray(out_dbg["image"]) - np.asarray(out_normal["image"])).max() > 0.05


def test_graph_validates_and_dumps():
    from renderer_tpu.graph.dot import graph_to_dot, plan_to_dot

    g = build_forward_graph(CFG)
    g.validate()
    plan = g.compile(outputs=["image"], switches={"debug_aabbs": False, "freeze_culling": False})
    names = [p.name for p in plan.passes]
    assert names == ["prepare", "cull", "raster", "shade"]
    plan_dbg = g.compile(outputs=["image"], switches={"debug_aabbs": True, "freeze_culling": False})
    names_dbg = [p.name for p in plan_dbg.passes]
    assert "aabb_soup" in names_dbg and "cull" not in names_dbg
    dot = graph_to_dot(g)
    assert "aabb_soup" in dot
    assert "cull" in plan_to_dot(plan)
