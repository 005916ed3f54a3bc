"""Skinning + animation tests (LBS vs numpy, clip sampling, end-to-end)."""

import numpy as np
import jax.numpy as jnp

from renderer_tpu.models.scenes import make_skinned_arm, skinned_scene
from renderer_tpu.ops.skin import pose_scene, sample_clips


def test_rest_pose_is_identity():
    """At rest (bind pose keys), palettes are identity and geometry is
    unchanged."""
    scene = skinned_scene()
    pal = np.asarray(sample_clips(scene.skins, 0.0))
    # skin 0, joint 0 has no rotation at t=0; its palette must be ~identity
    np.testing.assert_allclose(pal[0, 0], np.eye(4), atol=1e-5)


def test_lbs_matches_numpy():
    """pose_scene must equal a straightforward numpy LBS."""
    scene = skinned_scene()
    t = 0.37
    posed = pose_scene(scene, t)
    pal = np.asarray(sample_clips(scene.skins, t))  # (S, J, 4, 4)
    sk = scene.skins
    vskin = np.asarray(sk.vertex_skin)
    sel = vskin >= 0
    jids = np.asarray(sk.joints)[sel]
    wts = np.asarray(sk.weights)[sel]
    pos = np.asarray(scene.meshes.positions)[sel]
    s = vskin[sel]
    blend = np.einsum("vk,vkij->vij", wts, pal[s[:, None], jids])
    h = np.concatenate([pos, np.ones((len(pos), 1))], axis=1)
    expect = np.einsum("vij,vj->vi", blend, h)[:, :3]
    got = np.asarray(posed.meshes.positions)[sel]
    np.testing.assert_allclose(got, expect, atol=1e-4)
    # rigid vertices untouched
    rigid = ~sel & (np.arange(len(vskin)) < int(scene.meshes.vertex_count))
    np.testing.assert_array_equal(
        np.asarray(posed.meshes.positions)[rigid],
        np.asarray(scene.meshes.positions)[rigid],
    )


def test_animation_moves_vertices():
    scene = skinned_scene()
    p0 = np.asarray(pose_scene(scene, 0.0).meshes.positions)
    p1 = np.asarray(pose_scene(scene, 0.25).meshes.positions)
    sel = np.asarray(scene.skins.vertex_skin) >= 0
    moved = np.linalg.norm(p1[sel] - p0[sel], axis=-1)
    assert moved.max() > 0.1, "animation should move the arm tip"
    # base joint is static: vertices near y=0 barely move
    base = sel & (np.asarray(scene.meshes.positions)[:, 1] < 0.05)
    assert np.linalg.norm((p1 - p0)[base], axis=-1).max() < 0.05


def test_clip_looping_and_interpolation():
    scene = skinned_scene()
    pal_a = np.asarray(sample_clips(scene.skins, 0.1))
    pal_b = np.asarray(sample_clips(scene.skins, 1.1))  # duration 1.0 -> loops
    np.testing.assert_allclose(pal_a, pal_b, atol=1e-5)
    # midway between two keys differs from both
    pal_k0 = np.asarray(sample_clips(scene.skins, 0.0))
    pal_mid = np.asarray(sample_clips(scene.skins, 0.0625))
    assert np.abs(pal_mid - pal_k0).max() > 1e-3


def test_skinned_render_end_to_end():
    from renderer_tpu.mathx.camera import Camera
    from renderer_tpu.passes.pipeline import PipelineConfig
    from renderer_tpu.runtime import Renderer

    scene = skinned_scene()
    cfg = PipelineConfig(width=64, height=64, tri_capacity=1024, skinning=True)
    r = Renderer(scene, cfg)
    cam = Camera.create(position=jnp.array([0.0, 1.2, 4.0]), near=0.1, far=50.0)
    out0 = r.render(cam, time_s=0.0)
    out1 = r.render(cam, time_s=0.25)
    img0 = np.asarray(out0["image"])
    img1 = np.asarray(out1["image"])
    assert np.isfinite(img0).all() and np.isfinite(img1).all()
    assert (np.asarray(out0["vis"].tri_id) != -1).sum() > 100
    assert np.abs(img1 - img0).max() > 0.05, "animation must change the frame"
    # one compile covers all frames (time is traced, not static)
    assert r.stats["compiles"] == 1
