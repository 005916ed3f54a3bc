"""SPMD rendering tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from renderer_tpu.mathx.camera import Camera
from renderer_tpu.models import textured_scene
from renderer_tpu.parallel import make_mesh, render_frame_spmd
from renderer_tpu.passes.pipeline import PipelineConfig
from renderer_tpu.runtime import Renderer
from renderer_tpu.scene import SceneLimits


def small_scene():
    """Low-poly so no capacity truncation on either path."""
    from renderer_tpu.scene import SceneBuilder, primitives

    b = SceneBuilder(SceneLimits.tiny(), atlas_size=16)
    plane = b.add_mesh(primitives.plane(size=16.0))
    sph = b.add_mesh(primitives.uv_sphere(rings=8, sectors=12))
    box = b.add_mesh(primitives.box())
    checker = b.add_texture(primitives.checkerboard_texture(16, squares=4))
    floor = b.add_material(roughness=0.6, base_color_tex=checker)
    red = b.add_material(base_color=(0.8, 0.2, 0.2, 1), roughness=0.4)
    b.add_instance(plane, floor, translation=(0, -0.6, 0))
    b.add_instance(sph, red, translation=(-0.9, 0, 0), scale=1.1)
    b.add_instance(box, red, translation=(0.9, 0, 0))
    b.add_light(position=(3.0, 5.0, 4.0), intensity=30.0)
    return b.build()


def test_spmd_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest should force 8 CPU devices"
    scene = small_scene()
    cam = Camera.create(position=jnp.array([0.0, 1.2, 4.0]), fov_y=0.9, near=0.1, far=60.0)
    mesh = make_mesh()

    img, depth, tri_id = jax.jit(
        lambda s, c: render_frame_spmd(s, c, mesh, 64, 64, tri_capacity_per_device=512)
    )(scene, cam)
    img = np.asarray(img)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()

    # single-device reference through the normal pipeline
    r = Renderer(scene, PipelineConfig(width=64, height=64, tri_capacity=4096))
    ref = np.asarray(r.render(cam)["image"])
    # coverage must match nearly exactly; shading equal where ids agree
    got_cov = np.asarray(tri_id) != -1
    ref_cov = np.asarray(r.render(cam)["vis"].tri_id) != -1
    assert (got_cov != ref_cov).mean() < 0.01
    same = got_cov & ref_cov
    diff = np.abs(img - ref)[same]
    assert np.quantile(diff, 0.99) < 0.05, f"p99 diff {np.quantile(diff, 0.99)}"


def test_spmd_sharding_layout():
    """The image output actually comes back row-sharded across devices."""
    scene = small_scene()
    cam = Camera.create(position=jnp.array([0.0, 1.2, 4.0]))
    mesh = make_mesh()
    img, _, _ = jax.jit(
        lambda s, c: render_frame_spmd(s, c, mesh, 64, 64, tri_capacity_per_device=512)
    )(scene, cam)
    shard_shapes = {tuple(s.data.shape) for s in img.addressable_shards}
    assert shard_shapes == {(8, 64, 3)}, shard_shapes
