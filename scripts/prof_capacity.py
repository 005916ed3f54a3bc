"""Measure expansion demand + survivor counts across the bench camera sweep,
to right-size TRI_CAPACITY / expand capacity (capacity-sized ops dominate the
geometry stage; VERDICT r2 item 1a).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry


def main():
    scene = sponza_like_scene(N_INSTANCES)
    E, T = 2 * TRI_CAPACITY, TRI_CAPACITY

    @jax.jit
    def stats(scene, cam):
        prepared = geometry.prepare_frame_columns(scene, cam)
        model, vp, clip_mats, visible, lod = prepared[:5]
        inst = scene.instances
        lib = scene.meshes
        tc = jnp.where(visible, lib.lod_tri_count[inst.mesh_id, lod], 0)
        demand = jnp.sum(tc)  # pre-cull expansion slots needed
        soup, rec = geometry.build_draw_stream(
            scene, visible, lod, clip_mats, model, E, T, WIDTH, HEIGHT
        )
        return demand, soup.count

    demands, survs = [], []
    for k in range(40):
        cam = make_camera(0.25 + 0.01 * k)
        d, s = jax.device_get(stats(scene, cam))
        demands.append(int(d)); survs.append(int(s))
    print("demand  min/max:", min(demands), max(demands))
    print("survive min/max:", min(survs), max(survs))
    print("current E, T:", E, T)


if __name__ == "__main__":
    main()
