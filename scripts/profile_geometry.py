"""Sub-profile the two-phase geometry stage on the bench scene."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry
from renderer_tpu.ops.cull import _morton2d
from renderer_tpu.ops.geometry import frustum_cull_mask, pixel_homogeneous
from renderer_tpu.ops.raster_spec import FRONT_DET_SIGN


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<46s} {ms:8.2f} ms")
    return out


def main():
    scene = sponza_like_scene(N_INSTANCES)
    camera = make_camera(0.35)
    expand_capacity = 2 * TRI_CAPACITY
    rw, rh = WIDTH, HEIGHT
    lib = scene.meshes
    inst = scene.instances
    n = inst.mesh_id.shape[0]

    def prep(scene, camera):
        model = geometry.instance_matrices(scene)
        vp, clip_mats = geometry.camera_clip_matrices(camera, model)
        visible = geometry.coarse_cull(scene, model, vp)
        lod = geometry.select_lod(scene, camera, model)
        return model, clip_mats, visible, lod

    model, clip_mats, visible, lod = jax.jit(prep)(scene, camera)

    # phase A parts
    def slot_map(visible, lod):
        tc = jnp.where(visible, lib.lod_tri_count[inst.mesh_id, lod], 0)
        ends = jnp.cumsum(tc)
        total = ends[-1]
        starts = ends - tc
        slots = jnp.arange(expand_capacity, dtype=jnp.int32)
        has = tc > 0
        dest = jnp.where(has, starts, expand_capacity)
        ids = jnp.arange(n, dtype=jnp.int32)
        mark_owner = jnp.zeros((expand_capacity,), jnp.int32).at[dest].max(ids + 1, mode="drop")
        owner = jnp.maximum(jax.lax.cummax(mark_owner) - 1, 0)
        mark_start = jnp.zeros((expand_capacity,), jnp.int32).at[dest].max(starts, mode="drop")
        local = slots - jax.lax.cummax(mark_start)
        valid = slots < total
        tri_base = lib.lod_index_offset[inst.mesh_id[owner], lod[owner]]
        tri_idx = jnp.where(valid, tri_base + local, 0)
        return owner, tri_idx, valid, total

    owner, tri_idx, valid, total = timeit("A: slot map (scatter+cummax)", slot_map, visible, lod)

    def gathers_a(owner, tri_idx):
        vidx = lib.indices[tri_idx]
        pos = lib.positions[vidx]
        m_clip = clip_mats[owner]
        return pos, m_clip

    pos, m_clip = timeit("A: index+position+matrix gathers", gathers_a, owner, tri_idx)

    def xform(pos, m_clip):
        hpos = jnp.concatenate([pos, jnp.ones(pos.shape[:-1] + (1,), pos.dtype)], -1)
        return jnp.einsum("tij,tnj->tni", m_clip, hpos, precision="highest")

    clip = timeit("A: clip transform einsum", xform, pos, m_clip)

    def cullmask(clip, valid):
        u = pixel_homogeneous(clip, 2, 2)
        m = jnp.swapaxes(u, -1, -2)
        det = (
            m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
        )
        return valid & frustum_cull_mask(clip) & (det * FRONT_DET_SIGN > 0)

    mask = timeit("A: cull masks", cullmask, clip, valid)

    def morton_keys(clip, mask):
        w = clip[..., 3]
        safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
        all_front = jnp.all(w > 1e-9, axis=-1)
        px = clip[..., 0] / safe_w
        py = clip[..., 1] / safe_w
        cx = jnp.clip((jnp.min(px, -1) + jnp.max(px, -1)) * 0.25 + 0.5, 0.0, 1.0)
        cy = jnp.clip((jnp.min(py, -1) + jnp.max(py, -1)) * -0.25 + 0.5, 0.0, 1.0)
        gx = jnp.where(all_front, (cx * 1023).astype(jnp.uint32), 0)
        gy = jnp.where(all_front, (cy * 1023).astype(jnp.uint32), 0)
        return jnp.where(mask, _morton2d(gx, gy), jnp.uint32(0xFFFFFFFF))

    key = timeit("A: morton keys", morton_keys, clip, mask)

    def argsort_only(key):
        return jnp.argsort(key, stable=True)[:TRI_CAPACITY]

    perm = timeit("A: argsort (262k u32)", argsort_only, key)

    def phase_b(perm, owner, tri_idx, clip, mask):
        owner_s = owner[perm]
        tri_idx_s = tri_idx[perm]
        clip_s = clip[perm]
        vidx_s = lib.indices[tri_idx_s]
        nrm = lib.normals[vidx_s]
        uv = lib.uvs[vidx_s]
        tan = lib.tangents[vidx_s]
        m_model = model[owner_s]
        wnrm = jnp.einsum("tij,tnj->tni", m_model[:, :3, :3], nrm, precision="highest")
        wtan_xyz = jnp.einsum("tij,tnj->tni", m_model[:, :3, :3], tan[..., :3], precision="highest")
        return owner_s, clip_s, wnrm, wtan_xyz, uv

    timeit("B: permute + attr gathers + transforms", phase_b, perm, owner, tri_idx, clip, mask)

    # candidate: packed per-triangle attribute records at scene build time
    t_lib = lib.indices.shape[0]
    tri_rec = jnp.zeros((t_lib, 128), jnp.float32)

    def wide_gather(tri_idx):
        return tri_rec[tri_idx]

    timeit("alt: ONE wide record gather @262k", wide_gather, tri_idx)

    def wide_gather_131k(perm, tri_idx):
        return tri_rec[tri_idx[perm]]

    timeit("alt: ONE wide record gather @131k", wide_gather_131k, perm, tri_idx)

    def sort_pairs(key):
        v = jnp.arange(key.shape[0], dtype=jnp.int32)
        return jax.lax.sort((key, v), num_keys=1)

    timeit("alt: lax.sort key+idx pair", sort_pairs, key)

    print("visible after cull:", int(jnp.sum(mask)))


if __name__ == "__main__":
    main()
