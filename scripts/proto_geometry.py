"""Prototype: tri-record + column-math geometry phase A/B vs current.

Tests on the bench scene:
  A) packed single-cummax slot map vs two-cummax
  B) wide tri-record gather + flat column-math clip transform vs
     per-corner gathers + (T,4,4)x(T,3,4) einsum
  C) phase B via record gather + column rotations, emitting shade records
     directly, vs separate phase B + build_shade_records
Checks numerical equality against the production path.
"""
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
from renderer_tpu.ops.geometry import frustum_cull_mask
from renderer_tpu.ops.raster_spec import FRONT_DET_SIGN

EXPAND = 2 * TRI_CAPACITY


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:<46s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")
    return out


def main():
    scene = sponza_like_scene(N_INSTANCES)
    camera = make_camera(0.35)
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

    # host-built tri record table (pos 9 | nrm 9 | uv 6 | tan 12)
    t_used = int(np.asarray(lib.tri_count))
    t_rows = 1 << int(np.ceil(np.log2(max(t_used, 256))))
    idx = np.asarray(lib.indices)[:t_rows]
    P = np.asarray(lib.positions)
    Nn = np.asarray(lib.normals)
    U = np.asarray(lib.uvs)
    Ta = np.asarray(lib.tangents)
    rec_np = np.concatenate(
        [
            P[idx].reshape(t_rows, 9),
            Nn[idx].reshape(t_rows, 9),
            U[idx].reshape(t_rows, 6),
            Ta[idx].reshape(t_rows, 12),
        ],
        axis=1,
    ).astype(np.float32)
    tri_rec = jnp.asarray(rec_np)
    print(f"tri_rec rows={t_rows} (used {t_used})")

    # ---- A: packed slot map ------------------------------------------------
    def slot_packed(visible, lod):
        tc = jnp.where(visible, lib.lod_tri_count[inst.mesh_id, lod], 0)
        ends = jnp.cumsum(tc)
        total = ends[-1]
        starts = ends - tc
        has = tc > 0
        dest = jnp.where(has, starts, EXPAND)
        ids = jnp.arange(n, dtype=jnp.uint32)
        key = (ids << 18) | starts.astype(jnp.uint32)
        mark = jnp.zeros((EXPAND,), jnp.uint32).at[dest].max(key, mode="drop")
        run = jax.lax.cummax(mark)
        owner = (run >> 18).astype(jnp.int32)
        start = (run & jnp.uint32((1 << 18) - 1)).astype(jnp.int32)
        slots = jnp.arange(EXPAND, dtype=jnp.int32)
        local = slots - start
        valid = slots < total
        tri_base = lib.lod_index_offset[inst.mesh_id[owner], lod[owner]]
        tri_idx = jnp.where(valid, tri_base + local, 0)
        return owner, tri_idx, valid, total

    owner, tri_idx, valid, total = timeit("A: slot map PACKED", slot_packed, visible, lod)

    # reference slot map for equality
    def slot_two(visible, lod):
        tc = jnp.where(visible, lib.lod_tri_count[inst.mesh_id, lod], 0)
        ends = jnp.cumsum(tc)
        total = ends[-1]
        starts = ends - tc
        slots = jnp.arange(EXPAND, dtype=jnp.int32)
        has = tc > 0
        dest = jnp.where(has, starts, EXPAND)
        ids = jnp.arange(n, dtype=jnp.int32)
        mark_owner = jnp.zeros((EXPAND,), jnp.int32).at[dest].max(ids + 1, mode="drop")
        o = jnp.maximum(jax.lax.cummax(mark_owner) - 1, 0)
        mark_start = jnp.zeros((EXPAND,), jnp.int32).at[dest].max(starts, mode="drop")
        local = slots - jax.lax.cummax(mark_start)
        valid = slots < total
        tri_base = lib.lod_index_offset[inst.mesh_id[o], lod[o]]
        tri_idx = jnp.where(valid, tri_base + local, 0)
        return o, tri_idx, valid, total

    o2, t2, v2, tot2 = timeit("A: slot map two-cummax (ref)", slot_two, visible, lod)
    tv = np.asarray(valid)
    assert (np.asarray(owner)[tv] == np.asarray(o2)[tv]).all()
    assert (np.asarray(tri_idx)[tv] == np.asarray(t2)[tv]).all()

    # ---- B: record gather + column clip ------------------------------------
    cm_flat = clip_mats.reshape(n, 16)

    def phase_a_cols(owner, tri_idx, valid):
        rec = tri_rec[tri_idx]  # (E, 36)
        mm = cm_flat[owner]     # (E, 16)
        clip_cols = []
        for c in range(3):
            x, y, z = rec[:, 3 * c], rec[:, 3 * c + 1], rec[:, 3 * c + 2]
            for i in range(4):
                clip_cols.append(
                    mm[:, 4 * i] * x + mm[:, 4 * i + 1] * y + mm[:, 4 * i + 2] * z + mm[:, 4 * i + 3]
                )
        return clip_cols  # 12 x (E,) — corner-major [c0:xyzw, c1:xyzw, c2:xyzw]

    def phase_a_full(owner, tri_idx, valid):
        cc = phase_a_cols(owner, tri_idx, valid)
        x = [cc[0], cc[4], cc[8]]
        y = [cc[1], cc[5], cc[9]]
        z = [cc[2], cc[6], cc[10]]
        w = [cc[3], cc[7], cc[11]]
        # frustum mask (columns)
        out = None
        for comp, lim in ((x, 1), (y, 1)):
            lo = (comp[0] < -w[0]) & (comp[1] < -w[1]) & (comp[2] < -w[2])
            hi = (comp[0] > w[0]) & (comp[1] > w[1]) & (comp[2] > w[2])
            bad = lo | hi
            out = bad if out is None else (out | bad)
        out = out | ((z[0] < 0) & (z[1] < 0) & (z[2] < 0))
        out = out | ((z[0] > w[0]) & (z[1] > w[1]) & (z[2] > w[2]))
        # backface determinant in pixel-homogeneous space (width=height=2)
        u0 = [(x[c] + w[c]) * 1.0 for c in range(3)]
        u1 = [(w[c] - y[c]) * 1.0 for c in range(3)]
        u2 = w
        det = (
            u0[0] * (u1[1] * u2[2] - u1[2] * u2[1])
            - u0[1] * (u1[0] * u2[2] - u1[2] * u2[0])
            + u0[2] * (u1[0] * u2[1] - u1[1] * u2[0])
        )
        mask = valid & ~out & (det * FRONT_DET_SIGN > 0)
        # morton keys
        safe = [jnp.where(jnp.abs(wc) > 1e-9, wc, 1e-9) for wc in w]
        all_front = (w[0] > 1e-9) & (w[1] > 1e-9) & (w[2] > 1e-9)
        px = [x[c] / safe[c] for c in range(3)]
        py = [y[c] / safe[c] for c in range(3)]
        pxmin = jnp.minimum(jnp.minimum(px[0], px[1]), px[2])
        pxmax = jnp.maximum(jnp.maximum(px[0], px[1]), px[2])
        pymin = jnp.minimum(jnp.minimum(py[0], py[1]), py[2])
        pymax = jnp.maximum(jnp.maximum(py[0], py[1]), py[2])
        cx = jnp.clip((pxmin + pxmax) * 0.25 + 0.5, 0.0, 1.0)
        cy = jnp.clip((pymin + pymax) * -0.25 + 0.5, 0.0, 1.0)
        gx = jnp.where(all_front, (cx * 1023).astype(jnp.uint32), 0)
        gy = jnp.where(all_front, (cy * 1023).astype(jnp.uint32), 0)
        key = jnp.where(mask, _morton2d(gx, gy), jnp.uint32(0xFFFFFFFF))
        perm = jnp.argsort(key, stable=True)[:TRI_CAPACITY]
        clip = jnp.stack(cc, axis=-1)  # (E, 12) corner-major
        return perm, clip, mask

    perm, clip_flat, maskA = timeit("B: colmath phaseA (gather+clip+cull+sort)",
                                    phase_a_full, owner, tri_idx, valid)

    # reference phase A
    def phase_a_ref(owner, tri_idx, valid):
        vidx = lib.indices[tri_idx]
        pos = lib.positions[vidx]
        m_clip = clip_mats[owner]
        hpos = jnp.concatenate([pos, jnp.ones(pos.shape[:-1] + (1,), pos.dtype)], -1)
        clip = jnp.einsum("tij,tnj->tni", m_clip, hpos, precision="highest")
        u = geometry.pixel_homogeneous(clip, 2, 2)
        m = jnp.swapaxes(u, -1, -2)
        det = (
            m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0])
        )
        mask = valid & frustum_cull_mask(clip) & (det * FRONT_DET_SIGN > 0)
        return clip, mask

    clip_ref, mask_ref = timeit("B: einsum phaseA ref (no sort)", phase_a_ref,
                                owner, tri_idx, valid)
    # equality (mask identical; clip close)
    mr = np.asarray(mask_ref)
    assert (np.asarray(maskA) == mr).all(), "cull masks differ"
    cf = np.asarray(clip_flat).reshape(-1, 3, 4)
    cr = np.asarray(clip_ref)
    err = np.abs(cf[mr] - cr[mr]).max()
    print("clip max err:", err)

    # ---- C: phase B + records ----------------------------------------------
    mats = scene.materials
    mat_rec = jnp.concatenate(
        [
            mats.base_color_factor,
            mats.metallic[:, None],
            mats.roughness[:, None],
            mats.emissive,
            mats.base_color_tex[:, None].astype(jnp.float32),
            mats.normal_tex[:, None].astype(jnp.float32),
        ],
        axis=1,
    )  # (K, 11)
    model_flat = model.reshape(n, 16)

    def phase_b_cols(perm, owner, tri_idx, clip_flat):
        owner_s = owner[perm]
        tri_s = tri_idx[perm]
        rec = tri_rec[tri_s]            # (T, 36)
        mm = model_flat[owner_s]        # (T, 16)
        mat = mat_rec[inst.material_id[owner_s]]  # (T, 11)
        clip_s = clip_flat[perm]        # (T, 12)

        def rot(base):  # rotate 3 corner vectors at rec[:, base:base+9]
            out = []
            for c in range(3):
                vx, vy, vz = rec[:, base + 3 * c], rec[:, base + 3 * c + 1], rec[:, base + 3 * c + 2]
                for i in range(3):
                    out.append(mm[:, 4 * i] * vx + mm[:, 4 * i + 1] * vy + mm[:, 4 * i + 2] * vz)
            return out  # 9 cols

        wnrm = rot(9)
        tan_cols = []
        for c in range(3):
            b = 24 + 4 * c
            vx, vy, vz = rec[:, b], rec[:, b + 1], rec[:, b + 2]
            for i in range(3):
                tan_cols.append(mm[:, 4 * i] * vx + mm[:, 4 * i + 1] * vy + mm[:, 4 * i + 2] * vz)
            tan_cols.append(rec[:, b + 3])
        uv_cols = [rec[:, 18 + k] for k in range(6)]
        # shade record: normals 9 | uv 6 | tangents 12 | texlod 1 | instance 1 | mat 11
        t_cap = perm.shape[0]
        cols = (
            wnrm + uv_cols + tan_cols
            + [jnp.zeros((t_cap,), jnp.float32), owner_s.astype(jnp.float32)]
            + [mat[:, k] for k in range(11)]
        )
        srec = jnp.stack(cols, axis=-1)
        pad = 128 - srec.shape[-1]
        srec = jnp.concatenate([srec, jnp.zeros((t_cap, pad), jnp.float32)], -1)
        return srec, clip_s, owner_s, tri_s

    timeit("C: colmath phaseB + shade records", phase_b_cols, perm, owner, tri_idx, clip_flat)

    def phase_b_ref(perm, owner, tri_idx, clip_ref):
        owner_s = owner[perm]
        tri_idx_s = tri_idx[perm]
        clip_s = clip_ref[perm]
        vidx_s = lib.indices[tri_idx_s]
        nrm = lib.normals[vidx_s]
        uv = lib.uvs[vidx_s]
        tan = lib.tangents[vidx_s]
        m_model = model[owner_s]
        wnrm = jnp.einsum("tij,tnj->tni", m_model[:, :3, :3], nrm, precision="highest")
        wtan_xyz = jnp.einsum("tij,tnj->tni", m_model[:, :3, :3], tan[..., :3], precision="highest")
        return owner_s, clip_s, wnrm, wtan_xyz, uv

    timeit("C: einsum phaseB ref (records separate)", phase_b_ref, perm, owner, tri_idx, clip_ref)


if __name__ == "__main__":
    main()
