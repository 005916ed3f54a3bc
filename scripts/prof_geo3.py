"""Bisect build_draw_stream (the fused fast path) by timing prefixes."""
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
from renderer_tpu.ops.geometry import SR_COLS, _clip_cols, _slot_map
from renderer_tpu.ops.raster_spec import FRONT_DET_SIGN
from renderer_tpu.scene.types import TR_NRM, TR_TAN, TR_UV


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<52s} {ms:8.2f} ms", flush=True)
    return out


def main():
    scene = sponza_like_scene(N_INSTANCES)
    camera = make_camera(0.35)
    E = 2 * TRI_CAPACITY
    T = TRI_CAPACITY
    rw, rh = WIDTH, HEIGHT
    lib = scene.meshes
    inst = scene.instances
    n = inst.mesh_id.shape[0]

    prepared = jax.jit(geometry.prepare_frame_columns)(scene, camera)
    model, vp, clip_mats, visible, lod = prepared[:5]

    def p0_slotmap(visible, lod):
        owner, tri_idx, valid, _ = _slot_map(scene, visible, lod, E)
        return owner, tri_idx, valid

    owner, tri_idx, valid = timeit("p0: slot map", p0_slotmap, visible, lod)

    def p1_gather(tri_idx, owner):
        rec = lib.tri_rec[tri_idx]
        mm = clip_mats.reshape(n, 16)[owner]
        return rec, mm

    rec, mm = timeit("p1: rec+matrix gathers @262k", p1_gather, tri_idx, owner)

    def p2_clipcols(rec, mm):
        return _clip_cols(rec, mm)

    cc = timeit("p2: clip cols (36 FMA cols @262k)", p2_clipcols, rec, mm)

    def p3_mask_key(cc, valid):
        x = [cc[0], cc[4], cc[8]]
        y = [cc[1], cc[5], cc[9]]
        z = [cc[2], cc[6], cc[10]]
        w = [cc[3], cc[7], cc[11]]
        out = (x[0] < -w[0]) & (x[1] < -w[1]) & (x[2] < -w[2])
        out |= (x[0] > w[0]) & (x[1] > w[1]) & (x[2] > w[2])
        out |= (y[0] < -w[0]) & (y[1] < -w[1]) & (y[2] < -w[2])
        out |= (y[0] > w[0]) & (y[1] > w[1]) & (y[2] > w[2])
        out |= (z[0] < 0) & (z[1] < 0) & (z[2] < 0)
        out |= (z[0] > w[0]) & (z[1] > w[1]) & (z[2] > w[2])
        u0 = [x[c] + w[c] for c in range(3)]
        u1 = [w[c] - y[c] for c in range(3)]
        u2 = w
        det = (
            u0[0] * (u1[1] * u2[2] - u1[2] * u2[1])
            - u0[1] * (u1[0] * u2[2] - u1[2] * u2[0])
            + u0[2] * (u1[0] * u2[1] - u1[1] * u2[0])
        )
        mask = valid & ~out & (det * FRONT_DET_SIGN > 0)
        safe = [jnp.where(jnp.abs(wc) > 1e-9, wc, 1e-9) for wc in w]
        all_front = (w[0] > 1e-9) & (w[1] > 1e-9) & (w[2] > 1e-9)
        px = [x[c] / safe[c] for c in range(3)]
        py = [y[c] / safe[c] for c in range(3)]
        cx = jnp.clip(
            (jnp.minimum(jnp.minimum(px[0], px[1]), px[2])
             + jnp.maximum(jnp.maximum(px[0], px[1]), px[2])) * 0.25 + 0.5,
            0.0, 1.0)
        cy = jnp.clip(
            (jnp.minimum(jnp.minimum(py[0], py[1]), py[2])
             + jnp.maximum(jnp.maximum(py[0], py[1]), py[2])) * -0.25 + 0.5,
            0.0, 1.0)
        gx = jnp.where(all_front, (cx * 1023).astype(jnp.uint32), 0)
        gy = jnp.where(all_front, (cy * 1023).astype(jnp.uint32), 0)
        key = jnp.where(mask, _morton2d(gx, gy), jnp.uint32(0xFFFFFFFF))
        return mask, key

    mask, key = timeit("p3: cull mask + morton key", p3_mask_key, cc, valid)

    def p4_sort(key, mask):
        perm = jnp.argsort(key, stable=True)[:T]
        count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), T).astype(jnp.int32)
        return perm, count

    perm, count = timeit("p4: argsort + count", p4_sort, key, mask)

    def p5_permgather(perm, owner, tri_idx):
        owner_s = owner[perm]
        tri_s = tri_idx[perm]
        rec_s = lib.tri_rec[tri_s]
        mm_s = clip_mats.reshape(n, 16)[owner_s]
        mt_s = model.reshape(n, 16)[owner_s]
        return owner_s, tri_s, rec_s, mm_s, mt_s

    owner_s, tri_s, rec_s, mm_s, mt_s = timeit(
        "p5: survivor gathers @131k", p5_permgather, perm, owner, tri_idx)

    def p6_colsB(rec_s, mm_s, mt_s, owner_s):
        ccs = _clip_cols(rec_s, mm_s)
        rt_s = rec_s.T
        mt = mt_s.T

        def rot3(base, stride):
            cols = []
            for c in range(3):
                vx = rt_s[base + stride * c]
                vy = rt_s[base + stride * c + 1]
                vz = rt_s[base + stride * c + 2]
                for i in range(3):
                    cols.append(mt[4 * i] * vx + mt[4 * i + 1] * vy + mt[4 * i + 2] * vz)
            return cols

        wnrm = rot3(TR_NRM, 3)
        wtan = rot3(TR_TAN, 4)
        uv_cols = [rt_s[TR_UV + k] for k in range(6)]
        tan_cols = []
        for c in range(3):
            tan_cols += wtan[3 * c: 3 * c + 3] + [rt_s[TR_TAN + 4 * c + 3]]
        sw = [jnp.where(jnp.abs(ccs[4 * c + 3]) > 1e-9, ccs[4 * c + 3], 1e-9) for c in range(3)]
        ok_w = (ccs[3] > 1e-9) & (ccs[7] > 1e-9) & (ccs[11] > 1e-9)
        spx = [(ccs[4 * c] / sw[c] + 1.0) * (0.5 * rw) for c in range(3)]
        spy = [(1.0 - ccs[4 * c + 1] / sw[c]) * (0.5 * rh) for c in range(3)]
        a_px = jnp.abs((spx[1] - spx[0]) * (spy[2] - spy[0]) - (spx[2] - spx[0]) * (spy[1] - spy[0]))
        atlas_size = scene.atlas.level_size[0]
        su = [uv_cols[2 * c] * atlas_size for c in range(3)]
        sv = [uv_cols[2 * c + 1] * atlas_size for c in range(3)]
        a_uv = jnp.abs((su[1] - su[0]) * (sv[2] - sv[0]) - (su[2] - su[0]) * (sv[1] - sv[0]))
        tex_lod = 0.5 * jnp.log2(jnp.maximum(a_uv / jnp.maximum(a_px, 1e-12), 1e-12))
        tex_lod = jnp.where(ok_w, jnp.maximum(tex_lod, 0.0), 0.0)
        mats = scene.materials
        mat_rec = jnp.concatenate(
            [mats.base_color_factor, mats.metallic[:, None], mats.roughness[:, None],
             mats.emissive, mats.base_color_tex[:, None].astype(jnp.float32),
             mats.normal_tex[:, None].astype(jnp.float32)], axis=1)
        inst_mat = mat_rec[inst.material_id]
        mat = inst_mat[owner_s]
        hw, hh = 0.5 * rw, 0.5 * rh
        uvec = [((ccs[4 * c] + ccs[4 * c + 3]) * hw,
                 (ccs[4 * c + 3] - ccs[4 * c + 1]) * hh,
                 ccs[4 * c + 3]) for c in range(3)]

        def cross_cols(a, b):
            return [a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2], a[0] * b[1] - a[1] * b[0]]

        edge_cols = (cross_cols(uvec[1], uvec[2]) + cross_cols(uvec[2], uvec[0])
                     + cross_cols(uvec[0], uvec[1]))
        cols = (wnrm + uv_cols + tan_cols + [tex_lod, owner_s.astype(jnp.float32)]
                + [mat[:, k] for k in range(11)] + edge_cols)
        srec = jnp.stack(cols, axis=-1)
        shade_rec = jnp.concatenate(
            [srec, jnp.zeros((T, SR_COLS - srec.shape[-1]), jnp.float32)], axis=-1)
        clip = jnp.stack(ccs, axis=-1).reshape(T, 3, 4)
        return shade_rec, clip

    timeit("p6: phase-B columns + stacks @131k", p6_colsB, rec_s, mm_s, mt_s, owner_s)

    def full(visible, lod):
        soup, recf = geometry.build_draw_stream(
            scene, visible, lod, clip_mats, model, E, T, rw, rh)
        return soup.clip, soup.valid, recf

    timeit("FULL build_draw_stream", full, visible, lod)

    def prep(scene, camera):
        return geometry.prepare_frame_columns(scene, camera)

    timeit("prepare_frame_columns", prep, scene, camera)


if __name__ == "__main__":
    main()
