"""Cumulative-prefix bisect of build_draw_stream.

Each step jits a PREFIX of the fused fast path reduced to a few scalars, so
jit-boundary materialization costs cancel in consecutive differences. The
round-3 question: where do geometry's ~28 ms go if gathers are ~1.6 ms and
VPU math is free?
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
from renderer_tpu.ops.geometry import _clip_cols, _slot_map
from renderer_tpu.ops.raster_spec import FRONT_DET_SIGN
from renderer_tpu.scene.types import TR_NRM, TR_TAN, TR_UV


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<46s} {ms:8.2f} ms", flush=True)
    return ms


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
    model, vp, clip_mats, visible, lod = (np.asarray(x) for x in prepared[:5])
    model = jnp.asarray(model)
    clip_mats = jnp.asarray(clip_mats)
    visible = jnp.asarray(visible)
    lod = jnp.asarray(lod)

    def upto(stage):
        def f(visible, lod, clip_mats, model):
            acc = jnp.float32(0)
            owner, tri_idx, valid, _ = _slot_map(scene, visible, lod, E)
            if stage == 0:
                return acc + jnp.sum(owner) + jnp.sum(tri_idx) + jnp.sum(valid)
            rec = lib.tri_rec[tri_idx]
            if stage == 1:
                return jnp.sum(rec) + jnp.sum(owner)
            mm = clip_mats.reshape(n, 16)[owner]
            cc = _clip_cols(rec, mm)
            if stage == 2:
                return sum(jnp.sum(c) for c in cc)
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
            if stage == 3:
                return jnp.sum(key) + jnp.sum(mask)
            perm = jnp.argsort(key, stable=True)[:T]
            count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), T)
            if stage == 4:
                return jnp.sum(perm) + count
            owner_s = owner[perm]
            tri_s = tri_idx[perm]
            rec_s = lib.tri_rec[tri_s]
            if stage == 5:
                return jnp.sum(rec_s) + jnp.sum(owner_s)
            ccs = _clip_cols(rec_s, clip_mats.reshape(n, 16)[owner_s])
            mt_s = model.reshape(n, 16)[owner_s].T
            if stage == 6:
                return sum(jnp.sum(c) for c in ccs) + jnp.sum(mt_s)
            rt_s = rec_s.T

            def rot3(base, stride):
                cols = []
                for c in range(3):
                    vx = rt_s[base + stride * c]
                    vy = rt_s[base + stride * c + 1]
                    vz = rt_s[base + stride * c + 2]
                    for i in range(3):
                        cols.append(mt_s[4 * i] * vx + mt_s[4 * i + 1] * vy
                                    + mt_s[4 * i + 2] * vz)
                return cols

            wnrm = rot3(TR_NRM, 3)
            wtan = rot3(TR_TAN, 4)
            uv_cols = [rt_s[TR_UV + k] for k in range(6)]
            tan_cols = []
            for c in range(3):
                tan_cols += wtan[3 * c: 3 * c + 3] + [rt_s[TR_TAN + 4 * c + 3]]
            sw = [jnp.where(jnp.abs(ccs[4 * c + 3]) > 1e-9, ccs[4 * c + 3], 1e-9)
                  for c in range(3)]
            ok_w = (ccs[3] > 1e-9) & (ccs[7] > 1e-9) & (ccs[11] > 1e-9)
            spx = [(ccs[4 * c] / sw[c] + 1.0) * (0.5 * rw) for c in range(3)]
            spy = [(1.0 - ccs[4 * c + 1] / sw[c]) * (0.5 * rh) for c in range(3)]
            a_px = jnp.abs((spx[1] - spx[0]) * (spy[2] - spy[0])
                           - (spx[2] - spx[0]) * (spy[1] - spy[0]))
            atlas_size = scene.atlas.level_size[0]
            su = [uv_cols[2 * c] * atlas_size for c in range(3)]
            sv = [uv_cols[2 * c + 1] * atlas_size for c in range(3)]
            a_uv = jnp.abs((su[1] - su[0]) * (sv[2] - sv[0])
                           - (su[2] - su[0]) * (sv[1] - sv[0]))
            tex_lod = 0.5 * jnp.log2(jnp.maximum(a_uv / jnp.maximum(a_px, 1e-12), 1e-12))
            tex_lod = jnp.where(ok_w, jnp.maximum(tex_lod, 0.0), 0.0)
            mats = scene.materials
            mat_rec = jnp.concatenate(
                [mats.base_color_factor, mats.metallic[:, None],
                 mats.roughness[:, None], mats.emissive,
                 mats.base_color_tex[:, None].astype(jnp.float32),
                 mats.normal_tex[:, None].astype(jnp.float32)], axis=1)
            inst_mat = mat_rec[inst.material_id]
            mat = inst_mat[owner_s]
            hw, hh = 0.5 * rw, 0.5 * rh
            uvec = [((ccs[4 * c] + ccs[4 * c + 3]) * hw,
                     (ccs[4 * c + 3] - ccs[4 * c + 1]) * hh,
                     ccs[4 * c + 3]) for c in range(3)]

            def cross_cols(a, b):
                return [a[1] * b[2] - a[2] * b[1], a[2] * b[0] - a[0] * b[2],
                        a[0] * b[1] - a[1] * b[0]]

            edge_cols = (cross_cols(uvec[1], uvec[2]) + cross_cols(uvec[2], uvec[0])
                         + cross_cols(uvec[0], uvec[1]))
            cols = (wnrm + uv_cols + tan_cols
                    + [tex_lod, owner_s.astype(jnp.float32)]
                    + [mat[:, k] for k in range(11)] + edge_cols)
            if stage == 7:
                return sum(jnp.sum(c) for c in cols)
            srec = jnp.stack(cols, axis=-1)
            shade_rec = jnp.concatenate(
                [srec, jnp.zeros((T, 128 - srec.shape[-1]), jnp.float32)], axis=-1)
            clip = jnp.stack(ccs, axis=-1).reshape(T, 3, 4)
            if stage == 8:  # materialize both real outputs
                return shade_rec, clip
            raise ValueError(stage)

        return f

    names = [
        "c0 slot_map",
        "c1 +rec gather @E",
        "c2 +mm gather + clip cols",
        "c3 +cull mask + morton key",
        "c4 +argsort",
        "c5 +survivor owner/rec gathers",
        "c6 +survivor clipcols + model gather",
        "c7 +phase-B column math",
        "c8 +stack/materialize outputs",
    ]
    want = [int(a) for a in sys.argv[1:]] or list(range(len(names)))
    for s, nm in enumerate(names):
        if s in want:
            timeit(nm, upto(s), visible, lod, clip_mats, model)

    def full(visible, lod, clip_mats, model):
        soup, recf = geometry.build_draw_stream(
            scene, visible, lod, clip_mats, model, E, T, rw, rh)
        return soup.clip, soup.valid, recf

    timeit("FULL build_draw_stream", full, visible, lod, clip_mats, model)


if __name__ == "__main__":
    main()
