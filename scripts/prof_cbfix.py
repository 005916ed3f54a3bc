"""Checkerboard edge-fix feasibility: which reconstructed pixels are wrong,
can a sparse exact re-shade of K of them reach the 40 dB display-clamped
PSNR gate, and which selection predicate finds them?

Simulates the fix on host: renders full-rate + checkerboard at the bench
frame, recomputes the reconstruction's neighbor stats (den, same-tri color
spread) in numpy, and reports the PSNR after replacing the top-K suspects
(by each candidate score) with their exact full-rate values.

Run alone on the TPU (PERF.md measurement hygiene).
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
from renderer_tpu.ops.raster_pallas import rasterize_pallas
from renderer_tpu.ops.pbr import shade_pbr
from renderer_tpu.ops.raster_spec import NO_TRIANGLE
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    cam = make_camera(0.35)
    E, T = 2 * TRI_CAPACITY, TRI_CAPACITY

    import functools

    @functools.partial(jax.jit, static_argnames=("cb",))
    def frame(scene, cam, cb):
        prepared = geometry.prepare_frame_columns(scene, cam)
        model, vp, clip_mats, visible, lod = prepared[:5]
        soup, rec = geometry.build_draw_stream(
            scene, visible, lod, clip_mats, model, E, T, WIDTH, HEIGHT
        )
        vis = rasterize_pallas(
            soup.clip, soup.valid, WIDTH, HEIGHT, with_bary=False
        )
        img = shade_pbr(
            vis, rec, scene, cam.position, viewproj_inv=prepared[7],
            enable_textures=True,
            enable_normal_maps=os.environ.get("NM", "0") == "1",
            trilinear=False,
            bary_from_records=True, checkerboard=cb, shade_fix=False,
        )
        return img, vis.tri_id

    full, tri_id = jax.block_until_ready(frame(scene, cam, False))
    cb, _ = jax.block_until_ready(frame(scene, cam, True))
    full = np.clip(np.asarray(full), 0, 1)
    cb = np.clip(np.asarray(cb), 0, 1)
    tri = np.asarray(tri_id)

    H, W = tri.shape
    y = np.arange(H)[:, None]
    rowpar = (y & 1).astype(np.int32)  # y0 = 0
    # packed shaded lattice (x+y even) and complement
    tri_s = np.where(rowpar == 0, tri[:, 0::2], tri[:, 1::2])
    tri_u = np.where(rowpar == 0, tri[:, 1::2], tri[:, 0::2])
    # shaded-lattice colors from the FULL image (cb's shaded lattice is
    # bit-exact vs full, so this is the same data)
    col_s = np.where((rowpar == 0)[..., None], full[:, 0::2], full[:, 1::2])
    cov_s = tri_s != NO_TRIANGLE
    cov_u = tri_u != NO_TRIANGLE

    def up(a):
        return np.concatenate([a[:1], a[:-1]], axis=0)

    def dn(a):
        return np.concatenate([a[1:], a[-1:]], axis=0)

    def left(a):
        jm1 = np.concatenate([a[:, :1], a[:, :-1]], axis=1)
        return np.where((rowpar == 0) if a.ndim == 2 else (rowpar == 0)[..., None], a, jm1)

    def right(a):
        jp1 = np.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        return np.where((rowpar == 0) if a.ndim == 2 else (rowpar == 0)[..., None], jp1, a)

    den = np.zeros(tri_u.shape, np.int32)
    nb_min = np.full(col_s.shape, np.inf)
    nb_max = np.full(col_s.shape, -np.inf)
    for sh in (up, dn, left, right):
        same = (sh(tri_s) == tri_u) & sh(cov_s)
        den += same
        nb_c = sh(col_s)
        nb_min = np.where(same[..., None], np.minimum(nb_min, nb_c), nb_min)
        nb_max = np.where(same[..., None], np.maximum(nb_max, nb_c), nb_max)

    # reconstructed-pixel error (complement lattice)
    cb_u = np.where((rowpar == 0)[..., None], cb[:, 1::2], cb[:, 0::2])
    full_u = np.where((rowpar == 0)[..., None], full[:, 1::2], full[:, 0::2])
    err = np.abs(cb_u - full_u).max(axis=-1)
    err = np.where(cov_u, err, 0.0)

    if os.environ.get("DUMP", "") == "1":
        from renderer_tpu.utils.image import write_png

        heat = np.clip(err / 0.2, 0, 1)
        write_png("/tmp/cb_err_heat.png", np.stack([heat, heat * 0, 1 - heat], -1))
        write_png("/tmp/cb_full.png", full)
        write_png("/tmp/cb_recon.png", cb)
        # error vs local luma-gradient class: is it specular or diffuse?
        lum = full_u.mean(axis=-1)
        print("err>0.05 pixel stats: luma p50/p90:",
              np.percentile(lum[err > 0.05], [50, 90]))
        print("all covered luma p50/p90:", np.percentile(lum[cov_u], [50, 90]))
    print(f"lattice pixels: {tri_u.size}, covered: {cov_u.sum()}")
    for d in range(5):
        m = cov_u & (den == d)
        if m.sum() == 0:
            continue
        e = err[m]
        print(
            f"den={d}: n={m.sum():8d}  err p50={np.percentile(e,50):.4f} "
            f"p99={np.percentile(e,99):.4f} max={e.max():.4f} "
            f">0.05: {(e>0.05).sum():7d}  >0.1: {(e>0.1).sum():6d}"
        )

    spread = np.where(den > 0, (nb_max - nb_min).sum(axis=-1), np.inf)
    spread = np.where(cov_u, np.where(den == 0, 1e9, spread), -1.0)

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    base = psnr(cb, full)
    print(f"\nbaseline clamped PSNR: {base:.2f} dB")

    scores = {
        "edge(den<4), any spread": np.where(den < 4, spread + 1.0, -1.0),
        "spread (all den)": spread,
    }
    for name, sc in scores.items():
        order = np.argsort(-sc.ravel())
        for K in (32768, 65536, 131072, 262144):
            fixed = cb_u.reshape(-1, 3).copy()
            pick = order[:K]
            pick = pick[sc.ravel()[pick] > 0]
            fixed[pick] = full_u.reshape(-1, 3)[pick]
            # rebuild the full image with fixed complement
            cbf = cb.copy()
            fx = fixed.reshape(cb_u.shape)
            # complement x = 2j + (1 - rowpar)
            for par in (0, 1):
                rows = np.nonzero((rowpar[:, 0] == par))[0]
                cbf[rows[:, None], (2 * np.arange(W // 2) + (1 - par))[None, :]] = fx[rows]
            print(f"  {name:<26s} K={K:6d}: {psnr(cbf, full):.2f} dB")

    # oracle: fix the K largest-error pixels (upper bound for any predicate)
    order = np.argsort(-err.ravel())
    for K in (32768, 65536, 131072, 262144):
        cbf = cb.copy()
        fixed = cb_u.reshape(-1, 3).copy()
        fixed[order[:K]] = full_u.reshape(-1, 3)[order[:K]]
        fx = fixed.reshape(cb_u.shape)
        for par in (0, 1):
            rows = np.nonzero((rowpar[:, 0] == par))[0]
            cbf[rows[:, None], (2 * np.arange(W // 2) + (1 - par))[None, :]] = fx[rows]
        print(f"  oracle                     K={K:6d}: {psnr(cbf, full):.2f} dB")


if __name__ == "__main__":
    main()
