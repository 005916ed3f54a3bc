"""Quarter-rate VRS tier feasibility (round-5 perf lever #1).

Shading at 1/4 rate (the (even x, even y) lattice) would halve the
checkerboard tier's two index-rate-bound 2M-index gathers AGAIN — the only
remaining big shade lever (PERF.md round-3 close). The question is quality:
can reconstruction + a sparse exact re-shade of K suspects hold the 40 dB
display-clamped gate on the normal-mapped bench frame?

Reconstruction model (simulated here in numpy on a real TPU bench frame):
- H pixels (odd x, even y): left/right shaded neighbors (distance 1)
- V pixels (even x, odd y): up/down shaded neighbors
- D pixels (odd x, odd y): 4 diagonal shaded neighbors (trimmed mean)
All same-triangle masked; covered-neighbor mean fallback; background else.
Suspect score = same-triangle neighbor color spread (the cb fix's ranking).

Run alone on the TPU (PERF.md measurement hygiene). NM=1 enables normal
maps (the bench config).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from bench import HEIGHT, N_INSTANCES, TRI_CAPACITY, WIDTH, make_camera
from renderer_tpu.models import sponza_like_scene
from renderer_tpu.ops import geometry
from renderer_tpu.ops.pbr import shade_pbr
from renderer_tpu.ops.raster_pallas import rasterize_pallas
from renderer_tpu.ops.raster_spec import NO_TRIANGLE
from renderer_tpu.utils.compile_cache import enable_persistent_cache


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main():
    enable_persistent_cache()
    scene = sponza_like_scene(N_INSTANCES)
    cam = make_camera(float(os.environ.get("ANGLE", "0.35")))
    E, T = 2 * TRI_CAPACITY, TRI_CAPACITY

    import functools

    @functools.partial(jax.jit)
    def frame(scene, cam):
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
            enable_normal_maps=os.environ.get("NM", "1") == "1",
            trilinear=False,
            bary_from_records=True,
        )
        return img, vis.tri_id

    full, tri_id = jax.block_until_ready(frame(scene, cam))
    full = np.clip(np.asarray(full), 0, 1)
    tri = np.asarray(tri_id)
    H, W = tri.shape
    H2, W2 = H // 2, W // 2

    # shaded lattice (even x, even y); the exact path is bit-exact there
    tri_s = tri[0::2, 0::2]
    col_s = full[0::2, 0::2]
    cov_s = tri_s != NO_TRIANGLE

    def sh_r(a):  # lattice j+1 (right shaded neighbor)
        return np.concatenate([a[:, 1:], a[:, -1:]], axis=1)

    def sh_d(a):  # lattice i+1 (down shaded neighbor)
        return np.concatenate([a[1:], a[-1:]], axis=0)

    classes = {}
    # H pixels at (2j+1, 2i): neighbors lattice (i, j), (i, j+1)
    classes["H"] = dict(
        tri=tri[0::2, 1::2], truth=full[0::2, 1::2],
        nbs=[(tri_s, col_s, cov_s), (sh_r(tri_s), sh_r(col_s), sh_r(cov_s))],
    )
    # V pixels at (2j, 2i+1): neighbors lattice (i, j), (i+1, j)
    classes["V"] = dict(
        tri=tri[1::2, 0::2], truth=full[1::2, 0::2],
        nbs=[(tri_s, col_s, cov_s), (sh_d(tri_s), sh_d(col_s), sh_d(cov_s))],
    )
    # D pixels at (2j+1, 2i+1): 4 diagonals
    classes["D"] = dict(
        tri=tri[1::2, 1::2], truth=full[1::2, 1::2],
        nbs=[
            (tri_s, col_s, cov_s),
            (sh_r(tri_s), sh_r(col_s), sh_r(cov_s)),
            (sh_d(tri_s), sh_d(col_s), sh_d(cov_s)),
            (sh_d(sh_r(tri_s)), sh_d(sh_r(col_s)), sh_d(sh_r(cov_s))),
        ],
    )

    bg = full[0, 0]  # background color (corner is uncovered at the bench)
    recon_full = full.copy()
    spread_all, err_all, truth_all, cov_all = {}, {}, {}, {}
    for name, c in classes.items():
        tri_u = c["tri"]
        cov_u = tri_u != NO_TRIANGLE
        num = np.zeros(col_s.shape, np.float32)
        den = np.zeros(tri_u.shape, np.int32)
        numc = np.zeros(col_s.shape, np.float32)
        denc = np.zeros(tri_u.shape, np.int32)
        nb_min = np.full(col_s.shape, np.inf, np.float32)
        nb_max = np.full(col_s.shape, -np.inf, np.float32)
        for nt, nc, ncov in c["nbs"]:
            same = (nt == tri_u) & ncov
            num += np.where(same[..., None], nc, 0.0)
            den += same
            numc += np.where(ncov[..., None], nc, 0.0)
            denc += ncov
            nb_min = np.where(same[..., None], np.minimum(nb_min, nc), nb_min)
            nb_max = np.where(same[..., None], np.maximum(nb_max, nc), nb_max)
        mean = num / np.maximum(den, 1)[..., None]
        if len(c["nbs"]) == 4:  # trimmed mean when all 4 agree (D class)
            trimmed = (num - nb_min - nb_max) * 0.5
            mean = np.where((den == 4)[..., None], trimmed, mean)
        fallback = np.where(
            (denc > 0)[..., None], numc / np.maximum(denc, 1)[..., None], bg
        )
        recon = np.where((den > 0)[..., None], mean, fallback)
        recon = np.where(cov_u[..., None], recon, bg)
        err = np.where(cov_u, np.abs(recon - c["truth"]).max(axis=-1), 0.0)
        spread = np.where(den > 0, (nb_max - nb_min).sum(axis=-1), np.inf)
        spread = np.where(cov_u, np.where(den == 0, 1e9, spread), -1.0)
        spread_all[name] = spread
        err_all[name] = err
        truth_all[name] = c["truth"]
        cov_all[name] = cov_u
        # place into the full frame
        if name == "H":
            recon_full[0::2, 1::2] = recon
        elif name == "V":
            recon_full[1::2, 0::2] = recon
        else:
            recon_full[1::2, 1::2] = recon
        print(f"class {name}: covered {cov_u.sum():8d}  "
              f"err p50={np.percentile(err[cov_u],50):.4f} "
              f"p99={np.percentile(err[cov_u],99):.4f} "
              f">0.1: {(err[cov_u]>0.1).sum():6d}")

    base = psnr(recon_full, full)
    print(f"\nquarter-rate baseline clamped PSNR: {base:.2f} dB "
          f"(cb baseline was ~36.4 dB)")

    # sparse-fix curves: rank ALL reconstructed pixels by spread, fix top K
    spread_flat = np.concatenate([spread_all[k].ravel() for k in "HVD"])
    err_flat = np.concatenate([err_all[k].ravel() for k in "HVD"])
    n_per = H2 * W2

    def apply_fix(pick):
        fixed = recon_full.copy()
        for ci, name in enumerate("HVD"):
            sel = pick[(pick >= ci * n_per) & (pick < (ci + 1) * n_per)] - ci * n_per
            ii, jj = sel // W2, sel % W2
            if name == "H":
                fixed[2 * ii, 2 * jj + 1] = truth_all[name][ii, jj]
            elif name == "V":
                fixed[2 * ii + 1, 2 * jj] = truth_all[name][ii, jj]
            else:
                fixed[2 * ii + 1, 2 * jj + 1] = truth_all[name][ii, jj]
        return fixed

    order = np.argsort(-spread_flat)
    for K in (65536, 131072, 262144, 393216):
        pick = order[:K]
        pick = pick[spread_flat[pick] > 0]
        print(f"  spread fix K={K:6d} ({K/(H*W):.3f} of frame): "
              f"{psnr(apply_fix(pick), full):.2f} dB")

    order = np.argsort(-err_flat)
    for K in (65536, 131072, 262144, 393216):
        print(f"  oracle fix K={K:6d}: "
              f"{psnr(apply_fix(order[:K]), full):.2f} dB")


if __name__ == "__main__":
    main()
