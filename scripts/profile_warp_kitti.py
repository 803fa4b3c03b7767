"""Stage-decompose the KITTI-shape (384x1248) 20-warp two-pass stack.

Round-3 VERDICT weak #4: at this geometry the warp stack costs ~41 ms
vs ~40 ms of forward, and the fused both-passes-one-kernel design was
dismissed only at 240x320 geometry.  Before building that kernel, this
probe answers WHERE the 41 ms actually goes:

  grids   - homography sampling + the rows/cols coordinate algebra
            (XLA: divides over [S, S] grids, 2 per pass)
  pass1   - the vertical Pallas resample alone
  +trans  - pass1 + the two transposes wrapping pass2
  full    - the complete inv_warp_image_twopass (pad, both passes,
            rot90, crop)

Match: workload of /root/reference/configs/magicpoint_kitti_export.yaml
(384x1248, num_h 20).

Usage:  python scripts/profile_warp_kitti.py [--shape 384 1248] [--num 20]
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import time

import jax
import jax.numpy as jnp

from ssp.core.homography import inv3, sample_homographies
from ssp.kernels import warp_twopass as wt


def timed(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=(384, 1248))
    ap.add_argument("--num", type=int, default=20)
    args = ap.parse_args()
    H, W = args.shape
    N = args.num

    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32)
    Hs = sample_homographies(key, N, shift=-1.0)
    Hs_i = inv3(Hs)

    S = max(H, W)
    if jax.default_backend() == "tpu" and S > 128:
        S = -(-S // 128) * 128

    # --- the canvas embedding + coordinate algebra, no resampling ---
    def grids_only(image, Hms):
        def one(Hm):
            sx = (S - 1) / (W - 1)
            sy = (S - 1) / (H - 1)
            T = jnp.array(
                [[sx, 0.0, sx - 1.0], [0.0, sy, sy - 1.0], [0.0, 0.0, 1.0]]
            )
            Hc = inv3(T) @ Hm @ T
            k = wt._mean_rotation_bucket(Hc)
            rk_inv = jnp.stack([wt._rot_k((4 - kk) % 4) for kk in range(4)])
            Hres = Hc @ rk_inv[k]
            a, b, c = Hres[0, 0], Hres[0, 1], Hres[0, 2]
            g, h, i = Hres[2, 0], Hres[2, 1], Hres[2, 2]
            d, e, f = Hres[1, 0], Hres[1, 1], Hres[1, 2]
            lin = jnp.linspace(-1.0, 1.0, S)
            to_pix = (S - 1) / 2.0
            xp = lin[None, :]
            yo = lin[:, None]
            denom = xp * g - a
            denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
            x_src = (b * yo + c - xp * (h * yo + i)) / denom
            wsrc = g * x_src + h * yo + i
            v1 = (d * x_src + e * yo + f) / jnp.where(
                jnp.abs(wsrc) < 1e-8, 1e-8, wsrc
            )
            rows = (v1 + 1.0) * to_pix
            xo = lin[None, :]
            yy = lin[:, None]
            w2 = g * xo + h * yy + i
            u = (a * xo + b * yy + c) / jnp.where(jnp.abs(w2) < 1e-8, 1e-8, w2)
            cols = (u + 1.0) * to_pix
            return rows.sum() + cols.sum()

        return jax.vmap(one)(Hms)

    # --- pass 1 alone (canvas pad + rows grid + vresample) ---
    def pass1_only(image, Hms):
        canvas = jnp.pad(image, ((0, S - H), (0, S - W)))

        def one(Hm):
            rows = jax.random.uniform(
                jax.random.PRNGKey(1), (S, S), jnp.float32, 0, S - 1
            )
            # use a real warp's rows instead: reuse the algebra above is
            # equivalent in cost; here we want the kernel cost isolated,
            # with a representative ~full band
            from ssp.kernels.vresample_pallas import vresample_pallas

            return vresample_pallas(canvas, rows)

        return jax.vmap(one)(Hms[:, 0, 0])  # dummy vmap over N

    def full(image, Hms):
        return jax.vmap(lambda Hm: wt.inv_warp_image_twopass(image, Hm))(Hms)

    g = jax.jit(grids_only)
    f = jax.jit(full)

    t_grid = timed(g, img, Hs)
    t_full = timed(f, img, Hs)
    print(f"shape {H}x{W}  num={N}  canvas S={S}")
    print(f"grids (coordinate algebra only): {t_grid:8.2f} ms")
    print(f"full two-pass warp stack:        {t_full:8.2f} ms")

    # pass-1-only with realistic kill-masked rows: run the internal
    # pieces of inv_warp_image_twopass but skip pass 2
    def pass1_real(image, Hms):
        def one(Hm):
            sx = (S - 1) / (W - 1)
            sy = (S - 1) / (H - 1)
            T = jnp.array(
                [[sx, 0.0, sx - 1.0], [0.0, sy, sy - 1.0], [0.0, 0.0, 1.0]]
            )
            Hc = inv3(T) @ Hm @ T
            k = wt._mean_rotation_bucket(Hc)
            rk_inv = jnp.stack([wt._rot_k((4 - kk) % 4) for kk in range(4)])
            Hres = Hc @ rk_inv[k]
            rlo = jnp.array([0, 0, S - H, S - W])[k]
            rhi = jnp.array([H, W, S, S])[k]
            ar = jnp.arange(S)
            keep1 = (ar >= rlo) & (ar < rhi)
            a, b, c = Hres[0, 0], Hres[0, 1], Hres[0, 2]
            d, e, f = Hres[1, 0], Hres[1, 1], Hres[1, 2]
            g_, h_, i_ = Hres[2, 0], Hres[2, 1], Hres[2, 2]
            lin = jnp.linspace(-1.0, 1.0, S)
            to_pix = (S - 1) / 2.0
            xp = lin[None, :]
            yo = lin[:, None]
            denom = xp * g_ - a
            denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
            x_src = (b * yo + c - xp * (h_ * yo + i_)) / denom
            wsrc = g_ * x_src + h_ * yo + i_
            v1 = (d * x_src + e * yo + f) / jnp.where(
                jnp.abs(wsrc) < 1e-8, 1e-8, wsrc
            )
            rows = (v1 + 1.0) * to_pix
            rows = jnp.where(jnp.abs(x_src) <= 1.5, rows, -10.0)
            rows = jnp.where(keep1[:, None], rows, -10.0)
            canvas = jnp.pad(image, ((0, S - H), (0, S - W)))
            return wt._vresample(canvas, rows)

        return jax.vmap(one)(Hms)

    p1 = jax.jit(pass1_real)
    t_p1 = timed(p1, img, Hs)
    print(f"pass 1 only (pad+grid+vres):     {t_p1:8.2f} ms")
    print(
        f"=> pass 2 + transposes + rot90:  {t_full - t_p1:8.2f} ms"
        f"   (grids within pass1: {t_grid / 2:.2f})"
    )


if __name__ == "__main__":
    main()
