"""Stage probes at the reference's KITTI export shape (384×1248).

Measures, on the real chip, the pieces of the KITTI HA-export lane
(reference ``configs/magicpoint_kitti_export.yaml``: 384×1248, num=20):

  warp      — 20-warp two-pass resample stack (Pallas kernel path)
  gather    — the XLA gather resampler at the same shape (for the ratio)
  forward   — batched 20-image SuperPoint forward
  sustained — ``run_ha_export`` end to end over 24 in-memory frames

Every timing host-syncs per repetition (``float(out.sum())``): over
the axon tunnel, ``block_until_ready`` on a queued dispatch chain can
return before the device work is observable, so un-synced loops read
as ~0 ms.  Numbers recorded in PERF.md "KITTI lane at true reference
shape".

Usage:  python scripts/probe_kitti_shape.py [warp|gather|forward|sustained]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ssp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W, NUM_H = 384, 1248, 20


def _timed_synced(fn, args_list) -> float:
    """Mean ms/call with a per-call host sync (see module docstring)."""
    s = float(fn(*args_list[0]).sum())  # warm + compile
    t0 = time.perf_counter()
    for args in args_list[1:]:
        s = float(fn(*args).sum())
    dt = (time.perf_counter() - t0) / (len(args_list) - 1) * 1000
    print(f"  checksum {s:.1f}")
    return dt


def probe_warp(gather: bool = False) -> None:
    from ssp.core.homography import sample_homographies
    from ssp.core.warp import inv_warp_image
    from ssp.kernels.warp_twopass import inv_warp_image_twopass

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(H, W)).astype(np.float32))
    hs = [sample_homographies(jax.random.key(i), NUM_H) for i in range(6)]
    if gather:
        fn = jax.jit(lambda im, h: jax.vmap(
            lambda Hm: inv_warp_image(im[..., None], Hm)[..., 0])(h))
    else:
        fn = jax.jit(lambda im, h: jax.vmap(
            lambda Hm: inv_warp_image_twopass(im, Hm))(h))
    ms = _timed_synced(fn, [(img, h) for h in hs])
    print(f"{'gather' if gather else 'twopass'} {NUM_H} warps @ {H}x{W}: {ms:.1f} ms")


def probe_forward() -> None:
    from ssp.models import build_model

    model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32),
                   train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    rng = np.random.default_rng(0)
    stacks = [jnp.asarray(rng.uniform(size=(NUM_H, H, W, 1)).astype(np.float32))
              for _ in range(4)]
    fwd = jax.jit(lambda x: model.apply(v, x, train=False)["semi"])
    ms = _timed_synced(fwd, [(s,) for s in stacks])
    print(f"forward {NUM_H} imgs @ {H}x{W}: {ms:.1f} ms")


def probe_sustained() -> None:
    from ssp.export.homography_adaptation import make_ha_fn, run_ha_export
    from ssp.models import build_model

    model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
    v = model.init(jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32),
                   train=False)
    v = {"params": v["params"], "batch_stats": v["batch_stats"]}
    rng = np.random.default_rng(0)
    ha = make_ha_fn(model.apply, v, num_h=NUM_H, top_k=600,
                    subpixel=True, patch_size=5)
    imgs = [(f"i{i}", rng.uniform(size=(H, W)).astype(np.float32))
            for i in range(24)]
    with tempfile.TemporaryDirectory() as td:
        run_ha_export(ha, imgs[:2], Path(td) / "warm", seed=0, group=1)
        t = time.perf_counter()
        n = run_ha_export(ha, imgs, Path(td) / "out", seed=0, group=1)
        dt = time.perf_counter() - t
    print(f"sustained HA export: {n / dt:.2f} img/s ({NUM_H} warps @ {H}x{W})")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "warp"
    {"warp": probe_warp,
     "gather": lambda: probe_warp(gather=True),
     "forward": probe_forward,
     "sustained": probe_sustained}[which]()
