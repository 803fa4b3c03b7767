"""Homography-adaptation export throughput (the north-star workload).

Measures images/sec for the fully-fused HA pipeline (num_h warps →
batched forward → inverse warp → aggregate → NMS → top-k) at the
reference's export settings (240×320, num=100 —
``configs/magicpoint_coco_export.yaml``).

Baseline derivation (BASELINE.md): the published SuperPoint rate is
70 FPS @ 480×640 on a Titan X (arXiv:1712.07629).  One HA image costs
100 forwards @ 240×320 = 25 forward-equivalents of 480×640 pixels, so
the forward-bound reference HA rate is 70/25 = **2.8 img/s**, before
its per-sample CPU costs (100 grid_sample warps + mask erosion in
DataLoader workers, numpy NMS — ``export.py:192-352``,
``datasets/Coco.py:258-291``) which dominate at batch 1 in practice.
vs_baseline divides by the 2.8 img/s forward bound (conservative:
the real reference is slower).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_H = 100
H, W = 240, 320
GROUP = 8  # images per call
SUSTAINED_IMAGES = 64  # --sustained: images through run_ha_export

# forward-bound reference HA rate derived from the published 70 FPS
# @ 480x640 (arXiv:1712.07629): 100 warps @ 240x320 per image = 25
# forward-equivalents -> 2.8 img/s (see module docstring / BASELINE.md)
REFERENCE_HA_IMG_PER_S = 2.8


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    from ssp.export.homography_adaptation import make_ha_fn
    from ssp.models import build_model

    model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False
    )
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    from ssp.models.fast_infer import best_apply_fn

    ha = make_ha_fn(best_apply_fn(model, variables, input_hw=(H, W)), variables, num_h=NUM_H, top_k=600)

    if "--sustained" in sys.argv:
        return sustained(ha)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(GROUP, H, W)).astype(np.float32))
    keys = jax.random.split(jax.random.key(1), GROUP)

    out = ha(keys, imgs)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ha(keys, imgs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    img_per_s = GROUP * iters / dt

    print(
        json.dumps(
            {
                "metric": "HA export images/sec/chip (num=100, 240x320)",
                "value": round(img_per_s, 2),
                "unit": "images/s",
                "vs_baseline": round(img_per_s / REFERENCE_HA_IMG_PER_S, 3),
            }
        )
    )


def sustained(ha):
    """End-to-end `run_ha_export` throughput: host image feed →
    device pipeline → npz writes, including all host↔device transfers
    (the number a real export job sees, vs the kernel-level loop
    above).  Warm-up group first so compile time is excluded."""
    import tempfile
    from pathlib import Path

    from ssp.export.homography_adaptation import run_ha_export

    rng = np.random.default_rng(0)
    imgs = [
        (f"img_{i:04d}", rng.uniform(size=(H, W)).astype(np.float32))
        for i in range(SUSTAINED_IMAGES)
    ]
    with tempfile.TemporaryDirectory() as td:
        # compile warm-up (separate dir so nothing is skipped below)
        run_ha_export(ha, imgs[:GROUP], Path(td) / "warm", seed=0, group=GROUP)
        t0 = time.perf_counter()
        n = run_ha_export(ha, imgs, Path(td) / "out", seed=0, group=GROUP)
        dt = time.perf_counter() - t0
    img_per_s = n / dt
    print(
        json.dumps(
            {
                "metric": "HA export sustained images/sec/chip (run_ha_export, num=100, 240x320)",
                "value": round(img_per_s, 2),
                "unit": "images/s",
                "vs_baseline": round(img_per_s / REFERENCE_HA_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
