"""Homography-adaptation export throughput (the north-star workload).

Measures images/sec for the fully-fused HA pipeline (num_h warps →
batched forward → inverse warp → aggregate → NMS → top-k) at the
reference's export settings (240×320, num=100 —
``configs/magicpoint_coco_export.yaml``).

Baseline context: the reference runs 100 warp-forwards per image at
batch 1 through DataParallel plus CPU-side warps (``export.py:192-352``)
— single-GPU rates reported around ~1 image/s.  Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NUM_H = 100
H, W = 240, 320
GROUP = 8  # images per call


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    from ssp.export.homography_adaptation import make_ha_fn
    from ssp.models import build_model

    model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False
    )
    variables = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    ha = make_ha_fn(model.apply, variables, num_h=NUM_H, top_k=600)

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
                "vs_baseline": round(img_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
