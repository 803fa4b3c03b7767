"""HA-export throughput at the KITTI reference shape (384x1248, num=20).

Round-3 VERDICT weak #4 follow-up: re-measure the KITTI lane after the
packed stem + batch-gated down1 kernels.  Workload of
/root/reference/configs/magicpoint_kitti_export.yaml; same fused HA
pipeline bench_ha.py measures at 240x320.

Usage: python scripts/bench_ha_kitti.py [--group 2] [--num 20]
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# forward-bound reference rate from the published 70 FPS @ 480x640
# (arXiv:1712.07629): 20 warps @ 384x1248 = 20*(384*1248)/(480*640)
# = 31.2 forward-equivalents -> 2.24 img/s (PERF.md "KITTI lane")
REFERENCE_IMG_PER_S = 2.24
H, W = 384, 1248


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=2)
    ap.add_argument("--num", type=int, default=20)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="", help="also write the JSON here "
                    "(committed perf evidence, VERDICT r5 #6)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    from ssp.export.homography_adaptation import make_ha_fn
    from ssp.models import build_model
    from ssp.models.fast_infer import best_apply_fn

    model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False
    )
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    ha = make_ha_fn(best_apply_fn(model, variables, input_hw=(H, W)),
                    variables, num_h=args.num, top_k=600)

    rng = np.random.default_rng(0)
    G = args.group
    imgs = jnp.asarray(rng.uniform(size=(G, H, W)).astype(np.float32))
    keys = jax.random.split(jax.random.key(1), G)

    out = ha(keys, imgs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for r in range(args.reps):
        out = ha(jax.random.split(jax.random.key(r), G), imgs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    rate = G * args.reps / dt
    payload = {
        "metric": f"HA export images/sec/chip (num={args.num}, {H}x{W})",
        "value": round(rate, 2), "unit": "images/s",
        "vs_baseline": round(rate / REFERENCE_IMG_PER_S, 3),
        "group": G, "reps": args.reps,
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
