"""Benchmark: detect+describe throughput at 480×640, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured pipeline is the full inference path a SLAM front-end
consumes — forward (bf16), heatmap flattening, NMS, top-k keypoint
extraction, descriptor sampling at keypoints — per BASELINE.md's
"480×640 images/sec/chip (detect+describe)" metric.

vs_baseline: the reference repo publishes no throughput numbers
(SURVEY.md §6), but the SuperPoint paper does — DeTone, Malisiewicz,
Rabinovich, "SuperPoint: Self-Supervised Interest Point Detection and
Description" (CVPR-W 2018, arXiv:1712.07629) reports the model runs at
**70 FPS on 480×640 images with a Titan X GPU**, the same VGG backbone
+ detect/describe workload measured here (the reference's gauss2 adds
BatchNorm but is architecturally the paper's network;
`models/SuperPointNet_gauss2.py:19-39`).  Secondary anchor measured in
this environment: the torch twin of the reference model runs 0.92 img/s
forward-only on one Xeon core (see BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Tunnel-health guard (round 5, VERDICT #3): the r4 official capture
# was taken on a degraded tunnel (tiny-matmul RTT ~1.7 s vs the usual
# ~0.2 s) and recorded an 8% regression that disappeared on a healthy
# link.  Refuse to *silently* record numbers from a sick link: probe
# the dispatch round-trip first, wait-and-retry while degraded, and
# stamp the measured RTT into the JSON either way.
RTT_HEALTHY_S = 0.5
RTT_RETRIES = 5
RTT_RETRY_WAIT_S = 30.0


def probe_tunnel_rtt() -> float:
    """Median round-trip of a tiny compiled dispatch (seconds)."""
    x = jnp.ones((128, 128), jnp.float32)
    f = jax.jit(lambda a: a @ a)
    f(x).block_until_ready()  # compile outside the probe
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[1]

# published SuperPoint rate: 70 FPS @ 480x640, Titan X (arXiv:1712.07629)
REFERENCE_IMG_PER_S = 70.0
H, W = 480, 640
BATCH = 16  # knee re-measured with the packed stem (round 5, v5e:
# 16: 1260, 32: 1222, 64: 1194 img/s; the pre-packed-stem knee was 32
# — 16: 930, 32: 938, 64: 924).  The packed layout already fills the
# lanes at B=16, so the larger batch only adds HBM pressure.
TOP_K = 1000


def build_pipeline(export_grade: bool = False):
    """``export_grade=True`` measures the exports' default
    post-processing (exact ``lax.top_k`` + gather descriptor sampling)
    instead of the fast variants, so the headline number and the
    shipped export path can be compared on identical terms
    (``--export-grade``; A/B: scripts/ab_postprocess.py)."""
    from ssp.core.grid import flatten_detection
    from ssp.kernels.nms_pallas import nms_pallas
    from ssp.models import build_model
    from ssp.models.fast_infer import make_fast_apply
    from ssp.postprocess.points import sample_descriptors, sample_descriptors_mxu

    model = build_model("SuperPointNet_gauss2", dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False
    )
    # folded-BN forward with the Pallas packed stem (1.5x XLA on the
    # stem convs; parity vs model.apply in tests/test_fast_infer.py)
    fast_apply = make_fast_apply(variables, input_hw=(H, W))

    def detect_describe(images):
        out = fast_apply(images)
        heat = flatten_detection(out["semi"])[..., 0]  # [B, H, W]
        # fused Pallas NMS + border removal (one kernel, one HBM pass)
        nmsed = nms_pallas(heat, radius=4, border=4)
        if export_grade:
            scores, idx = jax.lax.top_k(
                nmsed.reshape(nmsed.shape[0], -1), TOP_K
            )
        else:
            # TPU-optimized approximate top-k; recall 0.95 over NMS
            # survivors (neutrality: tests/test_ab_postprocess.py +
            # the committed A/B table)
            scores, idx = jax.lax.approx_max_k(
                nmsed.reshape(nmsed.shape[0], -1), TOP_K, recall_target=0.95
            )
        pts = jnp.stack(
            [(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32), scores],
            axis=-1,
        )
        # descriptor sampling as an MXU matmul (gathers were the largest
        # single post-processing cost — ssp/postprocess/points.py)
        sampler = sample_descriptors if export_grade else sample_descriptors_mxu
        desc = jax.vmap(sampler)(out["desc"], pts)
        return pts, desc

    return jax.jit(detect_describe)


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    rtt = probe_tunnel_rtt()
    for _ in range(RTT_RETRIES):
        if rtt <= RTT_HEALTHY_S:
            break
        print(
            f"[bench] tunnel degraded (tiny-dispatch RTT {rtt:.2f}s > "
            f"{RTT_HEALTHY_S}s); waiting {RTT_RETRY_WAIT_S:.0f}s",
            file=sys.stderr,
        )
        time.sleep(RTT_RETRY_WAIT_S)
        rtt = probe_tunnel_rtt()

    export_grade = "--export-grade" in sys.argv
    fn = build_pipeline(export_grade=export_grade)
    images = jnp.asarray(
        np.random.default_rng(0).uniform(size=(BATCH, H, W, 1)).astype(np.float32)
    )

    # warmup / compile
    pts, desc = fn(images)
    jax.block_until_ready((pts, desc))

    # timed
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        pts, desc = fn(images)
    jax.block_until_ready((pts, desc))
    dt = time.perf_counter() - t0
    img_per_s = BATCH * iters / dt

    print(
        json.dumps(
            {
                "metric": "480x640 images/sec/chip (detect+describe)",
                "value": round(img_per_s, 2),
                "unit": "images/s",
                "vs_baseline": round(img_per_s / REFERENCE_IMG_PER_S, 3),
                "tunnel_rtt_s": round(rtt, 3),
                "tunnel_degraded": rtt > RTT_HEALTHY_S,
                **({"postprocess": "export_grade"} if export_grade else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
