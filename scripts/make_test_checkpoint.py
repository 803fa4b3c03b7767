"""Convert an orbax training checkpoint into the compact committed
weights artifact (``ssp.train.checkpoint.save_weights_npz``).

The npz (params + batch_stats, fp16, ~2-3 MB) is what the
checkpoint-gated validation tests load on a fresh clone
(tests/test_parity_sweep.py, test_sequence_eval.py,
test_known_h_oracle.py) — VERDICT r4 weak #3 / task #4.

Usage:
  python scripts/make_test_checkpoint.py \
      logs/pipeline240_wsem_200k_r4/checkpoints/superPointNet_12050 \
      evidence/wsem_weights.npz --n-classes 133
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import hashlib
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out")
    ap.add_argument("--model", default="SuperPointNet_gauss2_ssmall")
    ap.add_argument("--n-classes", type=int, default=None)
    ap.add_argument("--size", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--dtype", default="fp32", choices=("fp16", "fp32"),
                    help="storage dtype; fp32 (~6 MB) keeps the forward "
                    "bit-exact — the 200k checkpoint's sharper logits "
                    "flip ~8%% of threshold-marginal keypoints under "
                    "fp16 rounding, which failed the overlap gate")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp.models import build_model
    from ssp.train.checkpoint import (
        load_checkpoint,
        load_weights_npz,
        save_weights_npz,
    )
    from ssp.train.state import create_train_state

    kw = {"n_classes": args.n_classes} if args.n_classes else {}
    model = build_model(args.model, dtype=jnp.float32, **kw)
    state = create_train_state(model, jax.random.key(0), (1, *args.size, 1))
    state = load_checkpoint(args.ckpt, state, mode="weights")
    import numpy as np_

    dtype = np_.float16 if args.dtype == "fp16" else np_.float32
    out = save_weights_npz(args.out, state, dtype=dtype)

    # round-trip check: forward parity within fp16 weight rounding
    restored = load_weights_npz(out, create_train_state(
        model, jax.random.key(1), (1, *args.size, 1)))
    import numpy as np

    from ssp.data.synthetic_shapes import generate_sample

    # corner-rich probe scene — a trained detector finds nothing above
    # threshold in uniform noise, which would void the keypoint gate
    im, _ = generate_sample("draw_multiple_polygons", size=tuple(args.size),
                            seed=4)
    x = jnp.asarray(im)[None, ..., None]
    a = model.apply({"params": state.params,
                     "batch_stats": state.batch_stats}, x, train=False)
    b = model.apply({"params": restored.params,
                     "batch_stats": restored.batch_stats}, x, train=False)
    rel = float(jnp.linalg.norm(a["semi"] - b["semi"])
                / jnp.linalg.norm(a["semi"]))

    # the gate that matters for the consuming tests: the fp16 weight
    # rounding must not move the detected keypoint set (logit-norm rel
    # error alone over-penalizes near-zero logits)
    from ssp.core.grid import flatten_detection
    from ssp.postprocess.points import extract_keypoints

    def kps(outs):
        heat = flatten_detection(outs["semi"])[0, ..., 0]
        pts, valid = extract_keypoints(
            heat, k=300, conf_thresh=0.015, nms_radius=4, border=4)
        pts, valid = np.asarray(pts), np.asarray(valid)
        return {tuple(p) for p in pts[valid][:, :2].astype(int).tolist()}

    ka, kb = kps(a), kps(b)
    overlap = len(ka & kb) / max(len(ka), 1)
    sha = hashlib.sha256(pathlib.Path(out).read_bytes()).hexdigest()[:16]
    print(json.dumps({
        "out": str(out),
        "bytes": pathlib.Path(out).stat().st_size,
        "source": args.ckpt,
        "model": args.model,
        "n_classes": args.n_classes,
        "dtype": args.dtype,
        "semi_rel_err": rel,
        "keypoint_overlap": overlap,
        "sha256_16": sha,
    }))
    assert overlap >= 0.95, (overlap, rel)


if __name__ == "__main__":
    main()
