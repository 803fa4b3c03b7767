"""A/B: export-grade vs bench-grade post-processing on the fixed corpus.

bench.py measures ``approx_max_k`` (recall 0.95) + MXU descriptor
sampling while the production exports use exact ``lax.top_k`` + gather
sampling (round-3 VERDICT weak #3).  This sweep runs the SAME trained
checkpoint over the SAME fixed 80-pair corpus through both variants,
compares every evaluation column, and times the per-image pipeline —
the decision data for routing exports through the fast variants
(metric-neutral) or keeping them separate (not).

Match: reference export post-processing ``models/model_wrap.py:337-423``.

Usage (TPU for honest timing; CPU works for the metric columns):
  python scripts/ab_postprocess.py --out logs/ab_postprocess
"""
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="evidence/superPointNet_wsem_30000")
    ap.add_argument("--n-classes", type=int, default=133)
    ap.add_argument("--corpus", default="datasets/HPatches")
    ap.add_argument("--out", default="logs/ab_postprocess")
    ap.add_argument("--size", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument(
        "--arms", default="exact_gather,approx_mxu",
        help="comma list from {exact_gather, approx_mxu, fast_bf16}; the "
        "first arm is the comparison baseline.  fast_bf16 routes the "
        "forward through fast_apply_fn (folded-BN bf16 + packed stem "
        "where profitable) with the exact/gather post-processing — the "
        "path KITTI-shape exports ship by default (VERDICT r4 #2); run "
        "it at a packed-profitable --size (480 640) for the in-context "
        "answer.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

    from ssp.cli.evaluate import evaluate
    from ssp.data.hpatches import PatchesDataset
    from ssp.export.descriptors_export import (
        make_detect_describe_var_fn,
        run_descriptor_export,
    )
    from ssp.models import build_model
    from ssp.train.checkpoint import load_checkpoint
    from ssp.train.state import create_train_state

    model = build_model("SuperPointNet_gauss2_ssmall", n_classes=args.n_classes)
    state = create_train_state(model, jax.random.key(0), (1, *args.size, 1))
    state = load_checkpoint(args.ckpt, state, mode="weights")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ds = PatchesDataset(root=args.corpus,
                        preprocessing={"resize": list(args.size)})
    pairs = [ds[i] for i in range(len(ds))]
    if args.limit:
        pairs = pairs[: args.limit]

    from ssp.models.fast_infer import fast_apply_fn

    all_variants = {
        "exact_gather": dict(topk_method="exact", desc_sampler="gather"),
        "approx_mxu": dict(topk_method="approx", desc_sampler="mxu"),
        # bf16 folded-BN forward + the export's own exact post-processing:
        # isolates the *forward* substitution the KITTI exports default to
        "fast_bf16": dict(topk_method="exact", desc_sampler="gather",
                          apply_fn=fast_apply_fn),
    }
    arm_names = [a.strip() for a in args.arms.split(",") if a.strip()]
    variants = {n: all_variants[n] for n in arm_names}
    out = Path(args.out)
    results, timings = {}, {}
    for name, kw in variants.items():
        kw = dict(kw)
        apply_fn = kw.pop("apply_fn", model.apply)
        var_fn = make_detect_describe_var_fn(
            apply_fn, top_k=1000, conf_thresh=0.015, nms_radius=4,
            subpixel=False, **kw)

        def dd_fn(image):
            return var_fn(variables, image)

        d = out / name
        d.mkdir(parents=True, exist_ok=True)
        for f in d.glob("*.npz"):
            f.unlink()
        run_descriptor_export(dd_fn, pairs, d)
        results[name] = evaluate(d)

        # timing: per-image pipeline, warm (same contract as the export)
        img = jnp.asarray(pairs[0]["image"])
        jax.block_until_ready(dd_fn(img))
        iters = 50
        t0 = time.perf_counter()
        for _ in range(iters):
            r = dd_fn(img)
        jax.block_until_ready(r)
        timings[name] = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {timings[name]:.2f} ms/img",
              {k: round(v, 4) for k, v in results[name].items()})

    base = arm_names[0]
    a = results[base]
    rows = []
    for other in arm_names[1:]:
        b = results[other]
        for k in sorted(set(a) & set(b)):
            if k == "n_files":
                continue
            va, vb = float(a[k]), float(b[k])
            rel = abs(va - vb) / max(abs(va), abs(vb), 1e-6)
            rows.append((f"{other}:{k}", va, vb, rel, rel <= 0.005))
    for k, va, vb, rel, ok in rows:
        print(f"{k:<32} {va:8.4f} {vb:8.4f} {rel:7.4f} {ok}")

    payload = {
        "backend": jax.default_backend(),
        "pairs": len(pairs),
        "size": list(args.size),
        "arms": arm_names,
        "results": results,
        "ms_per_image": timings,
        "max_rel": max(r for *_, r, _ok in rows) if rows else 0.0,
        "neutral_0p5pct": all(ok for *_, ok in rows),
    }
    out.mkdir(parents=True, exist_ok=True)
    (out / "ab_summary.json").write_text(json.dumps(payload, indent=1))
    print(json.dumps({k: payload[k] for k in
                      ("backend", "ms_per_image", "max_rel", "neutral_0p5pct")}))


if __name__ == "__main__":
    main()
