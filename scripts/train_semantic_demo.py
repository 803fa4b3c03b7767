"""Semantic SuperPoint demo: train the full SSp path end to end without
external datasets, then report segmentation metrics.

Real COCO panoptic labels aren't available in this environment, so the
semantic signal is intensity-quantized pseudo-classes over the
synthetic corpus (4 bins).  That exercises every semantic component for
real: `Coco_sem`-style int label maps → device-side warped class maps
with ignore-class fill → segmentation head → masked CE → Kendall
three-task weighting → `ssp.evaluations.semantic` metrics.

Usage:
  python scripts/train_semantic_demo.py [--iters 3000] [--classes 4]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def quantize_sem(images: np.ndarray, n_classes: int) -> np.ndarray:
    """Per-image intensity quantiles → class ids [B, H, W] int32."""
    B = images.shape[0]
    out = np.zeros(images.shape, np.int32)
    qs = np.linspace(0, 1, n_classes + 1)[1:-1]
    for b in range(B):
        edges = np.quantile(images[b], qs)
        out[b] = np.digitize(images[b], edges)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--classes", type=int, default=4)
    ap.add_argument("--exper", default="ssp_semantic_demo")
    args = ap.parse_args()

    import jax

    from ssp.data.synthetic_dataset import SyntheticShapesDataset
    from ssp.evaluations.semantic import confusion_matrix, semantic_metrics
    from ssp.train.trainer import TrainAgent
    from ssp.utils.experiment import ExperimentPaths

    n_cls = args.classes
    ignore = n_cls  # warped out-of-frame pixels
    config = {
        "data": {
            "semantic": True,
            "ignore_class": ignore,
            "preprocessing": {"resize": [120, 160]},
            "augmentation": {
                "photometric": {"enable": False},  # sem labels derive from
                "homographic": {"enable": False},  # the clean intensities
            },
            "warped_pair": {"enable": True, "params": {
                "translation": True, "rotation": True, "scaling": True,
                "perspective": True, "scaling_amplitude": 0.2,
                "perspective_amplitude_x": 0.2, "perspective_amplitude_y": 0.2,
                "patch_ratio": 0.85, "max_angle": 0.785, "allow_artifacts": True,
            }, "valid_border_margin": 3},
        },
        "model": {
            "name": "SuperPointNet_gauss2_ssmall",
            "params": {"n_classes": n_cls},
            "batch_size": 16,
            "learning_rate": 0.001,
            "lambda_loss": 1,
            "sparse_loss": {"enable": True, "params": {
                "num_matching_attempts": 300,
                "num_masked_non_matches_per_match": 30,
            }},
            "multi_task_loss": True,
        },
        "train_iter": args.iters,
        "validation_interval": 1000,
        "tensorboard_interval": 200,
        "save_interval": args.iters,
        "validation_size": 2,
        "seed": 0,
    }

    exper = ExperimentPaths(args.exper)
    agent = TrainAgent(config, save_path=exper)

    ds = SyntheticShapesDataset(
        task="train",
        primitives=["draw_checkerboard", "draw_multiple_polygons", "draw_cube",
                    "draw_stripes", "draw_polygon"],
        generation={"split_sizes": {"training": 300, "validation": 40}},
        preprocessing={"resize": [120, 160]},
        suffix="semdemo",
    )
    val = SyntheticShapesDataset(
        task="val",
        primitives=["draw_checkerboard", "draw_multiple_polygons", "draw_cube",
                    "draw_stripes", "draw_polygon"],
        generation={"split_sizes": {"training": 300, "validation": 40}},
        preprocessing={"resize": [120, 160]},
        suffix="semdemo",
    )

    def with_sem(it):
        for b in it:
            b = dict(b)
            b["sem"] = quantize_sem(b["image"], n_cls)
            yield b

    agent.train_loader = with_sem(ds.batches(16, seed=0))
    agent.val_loader = with_sem(val.batches(16, shuffle=False, seed=0))
    agent.train()

    # segmentation quality on the val split
    import jax.numpy as jnp

    fwd = jax.jit(lambda img: agent.state.apply_fn(
        {"params": agent.state.params, "batch_stats": agent.state.batch_stats},
        img, train=False)["sem"])
    cm = np.zeros((n_cls, n_cls), np.int64)
    it = with_sem(val.batches(16, shuffle=False, seed=1))
    for _ in range(2):
        b = next(it)
        logits = np.asarray(jax.device_get(fwd(jnp.asarray(b["image"])[..., None])))
        cm += confusion_matrix(logits.argmax(-1), b["sem"], n_cls, ignore)
    m = semantic_metrics(cm)
    print("semantic val metrics:", {k: round(v, 4) for k, v in m.items()})
    (exper.root / "semantic_metrics.txt").write_text(repr(m) + "\n")


if __name__ == "__main__":
    main()
