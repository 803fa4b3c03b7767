"""Semantic-head evaluation of a Semantic-SuperPoint checkpoint.

Runs the 133-class ``sem`` head of a wsem checkpoint over the COCO-tree
val split through the real ``Coco_sem`` reader (PNG raw panoptic ids →
built-in 133-class remap) and reports pixel accuracy / mean class
accuracy / mean IoU (``ssp.evaluations.semantic``).  The reference
evaluates its semantic head only through SLAM trajectory error
(reference ``README.md:26-29``); this is the direct segmentation-quality
protocol for the same head.

Usage:
  python scripts/eval_wsem_semantic.py CKPT [--root datasets/COCO240]
      [--sem-labels datasets/COCO240/annotations] [--batch 8] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="orbax checkpoint dir (superPointNet_<iter>)")
    ap.add_argument("--root", default="datasets/COCO240")
    ap.add_argument("--sem-labels", default="datasets/COCO240/annotations")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--resize", type=int, nargs=2, default=(240, 320))
    ap.add_argument("--out", default=None, help="metrics txt path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssp.data.coco import CocoSemDataset
    from ssp.data.coco_labels import IGNORE_CLASS, N_CLASSES
    from ssp.evaluations.semantic import confusion_matrix, semantic_metrics
    from ssp.models import build_model
    from ssp.train import create_train_state
    from ssp.train.checkpoint import load_checkpoint

    h, w = args.resize
    ds = CocoSemDataset(
        task="val", root=args.root, sem_labels=args.sem_labels,
        preprocessing={"resize": [h, w]},
    )
    n = len(ds)
    assert n > 0, "empty val split"

    model = build_model("SuperPointNet_gauss2_ssmall", n_classes=N_CLASSES)
    state = create_train_state(model, jax.random.key(0), (1, h, w, 1))
    state = load_checkpoint(args.ckpt, state, mode="weights")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def predict(images):
        out = model.apply(variables, images[..., None], train=False)
        return jnp.argmax(out["sem"], axis=-1).astype(jnp.int32)

    cm = np.zeros((N_CLASSES, N_CLASSES), np.int64)
    t0 = time.perf_counter()
    # Iterate sample indices directly: Dataset.batches() drops the
    # ragged epoch tail, which would skip the last n % batch images and
    # double-count the first n % batch (biasing the confusion matrix).
    # The final batch is padded by repeating the last index (keeps the
    # jit shape static); only the first `take` rows are counted.
    for start in range(0, n, args.batch):
        idxs = list(range(start, min(start + args.batch, n)))
        take = len(idxs)
        idxs += [n - 1] * (args.batch - take)
        samples = [ds[i] for i in idxs]
        images = np.stack([s["image"] for s in samples])
        sem = np.stack([s["sem"] for s in samples])
        pred = np.asarray(predict(jnp.asarray(images, jnp.float32)))
        cm += confusion_matrix(
            pred[:take], sem[:take], N_CLASSES, IGNORE_CLASS
        )
    dt = time.perf_counter() - t0

    m = semantic_metrics(cm)
    # stand-in-corpus context metric: the generated labels are 134
    # uniform gray bins ≈1.9 gray-levels wide (scripts/
    # make_coco_sem_labels.py), so exact-bin accuracy is bounded by
    # sensor-noise-level distinctions; accuracy within ±k adjacent bins
    # (train ids are bin-ordered) measures whether the head actually
    # learned the appearance→class mapping to near-bin resolution.
    idx = np.abs(np.arange(N_CLASSES)[:, None] - np.arange(N_CLASSES)[None, :])
    tot = max(cm.sum(), 1)
    for k in (1, 4):
        m[f"accuracy_within_{k}_bins"] = float(cm[idx <= k].sum() / tot)
    m["images"] = n
    m["img_per_s"] = round(n / dt, 2)
    m["ckpt"] = str(args.ckpt)
    print(json.dumps(m))
    if args.out:
        Path(args.out).write_text(json.dumps(m, indent=1) + "\n")


if __name__ == "__main__":
    main()
