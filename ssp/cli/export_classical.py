"""Classical-baseline export CLI — mirror of ``export_classical.py``.

Usage:
  python -m ssp.cli.export_classical <config> <exper_name>

Exports SIFT/ORB keypoints + descriptors + matches on HPatches pairs in
the evaluation npz format.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from ssp import registry
from ssp.export.classical import classical_detect_describe, match_classical
from ssp.utils.config import load_config
from ssp.utils.experiment import ExperimentPaths

log = logging.getLogger(__name__)


def export_classical(config: dict, exper_name: str) -> int:
    data_cfg = dict(config["data"])
    name = data_cfg.pop("dataset")
    dataset = registry.get("dataset", name)(task="test", **data_cfg)
    method = config["model"].get("name", "sift")
    top_k = int(config["model"].get("top_k", 1000))

    exper = ExperimentPaths(exper_name)
    out_dir = exper.predictions
    out_dir.mkdir(parents=True, exist_ok=True)
    n = 0
    for idx, pair in enumerate(dataset):
        out_file = out_dir / f"{idx}.npz"
        if out_file.exists():
            n += 1
            continue
        p1, d1 = classical_detect_describe(pair["image"], method, top_k)
        p2, d2 = classical_detect_describe(pair["warped_image"], method, top_k)
        if len(p1) and len(p2):
            m = match_classical(d1, d2, method)
            matches = np.concatenate(
                [p1[m[:, 0].astype(int)][:, :2], p2[m[:, 1].astype(int)][:, :2]], axis=1
            )
        else:
            matches = np.zeros((0, 4))
        np.savez_compressed(
            out_file,
            image=pair["image"],
            warped_image=pair["warped_image"],
            prob=p1,
            warped_prob=p2,
            desc=d1,
            warped_desc=d2,
            homography=pair["homography"],
            matches=matches,
        )
        n += 1
    log.info("exported %d classical (%s) pairs → %s", n, method, out_dir)
    return n


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("exper_name")
    args = ap.parse_args()
    export_classical(load_config(args.config), args.exper_name)


if __name__ == "__main__":
    main()
