"""Export CLI — mirror of the reference's ``export.py``.

Usage:
  python -m ssp.cli.export export_detector_homoAdapt <config> <exper_name>
  python -m ssp.cli.export export_descriptor        <config> <exper_name>
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp

from ssp import registry
from ssp.models import build_model
from ssp.train.checkpoint import load_checkpoint
from ssp.train.state import create_train_state
from ssp.utils.config import load_config
from ssp.utils.experiment import ExperimentPaths

log = logging.getLogger(__name__)


def _load_variables(config: dict, input_hw) -> tuple:
    """Build the configured model and restore weights from
    ``config['pretrained']`` (orbax checkpoint dir)."""
    m = config["model"]
    model = build_model(m["name"], **dict(m.get("params") or {}))
    state = create_train_state(model, jax.random.key(0), (1, *input_hw, 1))
    pretrained = config.get("pretrained") or m.get("pretrained")
    if pretrained:
        log.info("loading weights from %s", pretrained)
        state = load_checkpoint(pretrained, state, mode="weights")
    else:
        log.warning("no pretrained weights configured — exporting random init")
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables


def export_detector_homoAdapt(config: dict, exper_name: str) -> None:
    from ssp.export.homography_adaptation import make_ha_fn, run_ha_export

    data_cfg = dict(config["data"])
    name = data_cfg.pop("dataset")
    split = data_cfg.pop("export_folder", "train")
    dataset = registry.get("dataset", name)(task=split, **data_cfg)

    size = config["data"].get("preprocessing", {}).get("resize", [240, 320])
    model, variables = _load_variables(config, size)

    ha_cfg = config["data"].get("homography_adaptation", {})
    m = config["model"]
    sub = m.get("subpixel", {})
    from ssp.models.fast_infer import best_apply_fn

    ha_fn = make_ha_fn(
        best_apply_fn(model, variables, input_hw=tuple(size),
                      enable=bool(m.get("fast_inference", True))),
        variables,
        num_h=int(ha_cfg.get("num", 100)),
        homography_params=ha_cfg.get("homographies", {}).get("params"),
        aggregation=ha_cfg.get("aggregation", "sum"),
        filter_counts=int(ha_cfg.get("filter_counts", 0)),
        top_k=int(m.get("top_k", 600)),
        conf_thresh=float(m.get("detection_threshold", 0.015)),
        nms_radius=int(m.get("nms", 4)),
        subpixel=bool(sub.get("enable", False)),
        patch_size=int(sub.get("patch_size", 5)),
        one_dispatch=bool(ha_cfg.get("one_dispatch", False)),
    )
    exper = ExperimentPaths(exper_name)
    out_dir = exper.predictions / type(dataset).split_dir(split)
    # audit log, appended across resumed runs (reference export.py:263-275)
    exper.root.mkdir(parents=True, exist_ok=True)
    with open(exper.root / "export.txt", "a") as audit:
        audit.write(f"load model: {config.get('pretrained') or m.get('pretrained')}\n")
        audit.write(f"homography adaptation: {int(ha_cfg.get('num', 100))}\n")
    from ssp.parallel import make_mesh

    mesh = make_mesh()
    n_dev = len(jax.devices())
    n = run_ha_export(
        ha_fn, dataset.images(), out_dir, seed=int(config.get("seed", 0)),
        group=max(n_dev, 1), mesh=mesh if n_dev > 1 else None,
    )
    log.info("exported %d predictions to %s", n, out_dir)


def export_descriptor(config: dict, exper_name: str) -> None:
    from ssp.export.descriptors_export import (
        make_detect_describe_fn,
        run_descriptor_export,
    )

    data_cfg = dict(config["data"])
    name = data_cfg.pop("dataset")
    dataset = registry.get("dataset", name)(task="test", **data_cfg)

    size = config["data"].get("preprocessing", {}).get("resize", [240, 320])
    model, variables = _load_variables(config, size)
    m = config["model"]
    sub = m.get("subpixel", {})
    from ssp.models.fast_infer import best_apply_fn

    dd_fn = make_detect_describe_fn(
        best_apply_fn(model, variables, input_hw=tuple(size),
                      enable=bool(m.get("fast_inference", True))),
        variables,
        top_k=int(m.get("top_k", 1000)),
        conf_thresh=float(m.get("detection_threshold", 0.015)),
        nms_radius=int(m.get("nms", 4)),
        subpixel=bool(sub.get("enable", True)),
        patch_size=int(sub.get("patch_size", 5)),
    )
    exper = ExperimentPaths(exper_name)
    out_dir = exper.predictions
    n = run_descriptor_export(
        dd_fn, iter(dataset), out_dir, nn_thresh=float(m.get("nn_thresh", 1.0))
    )
    log.info("exported %d pairs to %s", n, out_dir)


def export_sequence(config: dict, exper_name: str) -> None:
    """Per-frame keypoints + descriptors for a SLAM front-end (the
    reference feeds KITTI/TUM sequences to Semantic_ORB_SLAM2,
    README.md:26-29, via its exported model)."""
    import numpy as np

    from ssp.export.descriptors_export import make_detect_describe_fn

    data_cfg = dict(config["data"])
    name = data_cfg.pop("dataset")
    split = data_cfg.pop("export_folder", "train")
    dataset = registry.get("dataset", name)(task=split, **data_cfg)

    size = config["data"].get("preprocessing", {}).get("resize", [240, 320])
    model, variables = _load_variables(config, size)
    m = config["model"]
    sub = m.get("subpixel", {})
    from ssp.models.fast_infer import best_apply_fn

    dd_fn = make_detect_describe_fn(
        best_apply_fn(model, variables, input_hw=tuple(size),
                      enable=bool(m.get("fast_inference", True))), variables,
        top_k=int(m.get("top_k", 1000)),
        conf_thresh=float(m.get("detection_threshold", 0.015)),
        nms_radius=int(m.get("nms", 4)),
        subpixel=bool(sub.get("enable", False)),
        patch_size=int(sub.get("patch_size", 5)),
    )
    exper = ExperimentPaths(exper_name)
    out_root = exper.predictions / type(dataset).split_dir(split)
    n = 0
    for img_name, img in dataset.images():
        out_file = out_root / f"{img_name}.npz"
        if out_file.exists():
            continue
        out_file.parent.mkdir(parents=True, exist_ok=True)
        import jax.numpy as jnp

        pts, valid, desc = jax.device_get(dd_fn(jnp.asarray(img)))
        v = np.asarray(valid)
        np.savez_compressed(out_file, pts=np.asarray(pts)[v], desc=np.asarray(desc)[v])
        n += 1
    log.info("exported %d frames to %s", n, out_root)


def main() -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    ap = argparse.ArgumentParser(description="ssp export")
    sub = ap.add_subparsers(dest="command", required=True)
    for cmd in ("export_detector_homoAdapt", "export_descriptor", "export_sequence"):
        p = sub.add_parser(cmd)
        p.add_argument("config")
        p.add_argument("exper_name")
    args = ap.parse_args()
    config = load_config(args.config)
    if args.command == "export_detector_homoAdapt":
        export_detector_homoAdapt(config, args.exper_name)
    elif args.command == "export_sequence":
        export_sequence(config, args.exper_name)
    else:
        export_descriptor(config, args.exper_name)


if __name__ == "__main__":
    main()
