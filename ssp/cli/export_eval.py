"""Checkpoint-sweep CLI — mirror of the reference's ``export_eval.py``.

Usage:
  python -m ssp.cli.export_eval <config> <exper_name>

Globs checkpoints under ``config["model"]["folder"]``, runs HPatches
export + evaluation for each, and appends one row per checkpoint to
``results.csv`` (reference ``export_eval.py:700-752``).  Failures are
recorded as zero rows so one broken checkpoint doesn't kill the sweep
(``export_eval.py:737-751``).
"""

from __future__ import annotations

import argparse
import csv
import logging
from pathlib import Path

import jax

from ssp import registry
from ssp.cli.evaluate import HOMOGRAPHY_THRESH, evaluate
from ssp.models import build_model
from ssp.train.checkpoint import load_checkpoint
from ssp.train.state import create_train_state
from ssp.utils.config import load_config
from ssp.utils.experiment import ExperimentPaths

log = logging.getLogger(__name__)

CSV_FIELDS = (
    ["iter", "repeatability", "localization_err"]
    + [f"correctness_{e}" for e in HOMOGRAPHY_THRESH]
    + ["nn_map", "matching_score"]
)

# the reference's exact header (export_eval.py:710-719) — written as a
# second file so tooling built against the reference's results.csv
# (e.g. its plotting notebooks) consumes ssp sweeps unchanged
REF_CSV_FIELDS = [
    "path",
    "repeatability threshold",
    "repeatability",
    "localization error",
    "homography threshold",
    "Average correctness",
    "nn mean AP",
    "matching score",
]
REP_THRESH = 3  # reference rep_thd (export_eval.py:96)


def reference_row(ckpt_path: str, summary: dict) -> dict:
    """One ``results.csv`` row in the reference's schema
    (``export_eval.py:345-355``): correctness over the ε sweep is a
    stringified array, scalars stringified as the reference does."""
    correctness = [summary.get(f"correctness_{e}", 0.0) for e in HOMOGRAPHY_THRESH]
    return {
        "path": ckpt_path,
        "repeatability threshold": str(REP_THRESH),
        "repeatability": summary.get("repeatability", 0.0),
        "localization error": summary.get("localization_err", 0.0),
        "homography threshold": str(list(HOMOGRAPHY_THRESH)),
        "Average correctness": str(correctness),
        "nn mean AP": str(summary.get("nn_map", 0.0)),
        "matching score": str(summary.get("matching_score", 0.0)),
    }


def sweep(config: dict, exper_name: str) -> Path:
    from ssp.export.descriptors_export import (
        make_detect_describe_var_fn,
        run_descriptor_export,
    )

    folder = Path(config["model"]["folder"])
    ckpts = sorted(
        folder.glob("superPointNet_*"), key=lambda p: int(p.name.split("_")[-1])
    )
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints under {folder}")

    data_cfg = dict(config["data"])
    name = data_cfg.pop("dataset")
    dataset = registry.get("dataset", name)(task="test", **data_cfg)
    size = config["data"].get("preprocessing", {}).get("resize", [240, 320])

    m = config["model"]
    model = build_model(m["name"], **dict(m.get("params") or {}))
    base_state = create_train_state(model, jax.random.key(0), (1, *size, 1))

    sub = m.get("subpixel", {})
    var_fn = make_detect_describe_var_fn(
        model.apply,
        top_k=int(m.get("top_k", 1000)),
        conf_thresh=float(m.get("detection_threshold", 0.015)),
        nms_radius=int(m.get("nms", 4)),
        subpixel=bool(sub.get("enable", True)),
        patch_size=int(sub.get("patch_size", 5)),
    )

    exper = ExperimentPaths(exper_name)
    csv_path = exper.checkpoints / "results.csv"
    ref_csv_path = exper.checkpoints / "results_ref.csv"
    csv_path.parent.mkdir(parents=True, exist_ok=True)
    write_header = not csv_path.exists()
    write_ref_header = not ref_csv_path.exists()
    with open(csv_path, "a", newline="") as f, \
            open(ref_csv_path, "a", newline="") as rf:
        writer = csv.DictWriter(f, fieldnames=CSV_FIELDS)
        ref_writer = csv.DictWriter(rf, fieldnames=REF_CSV_FIELDS)
        if write_header:
            writer.writeheader()
        if write_ref_header:
            ref_writer.writeheader()
        for ckpt in ckpts:
            it = int(ckpt.name.split("_")[-1])
            row = {k: 0.0 for k in CSV_FIELDS}
            row["iter"] = it
            summary: dict = {}
            try:
                state = load_checkpoint(ckpt, base_state, mode="weights")
                variables = {"params": state.params, "batch_stats": state.batch_stats}
                dd_fn = lambda img, v=variables: var_fn(v, img)  # noqa: E731
                out_dir = exper.predictions / f"ckpt_{it}"
                run_descriptor_export(
                    dd_fn, iter(dataset), out_dir,
                    nn_thresh=float(m.get("nn_thresh", 1.0)),
                )
                summary = evaluate(out_dir)
                for k in CSV_FIELDS[1:]:
                    row[k] = summary.get(k, 0.0)
            except Exception as e:  # noqa: BLE001 — sweep must continue
                log.exception("checkpoint %s failed: %s", ckpt, e)
            writer.writerow(row)
            ref_writer.writerow(reference_row(str(ckpt), summary))
            f.flush()
            rf.flush()
            log.info("ckpt %d: %s", it, {k: round(v, 4) for k, v in row.items()})
    return csv_path


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("exper_name")
    args = ap.parse_args()
    sweep(load_config(args.config), args.exper_name)


if __name__ == "__main__":
    main()
