"""Golden smoke runs: every shipped *training* config drives a real
2-iteration train loop on a tiny synthetic corpus.

The data section is overridden to a miniature SyntheticShapes corpus
(the real datasets aren't present in CI), but the *model*, loss
selection, multi-task weighting, gaussian-label and warped-pair
settings come straight from the config — so a config whose wiring is
broken (bad loss params, missing model, inconsistent semantic flags)
fails here, not at hour one of a real run.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest
import yaml

import ssp  # noqa: F401 — populate registries
from ssp.utils.config import dict_update

CONFIG_DIR = Path(__file__).parent.parent / "configs"
TRAIN_CONFIGS = sorted(
    p for p in CONFIG_DIR.glob("*.yaml")
    if "front_end_model" in p.read_text() and "Train_model" in p.read_text()
)

TINY_DATA = {
    "dataset": "SyntheticDataset_gaussian",
    "primitives": ["draw_polygon"],
    "generation": {"split_sizes": {"training": 8, "validation": 4}},
    "preprocessing": {"resize": [48, 64]},
    "labels": None,
    "sem_labels": None,
    "root": None,
    "root_split_txt": None,
    "suffix": None,
    "truncate": {},
}


@pytest.mark.parametrize("path", TRAIN_CONFIGS, ids=lambda p: p.stem)
def test_config_trains_two_iters(path, tmp_path):
    from ssp.data.synthetic_dataset import SyntheticShapesDataset
    from ssp.train.trainer import TrainAgent
    from ssp.utils.experiment import ExperimentPaths

    with open(path) as f:
        config = yaml.safe_load(f)

    config["data"] = dict_update(config["data"], TINY_DATA)
    config["data"]["preprocessing"] = {"resize": [48, 64]}
    config["model"] = dict_update(config["model"], {
        "batch_size": 2, "real_batch_size": 2, "eval_batch_size": 2,
        "params": dict(config["model"].get("params") or {}, dtype=jnp.float32),
    })
    # shrink the sparse loss so the smoke run stays fast
    sparse = config["model"].get("sparse_loss", {}).get("params")
    if sparse:
        sparse["num_matching_attempts"] = 64
        sparse["num_masked_non_matches_per_match"] = 4
    config.update(train_iter=2, validation_interval=2, tensorboard_interval=2,
                  save_interval=100, validation_size=0, pretrained=None)

    exper = ExperimentPaths(f"smoke_{path.stem}", tmp_path)
    agent = TrainAgent(config, save_path=exper)

    semantic = bool(config["data"].get("semantic", False))
    ds = SyntheticShapesDataset(
        task="train", primitives=["draw_polygon"],
        generation={"split_sizes": {"training": 8, "validation": 4}},
        cache_dir=tmp_path / "synth", preprocessing={"resize": [48, 64]},
    )

    if semantic:
        # graft flat semantic labels onto the synthetic samples
        base_iter = ds.batches(2, seed=0)

        def with_sem():
            for b in base_iter:
                b = dict(b)
                b["sem"] = np.full(b["image"].shape, 3, np.int32)
                yield b

        agent.train_loader = with_sem()
    else:
        agent.train_loader = ds.batches(2, seed=0)
    agent.train()
    assert int(agent.state.step) >= 2 // agent.r
    log = (exper.root / "metrics_train.jsonl").read_text()
    assert "loss" in log
