"""steps_per_dispatch: scanned multi-step training matches semantics."""

import numpy as np
import jax.numpy as jnp

from ssp.data.synthetic_dataset import SyntheticShapesDataset
from ssp.train.trainer import TrainAgent
from ssp.utils.experiment import ExperimentPaths


def test_multi_step_dispatch(tmp_path):
    config = {
        "data": {
            "preprocessing": {"resize": [48, 64]},
            "augmentation": {
                "photometric": {"enable": False},
                "homographic": {"enable": False},
            },
            "warped_pair": {"enable": False},
        },
        "model": {
            "name": "SuperPointNet_gauss2",
            "params": {"dtype": jnp.float32},
            "batch_size": 4,
            "learning_rate": 0.01,
            "lambda_loss": 0,
        },
        "train_iter": 8,
        "validation_interval": 100,
        "tensorboard_interval": 4,
        "save_interval": 8,
        "steps_per_dispatch": 4,
    }
    exper = ExperimentPaths("multistep", tmp_path)
    agent = TrainAgent(config, save_path=exper)
    ds = SyntheticShapesDataset(
        task="train", primitives=["draw_polygon"],
        generation={"split_sizes": {"training": 8}},
        cache_dir=tmp_path / "synth", preprocessing={"resize": [48, 64]},
    )
    agent.train_loader = ds.batches(4, seed=0)
    agent.train()
    assert int(agent.state.step) == 8  # 2 dispatches × 4 steps
    assert agent.n_iter >= 8

    # interval events must fire even though n_iter advances by the
    # whole stride at once (window-crossing checks, not `% interval`,
    # which would never hit a multiple): tensorboard_interval=4 →
    # boundary labels 0 and 4, final checkpoint from the exit save
    import json

    rows = [json.loads(l) for l in open(exper.root / "metrics_train.jsonl")]
    logged_steps = {r["step"] for r in rows}
    assert {0, 4} <= logged_steps, logged_steps
    assert (exper.checkpoints / "superPointNet_8").exists(), list(
        exper.checkpoints.iterdir()
    )
