"""LR schedule, cell masks, precision/recall helpers."""

import numpy as np
import jax.numpy as jnp
import pytest

from ssp.train.lr import polynomial_decay_schedule
from ssp.train.step import cell_valid_mask
from ssp.train.trainer import precision_recall


class TestPolyLR:
    def test_decay_shape(self):
        # reference: PolynomialLRDecay(max_decay_steps=T, end=0.001, p=2)
        sched = polynomial_decay_schedule(0.0025, 1000, end_lr=0.001, power=2.0)
        assert float(sched(0)) == pytest.approx(0.0025)
        mid = float(sched(500))
        want_mid = (0.0025 - 0.001) * (1 - 0.5) ** 2 + 0.001
        assert mid == pytest.approx(want_mid, rel=1e-5)
        assert float(sched(1000)) == pytest.approx(0.001)
        assert float(sched(5000)) == pytest.approx(0.001)  # clamps past T

    def test_no_decay_when_end_equals_init(self):
        # the Sp config uses lr=0.001 with end 0.001 — constant
        sched = polynomial_decay_schedule(0.001, 1000)
        assert float(sched(700)) == pytest.approx(0.001)


class TestCellMask:
    def test_all_or_nothing_cells(self):
        mask = np.ones((1, 16, 16), np.float32)
        mask[0, 3, 3] = 0.0  # one dead pixel in cell (0,0)
        cm = np.asarray(cell_valid_mask(jnp.asarray(mask)))
        assert cm.shape == (1, 2, 2)
        assert cm[0, 0, 0] == 0.0  # cell with any invalid pixel is invalid
        assert cm[0, 1, 1] == 1.0


class TestPrecisionRecall:
    def test_perfect(self):
        heat = np.zeros((8, 8), np.float32)
        heat[2, 2] = 0.5
        labels = np.zeros((8, 8), np.float32)
        labels[2, 2] = 1.0
        p, r = precision_recall(heat, labels)
        assert p == 1.0 and r == 1.0

    def test_spurious(self):
        heat = np.full((8, 8), 0.5, np.float32)
        labels = np.zeros((8, 8), np.float32)
        labels[2, 2] = 1.0
        p, r = precision_recall(heat, labels)
        assert r == 1.0 and p == pytest.approx(1 / 64)


class TestRssWatchdog:
    def _config(self, budget):
        import jax.numpy as jnp

        return {
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
            "train_iter": 6,
            "validation_interval": 1000,
            "tensorboard_interval": 2,
            "save_interval": 1000,
            "rss_budget_mb": budget,
        }

    def _loader(self, tmp_path):
        from ssp.data.synthetic_dataset import SyntheticShapesDataset

        ds = SyntheticShapesDataset(
            task="train", primitives=["draw_polygon"],
            generation={"split_sizes": {"training": 8}},
            cache_dir=tmp_path / "synth", preprocessing={"resize": [48, 64]},
        )
        return ds.batches(4, seed=0)

    def test_budget_stop_saves_checkpoint_and_raises(self, tmp_path):
        """Over-budget RSS → checkpoint + a clear error, not a silent
        OOM kill (the TPU-tunnel plugin leaks every host→device staging
        buffer; long runs need this or --max-restarts)."""
        from ssp.train.trainer import TrainAgent
        from ssp.utils.experiment import ExperimentPaths

        exper = ExperimentPaths("watchdog", tmp_path)
        agent = TrainAgent(self._config(budget=1), save_path=exper)
        agent.train_loader = self._loader(tmp_path)
        with pytest.raises(RuntimeError, match="RSS .* exceeds"):
            agent.train()
        assert any(exper.checkpoints.iterdir())

    def test_budget_disabled_runs_to_completion(self, tmp_path):
        from ssp.train.trainer import TrainAgent
        from ssp.utils.experiment import ExperimentPaths

        exper = ExperimentPaths("watchdog_off", tmp_path)
        agent = TrainAgent(self._config(budget=0), save_path=exper)
        agent.train_loader = self._loader(tmp_path)
        agent.train()
        assert int(agent.state.step) == 6


class TestWatchedCall:
    def test_kills_hung_child(self, tmp_path):
        """A child that never writes metrics is killed after stall_s
        (the tunnel-outage hang mode) and reports rc 124."""
        import sys
        import time

        from ssp.cli.train import watched_call
        from ssp.utils.experiment import ExperimentPaths

        exper = ExperimentPaths("hang", tmp_path)
        t0 = time.time()
        rc = watched_call(
            [sys.executable, "-c", "import time; time.sleep(600)"],
            exper, stall_s=1.0, poll_s=0.2,
        )
        assert rc == 124
        assert time.time() - t0 < 60

    def test_progressing_child_not_killed(self, tmp_path):
        """A child that keeps touching metrics_train.jsonl outlives a
        stall budget shorter than its runtime."""
        import sys

        from ssp.cli.train import watched_call
        from ssp.utils.experiment import ExperimentPaths

        exper = ExperimentPaths("alive", tmp_path)
        exper.root.mkdir(parents=True, exist_ok=True)
        # child lives ~8 s (past stall_s=6) but writes every 0.2 s — only
        # the progress-mtime reset keeps it alive.  Margins are wide (30×
        # the write interval) because this 1-core host can starve a child
        # for seconds when other processes compete; the first write lands
        # before the sleep so interpreter startup never eats the budget.
        prog = (
            "import pathlib, time\n"
            f"p = pathlib.Path({str(exper.root / 'metrics_train.jsonl')!r})\n"
            "for i in range(40):\n"
            "    p.write_text(str(i))\n"
            "    time.sleep(0.2)\n"
        )
        rc = watched_call(
            [sys.executable, "-c", prog], exper, stall_s=6.0, poll_s=0.2
        )
        assert rc == 0
