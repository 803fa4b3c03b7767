"""Device-resident corpus: on-device sampling + fused train dispatch.

Covers ssp/data/device_corpus.py and the TrainAgent corpus path — the
zero-host-transfer replacement for the streaming loader (tunnel
staging-buffer leak mitigation)."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from ssp.data.device_corpus import DeviceCorpus
from ssp.data.synthetic_dataset import SyntheticShapesDataset
from ssp.parallel import make_mesh
from ssp.train.trainer import TrainAgent
from ssp.utils.experiment import ExperimentPaths


def _tiny_dataset(tmp_path, hw=(48, 64), n=8):
    return SyntheticShapesDataset(
        task="train", primitives=["draw_polygon"],
        generation={"split_sizes": {"training": n}},
        cache_dir=tmp_path / "synth", preprocessing={"resize": list(hw)},
    )


class TestDeviceCorpus:
    def test_sample_rows_come_from_corpus(self, tmp_path):
        ds = _tiny_dataset(tmp_path)
        dc = DeviceCorpus.from_dataset(ds)
        batch = jax.jit(
            lambda c, k: dc.sample(c, k, 4)
        )(dc.arrays, jax.random.key(0))
        assert batch["image"].shape == (4, 48, 64)
        assert batch["image"].dtype == jnp.float32
        # every sampled row must be exactly one corpus row
        host_imgs = np.asarray(
            dc.arrays["image"], dtype=np.float32
        )
        if dc.arrays["image"].dtype == jnp.uint8:
            host_imgs = host_imgs / 255.0
        got = np.asarray(batch["image"])
        # XLA lowers /255 to multiply-by-reciprocal — allow 1 ulp
        for row in got:
            assert any(np.abs(row - h).max() < 1e-6 for h in host_imgs)

    def test_sampling_deterministic_in_key(self, tmp_path):
        ds = _tiny_dataset(tmp_path)
        dc = DeviceCorpus.from_dataset(ds)
        f = jax.jit(lambda c, k: dc.sample(c, k, 4))
        a = f(dc.arrays, jax.random.key(7))
        b = f(dc.arrays, jax.random.key(7))
        c = f(dc.arrays, jax.random.key(8))
        assert np.array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
        assert not np.array_equal(np.asarray(a["image"]), np.asarray(c["image"]))

    def test_uint8_quantization_only_when_exact(self):
        class Quantized:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                img = np.full((4, 4), i * 10, np.uint8).astype(np.float32) / 255.0
                return {"image": img,
                        "points": np.zeros((3, 2), np.float32),
                        "points_valid": np.zeros(3, bool)}

        dc = DeviceCorpus.from_dataset(Quantized())
        assert dc.arrays["image"].dtype == jnp.uint8

        class Floaty(Quantized):
            def __getitem__(self, i):
                s = super().__getitem__(i)
                s["image"] = s["image"] + 1e-3
                return s

        dc2 = DeviceCorpus.from_dataset(Floaty())
        assert dc2.arrays["image"].dtype == jnp.float32

        # forced quantization (training.device_corpus_quantize): stores
        # uint8 with <= 1/510 absolute error even for inexact floats
        dc3 = DeviceCorpus.from_dataset(Floaty(), quantize=True)
        assert dc3.arrays["image"].dtype == jnp.uint8
        batch = dc3.sample(dc3.arrays, jax.random.key(0), 2)
        assert batch["image"].dtype == jnp.float32
        src = np.stack([Floaty()[i]["image"] for i in range(2)])
        got = np.asarray(batch["image"])
        # sampling is random-with-replacement: compare each sampled row
        # to its best-matching source row
        err = max(
            min(np.abs(g - s).max() for s in src) for g in got
        )
        assert err <= (1.0 / 510.0) + 1e-6

    def test_max_bytes_guard(self, tmp_path):
        ds = _tiny_dataset(tmp_path)
        try:
            DeviceCorpus.from_dataset(ds, max_bytes=16)
        except ValueError as e:
            assert "streaming loader" in str(e)
        else:
            raise AssertionError("expected ValueError")


class TestTrainerCorpusPath:
    CONFIG = {
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
            "params": {},
            "batch_size": 8,
            "learning_rate": 0.01,
            "lambda_loss": 0,
        },
        "train_iter": 4,
        "validation_interval": 100,
        "tensorboard_interval": 2,
        "save_interval": 4,
        "steps_per_dispatch": 2,
    }

    def test_corpus_training_runs_on_mesh(self, tmp_path):
        import copy

        config = copy.deepcopy(self.CONFIG)
        config["model"]["params"] = {"dtype": jnp.float32}
        exper = ExperimentPaths("corpus_train", tmp_path)
        agent = TrainAgent(config, save_path=exper)
        assert int(np.prod(agent.mesh.devices.shape)) == 8  # virtual mesh
        ds = _tiny_dataset(tmp_path)
        agent.attach_device_corpus(ds)
        agent.train()
        assert int(agent.state.step) == 4
        rows = [json.loads(l) for l in open(exper.root / "metrics_train.jsonl")]
        assert rows and np.isfinite(rows[-1]["loss"])
        assert (exper.checkpoints / "superPointNet_4").exists()
