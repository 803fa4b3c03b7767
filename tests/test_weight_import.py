"""Torch → flax weight import: numerical forward parity.

The torch twin below re-expresses the reference architecture spec
(``models/SuperPointNet_gauss2_ssmall.py:17-99``) as the test oracle;
outputs of the imported flax model must match it to fp32 conv accuracy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from ssp.models import build_model  # noqa: E402
from ssp.models.weights import import_torch_gauss2  # noqa: E402


class TorchOracle(tnn.Module):
    """Reference-architecture twin (BN-then-ReLU, L2-norm descriptors)."""

    def __init__(self, semantic=False, n_classes=7):
        super().__init__()
        self.semantic = semantic

        def double(cin, cout):
            return tnn.Sequential(
                tnn.Conv2d(cin, cout, 3, padding=1), tnn.BatchNorm2d(cout),
                tnn.ReLU(inplace=True),
                tnn.Conv2d(cout, cout, 3, padding=1), tnn.BatchNorm2d(cout),
                tnn.ReLU(inplace=True),
            )

        class Inc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Module()
                self.conv.conv = double(1, 64)

            def forward(self, x):
                return self.conv.conv(x)

        class Down(tnn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.mpconv = tnn.Sequential(
                    tnn.MaxPool2d(2), tnn.Module()
                )
                self.mpconv[1].conv = double(cin, cout)

            def forward(self, x):
                x = self.mpconv[0](x)
                return self.mpconv[1].conv(x)

        self.inc = Inc()
        self.down1 = Down(64, 64)
        self.down2 = Down(64, 128)
        self.down3 = Down(128, 128)
        self.relu = tnn.ReLU(inplace=True)
        self.convPa = tnn.Conv2d(128, 256, 3, padding=1)
        self.bnPa = tnn.BatchNorm2d(256)
        self.convPb = tnn.Conv2d(256, 65, 1)
        self.bnPb = tnn.BatchNorm2d(65)
        self.convDa = tnn.Conv2d(128, 256, 3, padding=1)
        self.bnDa = tnn.BatchNorm2d(256)
        self.convDb = tnn.Conv2d(256, 256, 1)
        self.bnDb = tnn.BatchNorm2d(256)
        if semantic:
            self.convDS = tnn.Conv2d(128, 256, 3, padding=1)
            self.bnS1 = tnn.BatchNorm2d(256)
            self.convSout = tnn.Conv2d(256, n_classes, 1)

    def forward(self, x):
        hw = x.shape[2:]
        x = self.inc(x)
        x = self.down1(x)
        x = self.down2(x)
        feat = self.down3(x)
        semi = self.bnPb(self.convPb(self.relu(self.bnPa(self.convPa(feat)))))
        desc = self.bnDb(self.convDb(self.relu(self.bnDa(self.convDa(feat)))))
        desc = desc / desc.norm(p=2, dim=1, keepdim=True)
        out = {"semi": semi, "desc": desc}
        if self.semantic:
            sem = self.convSout(self.relu(self.bnS1(self.convDS(feat))))
            out["sem"] = tF.interpolate(sem, hw, mode="bilinear", align_corners=False)
        return out


def _randomize_bn_stats(model):
    rng = np.random.default_rng(0)
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.copy_(torch.tensor(rng.normal(0, 0.2, m.num_features), dtype=torch.float32))
            m.running_var.copy_(torch.tensor(rng.uniform(0.5, 1.5, m.num_features), dtype=torch.float32))


@pytest.mark.parametrize("semantic", [False, True])
def test_forward_parity(semantic):
    torch.manual_seed(0)
    oracle = TorchOracle(semantic=semantic)
    with torch.no_grad():
        _randomize_bn_stats(oracle)
    oracle.eval()

    x = np.random.default_rng(1).uniform(size=(1, 1, 32, 48)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x))

    params, stats = import_torch_gauss2(
        {k: v.numpy() for k, v in oracle.state_dict().items()}
    )
    name = "SuperPointNet_gauss2_ssmall" if semantic else "SuperPointNet_gauss2"
    kw = {"n_classes": 7} if semantic else {}
    model = build_model(name, dtype=jnp.float32, **kw)
    got = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )

    np.testing.assert_allclose(
        np.asarray(got["semi"]).transpose(0, 3, 1, 2), want["semi"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["desc"]).transpose(0, 3, 1, 2), want["desc"].numpy(), atol=2e-4
    )
    if semantic:
        np.testing.assert_allclose(
            np.asarray(got["sem"]).transpose(0, 3, 1, 2), want["sem"].numpy(), atol=2e-3
        )


def test_import_cli_roundtrip(tmp_path):
    """Torch ckpt → import CLI → orbax checkpoint → load → same outputs."""
    torch.manual_seed(1)
    oracle = TorchOracle(semantic=False)
    oracle.eval()

    ckpt = tmp_path / "ref.pth.tar"
    torch.save({"model_state_dict": oracle.state_dict(), "n_iter": 123}, ckpt)

    from ssp.cli.import_torch import import_checkpoint
    from ssp.train.checkpoint import load_checkpoint
    from ssp.train.state import create_train_state

    out = import_checkpoint(ckpt, tmp_path / "ck", "SuperPointNet_gauss2", 133, (32, 48))
    assert out.name == "superPointNet_123"

    model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
    state = create_train_state(model, jax.random.key(0), (1, 32, 48, 1))
    state = load_checkpoint(out, state, mode="weights")
    x = np.random.default_rng(2).uniform(size=(1, 1, 32, 48)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x))
    got = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(got["semi"]).transpose(0, 3, 1, 2), want["semi"].numpy(), atol=2e-4
    )


def test_sener_split_checkpoint_import(tmp_path):
    """Sener split-model format: {model_enc, model_semi, model_desc,
    model_sem} submodule state dicts (reference senner_models.py:109-123,
    load fallback Train_model_frontend_all.py:243-255) must merge and
    import identically to the joint state dict."""
    torch.manual_seed(2)
    oracle = TorchOracle(semantic=True)
    oracle.eval()
    sd = oracle.state_dict()

    def sub(prefixes):
        return {k: v.clone() for k, v in sd.items()
                if k.split(".")[0] in prefixes}

    payload = {
        "model_enc": sub({"inc", "down1", "down2", "down3"}),
        "model_semi": sub({"convPa", "bnPa", "convPb", "bnPb"}),
        "model_desc": sub({"convDa", "bnDa", "convDb", "bnDb"}),
        "model_sem": sub({"convDS", "bnS1", "convSout"}),
        "n_iter": 7,
    }
    ckpt = tmp_path / "sener.pth.tar"
    torch.save(payload, ckpt)

    from ssp.models.weights import load_torch_checkpoint

    merged, n_iter = load_torch_checkpoint(ckpt)
    assert n_iter == 7
    assert set(merged) == set(sd.keys())
    p1, s1 = import_torch_gauss2(merged)
    p2, s2 = import_torch_gauss2({k: v.numpy() for k, v in sd.items()})
    flat1 = jax.tree_util.tree_leaves(p1) + jax.tree_util.tree_leaves(s1)
    flat2 = jax.tree_util.tree_leaves(p2) + jax.tree_util.tree_leaves(s2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(a, b)
