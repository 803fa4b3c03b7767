"""Import PyTorch reference checkpoints into flax params.

The reference stores ``.pth.tar`` dicts with ``model_state_dict``
(training checkpoints) or raw state dicts (``.pth``, MagicLeap weights)
— ``models/model_wrap.py:84-123``.  This maps those tensors onto our
flax trees so published weights can be evaluated for parity.

Layout conversions: conv [O, I, kh, kw] → [kh, kw, I, O]; BatchNorm
weight/bias → scale/bias params, running mean/var → batch_stats.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


# torch prefix → (our module path, has_bn)
_GAUSS2_BLOCKS = {
    "inc.conv.conv": ("inc",),
    "down1.mpconv.1.conv": ("down1",),
    "down2.mpconv.1.conv": ("down2",),
    "down3.mpconv.1.conv": ("down3",),
}
_HEADS = {
    # torch conv / bn name pairs → our ConvBNRelu module name
    ("convPa", "bnPa"): "convPa",
    ("convPb", "bnPb"): "convPb",
    ("convDa", "bnDa"): "convDa",
    ("convDb", "bnDb"): "convDb",
    ("convDS", "bnS1"): "convDS",
}


def import_torch_gauss2(state_dict: Dict[str, Any]):
    """Reference ``SuperPointNet_gauss2[_ssmall]`` state dict →
    (params, batch_stats) matching ``ssp.models.SuperPointGauss2``."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def bn(dst_path, prefix):
        _set(params, (*dst_path, "scale"), sd[f"{prefix}.weight"])
        _set(params, (*dst_path, "bias"), sd[f"{prefix}.bias"])
        _set(stats, (*dst_path, "mean"), sd[f"{prefix}.running_mean"])
        _set(stats, (*dst_path, "var"), sd[f"{prefix}.running_var"])

    # encoder double-convs: Sequential indices 0/1 (conv/bn) and 3/4
    for tprefix, (mod,) in _GAUSS2_BLOCKS.items():
        for cbr, (ci, bi) in (("ConvBNRelu_0", (0, 1)), ("ConvBNRelu_1", (3, 4))):
            _set(params, (mod, cbr, "Conv_0", "kernel"), _conv(sd[f"{tprefix}.{ci}.weight"]))
            _set(params, (mod, cbr, "Conv_0", "bias"), sd[f"{tprefix}.{ci}.bias"])
            bn((mod, cbr, "BatchNorm_0"), f"{tprefix}.{bi}")

    for (conv_name, bn_name), mod in _HEADS.items():
        if f"{conv_name}.weight" not in sd:
            continue  # semantic head absent in the plain model
        _set(params, (mod, "Conv_0", "kernel"), _conv(sd[f"{conv_name}.weight"]))
        _set(params, (mod, "Conv_0", "bias"), sd[f"{conv_name}.bias"])
        bn((mod, "BatchNorm_0"), bn_name)

    if "convSout.weight" in sd:
        _set(params, ("convSout", "kernel"), _conv(sd["convSout.weight"]))
        _set(params, ("convSout", "bias"), sd["convSout.bias"])

    return params, stats


def export_torch_gauss2(params: Dict[str, Any], batch_stats: Dict[str, Any]):
    """Inverse of :func:`import_torch_gauss2`: flax
    ``SuperPointGauss2`` trees → a reference-layout state dict (torch
    tensor names of ``models/SuperPointNet_gauss2_ssmall.py:17-99``).

    Used by the dual-stack parity sweep (``scripts/parity_sweep.py``)
    to run one trained checkpoint through both the ssp pipeline and a
    torch twin with reference semantics."""

    def _get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    sd: Dict[str, np.ndarray] = {}

    def conv(dst, path):
        # [kh, kw, I, O] → [O, I, kh, kw]
        sd[f"{dst}.weight"] = np.transpose(_get(params, (*path, "kernel")), (3, 2, 0, 1))
        sd[f"{dst}.bias"] = _get(params, (*path, "bias"))

    def bn(dst, path):
        sd[f"{dst}.weight"] = _get(params, (*path, "scale"))
        sd[f"{dst}.bias"] = _get(params, (*path, "bias"))
        sd[f"{dst}.running_mean"] = _get(batch_stats, (*path, "mean"))
        sd[f"{dst}.running_var"] = _get(batch_stats, (*path, "var"))

    for tprefix, (mod,) in _GAUSS2_BLOCKS.items():
        for cbr, (ci, bi) in (("ConvBNRelu_0", (0, 1)), ("ConvBNRelu_1", (3, 4))):
            conv(f"{tprefix}.{ci}", (mod, cbr, "Conv_0"))
            bn(f"{tprefix}.{bi}", (mod, cbr, "BatchNorm_0"))

    for (conv_name, bn_name), mod in _HEADS.items():
        if mod not in params:
            continue  # semantic head absent in the plain model
        conv(conv_name, (mod, "Conv_0"))
        bn(bn_name, (mod, "BatchNorm_0"))

    if "convSout" in params:
        conv("convSout", ("convSout",))

    return sd


def import_torch_magicleap(state_dict: Dict[str, Any]):
    """MagicLeap ``superpoint_v1.pth`` → ``SuperPointMagicLeap`` params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    for name in (
        "conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
        "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb",
    ):
        _set(params, (name, "kernel"), _conv(sd[f"{name}.weight"]))
        _set(params, (name, "bias"), sd[f"{name}.bias"])
    return params, {}


def load_torch_checkpoint(path: str):
    """Read a reference checkpoint file (host-side torch CPU) and return
    (state_dict, n_iter)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model_state_dict" in payload:
        return (
            {k: v.numpy() for k, v in payload["model_state_dict"].items()},
            int(payload.get("n_iter", 0)),
        )
    if isinstance(payload, dict) and any(
        k.startswith("model_") and isinstance(payload[k], dict) for k in payload
    ):
        # Sener split-model format: {model_enc, model_semi, model_desc,
        # model_sem} submodule state dicts whose layer names match the
        # joint model's (reference models/senner_models.py:109-123, used
        # as load fallback at Train_model_frontend_all.py:243-255) —
        # merge them into one flat state dict.
        merged: Dict[str, Any] = {}
        for k, sub in payload.items():
            if k.startswith("model_") and isinstance(sub, dict):
                merged.update({n: v.numpy() for n, v in sub.items()})
        return merged, int(payload.get("n_iter", 0))
    return ({k: v.numpy() for k, v in payload.items()}, 0)
