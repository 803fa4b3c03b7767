"""Deployment export — TPU-native equivalent of ``convert2script.py``.

The reference TorchScript-exports ``SuperPointNet_gauss2_ssmall`` with
the semantic head removed for its SLAM front-end
(``convert2script.py:1-13``, ``SuperPointNet_gauss2_ssmall.removeSem``).
The JAX-native deployment artifact is serialized StableHLO via
``jax.export``: portable, loadable from C++ (PJRT) or Python, with the
weights baked in.

Usage:
  python -m ssp.cli.convert2script <config> <output.stablehlo> \
      [--height 240 --width 320 --batch 1] [--keep-sem]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp

from ssp.models import build_model
from ssp.train.checkpoint import load_checkpoint
from ssp.train.state import create_train_state
from ssp.utils.config import load_config

log = logging.getLogger(__name__)


def export_model(
    config: dict, out_path: Path, batch: int, height: int, width: int,
    keep_sem: bool = False,
) -> Path:
    from jax import export as jexport

    m = config["model"]
    params_cfg = dict(m.get("params") or {})
    model = build_model(m["name"], **params_cfg)
    state = create_train_state(model, jax.random.key(0), (1, height, width, 1))
    pretrained = config.get("pretrained") or m.get("pretrained")
    if pretrained:
        state = load_checkpoint(pretrained, state, mode="weights")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def fn(images):
        out = model.apply(variables, images, train=False)
        # SLAM deployment drops the semantic head (reference removeSem)
        if keep_sem and "sem" in out:
            return out["semi"], out["desc"], out["sem"]
        return out["semi"], out["desc"]

    spec = jax.ShapeDtypeStruct((batch, height, width, 1), jnp.float32)
    exported = jexport.export(jax.jit(fn))(spec)
    blob = exported.serialize()
    out_path = Path(out_path)
    out_path.write_bytes(blob)
    log.info("wrote %d bytes of StableHLO to %s", len(blob), out_path)
    return out_path


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("output")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--keep-sem", action="store_true")
    args = ap.parse_args()
    export_model(
        load_config(args.config), Path(args.output),
        args.batch, args.height, args.width, args.keep_sem,
    )


if __name__ == "__main__":
    main()
