"""Convert a reference PyTorch checkpoint into an ssp (orbax) checkpoint.

Usage:
  python -m ssp.cli.import_torch <ckpt.pth[.tar]> <out_dir> \
      [--model SuperPointNet_gauss2_ssmall] [--n-classes 133] \
      [--height 240 --width 320]

Reads the reference's ``.pth.tar`` training checkpoints or MagicLeap
``.pth`` state dicts (``models/model_wrap.py:84-123``), maps the tensors
onto the flax model (``ssp.models.weights``), and writes a standard ssp
checkpoint loadable by every CLI via ``pretrained:``.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import jax
import jax.numpy as jnp

from ssp.models import build_model
from ssp.models.weights import (
    import_torch_gauss2,
    import_torch_magicleap,
    load_torch_checkpoint,
)
from ssp.train.checkpoint import save_checkpoint
from ssp.train.state import create_train_state

log = logging.getLogger(__name__)


def import_checkpoint(
    src: Path, out_dir: Path, model_name: str, n_classes: int, hw
) -> Path:
    sd, n_iter = load_torch_checkpoint(str(src))
    if model_name == "SuperPointNet_pretrained":
        params, stats = import_torch_magicleap(sd)
    else:
        params, stats = import_torch_gauss2(sd)

    kw = {"n_classes": n_classes} if "ssmall" in model_name else {}
    model = build_model(model_name, **kw)
    state = create_train_state(model, jax.random.key(0), (1, *hw, 1))

    # verify tree compatibility before writing anything
    ref_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(state.params)[0]}
    got_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    missing = ref_paths - got_paths
    extra = got_paths - ref_paths
    if missing or extra:
        raise ValueError(f"param tree mismatch: missing={sorted(missing)[:5]} "
                         f"extra={sorted(extra)[:5]}")

    state = state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, stats),
        step=jnp.asarray(n_iter, jnp.int32),
    )
    path = save_checkpoint(out_dir, state, n_iter)
    log.info("wrote %s (n_iter=%d)", path, n_iter)
    return path


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out_dir")
    ap.add_argument("--model", default="SuperPointNet_gauss2_ssmall")
    ap.add_argument("--n-classes", type=int, default=133)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    args = ap.parse_args()
    import_checkpoint(
        Path(args.src), Path(args.out_dir), args.model, args.n_classes,
        (args.height, args.width),
    )


if __name__ == "__main__":
    main()
