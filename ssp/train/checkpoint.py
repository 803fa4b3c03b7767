"""Checkpoint save/load via Orbax.

Reference behaviour (``utils/utils.py:134-150``,
``Train_model_frontend_all.py:422-439``): checkpoints under
``logs/<exp>/checkpoints/`` keyed by iteration, containing model +
optimizer state and the step counter.  Improvements over the reference:
the multi-task ηs are included (its TODO), and save/load filenames
actually agree (its ``load_checkpoint`` template never matched the
saved names — SURVEY.md §2.5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _state_payload(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "etas": state.etas,
        "opt_state": state.opt_state,
    }


def save_checkpoint(ckpt_dir: Path, state, step: int) -> Path:
    path = (Path(ckpt_dir) / f"superPointNet_{step}").absolute()
    with ocp.StandardCheckpointer() as ckptr:
        # force: a resumed run re-hits its own save points (e.g. the
        # checkpoint it was restored from) — overwrite, don't crash
        ckptr.save(path, _state_payload(jax.device_get(state)), force=True)
    return path


def latest_checkpoint(ckpt_dir: Path) -> Optional[Path]:
    ckpts = sorted(
        Path(ckpt_dir).glob("superPointNet_*"),
        key=lambda p: int(p.name.split("_")[-1]),
    )
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: Path, state, *, mode: str = "full", reset_iter: bool = False):
    """Restore into ``state``.  mode="weights" restores only
    params/batch_stats (the reference's pretrained-load path,
    ``utils/loader.py:165-198``); "full" restores optimizer + step too."""
    with ocp.StandardCheckpointer() as ckptr:
        payload = ckptr.restore(Path(path).absolute(), _state_payload(state))
    state = state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
    )
    if mode == "full":
        # Kendall etas travel with the optimizer state: a weights-only
        # load (fresh training from a pretrained net) starts from fresh
        # task weights, as the docstring promises
        state = state.replace(
            opt_state=payload["opt_state"], step=payload["step"],
            etas=payload["etas"],
        )
    if reset_iter:
        state = state.replace(step=np.zeros((), np.int32))
    return state
