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


def _keypath_str(kp) -> str:
    parts = []
    for k in kp:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def save_weights_npz(path: Path, state, dtype=np.float16) -> Path:
    """Compact committed-artifact weights format: params + batch_stats
    only, float leaves stored at ``dtype`` (fp16 keeps more mantissa
    than the bf16 the fast forward already runs at), compressed npz.

    Purpose: the validation tests that need a *trained* model
    (dual-stack parity, sequence consistency, known-H oracle) gate on a
    checkpoint artifact; full orbax checkpoints are ~15-18 MB of mostly
    optimizer state, which the round-3 advisor rejected from git.  This
    stores the ~2-3 MB that actually matters, mirroring the reference's
    committed-golden-artifact pattern (``logs/*/checkpoints/``)."""
    flat = {}
    for prefix, tree in (("params", state.params),
                         ("batch_stats", state.batch_stats)):
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            arr = np.asarray(jax.device_get(leaf))
            if arr.dtype in (np.float32, np.float64):
                arr = arr.astype(dtype)
            flat[f"{prefix}/{_keypath_str(kp)}"] = arr
    path = Path(path)
    with open(path, "wb") as f:
        np.savez_compressed(f, **flat)
    return path


def load_weights_npz(path: Path, state):
    """Restore a ``save_weights_npz`` artifact into ``state`` (weights
    only, cast back to each leaf's dtype).  Missing/extra keys raise —
    an arch mismatch should fail loudly, not zero-init silently."""
    with np.load(Path(path)) as data:
        seen = set()

        def restore(prefix, tree):
            pairs, treedef = jax.tree_util.tree_flatten_with_path(tree)
            leaves = []
            for kp, leaf in pairs:
                key = f"{prefix}/{_keypath_str(kp)}"
                seen.add(key)
                ref = np.asarray(leaf)
                leaves.append(np.asarray(data[key]).astype(ref.dtype))
            return jax.tree_util.tree_unflatten(treedef, leaves)

        state = state.replace(
            params=restore("params", state.params),
            batch_stats=restore("batch_stats", state.batch_stats),
        )
        extra = set(data.files) - seen
    if extra:
        raise ValueError(f"npz checkpoint has unconsumed keys: {sorted(extra)[:5]}")
    return state


def load_checkpoint(path: Path, state, *, mode: str = "full", reset_iter: bool = False):
    """Restore into ``state``.  mode="weights" restores only
    params/batch_stats (the reference's pretrained-load path,
    ``utils/loader.py:165-198``); "full" restores optimizer + step too.
    A ``.npz`` path is the compact committed weights artifact
    (``save_weights_npz``) and implies weights-only."""
    if str(path).endswith(".npz"):
        state = load_weights_npz(path, state)
        if reset_iter:
            state = state.replace(step=np.zeros((), np.int32))
        return state
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
