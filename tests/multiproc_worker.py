"""Worker for the multi-process (DCN-path) correctness dryrun.

Launched by ``tests/test_multiproc.py`` as N separate processes, each
with 4 virtual CPU devices: initializes ``jax.distributed``, builds the
same deterministic global batch in every process, shards it over the
GLOBAL 8-device mesh via ``jax.make_array_from_process_local_data``,
runs one real train step (detector loss, gradient all-reduce spanning
processes), and writes the resulting loss + a param checksum to a file.
With ``nproc=1`` the same script is the single-process oracle — the
two outputs must match (SURVEY §2.7 multi-host DCN via
``jax.distributed``; the reference has no distributed backend at all).

Usage: python multiproc_worker.py <proc_id> <nproc> <coordinator> <out>
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, out = sys.argv[3], sys.argv[4]

    import jax

    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc,
            process_id=proc_id,
        )
    import jax.numpy as jnp

    from ssp.models import build_model
    from ssp.parallel.mesh import batch_sharding, make_mesh, replicate_sharding
    from ssp.train import create_train_state, make_train_step

    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh()

    B, H, W = 8, 32, 48
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(B, H, W, 1)).astype(np.float32)
    labels = (rng.uniform(size=(B, H, W, 1)) < 0.01).astype(np.float32)
    batch_np = {
        "image": images,
        "labels_2d": labels,
        "valid_mask": np.ones((B, H, W), np.float32),
    }

    sharding = batch_sharding(mesh)
    n_local = B // nproc
    lo = proc_id * n_local
    batch = {
        k: jax.make_array_from_process_local_data(
            sharding, v[lo:lo + n_local], global_shape=v.shape
        )
        for k, v in batch_np.items()
    }

    model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
    state = create_train_state(model, jax.random.key(0), (1, H, W, 1),
                               learning_rate=1e-3, max_steps=4)
    state = jax.device_put(state, replicate_sharding(mesh))

    train_step, _ = make_train_step(
        semantic=False, warped_pair=False, lambda_loss=0.0,
        multi_task=False, donate=False,
    )
    key = jax.random.key(7)
    state, metrics = train_step(state, batch, key)
    state, metrics = train_step(state, batch, key)

    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    # order-independent param checksum: sum of |params| (replicated)
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(float(jnp.sum(jnp.abs(x))) for x in leaves))

    if proc_id == 0:
        pathlib.Path(out).write_text(
            json.dumps({"loss": loss, "checksum": checksum}))


if __name__ == "__main__":
    main()
