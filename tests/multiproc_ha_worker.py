"""Worker for the multi-process HA-export dryrun (the production pod
export lane: `run_ha_export` with a process-spanning mesh).

Launched by ``tests/test_multiproc.py`` as N processes × 4 virtual CPU
devices: each process iterates the same deterministic image list,
stages only its local rows of every group
(``make_array_from_process_local_data``), the HA warp stack runs over
the global 8-device mesh, and each host writes the npz for its own
rows.  With ``nproc=1`` the same script is the single-process oracle —
file-for-file npz equality is asserted by the test (SURVEY §2.7
"HA warp stack sharded across devices").

Usage: python multiproc_ha_worker.py <proc_id> <nproc> <coordinator> <out_dir>
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, out_dir = sys.argv[3], sys.argv[4]

    import jax

    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc,
            process_id=proc_id,
        )
    import jax.numpy as jnp

    from ssp.export.homography_adaptation import make_ha_fn, run_ha_export
    from ssp.models import build_model
    from ssp.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh()

    H, W = 48, 64
    model = build_model("SuperPointNet_gauss2", dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, H, W, 1), jnp.float32), train=False
    )
    ha = make_ha_fn(model.apply, variables, num_h=4, top_k=24,
                    conf_thresh=0.0, use_twopass=False)

    rng = np.random.default_rng(5)
    # 12 images, group 8 → one full group + one ragged group (tests the
    # padded-row drop on the multi-host path)
    images = [(f"img{i:03d}", rng.uniform(size=(H, W)).astype(np.float32))
              for i in range(12)]
    n = run_ha_export(ha, images, pathlib.Path(out_dir), seed=3, group=8,
                      mesh=mesh, depth=1)
    print(f"proc {proc_id}: wrote {n}")


if __name__ == "__main__":
    main()
