"""Device-resident training corpus: upload once, sample on device.

The reference streams every batch host->device through its DataLoader
(``utils/loader.py:20-198``).  On this rig that is doubly wrong: the
tunnel's PJRT client leaks every host->device staging buffer (~1 host
batch of RSS per step — measured ~1.2 GB per 500 ``device_put`` calls
of a 2.5 MB array), so a 30k-iter run grows to ~55 GB RSS and drags the
whole host into swap (observed 148 it/s fresh-process vs 2-8 it/s at
50 GB RSS).  And even without the leak, per-step transfers serialize a
host round-trip into every dispatch.

For corpora that fit in HBM (synthetic-shapes at 120x160 is ~1 GB
fp32; COCO at 240x320 in uint8 is ~9 GB — chip-dependent) the
TPU-native answer is to keep the *dataset* on device: one upload at
startup, then every batch is an on-device gather driven by the step's
PRNG key.  Steady-state training does zero host->device transfers.

Sampling is uniform with replacement (per-step ``jax.random.randint``)
rather than the reference's epoch-reshuffle without replacement — a
documented deviation: over an infinite iterator the per-sample visit
distribution is identical, only the short-range "each epoch sees every
sample exactly once" guarantee is relaxed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssp.parallel.mesh import batch_sharding, replicate_sharding


class DeviceCorpus:
    """All samples of a dataset as device arrays + an in-jit sampler.

    ``arrays`` holds ``image`` [N, H, W] (uint8 if the host images are
    exactly 255-quantized, else float32), ``points`` [N, K, 2],
    ``points_valid`` [N, K] and optionally ``sem`` [N, H, W] — the same
    keys a host batch from ``ImageDataset.batches`` carries, minus the
    leading batch axis.  ``sample(key, b)`` is traceable: call it inside
    a jitted step with the corpus dict passed as a traced argument.
    """

    def __init__(self, arrays: Dict[str, jax.Array], n: int):
        self.arrays = arrays
        self.n = int(n)

    @classmethod
    def from_dataset(cls, dataset, mesh=None, max_bytes: int = 4 << 30,
                     quantize: bool = False) -> "DeviceCorpus":
        """Materialize ``dataset`` (any ``ImageDataset``) and upload.

        Images that are exact ``k/255`` grids are stored uint8 (4x
        smaller, bit-exact after the in-sampler ``/255``); synthetic
        float images stay float32 unless ``quantize=True`` forces the
        uint8 rounding (≤ 1/510 absolute pixel error — far below the
        photometric-augmentation noise floor).  The 4x matters beyond
        HBM: on this rig host→device bulk uploads run ~3 MB/s through
        the tunnel, so a 3.2 GB float corpus costs ~18 minutes of
        startup vs ~4.5 quantized.  Raises if the corpus would exceed
        ``max_bytes`` — fall back to the streaming loader then.
        """
        samples = [dataset[i] for i in range(len(dataset))]
        keys = [k for k in samples[0] if k != "name"]
        host = {k: np.stack([s[k] for s in samples]) for k in keys}
        img = host["image"]
        q = np.round(img * 255.0)
        if quantize or np.allclose(q / 255.0, img, atol=1e-7):
            host["image"] = np.clip(q, 0.0, 255.0).astype(np.uint8)
        nbytes = sum(v.nbytes for v in host.values())
        if nbytes > max_bytes:
            raise ValueError(
                f"corpus is {nbytes / 1e9:.1f} GB > max_bytes "
                f"{max_bytes / 1e9:.1f} GB; use the streaming loader"
            )
        if mesh is not None:
            rep = replicate_sharding(mesh)
            arrays = {k: jax.device_put(v, rep) for k, v in host.items()}
        else:
            arrays = {k: jnp.asarray(v) for k, v in host.items()}
        return cls(arrays, len(samples))

    def sample(self, corpus: Dict[str, jax.Array], key: jax.Array,
               batch_size: int, mesh=None) -> Dict[str, jax.Array]:
        """Gather a uniform batch on device (traceable).

        ``corpus`` is the traced-argument view of ``self.arrays`` (pass
        ``self.arrays`` into the jitted fn so the 1 GB corpus is an
        input buffer, not a baked-in constant).  With a mesh, the
        gathered batch is constrained to the data-axis sharding so the
        downstream step runs data-parallel off the replicated corpus.
        """
        idx = jax.random.randint(key, (batch_size,), 0, self.n)
        batch = {k: v[idx] for k, v in corpus.items()}
        if batch["image"].dtype == jnp.uint8:
            batch["image"] = batch["image"].astype(jnp.float32) / 255.0
        if mesh is not None and np.prod(mesh.devices.shape) > 1:
            shard = batch_sharding(mesh, axis=0)
            batch = {
                k: jax.lax.with_sharding_constraint(v, shard)
                for k, v in batch.items()
            }
        return batch
