"""ssp — Semantic SuperPoint, TPU-native.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Gabriel-SGama/Semantic-SuperPoint (PyTorch): self-supervised keypoint
detection + description with an optional semantic-segmentation head,
trained with Kendall multi-task uncertainty weighting.

Design principles (TPU-first, not a port):
  * NHWC layout everywhere; bfloat16 matmul path; static shapes.
  * Keypoints are fixed-K ``(score, x, y)`` arrays with validity masks —
    never ragged lists.
  * Augmentation, homography sampling/warping, label construction, and
    the full homography-adaptation export run inside single jitted
    programs driven by JAX PRNG keys.
  * Scaling via ``jax.sharding.Mesh`` + ``NamedSharding`` (data-parallel
    over ICI), not host-side DataParallel.

The public config-driven API (YAML schema, dataset/model/agent names)
mirrors the reference so its users can switch over; see ``ssp.registry``.
"""

__version__ = "0.1.0"

# numpy madvise(HUGEPAGE)s every allocation >=4 MB; on VMs whose memory
# faults through a balloon (this rig's firecracker kernel) hugepage
# first-touch runs at ~7 MB/s — a fresh 400 MB array takes ~40 s to
# fill (measured; 0.2 s with madvise off, a 200x difference that
# dominated dataset load + corpus staging).  Disable it at import time;
# set SSP_NUMPY_HUGEPAGE=1 to keep numpy's default on bare metal.
import os as _os

if _os.environ.get("SSP_NUMPY_HUGEPAGE", "0") != "1":
    try:
        try:
            from numpy._core.multiarray import (
                _set_madvise_hugepage as _smh,
            )
        except ImportError:  # numpy < 2
            from numpy.core.multiarray import (
                _set_madvise_hugepage as _smh,
            )
        _smh(False)
    except Exception:  # pragma: no cover - numpy internals moved
        pass

from ssp import registry  # noqa: F401

# Populate the registries (import side effects register the names the
# reference's configs use: datasets, models, agents).
from ssp import models as _models  # noqa: F401, E402
from ssp.data import coco as _coco  # noqa: F401, E402
from ssp.data import hpatches as _hpatches  # noqa: F401, E402
from ssp.data import kitti as _kitti  # noqa: F401, E402
from ssp.data import synthetic_dataset as _synth  # noqa: F401, E402
from ssp.train import subpixel_agent as _subpixel_agent  # noqa: F401, E402
from ssp.train import trainer as _trainer  # noqa: F401, E402
from ssp.train import val_agent as _val_agent  # noqa: F401, E402
