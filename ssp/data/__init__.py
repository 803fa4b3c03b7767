"""Data layer: synthetic generation, dataset readers, the on-device
batch-preparation pipeline, and photometric augmentation.

Replaces the reference's ``datasets/`` package (torch ``Dataset`` +
CPU-worker augmentation).  Host code only decodes/resizes images and
pads keypoint lists to fixed shapes; all augmentation, homography
sampling/warping, and label construction run inside jitted programs on
device (``ssp.data.pipeline.prepare_batch``).
"""

from ssp.data.pipeline import pad_points, prepare_batch, splat_labels  # noqa: F401
