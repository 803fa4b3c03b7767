"""Pallas TPU kernels for the hot post-processing ops."""

from ssp.kernels.nms_pallas import nms_pallas  # noqa: F401
