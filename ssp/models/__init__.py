"""Flax model zoo — registry names match the reference's model strings."""

from ssp.models.superpoint import (  # noqa: F401
    SuperPointGauss2,
    SuperPointMagicLeap,
    build_model,
)
from ssp.models.subpixel import SubpixelNet  # noqa: F401
