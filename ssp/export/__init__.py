"""Export pipelines: homography-adaptation pseudo-labels, HPatches
keypoints/descriptors/matches, KITTI sequences."""

from ssp.export.homography_adaptation import (  # noqa: F401
    make_ha_fn,
    run_ha_export,
)
