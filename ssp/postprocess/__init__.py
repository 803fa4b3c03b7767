"""Device-side post-processing: heatmap → fixed-K keypoints + descriptors."""

from ssp.postprocess.nms import simple_nms  # noqa: F401
from ssp.postprocess.points import (  # noqa: F401
    extract_keypoints,
    sample_descriptors,
    soft_argmax_refine,
)
from ssp.postprocess.tracker import PointTracker, nn_match_two_way  # noqa: F401
