"""Pure-JAX geometry core: homographies, warps, grid/label ops."""

from ssp.core.homography import (  # noqa: F401
    homography_from_corners,
    sample_homography,
    sample_homographies,
    scale_homography,
    warp_points,
)
from ssp.core.warp import (  # noqa: F401
    bilinear_sample,
    compute_valid_mask,
    erode_mask,
    inv_warp_image,
    nearest_sample,
)
from ssp.core.grid import (  # noqa: F401
    depth_to_space,
    flatten_detection,
    labels_to_cells,
    space_to_depth,
)
