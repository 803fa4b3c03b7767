"""Loss functions: detector CE, dense/sparse descriptor hinge, semantic
CE, Kendall multi-task uncertainty weighting."""

from ssp.losses.detector import detector_loss  # noqa: F401
from ssp.losses.descriptor_dense import descriptor_loss_dense  # noqa: F401
from ssp.losses.descriptor_sparse import descriptor_loss_sparse  # noqa: F401
from ssp.losses.semantic import semantic_loss, semantic_loss_coarse  # noqa: F401
from ssp.losses.multitask import init_etas, multi_task_loss  # noqa: F401
