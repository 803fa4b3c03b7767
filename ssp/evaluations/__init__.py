"""Evaluation metrics: repeatability, homography estimation, matching
score, NN mAP.  Host-side numpy/cv2 by design — this is the eval
protocol and must match the reference's arithmetic
(``evaluations/detector_evaluation.py``, ``descriptor_evaluation.py``)."""

from ssp.evaluations.detector import compute_repeatability  # noqa: F401
from ssp.evaluations.descriptor import compute_homography  # noqa: F401
from ssp.evaluations.semantic import evaluate_semantic  # noqa: F401
