"""Small utilities: config handling, logging, experiment paths."""

from ssp.utils.config import dict_update, load_config  # noqa: F401
from ssp.utils.experiment import ExperimentPaths, MetricsLogger  # noqa: F401
