"""Training: state, pjit step, LR schedule, checkpointing, agents."""

from ssp.train.lr import polynomial_decay_schedule  # noqa: F401
from ssp.train.state import TrainState, create_train_state  # noqa: F401
from ssp.train.step import make_train_step  # noqa: F401
