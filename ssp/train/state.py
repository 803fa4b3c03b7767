"""Train state: params + BN stats + multi-task ηs + optimizer state.

One flax struct holds everything the checkpoint needs — including the
Kendall ηs, fixing the reference's unsaved-etas bug
(``Train_model_heatmap_all.py:57`` TODO).  The Adam parameter set is the
union of network params and ηs, matching the reference's single
optimizer over ``net.parameters() ∪ multi_task_loss.parameters()``
(``Train_model_frontend_all.py:183-198``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ssp.losses.multitask import init_etas
from ssp.train.lr import polynomial_decay_schedule


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    etas: jnp.ndarray
    opt_state: Any
    apply_fn: Callable = flax.struct.field(pytree_node=False)
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads_params, grads_etas, new_batch_stats):
        updates, new_opt_state = self.tx.update(
            {"params": grads_params, "etas": grads_etas},
            self.opt_state,
            {"params": self.params, "etas": self.etas},
        )
        new = optax.apply_updates({"params": self.params, "etas": self.etas}, updates)
        return self.replace(
            step=self.step + 1,
            params=new["params"],
            batch_stats=new_batch_stats,
            etas=new["etas"],
            opt_state=new_opt_state,
        )


def create_train_state(
    model,
    key: jax.Array,
    input_shape,
    learning_rate: float = 0.001,
    max_steps: int = 200_000,
    end_lr: float = 0.001,
    lr_power: float = 2.0,
    tx: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    """Initialize params/BN stats and the Adam + poly-decay optimizer."""
    variables = model.init(key, jnp.zeros(input_shape, jnp.float32), train=True)
    if tx is None:
        schedule = polynomial_decay_schedule(learning_rate, max_steps, end_lr, lr_power)
        tx = optax.adam(schedule)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    etas = init_etas()
    opt_state = tx.init({"params": params, "etas": etas})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        etas=etas,
        opt_state=opt_state,
        apply_fn=model.apply,
        tx=tx,
    )
