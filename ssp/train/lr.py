"""Polynomial LR decay.

The reference pulls ``PolynomialLRDecay(max_decay_steps=max_iter,
end_learning_rate=0.001, power=2.0)`` from the external
``torch_poly_lr_decay`` package (``Train_model_frontend_all.py:17,273``);
here it's just an optax schedule:

  lr(t) = (lr₀ − lr_end) · (1 − min(t, T)/T)^p + lr_end
"""

from __future__ import annotations

import optax


def polynomial_decay_schedule(
    init_lr: float,
    max_steps: int,
    end_lr: float = 0.001,
    power: float = 2.0,
) -> optax.Schedule:
    return optax.polynomial_schedule(
        init_value=init_lr,
        end_value=end_lr,
        power=power,
        transition_steps=max_steps,
    )
