"""Train state construction.

Optimizer parity: the reference uses torch Adam with default betas/(eps)
(production.py:167); optax.adam defaults match (b1=0.9, b2=0.999, eps=1e-8).
"""

from __future__ import annotations

import jax
import optax
from flax.training import train_state


def create_train_state(
    model, rng: jax.Array, sample_input, lr: float
) -> train_state.TrainState:
    params = model.init(rng, sample_input)["params"]
    return train_state.TrainState.create(
        apply_fn=model.apply, params=params, tx=optax.adam(lr)
    )
