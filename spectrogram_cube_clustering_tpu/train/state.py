"""Train state construction.

Optimizer parity: the reference uses torch Adam with default betas/(eps)
(production.py:167); optax.adam defaults match (b1=0.9, b2=0.999, eps=1e-8).
"""

from __future__ import annotations

import functools

import jax
import optax
from flax.training import train_state


@functools.lru_cache(maxsize=32)
def _jitted_maker(model, lr: float):
    """One jitted constructor per (model, lr): building a fresh jax.jit
    wrapper on every create_train_state call retraced the whole
    init+optimizer program each time — hp sweeps and the test suite call
    this hundreds of times. Flax modules are hashable frozen dataclasses,
    so (model, lr) keys the cache; jit's own signature cache then handles
    differing sample-input shapes. Bounded (LRU 32): each entry pins its
    jit wrapper + compiled executables + model instance for the process
    lifetime, and a long sweep over many lr values must not accumulate
    them without eviction."""

    def _make(rng, x):
        params = model.init(rng, x)["params"]
        return train_state.TrainState.create(
            apply_fn=model.apply, params=params, tx=optax.adam(lr)
        )

    return jax.jit(_make)


def create_train_state(
    model, rng: jax.Array, sample_input, lr: float
) -> train_state.TrainState:
    # The whole construction (flax init + optax zeros) runs as ONE jitted
    # program: eager init issues a dispatch per layer/opt-state leaf, and
    # through this environment's remote-TPU tunnel (~100 ms RTT per
    # dispatch on bad days) that turned state creation into ~30 s of the
    # bench's time-to-first-metric. Values are identical — JAX PRNG is
    # deterministic under jit. apply_fn/tx live in the TrainState's
    # static metadata, so returning it from jit is fine.
    return _jitted_maker(model, float(lr))(rng, sample_input)
