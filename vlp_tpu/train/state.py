"""Train state: the functional replacement for Lightning's module state."""
from __future__ import annotations

from typing import Any, Dict

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    extra_vars: Dict[str, Any]  # batch_stats etc.
    opt_state: optax.OptState
    rng: jax.Array

    @classmethod
    def create(cls, params, extra_vars, tx: optax.GradientTransformation,
               rng: jax.Array) -> "TrainState":
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   extra_vars=extra_vars, opt_state=tx.init(params), rng=rng)
