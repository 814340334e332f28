"""Train state: params + BN batch stats + optimizer state."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

__all__ = ["TrainState"]


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )
