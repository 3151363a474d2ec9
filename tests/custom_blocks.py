"""A user-defined module OUTSIDE the registry, for the dotted-path
config-instantiation tests (Hydra ``_target_`` parity —
``notorch_tpu/cli/registry.py``). Deliberately never imported by the
package: the point is that a config can name it anyway."""

import flax.linen as nn
import jax.numpy as jnp


class ScaledHead(nn.Module):
    """y = scale * Dense(x) — trivially distinguishable from the stock MLP."""

    output_dim: int = 1
    scale: float = 2.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        return self.scale * nn.Dense(self.output_dim, name="head")(x)
