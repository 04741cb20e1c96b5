"""Neural networks for gridworld learners — MXU-path models.

The reference has no neural nets (SURVEY.md §2.2); the actor-critic learner
comes from the BASELINE north star ("sharded tabular/actor-critic learner
via all-reduce"). Design notes (TPU-first):

  * Observations are state indices; the network embeds them with a learned
    embedding table (a gather — equivalent to one-hot × matrix but without
    materializing the (B, S) one-hot), then a small MLP trunk with separate
    policy/value heads. All matmuls carry `preferred_element_type=float32`
    accumulation semantics via flax defaults; batch dims stay large and
    divisible by 128 in the trainers so XLA tiles cleanly onto the MXU.
  * Parameters are a plain flax pytree: replicated across the mesh by the
    distributed trainer, combined with psum'd grads (models.a2c).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ActorCritic(nn.Module):
    """Embedding → MLP trunk → (policy logits, value).

    num_states — size of the discrete observation space (H·W).
    num_actions — policy head width.
    hidden — trunk layer widths.
    """

    num_states: int
    num_actions: int
    hidden: Sequence[int] = (128, 128)
    embed_dim: int = 64

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        x = nn.Embed(self.num_states, self.embed_dim, name="embed")(obs)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, name=f"dense_{i}")(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_actions, name="policy_head")(x)
        value = nn.Dense(1, name="value_head")(x)[..., 0]
        return logits, value
