"""Neural networks for gridworld learners — MXU-path models.

The reference has no neural nets (SURVEY.md §2.2); the actor-critic learner
comes from the BASELINE north star ("sharded tabular/actor-critic learner
via all-reduce"). Design notes (TPU-first):

  * Observations are state indices; the network embeds them as
    one_hot(obs) @ table — an MXU matmul, NOT an nn.Embed gather. On TPU a
    dynamic gather is the slowest primitive in this whole framework
    (~565 µs per 64k lookups; docs/PERFORMANCE.md §2) while the (B, S)
    one-hot matmul rides the MXU with the rest of the MLP. Small discrete
    obs spaces (S = H·W ≤ a few thousand) make the one-hot cheap.
  * MLP trunk with separate policy/value heads; batch dims stay large in
    the trainers so XLA tiles cleanly onto the MXU.
  * Mixed precision: params live in f32, matmuls run in `compute_dtype`
    (default bf16 — the MXU's native width; f32 matmuls run at ~1/4 the
    rate on v5e and dominated the r2 PPO update, docs/PERFORMANCE.md §8).
    Heads cast back to f32 so losses/softmaxes/GAE stay full-precision.
  * Parameters are a plain flax pytree: replicated across the mesh by the
    distributed trainer, combined with psum'd grads (models.a2c).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ActorCritic(nn.Module):
    """One-hot-matmul embedding → MLP trunk → (policy logits, value).

    num_states — size of the discrete observation space (H·W).
    num_actions — policy head width.
    hidden — trunk layer widths.
    """

    num_states: int
    num_actions: int
    hidden: Sequence[int] = (128, 128)
    embed_dim: int = 64
    compute_dtype: str = "bfloat16"  # matmul dtype; params stay f32

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        cdt = jnp.dtype(self.compute_dtype)
        table = self.param(
            "embed",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
            (self.num_states, self.embed_dim),
        )
        x = jax.nn.one_hot(obs, self.num_states, dtype=cdt) @ table.astype(cdt)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, name=f"dense_{i}", dtype=cdt)(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_actions, name="policy_head", dtype=cdt)(x)
        value = nn.Dense(1, name="value_head", dtype=cdt)(x)[..., 0]
        return logits.astype(jnp.float32), value.astype(jnp.float32)
