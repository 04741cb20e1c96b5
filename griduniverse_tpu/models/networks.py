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
        # Embedding lookup: `one_hot(s) @ table`, routed through the
        # algos/td_fast.py hi/lo factorization when it SHRINKS the
        # materialized operand: with s = hi·L + lo, the lookup becomes a
        # (B, S/L) matmul against table.reshape(S/L, L·E) plus a tiny
        # lo-contraction — exact same math (one-hot products select exact
        # rows), but the biggest per-sample operand drops from S to
        # max(S/L, L·E) columns. r2 measured this SLOWER at embed_dim 64
        # (L·E = 256 = S: nothing shrinks, one extra materialization);
        # with the r3 default embed_dim 16 the operand drops 256 → 64
        # columns and the update's one-hot HBM traffic falls ~4×
        # (docs/PERFORMANCE.md §8.2). The plain one-hot stays for shapes
        # where the factorization can't win.
        lo_n = 4
        if (
            self.num_states % lo_n == 0
            and max(self.num_states // lo_n, lo_n * self.embed_dim)
            < self.num_states
        ):
            hi_n = self.num_states // lo_n
            p_hi = jax.nn.one_hot(obs // lo_n, hi_n, dtype=cdt)
            p_lo = jax.nn.one_hot(obs % lo_n, lo_n, dtype=cdt)
            y = (
                p_hi @ table.astype(cdt).reshape(hi_n, lo_n * self.embed_dim)
            ).reshape(*obs.shape, lo_n, self.embed_dim)
            x = jnp.sum(p_lo[..., None] * y, axis=-2)
        else:
            x = jax.nn.one_hot(obs, self.num_states, dtype=cdt) @ table.astype(cdt)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, name=f"dense_{i}", dtype=cdt)(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_actions, name="policy_head", dtype=cdt)(x)
        value = nn.Dense(1, name="value_head", dtype=cdt)(x)[..., 0]
        return logits.astype(jnp.float32), value.astype(jnp.float32)


class BatchedConvActorCritic(nn.Module):
    """Grid-observation actor-critic for PER-ENV levels — the trunk that
    lets one agent train across 64k distinct mazes (BASELINE configs 4+5
    composed; VERDICT r2 missing #1).

    Unlike ConvActorCritic (which bakes ONE shared level in as a static
    constant), the level enters at apply time as per-sample tile planes:
    `apply(params, obs, tiles)` with obs (...,) int32 state indices and
    tiles (Bl..., H, W, C) one-hot tile planes, where `Bl...` must equal a
    TRAILING suffix of obs's batch shape. The canonical case: obs (T, B)
    over a rollout with tiles (B, H, W, C) — each env keeps one level for
    the whole rollout, so the tile planes carry no time axis.

    TPU-first notes:
      * conv_0 is split exactly like ConvActorCritic: the tile planes
        convolve once PER LEVEL ROW (B samples), the agent plane once per
        (T, B) sample, summed pre-ReLU. With obs (T, B) and tiles (B, ...)
        this does 1/T-th of the naive tile-conv FLOPs and HBM traffic
        while keeping gradients exact (the broadcast's transpose sums the
        kernel gradient over T — the same math as convolving every
        sample).
      * Parameter tree is IDENTICAL to ConvActorCritic's (same names,
        same shapes), so params transfer between the shared-level and
        per-env-level trunks (tested equivalent on a shared level in
        tests/test_perenv_levels.py).
    """

    height: int
    width: int
    num_actions: int
    num_tile_types: int = 4
    channels: Sequence[int] = (32, 32)
    hidden: Sequence[int] = (128,)
    compute_dtype: str = "bfloat16"
    # Agent-plane lowering. The agent input is a ONE-HOT image, so its
    # conv output is just the flipped 3×3 kernel stamped around the agent
    # cell (VERDICT r3 weak #1):
    #   "stamp" (default) — precompute T = conv_0(identity images), an
    #     (S, S·ch0) table (~420 KB bf16 at 9×9/32ch; differentiable
    #     through the SAME conv_0_kernel param), then per sample
    #     y_agent = one_hot(p, S) @ T — ONE dense MXU matmul replacing a
    #     1-input-channel conv that tiles terribly (1/128 MXU lanes).
    #     Measured on TPU v5e, 64k 9×9 mazes, full PPO training
    #     (tools/conv_probe.py): 1.25M → 1.53M steps/s at ch32 (+22%),
    #     3.0M at ch16 — same math, float-level differences only.
    #   "conv" — the direct conv lowering (kept for A/B and parity tests).
    agent_plane: str = "stamp"

    # trainers key their wiring off this (models.a2c._tiles_for)
    needs_tiles = True

    @nn.compact
    def __call__(self, obs: jnp.ndarray, tiles: jnp.ndarray):
        if not self.channels:
            raise ValueError("BatchedConvActorCritic needs ≥1 conv layer")
        if self.agent_plane not in ("stamp", "conv"):
            raise ValueError(f"unknown agent_plane mode: {self.agent_plane!r}")
        cdt = jnp.dtype(self.compute_dtype)
        batch_shape = obs.shape
        lvl_shape = tiles.shape[:-3]
        if tiles.shape[-3:] != (self.height, self.width, self.num_tile_types):
            raise ValueError(
                f"tiles trailing dims {tiles.shape[-3:]} != "
                f"{(self.height, self.width, self.num_tile_types)}"
            )
        if lvl_shape != batch_shape[len(batch_shape) - len(lvl_shape):]:
            raise ValueError(
                f"tiles batch shape {lvl_shape} is not a trailing suffix "
                f"of obs batch shape {batch_shape}"
            )
        b = 1
        for d in batch_shape:
            b *= d
        nl = 1
        for d in lvl_shape:
            nl *= d
        s = self.height * self.width
        c = self.num_tile_types
        ch0 = self.channels[0]
        kernel = self.param(
            "conv_0_kernel", nn.initializers.lecun_normal(), (3, 3, c + 1, ch0)
        )
        k_bias = self.param("conv_0_bias", nn.initializers.zeros, (ch0,))
        dn = ("NHWC", "HWIO", "NHWC")
        y_tiles = jax.lax.conv_general_dilated(
            tiles.reshape(nl, self.height, self.width, c).astype(cdt),
            kernel[:, :, :c, :].astype(cdt), (1, 1), "SAME",
            dimension_numbers=dn,
        )  # (nl, H, W, ch0) — once per level row, broadcast over time
        p_hot = jax.nn.one_hot(obs.reshape(-1), s, dtype=cdt)
        if self.agent_plane == "stamp":
            # stamp table: row p = conv_0's response image to an agent at
            # cell p. S identity images through the conv (tiny, batch-
            # and loop-invariant given params — XLA hoists it out of
            # rollout scans), then the per-sample "conv" is a single
            # (B, S) @ (S, S·ch0) MXU matmul.
            eye_imgs = jnp.eye(s, dtype=cdt).reshape(
                s, self.height, self.width, 1
            )
            stamp = jax.lax.conv_general_dilated(
                eye_imgs, kernel[:, :, c:, :].astype(cdt), (1, 1), "SAME",
                dimension_numbers=dn,
            ).reshape(s, s * ch0)
            y_agent = (p_hot @ stamp).reshape(
                b, self.height, self.width, ch0
            )
        else:
            agent = p_hot.reshape(b, self.height, self.width, 1)
            y_agent = jax.lax.conv_general_dilated(
                agent, kernel[:, :, c:, :].astype(cdt), (1, 1), "SAME",
                dimension_numbers=dn,
            )
        y_sum = y_agent.reshape(
            *batch_shape, self.height, self.width, ch0
        ) + y_tiles.reshape(*lvl_shape, self.height, self.width, ch0)
        x = nn.relu(y_sum + k_bias.astype(cdt)).reshape(
            b, self.height, self.width, ch0
        )
        for i, ch in enumerate(self.channels[1:], start=1):
            x = nn.Conv(ch, (3, 3), dtype=cdt, name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = x.reshape(b, -1)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, dtype=cdt, name=f"dense_{i}")(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_actions, dtype=cdt, name="policy_head")(x)
        value = nn.Dense(1, dtype=cdt, name="value_head")(x)[..., 0]
        return (
            logits.reshape(*batch_shape, self.num_actions).astype(jnp.float32),
            value.reshape(batch_shape).astype(jnp.float32),
        )


class ConvActorCritic(nn.Module):
    """Grid-observation actor-critic: conv trunk over (H, W, C) planes.

    The state index is expanded INSIDE the module into C = num_tile_types
    tile one-hot planes plus an agent-position plane — so it is a drop-in
    for ActorCritic (same `apply(params, obs_indices)` signature, any
    leading batch shape) and every trainer/shard_map works unchanged.

    TPU-first notes:
      * The level grid is a STATIC field (a tuple of tile codes), so the
        tile planes constant-fold at trace time — the per-step cost is the
        agent one-hot + the convs, which XLA tiles onto the MXU.
      * Being static also makes the module hashable, so trainers pass it
        as a `jit` static argument (construction happens OUTSIDE jit; see
        models.a2c.make_network).
      * Spatial weight sharing is the point: unlike the index-embedding
        MLP, the conv trunk sees the maze structure, not a bag of state
        ids.
    """

    height: int
    width: int
    grid: tuple  # H·W tile codes, row-major (static — baked into the jit)
    num_actions: int
    num_tile_types: int = 4
    channels: Sequence[int] = (32, 32)
    hidden: Sequence[int] = (128,)
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        if not self.channels:
            raise ValueError("ConvActorCritic needs at least one conv layer")
        cdt = jnp.dtype(self.compute_dtype)
        batch_shape = obs.shape
        flat = obs.reshape(-1)
        b = flat.shape[0]
        s = self.height * self.width
        c = self.num_tile_types
        ch0 = self.channels[0]
        # conv_0 is split at apply time: its kernel logically covers the
        # C tile planes + 1 agent plane, but the tile planes are
        # batch-CONSTANT — convolving them per sample would broadcast
        # ~B·S·C of identical data per apply (164 MB at 64k envs / 16×16)
        # and redo C/(C+1) of conv_0's FLOPs. The conv is linear pre-ReLU,
        # so: conv the batch-1 tile image once (loop-invariant — XLA
        # hoists it out of rollout scans), conv the agent plane per
        # sample, add.
        kernel = self.param(
            "conv_0_kernel", nn.initializers.lecun_normal(), (3, 3, c + 1, ch0)
        )
        k_bias = self.param("conv_0_bias", nn.initializers.zeros, (ch0,))
        tiles = jax.nn.one_hot(
            jnp.asarray(self.grid, jnp.int32), c, dtype=cdt
        ).reshape(1, self.height, self.width, c)  # compile-time constant
        agent = jax.nn.one_hot(flat, s, dtype=cdt).reshape(
            b, self.height, self.width, 1
        )
        dn = ("NHWC", "HWIO", "NHWC")
        y_tiles = jax.lax.conv_general_dilated(
            tiles, kernel[:, :, :c, :].astype(cdt), (1, 1), "SAME",
            dimension_numbers=dn,
        )  # (1, H, W, ch0) — batch-constant
        y_agent = jax.lax.conv_general_dilated(
            agent, kernel[:, :, c:, :].astype(cdt), (1, 1), "SAME",
            dimension_numbers=dn,
        )
        x = nn.relu(y_agent + y_tiles + k_bias.astype(cdt))
        for i, ch in enumerate(self.channels[1:], start=1):
            x = nn.Conv(ch, (3, 3), dtype=cdt, name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = x.reshape(b, -1)
        for i, width in enumerate(self.hidden):
            x = nn.Dense(width, dtype=cdt, name=f"dense_{i}")(x)
            x = nn.relu(x)
        logits = nn.Dense(self.num_actions, dtype=cdt, name="policy_head")(x)
        value = nn.Dense(1, dtype=cdt, name="value_head")(x)[..., 0]
        return (
            logits.reshape(*batch_shape, self.num_actions).astype(jnp.float32),
            value.reshape(batch_shape).astype(jnp.float32),
        )
