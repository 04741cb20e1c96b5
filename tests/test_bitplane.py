"""Bitplane fast-path equivalence: ops.bitplane vs core.step vs the oracle.

The bit-packed engine (ops/bitplane.py) must produce IDENTICAL
(obs, reward, done) trajectories to the generic gather-based step for every
mode it supports — it is the same environment, only the lookup primitive
differs (select tree vs gather). Property-tested with random levels and
pre-drawn action arrays (SURVEY.md §7.3 parity methodology).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from griduniverse_tpu import make_semantics
from griduniverse_tpu.core.step import reset
from griduniverse_tpu.core.types import Level, make_level
from griduniverse_tpu.levels.builders import (
    empty_level,
    lava_level,
    walls_and_goal_16x16,
)
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.ops.bitplane import (
    pack_level,
    reset_bits,
    rollout_actions_bits,
    rollout_random_bits,
    tile_code,
    xorshift_init,
    xorshift_next,
)
from griduniverse_tpu.ops.rollout import reset_batch, rollout_actions
from griduniverse_tpu.utils.oracle import OracleGridEnv

SEM = make_semantics()
KEY = jax.random.PRNGKey(0)


def random_level(rng, h, w):
    """A random level with walls/lava/goal sprinkled in; start kept EMPTY."""
    grid = np.zeros((h, w), np.int32)
    n = h * w
    codes = rng.choice([0, 0, 0, 1, 1, 2, 3], size=n)
    grid = codes.reshape(h, w).astype(np.int32)
    grid[0, 0] = 0
    return make_level(grid, start_idx=0)


LEVELS = [
    ("empty8", lambda rng: empty_level(8, 8, goal=True)),
    ("walls16", lambda rng: walls_and_goal_16x16()),
    ("lava", lambda rng: lava_level()),
    ("random5x7", lambda rng: random_level(rng, 5, 7)),  # non-pow2 dims
    ("random11x3", lambda rng: random_level(rng, 11, 3)),
]


@pytest.mark.parametrize("name,mk", LEVELS)
def test_tile_code_lookup_matches_grid(name, mk, rng):
    level = mk(rng)
    bl = pack_level(level)
    idx = jnp.arange(level.num_states, dtype=jnp.int32)
    got = np.asarray(tile_code(bl, idx))
    np.testing.assert_array_equal(got, np.asarray(level.grid).reshape(-1))


def test_tile_code_lookup_batched_levels():
    grids, start = generate_mazes_device(jax.random.PRNGKey(3), (3, 3), 16)
    level = Level(grid=grids, start_idx=jnp.full((16,), start, jnp.int32))
    bl = pack_level(level)
    s = level.num_states
    idx = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (16, s))
    got = np.asarray(jax.vmap(lambda i: tile_code(bl, i), in_axes=1, out_axes=1)(idx))
    np.testing.assert_array_equal(got, np.asarray(grids).reshape(16, s))


@pytest.mark.parametrize("name,mk", LEVELS)
@pytest.mark.parametrize("auto_reset", [False, True])
def test_single_env_equivalence(name, mk, auto_reset, rng):
    level = mk(rng)
    bl = pack_level(level)
    actions = jnp.asarray(rng.integers(0, 4, size=500), jnp.int32)

    state = reset(level, KEY)
    _, ref = jax.jit(rollout_actions, static_argnames=("auto_reset",))(
        SEM, level, state, actions, auto_reset=auto_reset
    )
    fstate = reset_bits(bl)
    _, (obs, rew, done) = jax.jit(
        rollout_actions_bits, static_argnames=("auto_reset",)
    )(SEM, bl, fstate, actions, auto_reset=auto_reset)

    np.testing.assert_array_equal(np.asarray(obs), np.asarray(ref.obs))
    np.testing.assert_array_equal(np.asarray(rew), np.asarray(ref.reward))
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref.done))


@pytest.mark.parametrize("max_episode_steps", [None, 13])
def test_batched_equivalence_with_truncation(max_episode_steps, rng):
    level = walls_and_goal_16x16()
    bl = pack_level(level)
    b, t = 64, 300
    actions = jnp.asarray(rng.integers(0, 4, size=(t, b)), jnp.int32)

    state = reset_batch(level, KEY, b)
    _, ref = jax.jit(
        rollout_actions, static_argnames=("auto_reset", "max_episode_steps")
    )(SEM, level, state, actions, auto_reset=True,
      max_episode_steps=max_episode_steps)

    fstate = reset_bits(bl, b)
    _, (obs, rew, done) = jax.jit(
        rollout_actions_bits, static_argnames=("auto_reset", "max_episode_steps")
    )(SEM, bl, fstate, actions, auto_reset=True,
      max_episode_steps=max_episode_steps)

    np.testing.assert_array_equal(np.asarray(obs), np.asarray(ref.obs))
    np.testing.assert_array_equal(np.asarray(rew), np.asarray(ref.reward))
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref.done))


def test_per_env_maze_equivalence(rng):
    """Batched BitLevel (one maze per env) matches the per-level generic path."""
    b, t = 8, 200
    grids, start = generate_mazes_device(jax.random.PRNGKey(5), (4, 4), b)
    level = Level(grid=grids, start_idx=jnp.full((b,), start, jnp.int32))
    bl = pack_level(level)
    actions = jnp.asarray(rng.integers(0, 4, size=(t, b)), jnp.int32)

    state = reset_batch(level, KEY, b)
    _, ref = jax.jit(rollout_actions, static_argnames=("auto_reset",))(
        SEM, level, state, actions, auto_reset=True
    )
    fstate = reset_bits(bl)
    _, (obs, rew, done) = jax.jit(
        rollout_actions_bits, static_argnames=("auto_reset",)
    )(SEM, bl, fstate, actions, auto_reset=True)

    np.testing.assert_array_equal(np.asarray(obs), np.asarray(ref.obs))
    np.testing.assert_array_equal(np.asarray(rew), np.asarray(ref.reward))
    np.testing.assert_array_equal(np.asarray(done), np.asarray(ref.done))


def test_oracle_equivalence_direct(rng):
    """Belt and braces: the bitplane path also matches the NumPy oracle."""
    level = lava_level()
    bl = pack_level(level)
    actions = rng.integers(0, 4, size=400).astype(np.int32)
    env = OracleGridEnv(np.asarray(level.grid), int(level.start_idx), auto_reset=True)
    o_obs, o_rew, o_done = env.run_actions(actions)

    fstate = reset_bits(bl)
    _, (obs, rew, done) = jax.jit(
        rollout_actions_bits, static_argnames=("auto_reset",)
    )(SEM, bl, fstate, jnp.asarray(actions), auto_reset=True)
    np.testing.assert_array_equal(np.asarray(obs), o_obs)
    np.testing.assert_array_equal(np.asarray(rew), o_rew)
    np.testing.assert_array_equal(np.asarray(done), o_done)


def test_rollout_random_bits_stats(rng):
    """Fused random rollout: episodes complete, stats are sane, and the
    xorshift and threefry action streams agree on aggregate behavior."""
    level = walls_and_goal_16x16()
    bl = pack_level(level)
    for rng_kind in ("xorshift", "threefry"):
        _, stats = rollout_random_bits(
            SEM, bl, jnp.uint32(7), 256, 500,
            max_episode_steps=200, rng=rng_kind,
        )
        eps = int(stats["episodes"])
        assert eps > 0
        assert 1.0 <= float(stats["mean_length"]) <= 200.0
        # random walk on a walls+goal level: per-step cost −1 dominates
        assert float(stats["mean_return"]) < 0.0


def test_unroll_is_semantics_neutral():
    """`unroll` is a pure scheduling knob: the compiled rollout's final
    state and stats are bit-identical for any unroll factor."""
    from griduniverse_tpu.ops.bitplane import compile_rollout_random

    level = walls_and_goal_16x16()
    bl = pack_level(level)
    results = []
    for unroll in (1, 3, 16):
        fn = compile_rollout_random(
            SEM, bl, 64, 333, max_episode_steps=100, unroll=unroll
        )
        results.append(fn(jnp.uint32(5)))
    (s0, st0), rest = results[0], results[1:]
    for s, st in rest:
        np.testing.assert_array_equal(s0.agent_idx, s.agent_idx)
        np.testing.assert_array_equal(s0.t, s.t)
        for k in st0:
            np.testing.assert_array_equal(np.asarray(st0[k]), np.asarray(st[k]))


def test_xorshift_action_uniformity():
    """The xorshift action stream is roughly uniform over the 4 actions."""
    s = xorshift_init(jnp.uint32(123), (4096,))
    counts = np.zeros(4, np.int64)
    for _ in range(64):
        s, bits = xorshift_next(s)
        a = np.asarray((bits >> 9) % jnp.uint32(4))
        counts += np.bincount(a, minlength=4)
    freq = counts / counts.sum()
    assert np.all(np.abs(freq - 0.25) < 0.01), freq


def test_pack_level_rejects_huge_grids():
    big = np.zeros((200, 200), np.int32)
    with pytest.raises(ValueError):
        pack_level(make_level(big, 0))
