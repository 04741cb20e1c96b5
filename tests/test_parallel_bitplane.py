"""Sharded bitplane rollout: determinism across device counts.

The sharded fast rollout seeds every env's xorshift stream by GLOBAL env
id, so episode counts must match the unsharded compile_rollout_random
integer-exactly for ANY mesh shape (SURVEY.md §5: determinism across device
counts stands in for race tests). Runs on the 8-device virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from griduniverse_tpu import make_semantics
from griduniverse_tpu.core.types import Level
from griduniverse_tpu.levels.builders import walls_and_goal_16x16
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.ops.bitplane import compile_rollout_random, pack_level
from griduniverse_tpu.parallel.bitplane import compile_rollout_random_sharded
from griduniverse_tpu.parallel.mesh import make_env_mesh

SEM = make_semantics()
B, T, LIMIT = 256, 400, 100


def _meshes():
    devs = jax.devices()
    out = [make_env_mesh(n) for n in (1, 2, 4, 8) if n <= len(devs)]
    if len(devs) >= 8:
        out.append(Mesh(np.asarray(devs[:8]).reshape(2, 4), ("host", "env")))
    return out


def test_sharded_matches_unsharded_shared_level():
    bl = pack_level(walls_and_goal_16x16())
    ref_fn = compile_rollout_random(SEM, bl, B, T, max_episode_steps=LIMIT)
    _, ref = ref_fn(jnp.uint32(5))
    for mesh in _meshes():
        fn = compile_rollout_random_sharded(
            mesh, SEM, bl, B, T, max_episode_steps=LIMIT
        )
        state, stats = fn(jnp.uint32(5))
        assert int(stats["episodes"]) == int(ref["episodes"]), mesh
        np.testing.assert_allclose(
            float(stats["mean_return"]), float(ref["mean_return"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(stats["mean_length"]), float(ref["mean_length"]), rtol=1e-5
        )
        # final per-env states are the SAME envs in the same order
        ref_state, _ = ref_fn(jnp.uint32(5))
        np.testing.assert_array_equal(
            np.asarray(state.agent_idx), np.asarray(ref_state.agent_idx)
        )


def test_sharded_matches_unsharded_per_env_mazes():
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(2), (4, 4), B, algorithm="binary_tree"
    )
    level = Level(grid=grids, start_idx=jnp.full((B,), start, jnp.int32))
    bl = pack_level(level)
    ref_fn = compile_rollout_random(SEM, bl, B, T, max_episode_steps=LIMIT)
    _, ref = ref_fn(jnp.uint32(9))
    for mesh in _meshes():
        fn = compile_rollout_random_sharded(
            mesh, SEM, bl, B, T, max_episode_steps=LIMIT
        )
        state, stats = fn(jnp.uint32(9))
        assert int(stats["episodes"]) == int(ref["episodes"]), mesh
        ref_state, _ = ref_fn(jnp.uint32(9))
        np.testing.assert_array_equal(
            np.asarray(state.agent_idx), np.asarray(ref_state.agent_idx)
        )


def test_rejects_indivisible_batch():
    bl = pack_level(walls_and_goal_16x16())
    mesh = make_env_mesh(8)
    with pytest.raises(ValueError):
        compile_rollout_random_sharded(mesh, SEM, bl, 100, 10)


def test_rejects_mismatched_batched_level():
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(2), (3, 3), 16, algorithm="binary_tree"
    )
    level = Level(grid=grids, start_idx=jnp.full((16,), start, jnp.int32))
    bl = pack_level(level)
    mesh = make_env_mesh(2)
    with pytest.raises(ValueError):
        compile_rollout_random_sharded(mesh, SEM, bl, 32, 10)
