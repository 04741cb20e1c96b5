"""Env-mechanics unit tests — mirrors the reference's test coverage
(SURVEY.md §4: each action moves correctly; boundary and wall collisions
leave the agent in place; lava/goal terminate with the right reward; reset
restores the start state)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from griduniverse_tpu import (
    DEFAULT_CONFIG,
    EnvState,
    make_level,
    make_semantics,
    reset,
    step,
    step_autoreset,
)
from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.levels.builders import (
    empty_level,
    lava_level,
    make_level_from_indices,
)

SEM = make_semantics()
KEY = jax.random.PRNGKey(0)


def mk_state(level, idx=None):
    st = reset(level, KEY)
    if idx is not None:
        st = st.replace(agent_idx=jnp.asarray(idx, jnp.int32))
    return st


class TestActions:
    """Each action moves the agent correctly on an open grid."""

    @pytest.mark.parametrize(
        "action,expected",
        [(S.UP, 1 * 4 + 2 - 4), (S.RIGHT, 6 + 1), (S.DOWN, 6 + 4), (S.LEFT, 6 - 1)],
    )
    def test_moves(self, action, expected):
        level = empty_level(4, 4)
        st = mk_state(level, idx=1 * 4 + 2)  # row 1, col 2
        new, out = step(SEM, level, st, jnp.asarray(action))
        assert int(new.agent_idx) == expected
        assert int(out.obs) == expected
        assert float(out.reward) == np.float32(DEFAULT_CONFIG.step_reward)
        assert not bool(out.done)
        assert int(new.t) == 1


class TestBoundaries:
    """Moving off-grid leaves the agent in place (still costs a step)."""

    @pytest.mark.parametrize(
        "start,action",
        [
            (0, S.UP), (0, S.LEFT),          # top-left corner
            (3, S.UP), (3, S.RIGHT),         # top-right
            (12, S.DOWN), (12, S.LEFT),      # bottom-left
            (15, S.DOWN), (15, S.RIGHT),     # bottom-right
        ],
    )
    def test_stay_in_place(self, start, action):
        level = empty_level(4, 4)
        st = mk_state(level, idx=start)
        new, out = step(SEM, level, st, jnp.asarray(action))
        assert int(new.agent_idx) == start
        assert float(out.reward) == np.float32(DEFAULT_CONFIG.step_reward)
        assert not bool(out.done)


class TestWalls:
    def test_wall_blocks(self):
        # 3x3 with wall in the middle (idx 4)
        level = make_level_from_indices((3, 3), start_idx=3, walls=[4])
        st = mk_state(level)  # at (1, 0)
        new, out = step(SEM, level, st, jnp.asarray(S.RIGHT))
        assert int(new.agent_idx) == 3  # blocked
        assert not bool(out.done)

    def test_can_walk_around(self):
        level = make_level_from_indices((3, 3), start_idx=3, walls=[4])
        st = mk_state(level)
        new, _ = step(SEM, level, st, jnp.asarray(S.UP))
        assert int(new.agent_idx) == 0


class TestTerminals:
    def test_goal_reward_and_done(self):
        level = make_level_from_indices((3, 3), start_idx=0, goals=[1])
        st = mk_state(level)
        new, out = step(SEM, level, st, jnp.asarray(S.RIGHT))
        assert bool(out.done)
        assert float(out.reward) == np.float32(DEFAULT_CONFIG.goal_reward)
        assert int(new.agent_idx) == 1

    def test_lava_reward_and_done(self):
        level = make_level_from_indices((3, 3), start_idx=0, lava=[1])
        st = mk_state(level)
        new, out = step(SEM, level, st, jnp.asarray(S.RIGHT))
        assert bool(out.done)
        assert float(out.reward) == np.float32(DEFAULT_CONFIG.lava_reward)

    def test_frozen_after_done(self):
        level = make_level_from_indices((3, 3), start_idx=0, goals=[1])
        st = mk_state(level)
        st, _ = step(SEM, level, st, jnp.asarray(S.RIGHT))
        st2, out = step(SEM, level, st, jnp.asarray(S.RIGHT))
        assert int(st2.agent_idx) == 1
        assert float(out.reward) == 0.0
        assert bool(out.done)
        assert int(st2.t) == int(st.t)  # counter frozen too


class TestReset:
    def test_reset_restores_start(self):
        level = empty_level(4, 4)
        st = mk_state(level, idx=9)
        st2 = reset(level, KEY)
        assert int(st2.agent_idx) == int(level.start_idx)
        assert int(st2.t) == 0
        assert not bool(st2.done)


class TestAutoReset:
    def test_autoreset_returns_terminal_transition_but_reset_state(self):
        level = make_level_from_indices((3, 3), start_idx=0, goals=[1])
        st = mk_state(level)
        new, out = step_autoreset(SEM, level, st, jnp.asarray(S.RIGHT))
        # transition reports the terminal step…
        assert bool(out.done)
        assert int(out.obs) == 1
        assert float(out.reward) == np.float32(DEFAULT_CONFIG.goal_reward)
        # …but the state is already reset for the next step
        assert int(new.agent_idx) == 0
        assert int(new.t) == 0
        assert not bool(new.done)

    def test_autoreset_key_advances(self):
        level = make_level_from_indices((3, 3), start_idx=0, goals=[1])
        st = mk_state(level)
        new, _ = step_autoreset(SEM, level, st, jnp.asarray(S.RIGHT))
        assert not np.array_equal(np.asarray(new.key), np.asarray(st.key))


class TestJitVmap:
    def test_jit_step_matches_eager(self):
        level = lava_level()
        st = mk_state(level)
        jit_step = jax.jit(step)
        for a in range(4):
            n1, o1 = step(SEM, level, st, jnp.asarray(a))
            n2, o2 = jit_step(SEM, level, st, jnp.asarray(a))
            assert int(n1.agent_idx) == int(n2.agent_idx)
            assert float(o1.reward) == float(o2.reward)

    def test_vmap_step_equals_loop(self):
        level = lava_level()
        b = 16
        rng = np.random.default_rng(1)
        idxs = rng.integers(0, level.num_states, size=b)
        # place agents only on passable tiles
        grid = np.asarray(level.grid).reshape(-1)
        idxs = np.where(grid[idxs] == S.WALL, int(level.start_idx), idxs)
        actions = rng.integers(0, 4, size=b)
        keys = jax.random.split(KEY, b)
        states = EnvState(
            agent_idx=jnp.asarray(idxs, jnp.int32),
            t=jnp.zeros(b, jnp.int32),
            done=jnp.zeros(b, bool),
            key=keys,
        )
        batched = jax.vmap(step, in_axes=(None, None, 0, 0))
        new, out = batched(SEM, level, states, jnp.asarray(actions, jnp.int32))
        for i in range(b):
            sti = EnvState(
                agent_idx=states.agent_idx[i],
                t=states.t[i],
                done=states.done[i],
                key=states.key[i],
            )
            ni, oi = step(SEM, level, sti, jnp.asarray(int(actions[i])))
            assert int(new.agent_idx[i]) == int(ni.agent_idx)
            assert float(out.reward[i]) == float(oi.reward)
            assert bool(out.done[i]) == bool(oi.done)
