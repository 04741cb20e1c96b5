"""Compat-wrapper tests: the Gym-style class behaves exactly like the
reference API reconstruction (SURVEY.md §3.1/§3.2) and stays in lockstep
with the NumPy oracle."""

import numpy as np
import pytest

from griduniverse_tpu.compat import Discrete, GridUniverseEnv
from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.levels.builders import LAVA_CROSSING_9x9
from griduniverse_tpu.utils.oracle import OracleGridEnv


class TestSpaces:
    def test_discrete(self):
        d = Discrete(4, seed=0)
        assert d.n == 4
        assert 3 in d and 4 not in d and -1 not in d
        assert "x" not in d
        assert 0 <= d.sample() < 4
        assert Discrete(4) == Discrete(4) != Discrete(5)

    def test_invalid_n(self):
        with pytest.raises(ValueError):
            Discrete(0)


class TestEnvApi:
    def test_ctor_shapes_and_spaces(self):
        env = GridUniverseEnv(grid_shape=(8, 8))
        assert env.action_space == Discrete(4)
        assert env.observation_space == Discrete(64)
        assert env.reset() == 0

    def test_step_tuple_form(self):
        env = GridUniverseEnv(grid_shape=(3, 3), goal_states=[1])
        obs, reward, done, info = env.step(S.RIGHT)
        assert (obs, reward, done) == (1, 10.0, True)
        assert info == {}

    def test_invalid_action_raises(self):
        env = GridUniverseEnv(grid_shape=(3, 3))
        with pytest.raises(ValueError, match="invalid action"):
            env.step(7)

    def test_render_ansi(self):
        env = GridUniverseEnv(grid_shape=(3, 3), walls=[4], goal_states=[8])
        text = env.render(mode="ansi")
        assert text.splitlines()[0][0] == "A"  # agent at start
        assert "#" in text and "g" in text

    def test_custom_world_fp(self, tmp_path):
        p = tmp_path / "lava.txt"
        p.write_text(LAVA_CROSSING_9x9)
        env = GridUniverseEnv(custom_world_fp=str(p))
        assert env.observation_space.n == 81

    def test_random_maze(self):
        env = GridUniverseEnv(random_maze=True, grid_shape=(9, 9), seed=1)
        assert env.observation_space.n == 81
        # deterministic under seed
        env2 = GridUniverseEnv(random_maze=True, grid_shape=(9, 9), seed=1)
        assert env.render(mode="ansi") == env2.render(mode="ansi")
        with pytest.raises(ValueError, match="odd-sized"):
            GridUniverseEnv(random_maze=True, grid_shape=(8, 8))

    def test_max_steps_truncation(self):
        env = GridUniverseEnv(grid_shape=(8, 8), max_steps=3)
        for _ in range(2):
            _, _, done, info = env.step(S.RIGHT)
            assert not done
        _, _, done, info = env.step(S.RIGHT)
        assert done and info.get("TimeLimit.truncated")

    def test_lookahead_and_terminal(self):
        env = GridUniverseEnv(grid_shape=(3, 3), lava=[1], goal_states=[8])
        s2, r, d = env.look_step_ahead(0, S.RIGHT)
        assert (s2, r, d) == (1, -10.0, True)
        assert env.is_terminal(8) and env.is_terminal(1) and not env.is_terminal(0)
        # lookahead does not mutate
        assert env.current_state == 0


class TestOracleLockstep:
    @pytest.mark.parametrize("backend", ["numpy", "jax"])
    def test_long_random_walk_matches_oracle(self, backend):
        env = GridUniverseEnv(
            grid_shape=(6, 6), walls=[7, 8], lava=[14], goal_states=[35],
            backend=backend,
        )
        oracle = OracleGridEnv(np.asarray(env.level.grid), 0)
        rng = np.random.default_rng(5)
        env.reset()
        oracle.reset()
        for i in range(300):
            a = int(rng.integers(0, 4))
            o1, r1, d1, _ = env.step(a)
            o2, r2, d2, _ = oracle.step(a)
            assert (o1, r1, d1) == (int(o2), float(r2), bool(d2)), f"step {i}"

    def test_backends_bit_identical(self):
        # the cfg1a fast path (backend="numpy", the default) must be
        # indistinguishable from the jitted core.step path — including
        # max_steps truncation, reset, and the state-inspection properties
        kw = dict(
            grid_shape=(6, 6), walls=[7, 8], lava=[14], goal_states=[35],
            max_steps=37,
        )
        e_np = GridUniverseEnv(backend="numpy", **kw)
        e_jx = GridUniverseEnv(backend="jax", **kw)
        rng = np.random.default_rng(11)
        for episode in range(4):
            assert e_np.reset() == e_jx.reset()
            for i in range(60):
                a = int(rng.integers(0, 4))
                t1 = e_np.step(a)
                t2 = e_jx.step(a)
                assert t1 == t2, f"ep {episode} step {i}: {t1} != {t2}"
                assert e_np.current_state == e_jx.current_state
                assert e_np.done == e_jx.done

    def test_unknown_backend_raises(self):
        with pytest.raises(ValueError, match="backend"):
            GridUniverseEnv(grid_shape=(4, 4), backend="torch")


class TestRgbRender:
    def test_rgb_array_shape_and_colors(self):
        from griduniverse_tpu.compat.rendering import (
            AGENT_COLOR,
            DEFAULT_PALETTE,
            rgb_render,
        )

        env = GridUniverseEnv(grid_shape=(3, 4), walls=[5], goal_states=[11])
        img = env.render(mode="rgb_array")
        assert img.shape == (3 * 16, 4 * 16, 3) and img.dtype == np.uint8
        # agent pixel block at start (0,0); sample the block center
        assert tuple(img[8, 8]) == AGENT_COLOR
        # wall at (1,1)
        assert tuple(img[16 + 8, 16 + 8]) == DEFAULT_PALETTE[1]

    def test_rgb_render_no_scale_lines(self):
        from griduniverse_tpu.compat.rendering import rgb_render

        img = rgb_render(np.zeros((2, 2), np.int32), scale=1)
        assert img.shape == (2, 2, 3)


class TestEpisodeAnimation:
    """GIF episode recording — the headless stand-in for the reference's
    pyglet 'graphic' window (SURVEY.md §2.1 #4)."""

    def test_episode_gif_roundtrip(self, tmp_path):
        from PIL import Image

        from griduniverse_tpu.compat.rendering import episode_gif

        env = GridUniverseEnv(grid_shape=(4, 4), goal_states=[15])
        obs = [env.reset()]
        for a in (1, 1, 1, 2, 2, 2):
            o, _, done, _ = env.step(a)
            obs.append(o)
        path = tmp_path / "ep.gif"
        episode_gif(
            np.asarray(env.level.grid), np.asarray(obs), str(path),
            start_idx=int(env.level.start_idx),
        )
        with Image.open(path) as im:
            assert im.format == "GIF"
            assert im.n_frames == len(obs)
            assert im.size == (4 * 16, 4 * 16)

    def test_save_gif_rejects_empty(self):
        from griduniverse_tpu.compat.rendering import save_gif

        with pytest.raises(ValueError):
            save_gif([], "/tmp/nope.gif")

    def test_graphic_mode_errors_helpfully_without_pyglet(self):
        env = GridUniverseEnv(grid_shape=(3, 3), goal_states=[8])
        env.reset()
        try:
            import pyglet  # noqa: F401

            pytest.skip("pyglet present; graphic mode would open a window")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="rgb_array"):
            env.render(mode="graphic")
