"""Gym-style single-env class wrapper — the reference's user-facing API.

Reference (SURVEY.md §2.1 #1, §3.1): `GridUniverseEnv(gym.Env)` with
`reset() → obs`, `step(action) → (obs, reward, done, info)` (classic 4-tuple
API of its era), `render(mode)`, `look_step_ahead(state, action)`,
`is_terminal(state)`, `action_space`, `observation_space`, and constructor
kwargs `grid_shape` / `walls` / `lava` / `goal_states` / `custom_world_fp` /
`random_maze`.

This wrapper is the BASELINE config-1 compatibility path (single env on
CPU): a mutable shell around the pure-functional core — every step calls the
SAME jitted `core.step` kernel the 64k-env path uses, pinned to the host CPU
backend (a Python-loop env must not pay a device-tunnel round trip per
step). Parity with the reference is therefore inherited from the core's
oracle parity suite.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np

from ..core import semantics as S
from ..core.semantics import SemanticsConfig, make_semantics
from ..core.step import reset as core_reset
from ..core.step import step as core_step
from ..core.types import Level, make_level
from ..levels.builders import build_grid
from ..levels.maze import generate_maze_numpy
from ..levels.text import load_level_file, render_text
from .spaces import Discrete


def _cpu_device():
    return jax.devices("cpu")[0]


class GridUniverseEnv:
    """Drop-in replacement for the reference's `GridUniverseEnv`.

    Constructor forms (mirroring SURVEY.md §3.1):
      * `GridUniverseEnv(grid_shape=(8, 8))` — empty grid
      * `GridUniverseEnv(grid_shape, walls=[…], lava=[…], goal_states=[…])`
      * `GridUniverseEnv(custom_world_fp="level.txt")`
      * `GridUniverseEnv(random_maze=True, grid_shape=(9, 9), seed=0)`
        (grid_shape must be odd-sized for a (2n+1) maze lattice)
    """

    metadata = {"render_modes": ["human", "ansi", "rgb_array"]}

    def __init__(
        self,
        grid_shape: tuple[int, int] = (8, 8),
        walls: Sequence[int] | None = None,
        lava: Sequence[int] | None = None,
        goal_states: Sequence[int] | None = None,
        start_state: int = 0,
        custom_world_fp: str | None = None,
        random_maze: bool = False,
        seed: int | None = None,
        config: SemanticsConfig | None = None,
        max_steps: int | None = None,
    ):
        self.config = config or SemanticsConfig()
        self._cpu = _cpu_device()
        with jax.default_device(self._cpu):
            self._sem = make_semantics(self.config)

            if custom_world_fp is not None:
                self.level: Level = load_level_file(custom_world_fp)
            elif random_maze:
                h, w = grid_shape
                if h % 2 == 0 or w % 2 == 0:
                    raise ValueError(
                        "random_maze grids must be odd-sized (2n+1 lattice); "
                        f"got {grid_shape}"
                    )
                cells = ((h - 1) // 2, (w - 1) // 2)
                rng = np.random.default_rng(seed)
                grid = generate_maze_numpy(cells, rng)
                grid[grid.shape[0] - 2, grid.shape[1] - 2] = S.GOAL
                self.level = make_level(grid, start_idx=grid.shape[1] + 1)
            else:
                grid = build_grid(
                    grid_shape, walls or (), lava or (), goal_states or ()
                )
                if grid.reshape(-1)[start_state] != S.EMPTY:
                    raise ValueError("start_state must be an empty tile")
                self.level = make_level(grid, start_idx=start_state)

            self._key = jax.random.PRNGKey(0 if seed is None else seed)
            self._state = core_reset(self.level, self._key)

        self._step_jit = jax.jit(core_step)
        self.max_steps = max_steps

        n = self.level.num_states
        self.action_space = Discrete(self.config.num_actions, seed=seed)
        self.observation_space = Discrete(n, seed=seed)

        # host copies for render / lookahead (no device chatter)
        self._grid_np = np.asarray(self.level.grid)
        self._passable, self._terminal, self._reward, self._deltas = (
            self.config.numpy_tables()
        )

    # ------------------------------------------------------------------ API
    def reset(self) -> int:
        with jax.default_device(self._cpu):
            self._state = core_reset(self.level, self._key)
        return int(self._state.agent_idx)

    def step(self, action) -> tuple[int, float, bool, dict]:
        if not self.action_space.contains(action):
            raise ValueError(
                f"invalid action {action!r}; expected 0..{self.action_space.n - 1}"
            )
        with jax.default_device(self._cpu):
            self._state, out = self._step_jit(
                self._sem, self.level, self._state, np.int32(action)
            )
        info: dict = {}
        done = bool(out.done)
        if (
            self.max_steps is not None
            and int(self._state.t) >= self.max_steps
            and not done
        ):
            done, info = True, {"TimeLimit.truncated": True}
        return int(out.obs), float(out.reward), done, info

    def render(self, mode: str = "human"):
        if mode == "rgb_array":
            from .rendering import rgb_render

            return rgb_render(
                self._grid_np,
                agent_idx=int(self._state.agent_idx),
                start_idx=int(self.level.start_idx),
            )
        if mode == "graphic":
            # Reference parity: 'graphic' opened a pyglet window with tile
            # sprites (SURVEY.md §2.1 #4). pyglet needs a display; headless
            # environments get the same pixels via mode='rgb_array' or
            # compat.rendering.episode_gif.
            try:
                import pyglet  # noqa: F401
            except ImportError as e:
                raise RuntimeError(
                    "render(mode='graphic') needs pyglet + a display; this "
                    "environment has neither. Use mode='rgb_array' for the "
                    "same pixels, or compat.rendering.episode_gif for an "
                    "episode animation."
                ) from e
            return self._render_pyglet()
        text = render_text(
            self._grid_np,
            agent_idx=int(self._state.agent_idx),
            start_idx=int(self.level.start_idx),
        )
        if mode == "ansi":
            return text
        print(text)
        return None

    def _render_pyglet(self):  # pragma: no cover - needs a display
        """Blit the rgb_array frame into a pyglet window (reference
        'graphic' mode). Only reachable when pyglet imports (see render)."""
        import pyglet

        frame = self.render(mode="rgb_array")
        h, w, _ = frame.shape
        if not hasattr(self, "_window") or self._window is None:
            self._window = pyglet.window.Window(width=w, height=h)
        img = pyglet.image.ImageData(
            w, h, "RGB", np.ascontiguousarray(frame[::-1]).tobytes()
        )
        self._window.switch_to()
        self._window.dispatch_events()
        self._window.clear()
        img.blit(0, 0)
        self._window.flip()
        return self._window

    def close(self):
        win = getattr(self, "_window", None)
        if win is not None:  # pragma: no cover - needs a display
            win.close()
            self._window = None

    def seed(self, seed: int | None = None):
        self._key = jax.random.PRNGKey(0 if seed is None else seed)
        self.action_space.seed(seed)
        return [seed]

    # -------------------------------------------------- model helpers
    def look_step_ahead(self, state: int, action: int):
        """Pure model lookahead (the reference DP helper) — host NumPy, no
        device round trip; bit-identical to utils.oracle."""
        h, w = self._grid_np.shape
        row, col = divmod(int(state), w)
        drow, dcol = self._deltas[int(action)]
        nrow, ncol = row + int(drow), col + int(dcol)
        if not (0 <= nrow < h and 0 <= ncol < w):
            new_idx = int(state)
        else:
            cand = nrow * w + ncol
            if not self._passable[int(self._grid_np.flat[cand])]:
                new_idx = int(state)
            else:
                new_idx = cand
        code = int(self._grid_np.flat[new_idx])
        return new_idx, float(self._reward[code]), bool(self._terminal[code])

    def is_terminal(self, state: int) -> bool:
        return bool(self._terminal[int(self._grid_np.flat[int(state)])])

    @property
    def num_states(self) -> int:
        return self.level.num_states

    @property
    def current_state(self) -> int:
        return int(self._state.agent_idx)

    @property
    def done(self) -> bool:
        return bool(self._state.done)
