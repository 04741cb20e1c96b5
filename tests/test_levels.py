"""Level I/O tests — reference coverage model (SURVEY.md §4): a text maze
parses to the expected wall/goal layout; malformed files raise."""

import numpy as np
import pytest

from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.levels.builders import (
    LAVA_CROSSING_9x9,
    build_grid,
    lava_level,
    make_level_from_indices,
    walls_and_goal_16x16,
)
from griduniverse_tpu.levels.text import (
    LevelParseError,
    level_from_text,
    load_level_file,
    parse_text_grid,
    render_text,
)


class TestParse:
    def test_golden_lava_level(self):
        grid, start = parse_text_grid(LAVA_CROSSING_9x9)
        assert grid.shape == (9, 9)
        assert start == 0
        assert grid[4, 4] == S.GOAL
        assert grid[1, 4] == S.LAVA and grid[7, 4] == S.LAVA
        assert grid[0, 8] == S.EMPTY
        assert grid[0, 0] == S.EMPTY  # start tile stored as EMPTY
        # exact counts pin the layout (golden test)
        assert int((grid == S.WALL).sum()) == 27
        assert int((grid == S.LAVA).sum()) == 3
        assert int((grid == S.GOAL).sum()) == 1

    def test_lava_level_goal_reachable_without_crossing_lava(self):
        """Regression: an earlier layout walled the goal in, making
        lava-suicide the optimal policy."""
        grid, start = parse_text_grid(LAVA_CROSSING_9x9)
        from collections import deque

        h, w = grid.shape
        passable = (grid == S.EMPTY) | (grid == S.GOAL)
        seen = np.zeros_like(passable)
        seen[start // w, start % w] = True
        dq = deque([(start // w, start % w)])
        while dq:
            r, c = dq.popleft()
            for dr, dc in ((-1, 0), (0, 1), (1, 0), (0, -1)):
                nr, nc = r + dr, c + dc
                if 0 <= nr < h and 0 <= nc < w and passable[nr, nc] and not seen[nr, nc]:
                    seen[nr, nc] = True
                    dq.append((nr, nc))
        gr, gc = np.argwhere(grid == S.GOAL)[0]
        assert seen[gr, gc], "goal not reachable without crossing lava"
        # and every open tile is reachable (no isolated pockets)
        np.testing.assert_array_equal(seen, passable)

    def test_round_trip_via_render(self):
        grid, start = parse_text_grid(LAVA_CROSSING_9x9)
        text = render_text(grid, start_idx=start)
        grid2, start2 = parse_text_grid(text)
        np.testing.assert_array_equal(grid, grid2)
        assert start == start2

    def test_file_loading(self, tmp_path):
        p = tmp_path / "level.txt"
        p.write_text(LAVA_CROSSING_9x9)
        level = load_level_file(p)
        assert level.height == 9 and level.width == 9
        assert int(level.start_idx) == 0

    def test_dot_and_o_aliases(self):
        level = level_from_text("s.o\nooo\noog\n")
        assert level.num_states == 9
        assert np.asarray(level.grid)[2, 2] == S.GOAL


class TestMalformed:
    def test_ragged_raises(self):
        with pytest.raises(LevelParseError, match="ragged"):
            parse_text_grid("soo\noo\n")

    def test_unknown_char_raises(self):
        with pytest.raises(LevelParseError, match="unknown tile char"):
            parse_text_grid("soo\noZo\n")

    def test_no_start_raises(self):
        with pytest.raises(LevelParseError, match="exactly 1 start"):
            parse_text_grid("ooo\nooo\n")

    def test_two_starts_raises(self):
        with pytest.raises(LevelParseError, match="exactly 1 start"):
            parse_text_grid("sos\nooo\n")

    def test_empty_raises(self):
        with pytest.raises(LevelParseError, match="empty"):
            parse_text_grid("\n\n")


class TestBuiltinAssets:
    """Shipped text worlds (levels/assets/*.txt) parse and are solvable."""

    def test_registry_lists_assets(self):
        from griduniverse_tpu.levels.registry import builtin_level_names

        names = builtin_level_names()
        assert "maze_9x9" in names
        assert "lava_bridge_9x9" in names
        assert "rooms_16x16" in names

    def test_unknown_name_raises(self):
        from griduniverse_tpu.levels.registry import builtin_level

        with pytest.raises(KeyError, match="unknown builtin level"):
            builtin_level("nope")

    @pytest.mark.parametrize(
        "name", ["maze_9x9", "lava_bridge_9x9", "rooms_16x16"]
    )
    def test_goal_reachable_without_lava(self, name):
        from collections import deque

        from griduniverse_tpu.levels.registry import builtin_level

        level = builtin_level(name)
        grid = np.asarray(level.grid)
        h, w = grid.shape
        start = int(level.start_idx)
        passable = (grid == S.EMPTY) | (grid == S.GOAL)
        seen = np.zeros_like(passable)
        seen[start // w, start % w] = True
        dq = deque([(start // w, start % w)])
        while dq:
            r, c = dq.popleft()
            for dr, dc in ((-1, 0), (0, 1), (1, 0), (0, -1)):
                nr, nc = r + dr, c + dc
                if 0 <= nr < h and 0 <= nc < w and passable[nr, nc] and not seen[nr, nc]:
                    seen[nr, nc] = True
                    dq.append((nr, nc))
        gr, gc = np.argwhere(grid == S.GOAL)[0]
        assert seen[gr, gc], f"{name}: goal unreachable without crossing lava"

    def test_value_iteration_solves_builtin_maze(self):
        import jax

        from griduniverse_tpu import build_model_table, make_semantics
        from griduniverse_tpu.algos.dp import value_iteration
        from griduniverse_tpu.algos.utils import run_greedy_episode
        from griduniverse_tpu.levels.registry import builtin_level

        sem = make_semantics()
        level = builtin_level("maze_9x9")
        model = build_model_table(sem, level)
        _, policy, _ = value_iteration(model)
        _, _, _, reached = run_greedy_episode(
            sem, level, policy, jax.random.PRNGKey(0), max_steps=81
        )
        assert bool(reached)


class TestBuilders:
    def test_build_grid_indices(self):
        grid = build_grid((3, 3), walls=[1], lava=[2], goals=[8])
        assert grid[0, 1] == S.WALL
        assert grid[0, 2] == S.LAVA
        assert grid[2, 2] == S.GOAL

    def test_start_on_wall_raises(self):
        with pytest.raises(ValueError, match="empty tile"):
            make_level_from_indices((3, 3), start_idx=4, walls=[4])

    def test_walls_16x16_layout(self):
        level = walls_and_goal_16x16()
        grid = np.asarray(level.grid)
        assert grid.shape == (16, 16)
        assert grid[0, 5] == S.WALL and grid[11, 5] == S.WALL
        assert grid[12, 5] == S.EMPTY  # the gap
        assert grid[15, 15] == S.GOAL

    def test_lava_level_solvable_start(self):
        level = lava_level()
        assert np.asarray(level.grid).reshape(-1)[int(level.start_idx)] == S.EMPTY
