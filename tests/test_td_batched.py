"""Per-maze sampled TD control (algos/td_batched.py + the sharded twin):
each env learns its OWN maze's Q-table — the model-free counterpart of
the batched DP solvers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from griduniverse_tpu import make_semantics
from griduniverse_tpu.algos import q_learning_batched
from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.core.types import Level
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.models import greedy_success_rate_tabular

SEM = make_semantics()


def ab_mazes(key, n, cells=(2, 2)):
    grids, start = generate_mazes_device(
        key, cells, n, algorithm="aldous_broder"
    )
    h, w = grids.shape[1], grids.shape[2]
    grids = grids.at[:, h - 2, w - 2].set(S.GOAL)
    return Level(grid=grids, start_idx=jnp.broadcast_to(start, (n,)))


class TestQLearningBatched:
    def test_solves_every_maze(self):
        lv = ab_mazes(jax.random.PRNGKey(0), 16)
        res = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(1), num_steps=4000, epsilon=0.2,
            max_episode_steps=40,
        )
        pol = jnp.argmax(res.q, axis=-1).astype(jnp.int32)
        assert float(
            greedy_success_rate_tabular(SEM, lv, pol, max_steps=30)
        ) == 1.0
        assert int(res.episodes) > 0
        assert np.isfinite(float(res.mean_return))

    @pytest.mark.parametrize("algo", ["sarsa", "expected_sarsa"])
    def test_variants_solve(self, algo):
        lv = ab_mazes(jax.random.PRNGKey(2), 8)
        res = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(3), num_steps=4000, epsilon=0.2,
            algo=algo, max_episode_steps=40,
        )
        pol = jnp.argmax(res.q, axis=-1).astype(jnp.int32)
        assert float(
            greedy_success_rate_tabular(SEM, lv, pol, max_steps=30)
        ) >= 0.9

    def test_mazes_learn_in_isolation(self):
        """Maze k's Q-table must depend only on ITS maze and its stream
        position — swapping the OTHER mazes leaves it untouched."""
        a = ab_mazes(jax.random.PRNGKey(4), 4)
        b = ab_mazes(jax.random.PRNGKey(5), 4)
        mix1 = Level(
            grid=jnp.concatenate([a.grid[:1], b.grid[1:]]),
            start_idx=a.start_idx,
        )
        mix2 = Level(
            grid=jnp.concatenate([a.grid[:1], a.grid[1:]]),
            start_idx=a.start_idx,
        )
        r1 = q_learning_batched(
            SEM, mix1, jax.random.PRNGKey(6), num_steps=500,
            max_episode_steps=20,
        )
        r2 = q_learning_batched(
            SEM, mix2, jax.random.PRNGKey(6), num_steps=500,
            max_episode_steps=20,
        )
        np.testing.assert_array_equal(
            np.asarray(r1.q[0]), np.asarray(r2.q[0])
        )

    def test_bf16_tables_still_solve(self):
        """dtype="bfloat16" halves the table stream (the r5 throughput
        diet); TD errors stay f32, so the policies still converge."""
        lv = ab_mazes(jax.random.PRNGKey(0), 16)
        res = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(1), num_steps=4000, epsilon=0.2,
            max_episode_steps=40, dtype="bfloat16",
        )
        assert res.q.dtype == jnp.bfloat16
        pol = jnp.argmax(res.q, axis=-1).astype(jnp.int32)
        assert float(
            greedy_success_rate_tabular(SEM, lv, pol, max_steps=30)
        ) >= 0.9

    def test_f32_default_unchanged_by_dtype_plumbing(self):
        """The dtype-stable cast must be a no-op for f32 tables."""
        lv = ab_mazes(jax.random.PRNGKey(4), 4)
        res = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(5), num_steps=200,
            max_episode_steps=20,
        )
        assert res.q.dtype == jnp.float32

    def test_chunked_resume_bitexact(self):
        """run(2N) ≡ run(N) ∘ run(N) through the returned resume carry
        (per-step keys are fold_in(key, t) with t continuing)."""
        lv = ab_mazes(jax.random.PRNGKey(9), 8)
        kw = dict(epsilon=0.2, max_episode_steps=20)
        full = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(10), num_steps=400, **kw
        )
        h1 = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(10), num_steps=200, **kw
        )
        h2 = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(10), num_steps=200,
            state0=h1.state, **kw
        )
        np.testing.assert_array_equal(np.asarray(full.q), np.asarray(h2.q))
        assert int(full.episodes) == int(h2.episodes)
        np.testing.assert_array_equal(
            np.asarray(full.mean_return), np.asarray(h2.mean_return)
        )
        assert int(h2.state.t) == 400

    def test_q0_warm_start_is_not_a_resume(self):
        """A bare q0 warm-start restarts envs and the random stream —
        distinct from a state0 resume of the same tables."""
        lv = ab_mazes(jax.random.PRNGKey(9), 8)
        kw = dict(epsilon=0.2, max_episode_steps=20)
        h1 = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(10), num_steps=200, **kw
        )
        warm = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(10), num_steps=200, q0=h1.q, **kw
        )
        resumed = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(10), num_steps=200,
            state0=h1.state, **kw
        )
        assert not np.array_equal(np.asarray(warm.q), np.asarray(resumed.q))

    def test_rejects_shared_level(self):
        from griduniverse_tpu.levels.builders import lava_level

        with pytest.raises(ValueError, match="batched"):
            q_learning_batched(SEM, lava_level(), jax.random.PRNGKey(0))

    def test_rejects_unknown_algo(self):
        with pytest.raises(ValueError):
            q_learning_batched(
                SEM, ab_mazes(jax.random.PRNGKey(0), 4),
                jax.random.PRNGKey(0), algo="nope",
            )

    def test_close_to_vi_values_on_visited_states(self):
        """Long-run Q should approach the DP optimum at the start state
        (every episode visits it)."""
        from griduniverse_tpu.algos import value_iteration_batched_grid

        lv = ab_mazes(jax.random.PRNGKey(7), 8)
        v_star, _, _ = value_iteration_batched_grid(SEM, lv, gamma=0.95)
        res = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(8), num_steps=8000, epsilon=0.3,
            gamma=0.95, alpha=0.2, max_episode_steps=40,
        )
        start = int(np.asarray(lv.start_idx)[0])
        v_hat = np.asarray(jnp.max(res.q, axis=-1))[:, start]
        np.testing.assert_allclose(
            v_hat, np.asarray(v_star)[:, start], atol=0.5
        )


class TestQLearningBatchedSharded:
    @pytest.mark.parametrize("mesh_kind", ["1d", "2d"])
    def test_parity_bitexact(self, mesh_kind):
        from griduniverse_tpu.parallel import (
            make_env_mesh,
            make_host_env_mesh,
            q_learning_batched_sharded,
        )

        mesh = make_env_mesh() if mesh_kind == "1d" else make_host_env_mesh(
            2, 4
        )
        lv = ab_mazes(jax.random.PRNGKey(0), 16)
        ref = q_learning_batched(
            SEM, lv, jax.random.PRNGKey(1), num_steps=300, epsilon=0.2,
            max_episode_steps=40,
        )
        par = q_learning_batched_sharded(
            mesh, SEM, lv, jax.random.PRNGKey(1), num_steps=300,
            epsilon=0.2, max_episode_steps=40, parity=True,
        )
        np.testing.assert_array_equal(np.asarray(ref.q), np.asarray(par.q))
        assert int(ref.episodes) == int(par.episodes)

    def test_scalable_mode_solves(self):
        from griduniverse_tpu.parallel import (
            make_env_mesh,
            q_learning_batched_sharded,
        )

        lv = ab_mazes(jax.random.PRNGKey(2), 16)
        res = q_learning_batched_sharded(
            make_env_mesh(), SEM, lv, jax.random.PRNGKey(3),
            num_steps=4000, epsilon=0.2, max_episode_steps=40,
        )
        pol = jnp.argmax(res.q, axis=-1).astype(jnp.int32)
        assert float(
            greedy_success_rate_tabular(SEM, lv, pol, max_steps=30)
        ) >= 0.9

    def test_indivisible_maze_count_raises(self):
        from griduniverse_tpu.parallel import (
            make_env_mesh,
            q_learning_batched_sharded,
        )

        with pytest.raises(ValueError, match="divisible"):
            q_learning_batched_sharded(
                make_env_mesh(), SEM, ab_mazes(jax.random.PRNGKey(0), 9),
                jax.random.PRNGKey(0), num_steps=10,
            )


def test_q_rows_lookup_paths_agree_with_numpy():
    """_q_rows must index Q[n, s_n, :] exactly on BOTH sides of the
    select-tree/gather crossover (the large side is what 65x65+ grids
    exercise; the small side is every benched shape)."""
    from griduniverse_tpu.algos.td_batched import (
        _SELECT_TREE_MAX_STATES,
        _q_rows,
    )

    rng = np.random.default_rng(3)
    for s_dim in (81, _SELECT_TREE_MAX_STATES + 1):
        q = rng.normal(size=(4, s_dim, 5)).astype(np.float32)
        s = rng.integers(0, s_dim, size=4).astype(np.int32)
        got = np.asarray(_q_rows(jnp.asarray(q), jnp.asarray(s)))
        np.testing.assert_array_equal(got, q[np.arange(4), s])
