"""DP solver tests — reference coverage model (SURVEY.md §4): VI/PI produce
the known-optimal V/policy on a tiny grid; plus exact agreement with a NumPy
oracle VI built on the oracle env's look_step_ahead."""

import jax
import numpy as np

from griduniverse_tpu import build_model_table, make_semantics
from griduniverse_tpu.algos import (
    greedy_policy_from_v,
    policy_evaluation,
    policy_iteration,
    run_greedy_episode,
    value_iteration,
)
from griduniverse_tpu.levels.builders import (
    lava_level,
    make_level_from_indices,
    walls_and_goal_16x16,
)
from griduniverse_tpu.utils.oracle import OracleGridEnv

SEM = make_semantics()
GAMMA = 0.99
THETA = 1e-6


def numpy_value_iteration(env: OracleGridEnv, gamma, theta, max_iters=10_000):
    """Synchronous-sweep NumPy VI over oracle look_step_ahead — the
    reference-style solver (SURVEY.md §3.3) used as the DP parity fixture."""
    n = env.h * env.w
    na = 4
    ns = np.zeros((n, na), np.int32)
    rw = np.zeros((n, na), np.float32)
    dn = np.zeros((n, na), bool)
    term = np.array([env.is_terminal(s) for s in range(n)])
    for s in range(n):
        for a in range(na):
            ns[s, a], rw[s, a], dn[s, a] = env.look_step_ahead(s, a)
    v = np.zeros(n, np.float32)
    for _ in range(max_iters):
        cont = np.where(dn, 0.0, v[ns])
        q = np.where(term[:, None], 0.0, rw + gamma * cont).astype(np.float32)
        v_new = q.max(axis=1)
        delta = np.abs(v_new - v).max()
        v = v_new
        if delta < theta:
            break
    q = np.where(term[:, None], 0.0, rw + gamma * np.where(dn, 0.0, v[ns]))
    return v, q.argmax(axis=1)


def test_vi_matches_numpy_oracle_vi():
    level = lava_level()
    model = build_model_table(SEM, level)
    v, policy, iters = value_iteration(model, gamma=GAMMA, theta=THETA)
    env = OracleGridEnv(np.asarray(level.grid), int(level.start_idx))
    v_np, pol_np = numpy_value_iteration(env, GAMMA, THETA)
    np.testing.assert_allclose(np.asarray(v), v_np, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(policy), pol_np)
    assert int(iters) > 1


def test_vi_known_optimal_tiny_grid():
    # 1x4 corridor: s o o g — optimal V is the discounted shortest-path value.
    level = make_level_from_indices((1, 4), start_idx=0, goals=[3])
    model = build_model_table(SEM, level)
    v, policy, _ = value_iteration(model, gamma=GAMMA, theta=1e-8)
    # From state 2: +10 (one step). From 1: -1 + γ·10. From 0: -1 + γ·(-1+γ·10)
    expected = [
        -1 + GAMMA * (-1 + GAMMA * 10.0),
        -1 + GAMMA * 10.0,
        10.0,
        0.0,  # terminal absorbing
    ]
    np.testing.assert_allclose(np.asarray(v), expected, atol=1e-5)
    assert list(np.asarray(policy)[:3]) == [1, 1, 1]  # all RIGHT


def test_pi_agrees_with_vi():
    level = walls_and_goal_16x16()
    model = build_model_table(SEM, level)
    v_vi, pol_vi, _ = value_iteration(model, gamma=GAMMA, theta=THETA)
    v_pi, pol_pi, iters = policy_iteration(model, gamma=GAMMA, theta=THETA)
    np.testing.assert_allclose(np.asarray(v_vi), np.asarray(v_pi), atol=1e-4)
    # Optimal policy may differ on ties/unreachable states; greedy values agree.
    assert int(iters) >= 1
    np.testing.assert_array_equal(
        np.asarray(greedy_policy_from_v(model, v_vi, GAMMA)),
        np.asarray(greedy_policy_from_v(model, v_pi, GAMMA)),
    )


def test_policy_evaluation_of_optimal_policy_returns_optimal_v():
    level = lava_level()
    model = build_model_table(SEM, level)
    v_star, pol_star, _ = value_iteration(model, gamma=GAMMA, theta=THETA)
    v_eval, _ = policy_evaluation(model, pol_star, gamma=GAMMA, theta=THETA)
    np.testing.assert_allclose(np.asarray(v_eval), np.asarray(v_star), atol=1e-4)


def test_greedy_rollout_reaches_goal():
    """BASELINE config 5 gate (solver part): solver reaches optimal policy."""
    level = walls_and_goal_16x16()
    model = build_model_table(SEM, level)
    _, policy, _ = value_iteration(model, gamma=GAMMA, theta=THETA)
    obs, ret, length, done = run_greedy_episode(
        SEM, level, policy, jax.random.PRNGKey(0), max_steps=64
    )
    assert bool(done)
    # goal is bottom-right; shortest path in this layout is 34 moves
    from griduniverse_tpu.core import semantics as S

    grid = np.asarray(level.grid).reshape(-1)
    final_obs = int(np.asarray(obs)[int(length) - 1])
    assert grid[final_obs] == S.GOAL
    assert float(ret) == -(int(length) - 1) * 1.0 + 10.0
