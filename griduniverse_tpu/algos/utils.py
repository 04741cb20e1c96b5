"""Algorithm utilities — greedy extraction, policy rollouts, value plots.

Reference (SURVEY.md §2.1 #8): greedy-policy extraction from V/Q, episode
rollout with a policy (`run_episodes_with_greedy_policy`-style), value
plotting helpers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import ModelTable
from ..core.semantics import Semantics
from ..core.step import reset, step
from ..core.types import Level
from .dp import action_values


def greedy_policy_from_q(q: jnp.ndarray) -> jnp.ndarray:
    """(S, A) → (S,) int32 greedy policy; ties → lowest action index."""
    return jnp.argmax(q, axis=-1).astype(jnp.int32)


def greedy_policy_from_v(
    model: ModelTable, v: jnp.ndarray, gamma: float
) -> jnp.ndarray:
    """One-step lookahead greedy policy from a state-value function."""
    return jnp.argmax(action_values(model, v, gamma), axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_steps",))
def _run_greedy_episode(sem, level, policy, key, max_steps):
    state0 = reset(level, key)

    def body(state, _):
        a = policy[state.agent_idx]
        new_state, out = step(sem, level, state, a)
        return new_state, out

    final, traj = jax.lax.scan(body, state0, None, length=max_steps)
    total_return = jnp.sum(traj.reward)
    return traj.obs, total_return, final.t, final.done


def run_greedy_episode(
    sem: Semantics,
    level: Level,
    policy: jnp.ndarray,
    key: jnp.ndarray | None = None,
    max_steps: int = 200,
):
    """Deterministically follow a (S,) policy from the start state.

    Returns (obs_traj (T,), total_return, length, reached_terminal) — the
    functional `run_episodes_with_greedy_policy`. Freeze-on-done keeps shapes
    static; `length` counts real steps. The key only seeds EnvState
    bookkeeping (the rollout is deterministic), so it is optional.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    return _run_greedy_episode(sem, level, policy, key, max_steps)


def value_grid(v: jnp.ndarray, level: Level) -> np.ndarray:
    """(S,) value vector → (H, W) NumPy array for display/plotting."""
    return np.asarray(v).reshape(level.height, level.width)


def policy_arrows(
    policy: jnp.ndarray,
    level: Level,
    chars: str = "↑→↓←",
) -> str:
    """ASCII visualization of a deterministic policy (default action order
    UP/RIGHT/DOWN/LEFT — see core.semantics). Walls render '#', terminals '·'."""
    from ..core import semantics as S

    grid = np.asarray(level.grid)
    pol = np.asarray(policy).reshape(grid.shape)
    out = []
    for r in range(grid.shape[0]):
        row = []
        for c in range(grid.shape[1]):
            code = grid[r, c]
            if code == S.WALL:
                row.append("#")
            elif code in (S.LAVA, S.GOAL):
                row.append("·")
            else:
                row.append(chars[int(pol[r, c])])
        out.append("".join(row))
    return "\n".join(out)


def plot_value(v: jnp.ndarray, level: Level, path: str | None = None):
    """Heatmap of V over the grid (reference: matplotlib value plots).
    Import is deferred/gated so headless or matplotlib-less installs work."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("matplotlib is required for plot_value") from e

    fig, ax = plt.subplots()
    im = ax.imshow(value_grid(v, level), cmap="viridis")
    fig.colorbar(im, ax=ax, label="V(s)")
    ax.set_title("State values")
    if path is not None:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig
