"""Policy evaluation utilities for the neural learners.

The counterpart of algos/utils.run_greedy_episode for NETWORK policies at
batch scale: roll every env's greedy policy in lockstep (freeze-on-done)
and report which envs reached a terminal tile. Works uniformly over the
three network families (index MLP, shared-level conv, per-env-level
conv — tile planes are derived automatically for a needs-tiles net) and
over shared or batched levels, so the per-env-level generalization
measurements of docs/PERFORMANCE.md §12 are one call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.semantics import Semantics
from ..core.types import Level
from ..ops.bitplane import pack_level, reset_bits, step_bits
from .a2c import _net_apply, _tiles_for


@partial(jax.jit, static_argnames=("net", "max_steps"))
def greedy_reached(
    sem: Semantics,
    net,
    params,
    levels: Level,
    max_steps: int = 60,
):
    """(B,) bool: did each env's greedy rollout SUCCEED — terminate on a
    positively-rewarded terminal (the goal) — within `max_steps`?
    Terminating on a negative terminal (lava) counts as failure, not
    success (an r3 review caught the any-terminal version scoring a
    walk-into-lava policy at 100%). Levels may be shared ((H, W) grid →
    a single env) or batched ((N, H, W) → one env per level)."""
    bl = pack_level(levels)
    tiles = _tiles_for(net, levels)
    st = reset_bits(bl, None if bl.batched else 1)

    def body(carry, _):
        st, reached = carry
        logits, _ = _net_apply(net, params, st.agent_idx, tiles)
        a = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        st, (_, reward, done) = step_bits(sem, bl, st, a, False, None)
        # freeze mode emits the terminal reward exactly once, then zeros —
        # so (done & reward > 0) fires only on the goal-entering step
        return (st, reached | (done & (reward > 0))), None

    (_, reached), _ = jax.lax.scan(
        body,
        (st, jnp.zeros(st.agent_idx.shape, bool)),
        None,
        length=max_steps,
    )
    return reached


def greedy_success_rate(
    sem: Semantics,
    net,
    params,
    levels: Level,
    max_steps: int = 60,
) -> jnp.ndarray:
    """Scalar fraction of envs whose greedy policy reaches the GOAL (a
    positively-rewarded terminal) within `max_steps` — the held-out
    generalization metric of tests/test_perenv_levels.py and
    examples/11."""
    return jnp.mean(greedy_reached(sem, net, params, levels, max_steps))
