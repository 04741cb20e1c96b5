"""Benchmark harness — env-steps/s on the real TPU chip.

Runs the BASELINE.json vectorization ladder (1 / 4k / 16k / 64k envs) of
random-action auto-reset rollouts, each as ONE jitted lax.scan per timing
call (SURVEY.md §7.3–7.6: whole rollout inside one jit, donated buffers, no
host syncs inside the loop), plus the per-env-maze config. Prints exactly
ONE JSON line:

    {"metric": ..., "value": N, "unit": "env_steps_per_s", "vs_baseline": N}

`value` is the headline aggregate steps/s at the 64k-env config on this
chip. `vs_baseline` is value / 1e5 — the reference (TheMTank/GridUniverse)
publishes no numbers (BASELINE.md), so the baseline is the documented
order-of-magnitude estimate of its pure-Python step loop (~1e5 steps/s on
one CPU thread). Per-config numbers ride in "details".

Platform: uses the environment's default JAX platform — the axon-tunneled
TPU v5e on this box; do NOT force CPU here. Timings use block_until_ready
fencing; compile time is excluded (untimed warmup call per config).
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from griduniverse_tpu import make_semantics
from griduniverse_tpu.core.types import Level
from griduniverse_tpu.levels.builders import (
    empty_level,
    lava_level,
    walls_and_goal_16x16,
)
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.ops.rollout import reset_batch, rollout_random
from griduniverse_tpu.core.step import reset

REFERENCE_STEPS_PER_S = 1.0e5  # BASELINE.md: reference pure-Python estimate


@partial(jax.jit, static_argnames=("num_steps",), donate_argnums=(2,))
def _rollout_count(sem, level, state, key, num_steps: int):
    """Scan rollout returning only final state + a reward checksum — no
    (T, B) trajectory materialization, so the timing measures stepping, not
    HBM traffic for outputs nobody reads."""
    num_actions = sem.deltas.shape[0]
    batched = state.agent_idx.ndim == 1
    shape = state.agent_idx.shape
    from griduniverse_tpu.ops.rollout import _pick_step

    step_fn = _pick_step(level, batched, True)

    def body(carry, key_t):
        state, acc = carry
        actions = jax.random.randint(key_t, shape, 0, num_actions, jnp.int32)
        new_state, out = step_fn(sem, level, state, actions)
        return (new_state, acc + jnp.sum(out.reward)), None

    keys = jax.random.split(key, num_steps)
    (state, acc), _ = jax.lax.scan(body, (state, jnp.float32(0.0)), keys)
    return state, acc


def time_config(sem, level, batch: int | None, num_steps: int, repeats: int = 3):
    """Median steps/s over `repeats` timed calls (compile excluded)."""
    key = jax.random.PRNGKey(0)
    if batch is None:
        state = reset(level, key)
        b = 1
    else:
        state = reset_batch(level, key, batch)
        b = batch

    # warmup/compile (donated state: rebuild each call)
    s, acc = _rollout_count(sem, level, state, key, num_steps)
    jax.block_until_ready(acc)

    times = []
    for i in range(repeats):
        if batch is None:
            state = reset(level, jax.random.PRNGKey(i))
        else:
            state = reset_batch(level, jax.random.PRNGKey(i), batch)
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        s, acc = _rollout_count(sem, level, state, jax.random.PRNGKey(i), num_steps)
        jax.block_until_ready(acc)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return num_steps * b / dt


def main():
    sem = make_semantics()
    details = {}

    configs = [
        # (name, level, batch, scan length)
        ("cfg1_8x8_empty_1env", empty_level(8, 8, goal=True), None, 20_000),
        ("cfg2_16x16_walls_4k", walls_and_goal_16x16(), 4096, 2_000),
        ("cfg3_lava_16k", lava_level(), 16_384, 2_000),
        ("cfg4_64k", walls_and_goal_16x16(), 65_536, 1_000),
    ]
    for name, level, batch, steps in configs:
        details[name] = time_config(sem, level, batch, steps)
        print(f"{name}: {details[name]:,.0f} steps/s", file=sys.stderr)

    # config 4 variant: per-env procedural mazes (9x9), 64k envs
    b = 65_536
    grids, start = generate_mazes_device(jax.random.PRNGKey(7), (4, 4), b)
    mazes = Level(grid=grids, start_idx=jnp.full((b,), start, jnp.int32))
    details["cfg4_mazes_64k"] = time_config(sem, mazes, b, 500)
    print(f"cfg4_mazes_64k: {details['cfg4_mazes_64k']:,.0f} steps/s", file=sys.stderr)

    value = details["cfg4_64k"]
    print(
        json.dumps(
            {
                "metric": "env_steps_per_s_64k_envs_single_chip",
                "value": value,
                "unit": "env_steps_per_s",
                "vs_baseline": value / REFERENCE_STEPS_PER_S,
                "details": {k: round(v) for k, v in details.items()},
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
