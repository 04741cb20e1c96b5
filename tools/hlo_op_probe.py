"""HLO-derived per-unit op counts for the bench ROOFLINE (VERDICT r4
next #4: replace written-op models with compiled-HLO-derived counts).

Method: every VPU bench row is one `lax.scan`/`while_loop` program. TPU
`compiled.cost_analysis()['flops']` counts the while BODY ONCE
(verified: flops is invariant to trip count), and XLA unrolls scan
bodies by a factor U (read off the loop trip-count constant: a scan of
length L compiled to a loop of L/U iterations). So

    ops_per_unit = flops_body / (batch * U)        (scan rows)
    ops_per_sweep = flops_body / N                 (dynamic while rows)

`flops` here counts elementwise integer/bool ops too (measured: the
int-dominated step program reports ~135 'flops'/step against the
hand-audited 134 written ops — the two models agree to ~1%), so it is
an executed-op count, not a float-only count.

The probe prints the table that bench.py's ROOFLINE constants cite.
Run on the TPU (programs are the bench shapes, so compiles are cached):

    timeout 900 python tools/hlo_op_probe.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
from griduniverse_tpu.ops.bitplane import compile_rollout_random, pack_level

SEM = make_semantics()
MAX_EP = 512


def body_flops_and_unroll(compiled, scan_len: int):
    """(flops of the rolled loop body, unroll factor U) — U from the
    trip-count constant K in the optimized HLO with scan_len % K == 0."""
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    txt = compiled.as_text()
    consts = {int(m) for m in re.findall(r"constant\((\d+)\)", txt)}
    trips = [
        k for k in consts
        if 0 < k <= scan_len and scan_len % k == 0 and scan_len // k <= 64
    ]
    if not trips:
        raise RuntimeError(f"no trip-count constant found for L={scan_len}")
    # the trip count is the LARGEST divisor of L present (unroll factors
    # are small powers of two; smaller divisors would imply huge unrolls)
    trip = max(trips)
    return float(ca["flops"]), scan_len // trip


def report_scan(name, jitted, args, batch, scan_len):
    c = jitted.lower(*args).compile()
    flops, u = body_flops_and_unroll(c, scan_len)
    per_unit = flops / (batch * u)
    print(
        f"{name:22s} body_flops={flops:14.0f} unroll={u:3d} "
        f"ops/unit={per_unit:8.1f}"
    )
    return per_unit


def main():
    print(f"device: {jax.devices()[0]}")

    rows = [
        ("cfg1b_scan_1env_tpu", empty_level(8, 8, goal=True), 1, 100_000),
        ("cfg2_16x16_walls_4k", walls_and_goal_16x16(), 4096, 100_000),
        ("cfg3_lava_16k", lava_level(), 16_384, 100_000),
        ("cfg4_64k", walls_and_goal_16x16(), 65_536, 100_000),
    ]
    for name, level, batch, steps in rows:
        fn = compile_rollout_random(
            SEM, pack_level(level), batch, steps, max_episode_steps=MAX_EP
        )
        report_scan(name, fn, (jnp.uint32(0),), batch, steps)

    # per-env mazes rollout (bench cfg4_mazes_64k shape)
    b = 65_536
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(7), (4, 4), b, algorithm="binary_tree"
    )
    mazes = Level(grid=grids, start_idx=jnp.full((b,), start, jnp.int32))
    bl = jax.jit(pack_level)(mazes)
    fn = compile_rollout_random(SEM, bl, b, 50_000, max_episode_steps=MAX_EP)
    report_scan("cfg4_mazes_64k", fn, (jnp.uint32(0),), b, 50_000)

    # batched grid-form VI: dynamic while (no unroll) — flops = ONE sweep
    from griduniverse_tpu.algos import value_iteration_batched_grid
    from griduniverse_tpu.core import semantics as S

    goal_grids = grids.at[:, 7, 7].set(S.GOAL)
    vi_levels = Level(
        grid=goal_grids, start_idx=jnp.broadcast_to(start, (b,))
    )
    from griduniverse_tpu.algos.dp_batched import (
        _static_geometry,
        _vi_grid_impl,
    )

    geom = _static_geometry(SEM, vi_levels)
    c = _vi_grid_impl.lower(
        SEM, vi_levels.grid, geom, 0.99, 1e-6, 10_000
    ).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    iters = float(value_iteration_batched_grid(SEM, vi_levels)[2])
    print(
        f"{'vi_mazes_64k':22s} body_flops={ca['flops']:14.0f} "
        f"sweeps={iters:.0f} ops/maze-sweep={ca['flops'] / b:8.1f} "
        f"ops/maze={ca['flops'] * iters / b:10.1f}"
    )

    # per-maze sampled TD (qlearn_mazes_64k shape)
    from griduniverse_tpu.algos.td_batched import q_learning_batched

    ql_steps = 2_000
    c = q_learning_batched.lower(
        SEM, vi_levels, jax.random.PRNGKey(0), num_steps=ql_steps,
        max_episode_steps=MAX_EP,
    ).compile()
    flops, u = body_flops_and_unroll(c, ql_steps)
    print(
        f"{'qlearn_mazes_64k':22s} body_flops={flops:14.0f} unroll={u:3d} "
        f"ops/transition={flops / (b * u):8.1f}"
    )


if __name__ == "__main__":
    main()
