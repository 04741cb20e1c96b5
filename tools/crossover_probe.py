"""Select-tree vs gather crossover on TPU across state-space sizes
(VERDICT r4 next #1 — the large-grid frontier).

Two lookups scale differently with S = H·W:

  * STEP ENGINE (ops/bitplane.py): candidate-tile lookup = select tree
    over ceil(S/16) packed words — linear in S/16 per step.
    The alternative is the generic gather step (core/step.py +
    ops/rollout.py), whose dynamic gather serializes on this TPU
    (~565 µs per 64k-gather) but is S-independent.
  * BATCHED SOLVER (algos/dp_batched.py `_successor_values`):
    per-state select tree — S−1 selects over (N, S, A) lanes, so
    QUADRATIC in S per sweep — vs a vmapped per-maze gather
    (S-independent per lane). `lookup="auto"` switches at
    `_SELECT_TREE_MAX_STATES`; this probe sets that constant from data.
    (The grid-form backup sidesteps the choice entirely — static
    reindex, constant per lane — and is measured as the reference.)

Method: fixed-sweep/step timings, fetch-fenced, best-of-3; solver
per-sweep cost from t(10 sweeps) − t(2 sweeps) so the fixed per-call
overhead (docs/PERFORMANCE.md §16.3) cancels. N is scaled down as S
grows to hold N·S·A lanes comparable. Run sections individually if the
tunnel is fragile:

    timeout 900 python tools/crossover_probe.py [step|solver]

Measured results and the thresholds they set: docs/PERFORMANCE.md §17.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from griduniverse_tpu import make_semantics
from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.core.types import Level
from griduniverse_tpu.levels.builders import empty_level
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.ops.bitplane import compile_rollout_random, pack_level

SEM = make_semantics()


def fenced(run, repeats=3):
    run()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_step():
    """Bit-packed word-tree step vs generic gather step, by grid size."""
    from functools import partial

    from griduniverse_tpu.ops.rollout import episode_stats, reset_batch

    @partial(jax.jit, static_argnames=("num_steps",))
    def gather_stats(sem, level, key, num_steps):
        state = reset_batch(level, key, 65_536)
        return episode_stats(
            sem, level, state, key, num_steps, max_episode_steps=512
        )

    print("== step engine: packed select tree vs dynamic-gather step")
    B = 65_536
    for h in (9, 17, 33, 65):
        # a real MAZE as the shared level: empty levels have identical
        # packed words, which lets XLA constant-fold the whole select
        # tree (measured: flat 2.55e10 steps/s to S=4225 on empty
        # levels — a degenerate case, not the engine's cost)
        cells = (h - 1) // 2
        g, start = generate_mazes_device(
            jax.random.PRNGKey(5), (cells, cells), 1,
            algorithm="binary_tree",
        )
        level = Level(
            grid=g[0].at[h - 2, h - 2].set(S.GOAL),
            start_idx=start,
        )
        steps = 50_000  # long enough that the ~22 ms dispatch is <20%
        fn = compile_rollout_random(
            SEM, pack_level(level), B, steps, max_episode_steps=512
        )
        t = fenced(lambda: float(fn(jnp.uint32(1))[1]["episodes"]))
        bit_rate = steps * B / t
        # gather path: far slower — tiny scan is enough to rate it
        gsteps = 50
        t = fenced(
            lambda: float(
                gather_stats(
                    SEM, level, jax.random.PRNGKey(0), gsteps
                )[1]["episodes"]
            )
        )
        gat_rate = gsteps * B / t
        print(
            f"  {h:3d}x{h:<3d} (S={h * h:5d}, {-(-h * h // 16):3d} words): "
            f"packed {bit_rate:.3e} steps/s | gather {gat_rate:.3e} | "
            f"packed/gather {bit_rate / gat_rate:7.1f}x"
        )


def probe_solver():
    """Batched-VI successor lookup: select_tree vs gather vs grid-form,
    per-sweep cost by S (N scaled to hold lanes comparable)."""
    from griduniverse_tpu.algos import value_iteration_batched_grid
    from griduniverse_tpu.algos.dp_batched import (
        build_model_tables,
        value_iteration_batched,
    )

    print("== batched-VI successor lookup, per-sweep cost")
    shapes = [(4, 16_384), (8, 4_096), (16, 1_024), (32, 256)]
    for cells, n in shapes:
        h = 2 * cells + 1
        s = h * h
        grids, start = generate_mazes_device(
            jax.random.PRNGKey(3), (cells, cells), n,
            algorithm="binary_tree",
        )
        lv = Level(
            grid=grids.at[:, h - 2, h - 2].set(S.GOAL),
            start_idx=jnp.broadcast_to(start, (n,)),
        )
        models = build_model_tables(SEM, lv)

        def sweep_cost(lookup):
            t2 = fenced(
                lambda: float(
                    value_iteration_batched(
                        models, max_iters=2, lookup=lookup
                    )[2]
                )
            )
            t10 = fenced(
                lambda: float(
                    value_iteration_batched(
                        models, max_iters=10, lookup=lookup
                    )[2]
                )
            )
            return (t10 - t2) / 8

        line = f"  {h:3d}x{h:<3d} (S={s:5d}, N={n:6d}):"
        # the select tree is S-1 jnp.where's per lookup: past ~1k states
        # the PROGRAM itself is the cost (compile minutes/crash risk) —
        # measured only where it is plausibly competitive
        if s <= 1100:
            st = sweep_cost("select_tree")
            line += f" select_tree {st * 1e3:8.2f} ms/sweep |"
        else:
            line += " select_tree      (skipped: program size) |"
        ga = sweep_cost("gather")
        line += f" gather {ga * 1e3:8.2f} |"

        def grid_cost():
            from functools import partial

            from griduniverse_tpu.algos.dp_batched import (
                _grid_backup,
                _static_geometry,
            )

            geom = _static_geometry(SEM, lv)

            @partial(jax.jit, static_argnames=("geom", "iters"))
            def k_sweeps(sem, grids, geom, iters):
                backup, (nn, ss) = _grid_backup(sem, grids, geom, 0.99)

                def body(_, v):
                    return jnp.max(backup(v), axis=-1)

                return jax.lax.fori_loop(
                    0, iters, body, jnp.zeros((nn, ss), jnp.float32)
                )

            t2 = fenced(lambda: float(k_sweeps(SEM, lv.grid, geom, 2)[0, 0]))
            t10 = fenced(
                lambda: float(k_sweeps(SEM, lv.grid, geom, 10)[0, 0])
            )
            return (t10 - t2) / 8

        gc = grid_cost()
        line += f" grid-form {gc * 1e3:8.2f}"
        print(line, flush=True)


def main():
    print(f"device: {jax.devices()[0]}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("step", "all"):
        probe_step()
    if which in ("solver", "all"):
        probe_solver()


if __name__ == "__main__":
    main()
