"""Per-row time budgets for the three low-utilization bench rows
(VERDICT r4 next #3): reconcile measured wall-clock against modeled
compute + traffic + measured overhead terms, per row, on the TPU.

Rows and method:
  * vi_mazes_64k — time t(k) at capped sweep counts k; the slope is the
    true ms/sweep and the intercept the fixed overhead (dispatch +
    argmax epilogue). A fori_loop variant with NO convergence check
    isolates the cost of the per-sweep max|dV| reduction.
  * qlearn_mazes_64k — time per transition vs (a) a bf16-table variant
    (halves the (N, S, A) stream: if the row is HBM-bound it must
    speed up ~2x) and (b) modeled terms from the HLO op count
    (tools/hlo_op_probe.py) and the mandatory table traffic.
  * qlearn_fast_64k — no probe needed: the account is analytic (the
    factored matmuls have K=16 / N<=128, so the MXU's 128x128 tiles are
    >=87% padding; the shape-constrained ceiling is ~12.3 TFLOP/s and
    the row's measured 10.0 TFLOP/s is ~82% of it). Recorded in
    docs/PERFORMANCE.md §16.

Results are written into docs/PERFORMANCE.md §16 (r5).

Run on the TPU: timeout 900 python tools/row_budget_probe.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from griduniverse_tpu import make_semantics
from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.core.types import Level
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.algos.dp_batched import (
    _grid_backup,
    _static_geometry,
    _vi_grid_impl,
)

SEM = make_semantics()
B = 65_536
REPEATS = 3


def fenced(run, repeats=REPEATS):
    run()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


@partial(jax.jit, static_argnames=("geom", "iters"))
def _vi_fixed_sweeps(sem, grids, geom, gamma, iters):
    """VI with a FIXED sweep count and no convergence check — isolates
    the per-sweep cost of the max|dV| reduction in the production loop."""
    backup, (n, s) = _grid_backup(sem, grids, geom, gamma)

    def body(_, v):
        return jnp.max(backup(v), axis=-1)

    v = jax.lax.fori_loop(0, iters, body, jnp.zeros((n, s), jnp.float32))
    return v


def main():
    print(f"device: {jax.devices()[0]}")
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(7), (4, 4), B, algorithm="binary_tree"
    )
    goal_grids = grids.at[:, 7, 7].set(S.GOAL)
    vi_levels = Level(
        grid=goal_grids, start_idx=jnp.broadcast_to(start, (B,))
    )
    geom = _static_geometry(SEM, vi_levels)

    # --- vi_mazes: t(k) ladder through the PRODUCTION while_loop
    print("\n== vi_mazes_64k: sweep-count ladder (production while_loop)")
    rows = []
    for k in (3, 8, 13, 23):
        t = fenced(
            lambda k=k: float(
                _vi_grid_impl(SEM, vi_levels.grid, geom, 0.99, 1e-6, k)[2]
            )
        )
        rows.append((k, t))
        print(f"  max_iters={k:3d}: {t * 1e3:8.1f} ms")
    (k1, t1), (k2, t2) = rows[0], rows[-1]
    per_sweep = (t2 - t1) / (k2 - k1)
    fixed = t1 - k1 * per_sweep
    print(
        f"  slope {per_sweep * 1e3:.2f} ms/sweep, fixed overhead "
        f"{fixed * 1e3:.1f} ms (dispatch + policy argmax epilogue)"
    )

    # --- fixed-sweep fori_loop (no convergence check)
    print("== vi_mazes_64k: fori_loop, NO convergence check")
    for k in (8, 23):
        t = fenced(
            lambda k=k: float(
                _vi_fixed_sweeps(SEM, vi_levels.grid, geom, 0.99, k)[0, 0]
            )
        )
        print(f"  iters={k:3d}: {t * 1e3:8.1f} ms")

    # HLO body cost of one production sweep
    c = _vi_grid_impl.lower(
        SEM, vi_levels.grid, geom, 0.99, 1e-6, 10_000
    ).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    print(
        f"  HLO body: flops={ca['flops']:.3e} bytes={ca['bytes accessed']:.3e}"
        f" -> modeled arith {ca['flops'] / 6.16e12 * 1e3:.2f} ms/sweep @6.16T,"
        f" traffic {ca['bytes accessed'] / 819e9 * 1e3:.2f} ms/sweep @819GB/s"
    )

    # --- qlearn_mazes: f32 vs bf16 tables (probe-local loop so the
    # carry dtype stays put; same primitives as algos/td_batched.py)
    from griduniverse_tpu.algos.td import epsilon_greedy
    from griduniverse_tpu.algos.td_batched import q_learning_batched
    from griduniverse_tpu.ops.bitplane import (
        _select_tree,
        pack_level,
        reset_bits,
        step_bits,
    )

    ql_steps = 2_000
    print("\n== qlearn_mazes_64k: f32 vs bf16 Q tables")
    t_prod = fenced(
        lambda: float(
            q_learning_batched(
                SEM, vi_levels, jax.random.PRNGKey(0), num_steps=ql_steps,
                max_episode_steps=512,
            ).episodes
        )
    )
    print(
        f"  production f32: {t_prod:6.2f} s = "
        f"{ql_steps * B / t_prod:.3e} trans/s "
        f"({t_prod / ql_steps * 1e6:.0f} us/step)"
    )

    bl = pack_level(vi_levels)

    @partial(jax.jit, static_argnames=("dtype",))
    def ql_dtype(key, dtype):
        s_dim = bl.height * bl.width
        q0 = jnp.zeros((B, s_dim, 4), dtype)
        state0 = reset_bits(bl, None)

        def rows(q, s):
            return _select_tree(
                [q[:, k, :] for k in range(s_dim)], s[:, None]
            )

        def body(carry, t):
            q, state, a = carry
            s = state.agent_idx
            new_state, (s2, r, d) = step_bits(SEM, bl, state, a, True, 512)
            rows_s = rows(q, s)
            rows_s2 = rows(q, s2)
            hot_a = jax.nn.one_hot(a, 4, dtype=q.dtype)
            q_sa = jnp.sum(rows_s * hot_a, axis=-1)
            key_t = jax.random.fold_in(key, t)
            a_next = epsilon_greedy(rows_s2, key_t, 0.1)
            boot = jnp.max(rows_s2, axis=-1)
            delta = (
                r.astype(q.dtype)
                + jnp.asarray(0.99, q.dtype)
                * jnp.where(d, jnp.zeros((), q.dtype), boot)
                - q_sa
            )
            hot_s = jax.nn.one_hot(s, s_dim, dtype=q.dtype)
            q = q + jnp.asarray(0.1, q.dtype) * delta[:, None, None] * (
                hot_s[:, :, None] * hot_a[:, None, :]
            )
            return (q, new_state, a_next), None

        a0 = jnp.zeros((B,), jnp.int32)
        (q, _, _), _ = jax.lax.scan(
            body, (q0, state0, a0),
            jnp.arange(ql_steps, dtype=jnp.int32),
        )
        return jnp.sum(q.astype(jnp.float32))

    for dtype, label in ((jnp.float32, "probe f32 "), (jnp.bfloat16, "probe bf16")):
        t = fenced(lambda d=dtype: float(ql_dtype(jax.random.PRNGKey(0), d)))
        print(
            f"  {label}: {t:6.2f} s = {ql_steps * B / t:.3e} trans/s "
            f"({t / ql_steps * 1e6:.0f} us/step)"
        )
    c = q_learning_batched.lower(
        SEM, vi_levels, jax.random.PRNGKey(0), num_steps=ql_steps,
        max_episode_steps=512,
    ).compile()
    ca = c.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    # unroll factor is 1 for this body (hlo_op_probe)
    print(
        f"  HLO body (1 step): flops={ca['flops']:.3e} "
        f"bytes={ca['bytes accessed']:.3e} -> modeled arith "
        f"{ca['flops'] / 6.16e12 * 1e6:.0f} us/step, traffic "
        f"{ca['bytes accessed'] / 819e9 * 1e6:.0f} us/step"
    )


if __name__ == "__main__":
    main()
