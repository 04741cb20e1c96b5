"""TPU shape canary: checks the grid-form batched-VI loop for the
N=2^17 miscompile (r5) and scans neighboring shapes.

Finding (2026-08-21, axon TPU v5e tunnel, jax 0.9.0): with 9×9 mazes
and a batch of EXACTLY 131072 (= 2^17), the static-candidate backup
(`algos.dp_batched._grid_backup`) inside a fori/while loop computes
WRONG values for rows >= 32768 — e.g. after 2 sweeps row 65536 differs
from the same maze solved in a 64-row batch by ~12.0 (goal rewards
never propagate; VI then "converges" at ~1231 iters of pure γ-decay to
wrong answers, silently). Evidence of an XLA/axon codegen edge, not a
program bug:

  * ONE backup application at N=2^17 is bit-correct; only the
    loop-carried composition is wrong.
  * CPU at the identical shape is correct.
  * N = 98304, 196608, 262144 and 2^17 ± 64 are all correct.
  * 5×5 grids at N=2^17 are correct (the trigger involves the 9×9
    operand geometry, likely a tiling boundary at N·S·A = 2^17·324).
  * The TABLE-form solver (value_iteration_batched) at N=2^17 is
    correct.

Mitigation in tree: `algos.dp_batched._pad_bad_batch` pads the one
known-bad batch size by 64 duplicate mazes inside the grid-form
wrappers (~0.05% extra work). The maze-axis-SHARDED grid solvers are
NOT padded — avoid per-shard local batches of exactly 2^17.

Run this canary on the TPU after any toolchain change; it prints PASS
when the raw (unpadded) impl computes correctly again, i.e. when the
pad guard can be retired:

    timeout 900 python tools/tpu_shape_canary.py
"""

from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from griduniverse_tpu import make_semantics
from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.core.types import Level
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.algos.dp_batched import _grid_backup, _static_geometry

SEM = make_semantics()


@partial(jax.jit, static_argnames=("geom", "iters"))
def k_sweeps(sem, grids, geom, iters):
    backup, (n, s) = _grid_backup(sem, grids, geom, 0.99)

    def body(_, v):
        return jnp.max(backup(v), axis=-1)

    return jax.lax.fori_loop(0, iters, body, jnp.zeros((n, s), jnp.float32))


def check(b: int) -> bool:
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(7), (4, 4), b, algorithm="binary_tree"
    )
    gg = grids.at[:, 7, 7].set(S.GOAL)
    geom = _static_geometry(
        SEM, Level(grid=gg, start_idx=jnp.broadcast_to(start, (b,)))
    )
    vb = k_sweeps(SEM, gg, geom, 2)
    ok = True
    for row in (0, b // 2, b - 64):
        vs = k_sweeps(SEM, gg[row : row + 64], geom, 2)
        d = float(np.abs(np.asarray(vb[row]) - np.asarray(vs[0])).max())
        status = "ok " if d < 1e-5 else "BAD"
        print(f"  N={b:7d} row={row:7d}: diff={d:8.4f} {status}")
        ok = ok and d < 1e-5
    return ok


def main():
    print(f"device: {jax.devices()[0]}")
    all_ok = True
    for b in (65_536, 98_304, 131_072, 196_608, 262_144):
        all_ok = check(b) and all_ok
    print(
        "PASS — pad guard (_pad_bad_batch) can be retired"
        if all_ok
        else "FAIL — keep algos.dp_batched._pad_bad_batch"
    )


if __name__ == "__main__":
    main()
