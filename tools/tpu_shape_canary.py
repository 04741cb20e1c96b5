"""TPU shape canary: checks the grid-form batched-VI loop for the
shape-specific loop miscompiles (r5) across known-bad and neighboring
shapes.

Findings (2026-08-21, axon TPU v5e tunnel, jax 0.9.0): the
static-candidate backup (`algos.dp_batched._grid_backup`) inside a
fori/while loop computes WRONG values at specific (grid, batch)
shapes:

  * 9×9 mazes at batch EXACTLY 131072 (= 2^17): rows >= 32768 wrong
    (goal rewards never propagate; VI then "converges" at ~1231 iters
    of pure γ-decay to wrong answers, silently). 2^17 ± 64 and
    98304/196608/262144 are all correct; 5×5 grids at 2^17 correct.
  * 33×33 mazes at batch 16384: ALL rows wrong; 8192 correct.

Evidence of an XLA/axon codegen edge, not a program bug: ONE backup
application at the same shape is bit-correct (only the loop-carried
composition is wrong), CPU is correct, the TABLE-form solver is
correct, and the bit-packed rollout engine at the same shapes is
bit-equal to CPU.

Mitigations in tree: `algos.dp_batched._pad_bad_batch` pads the
cataloged 2^17 batch, and `_validated_solve` slice-checks every large
grid-form solve and auto-splits on mismatch (docs/PERFORMANCE.md
§16.5), so uncataloged bad shapes yield correct answers at ~2× cost.
The maze-axis-SHARDED grid solvers have neither guard — avoid
per-shard local batches at the cataloged shapes.

Run this canary on the TPU after any toolchain change; it prints PASS
when the raw (unguarded) impl computes correctly again, i.e. when the
guards can be retired:

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


def check(b: int, cells: int = 4) -> bool:
    h = 2 * cells + 1
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(7), (cells, cells), b, algorithm="binary_tree"
    )
    gg = grids.at[:, h - 2, h - 2].set(S.GOAL)
    geom = _static_geometry(
        SEM, Level(grid=gg, start_idx=jnp.broadcast_to(start, (b,)))
    )
    vb = k_sweeps(SEM, gg, geom, 2)
    ok = True
    for row in (0, b // 2, b - 64):
        vs = k_sweeps(SEM, gg[row : row + 64], geom, 2)
        d = float(np.abs(np.asarray(vb[row]) - np.asarray(vs[0])).max())
        status = "ok " if d < 1e-5 else "BAD"
        print(
            f"  {h}x{h} N={b:7d} row={row:7d}: diff={d:8.4f} {status}"
        )
        ok = ok and d < 1e-5
    return ok


def main():
    print(f"device: {jax.devices()[0]}")
    all_ok = True
    for b in (65_536, 98_304, 131_072, 196_608, 262_144):
        all_ok = check(b, cells=4) and all_ok
    for b in (8_192, 16_384):
        all_ok = check(b, cells=16) and all_ok
    print(
        "PASS — the dp_batched shape guards can be retired"
        if all_ok
        else "FAIL — keep _pad_bad_batch and _validated_solve"
    )


if __name__ == "__main__":
    main()
