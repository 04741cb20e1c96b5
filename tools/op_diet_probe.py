"""Rollout-engine op-diet experiment (VERDICT r2 next #9, stretch).

The cfg4 scan body writes ~134 elementwise ops/step against a ~40-op
theoretical floor (tools/op_budget.py), and measures AT the VPU's
arithmetic peak for that op count (docs/PERFORMANCE.md §3) — so the only
remaining lever is writing FEWER ops. Two concrete variants vs baseline,
each bit-compatible with the production engine's trajectories:

  A. baseline — ops.bitplane.random_scan_bits via compile_rollout_random
     (select-tree deltas, 4-array env carry).
  B. packed carry — agent_idx (14b) | agent_code (2b) | t (10b) packed
     into ONE uint32 carry word: 3 autoreset/freeze selects collapse to 1,
     at the price of unpack/pack shifts each step.
  C. arithmetic deltas — replace the two 3-where delta select trees with
     compare arithmetic: drow = (a==DOWN) - (a==UP), dcol = (a==RIGHT) -
     (a==LEFT).

Run: python tools/op_diet_probe.py   (on the TPU box)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from griduniverse_tpu import make_semantics
from griduniverse_tpu.levels.builders import walls_and_goal_16x16
from griduniverse_tpu.ops.bitplane import (
    compile_rollout_random,
    pack_level,
    tile_code,
    xorshift_init,
    xorshift_next,
    _per_code,
    _select_tree,
)
from griduniverse_tpu.utils.profiling import fence

B = 65_536
STEPS = 50_000
MAX_EP = 512
UNROLL = 16


def timeit(fn, label):
    out = fn(jnp.uint32(0))
    fence(out[1]["episodes"] if isinstance(out, tuple) else out)
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = fn(jnp.uint32(i + 1))
        fence(out[1]["episodes"] if isinstance(out, tuple) else out)
        best = min(best, time.perf_counter() - t0)
    rate = B * STEPS / best
    print(f"{label}: {best:.3f}s -> {rate/1e9:.2f}e9 steps/s")
    return rate


def compile_variant(sem, bl, packed_carry=False, arith_deltas=False):
    sem_c = jax.tree.map(np.asarray, sem)
    bl_c = jax.tree.map(np.asarray, bl)
    h, w = bl_c.height, bl_c.width
    num_actions = int(np.asarray(sem_c.deltas).shape[0])

    def deltas_of(a):
        if arith_deltas:
            # semantics ordering: rows of sem.deltas; derive by compare
            d = np.asarray(sem_c.deltas)
            drow = sum(
                jnp.where(a == i, int(d[i, 0]), 0) for i in range(num_actions)
                if d[i, 0]
            )
            dcol = sum(
                jnp.where(a == i, int(d[i, 1]), 0) for i in range(num_actions)
                if d[i, 1]
            )
            return drow, dcol
        drow = _select_tree(
            [sem_c.deltas[i, 0] for i in range(num_actions)], a
        )
        dcol = _select_tree(
            [sem_c.deltas[i, 1] for i in range(num_actions)], a
        )
        return drow, dcol

    def fn_body(seed):
        start_idx = jnp.broadcast_to(jnp.asarray(bl_c.start_idx), (B,)).astype(jnp.int32)
        start_code = jnp.broadcast_to(jnp.asarray(bl_c.start_code), (B,)).astype(jnp.int32)
        rs0 = xorshift_init(seed, (B,))
        zf = jnp.zeros((B,), jnp.float32)
        zi = jnp.zeros((B,), jnp.int32)

        if packed_carry:
            word0 = start_idx | (start_code << 14)  # t=0 in high bits

            def body(carry, _):
                word, rs, run_ret, n_eps, ret_sum, len_sum = carry
                rs, bits = xorshift_next(rs)
                a = ((bits >> 9) % jnp.uint32(num_actions)).astype(jnp.int32)
                idx = word & 0x3FFF
                code = (word >> 14) & 3
                t = word >> 16
                row = idx // w
                col = idx - row * w
                drow, dcol = deltas_of(a)
                nrow, ncol = row + drow, col + dcol
                inb = (nrow >= 0) & (nrow < h) & (ncol >= 0) & (ncol < w)
                cand = jnp.clip(nrow, 0, h - 1) * w + jnp.clip(ncol, 0, w - 1)
                cand_code = tile_code(bl_c, cand)
                blocked = ~inb | ~_per_code(sem_c.passable, cand_code)
                new_idx = jnp.where(blocked, idx, cand)
                new_code = jnp.where(blocked, code, cand_code)
                reward = _per_code(sem_c.reward, new_code)
                done = _per_code(sem_c.terminal, new_code) | ((t + 1) >= MAX_EP)
                ep_len = t + 1
                new_word = jnp.where(
                    done,
                    word0,
                    new_idx | (new_code << 14) | ((t + 1) << 16),
                )
                run_ret = run_ret + reward
                n_eps = n_eps + done
                ret_sum = ret_sum + jnp.where(done, run_ret, 0.0)
                len_sum = len_sum + jnp.where(done, ep_len, 0)
                run_ret = jnp.where(done, 0.0, run_ret)
                return (new_word, rs, run_ret, n_eps, ret_sum, len_sum), None

            init = (word0, rs0, zf, zi, zf, zi)
        else:

            def body(carry, _):
                idx, code, t, rs, run_ret, n_eps, ret_sum, len_sum = carry
                rs, bits = xorshift_next(rs)
                a = ((bits >> 9) % jnp.uint32(num_actions)).astype(jnp.int32)
                row = idx // w
                col = idx - row * w
                drow, dcol = deltas_of(a)
                nrow, ncol = row + drow, col + dcol
                inb = (nrow >= 0) & (nrow < h) & (ncol >= 0) & (ncol < w)
                cand = jnp.clip(nrow, 0, h - 1) * w + jnp.clip(ncol, 0, w - 1)
                cand_code = tile_code(bl_c, cand)
                blocked = ~inb | ~_per_code(sem_c.passable, cand_code)
                new_idx = jnp.where(blocked, idx, cand)
                new_code = jnp.where(blocked, code, cand_code)
                reward = _per_code(sem_c.reward, new_code)
                done = _per_code(sem_c.terminal, new_code) | ((t + 1) >= MAX_EP)
                ep_len = t + 1
                idx = jnp.where(done, start_idx, new_idx)
                code = jnp.where(done, start_code, new_code)
                t = jnp.where(done, 0, t + 1)
                run_ret = run_ret + reward
                n_eps = n_eps + done
                ret_sum = ret_sum + jnp.where(done, run_ret, 0.0)
                len_sum = len_sum + jnp.where(done, ep_len, 0)
                run_ret = jnp.where(done, 0.0, run_ret)
                return (idx, code, t, rs, run_ret, n_eps, ret_sum, len_sum), None

            init = (start_idx, start_code, zi, rs0, zf, zi, zf, zi)

        carry, _ = jax.lax.scan(body, init, None, length=STEPS, unroll=UNROLL)
        n_eps, ret_sum = carry[-3], carry[-2]
        n = jnp.sum(n_eps)
        return None, {"episodes": n, "mean_return": jnp.sum(ret_sum) / jnp.maximum(n, 1)}

    return jax.jit(fn_body)


def main():
    sem = make_semantics()
    bl = pack_level(walls_and_goal_16x16())
    print("device:", jax.devices()[0])

    base = compile_rollout_random(sem, bl, B, STEPS, max_episode_steps=MAX_EP)
    r_a = timeit(base, "A baseline (production engine)")
    r_a2 = timeit(
        compile_variant(sem, bl), "A' reimpl sanity (should match A)"
    )
    r_b = timeit(
        compile_variant(sem, bl, packed_carry=True), "B packed carry"
    )
    r_c = timeit(
        compile_variant(sem, bl, arith_deltas=True), "C arithmetic deltas"
    )
    r_bc = timeit(
        compile_variant(sem, bl, packed_carry=True, arith_deltas=True),
        "B+C combined",
    )
    print(
        f"vs baseline: A'={r_a2/r_a:.2f}x B={r_b/r_a:.2f}x "
        f"C={r_c/r_a:.2f}x B+C={r_bc/r_a:.2f}x"
    )


if __name__ == "__main__":
    main()
