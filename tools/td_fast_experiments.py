"""Experiment harness: factorized one-hot TD step vs the r1 baseline.

VERDICT r1 weakness #1: the fast TD learner materializes three (B, S)
bf16 one-hots per step (~100 MB at B=64k, S=256) and runs at ~420 GB/s of
v5e's ~819 GB/s HBM. The factorization lever: write s = hi·L + lo with
S = H·L; then

  one_hot(s)            = one_hot_H(hi) ⊗ one_hot_L(lo)     (outer product)
  Q-row lookup          : y = p_hi @ Q.reshape(H, L·A); q_rows = Σ_lo p_lo·y
  V(s') lookup          : t = p2_hi @ V.reshape(H, L); v_s2 = Σ_lo p2_lo·t
  scatter-add update    : w = p_lo ⊙ u (B, L·2A); ZZ = p_hiᵀ @ w → (H, L·2A)

so the only (B, ·) operands that touch HBM are (B, H) and (B, L·2A) —
at H=64, L=4 that's ~5× fewer one-hot bytes than (B, 256).

Run on the real chip:  python tools/td_fast_experiments.py
(fetch-fenced timing — block_until_ready does not block on the axon
tunnel, docs/PERFORMANCE.md §1).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from griduniverse_tpu import make_semantics
from griduniverse_tpu.algos.td_fast import _epsilon_greedy_bits
from griduniverse_tpu.levels.builders import walls_and_goal_16x16
from griduniverse_tpu.ops.bitplane import (
    pack_level,
    reset_bits,
    step_bits,
    xorshift_init,
    xorshift_next,
)

B = 65_536
STEPS = 2_000
ALPHA, GAMMA, EPS = 0.1, 0.99, 0.1
MAX_EP = 512


def baseline_scan(sem_c, bl_c):
    """The r1 td_scan_fast body (three (B, S) one-hots)."""
    S = bl_c.height * bl_c.width
    A = 4
    bf16, f32 = jnp.bfloat16, jnp.float32

    def body(carry, _):
        q, state, rs = carry
        rs, bits = xorshift_next(rs)
        p_s = jax.nn.one_hot(state.agent_idx, S, dtype=bf16)
        q_rows = jnp.matmul(p_s, q.astype(bf16), preferred_element_type=f32)
        a = _epsilon_greedy_bits(q_rows, bits, EPS)
        state, (s2, r, d) = step_bits(sem_c, bl_c, state, a, True, MAX_EP)
        p_s2 = jax.nn.one_hot(s2, S, dtype=bf16)
        v = jnp.max(q, axis=-1)
        v_s2 = jnp.matmul(
            p_s2, v.astype(bf16)[:, None], preferred_element_type=f32
        )[:, 0]
        p_a = jax.nn.one_hot(a, A, dtype=f32)
        q_sa = jnp.sum(q_rows * p_a, axis=-1)
        delta = r + GAMMA * jnp.where(d, 0.0, v_s2) - q_sa
        u = jnp.concatenate(
            [p_a * (ALPHA * delta)[:, None], p_a], axis=-1
        ).astype(bf16)
        zz = jnp.einsum("bs,bz->sz", p_s, u, preferred_element_type=f32)
        dq, cnt = zz[:, :A], zz[:, A:]
        q = q + dq / jnp.maximum(cnt, 1.0)
        return (q, state, rs), None

    return body


def factored_scan(sem_c, bl_c, H, L):
    """Factorized one-hots: hi/lo split with S = H*L."""
    S = bl_c.height * bl_c.width
    assert H * L == S, (H, L, S)
    A = 4
    bf16, f32 = jnp.bfloat16, jnp.float32

    def body(carry, _):
        q, state, rs = carry
        rs, bits = xorshift_next(rs)
        s = state.agent_idx
        p_hi = jax.nn.one_hot(s // L, H, dtype=bf16)       # (B, H)
        p_lo = jax.nn.one_hot(s % L, L, dtype=bf16)        # (B, L)

        # Q-row lookup: (B,H) @ (H, L*A) then contract lo
        y = jnp.matmul(
            p_hi, q.astype(bf16).reshape(H, L * A), preferred_element_type=f32
        ).reshape(-1, L, A)
        q_rows = jnp.sum(p_lo.astype(f32)[:, :, None] * y, axis=1)  # (B, A)
        a = _epsilon_greedy_bits(q_rows, bits, EPS)

        state, (s2, r, d) = step_bits(sem_c, bl_c, state, a, True, MAX_EP)

        # V(s2) lookup, same factorization
        v = jnp.max(q, axis=-1)
        p2_hi = jax.nn.one_hot(s2 // L, H, dtype=bf16)
        p2_lo = jax.nn.one_hot(s2 % L, L, dtype=bf16)
        t = jnp.matmul(
            p2_hi, v.astype(bf16).reshape(H, L), preferred_element_type=f32
        )
        v_s2 = jnp.sum(p2_lo.astype(f32) * t, axis=-1)

        p_a = jax.nn.one_hot(a, A, dtype=f32)
        q_sa = jnp.sum(q_rows * p_a, axis=-1)
        delta = r + GAMMA * jnp.where(d, 0.0, v_s2) - q_sa

        # update: w[b, lo*2A+z] = p_lo * u ; ZZ = p_hi^T @ w
        u = jnp.concatenate(
            [p_a * (ALPHA * delta)[:, None], p_a], axis=-1
        ).astype(bf16)                                     # (B, 2A)
        w = (p_lo[:, :, None] * u[:, None, :]).reshape(-1, L * 2 * A)
        zz = jnp.einsum(
            "bh,bw->hw", p_hi, w, preferred_element_type=f32
        ).reshape(H, L, 2 * A).reshape(S, 2 * A)
        dq, cnt = zz[:, :A], zz[:, A:]
        q = q + dq / jnp.maximum(cnt, 1.0)
        return (q, state, rs), None

    return body


def compile_run(body_fn, S):
    @jax.jit
    def fn(seed):
        q0 = jnp.zeros((S, 4), jnp.float32)
        state = reset_bits(BL_C, B)
        rs = xorshift_init(seed, (B,))
        (q, _, _), _ = jax.lax.scan(
            body_fn, (q0, state, rs), None, length=STEPS
        )
        return q

    return fn


def timeit(fn, name):
    for attempt in range(3):
        try:
            q = fn(jnp.uint32(0))
            float(jnp.sum(q))  # warmup + fence
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                q = fn(jnp.uint32(i + 1))
                float(jnp.sum(q))
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[1]
            rate = STEPS * B / dt
            print(
                f"{name}: {dt / STEPS * 1e6:8.1f} us/iter"
                f"  {rate / 1e6:8.0f} M trans/s  qsum={float(jnp.sum(q)):.1f}",
                flush=True,
            )
            return rate
        except Exception as e:
            print(f"{name}: attempt {attempt} failed {str(e)[:80]}", flush=True)
            time.sleep(10)
    return float("nan")


if __name__ == "__main__":
    sem = make_semantics()
    bl = pack_level(walls_and_goal_16x16())
    sem_c = jax.tree.map(np.asarray, sem)
    BL_C = jax.tree.map(np.asarray, bl)
    S = BL_C.height * BL_C.width
    globals()["BL_C"] = BL_C

    print(f"device: {jax.devices()[0]}  B={B} S={S} steps={STEPS}", flush=True)
    timeit(compile_run(baseline_scan(sem_c, BL_C), S), "baseline (B,S) one-hots")
    for H, L in [(64, 4), (32, 8), (16, 16), (128, 2)]:
        timeit(compile_run(factored_scan(sem_c, BL_C, H, L), S), f"factored H={H:3d} L={L:2d}")
