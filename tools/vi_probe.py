"""Batched-VI traffic-diet probe (VERDICT r3 next #4).

Target: the `vi_mazes_64k` bench row (r3: 1.16M mazes/s streaming ~200 MB
of f32/int32 model tables per sweep at 12.8% of HBM peak). Variants:

  A. baseline — value_iteration_batched over the full-width ModelTable
     (int32 next_state 85 MB + f32 reward 85 MB + bool done/terminal
     26 MB per sweep at 64k×81×4).
  B. compact tables — int8 next_state (S = 81 < 127) + bf16 reward
     (every semantics reward constant is bf16-exact, so results are
     BIT-IDENTICAL) + the same bools: 21 + 42 + 26 ≈ 89 MB/sweep, 2.2×
     less mandatory traffic, zero extra arithmetic beyond one upcast.
  C. fused table-free sweep — never materialize the (N, S, A) tables:
     keep only the (N, S) int8 tile codes (~5 MB) + the static
     candidate-geometry, and recompute blocked/next/reward/done INSIDE
     the backup each sweep via the same select trees the step engine
     uses (~15 extra VPU ops per (n,s,a) on top of the S-1-select V
     lookup).

Run: python tools/vi_probe.py   (on the TPU box)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from griduniverse_tpu import make_semantics
from griduniverse_tpu.algos.dp_batched import (
    build_model_tables,
    value_iteration_batched,
)
from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.core.types import Level
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.ops.bitplane import _per_code, _select_tree
from griduniverse_tpu.utils.profiling import fence
from functools import partial

B = 65_536
GAMMA = 0.99
THETA = 1e-6


def fenced_rate(run, work, repeats=3):
    for attempt in range(3):
        try:
            run(0)
            ts = []
            for i in range(repeats):
                t0 = time.perf_counter()
                run(i + 1)
                ts.append(time.perf_counter() - t0)
            return work / sorted(ts)[len(ts) // 2]
        except Exception as e:
            print(f"  attempt {attempt} failed ({str(e)[:80]}); retry",
                  file=sys.stderr, flush=True)
            time.sleep(30)
    return float("nan")


# --- variant B: compact dtypes ------------------------------------------
@partial(jax.jit, static_argnames=("max_iters",))
def vi_compact(model, gamma=GAMMA, theta=THETA, max_iters=10_000):
    n, s = model.terminal.shape
    nxt = model.next_state.astype(jnp.int8)
    rew = model.reward.astype(jnp.bfloat16)
    done, term = model.done, model.terminal
    v0 = jnp.zeros((n, s), jnp.float32)

    def backup(v):
        leaves = [v[:, k, None, None] for k in range(s)]
        cont = jnp.where(done, 0.0, _select_tree(leaves, nxt))
        q = rew.astype(jnp.float32) + gamma * cont
        return jnp.where(term[:, :, None], 0.0, q)

    def cond(c):
        _, delta, i = c
        return (delta >= theta) & (i < max_iters)

    def body(c):
        v, _, i = c
        v_new = jnp.max(backup(v), axis=-1)
        return v_new, jnp.max(jnp.abs(v_new - v)), i + 1

    v, _, iters = jax.lax.while_loop(cond, body, (v0, jnp.float32(jnp.inf), 0))
    policy = jnp.argmax(backup(v), axis=-1).astype(jnp.int32)
    return v, policy, iters


# --- variant C: fused table-free sweep ----------------------------------
def vi_fused(sem, levels, gamma=GAMMA, theta=THETA, max_iters=10_000):
    deltas = np.asarray(sem.deltas)
    h, w = int(levels.grid.shape[1]), int(levels.grid.shape[2])
    states = np.arange(h * w, dtype=np.int32)
    row, col = states // w, states % w
    nrow = row[:, None] + deltas[None, :, 0]
    ncol = col[:, None] + deltas[None, :, 1]
    in_bounds = (nrow >= 0) & (nrow < h) & (ncol >= 0) & (ncol < w)
    cand = np.clip(nrow, 0, h - 1) * w + np.clip(ncol, 0, w - 1)
    geom = (
        h, w,
        tuple(int(v) for v in cand.reshape(-1)),
        tuple(bool(v) for v in in_bounds.reshape(-1)),
    )
    return _vi_fused_impl(sem, levels.grid, geom, gamma, theta, max_iters)


@partial(jax.jit, static_argnames=("geom", "max_iters"))
def _vi_fused_impl(sem, grids, geom, gamma, theta, max_iters):
    h, w, cand_tuple, inb_tuple = geom
    s = h * w
    a = len(cand_tuple) // s
    n = grids.shape[0]
    codes = grids.reshape(n, s).astype(jnp.int8)  # ~5 MB at 64k×81
    cand_idx = jnp.asarray(cand_tuple, jnp.int32).reshape(s, a)
    in_bounds = jnp.asarray(inb_tuple, bool).reshape(s, a)
    states = jnp.arange(s, dtype=jnp.int32)

    term_row = _per_code(sem.terminal, codes)  # (N, S) bool — tiny

    def backup(v):
        # recompute the model from codes inside the sweep: constant-index
        # reindex + tiny-table selects, all fused with the V select tree
        cand_code = codes[:, cand_idx]                       # (N, S, A)
        blocked = ~in_bounds[None] | ~_per_code(sem.passable, cand_code)
        nxt = jnp.where(blocked, states[None, :, None], cand_idx[None])
        new_code = jnp.where(blocked, codes[:, :, None], cand_code)
        rew = _per_code(sem.reward, new_code)
        done = _per_code(sem.terminal, new_code)
        leaves = [v[:, k, None, None] for k in range(s)]
        cont = jnp.where(done, 0.0, _select_tree(leaves, nxt))
        q = rew + gamma * cont
        return jnp.where(term_row[:, :, None], 0.0, q)

    v0 = jnp.zeros((n, s), jnp.float32)

    def cond(c):
        _, delta, i = c
        return (delta >= theta) & (i < max_iters)

    def body(c):
        v, _, i = c
        v_new = jnp.max(backup(v), axis=-1)
        return v_new, jnp.max(jnp.abs(v_new - v)), i + 1

    v, _, iters = jax.lax.while_loop(cond, body, (v0, jnp.float32(jnp.inf), 0))
    policy = jnp.argmax(backup(v), axis=-1).astype(jnp.int32)
    return v, policy, iters


# --- variant D: static-candidate backup ---------------------------------
# The select tree treats next_state as ARBITRARY (N, S, A) data, but the
# gridworld structure says next = blocked ? s : cand_idx, and cand_idx is
# STATIC — so the successor lookup is one constant-index reindex
# v[:, cand_idx] (a compile-time shuffle, no dynamic gather) plus ONE
# select against the precomputed blocked mask. S-1 selects → 2 ops.
def vi_static(sem, levels, gamma=GAMMA, theta=THETA, max_iters=10_000,
              compact=False):
    deltas = np.asarray(sem.deltas)
    h, w = int(levels.grid.shape[1]), int(levels.grid.shape[2])
    states = np.arange(h * w, dtype=np.int32)
    row, col = states // w, states % w
    nrow = row[:, None] + deltas[None, :, 0]
    ncol = col[:, None] + deltas[None, :, 1]
    in_bounds = (nrow >= 0) & (nrow < h) & (ncol >= 0) & (ncol < w)
    cand = np.clip(nrow, 0, h - 1) * w + np.clip(ncol, 0, w - 1)
    geom = (
        h, w,
        tuple(int(v) for v in cand.reshape(-1)),
        tuple(bool(v) for v in in_bounds.reshape(-1)),
    )
    return _vi_static_impl(sem, levels.grid, geom, gamma, theta, max_iters,
                           compact)


@partial(jax.jit, static_argnames=("geom", "max_iters", "compact"))
def _vi_static_impl(sem, grids, geom, gamma, theta, max_iters, compact):
    h, w, cand_tuple, inb_tuple = geom
    s = h * w
    a = len(cand_tuple) // s
    n = grids.shape[0]
    codes = grids.reshape(n, s)
    cand_idx = jnp.asarray(cand_tuple, jnp.int32).reshape(s, a)
    in_bounds = jnp.asarray(inb_tuple, bool).reshape(s, a)

    cand_code = codes[:, cand_idx]
    blocked = ~in_bounds[None] | ~_per_code(sem.passable, cand_code)
    new_code = jnp.where(blocked, codes[:, :, None], cand_code)
    rew = _per_code(sem.reward, new_code)
    done = _per_code(sem.terminal, new_code)
    term = _per_code(sem.terminal, codes)
    if compact:
        rew = rew.astype(jnp.bfloat16)

    def backup(v):
        vc = v[:, cand_idx]                               # static reindex
        cont = jnp.where(blocked, v[:, :, None], vc)
        cont = jnp.where(done, 0.0, cont)
        q = rew.astype(jnp.float32) + gamma * cont
        return jnp.where(term[:, :, None], 0.0, q)

    v0 = jnp.zeros((n, s), jnp.float32)

    def cond(c):
        _, delta, i = c
        return (delta >= theta) & (i < max_iters)

    def body(c):
        v, _, i = c
        v_new = jnp.max(backup(v), axis=-1)
        return v_new, jnp.max(jnp.abs(v_new - v)), i + 1

    v, _, iters = jax.lax.while_loop(cond, body, (v0, jnp.float32(jnp.inf), 0))
    policy = jnp.argmax(backup(v), axis=-1).astype(jnp.int32)
    return v, policy, iters


# --- variant F: D2 + chunked convergence checks -------------------------
# One global max|ΔV| reduction per sweep serializes the while_loop on a
# full cross-array reduction. Converged sweeps are fixed points, so
# checking every K sweeps is semantically identical (±K-1 extra no-op
# sweeps) and cuts the reduction+cond overhead K×.
def vi_static_chunked(sem, levels, gamma=GAMMA, theta=THETA,
                      max_iters=10_000, chunk=8):
    deltas = np.asarray(sem.deltas)
    h, w = int(levels.grid.shape[1]), int(levels.grid.shape[2])
    states = np.arange(h * w, dtype=np.int32)
    row, col = states // w, states % w
    nrow = row[:, None] + deltas[None, :, 0]
    ncol = col[:, None] + deltas[None, :, 1]
    in_bounds = (nrow >= 0) & (nrow < h) & (ncol >= 0) & (ncol < w)
    cand = np.clip(nrow, 0, h - 1) * w + np.clip(ncol, 0, w - 1)
    geom = (
        h, w,
        tuple(int(v) for v in cand.reshape(-1)),
        tuple(bool(v) for v in in_bounds.reshape(-1)),
    )
    return _vi_static_chunked_impl(
        sem, levels.grid, geom, gamma, theta, max_iters, chunk
    )


@partial(jax.jit, static_argnames=("geom", "max_iters", "chunk"))
def _vi_static_chunked_impl(sem, grids, geom, gamma, theta, max_iters, chunk):
    h, w, cand_tuple, inb_tuple = geom
    s = h * w
    n = grids.shape[0]
    codes = grids.reshape(n, s)
    cand_idx = jnp.asarray(cand_tuple, jnp.int32).reshape(s, -1)
    in_bounds = jnp.asarray(inb_tuple, bool).reshape(s, -1)

    cand_code = codes[:, cand_idx]
    blocked = ~in_bounds[None] | ~_per_code(sem.passable, cand_code)
    new_code = jnp.where(blocked, codes[:, :, None], cand_code)
    rew = _per_code(sem.reward, new_code).astype(jnp.bfloat16)
    done = _per_code(sem.terminal, new_code)
    term = _per_code(sem.terminal, codes)

    def backup(v):
        vc = v[:, cand_idx]
        cont = jnp.where(blocked, v[:, :, None], vc)
        cont = jnp.where(done, 0.0, cont)
        q = rew.astype(jnp.float32) + gamma * cont
        return jnp.where(term[:, :, None], 0.0, q)

    def sweep_k(v):
        def one(v, _):
            return jnp.max(backup(v), axis=-1), None

        v_new, _ = jax.lax.scan(one, v, None, length=chunk)
        return v_new

    v0 = jnp.zeros((n, s), jnp.float32)

    def cond(c):
        _, delta, i = c
        return (delta >= theta) & (i < max_iters)

    def body(c):
        v, _, i = c
        v_new = sweep_k(v)
        return v_new, jnp.max(jnp.abs(v_new - v)), i + chunk

    v, _, iters = jax.lax.while_loop(cond, body, (v0, jnp.float32(jnp.inf), 0))
    policy = jnp.argmax(backup(v), axis=-1).astype(jnp.int32)
    return v, policy, iters


def main():
    sem = make_semantics()
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(7), (4, 4), B, algorithm="binary_tree"
    )
    grids = grids.at[:, 7, 7].set(S.GOAL)
    levels = Level(grid=grids, start_idx=jnp.broadcast_to(start, (B,)))
    model = build_model_tables(sem, levels)
    fence(model.terminal)

    rates = {}
    rates["A_baseline"] = fenced_rate(
        lambda i: float(value_iteration_batched(model)[2]), B
    )
    print(f"A_baseline: {rates['A_baseline']:,.0f} mazes/s", flush=True)

    rates["B_compact"] = fenced_rate(lambda i: float(vi_compact(model)[2]), B)
    print(f"B_compact: {rates['B_compact']:,.0f} mazes/s", flush=True)

    rates["C_fused"] = fenced_rate(lambda i: float(vi_fused(sem, levels)[2]), B)
    print(f"C_fused: {rates['C_fused']:,.0f} mazes/s", flush=True)

    rates["D_static"] = fenced_rate(
        lambda i: float(vi_static(sem, levels)[2]), B
    )
    print(f"D_static: {rates['D_static']:,.0f} mazes/s", flush=True)

    rates["D2_static_compact"] = fenced_rate(
        lambda i: float(vi_static(sem, levels, compact=True)[2]), B
    )
    print(f"D2_static_compact: {rates['D2_static_compact']:,.0f} mazes/s",
          flush=True)

    for chunk in (4, 8):
        rates[f"F_chunk{chunk}"] = fenced_rate(
            lambda i: float(vi_static_chunked(sem, levels, chunk=chunk)[2]), B
        )
        print(f"F_chunk{chunk}: {rates[f'F_chunk{chunk}']:,.0f} mazes/s",
              flush=True)
    vF, pF, iF = vi_static_chunked(sem, levels, chunk=8)

    # correctness cross-check (exactness claims in the module docstring)
    va, pa, _ = value_iteration_batched(model)
    vb, pb, _ = vi_compact(model)
    vc, pc, _ = vi_fused(sem, levels)
    vd, pd, _ = vi_static(sem, levels)
    vd2, pd2, _ = vi_static(sem, levels, compact=True)
    print("B bit-equal V:", bool(jnp.all(va == vb)),
          "policy:", bool(jnp.all(pa == pb)), flush=True)
    print("C bit-equal V:", bool(jnp.all(va == vc)),
          "policy:", bool(jnp.all(pa == pc)), flush=True)
    print("D bit-equal V:", bool(jnp.all(va == vd)),
          "policy:", bool(jnp.all(pa == pd)), flush=True)
    print("D2 bit-equal V:", bool(jnp.all(va == vd2)),
          "policy:", bool(jnp.all(pa == pd2)), flush=True)
    print("F bit-equal V:", bool(jnp.all(va == vF)),
          "policy:", bool(jnp.all(pa == pF)), "iters:", int(iF), flush=True)


if __name__ == "__main__":
    main()
