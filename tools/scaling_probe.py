"""Measured scaling evidence on the virtual CPU mesh (VERDICT r3 next #6).

Real multi-chip hardware is not available on this box, so host-scaling
cannot be measured end to end — but the COLLECTIVE OVERHEAD FRACTION can:
at FIXED TOTAL WORK (same envs × steps), the wall-clock delta between the
unsharded program and the same program sharded over an n-device mesh is
exactly the cost the collectives + shard orchestration add. On real ICI
that overhead is what stands between the framework and linear scaling, so
measuring it (per learner family, per mesh size) turns docs/SCALING.md's
"near-linear by construction" from an argument into an audited number.

Caveats baked into the methodology:
  * This box has 2 physical cores; 8 virtual devices TIMESHARE them, so
    absolute sharded wall-clock includes scheduling noise and can even
    IMPROVE on n=1 (two real cores servicing the shards). Mesh sizes are
    measured back-to-back against a same-session n=1 baseline, best-of-R,
    so machine-wide slowness cancels; the overhead fraction is the
    honest, transportable number.
  * Work sizes are CI-scale (seconds per point) — collective counts per
    step are identical to production scale, only operand sizes differ
    (both are reported in the bytes-on-wire table, docs/SCALING.md).

Writes SCALING_MEASURED.json next to the repo root and prints a table.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/scaling_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from griduniverse_tpu import make_semantics
from griduniverse_tpu.levels.builders import walls_and_goal_16x16
from griduniverse_tpu.models import PPOConfig, ppo_train, ppo_train_sharded
from griduniverse_tpu.ops.bitplane import compile_rollout_random, pack_level
from griduniverse_tpu.parallel import (
    compile_rollout_random_sharded,
    q_learning_sharded,
)
from griduniverse_tpu.algos.td import q_learning

SEM = make_semantics()
LEVEL = walls_and_goal_16x16()
B = 1024          # fixed TOTAL envs at every mesh size
STEPS = 400       # fixed total steps
REPEATS = 5


def best_of(fn, repeats=REPEATS) -> float:
    fn()  # warmup/compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def mesh_of(n: int) -> Mesh:
    return Mesh(np.asarray(jax.devices()[:n]), ("env",))


def run_family(name, unsharded, sharded_at):
    """Measure t(1 unsharded) and t(mesh n) for n in 1/2/4/8; returns a
    row dict with overhead fractions (t_n − t_u)/t_n."""
    t_u = best_of(unsharded)
    row = {"unsharded_s": t_u, "mesh": {}}
    for n in (1, 2, 4, 8):
        t_n = best_of(sharded_at(n))
        row["mesh"][n] = {
            "wall_s": t_n,
            "overhead_frac": (t_n - t_u) / t_n if t_n > 0 else None,
        }
        print(
            f"{name} n={n}: {t_n * 1e3:8.1f} ms vs unsharded "
            f"{t_u * 1e3:8.1f} ms → overhead {(t_n - t_u) / t_n:+.1%}",
            flush=True,
        )
    return row


def main():
    results = {}

    # 1) fast rollout — collectives: 3 scalar psums per CALL (not per
    # step); the closest thing to pure-compute sharding
    bl = pack_level(LEVEL)
    fn_u = compile_rollout_random(SEM, bl, B, STEPS, max_episode_steps=64)

    def rollout_unsharded():
        _, st = fn_u(jax.numpy.uint32(1))
        float(st["episodes"])

    def rollout_at(n):
        fn = compile_rollout_random_sharded(
            mesh_of(n), SEM, bl, B, STEPS, max_episode_steps=64
        )

        def run():
            _, st = fn(jax.numpy.uint32(1))
            float(st["episodes"])

        return run

    results["fast_rollout"] = run_family(
        "fast_rollout", rollout_unsharded, rollout_at
    )

    # 2) tabular psum learner — 2·S·A f32 psum'd EVERY step
    def q_unsharded():
        r = q_learning(
            SEM, LEVEL, jax.random.PRNGKey(0), num_steps=STEPS, batch_size=B
        )
        float(r.episodes)

    def q_at(n):
        m = mesh_of(n)

        def run():
            r = q_learning_sharded(
                m, SEM, LEVEL, jax.random.PRNGKey(0),
                num_steps=STEPS, batch_size=B,
            )
            float(r.episodes)

        return run

    results["tabular_psum"] = run_family("tabular_psum", q_unsharded, q_at)

    # 2b) the same learner with psum_every=8 — ONE 2·S·A all-reduce per
    # 8-step window instead of per step (the r4 verdict's proposed
    # mitigation for the per-step-psum overhead; documented-semantics
    # mode, see q_learning_sharded docstring)
    def qk_at(n):
        m = mesh_of(n)

        def run():
            r = q_learning_sharded(
                m, SEM, LEVEL, jax.random.PRNGKey(0),
                num_steps=STEPS, batch_size=B, psum_every=8,
            )
            float(r.episodes)

        return run

    results["tabular_psum_k8"] = run_family(
        "tabular_psum_k8", q_unsharded, qk_at
    )

    # 3) neural pmean learner — grads (≈P floats) pmean'd per minibatch
    cfg = PPOConfig(
        rollout_len=8, num_epochs=2, num_minibatches=2, hidden=(32,),
        embed_dim=8, max_episode_steps=32, compute_dtype="float32",
    )
    UPD = 12

    def ppo_unsharded():
        r = ppo_train(
            SEM, LEVEL, jax.random.PRNGKey(0), cfg,
            num_updates=UPD, batch_size=B,
        )
        float(r.episodes)

    def ppo_at(n):
        m = mesh_of(n)

        def run():
            r = ppo_train_sharded(
                m, SEM, LEVEL, jax.random.PRNGKey(0), cfg,
                num_updates=UPD, batch_size=B,
            )
            float(r.episodes)

        return run

    results["neural_pmean"] = run_family("neural_pmean", ppo_unsharded, ppo_at)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_MEASURED.json",
    )
    with open(out, "w") as f:
        json.dump(
            {
                "methodology": (
                    "fixed total work (B=%d envs x %d steps), best-of-%d "
                    "fenced wall-clock, unsharded vs n-device virtual CPU "
                    "mesh; overhead_frac = (t_n - t_unsharded)/t_n"
                    % (B, STEPS, REPEATS)
                ),
                "families": results,
            },
            f,
            indent=1,
        )
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
