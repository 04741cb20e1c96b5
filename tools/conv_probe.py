"""Conv-trunk PPO throughput probe, attempt #2 (VERDICT r3 next #3).

Target: the `ppo_mazes_64k` bench row (r3: 1.25M steps/s at 3.3% MXU /
1.6% HBM — most of the machine idle). Ordered levers, per the verdict:

  (a) rollout-vs-epoch decomposition — time the bench config at
      num_epochs=1 and 4; epoch cost = (t4 − t1)/3, rollout+overhead =
      t1 − epoch (the docs/PERFORMANCE.md §8.1 methodology).
  (b) agent-plane "stamp" lowering — conv of a ONE-HOT image ≡ the
      flipped 3×3 kernel stamped at the agent cell, so the per-sample
      1-input-channel conv (which tiles at 1/128 MXU input lanes) is
      replaced by ONE dense (B, S) @ (S, S·ch0) MXU matmul against a
      precomputed stamp table T = conv_0(identity images) — same math,
      differentiable through the same kernel param
      (networks.BatchedConvActorCritic.agent_plane).
  (c) channel-width sweep (16 / 32 / 64) for the MXU-tiling sweet spot.

Run: python tools/conv_probe.py   (on the TPU box; ~10 min of compiles)
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from griduniverse_tpu import make_semantics
from griduniverse_tpu.core import semantics as S
from griduniverse_tpu.core.types import Level
from griduniverse_tpu.levels.maze import generate_mazes_device
from griduniverse_tpu.models import PPOConfig, ppo_train

B = 65_536
UPDATES = 10
MAX_EP = 512


def fenced_rate(run, work: float, repeats: int = 3) -> float:
    for attempt in range(3):
        try:
            run(0)
            times = []
            for i in range(repeats):
                t0 = time.perf_counter()
                run(i + 1)
                times.append(time.perf_counter() - t0)
            return work / sorted(times)[len(times) // 2]
        except Exception as e:
            print(f"  attempt {attempt} failed ({str(e)[:80]}); retry",
                  file=sys.stderr, flush=True)
            time.sleep(30)
    return float("nan")


def main():
    sem = make_semantics()
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(7), (4, 4), B, algorithm="binary_tree"
    )
    grids = grids.at[:, 7, 7].set(S.GOAL)
    mazes = Level(grid=grids, start_idx=jnp.broadcast_to(start, (B,)))

    base = PPOConfig(
        rollout_len=16, max_episode_steps=MAX_EP,
        obs="grid", conv_channels=(32,), hidden=(64,),
    )
    variants = [
        ("conv32_e4", dict()),                                   # bench row
        ("conv32_e1", dict(num_epochs=1)),
        ("stamp32_e4", dict(agent_plane="stamp")),
        ("stamp32_e1", dict(agent_plane="stamp", num_epochs=1)),
        ("stamp16_e4", dict(agent_plane="stamp", conv_channels=(16,))),
        ("stamp64_e4", dict(agent_plane="stamp", conv_channels=(64,))),
    ]
    results = {}
    for name, over in variants:
        cfg = dataclasses.replace(base, **over)
        rate = fenced_rate(
            lambda i: float(
                ppo_train(
                    sem, mazes, jax.random.PRNGKey(i), cfg,
                    num_updates=UPDATES, batch_size=B,
                ).episodes
            ),
            UPDATES * cfg.rollout_len * B,
        )
        results[name] = rate
        print(f"{name}: {rate:,.0f} steps/s", flush=True)

    t_u = lambda r: UPDATES * base.rollout_len * B / r / UPDATES * 1e3  # ms/update
    for pre in ("conv32", "stamp32"):
        if results.get(f"{pre}_e4") and results.get(f"{pre}_e1"):
            t4, t1 = t_u(results[f"{pre}_e4"]), t_u(results[f"{pre}_e1"])
            ep = (t4 - t1) / 3.0
            print(f"{pre}: {t4:.1f} ms/update (e4) = rollout+fixed "
                  f"{t1 - ep:.1f} + 4 x epoch {ep:.1f}", flush=True)


if __name__ == "__main__":
    main()
