"""PPO-past-150M probe (VERDICT r3 next #10, stretch).

The §8.2 decomposition: 9.0 ms/update = rollout 2.5 + 4 × 1.6 ms epochs
at 64k envs. Reusing rollout-time logits for epoch 0 cannot work (the
BACKWARD needs the forward's intermediates, not its outputs), so the
measurable levers are epoch-side traffic:

  A. baseline — bench ppo_64k config (shuffle="roll").
  B. shuffle="none" — zero shuffle copies (upper bound on what any
     cheaper shuffle could buy; statistics documented in PPOConfig).
  C. num_minibatches=1 — one full-slab SGD step per epoch (4 instead of
     16 optimizer steps per update: a SEMANTICS change, measured only to
     map the minibatch-overhead share).

Run: python tools/ppo_stretch_probe.py   (TPU box)
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
from griduniverse_tpu.levels.builders import walls_and_goal_16x16
from griduniverse_tpu.models import PPOConfig, ppo_train

B = 65_536
UPDATES = 40


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


def main():
    sem = make_semantics()
    level = walls_and_goal_16x16()
    base = PPOConfig(max_episode_steps=512)
    for name, over in [
        ("A_roll", {}),
        ("B_none", {"shuffle": "none"}),
        ("C_mb1", {"num_minibatches": 1}),
    ]:
        cfg = dataclasses.replace(base, **over)
        rate = fenced_rate(
            lambda i: float(
                ppo_train(
                    sem, level, jax.random.PRNGKey(i), cfg,
                    num_updates=UPDATES, batch_size=B,
                ).episodes
            ),
            UPDATES * cfg.rollout_len * B,
        )
        print(f"{name}: {rate:,.0f} steps/s", flush=True)


if __name__ == "__main__":
    main()
