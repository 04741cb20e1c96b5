"""Flagship generalization result as a reproducible ARTIFACT (VERDICT r3
next #2): the docs/PERFORMANCE.md §12 recipe — one conv-trunk PPO agent
trained across 1024 distinct on-device mazes — run end to end, with the
wrong-tiles ablation control, on ≥2 seeds, written to GENERALIZATION.json
at the repo root so regressions are visible per round.

Recipe (r4, supersedes the §12 "0.77" prose row — which did NOT
reproduce from its prose description; the r4 sweep found a better and
seed-robust one): 7×7 ALDOUS-BRODER mazes (exactly uniform — no
binary-tree motion prior to exploit), rollout 16, γ0.97,
max_episode_steps 48, lr 1e-3, ent 0.03, conv (32,), hidden (64,), 1500
updates at B=1024; greedy success within 60 steps on 64 held-out mazes.
Measured held-out 0.95-1.00 on four consecutive seeds with wrong-tiles
ablation 0.16 (docs/PERFORMANCE.md §12, r4 note). The ablation rolls
which maze's tile planes each env sees by one — a policy that actually
READS the maze collapses; a motion prior does not.

Run: python tools/gen_artifact.py            (TPU box; ~10–15 min)
     python tools/gen_artifact.py --updates 50 --mazes 128   (smoke)
"""

from __future__ import annotations

import argparse
import json
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
from griduniverse_tpu.models import (
    PPOConfig,
    greedy_success_rate,
    make_network,
    ppo_train,
)


def maze_levels(key, n, cells):
    grids, start = generate_mazes_device(
        key, cells, n, algorithm="aldous_broder"
    )
    h, w = grids.shape[1], grids.shape[2]
    grids = grids.at[:, h - 2, w - 2].set(S.GOAL)
    return Level(grid=grids, start_idx=jnp.broadcast_to(start, (n,)))


def rolled_tiles_level(levels: Level) -> Level:
    """The wrong-tiles ablation: env b keeps ITS maze dynamics but the
    network sees maze b+1's planes (the `tiles_levels` argument of
    models.evaluation.greedy_success_rate)."""
    return Level(
        grid=jnp.roll(levels.grid, 1, axis=0), start_idx=levels.start_idx
    )


def greedy_success_wrong_tiles(sem, net, params, levels, max_steps=60):
    """Success of greedy rollouts where the DYNAMICS use `levels` but the
    network's tile planes come from the NEXT maze (rolled by one)."""
    return float(
        greedy_success_rate(
            sem, net, params, levels, max_steps,
            tiles_levels=rolled_tiles_level(levels),
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mazes", type=int, default=1024)
    ap.add_argument("--eval_mazes", type=int, default=64)
    ap.add_argument("--cells", type=int, default=3)
    ap.add_argument("--updates", type=int, default=1500)
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sem = make_semantics()
    cells = (args.cells, args.cells)
    train_lv = maze_levels(jax.random.PRNGKey(0), args.mazes, cells)
    eval_lv = maze_levels(jax.random.PRNGKey(99), args.eval_mazes, cells)

    cfg = PPOConfig(
        rollout_len=16, max_episode_steps=48, obs="grid",
        conv_channels=(32,), hidden=(64,),
        num_epochs=4, num_minibatches=4,
        lr=1e-3, ent_coef=0.03, gamma=0.97,
        compute_dtype="float32",
    )
    net = make_network(train_lv, 4, cfg)

    runs = []
    for seed in args.seeds:
        t0 = time.perf_counter()
        res = ppo_train(
            sem, train_lv, jax.random.PRNGKey(seed), cfg,
            num_updates=args.updates, batch_size=args.mazes,
        )
        float(res.final_loss)  # fence (axon: block_until_ready lies)
        wall = time.perf_counter() - t0
        train_s = float(greedy_success_rate(sem, net, res.params, train_lv))
        held_s = float(greedy_success_rate(sem, net, res.params, eval_lv))
        abl_s = greedy_success_wrong_tiles(sem, net, res.params, eval_lv)
        runs.append(
            {
                "seed": seed,
                "train_success": round(train_s, 3),
                "heldout_success": round(held_s, 3),
                "wrong_tiles_ablation": round(abl_s, 3),
                "train_wall_s": round(wall, 1),
            }
        )
        print(
            f"seed {seed}: train {train_s:.2f} held-out {held_s:.2f} "
            f"ablation {abl_s:.2f} ({wall:.0f}s)",
            flush=True,
        )

    artifact = {
        "metric": "ppo_mazes_generalization",
        "recipe": {
            "mazes": args.mazes, "eval_mazes": args.eval_mazes,
            "grid": f"{2 * args.cells + 1}x{2 * args.cells + 1}",
            "algorithm": "aldous_broder", "updates": args.updates,
            "rollout_len": cfg.rollout_len, "gamma": cfg.gamma,
            "lr": cfg.lr, "ent_coef": cfg.ent_coef,
            "conv_channels": list(cfg.conv_channels),
            "hidden": list(cfg.hidden),
            "greedy_budget_steps": 60,
        },
        "device": str(jax.devices()[0]),
        "runs": runs,
        "heldout_min": min(r["heldout_success"] for r in runs),
        "ablation_max": max(r["wrong_tiles_ablation"] for r in runs),
    }
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "GENERALIZATION.json",
    )
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
