"""Regenerate the golden trajectory files (tests/golden/*.npz).

SURVEY.md §4: "golden-file trajectory tests per BASELINE config". The
goldens pin the full (obs, reward, done) trajectory of a fixed pre-drawn
action sequence on each BASELINE config's level — unlike the live-oracle
parity tests (tests/test_parity.py), a committed golden also catches the
engine and the NumPy oracle drifting TOGETHER (e.g. a semantics-table edit
that silently changes behavior).

Run me ONLY when a deliberate semantics change is made, and say so in the
commit message:  python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "golden",
)

T = 200  # steps per golden trajectory


def configs():
    """(name, level, batch) per BASELINE config — import under CPU jax."""
    import jax

    from griduniverse_tpu.core.types import Level
    from griduniverse_tpu.levels.builders import (
        empty_level,
        lava_level,
        walls_and_goal_16x16,
    )
    from griduniverse_tpu.levels.maze import generate_mazes_device

    grids, start = generate_mazes_device(
        jax.random.PRNGKey(7), (4, 4), 4, algorithm="sidewinder"
    )
    mazes = Level(
        grid=grids,
        start_idx=np.full((4,), int(start), np.int32),
    )
    return [
        ("cfg1_empty8", empty_level(8, 8, goal=True), 2),
        ("cfg2_walls16", walls_and_goal_16x16(), 3),
        ("cfg3_lava", lava_level(), 3),
        ("cfg4_mazes", mazes, 4),
    ]


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from griduniverse_tpu import make_semantics
    from griduniverse_tpu.ops.bitplane import (
        pack_level,
        reset_bits,
        rollout_actions_bits,
    )

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    sem = make_semantics()
    rng = np.random.default_rng(2026)
    for name, level, batch in configs():
        bl = pack_level(level)
        state = reset_bits(bl, None if bl.batched else batch)
        actions = rng.integers(0, 4, size=(T, state.agent_idx.shape[0]))
        _, (obs, reward, done) = rollout_actions_bits(
            sem, bl, state, jnp.asarray(actions, jnp.int32),
            auto_reset=True, max_episode_steps=64,
        )
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(
            path,
            actions=actions.astype(np.int32),
            obs=np.asarray(obs, np.int32),
            reward=np.asarray(reward, np.float32),
            done=np.asarray(done),
        )
        print(f"wrote {path}: obs {np.asarray(obs).shape}")


if __name__ == "__main__":
    main()
