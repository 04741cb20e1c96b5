"""Golden-file trajectory tests per BASELINE config (SURVEY.md §4).

Each golden pins the exact (obs, reward, done) trajectory of a committed
pre-drawn action sequence. Unlike the live-oracle parity suite, a golden
catches the engine and the oracle drifting TOGETHER (e.g. an accidental
semantics-table change). Regenerate deliberately with
`python tools/make_goldens.py` and call it out in the commit message.

Both the bit-packed engine and the generic core.step path are checked
against the same files — they share the semantics contract.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from griduniverse_tpu import make_semantics

GOLDEN_DIR = Path(__file__).parent / "golden"
SEM = make_semantics()


def _configs():
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from make_goldens import configs

    return configs()


CONFIGS = {name: (level, batch) for name, level, batch in _configs()}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_bitplane_matches_golden(name):
    from griduniverse_tpu.ops.bitplane import (
        pack_level,
        reset_bits,
        rollout_actions_bits,
    )

    level, batch = CONFIGS[name]
    g = np.load(GOLDEN_DIR / f"{name}.npz")
    bl = pack_level(level)
    state = reset_bits(bl, None if bl.batched else batch)
    _, (obs, reward, done) = rollout_actions_bits(
        SEM, bl, state, jnp.asarray(g["actions"]),
        auto_reset=True, max_episode_steps=64,
    )
    np.testing.assert_array_equal(np.asarray(obs), g["obs"])
    np.testing.assert_array_equal(np.asarray(reward), g["reward"])
    np.testing.assert_array_equal(np.asarray(done), g["done"])


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_generic_step_matches_golden(name):
    """The gather-based core path reproduces the same goldens — the two
    engines cannot drift apart without a golden failing."""
    from griduniverse_tpu.ops.rollout import reset_batch, rollout_actions

    level, batch = CONFIGS[name]
    if level.grid.ndim == 3:
        pytest.skip("generic rollout drives shared-level configs here")
    g = np.load(GOLDEN_DIR / f"{name}.npz")
    state = reset_batch(level, jax.random.PRNGKey(0), batch)
    _, out = rollout_actions(
        SEM, level, state, jnp.asarray(g["actions"]),
        auto_reset=True, max_episode_steps=64,
    )
    np.testing.assert_array_equal(np.asarray(out.obs), g["obs"])
    np.testing.assert_array_equal(np.asarray(out.reward), g["reward"])
    np.testing.assert_array_equal(np.asarray(out.done), g["done"])
