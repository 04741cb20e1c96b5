"""Example 4 — on-device procedural mazes (BASELINE config 4): generate one
perfect maze PER ENV with the vmapped lax.while_loop backtracker, then roll
random actions with auto-reset and report episode stats.

    python examples/04_procedural_mazes.py --envs 1024 --cells 5
"""

import numpy as np

from _common import parse_args


def main():
    args = parse_args(
        "Per-env procedural mazes",
        envs=(int, 1024, "parallel envs (one maze each)"),
        cells=(int, 5, "maze size in cells (grid is 2c+1 square)"),
        steps=(int, 512, "rollout steps"),
    )
    import jax
    import jax.numpy as jnp

    import griduniverse_tpu as gu
    from griduniverse_tpu.core.types import Level
    from griduniverse_tpu.levels.maze import generate_mazes_device
    from griduniverse_tpu.levels.text import render_text
    from griduniverse_tpu.ops.rollout import episode_stats, reset_batch

    sem = gu.make_semantics()
    grids, start = generate_mazes_device(
        jax.random.PRNGKey(0), (args.cells, args.cells), args.envs
    )
    print(f"generated {args.envs} mazes of shape {grids.shape[1:]} on device")
    print("maze #0:")
    print(render_text(np.asarray(grids[0]), start_idx=int(start)))

    levels = Level(
        grid=grids, start_idx=jnp.full((args.envs,), start, jnp.int32)
    )
    state = reset_batch(levels, jax.random.PRNGKey(1), args.envs)
    _, stats = episode_stats(
        sem, levels, state, jax.random.PRNGKey(2), args.steps
    )
    print(
        f"random rollout over {args.steps * args.envs:,} steps: "
        f"episodes={int(stats['episodes']):,} "
        f"mean_return={float(stats['mean_return']):.2f} "
        f"mean_length={float(stats['mean_length']):.1f}"
    )


if __name__ == "__main__":
    main()
