"""Example 2 — plan with dynamic programming (SURVEY.md §3.3):
build the dense model table, run on-device value iteration, print the
value grid + policy arrows, roll the greedy policy, optionally save a plot.

    python examples/02_value_iteration.py --plot /tmp/values.png
"""

import numpy as np

from _common import parse_args


def main():
    args = parse_args(
        "Value iteration on the lava-crossing level",
        gamma=(float, 0.99, "discount"),
        plot=(str, "", "path to save a V-heatmap PNG (optional)"),
    )

    import griduniverse_tpu as gu
    from griduniverse_tpu.algos import (
        policy_arrows,
        run_greedy_episode,
        value_grid,
        value_iteration,
    )
    from griduniverse_tpu.levels.builders import lava_level
    from griduniverse_tpu.levels.text import render_text

    sem = gu.make_semantics()
    level = lava_level()
    print("Level:")
    print(render_text(np.asarray(level.grid), start_idx=int(level.start_idx)))

    model = gu.build_model_table(sem, level)
    v, policy, iters = value_iteration(model, gamma=args.gamma, theta=1e-6)
    print(f"\nconverged in {int(iters)} sweeps")
    np.set_printoptions(precision=1, suppress=True, linewidth=200)
    print("V(s):")
    print(value_grid(v, level))
    print("\ngreedy policy:")
    print(policy_arrows(policy, level))

    obs, ret, length, done = run_greedy_episode(sem, level, policy)
    print(
        f"\ngreedy rollout: return={float(ret):.1f} length={int(length)} "
        f"reached_terminal={bool(done)}"
    )

    if args.plot:
        from griduniverse_tpu.algos.utils import plot_value

        plot_value(v, level, path=args.plot)
        print(f"saved V heatmap to {args.plot}")


if __name__ == "__main__":
    main()
