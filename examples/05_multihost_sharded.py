"""Example 5 — the distributed stack (BASELINE config 5): envs sharded over
a ('host','env') mesh, all-reduce Q-learning, state-sharded value iteration,
and A2C with pmean'd gradients. Emulate multi-host on CPU with:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/05_multihost_sharded.py

On a real multi-host slice the same code runs after
`jax.distributed.initialize()` with no changes.
"""

from _common import parse_args


def main():
    args = parse_args(
        "Multi-host sharded training",
        envs=(int, 1024, "total envs across the mesh"),
        steps=(int, 2000, "Q-learning steps"),
    )
    import jax

    import griduniverse_tpu as gu
    from griduniverse_tpu.algos import greedy_policy_from_q, run_greedy_episode
    from griduniverse_tpu.levels.builders import walls_and_goal_16x16
    from griduniverse_tpu.models import A2CConfig, a2c_train_sharded
    from griduniverse_tpu.parallel import (
        episode_stats_sharded,
        make_host_env_mesh,
        q_learning_sharded,
        value_iteration_sharded,
    )

    mesh = make_host_env_mesh()
    print(f"mesh: {mesh}")
    sem = gu.make_semantics()
    level = walls_and_goal_16x16()

    _, stats = episode_stats_sharded(
        mesh, sem, level, jax.random.PRNGKey(0), args.envs, 200
    )
    print(
        f"sharded rollout: {200 * args.envs:,} steps, "
        f"episodes={int(stats['episodes'])}"
    )

    res = q_learning_sharded(
        mesh, sem, level, jax.random.PRNGKey(1),
        num_steps=args.steps, batch_size=args.envs, epsilon=0.3, alpha=0.15,
    )
    policy = greedy_policy_from_q(res.q)
    _, ret, length, done = run_greedy_episode(sem, level, policy, max_steps=64)
    print(
        f"distributed Q-learning: episodes={int(res.episodes):,}, greedy "
        f"return={float(ret):.1f} len={int(length)} done={bool(done)}"
    )

    model = gu.build_model_table(sem, level)
    v, pol, iters = value_iteration_sharded(mesh, model)
    print(f"sharded VI converged in {int(iters)} sweeps")

    cfg = A2CConfig(rollout_len=8, hidden=(64,), embed_dim=32, lr=1e-3)
    a2c = a2c_train_sharded(
        mesh, sem, level, jax.random.PRNGKey(2), cfg,
        num_updates=50, batch_size=args.envs,
    )
    print(
        f"sharded A2C: episodes={int(a2c.episodes):,}, "
        f"final loss={float(a2c.final_loss):.3f}"
    )


if __name__ == "__main__":
    main()
