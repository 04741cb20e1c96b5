"""Example 8 — DQN with an on-device replay buffer.

Off-policy value learning: the circular replay buffer, double-DQN targets
and polyak target updates all live inside one jitted scan. Pass --sharded
to shard envs + buffer over every visible device.

    python examples/08_dqn.py --steps 1500 --envs 64
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/08_dqn.py --sharded
"""

from _common import parse_args


def main():
    args = parse_args(
        "DQN training",
        steps=(int, 1500, "train steps (each steps all envs once)"),
        envs=(int, 64, "parallel envs"),
        sharded=(int, 0, "1 = shard envs + buffer over all visible devices"),
        per=(int, 0, "1 = prioritized replay (Gumbel-top-k, no sum-tree)"),
        hard_target=(int, 0, "1 = classic periodic target copies (else polyak)"),
    )
    import time

    import jax
    import jax.numpy as jnp

    import griduniverse_tpu as gu
    from griduniverse_tpu.algos.utils import policy_arrows
    from griduniverse_tpu.levels.builders import walls_and_goal_16x16
    from griduniverse_tpu.models import (
        DQNConfig,
        QNetwork,
        dqn_train,
        dqn_train_sharded,
        greedy_q_actions,
    )

    sem = gu.make_semantics()
    level = walls_and_goal_16x16()
    cfg = DQNConfig(
        buffer_capacity=16_384,
        batch_size_train=256,
        eps_anneal_steps=args.steps // 2,
        max_episode_steps=128,
        hidden=(128,),
        prioritized=bool(args.per),
        target_update="hard" if args.hard_target else "polyak",
    )

    t0 = time.perf_counter()
    if args.sharded:
        from griduniverse_tpu.parallel import make_env_mesh

        mesh = make_env_mesh()
        print(f"mesh: {mesh.shape}")
        res = dqn_train_sharded(
            mesh, sem, level, jax.random.PRNGKey(0), cfg,
            num_steps=args.steps, batch_size=args.envs,
        )
    else:
        res = dqn_train(
            sem, level, jax.random.PRNGKey(0), cfg,
            num_steps=args.steps, batch_size=args.envs,
        )
    jax.block_until_ready(res.params)
    dt = time.perf_counter() - t0
    print(
        f"{args.steps} train steps / {args.steps * args.envs:,} env "
        f"transitions in {dt:.1f}s (incl. compile)"
    )
    print(f"episodes: {int(res.episodes):,}  mean return: {float(res.mean_return):.2f}")

    net = QNetwork(
        num_states=level.num_states, num_actions=4,
        hidden=cfg.hidden, embed_dim=cfg.embed_dim,
    )
    all_states = jnp.arange(level.num_states, dtype=jnp.int32)
    policy = greedy_q_actions(net, res.params, all_states)
    print("\ngreedy Q policy:")
    print(policy_arrows(policy, level))


if __name__ == "__main__":
    main()
