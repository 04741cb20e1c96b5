"""Decompose the PPO update cost at 64k envs (docs/PERFORMANCE.md §8 cont).

Round-2 follow-up: after the env-axis shuffle fix the update sits at
~56 ms (E=4, M=4). This probe isolates the remaining pieces:

  * rollout-only (T=16 net.apply + step_bits scan)
  * rollout + GAE (no SGD)
  * full update at E/M grid points
  * a single minibatch grad step in isolation (f32 vs bf16 compute)

Run: python tools/ppo_probe.py
"""

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from griduniverse_tpu.core.semantics import make_semantics
from griduniverse_tpu.levels.builders import walls_and_goal_16x16
from griduniverse_tpu.models.a2c import make_network
from griduniverse_tpu.models.ppo import PPOConfig, _make_update_body, gae_advantages, _Traj, ppo_train
from griduniverse_tpu.ops.bitplane import pack_level, reset_bits, step_bits
from griduniverse_tpu.utils.profiling import fence

B = 65_536
T = 16
MAX_EP = 512


def timeit(fn, *args, repeats=3):
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    sem = make_semantics()
    level = walls_and_goal_16x16()
    bl = pack_level(level)
    cfg = PPOConfig(max_episode_steps=MAX_EP)
    net = make_network(level, 4, cfg)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr))
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1,), jnp.int32))
    opt_state = tx.init(params)

    # --- full update across shuffle/precision variants ---
    variants = [
        ("roll bf16 (r2 default)", dict(shuffle="roll", compute_dtype="bfloat16")),
        ("env bf16", dict(shuffle="env", compute_dtype="bfloat16")),
        ("env f32 (r2 pre)", dict(shuffle="env", compute_dtype="float32")),
        ("roll bf16 E=1 M=4", dict(shuffle="roll", compute_dtype="bfloat16", num_epochs=1)),
    ]
    for name, kw in variants:
        c = PPOConfig(max_episode_steps=MAX_EP, **kw)
        n_up = 20

        def run(s, c=c):
            r = ppo_train(sem, level, jax.random.PRNGKey(s), c, num_updates=n_up, batch_size=B)
            return float(r.episodes), float(r.mean_return)

        dt = timeit(lambda s: run(s)[0], 0)
        _, ret = run(0)
        print(
            f"{name}: {dt/n_up*1e3:.1f} ms/update  "
            f"({n_up*T*B/dt/1e6:.1f}M steps/s)  mean_return={ret:.1f}"
        )

    # --- isolated pieces, each as a 20-iteration in-jit scan (single
    # dispatch ~46 ms on the axon tunnel swamps one-shot timings) ---
    N_IT = 20

    @jax.jit
    def rollout_only(params, env_state, key):
        def body(carry, key_t):
            env_state = carry
            obs = env_state.agent_idx
            logits, value = net.apply(params, obs)
            a = jax.random.categorical(key_t, logits).astype(jnp.int32)
            logp = jnp.sum(
                jax.nn.log_softmax(logits) * jax.nn.one_hot(a, 4), axis=-1
            )
            new_state, (_, reward, done) = step_bits(sem, bl, env_state, a, True, MAX_EP)
            return new_state, _Traj(obs, a, logp, value, reward, done)

        def one(carry, k):
            env_state, acc = carry
            keys = jax.random.split(k, T)
            env_state, traj = jax.lax.scan(body, env_state, keys)
            return (env_state, acc + traj.reward.sum()), None

        (env_state, acc), _ = jax.lax.scan(
            one, (env_state, 0.0), jax.random.split(key, N_IT)
        )
        return acc

    env_state = reset_bits(bl, B)
    dt = timeit(rollout_only, params, env_state, key)
    print(f"rollout only: {dt/N_IT*1e3:.2f} ms/iter")

    # --- rollout + GAE ---
    @jax.jit
    def roll_gae(params, env_state, key):
        def body(carry, key_t):
            env_state = carry
            obs = env_state.agent_idx
            logits, value = net.apply(params, obs)
            a = jax.random.categorical(key_t, logits).astype(jnp.int32)
            logp = jnp.sum(jax.nn.log_softmax(logits) * jax.nn.one_hot(a, 4), axis=-1)
            new_state, (_, reward, done) = step_bits(sem, bl, env_state, a, True, MAX_EP)
            return new_state, _Traj(obs, a, logp, value, reward, done)

        def one(carry, k):
            env_state, acc = carry
            keys = jax.random.split(k, T)
            env_state, traj = jax.lax.scan(body, env_state, keys)
            _, bootstrap = net.apply(params, env_state.agent_idx)
            adv, tgt = gae_advantages(traj, bootstrap, cfg.gamma, cfg.gae_lambda)
            return (env_state, acc + adv.sum() + tgt.sum()), None

        (env_state, acc), _ = jax.lax.scan(
            one, (env_state, 0.0), jax.random.split(key, N_IT)
        )
        return acc

    dt = timeit(roll_gae, params, env_state, key)
    print(f"rollout+GAE: {dt/N_IT*1e3:.2f} ms/iter")

    # --- one minibatch grad step in isolation (mb = T*B/M) ---
    mb_size = T * B // 4

    def loss_fn(params, mb):
        obs, actions, logp_old, adv, targets = mb
        logits, values = net.apply(params, obs)
        logp_all = jax.nn.log_softmax(logits)
        logp = jnp.sum(logp_all * jax.nn.one_hot(actions, 4, dtype=logp_all.dtype), axis=-1)
        ratio = jnp.exp(logp - logp_old)
        pg = -jnp.mean(jnp.minimum(ratio * adv, jnp.clip(ratio, 0.8, 1.2) * adv))
        vf = jnp.mean((targets - values) ** 2)
        ent = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
        return pg + 0.5 * vf - 0.01 * ent

    @jax.jit
    def mb_scan(params, opt_state, mb):
        def one(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, mb)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), None, length=N_IT
        )
        return losses.sum()

    k = jax.random.PRNGKey(1)
    mb = (
        jax.random.randint(k, (mb_size,), 0, 256, jnp.int32),
        jax.random.randint(k, (mb_size,), 0, 4, jnp.int32),
        jnp.zeros((mb_size,), jnp.float32),
        jnp.ones((mb_size,), jnp.float32),
        jnp.zeros((mb_size,), jnp.float32),
    )
    dt = timeit(mb_scan, params, opt_state, mb)
    print(f"one minibatch grad step (mb={mb_size}): {dt/N_IT*1e3:.2f} ms  -> x16 = {dt/N_IT*16*1e3:.1f} ms")

    # --- env-axis shuffle of the slab in isolation ---
    slab = tuple(jnp.zeros((T, B), jnp.float32) for _ in range(5))

    @jax.jit
    def shuffle(slab, key):
        def one(acc, k):
            perm = jax.random.permutation(k, B)
            out = jax.tree.map(lambda x: x[:, perm], slab)
            return acc + sum(o[0, 0] for o in out), None

        acc, _ = jax.lax.scan(one, 0.0, jax.random.split(key, N_IT))
        return acc

    dt = timeit(shuffle, slab, key)
    print(f"env-axis shuffle of 5 (T,B) arrays: {dt/N_IT*1e3:.2f} ms  -> x4 epochs = {dt/N_IT*4*1e3:.1f} ms")


if __name__ == "__main__":
    main()
