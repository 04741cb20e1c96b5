"""Checkpoint / resume tests (SURVEY.md §5): resume must be BIT-EXACT —
run(2N) ≡ run(N) ∘ save ∘ restore ∘ run(N) — because all learner state
(Q, env state, RNG keys, counters) is explicit and randomness is
counter-based."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from griduniverse_tpu import make_semantics
from griduniverse_tpu.algos.td import td_init, td_run
from griduniverse_tpu.levels.builders import make_level_from_indices
from griduniverse_tpu.utils.checkpoint import (
    CheckpointManager,
    restore_checkpoint,
    save_checkpoint,
)
from griduniverse_tpu.utils.metrics import MetricsLogger

SEM = make_semantics()


def small_level():
    return make_level_from_indices((4, 4), start_idx=0, lava=[5], goals=[15])


def assert_trees_bitequal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestChunkInvariance:
    def test_td_run_chunking_is_bitexact(self):
        """The precondition for checkpointing: chunked training == unbroken
        training, no filesystem involved."""
        level = small_level()
        key = jax.random.PRNGKey(0)
        ts0 = td_init(SEM, level, key, batch_size=32, epsilon=0.2)

        full = td_run(SEM, level, ts0, 200, alpha=0.2, epsilon=0.2)
        half = td_run(SEM, level, ts0, 100, alpha=0.2, epsilon=0.2)
        resumed = td_run(SEM, level, half, 100, alpha=0.2, epsilon=0.2)
        assert_trees_bitequal(full, resumed)
        assert int(full.step) == 200


class TestOrbaxRoundTrip:
    def test_save_restore_train_state(self, tmp_path):
        level = small_level()
        ts = td_run(
            SEM, level,
            td_init(SEM, level, jax.random.PRNGKey(1), 32, epsilon=0.2),
            50, alpha=0.2, epsilon=0.2,
        )
        save_checkpoint(tmp_path / "ckpt", ts)
        template = jax.tree.map(jnp.zeros_like, ts)
        restored = restore_checkpoint(tmp_path / "ckpt", template)
        assert_trees_bitequal(ts, restored)

    def test_resume_through_disk_is_bitexact(self, tmp_path):
        level = small_level()
        ts0 = td_init(SEM, level, jax.random.PRNGKey(2), 32, epsilon=0.2)
        full = td_run(SEM, level, ts0, 120, alpha=0.2, epsilon=0.2)

        half = td_run(SEM, level, ts0, 60, alpha=0.2, epsilon=0.2)
        save_checkpoint(tmp_path / "mid", half)
        restored = restore_checkpoint(
            tmp_path / "mid", jax.tree.map(jnp.zeros_like, half)
        )
        resumed = td_run(SEM, level, restored, 60, alpha=0.2, epsilon=0.2)
        assert_trees_bitequal(full, resumed)

    def test_a2c_params_round_trip(self, tmp_path):
        from griduniverse_tpu.models import A2CConfig, a2c_train

        cfg = A2CConfig(rollout_len=4, hidden=(32,), embed_dim=16)
        res = a2c_train(
            SEM, small_level(), jax.random.PRNGKey(3), cfg,
            num_updates=3, batch_size=16,
        )
        save_checkpoint(tmp_path / "params", res.params)
        back = restore_checkpoint(
            tmp_path / "params", jax.tree.map(jnp.zeros_like, res.params)
        )
        assert_trees_bitequal(res.params, back)

    def test_ppo_params_round_trip(self, tmp_path):
        from griduniverse_tpu.models import PPOConfig, ppo_train

        cfg = PPOConfig(
            rollout_len=4, num_epochs=1, num_minibatches=2,
            hidden=(32,), embed_dim=16,
        )
        res = ppo_train(
            SEM, small_level(), jax.random.PRNGKey(5), cfg,
            num_updates=2, batch_size=16,
        )
        save_checkpoint(tmp_path / "ppo", res.params)
        back = restore_checkpoint(
            tmp_path / "ppo", jax.tree.map(jnp.zeros_like, res.params)
        )
        assert_trees_bitequal(res.params, back)

    def test_dqn_params_round_trip(self, tmp_path):
        from griduniverse_tpu.models import DQNConfig, dqn_train

        cfg = DQNConfig(
            buffer_capacity=64, batch_size_train=16,
            hidden=(32,), embed_dim=16,
        )
        res = dqn_train(
            SEM, small_level(), jax.random.PRNGKey(6), cfg,
            num_steps=4, batch_size=16,
        )
        save_checkpoint(tmp_path / "dqn", res.params)
        back = restore_checkpoint(
            tmp_path / "dqn", jax.tree.map(jnp.zeros_like, res.params)
        )
        assert_trees_bitequal(res.params, back)


class TestManager:
    def test_keep_latest_k(self, tmp_path):
        level = small_level()
        ts = td_init(SEM, level, jax.random.PRNGKey(4), 16)
        mgr = CheckpointManager(tmp_path / "run", max_to_keep=2)
        for step in (10, 20, 30):
            ts = td_run(SEM, level, ts, 10)
            mgr.save(step, ts)
        assert mgr.steps() == [20, 30]
        step, restored = mgr.restore_latest(jax.tree.map(jnp.zeros_like, ts))
        assert step == 30
        assert_trees_bitequal(ts, restored)

    def test_restore_empty_returns_template(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "none")
        step, state = mgr.restore_latest({"a": jnp.zeros(3)})
        assert step == 0
        assert float(state["a"].sum()) == 0.0

    def test_async_saves_do_not_perturb_resume(self, tmp_path):
        """Background (async_=True) saves between chunks leave the
        chunked run bit-equal to the unbroken one, restore_latest joins
        the in-flight write, and pruning keeps the latest K."""
        level = small_level()
        full = td_run(
            SEM, level, td_init(SEM, level, jax.random.PRNGKey(4), 16), 30
        )
        ts = td_init(SEM, level, jax.random.PRNGKey(4), 16)
        with CheckpointManager(
            tmp_path / "async", max_to_keep=2, async_=True
        ) as mgr:
            for step in (10, 20, 30):
                ts = td_run(SEM, level, ts, 10)
                mgr.save(step, ts)  # returns before the write commits
            # restore_latest must see the just-scheduled step-30 write
            step, restored = mgr.restore_latest(
                jax.tree.map(jnp.zeros_like, ts)
            )
        assert step == 30
        assert mgr.steps() == [20, 30]
        assert_trees_bitequal(ts, restored)
        assert_trees_bitequal(full, restored)

    def test_async_close_idempotent_and_falls_back_to_sync(self, tmp_path):
        level = small_level()
        ts = td_init(SEM, level, jax.random.PRNGKey(4), 16)
        mgr = CheckpointManager(tmp_path / "closed", async_=True)
        mgr.save(5, ts)
        mgr.close()
        mgr.close()
        mgr.save(6, ts)  # sync path after close still works
        assert mgr.steps() == [5, 6]


class TestMetricsLogger:
    def test_history_and_jsonl(self, tmp_path):
        import json

        m = MetricsLogger(jsonl_path=tmp_path / "m.jsonl")
        m.log(1, {"loss": 0.5, "ret": jnp.float32(1.25)})
        m.log(2, {"loss": 0.25})
        assert m.series("loss") == [0.5, 0.25]
        assert m.latest()["step"] == 2
        rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
        assert rows[0]["ret"] == 1.25


class TestNeuralTrainStates:
    """PPO/DQN resumable train states: run(2N) ≡ run(N) ∘ run(N), and the
    same through an orbax save/restore round trip (SURVEY.md §5 checkpoint
    row, extended to the neural stack)."""

    def _level(self):
        from griduniverse_tpu.levels.builders import make_level_from_indices

        return make_level_from_indices((2, 6), start_idx=0, goals=[5])

    def test_ppo_chunking_is_bitexact(self):
        from griduniverse_tpu.models import PPOConfig, ppo_init, ppo_run

        level = self._level()
        cfg = PPOConfig(
            rollout_len=4, max_episode_steps=16, hidden=(32,), embed_dim=16,
            num_epochs=2, num_minibatches=2,
        )
        ts0 = ppo_init(SEM, level, jax.random.PRNGKey(3), cfg, batch_size=16)
        full = ppo_run(SEM, level, ts0, cfg, num_updates=8)
        half = ppo_run(SEM, level, ts0, cfg, num_updates=4)
        resumed = ppo_run(SEM, level, half, cfg, num_updates=4)
        assert_trees_bitequal(full, resumed)
        assert int(full.update) == 8

    def test_dqn_chunking_is_bitexact_both_replay_modes(self):
        import dataclasses as dc

        from griduniverse_tpu.models import DQNConfig, dqn_init, dqn_run

        level = self._level()
        base = DQNConfig(
            buffer_capacity=256, batch_size_train=32, learn_start=32,
            eps_anneal_steps=100, hidden=(32,), embed_dim=16,
            max_episode_steps=16,
        )
        for cfg in (base, dc.replace(base, prioritized=True)):
            ts0 = dqn_init(SEM, level, jax.random.PRNGKey(4), cfg, batch_size=16)
            full = dqn_run(SEM, level, ts0, cfg, num_steps=120)
            half = dqn_run(SEM, level, ts0, cfg, num_steps=60)
            resumed = dqn_run(SEM, level, half, cfg, num_steps=60)
            assert_trees_bitequal(full, resumed)
            assert int(full.t) == 120

    def test_ppo_resume_through_disk_is_bitexact(self, tmp_path):
        from griduniverse_tpu.models import PPOConfig, ppo_init, ppo_run

        level = self._level()
        cfg = PPOConfig(
            rollout_len=4, max_episode_steps=16, hidden=(32,), embed_dim=16,
            num_epochs=1, num_minibatches=2,
        )
        ts0 = ppo_init(SEM, level, jax.random.PRNGKey(5), cfg, batch_size=16)
        full = ppo_run(SEM, level, ts0, cfg, num_updates=6)
        half = ppo_run(SEM, level, ts0, cfg, num_updates=3)
        save_checkpoint(tmp_path / "ppo_mid", half)
        restored = restore_checkpoint(tmp_path / "ppo_mid", half)
        resumed = ppo_run(SEM, level, restored, cfg, num_updates=3)
        assert_trees_bitequal(full, resumed)

    def test_dqn_resume_through_disk_is_bitexact(self, tmp_path):
        from griduniverse_tpu.models import DQNConfig, dqn_init, dqn_run

        level = self._level()
        cfg = DQNConfig(
            buffer_capacity=256, batch_size_train=32, learn_start=32,
            eps_anneal_steps=100, hidden=(32,), embed_dim=16,
            max_episode_steps=16, prioritized=True,
        )
        ts0 = dqn_init(SEM, level, jax.random.PRNGKey(6), cfg, batch_size=16)
        full = dqn_run(SEM, level, ts0, cfg, num_steps=100)
        half = dqn_run(SEM, level, ts0, cfg, num_steps=50)
        save_checkpoint(tmp_path / "dqn_mid", half)
        restored = restore_checkpoint(tmp_path / "dqn_mid", half)
        resumed = dqn_run(SEM, level, restored, cfg, num_steps=50)
        assert_trees_bitequal(full, resumed)

    def test_a2c_chunking_is_bitexact(self):
        from griduniverse_tpu.models import A2CConfig, a2c_init, a2c_run

        level = self._level()
        cfg = A2CConfig(rollout_len=4, max_episode_steps=16, hidden=(32,), embed_dim=16)
        ts0 = a2c_init(SEM, level, jax.random.PRNGKey(8), cfg, batch_size=16)
        full = a2c_run(SEM, level, ts0, cfg, num_updates=8)
        half = a2c_run(SEM, level, ts0, cfg, num_updates=4)
        resumed = a2c_run(SEM, level, half, cfg, num_updates=4)
        assert_trees_bitequal(full, resumed)
        assert int(full.update) == 8

    def test_ppo_lr_schedule_chunking_is_bitexact(self):
        """The linear lr schedule is driven by the Adam count in
        opt_state (models/ppo.py _make_tx), so a chunked run consumes
        EXACTLY the same lr sequence as an unbroken one — the same
        counter-based contract as the RNG."""
        from griduniverse_tpu.models import PPOConfig, ppo_init, ppo_run

        level = self._level()
        cfg = PPOConfig(
            rollout_len=4, max_episode_steps=16, hidden=(32,), embed_dim=16,
            num_epochs=2, num_minibatches=2,
            lr_schedule="linear", lr_decay_updates=8,
        )
        ts0 = ppo_init(SEM, level, jax.random.PRNGKey(3), cfg, batch_size=16)
        full = ppo_run(SEM, level, ts0, cfg, num_updates=8)
        half = ppo_run(SEM, level, ts0, cfg, num_updates=4)
        resumed = ppo_run(SEM, level, half, cfg, num_updates=4)
        assert_trees_bitequal(full, resumed)

        # and the schedule is actually wired: a constant-lr run from the
        # same init diverges from the decayed one
        cfg_const = PPOConfig(
            rollout_len=4, max_episode_steps=16, hidden=(32,), embed_dim=16,
            num_epochs=2, num_minibatches=2,
        )
        const = ppo_run(SEM, level, ts0, cfg_const, num_updates=8)
        leaves_a = jax.tree_util.tree_leaves(full.params)
        leaves_b = jax.tree_util.tree_leaves(const.params)
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves_a, leaves_b)
        )

    def test_ppo_lr_schedule_validation(self):
        from griduniverse_tpu.models import PPOConfig, ppo_init
        from griduniverse_tpu.models.ppo import _make_tx

        with pytest.raises(ValueError, match="lr_decay_updates"):
            _make_tx(PPOConfig(lr_schedule="linear"))
        with pytest.raises(ValueError, match="unknown lr_schedule"):
            _make_tx(PPOConfig(lr_schedule="cosine"))

    def test_a2c_dqn_lr_schedule_chunking_is_bitexact(self):
        """A2C and DQN share the opt_state-counter lr schedule contract
        (models/optim.py): chunked runs are bit-exact resumes."""
        import dataclasses as dc

        from griduniverse_tpu.models import (
            A2CConfig, DQNConfig, a2c_init, a2c_run, dqn_init, dqn_run,
        )

        level = self._level()
        acfg = A2CConfig(
            rollout_len=4, max_episode_steps=16, hidden=(32,), embed_dim=16,
            lr_schedule="linear", lr_decay_updates=8,
        )
        ts0 = a2c_init(SEM, level, jax.random.PRNGKey(9), acfg, batch_size=16)
        full = a2c_run(SEM, level, ts0, acfg, num_updates=8)
        half = a2c_run(SEM, level, ts0, acfg, num_updates=4)
        resumed = a2c_run(SEM, level, half, acfg, num_updates=4)
        assert_trees_bitequal(full, resumed)
        # wired: differs from the constant-lr run
        const = a2c_run(
            SEM, level, ts0, dc.replace(acfg, lr_schedule="constant"),
            num_updates=8,
        )
        assert any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(full.params),
                jax.tree_util.tree_leaves(const.params),
            )
        )

        dcfg = DQNConfig(
            buffer_capacity=256, batch_size_train=32, learn_start=32,
            eps_anneal_steps=100, hidden=(32,), embed_dim=16,
            max_episode_steps=16, lr_schedule="linear", lr_decay_steps=120,
        )
        ts0 = dqn_init(SEM, level, jax.random.PRNGKey(10), dcfg, batch_size=16)
        full = dqn_run(SEM, level, ts0, dcfg, num_steps=120)
        half = dqn_run(SEM, level, ts0, dcfg, num_steps=60)
        resumed = dqn_run(SEM, level, half, dcfg, num_steps=60)
        assert_trees_bitequal(full, resumed)
