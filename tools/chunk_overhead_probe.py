"""Per-chunk re-entry overhead of the resumable sharded runners
(VERDICT r4 next #9): what does checkpoint-grade chunking COST?

`ppo_run_sharded(ts, num_updates=k)` runs k updates inside one jitted
shard_map scan. Chunking a run into many calls buys a finer resume
granularity (a kill replays at most one chunk — examples/12) but pays a
per-call re-entry cost: jit dispatch, donated-state round trip, and the
host sync at the chunk boundary. This probe measures that cost directly
at fixed total work: T updates as one call vs T calls of one update
(and the geometric ladder in between), on the 8-device virtual CPU
mesh.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python tools/chunk_overhead_probe.py

Measured 2026-08-21 (this box, 2 cores, B=512, 32 updates, best-of-3):
re-entry costs ~5-15 ms per extra call (host-mesh dispatch + state
round trip); at ~9.5 ms/update of compute that makes num_updates=1
chunking 1.52x total and chunks >= 8 updates <= 1.08x. On the axon TPU
tunnel the fixed dispatch+fetch latency is ~20-25 ms/call
(docs/PERFORMANCE.md §2), so the same conclusion transfers: chunks of
>= a few hundred ms of device compute amortize re-entry to noise;
only second-granularity chunking pays visibly. Written up in
docs/PERFORMANCE.md §15; examples/12 cites it for picking
updates_per_chunk.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

from griduniverse_tpu import make_semantics
from griduniverse_tpu.levels.builders import walls_and_goal_16x16
from griduniverse_tpu.models import PPOConfig, ppo_init_sharded, ppo_run_sharded
from griduniverse_tpu.parallel import make_env_mesh

SEM = make_semantics()
LEVEL = walls_and_goal_16x16()
B = 512
TOTAL = 32
REPEATS = 3


def main():
    mesh = make_env_mesh()
    cfg = PPOConfig(
        rollout_len=8, num_epochs=2, num_minibatches=2, hidden=(32,),
        embed_dim=8, max_episode_steps=32, compute_dtype="float32",
    )

    def run_chunked(k: int) -> float:
        """Wall-clock of TOTAL updates in chunks of k (fresh state)."""
        ts = ppo_init_sharded(
            mesh, SEM, LEVEL, jax.random.PRNGKey(0), cfg, batch_size=B
        )
        t0 = time.perf_counter()
        for _ in range(TOTAL // k):
            ts = ppo_run_sharded(mesh, SEM, LEVEL, ts, cfg, num_updates=k)
        jax.block_until_ready(ts.params)
        return time.perf_counter() - t0

    sizes = [k for k in (32, 16, 8, 4, 2, 1) if TOTAL % k == 0]
    for k in sizes:
        run_chunked(k)  # compile this chunk shape
    rows = []
    for k in sizes:
        t = min(run_chunked(k) for _ in range(REPEATS))
        rows.append((k, t))
        base = rows[0][1]
        n_calls = TOTAL // k
        print(
            f"chunk={k:3d} ({n_calls:3d} calls): {t * 1e3:8.1f} ms total, "
            f"re-entry ≈ {(t - base) / max(n_calls - 1, 1) * 1e3:6.1f} "
            f"ms/extra-call, slowdown {t / base:5.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
