"""Checkpoint / resume — orbax over the full learner pytree.

Reference: absent (solvers run to completion in-process, SURVEY.md §5).
New-framework plan (same table): "orbax.checkpoint of the full learner
pytree (Q-table/V-table or actor-critic params + opt state + env-state +
RNG keys); resume must be bit-exact because everything incl. RNG keys is
explicit state."

Bit-exactness comes from two framework-wide properties:
  1. ALL state is an explicit pytree (TDTrainState, A2C params/opt-state,
     EnvState) — there is no hidden mutable state anywhere; and
  2. per-step randomness is counter-based (`fold_in(key, global_step)`),
     so a resumed run consumes exactly the randoms the unbroken run would
     have (tests/test_checkpoint.py asserts run(2N) ≡ run(N)∘restore∘run(N)
     bit-for-bit).
"""

from __future__ import annotations

import os
from typing import Any


try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except ImportError:  # pragma: no cover - orbax is baked into the image
    _HAS_ORBAX = False


def _require_orbax():
    if not _HAS_ORBAX:
        raise RuntimeError(
            "orbax.checkpoint is required for checkpointing; install orbax"
        )


def save_checkpoint(path: str | os.PathLike, state: Any) -> None:
    """Write a pytree checkpoint atomically to `path` (a directory)."""
    _require_orbax()
    path = os.path.abspath(os.fspath(path))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str | os.PathLike, template: Any) -> Any:
    """Restore a pytree checkpoint. `template` is a matching pytree (same
    treedef/shapes/dtypes — e.g. a freshly-initialized train state) used to
    reconstruct typed leaves."""
    _require_orbax()
    path = os.path.abspath(os.fspath(path))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


class CheckpointManager:
    """Thin step-indexed manager: keep the latest K checkpoints of a
    training loop (the chunked-training driver for long runs).

    Usage:
        mgr = CheckpointManager(dir, max_to_keep=3)
        mgr.save(step, train_state)
        step, state = mgr.restore_latest(template)   # (0, template) if none

    async_=True overlaps the disk write with training: `save` snapshots
    the state to host (the only device-blocking part — orbax fetches
    leaves before returning) and writes in a background thread, so the
    chunk boundary costs a host copy instead of a full serialize+fsync.
    The previous background write is JOINED before the next save /
    restore / steps listing — any background failure surfaces there (or
    at an explicit `wait()` / `close()`), never silently. The training
    state itself is unaffected: saving is read-only, so async saves
    cannot perturb bit-exact resume (tests/test_checkpoint.py).
    """

    def __init__(
        self,
        directory: str | os.PathLike,
        max_to_keep: int = 3,
        async_: bool = False,
    ):
        _require_orbax()
        self.directory = os.path.abspath(os.fspath(directory))
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        # StandardCheckpointer IS an orbax AsyncCheckpointer: save()
        # returns once leaves are snapshotted to host and commits in a
        # background thread. The sync path below simply joins
        # immediately after each save.
        self._async = bool(async_)
        self._ckptr = ocp.StandardCheckpointer() if self._async else None

    def wait(self) -> None:
        """Join the in-flight background save, raising any write error."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def close(self) -> None:
        """Join and release the background checkpointer (idempotent)."""
        if self._ckptr is not None:
            self._ckptr.close()
            self._ckptr = None
            self._async = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:012d}")

    def steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    out.append(int(name[5:]))
                except ValueError:
                    continue
        return sorted(out)

    def save(self, step: int, state: Any) -> None:
        if self._ckptr is not None:
            # join the previous write first: at most one in flight, and
            # its errors surface here rather than being dropped
            self._ckptr.wait_until_finished()
            # garbage-collect committed older steps BEFORE scheduling,
            # so the listing can't see the new uncommitted dir (keep
            # max_to_keep-1 existing + the one being written)
            keep = self.max_to_keep - 1
            existing = self.steps()
            excess = existing[:-keep] if keep > 0 else existing
            self._ckptr.save(self._step_dir(step), state, force=True)
        else:
            save_checkpoint(self._step_dir(step), state)
            excess = self.steps()[: -self.max_to_keep]
        for old in excess:
            import shutil

            shutil.rmtree(self._step_dir(old), ignore_errors=True)

    def restore_latest(self, template: Any) -> tuple[int, Any]:
        self.wait()  # a just-scheduled save must be visible to resume
        steps = self.steps()
        if not steps:
            return 0, template
        step = steps[-1]
        return step, restore_checkpoint(self._step_dir(step), template)
