"""Shared optimizer-schedule plumbing for the neural trainers.

One rule, used by PPO/A2C/DQN alike: a learning-rate schedule must be a
pure function of the Adam step count carried in `opt_state`, never of
Python-side loop position — that is what keeps chunked / checkpointed /
sharded runs BIT-EXACT resumes of unbroken ones (the same counter-based
contract as the fold_in RNG; tests/test_checkpoint.py)."""

from __future__ import annotations

import optax


def make_lr(
    lr: float,
    schedule: str,
    transition_steps: int | None,
    final_frac: float,
    knob: str,
):
    """Resolve (lr, schedule) into an optax learning rate.

    `schedule="constant"` returns the float unchanged; `"linear"` decays
    lr -> lr*final_frac over `transition_steps` OPTIMIZER steps (Adam
    applications — the caller converts its user-facing unit: PPO updates
    are num_epochs*num_minibatches Adam steps each, A2C updates one,
    DQN one per env step). Steps past the horizon hold the final value.
    `knob` names the caller's transition-steps config field for the
    error message."""
    if schedule == "constant":
        return lr
    if schedule == "linear":
        if transition_steps is None:
            raise ValueError(f"lr_schedule='linear' needs {knob}")
        return optax.linear_schedule(
            init_value=lr,
            end_value=lr * final_frac,
            transition_steps=transition_steps,
        )
    raise ValueError(f"unknown lr_schedule {schedule!r}")
