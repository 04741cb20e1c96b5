"""Shared example-script plumbing: platform selection + argparse."""

from __future__ import annotations

import argparse


def parse_args(description: str, **extra_flags):
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "--platform",
        default="cpu",
        choices=["cpu", "tpu", "default"],
        help="JAX platform: cpu (portable default), tpu (axon on this box), "
        "or default (leave jax.config untouched)",
    )
    for flag, (typ, default, help_) in extra_flags.items():
        p.add_argument(f"--{flag}", type=typ, default=default, help=help_)
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    elif args.platform == "tpu":
        # on this dev box the TPU platform is the experimental 'axon' plugin
        names = {d.platform for d in []}
        try:
            jax.config.update("jax_platforms", "axon,cpu")
        except Exception:
            pass
    return args
