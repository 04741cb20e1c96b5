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

    from griduniverse_tpu.utils.platform import force_platform

    if args.platform == "cpu":
        force_platform("cpu")
    elif args.platform == "tpu":
        # on this dev box the TPU platform is the experimental 'axon' plugin
        force_platform("axon,cpu")
    return args
