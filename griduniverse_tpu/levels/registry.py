"""Built-in level assets — shipped text worlds, loadable by name.

Reference (SURVEY.md §2.1 #2): GridUniverse ships text maze files under a
levels/assets dir and loads them via a `custom_world_fp`-style kwarg. Here
the equivalent surface is `builtin_level(name)` / `builtin_level_names()`;
arbitrary files still load via `levels.text.load_level_file(path)`.

Host-side only; assets parse once with the same configurable alphabet as
every other text level (core.semantics.DEFAULT_CHAR_TO_TILE).
"""

from __future__ import annotations

import os

from ..core.types import Level
from .text import load_level_file

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


def builtin_level_names() -> list[str]:
    """Names of the shipped text worlds (sorted, without .txt)."""
    return sorted(
        fn[: -len(".txt")]
        for fn in os.listdir(_ASSET_DIR)
        if fn.endswith(".txt")
    )


def builtin_level_path(name: str) -> str:
    """Filesystem path of a shipped world — usable anywhere a
    `custom_world_fp` path is accepted (e.g. compat.GridUniverseEnv)."""
    path = os.path.join(_ASSET_DIR, name + ".txt")
    if not os.path.isfile(path):
        raise KeyError(
            f"unknown builtin level {name!r}; available: {builtin_level_names()}"
        )
    return path


def builtin_level(name: str) -> Level:
    """Load a shipped world by name → Level pytree."""
    return load_level_file(builtin_level_path(name))
