"""Metrics / logging / observability (SURVEY.md §5).

Reference: prints + matplotlib plots. Here: structured per-iteration metrics
via a tiny host-side logger fed at LOW frequency (epoch/chunk boundaries —
never inside a jitted loop; on-device code accumulates, host code reads
scalars once per chunk), plus optional `jax.debug.callback`-based streaming
for in-scan visibility when debugging.

Output sinks: python `logging`, an in-memory history (for tests/plots), and
JSONL files (the benchmark harness writes next to BASELINE.md).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Mapping

logger = logging.getLogger("griduniverse_tpu")


class MetricsLogger:
    """Collects {step: {name: value}} rows; mirrors to logging + JSONL."""

    def __init__(
        self,
        jsonl_path: str | os.PathLike | None = None,
        log_every: int = 1,
        name: str = "train",
    ):
        self.history: list[dict[str, Any]] = []
        self.jsonl_path = os.fspath(jsonl_path) if jsonl_path else None
        self.log_every = max(1, int(log_every))
        self.name = name
        self._t0 = time.perf_counter()
        if self.jsonl_path:
            os.makedirs(os.path.dirname(self.jsonl_path) or ".", exist_ok=True)

    def log(self, step: int, metrics: Mapping[str, Any]) -> None:
        row = {"step": int(step), "wall_s": time.perf_counter() - self._t0}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self.history.append(row)
        if len(self.history) % self.log_every == 0:
            pretty = ", ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()
                if k not in ("wall_s",)
            )
            logger.info("[%s] %s", self.name, pretty)
        if self.jsonl_path:
            with open(self.jsonl_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(row) + "\n")

    def latest(self) -> dict[str, Any]:
        return self.history[-1] if self.history else {}

    def series(self, key: str) -> list[float]:
        return [row[key] for row in self.history if key in row]


def debug_scalar(name: str, value) -> None:
    """In-jit escape hatch: stream a scalar to the host logger from inside
    a scan (debugging only — a host callback per step serializes the
    device; never leave this in a hot loop)."""
    import jax

    def _cb(v):
        logger.info("[debug] %s = %s", name, v)

    jax.debug.callback(_cb, value)
