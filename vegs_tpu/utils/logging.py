"""Observability: metrics logging and step timing.

The reference's sinks are wandb scalars (train.py:219-245) plus CUDA event
timers that are created but never read (SURVEY §5.1). Here: a JSONL metrics
logger (wandb-compatible dict schema; streams to wandb too when the package
and an API key are present), and a real step timer with jax.profiler trace
capture on demand.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    """Append-only JSONL metrics (one dict per step) + optional wandb."""

    def __init__(self, out_dir, use_wandb: bool = False, **wandb_kwargs):
        self.path = Path(out_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**wandb_kwargs)
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: Optional[int] = None) -> None:
        rec = dict(metrics)
        if step is not None:
            rec["step"] = step
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


class StepTimer:
    """Wall-clock per-phase timing with EMA; optional jax.profiler traces.

    Usage:
        timer = StepTimer()
        with timer("render"):
            ...
        timer.summary() -> {"render": ema_seconds, ...}
    """

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.times: dict[str, float] = {}

    def __call__(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                dt = time.perf_counter() - self.t0
                prev = timer.times.get(name)
                timer.times[name] = (
                    dt if prev is None else timer.ema * prev + (1 - timer.ema) * dt
                )

        return _Ctx()

    def summary(self) -> dict[str, float]:
        return dict(self.times)


def trace_steps(log_dir: str):
    """Context manager capturing a jax.profiler trace (TensorBoard format)."""
    import jax

    return jax.profiler.trace(log_dir)
