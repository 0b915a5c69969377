"""Tracing / profiling hooks.

The reference has no profiling story (SURVEY §5: no torch.profiler, no
timers).  Here: ``jax.profiler`` trace capture around any code region, a
lightweight per-step timer with EMA reporting, and program-level cost
introspection via ``jax.stages``.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ptts_trace") -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace for the enclosed region:

        with profiling.trace("/tmp/trace"):
            train_step(...)
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup skip and EMA smoothing."""

    def __init__(self, warmup: int = 2, ema: float = 0.9):
        self.warmup = warmup
        self.ema = ema
        self.count = 0
        self.value: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> Optional[float]:
        if self._t0 is None:
            return None
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.value = dt if self.value is None else (
                self.ema * self.value + (1 - self.ema) * dt
            )
        return dt

    @property
    def steps_per_sec(self) -> Optional[float]:
        return None if not self.value else 1.0 / self.value


def compiled_stats(jitted_fn, *args, **kwargs) -> Dict[str, float]:
    """FLOP/memory analysis of a jitted function via XLA's cost analysis."""
    lowered = jitted_fn.lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    out = {}
    for k in ("flops", "bytes accessed", "transcendentals"):
        if cost and k in cost:
            out[k.replace(" ", "_")] = float(cost[k])
    try:
        out["generated_code_size_bytes"] = float(
            compiled.memory_analysis().generated_code_size_in_bytes
        )
        out["argument_size_bytes"] = float(
            compiled.memory_analysis().argument_size_in_bytes
        )
        out["temp_size_bytes"] = float(
            compiled.memory_analysis().temp_size_in_bytes
        )
    except Exception:
        pass
    return out


def check_git_hash(model_dir: str) -> Optional[str]:
    """Record/compare the repo commit hash in the run dir (reference
    ``utils.py:370-387`` provenance guard)."""
    import logging
    import subprocess

    source_dir = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if not os.path.exists(os.path.join(source_dir, ".git")):
        return None
    try:
        cur = subprocess.run(
            ["git", "-C", source_dir, "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
        ).stdout.strip()
    except Exception:
        return None
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "githash")
    if os.path.exists(path):
        saved = open(path).read().strip()
        if saved != cur:
            logging.getLogger(__name__).warning(
                "git hash mismatch: %s (saved) != %s (current)",
                saved[:8], cur[:8],
            )
    else:
        with open(path, "w") as f:
            f.write(cur)
    return cur
