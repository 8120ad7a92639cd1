"""Profiler integration (SURVEY §5.1).

The reference has only ad-hoc `torch.cuda.Event` timing pairs
(testing/test_ffmlp.py:125-233) and the GUI's wall-clock frame stats; the
TPU-native equivalent is a `jax.profiler` trace viewable in TensorBoard /
Perfetto (per-op device timeline, HBM traffic, fusion boundaries).

Usage:
    with profile_trace("/tmp/ws/profile"):   # no-op when dir is falsy
        train_steps()

`Trainer` wires this behind TrainConfig.profile_dir (one profiled epoch);
`bench.py` honors TNGP_PROFILE=<dir>.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler.trace context; a falsy dir makes it a no-op."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


class StepTimer:
    """Wall-clock step timing with blocking sync — the `torch.cuda.Event`
    pair equivalent (testing/test_ffmlp.py:125-233) for coarse stage timing
    when a full trace is overkill."""

    def __init__(self):
        self.times_ms: list[float] = []
        self._t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, *block_on) -> float:
        if block_on:
            jax.block_until_ready(block_on)
        dt = (time.perf_counter() - self._t0) * 1e3
        self.times_ms.append(dt)
        return dt

    @property
    def mean_ms(self) -> float:
        return sum(self.times_ms) / max(len(self.times_ms), 1)
