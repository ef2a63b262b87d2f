"""Profiling and tracing hooks.

The reference has no profiling beyond tqdm bars (SURVEY.md §5). This framework
provides: ``trace`` — a context manager around ``jax.profiler`` writing XPlane
traces viewable in TensorBoard/Perfetto; ``StageTimer`` — lightweight named
wall-clock stages with device synchronization, used by the scene pipelines and
the benchmark harness.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

logger = logging.getLogger("starcop_tpu.profiling")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope: `with trace('/tmp/trace'): step()`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StageTimer:
    """Named stage timing with optional device sync at stage boundaries.

    Example:
        timer = StageTimer()
        with timer.stage("mag1c"):
            mf = run_filter(...)
        timer.report()
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: Dict[str, float] = {}

    def _sync(self):
        if self.sync:
            import jax

            # A tiny device round-trip drains the dispatch queue (under remote
            # TPU tunnels block_until_ready alone can return early).
            import jax.numpy as jnp

            float(jnp.zeros(()).sum())

    @contextlib.contextmanager
    def stage(self, name: str):
        self._sync()
        t0 = time.time()
        try:
            yield
        finally:
            self._sync()
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def report(self, log=True) -> Dict[str, float]:
        if log:
            for name, t in self.times.items():
                logger.info("stage %-20s %8.3fs", name, t)
        return dict(self.times)
