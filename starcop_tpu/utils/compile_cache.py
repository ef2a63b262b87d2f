"""Persistent XLA compilation cache for TPU entry points.

Why this is a first-class feature and not a dev convenience: TPU (and
especially remote-attached TPU) compile latency is large and highly
variable — measured 20 s to well past 10 minutes for the same program on
this build's remote-compile tunnel — while the serving/CLI entry points
compile the same handful of programs on every process start (the matched
filter at one scene geometry, the U-Net forward at one tile shape, the
train step at one batch shape). JAX's persistent compilation cache keys
serialized executables by HLO + compile options + compiler version, so a
warm cache turns every restart's multi-minute compile tax into a disk
read. All production entry points (bench, serving, train/eval CLIs) call
:func:`enable_persistent_compilation_cache` before their first trace.

Env overrides:
  STARCOP_COMPILE_CACHE=<dir>  cache directory (default
      ``~/.cache/starcop_tpu/xla``).
  STARCOP_COMPILE_CACHE=0      disable entirely.
"""

from __future__ import annotations

import os
from typing import Optional

_ENV = "STARCOP_COMPILE_CACHE"
_DEFAULT_SUBDIR = os.path.join("starcop_tpu", "xla")


def enable_persistent_compilation_cache(
    cache_dir: Optional[str] = None, *, min_compile_time_secs: float = 1.0
) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``cache_dir`` and return
    the directory actually used (None when disabled via ``<env>=0``).

    Safe to call repeatedly and before/after the first ``import jax`` (JAX
    reads these config values lazily at compile time); only compiles slower
    than ``min_compile_time_secs`` are persisted, so trivial CPU-test
    programs don't churn the cache.
    """
    env = os.environ.get(_ENV)
    if env is not None and env.strip() in ("0", "", "off", "false"):
        return None
    if env:
        cache_dir = env
    if cache_dir is None:
        xdg = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
        cache_dir = os.path.join(xdg, _DEFAULT_SUBDIR)

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    # JAX initializes the persistent cache lazily at the process's FIRST
    # compile and then pins that decision: if anything compiled before this
    # call (sitecustomize imports jax at startup here; test suites compile
    # early), the dir update above is silently ignored. Reset so the next
    # compile re-reads the config.
    try:
        from jax._src import compilation_cache

        compilation_cache.reset_cache()
    except Exception:  # pragma: no cover — private API; cache stays best-effort
        pass
    return cache_dir
