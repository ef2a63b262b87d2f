"""Utilities: profiling/tracing, filesystem helpers."""

from starcop_tpu.utils.compile_cache import (  # noqa: F401
    enable_persistent_compilation_cache,
)
from starcop_tpu.utils.profiling import StageTimer, trace  # noqa: F401
