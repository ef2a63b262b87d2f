"""Utilities: profiling/tracing, filesystem helpers."""

from starcop_tpu.utils.profiling import StageTimer, trace  # noqa: F401
