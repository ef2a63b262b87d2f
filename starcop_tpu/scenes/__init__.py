"""Full-scene pipelines: raw sensor data -> enhancement -> plume masks."""

from starcop_tpu.scenes.emit_pipeline import emit_inference, emit_mag1c  # noqa: F401
from starcop_tpu.scenes.aviris_pipeline import run_mag1c_groups  # noqa: F401
