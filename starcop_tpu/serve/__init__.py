"""Serving: pipelined batch scene processing (granules -> plume masks)."""

from starcop_tpu.serve.pipeline import ScenePipeline, SceneResult  # noqa: F401
