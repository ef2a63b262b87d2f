"""starcop_tpu — a TPU-native framework for methane plume detection.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the STARCOP
reference framework (semantic segmentation of methane plumes in hyperspectral /
multispectral remote-sensing imagery, Nature Scientific Reports 2023).

Pillars (mirroring reference capabilities, re-architected TPU-first):
  * ``starcop_tpu.ops``      — enhancement kernels: the mag1c albedo-corrected
    reweighted-L1 matched filter (batched/vmapped/Pallas-fused), band-ratio and
    MLR products, morphology. Reference: ``starcop/models/mag1c.py``,
    ``starcop/data/feature_extration.py``.
  * ``starcop_tpu.models``   — Flax U-Net family (MobileNetV2 encoder,
    smp-compatible decoder), tiny CNN baselines, classical threshold baselines.
    Reference: ``starcop/models/model_module.py``, ``starcop/baselines.py``.
  * ``starcop_tpu.data``     — product registry, normalization, chip datasets,
    tiling, weighted sampling, augmentation, EMIT ingestion, synthetic scenes.
  * ``starcop_tpu.parallel`` — device-mesh utilities; column-sharded full-scene
    enhancement and data-parallel training via jax.sharding/shard_map.
  * ``starcop_tpu.train``    — jitted train step, optimizer/schedule, checkpoints.
  * ``starcop_tpu.eval``     — confusion-matrix metrics and the validation
    harness (per-tile metrics, threshold sweep, difficulty split).
    Reference: ``starcop/validation.py``, ``starcop/metrics.py``.
"""

__version__ = "0.1.0"

from starcop_tpu import config as config  # noqa: F401
