"""Datasets, normalization, tiling, sampling, augmentation, synthetic scenes."""

from starcop_tpu.data.normalizer import BAND_NORMALIZATION, DataNormalizer  # noqa: F401
