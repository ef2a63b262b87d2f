"""Datasets, normalization, tiling, sampling, augmentation, synthetic scenes,
sensor simulation, label refinement, negative mining, chip caching, EMIT."""

from starcop_tpu.data.normalizer import BAND_NORMALIZATION, DataNormalizer  # noqa: F401
from starcop_tpu.data.dataset import ChipDataset, read_index_csv  # noqa: F401
from starcop_tpu.data.datamodule import BatchLoader, DataModule  # noqa: F401
from starcop_tpu.data.features import FEATURES, extract_features  # noqa: F401
from starcop_tpu.data.labels import proposed_mask  # noqa: F401
