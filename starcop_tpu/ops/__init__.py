"""Numerical enhancement kernels (the compute core).

All kernels are pure JAX (jit/vmap/pjit-compatible, static shapes) unless noted;
the Pallas-fused variants live in ``mag1c_pallas``.
"""

from starcop_tpu.ops.ch4_template import (  # noqa: F401
    generate_template_from_bands,
    get_mask_bad_bands,
    load_ch4_lut,
)
from starcop_tpu.ops.mag1c import (  # noqa: F401
    SCALING,
    NODATA,
    EPSILON,
    rmf,
    acrwl1mf,
    mag1c_column_blocks,
)
from starcop_tpu.ops.ratios import (  # noqa: F401
    weight_mag1c,
    ratio_2c_match_c_from_sums_outlier,
    ratio_mlr_local,
    lr_bands,
)
from starcop_tpu.ops.morphology import (  # noqa: F401
    erosion,
    dilation,
    binary_opening,
    CROSS_KERNEL,
)
from starcop_tpu.ops.padding import find_padding, padded_apply  # noqa: F401
