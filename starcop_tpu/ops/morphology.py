"""Binary morphology as jittable TPU ops.

The reference relies on kornia (baselines.py:25-27) and scikit-image
(mask_creation.py:10-15) for erosion/dilation/opening. Here binary morphology
with an arbitrary structuring element is expressed as a tiny depthwise
convolution + comparison — exact for binary inputs, fuses under XLA, and works
batched under vmap/pjit:

  * dilation: conv(x, k) > 0          (outside-of-image counts as 0)
  * erosion:  conv(x, k) >= support   (support = conv(ones, k); outside of the
    image never erodes, matching BOTH kornia's and scikit-image's border
    semantics — skimage.morphology.binary_erosion pads with True)

Pass ``border_value=0`` to get scipy.ndimage's default convention instead
(out-of-image counts as background, so borders erode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# The reference baselines' structuring element (baselines.py:40-42) and
# skimage.morphology.disk(1) are both this 3x3 cross.
CROSS_KERNEL = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.float32)


def _conv2d_same(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 'same' convolution of (..., H, W) with a (kh, kw) kernel."""
    batch_shape = x.shape[:-2]
    h, w = x.shape[-2:]
    xr = x.reshape((-1, 1) + (h, w)).astype(jnp.float32)
    k = kernel.astype(jnp.float32)[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        xr, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(batch_shape + (h, w))


def dilation(x: jax.Array, kernel: jax.Array = None) -> jax.Array:
    """Binary dilation of (..., H, W) by a structuring element. Returns bool."""
    k = jnp.asarray(CROSS_KERNEL if kernel is None else kernel)
    return _conv2d_same(jnp.asarray(x, jnp.float32), k) > 0.5


def erosion(x: jax.Array, kernel: jax.Array = None, border_value: int = 1) -> jax.Array:
    """Binary erosion of (..., H, W) by a structuring element. Returns bool.

    border_value=1 (default) matches kornia AND scikit-image
    (binary_erosion pads with True): out-of-image pixels never erode.
    border_value=0 matches scipy.ndimage's default: borders erode.
    """
    k = jnp.asarray(CROSS_KERNEL if kernel is None else kernel)
    xin = jnp.asarray(x, jnp.float32)
    counts = _conv2d_same(xin, k)
    if border_value:
        support = _conv2d_same(jnp.ones_like(xin), k)
    else:
        support = jnp.sum(k)
    return counts >= support - 0.5


def binary_opening(x: jax.Array, kernel: jax.Array = None, border_value: int = 1) -> jax.Array:
    """Binary opening (erosion then dilation); reference baselines.py:25-27."""
    return dilation(erosion(x, kernel, border_value=border_value), kernel)
