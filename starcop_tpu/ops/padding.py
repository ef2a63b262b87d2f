"""Reflect-padded full-scene inference.

TPU re-design of the reference's ``padded_predict``
(/root/reference/starcop/models/utils/padding.py:5-51): pad (C, H, W) scenes
with reflection to the next multiple of ``divisor`` (32 for the U-Net's 5
downsamplings), run ONE whole-scene forward, crop back. Padding + crop are
jittable, so the whole scene pipeline stays on-device.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp


def find_padding(v: int, divisor: int = 8) -> Tuple[int, int]:
    """Split the padding needed to reach the next multiple of divisor."""
    v_divisible = max(divisor, divisor * (-(-v // divisor)))
    total_pad = v_divisible - v
    pad_1 = total_pad // 2
    return pad_1, total_pad - pad_1


def padded_apply(tensor: jnp.ndarray, fn: Callable, divisor: int = 32) -> jnp.ndarray:
    """Apply ``fn`` to a (C, H, W) tensor with reflect padding to xdivisor.

    ``fn`` receives a (1, C, H', W') batch and must return (1, K, H', W') (or
    (1, H', W')); the output is cropped back to the input extent.
    """
    if tensor.ndim != 3:
        raise ValueError(f"Expected 3D (C, H, W) tensor, found {tensor.ndim}D")
    pad_r = find_padding(tensor.shape[-2], divisor)
    pad_c = find_padding(tensor.shape[-1], divisor)
    padded = jnp.pad(tensor, ((0, 0), pad_r, pad_c), mode="reflect")
    out = fn(padded[None])[0]
    slice_rows = slice(pad_r[0], None if pad_r[1] <= 0 else -pad_r[1])
    slice_cols = slice(pad_c[0], None if pad_c[1] <= 0 else -pad_c[1])
    if out.ndim == 3:
        return out[:, slice_rows, slice_cols]
    if out.ndim == 2:
        return out[slice_rows, slice_cols]
    raise NotImplementedError(f"Cannot crop output of shape {out.shape}")
