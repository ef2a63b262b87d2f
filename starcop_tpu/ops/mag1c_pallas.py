"""Pallas-fused matched filter iteration.

The reweighted-L1 iteration's per-pixel work (matched-filter scores, signal
removal, moment accumulation) is HBM-bandwidth-bound: the XLA expression of
``acrwl1mf`` reads the (B, P, S) radiance ~3-4x per iteration (separate fusions
for the mf matvec, the modx mean, and the covariance matmul). This kernel
fuses all of it into ONE streaming pass per iteration:

    for each pixel tile (VMEM-resident):
        mf_new  = relu(((x - mu) @ cit - 1/(R (mf_prev + eps))) / (R norm))
        modx    = x - c R mf_new target
        s1     += row-sum of (w modx)
        s2     += (w modx) modx^T     (S x S MXU matmul)

Layout: the kernel streams the radiance TRANSPOSED, (B, S, P) — pixels on the
dense 128-lane axis, bands on sublanes. With S ~ 50-80 the natural (B, P, S)
layout would waste ~60% of DMA bandwidth padding 50 lanes to 128; transposed,
padding is only S -> ceil(S/8)*8 sublanes (~10%). The one-time transpose is a
single HBM shuffle amortized over 30+ streaming passes.

The tiny O(S^2) per-iteration solve (covariance assembly, shrinkage, Cholesky,
triangular solves, normalizer) stays in XLA between passes — it is latency-
trivial and XLA's batched Cholesky is already optimal at S ~ 50-80.

Numerics: the radiance is pre-centered by the per-block initial mean so the
single-pass moment accumulation (s2/n - mu mu^T) is well-conditioned in f32;
the mean/target bookkeeping stays in original units. Parity with
starcop_tpu.ops.mag1c.acrwl1mf is pinned by tests.

Semantics vs the reference algorithm (mag1c.py:176-280): identical update
order; iteration 0 of the fused loop passes through the rmf-initialized mf
(the kernel's ``first`` flag) so the rmf-vs-loop differences (no regularizer,
unclamped normalizer) are preserved exactly.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from starcop_tpu.ops.mag1c import (
    EPSILON,
    SCALING,
    _shrink_diag,
    _cho_solve_vec,
    _weighted_mean,
)

DEFAULT_TILE_P = 8192


def _dividing_tile(p0: int, tile_p: int):
    """Largest lane-aligned (multiple-of-128) divisor of ``p0`` that is
    <= ``tile_p``; None if there is none. Lets the unweighted path run with
    zero pixel padding (padding would require a validity mask, i.e. an extra
    full-cube masking pass)."""
    t = tile_p - tile_p % 128
    while t >= 128:
        if p0 % t == 0:
            return t
        t -= 128
    return None


def _fused_iter_kernel(
    first_ref,   # SMEM (1, 1) int32: 1 -> pass mf through (init iteration)
    x_ref,       # (1, S, T) centered radiance tile (transposed layout)
    w_ref,       # (1, 1, T) weights
    r_ref,       # (1, 1, T) albedo factor
    mf_ref,      # (1, 1, T) mf from previous iteration
    mu_ref,      # (1, S, 1) centered mean of current background estimate
    target_ref,  # (1, S, 1) target spectrum (original units)
    cit_ref,     # (1, S, 1) C^{-1} target
    norm_ref,    # (1, 1, 1) clamped normalizer
    mf_out_ref,  # (1, 1, T)
    s1_ref,      # (1, S, 1) accumulated weighted modx row-sums
    s2_ref,      # (1, S, S) accumulated weighted modx modx^T
    *,
    cov_scale: float,
):
    pt = pl.program_id(1)

    x = x_ref[0].astype(jnp.float32)  # (S, T); tile may stream as bf16
    w = w_ref[0]             # (1, T)
    r = r_ref[0]
    mf_prev = mf_ref[0]
    mu = mu_ref[0]           # (S, 1)
    target = target_ref[0]
    cit = cit_ref[0]
    norm = norm_ref[0, 0, 0]

    xm = x - mu
    # proj[t] = sum_s xm[s, t] cit[s]: (1, S) x (S, T) on the MXU.
    proj = jax.lax.dot_general(
        cit.T, xm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, T)
    regularizer = 1.0 / (r * (mf_prev + EPSILON))
    mf_new = jnp.maximum((proj - regularizer) / (r * norm), 0.0) * w

    # Init iteration: pass the rmf-initialized mf through unchanged.
    mf_new = jnp.where(first_ref[0, 0] > 0, mf_prev, mf_new)
    mf_out_ref[0] = mf_new

    modx = x - cov_scale * target * (r * mf_new)  # (S,1)*(1,T) outer broadcast
    modx_w = modx * w

    s1_tile = jnp.sum(modx_w, axis=1, keepdims=True)  # (S, 1)
    # s2[s, u] = sum_t modx_w[s, t] modx[u, t]: contract the lane axis.
    s2_tile = jax.lax.dot_general(
        modx_w, modx, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, S)

    @pl.when(pt == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    s1_ref[0] += s1_tile
    s2_ref[0] += s2_tile


def _make_fused_iter(b: int, p: int, s: int, tile_p: int, cov_scale: float, interpret: bool,
                     stream_dtype=jnp.float32):
    npt = p // tile_p
    grid = (b, npt)
    kernel = functools.partial(_fused_iter_kernel, cov_scale=cov_scale)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bb, pt: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, s, tile_p), lambda bb, pt: (bb, 0, pt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_p), lambda bb, pt: (bb, 0, pt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_p), lambda bb, pt: (bb, 0, pt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_p), lambda bb, pt: (bb, 0, pt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), lambda bb, pt: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), lambda bb, pt: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), lambda bb, pt: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda bb, pt: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_p), lambda bb, pt: (bb, 0, pt), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, 1), lambda bb, pt: (bb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, s), lambda bb, pt: (bb, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, s, s), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * s * (s + 2),
            bytes_accessed=b * p * s * 4,
            transcendentals=0,
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iter",
        "alpha",
        "covariance_update_scaling",
        "tile_p",
        "interpret",
        "stream_dtype",
    ),
)
def acrwl1mf_fused(
    x: jax.Array,
    template: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    num_iter: int = 30,
    alpha: float = 0.0,
    covariance_update_scaling: float = 1.0,
    tile_p: int = DEFAULT_TILE_P,
    interpret: bool = False,
    stream_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas-fused albedo-corrected reweighted-L1 matched filter.

    Drop-in float32 replacement for ``starcop_tpu.ops.mag1c.acrwl1mf`` (same
    (B, P, S) batched-column-blocks contract, same returns). P is padded to a
    multiple of ``tile_p`` internally.

    ``stream_dtype=jnp.bfloat16`` halves the HBM traffic of the per-iteration
    streaming passes by storing the pre-centered cube in bf16 (centered values
    are O(1), so the 8-bit mantissa costs ~0.4% per element, averaged down in
    the 2048-deep f32 MXU accumulations). All math stays f32 in VMEM. Gate on
    the detection-fidelity tests before enabling for new sensors.
    """
    x = jnp.asarray(x, jnp.float32)
    template = jnp.asarray(template, jnp.float32)
    b, p0, s = x.shape

    unweighted = weights is None
    if unweighted:
        # All pixels valid: every masking multiply below is a full HBM
        # read+write of the cube — skip them all. Prefer a tile size that
        # divides P exactly (lane-aligned) so no padding (hence no mask) is
        # ever materialized; fall back to an explicit ones mask otherwise.
        tile_p = _dividing_tile(p0, tile_p)
        if tile_p is None:
            weights = jnp.ones((b, p0), jnp.float32)
            unweighted = False
            tile_p = DEFAULT_TILE_P

    if unweighted:
        w = None
        p = p0
        n = jnp.full((b, 1), float(p0), jnp.float32)
    else:
        w = jnp.asarray(weights, jnp.float32)
        p = -(-p0 // tile_p) * tile_p
        if p != p0:
            x = jnp.pad(x, ((0, 0), (0, p - p0), (0, 0)))
            w = jnp.pad(w, ((0, 0), (0, p - p0)))
        x = x * w[..., None]
        n = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)  # (B, 1)

    # Pre-center for single-pass moment stability, then transpose to the
    # kernel's (B, S, P) streaming layout (one HBM shuffle, amortized over
    # all iterations).
    m0 = _weighted_mean(x, w, n)[:, 0, :]  # (B, S) original-units mean
    xc_t = x - m0[:, None, :] if w is None else (x - m0[:, None, :]) * w[..., None]
    xc_t = jnp.swapaxes(xc_t, 1, 2)  # (B, S, P)
    xc_t = xc_t.astype(stream_dtype)

    # --- init: rmf re-expressed on the centered transposed cube ----------
    # Reference rmf semantics (mag1c.py:284-348): mean/cov of x, UNclamped
    # normalizer, albedo R = (x.mu)/(mu.mu), ReLU. Deriving it from xc_t
    # instead of x keeps the uncentered (B, P, S) cube single-consumer — the
    # callers' block reshape then fuses into the m0 reduction and the xc_t
    # shuffle and is never materialized — and reads the (possibly bf16)
    # streamed cube twice instead of re-reading the f32 cube.
    #   cov:  w is 0/1 and xc rows are zeroed at invalid pixels, so
    #         xc.xc^T == sum_valid (x-m0)(x-m0)^T exactly;
    #   R:    x.m0 = (x-m0).m0 + m0.m0, so R = q/(m0.m0) + 1 with q from xc —
    #         and invalid pixels (xc = 0) land on R = 1, mf0 = 0, matching the
    #         masking the separate-rmf path applied via jnp.where.
    c0 = (
        jnp.einsum("bsp,btp->bst", xc_t, xc_t, preferred_element_type=jnp.float32)
        / n[..., None]
    )
    c0 = _shrink_diag(c0, alpha)
    tgt0 = template[None, :] * m0  # (B, S)
    cit0_vec = _cho_solve_vec(c0, tgt0)  # (B, S)
    norm0 = jnp.einsum("bs,bs->b", tgt0, cit0_vec)  # (B,) unclamped (rmf init)
    # Both init matvecs in ONE streaming read: rows [cit0; m0] against xc_t.
    a2 = jnp.stack([cit0_vec, m0], axis=1)  # (B, 2, S)
    p2 = jnp.einsum("bks,bsp->bkp", a2, xc_t, preferred_element_type=jnp.float32)
    r = p2[:, 1, :] / jnp.einsum("bs,bs->b", m0, m0)[:, None] + 1.0  # (B, P)
    mf0 = jnp.maximum(p2[:, 0, :] / (r * norm0[:, None]), 0.0)

    if w is None:
        w = jnp.ones((b, p), jnp.float32)  # kernel row input only (tiny reads)

    target0 = (template[None, :] * m0)[:, :, None]  # (B, S, 1)
    mu_c0 = jnp.zeros((b, s, 1), jnp.float32)
    cit0 = jnp.zeros((b, s, 1), jnp.float32)
    norm0 = jnp.ones((b, 1, 1), jnp.float32)
    w_row = w[:, None, :]  # (B, 1, P)
    r_row = r[:, None, :]
    mf0_row = mf0[:, None, :]

    fused = _make_fused_iter(
        b, p, s, tile_p, covariance_update_scaling, interpret, stream_dtype=stream_dtype
    )

    def glue(carry, first):
        mf, mu_c, target, cit, norm = carry
        mf_new, s1, s2 = fused(first, xc_t, w_row, r_row, mf, mu_c, target, cit, norm)
        mu_c_new = s1 / n[..., None]  # (B, S, 1) centered mean of modx
        c = s2 / n[..., None] - mu_c_new * jnp.swapaxes(mu_c_new, 1, 2)
        c = _shrink_diag(c, alpha)
        target_new = template[None, :, None] * (mu_c_new + m0[:, :, None])
        cit_new = _cho_solve_vec(c, target_new[:, :, 0])[:, :, None]  # (B, S, 1)
        norm_new = jnp.maximum(
            jnp.einsum("bs,bs->b", target_new[:, :, 0], cit_new[:, :, 0])[:, None, None],
            1.0,
        )
        return (mf_new, mu_c_new, target_new, cit_new, norm_new)

    first_flag = jnp.ones((1, 1), jnp.int32)
    not_first = jnp.zeros((1, 1), jnp.int32)

    # Init call consumes the pass-through iteration (stats of modx(mf_0)).
    carry = glue((mf0_row, mu_c0, target0, cit0, norm0), first_flag)

    def body(_, carry):
        return glue(carry, not_first)

    carry = jax.lax.fori_loop(0, num_iter - 1, body, carry)
    mf, mu_c, target, cit, norm = carry

    # One final mf-only evaluation applies the last statistics (matches the
    # reference loop ordering: stats then mf, num_iter times).
    mf_final, _, _ = fused(not_first, xc_t, w_row, r_row, mf, mu_c, target, cit, norm)

    mf_out = (mf_final[:, 0, :] * w * SCALING)[:, :p0, None]
    r_out = jnp.where(w > 0, r, 1.0)[:, :p0, None]
    return mf_out, r_out
