"""Matched-filter kernel tests: golden parity vs the float64 numpy oracle,
weighted-masking equivalence, non-negativity/albedo properties, column-block
driver, and f32-vs-f64 fidelity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starcop_tpu.ops import mag1c as m


def test_rmf_matches_oracle_f64(synthetic_radiance):
    x, template = synthetic_radiance
    mf, r = m.rmf(jnp.asarray(x), jnp.asarray(template), apply_scaling=False)
    # Oracle: single-pass matched filter in numpy float64.
    b, p, s = x.shape
    mu = x.mean(axis=1, keepdims=True)
    target = template[None, None, :] * mu
    xm = x - mu
    c = np.einsum("bps,bpt->bst", xm, xm) / p
    cit = np.linalg.solve(c, target[:, 0, :, None])
    normalizer = np.einsum("bs,bso->bo", target[:, 0, :], cit)[:, None, :]
    r_np = np.einsum("bps,bs->bp", x, mu[:, 0, :])[..., None] / np.einsum(
        "bs,bs->b", mu[:, 0, :], mu[:, 0, :]
    )[:, None, None]
    mf_np = np.maximum(np.einsum("bps,bso->bpo", xm, cit) / (r_np * normalizer), 0)
    np.testing.assert_allclose(np.asarray(r), r_np, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(mf), mf_np, rtol=1e-8, atol=1e-12)


def test_acrwl1mf_matches_oracle_f64(synthetic_radiance):
    x, template = synthetic_radiance
    mf, r = m.acrwl1mf(jnp.asarray(x), jnp.asarray(template), num_iter=10, alpha=1e-4)
    mf_np, r_np = m.reference_oracle_acrwl1mf(x, template, num_iter=10, alpha=1e-4)
    np.testing.assert_allclose(np.asarray(r), r_np, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(mf), mf_np, rtol=1e-6, atol=1e-4)


def test_acrwl1mf_f32_fidelity(synthetic_radiance):
    """float32 (the TPU fast path) must track the float64 oracle closely."""
    x, template = synthetic_radiance
    mf32, _ = m.acrwl1mf(
        jnp.asarray(x, jnp.float32), jnp.asarray(template, jnp.float32),
        num_iter=10, alpha=1e-4,
    )
    mf64, _ = m.reference_oracle_acrwl1mf(x, template, num_iter=10, alpha=1e-4)
    mf32 = np.asarray(mf32, np.float64)
    # Correlation across pixels must be essentially 1; large detections must match.
    cc = np.corrcoef(mf32.ravel(), mf64.ravel())[0, 1]
    assert cc > 0.999, f"f32/f64 correlation too low: {cc}"
    big = mf64 > 500  # ppm x m — detection-relevant magnitudes
    if big.any():
        rel = np.abs(mf32[big] - mf64[big]) / mf64[big]
        assert np.median(rel) < 0.05, f"median rel err on detections: {np.median(rel)}"


def test_weighted_masking_equivalence(synthetic_radiance):
    """Padding pixels with weight 0 must reproduce the unpadded result."""
    x, template = synthetic_radiance
    b, p, s = x.shape
    pad = 37
    xp = np.concatenate([x, np.zeros((b, pad, s))], axis=1)
    w = np.concatenate([np.ones((b, p)), np.zeros((b, pad))], axis=1)
    mf_ref, r_ref = m.acrwl1mf(jnp.asarray(x), jnp.asarray(template), num_iter=5)
    mf_pad, r_pad = m.acrwl1mf(
        jnp.asarray(xp), jnp.asarray(template), jnp.asarray(w), num_iter=5
    )
    np.testing.assert_allclose(
        np.asarray(mf_pad)[:, :p], np.asarray(mf_ref), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(r_pad)[:, :p], np.asarray(r_ref), rtol=1e-8
    )


def test_nonnegativity_and_scaling(synthetic_radiance):
    x, template = synthetic_radiance
    mf, _ = m.acrwl1mf(jnp.asarray(x), jnp.asarray(template), num_iter=3)
    assert np.all(np.asarray(mf) >= 0)
    mf_z, _ = m.rmf(jnp.asarray(x), jnp.asarray(template), zero_override=True)
    assert np.any(np.asarray(mf_z) < 0)  # without ReLU, negatives exist


def test_albedo_override(synthetic_radiance):
    x, template = synthetic_radiance
    _, r = m.rmf(jnp.asarray(x), jnp.asarray(template), albedo_override=True)
    np.testing.assert_array_equal(np.asarray(r), 1.0)


def test_albedo_scaling_invariance(synthetic_radiance):
    """Scaling a pixel's radiance scales its albedo factor R linearly."""
    x, template = synthetic_radiance
    x2 = x.copy()
    x2[:, 0, :] *= 2.0
    _, r1 = m.rmf(jnp.asarray(x), jnp.asarray(template))
    _, r2 = m.rmf(jnp.asarray(x2), jnp.asarray(template))
    # R = x . mu / mu . mu: doubling pixel-0 radiance roughly doubles its R
    # (mu shifts slightly since pixel 0 contributes to it).
    ratio = np.asarray(r2)[0, 0, 0] / np.asarray(r1)[0, 0, 0]
    assert 1.9 < ratio < 2.1


def test_column_blocks_scene(synthetic_radiance):
    x, template = synthetic_radiance
    b, p, s = x.shape
    h, w = 8, 64
    scene = x[0, : h * w].reshape(h, w, s)
    valid = np.ones((h, w), bool)
    valid[:3, :5] = False
    mf, albedo = m.mag1c_column_blocks(
        scene, template, valid, column_step=16, num_iter=3, compute_dtype=jnp.float64
    )
    mf = np.asarray(mf)
    assert mf.shape == (h, w)
    assert np.all(mf[:3, :5] == m.NODATA)
    # Parity with a direct per-block run for the first block.
    blk = scene[:, :16, :].reshape(1, -1, s)
    wblk = valid[:, :16].reshape(1, -1).astype(np.float64)
    mf_blk, _ = m.acrwl1mf(
        jnp.asarray(blk) * wblk[..., None], jnp.asarray(template), jnp.asarray(wblk),
        num_iter=3, alpha=1e-4,
    )
    got = mf[:, :16].reshape(-1)
    want = np.asarray(mf_blk)[0, :, 0]
    mask = wblk[0] > 0
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-8)


def test_column_blocks_width_not_divisible(synthetic_radiance):
    x, template = synthetic_radiance
    s = x.shape[-1]
    h, w = 10, 23  # 23 % 4 != 0 -> exercises padding
    scene = np.abs(x[0, : h * w]).reshape(h, w, s) + 0.5
    mf, _ = m.mag1c_column_blocks(scene, template, None, column_step=4, num_iter=2)
    assert np.asarray(mf).shape == (h, w)
    assert np.all(np.isfinite(np.asarray(mf)))


def test_fused_pallas_matches_xla_f32(synthetic_radiance):
    """Pallas-fused kernel (interpret mode) vs the XLA kernel at f32, and vs
    the float64 oracle for detection fidelity."""
    from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

    x64, template = synthetic_radiance
    x = x64.astype(np.float32)
    b, p, s = x.shape
    w = np.ones((b, p), np.float32)
    w[:, -23:] = 0
    x[:, -23:] = 0

    mf_x, r_x = m.acrwl1mf(
        jnp.asarray(x), jnp.asarray(template, jnp.float32), jnp.asarray(w),
        num_iter=8, alpha=1e-4,
    )
    mf_f, r_f = acrwl1mf_fused(
        jnp.asarray(x), jnp.asarray(template, jnp.float32), jnp.asarray(w),
        num_iter=8, alpha=1e-4, tile_p=256, interpret=True,
    )
    valid = w.astype(bool)
    a = np.asarray(mf_x, np.float64)[..., 0][valid]
    bb = np.asarray(mf_f, np.float64)[..., 0][valid]
    assert np.corrcoef(a, bb)[0, 1] > 0.9999
    np.testing.assert_allclose(
        np.asarray(r_f)[..., 0][valid], np.asarray(r_x)[..., 0][valid], rtol=1e-4
    )
    # Detection fidelity vs the f64 oracle at the 500 ppm m threshold.
    mf_o, _ = m.reference_oracle_acrwl1mf(x64, template, num_iter=8, alpha=1e-4)
    o = mf_o[..., 0][valid]
    assert ((bb > 500) == (o > 500)).mean() > 0.999


def test_fused_pallas_no_weights(synthetic_radiance):
    """XLA vs Pallas f32 agreement, bounded by conditioning.

    At the production shrinkage (alpha=1e-4) the covariance condition number
    is capped (~1e4) and the two independent f32 paths agree to corr
    ~0.99999+. At alpha=0 the unshrunk covariance of this fixture is
    near-singular, so the mutual agreement of ANY two f32 summation orders
    is only eps_f32 * cond — each path individually correlates ~0.9996 with
    the f64 oracle (measured), so demanding tighter mutual agreement than
    that is noise-chasing; the bar there is 0.999."""
    from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

    x64, template = synthetic_radiance
    x = jnp.asarray(x64.astype(np.float32))
    tpl = jnp.asarray(template, jnp.float32)
    for alpha, bar in ((1e-4, 0.9999), (0.0, 0.999)):
        mf_x, _ = m.acrwl1mf(x, tpl, num_iter=4, alpha=alpha)
        mf_f, _ = acrwl1mf_fused(
            x, tpl, num_iter=4, tile_p=256, interpret=True, alpha=alpha
        )
        a = np.asarray(mf_x)[..., 0].ravel()
        bb = np.asarray(mf_f)[..., 0].ravel()
        cc = np.corrcoef(a, bb)[0, 1]
        assert cc > bar, (alpha, cc)


def assert_bf16_detection_equivalent(a, b, thr=500.0):
    """bf16-stream acceptance criterion vs the f32 result ``a``.

    The L1-reweighted filter's regularizer 1/(mf + eps) amplifies rounding on
    weak-signal background pixels, so a handful of pixels whose f32 value
    lands within ~2x of the detection threshold can flip either way under a
    half-precision stream (init-numerics dust moves WHICH ones flip run to
    run). The meaningful contract is therefore: perfect mask agreement for
    every decisively-classified pixel (outside the [thr/2, 2*thr] band),
    >=99.5% agreement overall, and small relative error on true detections.
    """
    mask_a, mask_b = a > thr, b > thr
    decisive = (a < thr / 2.0) | (a > 2.0 * thr)
    np.testing.assert_array_equal(mask_a[decisive], mask_b[decisive])
    assert (mask_a == mask_b).mean() > 0.995
    big = a > 2 * thr
    if big.any():
        rel = np.abs(b[big] - a[big]) / a[big]
        assert np.median(rel) < 0.02


def test_fused_pallas_bf16_streaming(synthetic_radiance):
    """bf16 streaming variant: detection-equivalent to the f32 fused path."""
    from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

    x64, template = synthetic_radiance
    x = jnp.asarray(x64.astype(np.float32))
    tpl = jnp.asarray(template, jnp.float32)
    mf_f32, _ = acrwl1mf_fused(x, tpl, num_iter=6, alpha=1e-4, tile_p=256, interpret=True)
    mf_bf16, _ = acrwl1mf_fused(
        x, tpl, num_iter=6, alpha=1e-4, tile_p=256, interpret=True,
        stream_dtype=jnp.bfloat16,
    )
    a = np.asarray(mf_f32)[..., 0].ravel()
    b = np.asarray(mf_bf16)[..., 0].ravel()
    assert_bf16_detection_equivalent(a, b)


def test_fused_pallas_none_weights_matches_ones(synthetic_radiance):
    """The unweighted fast path (weights=None: no mask materialization, no
    zeroing multiplies, dividing tile) must match the explicit all-ones-mask
    path to float32 tolerance."""
    from starcop_tpu.ops.mag1c_pallas import _dividing_tile, acrwl1mf_fused

    x64, template = synthetic_radiance
    x = jnp.asarray(x64.astype(np.float32))
    tpl = jnp.asarray(template, jnp.float32)
    ones = jnp.ones(x.shape[:2], jnp.float32)
    mf_none, r_none = acrwl1mf_fused(x, tpl, None, num_iter=4, alpha=1e-4,
                                     tile_p=256, interpret=True)
    mf_ones, r_ones = acrwl1mf_fused(x, tpl, ones, num_iter=4, alpha=1e-4,
                                     tile_p=256, interpret=True)
    # The paths sum in different orders (jnp.mean vs einsum-with-ones); the
    # L1-reweighting regularizer 1/(mf+eps) amplifies f32 rounding on
    # near-zero pixels, so compare at detection level: near-perfect
    # correlation, identical >500 ppm x m detection masks, exact albedo.
    a = np.asarray(mf_none)[..., 0].ravel()
    bb = np.asarray(mf_ones)[..., 0].ravel()
    assert np.corrcoef(a, bb)[0, 1] > 0.9999
    np.testing.assert_array_equal(a > 500, bb > 500)
    np.testing.assert_allclose(np.asarray(r_none), np.asarray(r_ones), rtol=1e-5)

    # tile picking: exact lane-aligned divisors, fallback None
    assert _dividing_tile(512, 256) == 256
    assert _dividing_tile(69120, 8192) == 7680  # 1280 x 54 EMIT-bench blocks
    assert _dividing_tile(69120, 8192) * 9 == 69120
    assert _dividing_tile(1280 * 54, 128) == 128
    assert _dividing_tile(130, 8192) is None  # not lane-divisible -> fallback


def test_fused_pallas_bsp_layout_matches_bps(synthetic_radiance):
    """x_layout='bsp' (pre-transposed raw cube, in-kernel centering via the
    kernel's m0 offset — the serving fast path) must match the (B, P, S)
    layout, which pre-centers on HBM. Also pins the bf16 variant (which
    pre-centers even under bsp) and the layout's argument contract."""
    import pytest

    from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

    x64, template = synthetic_radiance
    x = jnp.asarray(x64.astype(np.float32))
    tpl = jnp.asarray(template, jnp.float32)
    xt = jnp.swapaxes(x, 1, 2)  # (B, S, P)
    kw = dict(num_iter=4, alpha=1e-4, tile_p=256, interpret=True)
    mf_a, r_a = acrwl1mf_fused(x, tpl, None, **kw)
    mf_b, r_b = acrwl1mf_fused(xt, tpl, None, x_layout="bsp", **kw)
    a = np.asarray(mf_a)[..., 0].ravel()
    bb = np.asarray(mf_b)[..., 0].ravel()
    # Raw-streamed + VMEM-centered vs HBM-pre-centered: identical math, sums
    # taken in different orders; compare like the other layout-variant tests.
    assert np.corrcoef(a, bb)[0, 1] > 0.9999
    np.testing.assert_array_equal(a > 500, bb > 500)
    np.testing.assert_allclose(np.asarray(r_b), np.asarray(r_a), rtol=1e-5)

    mf_c, _ = acrwl1mf_fused(
        xt, tpl, None, x_layout="bsp", stream_dtype=jnp.bfloat16, **kw
    )
    cc = np.asarray(mf_c)[..., 0].ravel()
    assert_bf16_detection_equivalent(a, cc)

    with pytest.raises(ValueError, match="weights=None"):
        acrwl1mf_fused(xt, tpl, jnp.ones(xt.shape[::2], jnp.float32),
                       x_layout="bsp", **kw)
    with pytest.raises(ValueError, match="divisor"):
        acrwl1mf_fused(xt[:, :, :130], tpl, None, x_layout="bsp", **kw)


def test_column_blocks_pallas_fast_path_matches_xla():
    """The integrated TPU serving fast path of mag1c_column_blocks
    (blocked_transpose -> x_layout='bsp' -> unblock, no mask scatter) vs the
    plain XLA path, driven end to end via use_pallas=True + interpret=True.
    Pins the composition (layouts, unblock ordering), not just the pieces."""
    rng = np.random.default_rng(5)
    h, w, s = 64, 36, 12  # step 18 -> p0 = 64*18 = 1152 = 9*128 (lane-aligned)
    template = -np.abs(np.sin(np.linspace(0.3, 3 * np.pi, s)))
    base = rng.uniform(2.0, 6.0, size=(1, 1, s))
    x = rng.uniform(0.5, 2.0, (h, w, 1)) * base * (1 + 0.02 * rng.normal(size=(h, w, s)))
    conc = np.zeros((h, w))
    conc[10:20, 4:12] = rng.uniform(1000, 6000, size=(10, 8))  # injected plume
    x = x * np.exp(conc[..., None] * template[None, None, :] / 1e5)
    xd = jnp.asarray(x, jnp.float32)
    tpl = jnp.asarray(template, jnp.float32)
    kw = dict(column_step=18, num_iter=4, alpha=1e-4)
    mf_p, alb_p = m.mag1c_column_blocks(xd, tpl, None, use_pallas=True,
                                        interpret=True, **kw)
    mf_x, alb_x = m.mag1c_column_blocks(xd, tpl, None, use_pallas=False, **kw)
    a = np.asarray(mf_x).ravel()
    bb = np.asarray(mf_p).ravel()
    assert mf_p.shape == (h, w)
    assert np.corrcoef(a, bb)[0, 1] > 0.9999
    assert ((a > 500) == (bb > 500)).mean() > 0.999  # f32 paths; near-threshold px may flip
    np.testing.assert_allclose(np.asarray(alb_p), np.asarray(alb_x), rtol=1e-4)


def test_resident_swh_direct_matches_xla():
    """The direct-swh serving path (whole filter straight off the (S, W, H)
    native-layout cube — no blocked-transpose shuffle ever runs, see
    acrwl1mf_resident_swh) must agree with the transpose + bsp resident
    route on identical blocks, and the integrated mag1c_column_blocks
    composition (which prefers it when H % 128 == 0) must still match the
    plain XLA path end to end."""
    from starcop_tpu.ops.mag1c_pallas import (
        acrwl1mf_fused,
        acrwl1mf_resident_swh,
        blocked_transpose_swh,
    )

    rng = np.random.default_rng(11)
    h, w, s = 128, 48, 12
    nb, step = 3, 16
    template = -np.abs(np.sin(np.linspace(0.3, 3 * np.pi, s)))
    base = rng.uniform(2.0, 6.0, size=(1, 1, s))
    x = rng.uniform(0.5, 2.0, (h, w, 1)) * base * (
        1 + 0.02 * rng.normal(size=(h, w, s))
    )
    conc = np.zeros((h, w))
    conc[40:80, 10:30] = rng.uniform(1000, 6000, size=(40, 20))
    x = x * np.exp(conc[..., None] * template[None, None, :] / 1e5)
    xd = jnp.asarray(x, jnp.float32)
    tpl = jnp.asarray(template, jnp.float32)

    # Unit: direct-swh vs the transpose + bsp resident route — the same
    # math on the same j-major blocks; only the cube's route into VMEM
    # differs (slab DMA + in-VMEM assembly vs a blocked HBM copy).
    swh = jnp.transpose(xd, (2, 1, 0))
    out = acrwl1mf_resident_swh(
        swh, tpl, nb, step, num_iter=4, alpha=1e-4, interpret=True
    )
    assert out is not None
    sp = -(-s // 8) * 8
    xt = blocked_transpose_swh(swh, nb, step, pad_s=sp, interpret=True)
    mf_bsp, alb_bsp = acrwl1mf_fused(
        xt, tpl, None, num_iter=4, alpha=1e-4,
        x_layout="bsp", glue="resident", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(mf_bsp), rtol=1e-4, atol=1e-2
    )
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(alb_bsp), rtol=1e-5)

    # Geometry guard: H not a multiple of 128 falls back (returns None).
    assert (
        acrwl1mf_resident_swh(swh[:, :, :120], tpl, nb, step, interpret=True)
        is None
    )

    # Integrated: mag1c_column_blocks prefers the direct path here and must
    # still match plain XLA.
    kw = dict(column_step=step, num_iter=4, alpha=1e-4)
    mf_p, alb_p = m.mag1c_column_blocks(
        xd, tpl, None, use_pallas=True, interpret=True, **kw
    )
    mf_x, alb_x = m.mag1c_column_blocks(xd, tpl, None, use_pallas=False, **kw)
    assert mf_p.shape == (h, w)
    a = np.asarray(mf_x).ravel()
    bb = np.asarray(mf_p).ravel()
    assert np.corrcoef(a, bb)[0, 1] > 0.9999
    assert ((a > 500) == (bb > 500)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(alb_p), np.asarray(alb_x), rtol=1e-4)


def test_blocked_transpose_matches_xla():
    """Pallas scene->streaming-layout shuffle == the XLA reshape/transpose
    expression, across tile-selection regimes (tile < H, tile == H, and the
    lane-alignment fallback)."""
    from starcop_tpu.ops.mag1c_pallas import blocked_transpose

    rng = np.random.default_rng(0)
    for h, nb, step, s in ((64, 3, 18, 7), (128, 2, 54, 50), (96, 4, 16, 24)):
        x = rng.normal(size=(h, nb * step, s)).astype(np.float32)
        want = x.reshape(h, nb, step, s).transpose(1, 3, 0, 2).reshape(nb, s, h * step)
        got = blocked_transpose(jnp.asarray(x), nb, step, interpret=True)
        assert got is not None
        np.testing.assert_array_equal(np.asarray(got), want)

    import pytest

    with pytest.raises(ValueError, match="width"):
        blocked_transpose(jnp.zeros((8, 10, 4), jnp.float32), 3, 4, interpret=True)


def test_fused_pallas_woodbury_glue_matches_cholesky(synthetic_radiance):
    """The default Woodbury glue (rank-2 covariance update solved against the
    once-inverted base + one Neumann term for the shrinkage-diagonal drift)
    must match per-iteration Cholesky refactorization to f32 round-off, on
    both the unweighted and the masked path."""
    from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

    x64, template = synthetic_radiance
    x = jnp.asarray(x64.astype(np.float32))
    tpl = jnp.asarray(template, jnp.float32)
    wmask = np.ones(x.shape[:2], np.float32)
    wmask[:, -40:] = 0.0
    for weights in (None, jnp.asarray(wmask)):
        kw = dict(num_iter=6, alpha=1e-4, tile_p=256, interpret=True)
        mf_ch, r_ch = acrwl1mf_fused(x, tpl, weights, glue="cholesky", **kw)
        for glue in ("woodbury", "fused", "mono"):
            mf_wb, r_wb = acrwl1mf_fused(x, tpl, weights, glue=glue, **kw)
            a = np.asarray(mf_ch).ravel()
            bb = np.asarray(mf_wb).ravel()
            assert np.corrcoef(a, bb)[0, 1] > 0.99999
            assert ((a > 500) == (bb > 500)).mean() > 0.999
            det = a > 100
            if det.any():
                rel = np.abs(bb - a)[det] / a[det]
                assert np.median(rel) < 1e-3
            np.testing.assert_allclose(np.asarray(r_wb), np.asarray(r_ch), rtol=1e-6)


def test_column_blocks_no_mask_matches_masked(synthetic_radiance):
    """mag1c_column_blocks with valid_mask=None (fast path: no mask built)
    equals the same call with an explicit all-true mask."""
    rng = np.random.default_rng(3)
    h, w, s = 32, 48, 20
    template = -np.abs(np.sin(np.linspace(0, 3 * np.pi, s))) * 1e-5
    base = rng.uniform(2.0, 6.0, size=(1, 1, s))
    x = rng.uniform(0.5, 2.0, (h, w, 1)) * base + rng.normal(0, 0.02, (h, w, s))
    xd = jnp.asarray(x, jnp.float32)
    tpl = jnp.asarray(template, jnp.float32)
    mf_none, alb_none = m.mag1c_column_blocks(xd, tpl, None, column_step=16, num_iter=3)
    mf_ones, alb_ones = m.mag1c_column_blocks(
        xd, tpl, jnp.ones((h, w), bool), column_step=16, num_iter=3
    )
    np.testing.assert_allclose(np.asarray(mf_none), np.asarray(mf_ones), rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(alb_none), np.asarray(alb_ones), rtol=1e-5)


def test_compute_energy_matches_literal_oracle(synthetic_radiance):
    """The O(P) energy identity (s^T C^{-1} s) must reproduce the oracle's
    LITERAL (B, P, P) Mahalanobis-product sum, per iteration, and the rmf
    init energy must carry the reference's batch-wide log-det term."""
    x, template = synthetic_radiance
    mf, r, energy = m.acrwl1mf(
        jnp.asarray(x), jnp.asarray(template), num_iter=5, alpha=1e-4,
        compute_energy=True,
    )
    mf_np, r_np, energy_np = m.reference_oracle_acrwl1mf(
        x, template, num_iter=5, alpha=1e-4, compute_energy=True
    )
    assert energy.shape == (6,)
    np.testing.assert_allclose(np.asarray(mf), mf_np, rtol=1e-6, atol=1e-4)
    # Element 0 (rmf init) mixes a residual that is ~0 by centering with the
    # det term; compare with an absolute tolerance scaled to the det term.
    np.testing.assert_allclose(
        np.asarray(energy[0]), energy_np[0], rtol=1e-6, atol=1e-4 * abs(energy_np[0])
    )
    np.testing.assert_allclose(np.asarray(energy[1:]), energy_np[1:], rtol=1e-6)


def test_rmf_compute_energy_returns_triple(synthetic_radiance):
    x, template = synthetic_radiance
    out = m.rmf(jnp.asarray(x), jnp.asarray(template), compute_energy=True)
    assert len(out) == 3
    mf, r, energy = out
    assert energy.shape == ()
    assert np.isfinite(float(energy))
    # Scaling must NOT be applied before the energy return (reference
    # mag1c.py:337-343 returns ahead of the apply_scaling branch).
    mf_plain, _ = m.rmf(jnp.asarray(x), jnp.asarray(template), apply_scaling=False)
    np.testing.assert_allclose(np.asarray(mf), np.asarray(mf_plain), rtol=1e-12)


def test_mono_bf16_and_bsp_variants(synthetic_radiance):
    """glue='mono' across its serving configurations: raw-bsp f32 (in-kernel
    centering), pre-centered bf16 stream, and the (B, P, S) layout — all
    detection-equivalent to the f32 cholesky-glue reference."""
    from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

    x64, template = synthetic_radiance
    x = jnp.asarray(x64.astype(np.float32))
    xt = jnp.swapaxes(x, 1, 2)
    tpl = jnp.asarray(template, jnp.float32)
    kw = dict(num_iter=5, alpha=1e-4, tile_p=256, interpret=True)
    mf_ref, r_ref = acrwl1mf_fused(x, tpl, None, glue="cholesky", **kw)
    a = np.asarray(mf_ref)[..., 0].ravel()

    for label, args in (
        ("bsp_raw_f32", dict(x_layout="bsp")),
        ("bsp_bf16", dict(x_layout="bsp", stream_dtype=jnp.bfloat16)),
        ("bps_bf16", dict(stream_dtype=jnp.bfloat16)),
    ):
        xx = xt if args.get("x_layout") == "bsp" else x
        mf, r = acrwl1mf_fused(xx, tpl, None, glue="mono", **args, **kw)
        bb = np.asarray(mf)[..., 0].ravel()
        try:
            assert_bf16_detection_equivalent(a, bb)
        except AssertionError as e:
            raise AssertionError(label) from e
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=5e-3)


def test_resident_glue_variants(synthetic_radiance):
    """glue='resident' (whole column block VMEM-resident across ALL
    iterations — the TPU serving fast path) across its configurations:
    raw-bsp f32 (in-kernel centering), pre-padded-bands bsp input (the
    blocked_transpose pad_s handoff), bf16 storage, and the (B, P, S)
    layout — all detection-equivalent to the f32 cholesky-glue reference."""
    from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

    x64, template = synthetic_radiance
    x = jnp.asarray(x64.astype(np.float32))
    xt = jnp.swapaxes(x, 1, 2)
    s = x.shape[-1]
    sp = -(-s // 8) * 8
    xt_pad = jnp.pad(xt, ((0, 0), (0, sp - s), (0, 0)))
    tpl = jnp.asarray(template, jnp.float32)
    kw = dict(num_iter=5, alpha=1e-4, interpret=True)
    mf_ref, r_ref = acrwl1mf_fused(x, tpl, None, glue="cholesky", tile_p=256, **kw)
    a = np.asarray(mf_ref)[..., 0].ravel()

    for label, xx, args in (
        ("bsp_raw_f32", xt, dict(x_layout="bsp")),
        ("bsp_prepadded", xt_pad, dict(x_layout="bsp")),
        ("bsp_bf16", xt, dict(x_layout="bsp", stream_dtype=jnp.bfloat16)),
        ("bps_f32", x, dict()),
    ):
        mf, r = acrwl1mf_fused(xx, tpl, None, glue="resident", **args, **kw)
        bb = np.asarray(mf)[..., 0].ravel()
        try:
            assert_bf16_detection_equivalent(a, bb)
        except AssertionError as e:
            raise AssertionError(label) from e
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=5e-3)

    # The two f32 bsp variants are the SAME math modulo the zero band rows:
    # pre-padded input must be bit-compatible with the in-path padding.
    mf_u, _ = acrwl1mf_fused(xt, tpl, None, glue="resident", x_layout="bsp", **kw)
    mf_p, _ = acrwl1mf_fused(xt_pad, tpl, None, glue="resident", x_layout="bsp", **kw)
    np.testing.assert_allclose(np.asarray(mf_u), np.asarray(mf_p), rtol=1e-6)


def test_blocked_transpose_pad_s(synthetic_radiance):
    """blocked_transpose(pad_s=...) emits the band dim zero-padded (born
    sublane-aligned: the serving path never pays an XLA pad pass)."""
    from starcop_tpu.ops.mag1c_pallas import blocked_transpose

    rng = np.random.default_rng(3)
    h, nb, step, s = 64, 4, 16, 50
    scene = jnp.asarray(rng.normal(size=(h, nb * step, s)).astype(np.float32))
    sp = -(-s // 8) * 8
    out = blocked_transpose(scene, nb, step, pad_s=sp, interpret=True)
    assert out is not None and out.shape == (nb, sp, h * step)
    ref = np.transpose(
        np.asarray(scene).reshape(h, nb, step, s), (1, 3, 0, 2)
    ).reshape(nb, s, h * step)
    np.testing.assert_array_equal(np.asarray(out)[:, :s], ref)
    np.testing.assert_array_equal(np.asarray(out)[:, s:], 0.0)


def test_blocked_transpose_shw_matches_hws():
    """Band-major (S, H, W) shuffle == the hws kernel/XLA expression, with
    and without band padding (the serving-native layout: lanes carry W, so
    the cube parameter avoids the 50->128 lane inflation the hws layout
    pays — see blocked_transpose_shw's rationale)."""
    from starcop_tpu.ops.mag1c_pallas import blocked_transpose_shw

    rng = np.random.default_rng(7)
    for h, nb, step, s, pad_s in (
        (64, 3, 18, 7, None),    # tile < H
        (64, 2, 54, 50, 56),     # serving geometry class, band-padded
        (96, 4, 16, 24, None),
    ):
        x = rng.normal(size=(h, nb * step, s)).astype(np.float32)
        xs = np.ascontiguousarray(x.transpose(2, 0, 1))
        want = x.reshape(h, nb, step, s).transpose(1, 3, 0, 2).reshape(nb, s, h * step)
        got = blocked_transpose_shw(jnp.asarray(xs), nb, step, pad_s=pad_s, interpret=True)
        assert got is not None
        got = np.asarray(got)
        np.testing.assert_array_equal(got[:, :s], want)
        if pad_s:
            assert got.shape[1] == pad_s
            np.testing.assert_array_equal(got[:, s:], 0.0)

    import pytest

    with pytest.raises(ValueError, match="width"):
        blocked_transpose_shw(jnp.zeros((4, 8, 10), jnp.float32), 3, 4, interpret=True)


def test_column_blocks_scene_layout_shw_parity():
    """mag1c_column_blocks(scene_layout='shw') == the hws path, on the
    Pallas serving fast path AND the generic (masked / width-padded / XLA)
    fallbacks — the band-major cube is a layout contract, not a different
    algorithm."""
    rng = np.random.default_rng(11)
    h, w, s = 64, 36, 12
    template = -np.abs(np.sin(np.linspace(0.3, 3 * np.pi, s)))
    base = rng.uniform(2.0, 6.0, size=(1, 1, s))
    x = rng.uniform(0.5, 2.0, (h, w, 1)) * base * (1 + 0.02 * rng.normal(size=(h, w, s)))
    conc = np.zeros((h, w))
    conc[10:20, 4:12] = rng.uniform(1000, 6000, size=(10, 8))
    x = x * np.exp(conc[..., None] * template[None, None, :] / 1e5)
    xd = jnp.asarray(x, jnp.float32)
    xs = jnp.asarray(np.ascontiguousarray(x.transpose(2, 0, 1)), jnp.float32)
    tpl = jnp.asarray(template, jnp.float32)

    # Serving fast path (no mask, lane-aligned step).
    kw = dict(column_step=18, num_iter=4, alpha=1e-4, use_pallas=True, interpret=True)
    mf_h, alb_h = m.mag1c_column_blocks(xd, tpl, None, **kw)
    mf_s, alb_s = m.mag1c_column_blocks(xs, tpl, None, scene_layout="shw", **kw)
    np.testing.assert_array_equal(np.asarray(mf_s), np.asarray(mf_h))
    np.testing.assert_array_equal(np.asarray(alb_s), np.asarray(alb_h))

    # Generic fallback: masked + width-padded (step 16 -> pad_w 12).
    mask = np.ones((h, w), bool)
    mask[:, -5:] = False
    kw2 = dict(column_step=16, num_iter=3, alpha=1e-4, use_pallas=False)
    mf_h2, _ = m.mag1c_column_blocks(xd, tpl, jnp.asarray(mask), **kw2)
    mf_s2, _ = m.mag1c_column_blocks(xs, tpl, jnp.asarray(mask), scene_layout="shw", **kw2)
    np.testing.assert_array_equal(np.asarray(mf_s2), np.asarray(mf_h2))

    import pytest

    with pytest.raises(ValueError, match="scene_layout"):
        m.mag1c_column_blocks(xs, tpl, None, scene_layout="spw")


def test_spd_inverse_newton(synthetic_radiance):
    """Newton-Schulz inverse on the matched filter's ACTUAL covariance class
    (diagonally-shrunk radiance covariance): forward error matches the f32
    Cholesky route, but the residual ||KC - I|| is orders-of-magnitude worse
    (not backward-stable) — the measured reason it is NOT used for the
    Woodbury glue's K0 (see the op's docstring)."""
    x64, _ = synthetic_radiance
    xm = x64 - x64.mean(axis=1, keepdims=True)
    c64 = np.einsum("bps,bpt->bst", xm, xm) / x64.shape[1]
    c64 = (1 - 1e-4) * c64 + 1e-4 * np.eye(c64.shape[-1]) * np.diagonal(
        c64, axis1=-2, axis2=-1
    )[:, None, :]
    truth = np.linalg.inv(c64)
    cond = np.linalg.cond(c64).max()

    c32 = jnp.asarray(c64.astype(np.float32))
    k_ns = np.asarray(m.spd_inverse_newton(c32), np.float64)
    with jax.default_matmul_precision("highest"):
        k_cho = np.asarray(m._cho_inverse(c32), np.float64)

    def rel(k):
        return np.abs(k - truth).max() / np.abs(truth).max()

    assert cond < 2**24, cond  # the regime the fixed iteration count covers
    # Forward (entrywise) accuracy: same error class as the Cholesky route.
    assert rel(k_ns) <= max(3.0 * rel(k_cho), 1e-5), (rel(k_ns), rel(k_cho))

    def resid(k):
        return np.abs(k @ c64 - np.eye(c64.shape[-1])).max()

    # Solver-operator quality: Cholesky's K is backward-stable (tiny
    # residual); Newton-Schulz stalls at the f32 rounding floor ~eps*cond.
    # If this GAP ever closes, the serving init should switch to the
    # MXU-native inverse — revisit mag1c_pallas's _cho_inverse call sites.
    assert resid(k_cho) < 0.05, resid(k_cho)
    # NS converged (not divergent), but its residual sits orders of
    # magnitude above Cholesky's — the documented gap is real. If the gap
    # ever closes, revisit the serving init's _cho_inverse call sites.
    assert resid(k_ns) < 1e-4 * cond, resid(k_ns)  # ~42 here: converged scale
    assert resid(k_ns) > 10.0 * resid(k_cho), (resid(k_ns), resid(k_cho))


def test_spd_inverse_recursive(synthetic_radiance):
    """The Schur-recursion inverse (static batched matmuls, no lax.linalg
    loops) is backward-stable-CLASS on the matched filter's covariance
    matrices: residual AND forward error within 2x of the Cholesky route,
    plus identity-embedding correctness for non-power-of-two sizes."""
    x64, _ = synthetic_radiance
    xm = x64 - x64.mean(axis=1, keepdims=True)
    c64 = np.einsum("bps,bpt->bst", xm, xm) / x64.shape[1]
    c64 = (1 - 1e-4) * c64 + 1e-4 * np.eye(c64.shape[-1]) * np.diagonal(
        c64, axis1=-2, axis2=-1
    )[:, None, :]
    truth = np.linalg.inv(c64)

    c32 = jnp.asarray(c64.astype(np.float32))
    k_rec = np.asarray(m.spd_inverse_recursive(c32), np.float64)
    with jax.default_matmul_precision("highest"):
        k_cho = np.asarray(m._cho_inverse(c32), np.float64)

    def rel(k):
        return np.abs(k - truth).max() / np.abs(truth).max()

    def resid(k):
        return np.abs(k @ c64 - np.eye(c64.shape[-1])).max()

    assert rel(k_rec) <= 2.0 * rel(k_cho), (rel(k_rec), rel(k_cho))
    assert resid(k_rec) <= 2.0 * resid(k_cho), (resid(k_rec), resid(k_cho))

    # Non-power-of-two sizes route through the identity embedding.
    rng = np.random.default_rng(7)
    for s in (1, 3, 13, 50):
        a = rng.normal(size=(2, s, 2 * s + 3))
        c = a @ np.swapaxes(a, -1, -2) + np.eye(s) * 0.05 * s
        k = np.asarray(m.spd_inverse_recursive(jnp.asarray(c.astype(np.float32))))
        np.testing.assert_allclose(k @ c, np.broadcast_to(np.eye(s), c.shape),
                                   atol=5e-5 * np.linalg.cond(c).max())


def test_swh_routes_decline_unaligned_width_interpret():
    """Interpret-mode slab-DMA routes must DECLINE (fall back) when W % 8 != 0.

    Without physical tile padding the floor8-clamped trailing slab windows
    can leave a block's columns outside the fetched slab and the in-kernel
    roll WRAPS — silently wrong trailing blocks (verified geometry: W=100,
    step=2 puts block 48 at columns 80-81 instead of 96-97). The wrappers
    must return None so mag1c_column_blocks composes the safe route, which
    must match plain XLA end to end."""
    from starcop_tpu.ops.mag1c_pallas import (
        acrwl1mf_resident_swh,
        blocked_transpose_swh,
    )

    rng = np.random.default_rng(13)
    h, w, s = 128, 100, 12  # W % 8 == 4, step % 8 == 2
    step = 2
    nb = w // step
    template = -np.abs(np.sin(np.linspace(0.3, 3 * np.pi, s)))
    base = rng.uniform(2.0, 6.0, size=(1, 1, s))
    x = rng.uniform(0.5, 2.0, (h, w, 1)) * base * (
        1 + 0.02 * rng.normal(size=(h, w, s))
    )
    xd = jnp.asarray(x, jnp.float32)
    tpl = jnp.asarray(template, jnp.float32)

    swh = jnp.transpose(xd, (2, 1, 0))
    assert acrwl1mf_resident_swh(
        swh, tpl, nb, step, num_iter=2, alpha=1e-4, interpret=True
    ) is None
    assert blocked_transpose_swh(swh, nb, step, interpret=True) is None

    # End to end: the pallas composition on the declining geometry still
    # matches the XLA path (it must route through a safe shuffle).
    mf_p, alb_p = m.mag1c_column_blocks(
        xd, tpl, None, column_step=step, num_iter=2, alpha=1e-4,
        use_pallas=True, interpret=True,
    )
    mf_x, alb_x = m.mag1c_column_blocks(
        xd, tpl, None, column_step=step, num_iter=2, alpha=1e-4,
        use_pallas=False,
    )
    # Same contract as test_resident_swh_direct_matches_xla's integrated
    # check: tiny per-block statistics amplify f32-vs-f64 reweighting noise,
    # so pin correlation + detections + albedo rather than strict allclose.
    a = np.asarray(mf_x).ravel()
    bb = np.asarray(mf_p).ravel()
    assert np.corrcoef(a, bb)[0, 1] > 0.999
    assert ((a > 500) == (bb > 500)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(alb_p), np.asarray(alb_x), rtol=1e-4)


def test_pallas_num_iter_zero_contract(synthetic_radiance):
    """num_iter=0 (the rmf init result) is an XLA-path contract: every
    Pallas variant applies one final mf evaluation after its loop, so it
    must refuse num_iter=0 loudly instead of silently returning one
    reweighting iteration. The column-block driver routes num_iter=0 to
    the XLA path.

    Fusion-robustness tolerance (conditioning-derived): the driver jit-wraps
    the same ``acrwl1mf`` call, so XLA fuses it with the surrounding
    reshape/transpose and sums statistics in a different order. The stats
    path is pre-centered (see _rmf_core), so the residual divergence is the
    f32 associativity noise of the CENTERED covariance amplified by the
    Cholesky solve: eps_f32 (~1.2e-7) x sqrt(P) x cond(C | alpha=1e-4
    shrinkage, ~1e4) ~ 1e-3 relative on the filter weights, i.e. O(1)
    absolute on mf values of O(1e3). Hence rtol=1e-4 with atol=2.0 (measured
    max abs divergence 1.9 on this fixture), plus exact detection-mask
    agreement at the 500 ppm x m threshold. Pre-fix (uncentered stats) the
    same comparison diverged ~5% with ReLU sign flips."""
    from starcop_tpu.ops.mag1c_pallas import acrwl1mf_fused

    x, template = synthetic_radiance
    x32 = jnp.asarray(x, jnp.float32)
    t32 = jnp.asarray(template, jnp.float32)
    with pytest.raises(ValueError, match="num_iter must be >= 1"):
        acrwl1mf_fused(x32, t32, None, num_iter=0, interpret=True)

    # Driver: num_iter=0 falls back to XLA and equals acrwl1mf's result.
    b, p, s = x.shape
    h, w = p // 4, 4 * b  # restate the blocks as one (H, W, S) scene
    scene = (
        np.asarray(x32).reshape(b, h, 4, s).transpose(1, 0, 2, 3).reshape(h, w, s)
    )
    mf_blk, _ = m.acrwl1mf(x32, t32, num_iter=0, alpha=1e-4)
    mf_scene, _ = m.mag1c_column_blocks(
        jnp.asarray(scene), t32, column_step=4, num_iter=0, alpha=1e-4
    )
    expect = (
        np.asarray(mf_blk)[..., 0].reshape(b, h, 4).transpose(1, 0, 2).reshape(h, w)
    )
    got = np.asarray(mf_scene)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=2.0)
    assert ((got > 500) == (expect > 500)).mean() >= 0.999
