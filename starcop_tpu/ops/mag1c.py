"""Albedo-corrected reweighted-L1 matched filter (mag1c) — TPU-native.

Re-design of the reference matched filter (reference math:
/root/reference/starcop/models/mag1c.py:176-348, itself derived from
markusfoote/mag1c) for JAX/XLA on TPU:

  * **Batched, uniform shapes.** The reference processes ragged per-CCD-column
    pixel groups one at a time on a single torch device. Here every group is
    padded to a uniform pixel count and a 0/1 ``weights`` vector marks valid
    pixels; all statistics (mean, covariance, albedo) are weight-masked. The
    whole batch of column groups then runs as ONE compiled program — batched
    matmuls land on the MXU, elementwise work fuses into them, and the batch
    axis is the natural ``shard_map`` axis across a device mesh (column groups
    are statistically independent; no collectives needed).
  * **Static shapes, compiler-friendly control flow.** The 30 reweighting
    iterations are a ``lax.fori_loop`` with a fixed carry; nothing is
    data-dependent, so XLA traces and tiles once.
  * **Precision.** The reference runs float64 on CPU. TPU f64 is emulated, so
    the default here is float32 with mean-pre-centering: radiance is centered
    by its (weighted) per-group mean once up front, which keeps covariance
    accumulation well-conditioned in f32. ``compute_dtype`` can be set to
    float64 (requires ``jax.config.update('jax_enable_x64', True)``) for
    bit-accurate parity runs on CPU.

Semantics parity notes (validated by tests/test_mag1c.py against a float64
numpy oracle):
  * covariance normalizer is the number of *valid* pixels (the reference's
    production paths pass only valid pixels, so N == number of valid pixels);
  * covariance shrinkage ``C <- (1-alpha) C + alpha diag(C)``;
  * albedo factor ``R = (x . mu) / (mu . mu)`` computed once and reused across
    iterations; ``normalizer`` clamped to >= 1 inside the iteration loop only;
  * sparsity regularizer ``1 / (R (mf + EPSILON))``;
  * non-negativity ReLU each iteration; final scaling by 1e5.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NODATA = -9999.0
SCALING = 1e5
EPSILON = 1e-9


def _weighted_stats_dtype(x, weights):
    """(w, n) for masked statistics; w is None when all pixels are valid, so
    downstream code skips every full-array masking multiply (each one is a
    complete HBM read+write of the cube)."""
    if weights is None:
        return None, jnp.full((x.shape[0], 1), float(x.shape[1]), dtype=x.dtype)
    w = weights.astype(x.dtype)
    n = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)  # (B, 1)
    return w, n


def _weighted_mean(x: jax.Array, w, n: jax.Array) -> jax.Array:
    """Weighted mean over the pixel axis. x: (B,P,S), w: (B,P) or None (all
    pixels valid — skips the masking pass), n: (B,1) -> (B,1,S)."""
    if w is None:
        return jnp.mean(x, axis=1, keepdims=True)
    return jnp.einsum("bp,bps->bs", w, x)[:, None, :] / n[..., None]


def _weighted_cov(xm: jax.Array, w, n: jax.Array) -> jax.Array:
    """Weighted second moment of centered data: (B,P,S) -> (B,S,S).

    C = sum_p w_p xm_p xm_p^T / n. The matmul is the MXU hot op; weights fold
    into one operand so XLA fuses the masking into the contraction. ``w=None``
    skips the masking multiply entirely (all pixels valid).
    """
    xw = xm if w is None else xm * w[..., None]
    c = jnp.einsum("bps,bpt->bst", xw, xm, preferred_element_type=xm.dtype)
    return c / n[..., None]


def _shrink_diag(c: jax.Array, alpha: float) -> jax.Array:
    """C <- (1 - alpha) * C + alpha * diag(C)  (diagonal shrinkage)."""
    if alpha == 0.0:
        return c
    diag = jnp.zeros_like(c) + jnp.eye(c.shape[-1], dtype=c.dtype) * jnp.diagonal(
        c, axis1=-2, axis2=-1
    )[..., None, :].swapaxes(-1, -2)
    return c + alpha * (diag - c)


def _solve_from_factor(chol: jax.Array, b: jax.Array) -> jax.Array:
    """Solve C z = b given the Cholesky factor of C. chol: (B,S,S), b: (B,S)."""
    y = jax.lax.linalg.triangular_solve(
        chol, b[..., None], left_side=True, lower=True, transpose_a=False
    )
    z = jax.lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, transpose_a=True
    )
    return z[..., 0]


def _cho_solve_vec(c: jax.Array, b: jax.Array) -> jax.Array:
    """Solve C z = b for SPD C. c: (B,S,S), b: (B,S) -> (B,S)."""
    return _solve_from_factor(jnp.linalg.cholesky(c), b)


def _energy_residual(xm: jax.Array, w, chol: jax.Array) -> jax.Array:
    """The reference's per-iteration "energy" diagnostic, TPU-native.

    The reference materializes the full (B, P, P) product
    ``bmm(x - mu, cholesky_solve((x - mu)^T, chol))`` and sums every entry
    (/root/reference/starcop/models/mag1c.py:271-274,338). Algebraically
    ``sum_{ij} xm_i^T C^{-1} xm_j == s^T C^{-1} s`` with ``s = sum_p xm_p``,
    so the O(P^2) intermediate is never needed — one row-sum and one (S,S)
    triangular solve per batch entry. ``xm`` is the already-centered x - mu.

    Weighted deviation (documented): with a validity mask the reference still
    sums over ALL pixel rows, including invalid ones; here padding rows are
    excluded (s sums w * (x - mu)), which is the meaningful statistic for the
    padded-batch layout. Exact parity holds for the unmasked production path.
    """
    xm_sum = (
        jnp.sum(xm, axis=1) if w is None else jnp.einsum("bp,bps->bs", w, xm)
    )  # (B, S)
    cinv_s = _solve_from_factor(chol, xm_sum)
    return jnp.einsum("bs,bs->", xm_sum, cinv_s)


def _cho_inverse(c: jax.Array) -> jax.Array:
    """Explicit SPD inverse via Cholesky. c: (B,S,S) -> (B,S,S).

    Accuracy comparator only: the matched filter's Woodbury glue inverts its
    base covariance with ``spd_inverse_recursive`` (static batched matmuls —
    lax.linalg's factor+solves lower to ~S-step sequential loops on TPU), and
    tests pin that route's residual within 2x of this Cholesky one
    (tests/test_mag1c.py::test_spd_inverse_recursive).
    """
    s = c.shape[-1]
    chol = jnp.linalg.cholesky(c)
    eye = jnp.broadcast_to(jnp.eye(s, dtype=c.dtype), c.shape)
    y = jax.lax.linalg.triangular_solve(chol, eye, left_side=True, lower=True)
    return jax.lax.linalg.triangular_solve(
        chol, y, left_side=True, lower=True, transpose_a=True
    )


def _chol_inv_rec(a: jax.Array, hp) -> jax.Array:
    """Inverse Cholesky factor L^{-1} of SPD ``a`` (n a power of two) by
    Schur-complement recursion — batched matmuls + 2x2 closed forms only.

    L = [[L1, 0], [W, L2]] with W = A21 L1^{-T} and L2 L2^T = A22 - W W^T,
    so L^{-1} = [[L1^{-1}, 0], [-L2^{-1} W L1^{-1}, L2^{-1}]]. This is exact
    block-Cholesky algebra (same backward-stability class as the unblocked
    factorization), with every step a batched (n/2)^2 matmul.
    """
    n = a.shape[-1]
    if n == 1:
        return 1.0 / jnp.sqrt(a)
    if n == 2:
        l11 = jnp.sqrt(a[..., 0:1, 0:1])
        l21 = a[..., 1:2, 0:1] / l11
        l22 = jnp.sqrt(a[..., 1:2, 1:2] - l21 * l21)
        zero = jnp.zeros_like(l11)
        top = jnp.concatenate([1.0 / l11, zero], axis=-1)
        bot = jnp.concatenate([-l21 / (l11 * l22), 1.0 / l22], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    h = n // 2
    a11 = a[..., :h, :h]
    a21 = a[..., h:, :h]
    a22 = a[..., h:, h:]
    l1i = _chol_inv_rec(a11, hp)
    w = jnp.matmul(a21, jnp.swapaxes(l1i, -1, -2), precision=hp)
    s = a22 - jnp.matmul(w, jnp.swapaxes(w, -1, -2), precision=hp)
    l2i = _chol_inv_rec(s, hp)
    bl = -jnp.matmul(l2i, jnp.matmul(w, l1i, precision=hp), precision=hp)
    top = jnp.concatenate([l1i, jnp.zeros_like(w).swapaxes(-1, -2)], axis=-1)
    bot = jnp.concatenate([bl, l2i], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def spd_inverse_recursive(c: jax.Array) -> jax.Array:
    """Explicit SPD inverse via recursive block Cholesky — MXU matmuls only,
    backward-stable (unlike ``spd_inverse_newton``; see its caveat).

    TPU rationale: ``_cho_inverse`` lowers the factorization and the two
    triangular solves to ~S-step sequential loops of dynamic-sliced
    scalar-ish updates. This route replaces them with a static Schur
    recursion (``_chol_inv_rec``): the input is embedded in the next
    power-of-two size (identity padding — block-diagonal, so the embedded
    inverse's top-left block IS the answer), the inverse Cholesky factor
    comes out of ~3 batched matmuls per recursion node, and
    K = L^{-T} L^{-1} is one final matmul. Residual quality is pinned
    against the lax route by tests/test_mag1c.py::test_spd_inverse_recursive.

    c: (..., S, S) SPD -> (..., S, S) ~= C^{-1} (symmetrized).
    """
    hp = jax.lax.Precision.HIGHEST
    s = c.shape[-1]
    n = 1 << (s - 1).bit_length()  # next power of two
    if n != s:
        eye = jnp.eye(n, dtype=c.dtype)
        pad = [(0, 0)] * (c.ndim - 2) + [(0, n - s), (0, n - s)]
        c = jnp.pad(c, pad) + eye * jnp.pad(
            jnp.zeros((s,), c.dtype), (0, n - s), constant_values=1.0
        )
    li = _chol_inv_rec(c, hp)
    k = jnp.matmul(jnp.swapaxes(li, -1, -2), li, precision=hp)
    k = 0.5 * (k + jnp.swapaxes(k, -1, -2))
    return k[..., :s, :s]


def spd_inverse_newton(c: jax.Array, *, num_iter: int = 30) -> jax.Array:
    """Batched SPD inverse via Newton–Schulz iteration — MXU matmuls only.

    TPU rationale: ``_cho_inverse`` lowers to a batched Cholesky
    factorization plus two triangular solves, each a chain of ~S dependent
    scalar-ish steps that XLA cannot tile onto the MXU — milliseconds for a
    (23, 50, 50) batch, and a dominant fixed cost of the VMEM-resident
    matched filter's init. The Newton–Schulz recurrence

        X_{k+1} = X_k (2 I - C X_k)

    is two batched (S, S) matmuls per step: ~60 tiny MXU ops total, fully
    parallel over the batch. Seeded with ``X_0 = I / ||C||_inf`` every
    eigenvalue y of X_0 C lies in (0, 1], where the scalar map y <- y(2 - y)
    increases monotonically to 1: the doubling phase needs ~log2(cond)
    steps, the quadratic endgame ~5 more, so ``num_iter=30`` covers
    condition numbers up to ~2^24 — far beyond a diagonally-shrunk radiance
    covariance.

    Accuracy caveat (measured, tests/test_mag1c.py::test_spd_inverse_newton):
    the FORWARD error matches the f32 Cholesky route (~eps * cond), but the
    iteration is not backward-stable — the residual ||KC - I|| stalls at
    ~eps * cond (vs Cholesky's ~eps * sqrt(cond) structure), i.e. K is a
    good approximation OF the inverse but a poor SOLVER operator. The
    matched filter's Woodbury glue therefore uses ``spd_inverse_recursive``
    (backward-stable blocked Schur recursion; residual pinned within 2x of
    Cholesky in the tests) rather than this recurrence — the glue's K0
    feeds iterative refinement and per-iteration rank-2 solves, both of
    which amplify a residual, and wiring Newton–Schulz in measurably moved
    near-threshold detections. Use it where only entrywise accuracy of the
    inverse matters and the Cholesky/triangular-solve lowering is the
    bottleneck.

    c: (..., S, S) SPD -> (..., S, S) ~= C^{-1} (symmetrized).
    """
    hp = jax.lax.Precision.HIGHEST
    s = c.shape[-1]
    eye = jnp.eye(s, dtype=c.dtype)
    # ||C||_inf (max absolute row sum) >= lambda_max for symmetric C.
    r = jnp.max(jnp.sum(jnp.abs(c), axis=-1), axis=-1)[..., None, None]
    x0 = (eye / r) * jnp.ones_like(c[..., :1, :1])  # broadcast to batch

    def body(_, x):
        cx = jnp.matmul(c, x, precision=hp)
        return jnp.matmul(x, 2.0 * eye - cx, precision=hp)

    x = jax.lax.fori_loop(0, num_iter, body, x0)
    return 0.5 * (x + jnp.swapaxes(x, -1, -2))


@functools.partial(
    jax.jit,
    static_argnames=(
        "alpha",
        "zero_override",
        "albedo_override",
        "apply_scaling",
        "compute_energy",
    ),
)
def rmf(
    x: jax.Array,
    template: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    alpha: float = 0.0,
    zero_override: bool = False,
    albedo_override: bool = False,
    apply_scaling: bool = True,
    compute_energy: bool = False,
):
    """Single-pass reweighted matched filter.

    Args:
        x: (B, P, S) radiance — B independent column groups, P pixels, S bands.
        template: (S,) target unit-absorption spectrum.
        weights: optional (B, P) 0/1 validity mask; statistics are computed
            over valid pixels only. Padding rows produce garbage mf values that
            callers must mask out (scatter by the same weights).
        alpha: diagonal covariance shrinkage.
        zero_override: skip the non-negativity ReLU.
        albedo_override: skip the albedo correction (R = 1).
        apply_scaling: multiply the result by 1e5 (ppm x m units).
        compute_energy: also return the reference's scalar energy diagnostic
            (mag1c.py:337-343): the summed Mahalanobis residual (see
            ``_energy_residual``) plus ``N/2 * log(1/prod(diag(chol)))`` —
            computed here as ``-N/2 * sum(log diag(chol))``, the same value
            without the overflow-prone explicit product. When set, scaling is
            NOT applied before the energy (matching the reference's ordering)
            and the return is ``(mf, R, energy)``.

    Returns:
        (mf, R): matched-filter score (B, P, 1) and albedo factor (B, P, 1);
        plus the scalar energy when ``compute_energy`` is set.
    """
    w, n = _weighted_stats_dtype(x, weights)
    template = template.astype(x.dtype)
    mu0 = _weighted_mean(x, w, n)  # (B, 1, S) pre-centering offset
    xc = x - mu0
    out = _rmf_core(
        xc,
        mu0,
        template,
        w,
        n,
        alpha=alpha,
        zero_override=zero_override,
        albedo_override=albedo_override,
        compute_energy=compute_energy,
    )
    mf, r = out[0], out[1]
    if compute_energy:
        return mf, r, out[2]
    if apply_scaling:
        mf = mf * SCALING
    return mf, r


def _rmf_core(
    xc: jax.Array,
    mu0: jax.Array,
    template: jax.Array,
    w,
    n: jax.Array,
    *,
    alpha: float,
    zero_override: bool,
    albedo_override: bool,
    compute_energy: bool,
):
    """Single-pass matched filter on a PRE-CENTERED cube.

    ``xc = x - mu0`` with ``mu0`` the initial weighted mean (mu0 rides along
    separately). Every statistic here — means, covariance accumulation, the
    filter numerator — runs on the small-magnitude centered values, the same
    numerics discipline as the Pallas kernels (ops/mag1c_pallas.py: the cube
    is centered by the per-block initial mean before any accumulation). This
    is what keeps the f32 XLA path stable under jit inlining: raw radiance
    carries a large DC offset, and accumulating it in a different
    fusion/summation order perturbs the near-singular covariance enough for
    the Cholesky solve (condition ~1e4 after alpha shrinkage) to amplify
    associativity noise to percent level (observed ~5% pre-fix; see
    tests/test_mag1c.py::test_pallas_num_iter_zero_contract).

    Returns ``(mf, r, extra)`` where ``extra`` is the scalar init energy when
    ``compute_energy`` else the ``(target0, x_minus_mu-unused)`` None.
    """
    tpl = template[None, None, :]
    # Residual mean of xc (zero up to mu0's own rounding): folding it back in
    # keeps mu == weighted_mean(x) exactly in exact arithmetic.
    delta = _weighted_mean(xc, w, n)
    mu = mu0 + delta  # (B, 1, S)
    target = tpl * mu  # (B, 1, S)
    x_minus_mu = xc - delta

    c = _weighted_cov(x_minus_mu, w, n)
    c = _shrink_diag(c, alpha)
    chol = jnp.linalg.cholesky(c)
    cit = _solve_from_factor(chol, target[:, 0, :])[:, :, None]  # (B, S, 1)
    normalizer = jnp.einsum("bs,bso->bo", target[:, 0, :], cit)[:, None, :]  # (B,1,1)

    if albedo_override:
        r = jnp.ones(xc.shape[:2] + (1,), dtype=xc.dtype)
    else:
        # R = (x . mu) / (mu . mu) with x = xc + mu0: the varying (per-pixel)
        # part contracts the centered cube; the DC part is one (B,) dot.
        num = jnp.einsum("bps,bs->bp", xc, mu[:, 0, :]) + jnp.einsum(
            "bs,bs->b", mu0[:, 0, :], mu[:, 0, :]
        )[:, None]
        r = num[..., None] / jnp.einsum(
            "bs,bs->b", mu[:, 0, :], mu[:, 0, :]
        )[:, None, None]

    mf = jnp.einsum("bps,bso->bpo", x_minus_mu, cit) / (r * normalizer)
    if not zero_override:
        mf = jax.nn.relu(mf)
    if compute_energy:
        # Reference (mag1c.py:338-341): residual + N/2 * log(det(C)^{-1/2}),
        # with the det taken over the WHOLE batch (prod across b and s).
        n_ref = float(xc.shape[1])
        logdet = jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)))
        energy = _energy_residual(x_minus_mu, w, chol) - 0.5 * n_ref * logdet
        return mf, r, energy
    return mf, r, None


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iter",
        "albedo_override",
        "zero_override",
        "sparse_override",
        "covariance_update_scaling",
        "alpha",
        "compute_energy",
    ),
)
def acrwl1mf(
    x: jax.Array,
    template: jax.Array,
    weights: Optional[jax.Array] = None,
    *,
    num_iter: int = 30,
    albedo_override: bool = False,
    zero_override: bool = False,
    sparse_override: bool = False,
    covariance_update_scaling: float = 1.0,
    alpha: float = 0.0,
    compute_energy: bool = False,
):
    """Albedo-corrected reweighted-L1 matched filter (iterative).

    Iteratively removes the detected signal from the background statistics and
    re-solves the matched filter with an L1 reweighting regularizer. See module
    docstring for TPU-design and parity notes.

    Args:
        x: (B, P, S) radiance (uniform P per group; pad + mask via ``weights``).
        template: (S,) target spectrum.
        weights: optional (B, P) 0/1 validity mask.
        num_iter: reweighting iterations (reference default 30).
        covariance_update_scaling: scale of the signal-removal term.
        alpha: diagonal covariance shrinkage (1e-4 for EMIT).
        compute_energy: also return the per-iteration energy series
            (reference mag1c.py:185,221-278): element 0 is the rmf init
            energy (residual + log-det term), elements 1..num_iter are the
            per-iteration summed Mahalanobis residuals (no det term). Shape
            (num_iter + 1,). See ``_energy_residual`` for the O(P) identity
            replacing the reference's (B, P, P) materialization.

    Returns:
        (mf, R): (B, P, 1) matched filter in ppm x m (scaled 1e5), albedo (B, P, 1);
        plus the (num_iter + 1,) energy series when ``compute_energy`` is set.
    """
    w, n = _weighted_stats_dtype(x, weights)
    template = template.astype(x.dtype)
    tpl = template[None, None, :]  # (1, 1, S)
    w3 = None if w is None else w[..., None]

    # Pre-center ONCE by the initial weighted mean; every loop statistic
    # (means, covariances, filter numerators) then accumulates the
    # small-magnitude centered values — see _rmf_core's numerics note.
    mu0 = _weighted_mean(x, w, n)  # (B, 1, S)
    xc = x - mu0

    mf, r, energy0 = _rmf_core(
        xc,
        mu0,
        template,
        w,
        n,
        alpha=alpha,
        zero_override=zero_override,
        albedo_override=albedo_override,
        compute_energy=compute_energy,
    )
    # Invalid (weight-0) pixels can carry R == 0 (e.g. zero-filled padding),
    # which would inject inf/NaN through the 1/R regularizer. Their values are
    # masked out of every statistic and of the outputs, so pin R = 1 there.
    if weights is not None:
        r = jnp.where(w3 > 0, r, 1.0)
        mf = jnp.where(w3 > 0, mf, 0.0)

    target0 = tpl * (mu0 + _weighted_mean(xc, w, n))  # (B, 1, S)

    def body(i, carry):
        mf, target, energies = carry
        # Remove current detections from the background estimate. In centered
        # coordinates: modx - mu == (xc - corr) - dmu with mu == mu0 + dmu.
        modxc = xc - covariance_update_scaling * r * mf * target
        dmu = _weighted_mean(modxc, w, n)
        new_target = tpl * (mu0 + dmu)
        modx_minus_mu = modxc - dmu
        x_minus_mu = xc - dmu

        c = _weighted_cov(modx_minus_mu, w, n)
        c = _shrink_diag(c, alpha)
        chol = jnp.linalg.cholesky(c)
        cit = _solve_from_factor(chol, new_target[:, 0, :])[:, :, None]  # (B, S, 1)
        if compute_energy:
            # Per-iteration energy: residual only (reference mag1c.py:270-274
            # appends sum(norm_residual) with no det term inside the loop).
            energies = energies.at[i + 1].set(_energy_residual(x_minus_mu, w, chol))

        if sparse_override:
            regularizer = jnp.zeros_like(mf)
        else:
            # Albedo-scaled L1 reweighting: weaker regularization over
            # high-signal (bright) pixels.
            regularizer = 1.0 / (r * (mf + EPSILON))

        normalizer = jnp.einsum("bs,bso->bo", new_target[:, 0, :], cit)[:, None, :]
        normalizer = jnp.maximum(normalizer, 1.0)
        new_mf = (jnp.einsum("bps,bso->bpo", x_minus_mu, cit) - regularizer) / (
            r * normalizer
        )
        if not zero_override:
            new_mf = jax.nn.relu(new_mf)
        # Keep padded pixels at zero so they never re-enter the statistics
        # through the regularizer/covariance-update pathway with NaN/Inf.
        if w3 is not None:
            new_mf = new_mf * w3
        return new_mf, new_target, energies

    if w3 is not None:
        mf = mf * w3
    energies0 = jnp.zeros((num_iter + 1,), x.dtype)
    if compute_energy:
        energies0 = energies0.at[0].set(energy0)
    mf, _, energies = jax.lax.fori_loop(0, num_iter, body, (mf, target0, energies0))
    if compute_energy:
        return mf * SCALING, r, energies
    return mf * SCALING, r


@functools.partial(
    jax.jit,
    static_argnames=(
        "column_step",
        "num_iter",
        "alpha",
        "fill_value",
        "compute_dtype",
        "use_pallas",
        "stream_dtype",
        "scene_layout",
        "interpret",
    ),
)
def mag1c_column_blocks(
    scene: jax.Array,
    template: jax.Array,
    valid_mask: Optional[jax.Array] = None,
    *,
    column_step: int = 2,
    num_iter: int = 30,
    alpha: float = 1e-4,
    fill_value: float = NODATA,
    compute_dtype=jnp.float32,
    use_pallas: Optional[bool] = None,
    stream_dtype=None,
    scene_layout: str = "hws",
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run the matched filter over a full scene in uniform column blocks.

    TPU-native equivalent of the reference per-column drivers
    (mag1c_emit.py:58-84 ``column_step`` blocks; mag1c.py:117-174 column
    groups): the scene's width axis is split into ``column_step``-wide blocks,
    every block is padded to the same pixel count, and all blocks run as one
    batched program. Per-CCD-column statistics are a *correctness* requirement
    for pushbroom sensors, which is why the batch axis is columns, not tiles.

    Args:
        scene: (H, W, S) radiance cube.
        template: (S,) target spectrum.
        valid_mask: optional (H, W) boolean; invalid pixels are excluded from
            statistics and set to ``fill_value`` in the outputs.
        column_step: width of each column block (None/W => whole image).
        num_iter, alpha: matched-filter parameters.
        stream_dtype: storage dtype for the Pallas kernel's per-iteration
            streaming passes (default = compute_dtype). ``jnp.bfloat16``
            halves HBM traffic (~15% faster full-scene) at pinned detection
            fidelity (tests/test_mag1c.py bf16 tests).
        scene_layout: ``"hws"`` (default, reference-compatible (H, W, S)) or
            ``"shw"`` — the band-major (S, H, W) cube, the serving-native
            device layout. TPU tiles an array's last two dims to (8, 128);
            with S ~ 50 bands minor, an hws cube physically inflates 2.56x
            on device (50 -> 128 lanes) and the fast path pays an extra
            re-tiling copy of the whole cube (~3 ms/scene of ~11 ms total,
            measured). Band-major puts spatial dims on the tiles (<1% pad)
            and the transpose kernel reads the parameter directly — prefer
            it anywhere the cube is produced on device or uploaded fresh
            (``emit_granule_to_mask`` does; see
            ``blocked_transpose_shw``'s rationale).
        interpret: run Pallas kernels in interpreter mode — lets the CPU test
            suite exercise the TPU fast path end to end
            (``use_pallas=True, interpret=True``).

    Returns:
        (mf, albedo): (H, W) arrays with ``fill_value`` at invalid pixels.
    """
    if scene_layout not in ("hws", "shw"):
        raise ValueError(f"scene_layout must be 'hws' or 'shw', got {scene_layout!r}")
    band_major = scene_layout == "shw"
    if band_major:
        s, h, w_dim = scene.shape
    else:
        h, w_dim, s = scene.shape
    step = int(column_step) if column_step else w_dim
    nb = -(-w_dim // step)  # ceil div
    pad_w = nb * step - w_dim

    scene = jnp.asarray(scene, dtype=compute_dtype)
    # No mask and no width padding: every pixel is valid, so skip the mask
    # materialization and the full-cube zeroing multiply (each a complete HBM
    # read+write of the scene) — the kernels take weights=None fast paths.
    no_mask = valid_mask is None and pad_w == 0
    if valid_mask is None:
        valid = jnp.ones((h, w_dim), dtype=bool)
    else:
        valid = jnp.asarray(valid_mask, dtype=bool)

    if pad_w:
        wpad = ((0, 0), (0, 0), (0, pad_w)) if band_major else ((0, 0), (0, pad_w), (0, 0))
        scene = jnp.pad(scene, wpad)
        valid = jnp.pad(valid, ((0, 0), (0, pad_w)))

    if use_pallas is None:
        # Default to the Pallas-fused kernel on TPU at f32 (≈1.7x the XLA
        # path: one HBM read of the cube per iteration); XLA elsewhere.
        # num_iter=0 (rmf init only) is an XLA-path contract the Pallas
        # variants reject — see acrwl1mf_fused's guard.
        use_pallas = (
            compute_dtype == jnp.float32
            and jax.devices()[0].platform == "tpu"
            and num_iter >= 1
        )

    if use_pallas:
        from starcop_tpu.ops.mag1c_pallas import (
            DEFAULT_TILE_P,
            _dividing_tile,
            acrwl1mf_fused,
            acrwl1mf_resident_swh,
            blocked_transpose,
            blocked_transpose_shw,
            blocked_transpose_swh,
        )

    tpl = jnp.asarray(template, dtype=compute_dtype)

    def unblock(v):
        v = v[..., 0].reshape(nb, h, step).transpose(1, 0, 2).reshape(h, nb * step)
        return v[:, :w_dim]

    def unblock_j_major(v):
        # Inverts blocked_transpose_swh's p = j*H + h pixel order.
        v = v[..., 0].reshape(nb, step, h).transpose(2, 0, 1).reshape(h, nb * step)
        return v[:, :w_dim]

    if use_pallas and no_mask:
        # Fast path (every pixel valid): transpose straight to the kernel's
        # (B, S, P) streaming layout in ONE shuffle — the (B, P, S) batched
        # view is never materialized — then pick the strongest kernel the
        # block geometry allows:
        #   resident — whole column block held in VMEM across ALL iterations
        #     (ONE HBM read of the cube, total); needs the double-buffered
        #     block + its centered f32 copy to fit the scoped-VMEM budget.
        #   fused    — per-iteration streaming rounds (one read/iteration);
        #     needs a lane-aligned pixel-tile divisor.
        # The shuffle itself goes through a Pallas kernel (contiguous slab
        # reads, band dim born sublane-padded so no XLA pad pass follows)
        # when a row tile divides H.
        p_blk = h * step
        sp = -(-s // 8) * 8
        sdt = stream_dtype or compute_dtype
        item = 2 if sdt == jnp.bfloat16 else 4
        resident_ok = sp * p_blk * (2 * item + 4) <= 100 * 1024 * 1024
        fused_ok = _dividing_tile(p_blk, DEFAULT_TILE_P) is not None
        if resident_ok or fused_ok:
            glue = "resident" if resident_ok else "fused"
            pad_s = sp if resident_ok else None
            # Preferred shuffle: the swh kernel. XLA stores the hws cube
            # parameter H-minor (physically (S, W, H)); transposing the view
            # is a layout bitcast, and the kernel reads it in place — the
            # default-layout route instead makes XLA materialize a re-tiled
            # copy of the whole cube before the kernel (~4 ms/EMIT scene).
            # Its blocks use j-major pixel order, inverted in unblock.
            xt = None
            j_major = False
            swh = (
                jnp.transpose(scene, (2, 1, 0)) if not band_major
                else jnp.transpose(scene, (0, 2, 1))
            )
            if glue == "resident" and sdt == jnp.float32:
                # Strongest path: the whole filter straight off the swh cube
                # (TWO HBM reads total, no blocked copy ever written — see
                # acrwl1mf_resident_swh). Falls through to the transpose +
                # bsp route when the slab geometry doesn't fit.
                out = acrwl1mf_resident_swh(
                    swh, tpl, nb, step, num_iter=num_iter, alpha=alpha,
                    interpret=interpret,
                )
                if out is not None:
                    return unblock_j_major(out[0]), unblock_j_major(out[1])
            xt = blocked_transpose_swh(swh, nb, step, pad_s=pad_s, interpret=interpret)
            if xt is not None:
                j_major = True
            elif band_major:
                xt = blocked_transpose_shw(
                    scene, nb, step, pad_s=pad_s, interpret=interpret
                )
                if xt is None:
                    xt = (
                        scene.reshape(s, h, nb, step)
                        .transpose(2, 0, 1, 3)
                        .reshape(nb, s, h * step)
                    )
            else:
                xt = blocked_transpose(scene, nb, step, pad_s=pad_s, interpret=interpret)
                if xt is None:
                    xt = (
                        scene.reshape(h, nb, step, s)
                        .transpose(1, 3, 0, 2)
                        .reshape(nb, s, h * step)
                    )
            mf, albedo = acrwl1mf_fused(
                xt, tpl, None, num_iter=num_iter, alpha=alpha,
                stream_dtype=sdt, x_layout="bsp", glue=glue,
                interpret=interpret,
            )
            ub = unblock_j_major if j_major else unblock
            return ub(mf), ub(albedo)

    if band_major:
        # Generic path (mask / width padding / XLA-only): restate as the
        # reference-compatible (H, W, S) view; correctness path, not the
        # serving fast path.
        scene = jnp.transpose(scene, (1, 2, 0))

    # (H, nb, step, S) -> (nb, H * step, S): one batch entry per column block.
    xb = scene.reshape(h, nb, step, s).transpose(1, 0, 2, 3).reshape(nb, h * step, s)
    if no_mask:
        wb = None
    else:
        wb = valid.reshape(h, nb, step).transpose(1, 0, 2).reshape(nb, h * step)
        # Zero out invalid pixels so padded data cannot produce NaNs upstream
        # of the weighting (e.g. fill values of -9999).
        xb = xb * wb[..., None].astype(xb.dtype)

    wb_f = None if wb is None else wb.astype(compute_dtype)
    if use_pallas:
        mf, albedo = acrwl1mf_fused(
            xb, tpl, wb_f,
            num_iter=num_iter, alpha=alpha,
            stream_dtype=stream_dtype or compute_dtype,
            interpret=interpret,
        )
    else:
        mf, albedo = acrwl1mf(
            xb, tpl, wb_f,
            num_iter=num_iter, alpha=alpha,
        )

    mf2 = jnp.where(valid[:, :w_dim], unblock(mf), fill_value)
    albedo2 = jnp.where(valid[:, :w_dim], unblock(albedo), fill_value)
    return mf2, albedo2


def reference_oracle_acrwl1mf(
    x: np.ndarray,
    template: np.ndarray,
    num_iter: int = 30,
    covariance_update_scaling: float = 1.0,
    alpha: float = 0.0,
    compute_energy: bool = False,
):
    """Float64 numpy restatement of the reference matched-filter math.

    Used as the golden oracle in tests (and for CPU parity checks). This is an
    independent implementation of the published algorithm (Foote et al., IEEE
    TGRS 2020), not a port of any framework code.

    ``compute_energy`` reproduces the reference's per-iteration energy series
    (mag1c.py:185,221-278) LITERALLY — the full (B, P, P) Mahalanobis product
    summed over every entry — so the production path's O(P) algebraic identity
    (``_energy_residual``) is verified against an independent statement.
    """
    x = np.asarray(x, dtype=np.float64)
    template = np.asarray(template, dtype=np.float64)
    b, p, s = x.shape
    tpl = template[None, None, :]

    def stats(v):
        mu = v.mean(axis=1, keepdims=True)
        vm = v - mu
        c = np.einsum("bps,bpt->bst", vm, vm) / p
        c = (1 - alpha) * c + alpha * np.eye(s)[None] * np.diagonal(c, axis1=1, axis2=2)[:, None, :]
        return mu, c

    def energy_residual(x_minus_mu, c):
        # Literal reference computation: bmm(xm, C^{-1} xm^T) is (B, P, P).
        return float(
            sum(
                np.sum(x_minus_mu[i] @ np.linalg.solve(c[i], x_minus_mu[i].T))
                for i in range(b)
            )
        )

    mu, c = stats(x)
    target = tpl * mu
    x_minus_mu = x - mu
    cit = np.linalg.solve(c, target[:, 0, :, None])
    normalizer = np.einsum("bs,bso->bo", target[:, 0, :], cit)[:, None, :]
    r = np.einsum("bps,bs->bp", x, mu[:, 0, :])[..., None] / np.einsum(
        "bs,bs->b", mu[:, 0, :], mu[:, 0, :]
    )[:, None, None]
    mf = np.maximum(np.einsum("bps,bso->bpo", x_minus_mu, cit) / (r * normalizer), 0.0)

    energies = []
    if compute_energy:
        # rmf init energy: residual + N/2 * log(1 / prod(diag chol)), the
        # det product spanning the whole batch (reference mag1c.py:338-341).
        chol = np.linalg.cholesky(c)
        det_cov = 1.0 / np.prod(np.diagonal(chol, axis1=-2, axis2=-1))
        energies.append(energy_residual(x_minus_mu, c) + p / 2.0 * np.log(det_cov))

    target = tpl * x.mean(axis=1, keepdims=True)
    for _ in range(num_iter):
        modx = x - covariance_update_scaling * r * mf * target
        mu, c = stats(modx)
        target = tpl * mu
        x_minus_mu = x - mu
        cit = np.linalg.solve(c, target[:, 0, :, None])
        if compute_energy:
            energies.append(energy_residual(x_minus_mu, c))
        regularizer = 1.0 / (r * (mf + EPSILON))
        normalizer = np.maximum(
            np.einsum("bs,bso->bo", target[:, 0, :], cit)[:, None, :], 1.0
        )
        mf = np.maximum(
            (np.einsum("bps,bso->bpo", x_minus_mu, cit) - regularizer) / (r * normalizer),
            0.0,
        )
    if compute_energy:
        return mf * SCALING, r, np.asarray(energies)
    return mf * SCALING, r
