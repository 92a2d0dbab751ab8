"""Norms and coefficient algebra.

Equivalents of the reference cuBLAS-based reductions (reference:
src/wt.cu:370-418, src/common.cu:499-526).  The reference performs one
cublasSasum/Snrm2 per subband per level, each returning a scalar to the
host (a host-device ping-pong per call); here the whole reduction is a
single jitted tree-reduce producing one device scalar, and under a mesh a
single ``psum`` finishes the job.

Note: the reference's ``norm2sq`` accumulates *asum* (L1) instead of
nrm2^2 for 1D coefficients (reference: src/wt.cu:388-389) — an apparent
bug we do not reproduce; we always return the true squared L2 norm.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from ..core.separable import Coeffs1D, Coeffs2D
from ..core.separable3d import Coeffs3D

Coeffs = Union[Coeffs1D, Coeffs2D, Coeffs3D]


def _accum(dtype):
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype


def norm1(coeffs: Coeffs) -> jnp.ndarray:
    """Sum of |coeff| over all subbands incl. approximation
    (reference: src/wt.cu:398-418)."""
    leaves = jax.tree_util.tree_leaves(coeffs)
    return sum(jnp.sum(jnp.abs(x), dtype=_accum(x.dtype)) for x in leaves)


def norm2sq(coeffs: Coeffs) -> jnp.ndarray:
    """Squared L2 norm over all subbands incl. approximation
    (reference: src/wt.cu:370-395)."""
    leaves = jax.tree_util.tree_leaves(coeffs)
    return sum(jnp.sum(jnp.square(x.astype(_accum(x.dtype)))) for x in leaves)


def add_coeffs(dst: Coeffs, src: Coeffs, alpha=1.0) -> Coeffs:
    """dst + alpha * src over the whole pytree (coefficient axpy,
    reference: src/common.cu:499-526)."""
    return jax.tree_util.tree_map(
        lambda a, b: a + jnp.asarray(alpha, a.dtype) * b, dst, src
    )


def _group_norms(coeffs: Coeffs, i: int, do_thresh_appcoeffs: bool):
    """Per-pixel L2 norm of the level-``i`` detail group (the grouping of
    group_soft_threshold: the detail subbands jointly, + A at the
    coarsest level when ``do_thresh_appcoeffs``)."""
    det = coeffs.details[i]
    bands = det if isinstance(det, tuple) else (det,)
    acc = _accum(bands[0].dtype)
    norm2 = sum(jnp.square(x.astype(acc)) for x in bands)
    if do_thresh_appcoeffs and i == coeffs.levels - 1:
        norm2 = norm2 + jnp.square(coeffs.approx.astype(acc))
    return jnp.sqrt(norm2)


def norm_l21(coeffs: Coeffs, *, do_thresh_appcoeffs: bool = False) -> jnp.ndarray:
    """Group-lasso (L2,1) norm: sum over pixels of the L2 norm of each
    cross-subband detail group, matching group_soft_threshold's grouping
    (that threshold is the prox of ``beta * norm_l21``).  The approx
    joins the coarsest group when ``do_thresh_appcoeffs``, else
    contributes its plain L1 norm (the norm1 convention).  Covers the
    reference's TODO wish "compute norm related to threshold (…
    group-lasso)" (reference: TODO.txt)."""
    total = 0.0
    for i in range(coeffs.levels):
        total = total + jnp.sum(_group_norms(coeffs, i, do_thresh_appcoeffs))
    if not do_thresh_appcoeffs:
        a = coeffs.approx
        total = total + jnp.sum(jnp.abs(a).astype(_accum(a.dtype)))
    return total


def thresholded_norm_l21(coeffs: Coeffs, beta, *, normalize: bool = False,
                         do_thresh_appcoeffs: bool = False) -> jnp.ndarray:
    """norm_l21(group_soft_threshold(coeffs, beta)) WITHOUT materializing
    the thresholded pytree: group-soft scales each pixel's group vector
    so its L2 norm becomes max(||g|| - b, 0), hence the thresholded L2,1
    norm is just sum max(||g|| - b, 0)."""
    import math as _math

    lvl_beta = lambda i: (beta / (_math.sqrt(2.0) ** (i + 1))
                          if normalize else beta)
    total = 0.0
    for i in range(coeffs.levels):
        norm = _group_norms(coeffs, i, do_thresh_appcoeffs)
        b = jnp.asarray(lvl_beta(i), norm.dtype)
        total = total + jnp.sum(jnp.maximum(norm - b, 0))
    if not do_thresh_appcoeffs:
        a = coeffs.approx
        total = total + jnp.sum(jnp.abs(a).astype(_accum(a.dtype)))
    return total


def thresholded_norm1(coeffs: Coeffs, beta, *, mode: str = "soft",
                      normalize: bool = False,
                      do_thresh_appcoeffs: bool = False) -> jnp.ndarray:
    """norm1(threshold(coeffs)) computed WITHOUT materializing the
    thresholded pytree: norm1(soft(x, b)) = sum max(|x|-b, 0) and
    norm1(hard(x, b)) = sum |x| * [|x| > b].  Pairs with the fused
    threshold-in-inverse kernels (core.separable.iswt2d_denoise) so a
    denoise step never writes thresholded coefficients to HBM.
    ``beta`` accepts the same scalar or per-level/per-band sequences as
    the threshold ops (see threshold._resolve_beta)."""
    from .threshold import _app_beta, _resolve_beta

    n = coeffs.levels

    def term(x, b):
        ax = jnp.abs(x).astype(_accum(x.dtype))
        b = jnp.asarray(b, ax.dtype)
        if mode == "soft":
            return jnp.sum(jnp.maximum(ax - b, 0))
        if mode == "hard":
            return jnp.sum(jnp.where(ax > b, ax, 0))
        if mode == "garrote":
            # norm1(garrote(x, b)) = sum_{|x|>b} (|x| - b^2/|x|)
            safe = jnp.where(ax > b, ax, 1)
            return jnp.sum(jnp.where(ax > b, ax - b * b / safe, 0))
        raise ValueError(mode)

    total = 0.0
    for i, det in enumerate(coeffs.details):
        if isinstance(det, tuple):
            for j, x in enumerate(det):
                total = total + term(x, _resolve_beta(beta, i, j,
                                                      normalize))
        else:
            total = total + term(det, _resolve_beta(beta, i, None,
                                                    normalize))
    a = coeffs.approx
    if do_thresh_appcoeffs:
        total = total + term(a, _app_beta(beta, n, normalize))
    else:
        total = total + jnp.sum(jnp.abs(a).astype(_accum(a.dtype)))
    return total
