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


def thresholded_norm1(coeffs: Coeffs, beta, *, mode: str = "soft",
                      normalize: bool = False,
                      do_thresh_appcoeffs: bool = False) -> jnp.ndarray:
    """norm1(threshold(coeffs)) computed WITHOUT materializing the
    thresholded pytree: norm1(soft(x, b)) = sum max(|x|-b, 0) and
    norm1(hard(x, b)) = sum |x| * [|x| > b].  Pairs with the fused
    threshold-in-inverse kernels (core.separable.iswt2d_denoise) so a
    denoise step never writes thresholded coefficients to HBM."""
    import math as _math

    from .threshold import _app_beta

    n = coeffs.levels

    def term(x, b):
        ax = jnp.abs(x).astype(_accum(x.dtype))
        b = jnp.asarray(b, ax.dtype)
        if mode == "soft":
            return jnp.sum(jnp.maximum(ax - b, 0))
        if mode == "hard":
            return jnp.sum(jnp.where(ax > b, ax, 0))
        raise ValueError(mode)

    lvl_beta = lambda i: (beta / (_math.sqrt(2.0) ** (i + 1))
                          if normalize else beta)
    total = 0.0
    for i, det in enumerate(coeffs.details):
        bands = det if isinstance(det, tuple) else (det,)
        for x in bands:
            total = total + term(x, lvl_beta(i))
    a = coeffs.approx
    if do_thresh_appcoeffs:
        total = total + term(a, _app_beta(beta, n, normalize))
    else:
        total = total + jnp.sum(jnp.abs(a).astype(_accum(a.dtype)))
    return total
