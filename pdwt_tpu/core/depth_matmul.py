"""MXU formulation of the 3D depth pass (banded matrix along depth).

The depth filter pass of the 3D compositions is LINEAR along the
(major) depth axis: ``out = A @ x`` with a tiny static banded matrix
``A`` that bakes the periodic wrap, the odd virtual extension, the
decimation / à-trous geometry, and the filter reversal of
:mod:`pdwt_tpu.core.conv` (the module defining the index semantics —
reference: src/separable.cu:91-131, 409-493).  A depth-major volume
reshapes for FREE to ``(D, R*C)``, so the pass is one matmul whose N
dimension is the contiguous plane — the MXU reads the volume ONCE from
HBM, where the slice-FMA formulation re-reads it ``hlen`` times (one
stream per tap).  At 64×512² db4 the dual-FIR analysis pass drops from
~hlen volume reads to a (128×78)·(78×262144) matmul.

Precision follows conv._precision: HIGHEST (exact bf16x6 passes) for
f32 arrays — the matrices are small enough that the x6 FLOPs are
irrelevant next to the saved HBM traffic — and DEFAULT with f32
accumulation for bf16 arrays.  Equality to the conv backends is
asserted in tests/test_3d.py; enable/disable with PDWT_TPU_DEPTH_MM
(default on).
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from .conv import fwd_center, inv_shift, swt_inv_center, _accum_dtype


def use_depth_mm() -> bool:
    return os.environ.get("PDWT_TPU_DEPTH_MM", "1") != "0"


def _ftup(f) -> Tuple[float, ...]:
    return tuple(float(v) for v in np.asarray(f, np.float64))


@functools.lru_cache(maxsize=None)
def _analysis_matrix(taps: Tuple[Tuple[float, ...], ...], n: int,
                     dilation: int, decimate: bool) -> np.ndarray:
    """(K*n_out, n) matrix of the periodic analysis pass: row
    ``k*n_out + m`` computes output m of filter k.  ``taps`` are the
    forward-convention filters (reversal happens here, matching
    conv.analysis_pass)."""
    fs = [np.asarray(f, np.float64)[::-1] for f in taps]
    hlen = len(fs[0])
    c = fwd_center(hlen) * dilation
    ne = n + (n % 2) if decimate else n
    stride = 2 if decimate else 1
    n_out = ne // 2 if decimate else n
    a = np.zeros((len(fs), n_out, n))
    for m in range(n_out):
        for j in range(hlen):
            idx = (stride * m - c + j * dilation) % ne
            col = idx if idx < n else n - 1  # odd virtual extension
            for q, f in enumerate(fs):
                a[q, m, col] += f[j]
    return a.reshape(len(fs) * n_out, n)


@functools.lru_cache(maxsize=None)
def _synthesis_matrix(taps: Tuple[Tuple[float, ...], ...], m: int,
                      dilation: int, decimated: bool,
                      out_len: int) -> np.ndarray:
    """(out_len, K*m) matrix of the periodic synthesis pass applied to
    the depth-concatenated K coefficient bands (k-major layout, i.e.
    column ``k*m + t`` is coefficient t of band k) — matching
    conv.synthesis_pass with the channel groups pre-merged."""
    fs = [np.asarray(f, np.float64)[::-1] for f in taps]
    hlen = len(fs[0])
    if decimated:
        assert dilation == 1
        s = inv_shift(hlen)
        ln = 2 * m  # zero-stuffed length
    else:
        s = swt_inv_center(hlen) * dilation
        ln = m
    a = np.zeros((out_len, len(fs), m))
    for g in range(out_len):
        for j in range(hlen):
            idx = (g - s + j * dilation) % ln
            if decimated:
                if idx % 2:
                    continue  # zero-stuffed odd slot
                idx //= 2
            for q, f in enumerate(fs):
                a[g, q, idx] += f[j]
    return a.reshape(out_len, len(fs) * m)


def _apply(mat: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """einsum the (M, D) matrix over the depth axis (-3) of a
    (..., D, R, C) array, with conv.py's precision/accumulation rules."""
    acc = _accum_dtype(x.dtype)
    prec = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    a = jnp.asarray(mat, jnp.float32 if acc == jnp.float32 else x.dtype)
    y = jnp.einsum("md,...drc->...mrc", a, x, precision=prec,
                   preferred_element_type=acc)
    return y.astype(x.dtype)


def depth_analysis_mm(x: jnp.ndarray, filters: Sequence, *,
                      dilation: int = 1,
                      decimate: bool = True) -> jnp.ndarray:
    """Drop-in for ``conv.analysis_pass(x, filters, axis=-3, ...)`` on
    (B, C, D, R, W) arrays with periodic padding: returns
    (B, C*K, D', R, W) with channel c*K + k = filter k of channel c."""
    b, c, d, r, w = x.shape
    taps = tuple(_ftup(f) for f in filters)
    k = len(taps)
    mat = _analysis_matrix(taps, d, dilation, bool(decimate))
    y = _apply(mat, x)  # (B, C, K*D', R, W), k-major rows
    dp = y.shape[-3] // k
    return y.reshape(b, c, k, dp, r, w).reshape(b, c * k, dp, r, w)


def depth_synthesis_mm(z: jnp.ndarray, filters: Sequence, *,
                       out_len: int, dilation: int = 1,
                       decimated: bool = True) -> jnp.ndarray:
    """Drop-in for ``conv.synthesis_pass(z, filters, axis=-3, ...)`` on
    (B, C*K, D, R, W) arrays with periodic padding: each group of K
    consecutive channels combines into one output channel."""
    b, ck, d, r, w = z.shape
    taps = tuple(_ftup(f) for f in filters)
    k = len(taps)
    c = ck // k
    mat = _synthesis_matrix(taps, d, dilation, bool(decimated), out_len)
    # (B, C, K, D, ..) -> (B, C, K*D, ..): free merge, k-major like mat
    zz = z.reshape(b, c, k * d, r, w)
    return _apply(mat, zz)
