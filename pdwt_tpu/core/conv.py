"""Periodic filtering primitives — the compute core of the framework.

This module defines the exact index semantics of the transforms, derived
from the reference CUDA kernels but re-cast as gather/convolution algebra
that XLA lowers onto the TPU's convolution/vector units:

Forward decimated analysis (reference: src/separable.cu:91-131):
    c  = hlen//2 if hlen odd else hlen//2 - 1      (even taps: center left)
    xe = x extended by repeating the last element when N is odd
         ("virtual extension", reference: src/separable.cu:116-121)
    out[n] = sum_j  filt[hlen-1-j] * xe[(2n - c + j) mod Ne],  n in [0, Ne/2)

Inverse decimated synthesis (reference: src/separable.cu:246-328).  The
reference's polyphase even/odd tap selection with the "virtual index"
shift for even half-length is algebraically identical to correlating the
zero-stuffed upsampled coefficients with the reversed synthesis filter at
a fixed shift s:
    h2 = hlen//2 ; c2 = h2//2 ; s = 2*c2+1 if h2 odd else 2*c2
    u[2t] = a[t], u[2t+1] = 0                     (length 2M)
    out[g] = sum_j rec[hlen-1-j] * u[(g - s + j) mod 2M],  sliced to out_len

SWT (a-trous, reference: src/separable.cu:409-493, 553-626): stride 1,
filter dilated by factor = 2^(level-1); analysis centers like the forward
pass scaled by factor; synthesis uses c = hlen//2 (both parities,
reference: src/separable.cu:559-568) scaled by factor, and halves the taps
per pass (reference: src/separable.cu:581-584).

Everything operates on NCHW arrays.  Two interchangeable backends:

* ``xla``   — periodic padding + ``lax.conv_general_dilated`` (grouped
              convolutions compute all subbands of a pass in one op, which
              XLA fuses and tiles for the TPU).
* ``gather`` — take()-based windows + tensordot; shape-agnostic oracle used
              for cross-checking and as a CPU fallback.

Both produce bit-identical index semantics; tests assert their equality.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_BACKENDS = ("xla", "gather")
_default_backend = "xla"


def set_default_backend(name: str) -> None:
    global _default_backend
    if name not in _BACKENDS:
        raise ValueError(f"unknown backend {name!r}; expected one of {_BACKENDS}")
    _default_backend = name


def get_default_backend() -> str:
    return _default_backend


def fwd_center(hlen: int) -> int:
    """Analysis center tap (reference: src/separable.cu:98-107)."""
    return hlen // 2 if hlen % 2 else hlen // 2 - 1


def inv_shift(hlen: int) -> int:
    """Synthesis shift in the upsampled domain (see module docstring)."""
    h2 = hlen // 2
    c2 = h2 // 2
    return 2 * c2 + 1 if h2 % 2 else 2 * c2


def swt_inv_center(hlen: int) -> int:
    """SWT synthesis center (reference: src/separable.cu:559-568)."""
    return hlen // 2


def _accum_dtype(dtype) -> jnp.dtype:
    if dtype in (jnp.bfloat16, jnp.float16):
        return jnp.float32
    return dtype


def _precision(dtype):
    # Full-precision multiplies: a wavelet library must reconstruct to
    # float32 roundoff, which the TPU's default bf16 matmul passes miss.
    if dtype == jnp.float32:
        return lax.Precision.HIGHEST
    return None


def odd_extend(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Repeat the last element when the size is odd (virtual extension,
    reference: src/separable.cu:116-121)."""
    n = x.shape[axis]
    if n % 2 == 0:
        return x
    last = lax.slice_in_dim(x, n - 1, n, axis=axis)
    return jnp.concatenate([x, last], axis=axis)


def wrap_pad(x: jnp.ndarray, axis: int, lo: int, hi: int) -> jnp.ndarray:
    """Periodic padding, robust to pad widths exceeding the axis size."""
    n = x.shape[axis]
    if lo == 0 and hi == 0:
        return x
    parts = []
    if lo:
        full, rem = divmod(lo, n)
        if rem:
            parts.append(lax.slice_in_dim(x, n - rem, n, axis=axis))
        parts.extend([x] * full)
    parts.append(x)
    if hi:
        full, rem = divmod(hi, n)
        parts.extend([x] * full)
        if rem:
            parts.append(lax.slice_in_dim(x, 0, rem, axis=axis))
    return jnp.concatenate(parts, axis=axis)


def zero_stuff(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Interleave zeros: [a0, a1, ...] -> [a0, 0, a1, 0, ...] (2x length)."""
    axis = axis % x.ndim
    z = jnp.zeros_like(x)
    y = jnp.stack([x, z], axis=axis + 1)
    new_shape = x.shape[:axis] + (2 * x.shape[axis],) + x.shape[axis + 1 :]
    return y.reshape(new_shape)


def _kernel_4d(taps: np.ndarray, axis: int) -> np.ndarray:
    """Reshape (O, I, hlen) 1D taps into an OIHW kernel along H or W."""
    o, i, hlen = taps.shape
    if axis == -1 or axis == 3:
        return taps.reshape(o, i, 1, hlen)
    return taps.reshape(o, i, hlen, 1)


def _conv_nchw(
    x: jnp.ndarray,
    kernel: np.ndarray,
    *,
    window_strides,
    rhs_dilation,
    feature_group_count: int,
) -> jnp.ndarray:
    dtype = x.dtype
    out = lax.conv_general_dilated(
        x,
        jnp.asarray(kernel, dtype=_accum_dtype(dtype)),
        window_strides=window_strides,
        padding="VALID",
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=feature_group_count,
        precision=_precision(dtype),
        preferred_element_type=_accum_dtype(dtype),
    )
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Analysis (forward) pass along one axis
# ---------------------------------------------------------------------------

def analysis_pass(
    x: jnp.ndarray,
    filters: Sequence[np.ndarray],
    axis: int,
    *,
    dilation: int = 1,
    decimate: bool = True,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Filter every channel of ``x`` (B,C,H,W) with each 1D filter along
    ``axis`` (periodic), optionally decimating by 2.

    Returns (B, C*K, H', W') with output channel c*K + k = filter k applied
    to input channel c.  ``filters`` are the *forward-convention* taps
    (e.g. dec_lo); the reversal for correlation happens here.
    """
    backend = backend or _default_backend
    filters = [np.asarray(f, dtype=np.float64) for f in filters]
    hlen = len(filters[0])
    assert all(len(f) == hlen for f in filters)
    c = fwd_center(hlen) * dilation
    pad_hi = (hlen - 1) * dilation - c
    taps = np.stack([f[::-1] for f in filters])  # (K, hlen)

    if decimate:
        assert dilation == 1
        x = odd_extend(x, axis)
    xp = wrap_pad(x, axis, c, pad_hi)

    k = len(filters)
    ch = x.shape[1]
    if backend == "xla":
        kern = _kernel_4d(
            np.broadcast_to(taps[None], (ch, k, hlen)).reshape(ch * k, 1, hlen),
            axis,
        )
        strides = [1, 1]
        dil = [1, 1]
        ax4 = axis % 4
        strides[ax4 - 2] = 2 if decimate else 1
        dil[ax4 - 2] = dilation
        return _conv_nchw(
            xp, kern, window_strides=tuple(strides), rhs_dilation=tuple(dil),
            feature_group_count=ch,
        )
    elif backend == "gather":
        return _gather_corr(xp, taps, axis, stride=2 if decimate else 1,
                            dilation=dilation, split_channels=True)
    raise ValueError(f"unknown backend {backend!r}")


# ---------------------------------------------------------------------------
# Synthesis (inverse) pass along one axis
# ---------------------------------------------------------------------------

def synthesis_pass(
    x: jnp.ndarray,
    filters: Sequence[np.ndarray],
    axis: int,
    *,
    out_len: Optional[int] = None,
    dilation: int = 1,
    decimated: bool = True,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Synthesis: input (B, C*K, H, W) where each group of K consecutive
    channels is combined into one output channel:
        out[:, c] = sum_k corr(upsample(x[:, c*K+k]), reversed(filters[k]))

    ``decimated=True`` zero-stuffs along ``axis`` and slices to ``out_len``
    (DWT inverse); ``decimated=False`` is the a-trous SWT inverse (caller
    pre-scales the filters by the per-pass 1/2, reference:
    src/separable.cu:581-584).
    """
    backend = backend or _default_backend
    filters = [np.asarray(f, dtype=np.float64) for f in filters]
    hlen = len(filters[0])
    k = len(filters)
    taps = np.stack([f[::-1] for f in filters])  # (K, hlen)

    if decimated:
        assert dilation == 1
        s = inv_shift(hlen)
        u = zero_stuff(x, axis)
    else:
        s = swt_inv_center(hlen) * dilation
        u = x
    pad_hi = (hlen - 1) * dilation - s
    up = wrap_pad(u, axis, s, pad_hi)

    ch_out = x.shape[1] // k
    if backend == "xla":
        kern = _kernel_4d(
            np.broadcast_to(taps[None], (ch_out, k, hlen)).reshape(ch_out, k, hlen)
            [:, :, :],
            axis,
        )
        dil = [1, 1]
        dil[(axis % 4) - 2] = dilation
        out = _conv_nchw(
            up, kern, window_strides=(1, 1), rhs_dilation=tuple(dil),
            feature_group_count=ch_out,
        )
    elif backend == "gather":
        # _gather_corr applies every tap to every channel; synthesis needs
        # channel g*K+k correlated with taps[k] only -> take the (k,k)
        # diagonal and sum within each group.
        corr = _gather_corr(up, taps, axis, stride=1, dilation=dilation,
                            split_channels=True)
        b, _, h, w = corr.shape
        out = jnp.einsum("bgkkhw->bghw", corr.reshape(b, ch_out, k, k, h, w))
    else:
        raise ValueError(f"unknown backend {backend!r}")

    if out_len is not None:
        out = lax.slice_in_dim(out, 0, out_len, axis=axis)
    return out


# ---------------------------------------------------------------------------
# Gather backend (oracle)
# ---------------------------------------------------------------------------

def _gather_corr(xp, taps, axis, *, stride, dilation, split_channels):
    """Valid correlation via window gather + tensordot.  ``xp`` is already
    padded; ``taps`` is (K, hlen) pre-reversed."""
    k, hlen = taps.shape
    ax = axis % xp.ndim
    n_pad = xp.shape[ax]
    span = (hlen - 1) * dilation
    n_out = (n_pad - span - 1) // stride + 1
    idx = (stride * np.arange(n_out)[:, None] + dilation * np.arange(hlen)[None, :])
    win = jnp.take(xp, jnp.asarray(idx.reshape(-1)), axis=ax)
    new_shape = xp.shape[:ax] + (n_out, hlen) + xp.shape[ax + 1 :]
    win = win.reshape(new_shape)
    t = jnp.asarray(taps.T, dtype=_accum_dtype(xp.dtype))  # (hlen, K)
    out = jnp.tensordot(win.astype(_accum_dtype(xp.dtype)), t,
                        axes=[[ax + 1], [0]])
    # out shape: xp.shape[:ax] + (n_out,) + xp.shape[ax+1:] + (K,)
    out = jnp.moveaxis(out, -1, 2)  # (B, C, K, ...) -> then merge C*K
    b, c, kk = out.shape[0], out.shape[1], out.shape[2]
    out = out.reshape((b, c * kk) + out.shape[3:])
    return out.astype(xp.dtype)
