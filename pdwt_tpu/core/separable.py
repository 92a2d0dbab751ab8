"""Separable multi-level DWT / SWT, forward and inverse.

Functional equivalents of the reference separable engines
(reference: src/separable.cu):

* ``dwt2d`` / ``idwt2d``   — w_forward_separable / w_inverse_separable
  (reference: src/separable.cu:179-209, 332-364)
* ``dwt1d`` / ``idwt1d``   — the batched-1D variants (src/separable.cu:214-236,
  368-395); any leading dimensions act as the batch
* ``swt2d`` / ``iswt2d``   — w_forward_swt_separable / w_inverse_swt_separable
  (src/separable.cu:496-537, 629-672)
* ``swt1d`` / ``iswt1d``

Coefficient layout mirrors the reference buffer layout
``[A_n, (H1,V1,D1), ..., (Hn,Vn,Dn)]`` / ``[A_n, D1..Dn]``
(reference: src/common.cu:399-445) as a JAX pytree:
``Coeffs2D(approx, details)`` with ``details[i] = (H,V,D)`` for level i+1.

Subband convention: H = highpass along rows (y), V = highpass along
columns (x), matching the reference separable engine
(reference: src/separable.cu:155-169: pass2 applies L/H vertically to the
horizontally-lowpassed temp for A/H).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..filters import Wavelet
from . import conv
from .shapes import div2, level_sizes


class Coeffs2D(NamedTuple):
    approx: jnp.ndarray
    details: Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], ...]

    @property
    def levels(self) -> int:
        return len(self.details)


class Coeffs1D(NamedTuple):
    approx: jnp.ndarray
    details: Tuple[jnp.ndarray, ...]

    @property
    def levels(self) -> int:
        return len(self.details)


def _to_nchw(x: jnp.ndarray, ndim_spatial: int):
    """(..., H, W) or (..., N) -> (B, 1, H, W); returns (arr, batch_shape)."""
    if ndim_spatial == 2:
        if x.ndim < 2:
            raise ValueError(f"expected at least 2D input, got shape {x.shape}")
        batch = x.shape[:-2]
        h, w = x.shape[-2:]
        return x.reshape((int(np.prod(batch, dtype=np.int64)), 1, h, w)), batch
    else:
        if x.ndim < 1:
            raise ValueError("expected at least 1D input")
        batch = x.shape[:-1]
        n = x.shape[-1]
        # batched-1D: fold the batch into H so one conv handles all rows,
        # the TPU analogue of the reference's rows-as-batch kernels
        # (reference: src/separable.cu:213-236).
        return x.reshape((1, 1, int(np.prod(batch, dtype=np.int64)), n)), batch


def _from_nchw(x: jnp.ndarray, batch, ndim_spatial: int):
    if ndim_spatial == 2:
        return x.reshape(batch + x.shape[-2:])
    return x.reshape(batch + x.shape[-1:])


# ---------------------------------------------------------------------------
# 2D decimated
# ---------------------------------------------------------------------------

def _ftup(f):
    return tuple(float(v) for v in f)


def _auto_backend(backend: Optional[str], pad_fn) -> Optional[str]:
    """Resolve ``backend=None``: the PDWT_TPU_BACKEND env var /
    conv.set_default_backend override wins; otherwise the fused Pallas
    level kernels on TPU.  Distributed calls (pad_fn given) stay on the
    conv backends unless explicitly asked for pallas — the sharded
    engine has its own pallas composition (parallel/sharded.py)."""
    import jax

    if backend is not None:
        return backend
    override = conv._default_backend
    if override is not None:
        # "pallas" with a pad_fn cannot be honored here; fall through to
        # the conv backends (get_default_backend maps it to "fma").
        if override == "pallas" and pad_fn is not None:
            return None
        return override
    if pad_fn is None and jax.default_backend() == "tpu":
        return "pallas"
    return None



def _dwt2d_pallas(x: jnp.ndarray, wav: Wavelet, levels: int) -> Coeffs2D:
    """Per-level fused Pallas kernels; falls back to the (bit-identical)
    fma backend for geometries the kernels don't support."""
    from .. import kernels

    if x.ndim < 2:
        raise ValueError(f"expected at least 2D input, got {x.shape}")
    batch = x.shape[:-2]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    a = x.reshape((b,) + x.shape[-2:])
    dec = (wav.dec_lo, wav.dec_hi)
    details = []
    for _ in range(levels):
        # odd sizes: virtual extension (reference: src/separable.cu:116-121)
        # applied up front so the fused kernel sees even sizes.
        ae = conv.odd_extend(conv.odd_extend(a, -1), -2)
        res = kernels.fwd_level_2d_ad(ae, _ftup(wav.dec_lo), _ftup(wav.dec_hi))
        if res is None:
            z = conv.analysis_pass(a[:, None], dec, axis=-1, backend="fma")
            z = conv.analysis_pass(z, dec, axis=-2, backend="fma")
            a, h, v, d = z[:, 0], z[:, 1], z[:, 2], z[:, 3]
        else:
            a, h, v, d = res
        details.append(tuple(t.reshape(batch + t.shape[1:])
                             for t in (h, v, d)))
    return Coeffs2D(a.reshape(batch + a.shape[1:]), tuple(details))


def _idwt2d_pallas(coeffs: Coeffs2D, wav: Wavelet,
                   shape: Tuple[int, int]) -> jnp.ndarray:
    from .. import kernels

    levels = coeffs.levels
    rows = level_sizes(shape[0], levels)
    cols = level_sizes(shape[1], levels)
    rec = (wav.rec_lo, wav.rec_hi)
    batch = coeffs.approx.shape[:-2]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    flat = lambda t: t.reshape((b,) + t.shape[len(batch):])
    a = flat(coeffs.approx)
    for i in range(levels - 1, -1, -1):
        h, v, d = (flat(t) for t in coeffs.details[i])
        y = kernels.inv_level_2d_ad(a, h, v, d, _ftup(wav.rec_lo), _ftup(wav.rec_hi))
        if y is None:
            z = jnp.concatenate([t[:, None] for t in (a, h, v, d)], axis=1)
            t2 = conv.synthesis_pass(z, rec, axis=-2, out_len=rows[i],
                                     backend="fma")
            y = conv.synthesis_pass(t2, rec, axis=-1, out_len=cols[i],
                                    backend="fma")[:, 0]
        else:
            y = y[:, :rows[i], :cols[i]]
        a = y
    return a.reshape(batch + a.shape[1:])


def dwt2d(x: jnp.ndarray, wav: Wavelet, levels: int, *,
          backend: Optional[str] = None, pad_fn=None) -> Coeffs2D:
    """Multi-level separable 2D DWT over the trailing two axes."""
    backend = _auto_backend(backend, pad_fn)
    if backend == "pallas":
        if pad_fn is not None:
            raise ValueError("pallas backend does not support pad_fn")
        return _dwt2d_pallas(x, wav, levels)
    arr, batch = _to_nchw(x, 2)
    dec = (wav.dec_lo, wav.dec_hi)
    details: List[Tuple[jnp.ndarray, ...]] = []
    a = arr
    for _ in range(levels):
        t = conv.analysis_pass(a, dec, axis=-1, backend=backend, pad_fn=pad_fn)
        z = conv.analysis_pass(t, dec, axis=-2, backend=backend, pad_fn=pad_fn)
        a = z[:, 0:1]
        details.append(tuple(
            _from_nchw(z[:, k:k + 1], batch, 2) for k in (1, 2, 3)
        ))
    return Coeffs2D(_from_nchw(a, batch, 2), tuple(details))


def idwt2d(coeffs: Coeffs2D, wav: Wavelet, shape: Tuple[int, int], *,
           backend: Optional[str] = None, pad_fn=None) -> jnp.ndarray:
    """Inverse of :func:`dwt2d`; ``shape`` = (Nr, Nc) of the original image."""
    backend = _auto_backend(backend, pad_fn)
    if backend == "pallas":
        if pad_fn is not None:
            raise ValueError("pallas backend does not support pad_fn")
        return _idwt2d_pallas(coeffs, wav, shape)
    levels = coeffs.levels
    rows = level_sizes(shape[0], levels)
    cols = level_sizes(shape[1], levels)
    rec = (wav.rec_lo, wav.rec_hi)
    a, batch = _to_nchw(coeffs.approx, 2)
    for i in range(levels - 1, -1, -1):
        h, v, d = (_to_nchw(c, 2)[0] for c in coeffs.details[i])
        z = jnp.concatenate([a, h, v, d], axis=1)  # (B,4,mr,mc)
        t = conv.synthesis_pass(z, rec, axis=-2, out_len=rows[i],
                                backend=backend, pad_fn=pad_fn)  # (B,2,Hr,mc)
        a = conv.synthesis_pass(t, rec, axis=-1, out_len=cols[i],
                                backend=backend, pad_fn=pad_fn)  # (B,1,Hr,Wc)
    return _from_nchw(a, batch, 2)


# ---------------------------------------------------------------------------
# 2D stationary (a-trous)
# ---------------------------------------------------------------------------

def _swt2d_pallas(x: jnp.ndarray, wav: Wavelet, levels: int) -> Coeffs2D:
    from .. import kernels

    batch = x.shape[:-2]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    a = x.reshape((b,) + x.shape[-2:])
    dec = (wav.dec_lo, wav.dec_hi)
    details = []
    for lvl in range(1, levels + 1):
        res = kernels.swt_fwd_level_2d_ad(a, _ftup(wav.dec_lo), _ftup(wav.dec_hi), lvl)
        if res is None:
            f = 1 << (lvl - 1)
            z = conv.analysis_pass(a[:, None], dec, axis=-1, dilation=f,
                                   decimate=False, backend="fma")
            z = conv.analysis_pass(z, dec, axis=-2, dilation=f,
                                   decimate=False, backend="fma")
            a, h, v, d = z[:, 0], z[:, 1], z[:, 2], z[:, 3]
        else:
            a, h, v, d = res
        details.append(tuple(t.reshape(batch + t.shape[1:])
                             for t in (h, v, d)))
    return Coeffs2D(a.reshape(batch + a.shape[1:]), tuple(details))


def swt2d(x: jnp.ndarray, wav: Wavelet, levels: int, *,
          backend: Optional[str] = None, pad_fn=None) -> Coeffs2D:
    backend = _auto_backend(backend, pad_fn)
    if backend == "pallas":
        if pad_fn is not None:
            raise ValueError("pallas backend does not support pad_fn")
        return _swt2d_pallas(x, wav, levels)
    arr, batch = _to_nchw(x, 2)
    dec = (wav.dec_lo, wav.dec_hi)
    details: List[Tuple[jnp.ndarray, ...]] = []
    a = arr
    for lvl in range(1, levels + 1):
        f = 1 << (lvl - 1)
        t = conv.analysis_pass(a, dec, axis=-1, dilation=f, decimate=False,
                               backend=backend, pad_fn=pad_fn)
        z = conv.analysis_pass(t, dec, axis=-2, dilation=f, decimate=False,
                               backend=backend, pad_fn=pad_fn)
        a = z[:, 0:1]
        details.append(tuple(
            _from_nchw(z[:, k:k + 1], batch, 2) for k in (1, 2, 3)
        ))
    return Coeffs2D(_from_nchw(a, batch, 2), tuple(details))


def _iswt2d_pallas(coeffs: Coeffs2D, wav: Wavelet) -> jnp.ndarray:
    from .. import kernels

    rec = (wav.rec_lo * 0.5, wav.rec_hi * 0.5)
    batch = coeffs.approx.shape[:-2]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    flat = lambda t: t.reshape((b,) + t.shape[len(batch):])
    a = flat(coeffs.approx)
    for i in range(coeffs.levels - 1, -1, -1):
        h, v, d = (flat(t) for t in coeffs.details[i])
        y = kernels.swt_inv_level_2d_ad(a, h, v, d, _ftup(wav.rec_lo),
                                        _ftup(wav.rec_hi), i + 1)
        if y is None:
            f = 1 << i
            z = jnp.concatenate([t[:, None] for t in (a, h, v, d)], axis=1)
            t2 = conv.synthesis_pass(z, rec, axis=-2, dilation=f,
                                     decimated=False, backend="fma")
            y = conv.synthesis_pass(t2, rec, axis=-1, dilation=f,
                                    decimated=False, backend="fma")[:, 0]
        a = y
    return a.reshape(batch + a.shape[1:])


def iswt2d(coeffs: Coeffs2D, wav: Wavelet, *,
           backend: Optional[str] = None, pad_fn=None) -> jnp.ndarray:
    backend = _auto_backend(backend, pad_fn)
    if backend == "pallas":
        if pad_fn is not None:
            raise ValueError("pallas backend does not support pad_fn")
        return _iswt2d_pallas(coeffs, wav)
    # Each separable synthesis pass halves the taps
    # (reference: src/separable.cu:581-584,621-622).
    rec = (wav.rec_lo * 0.5, wav.rec_hi * 0.5)
    a, batch = _to_nchw(coeffs.approx, 2)
    for i in range(coeffs.levels - 1, -1, -1):
        f = 1 << i
        h, v, d = (_to_nchw(c, 2)[0] for c in coeffs.details[i])
        z = jnp.concatenate([a, h, v, d], axis=1)
        t = conv.synthesis_pass(z, rec, axis=-2, dilation=f, decimated=False,
                                backend=backend, pad_fn=pad_fn)
        a = conv.synthesis_pass(t, rec, axis=-1, dilation=f, decimated=False,
                                backend=backend, pad_fn=pad_fn)
    return _from_nchw(a, batch, 2)


# ---------------------------------------------------------------------------
# 1D (batched over leading dims)
# ---------------------------------------------------------------------------

def _dwt1d_pallas(x: jnp.ndarray, wav: Wavelet, levels: int) -> Coeffs1D:
    from .. import kernels

    batch = x.shape[:-1]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    a = x.reshape(b, x.shape[-1])
    dec = (wav.dec_lo, wav.dec_hi)
    details = []
    for _ in range(levels):
        ae = conv.odd_extend(a, -1)
        res = kernels.fwd_level_1d_ad(ae, _ftup(wav.dec_lo), _ftup(wav.dec_hi))
        if res is None:
            z = conv.analysis_pass(a[:, None, None], dec, axis=-1,
                                   backend="fma")
            a, d = z[:, 0, 0], z[:, 1, 0]
        else:
            a, d = res
        details.append(d.reshape(batch + d.shape[1:]))
    return Coeffs1D(a.reshape(batch + a.shape[1:]), tuple(details))


def dwt1d(x: jnp.ndarray, wav: Wavelet, levels: int, *,
          backend: Optional[str] = None, pad_fn=None) -> Coeffs1D:
    backend = _auto_backend(backend, pad_fn)
    if backend == "pallas":
        if pad_fn is not None:
            raise ValueError("pallas backend does not support pad_fn")
        return _dwt1d_pallas(x, wav, levels)
    arr, batch = _to_nchw(x, 1)
    dec = (wav.dec_lo, wav.dec_hi)
    details: List[jnp.ndarray] = []
    a = arr
    for _ in range(levels):
        z = conv.analysis_pass(a, dec, axis=-1, backend=backend, pad_fn=pad_fn)
        a = z[:, 0:1]
        details.append(_from_nchw(z[:, 1:2], batch, 1))
    return Coeffs1D(_from_nchw(a, batch, 1), tuple(details))


def _idwt1d_pallas(coeffs: Coeffs1D, wav: Wavelet, length: int) -> jnp.ndarray:
    from .. import kernels

    levels = coeffs.levels
    sizes = level_sizes(length, levels)
    rec = (wav.rec_lo, wav.rec_hi)
    batch = coeffs.approx.shape[:-1]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    flat = lambda t: t.reshape(b, t.shape[-1])
    a = flat(coeffs.approx)
    for i in range(levels - 1, -1, -1):
        d = flat(coeffs.details[i])
        y = kernels.inv_level_1d_ad(a, d, _ftup(wav.rec_lo), _ftup(wav.rec_hi))
        if y is None:
            z = jnp.concatenate([a[:, None, None], d[:, None, None]], axis=1)
            y = conv.synthesis_pass(z, rec, axis=-1, out_len=sizes[i],
                                    backend="fma")[:, 0, 0]
        else:
            y = y[:, :sizes[i]]
        a = y
    return a.reshape(batch + a.shape[1:])


def idwt1d(coeffs: Coeffs1D, wav: Wavelet, length: int, *,
           backend: Optional[str] = None, pad_fn=None) -> jnp.ndarray:
    backend = _auto_backend(backend, pad_fn)
    if backend == "pallas":
        if pad_fn is not None:
            raise ValueError("pallas backend does not support pad_fn")
        return _idwt1d_pallas(coeffs, wav, length)
    levels = coeffs.levels
    sizes = level_sizes(length, levels)
    rec = (wav.rec_lo, wav.rec_hi)
    a, batch = _to_nchw(coeffs.approx, 1)
    for i in range(levels - 1, -1, -1):
        d, _ = _to_nchw(coeffs.details[i], 1)
        z = jnp.concatenate([a, d], axis=1)
        a = conv.synthesis_pass(z, rec, axis=-1, out_len=sizes[i],
                                backend=backend, pad_fn=pad_fn)
    return _from_nchw(a, batch, 1)


def _swt1d_pallas(x: jnp.ndarray, wav: Wavelet, levels: int) -> Coeffs1D:
    from .. import kernels

    batch = x.shape[:-1]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    a = x.reshape(b, x.shape[-1])
    dec = (wav.dec_lo, wav.dec_hi)
    details = []
    for lvl in range(1, levels + 1):
        res = kernels.swt_fwd_level_1d_ad(a, _ftup(wav.dec_lo), _ftup(wav.dec_hi), lvl)
        if res is None:
            f = 1 << (lvl - 1)
            z = conv.analysis_pass(a[:, None, None], dec, axis=-1,
                                   dilation=f, decimate=False, backend="fma")
            a, d = z[:, 0, 0], z[:, 1, 0]
        else:
            a, d = res
        details.append(d.reshape(batch + d.shape[1:]))
    return Coeffs1D(a.reshape(batch + a.shape[1:]), tuple(details))


def swt1d(x: jnp.ndarray, wav: Wavelet, levels: int, *,
          backend: Optional[str] = None, pad_fn=None) -> Coeffs1D:
    backend = _auto_backend(backend, pad_fn)
    if backend == "pallas":
        if pad_fn is not None:
            raise ValueError("pallas backend does not support pad_fn")
        return _swt1d_pallas(x, wav, levels)
    arr, batch = _to_nchw(x, 1)
    dec = (wav.dec_lo, wav.dec_hi)
    details: List[jnp.ndarray] = []
    a = arr
    for lvl in range(1, levels + 1):
        f = 1 << (lvl - 1)
        z = conv.analysis_pass(a, dec, axis=-1, dilation=f, decimate=False,
                               backend=backend, pad_fn=pad_fn)
        a = z[:, 0:1]
        details.append(_from_nchw(z[:, 1:2], batch, 1))
    return Coeffs1D(_from_nchw(a, batch, 1), tuple(details))


def _iswt1d_pallas(coeffs: Coeffs1D, wav: Wavelet) -> jnp.ndarray:
    from .. import kernels

    rec = (wav.rec_lo * 0.5, wav.rec_hi * 0.5)
    batch = coeffs.approx.shape[:-1]
    b = int(np.prod(batch, dtype=np.int64)) if batch else 1
    flat = lambda t: t.reshape(b, t.shape[-1])
    a = flat(coeffs.approx)
    for i in range(coeffs.levels - 1, -1, -1):
        d = flat(coeffs.details[i])
        y = kernels.swt_inv_level_1d_ad(a, d, _ftup(wav.rec_lo), _ftup(wav.rec_hi), i + 1)
        if y is None:
            f = 1 << i
            z = jnp.concatenate([a[:, None, None], d[:, None, None]], axis=1)
            y = conv.synthesis_pass(z, rec, axis=-1, dilation=f,
                                    decimated=False, backend="fma")[:, 0, 0]
        a = y
    return a.reshape(batch + a.shape[1:])


def iswt1d(coeffs: Coeffs1D, wav: Wavelet, *,
           backend: Optional[str] = None, pad_fn=None) -> jnp.ndarray:
    backend = _auto_backend(backend, pad_fn)
    if backend == "pallas":
        if pad_fn is not None:
            raise ValueError("pallas backend does not support pad_fn")
        return _iswt1d_pallas(coeffs, wav)
    # Single pass in 1D -> one 1/2 factor (reference: src/separable.cu:653-672).
    rec = (wav.rec_lo * 0.5, wav.rec_hi * 0.5)
    a, batch = _to_nchw(coeffs.approx, 1)
    for i in range(coeffs.levels - 1, -1, -1):
        f = 1 << i
        d, _ = _to_nchw(coeffs.details[i], 1)
        z = jnp.concatenate([a, d], axis=1)
        a = conv.synthesis_pass(z, rec, axis=-1, dilation=f, decimated=False,
                                backend=backend, pad_fn=pad_fn)
    return _from_nchw(a, batch, 1)
