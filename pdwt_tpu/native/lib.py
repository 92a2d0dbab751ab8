"""ctypes wrapper over libpdwt_cpu[d].so with numpy in/out.

Mirrors the functional core API (multi-level 2D/1D DWT/SWT forward and
inverse) on numpy arrays, returning the same ``Coeffs1D``/``Coeffs2D``
pytrees so tests can diff the native oracle against the JAX engines
leaf-for-leaf.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from ..core.separable import Coeffs1D, Coeffs2D
from ..core.separable3d import Coeffs3D
from ..core.shapes import coeff_shapes_1d, coeff_shapes_2d, coeff_shapes_3d
from ..filters import Wavelet

_CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "cpp",
)
# Two builds of the same engine, float and double arrays — mirroring the
# reference's dual-precision libraries (reference: Makefile:23-39
# libpdwt.so / libpdwtd.so).  Filter taps are double in both.
_SO_NAMES = {np.dtype(np.float32): "libpdwt_cpu.so",
             np.dtype(np.float64): "libpdwt_cpud.so"}

_libs: dict = {}

_c_float_p = ctypes.POINTER(ctypes.c_float)
_c_double_p = ctypes.POINTER(ctypes.c_double)

# The active array dtype for the module-level API (set_dtype switches).
_DTYPE = np.dtype(np.float32)


def set_dtype(dtype) -> None:
    """Select the native array precision (np.float32 or np.float64) —
    the runtime form of the reference's compile-time DOUBLEPRECISION
    switch (reference: src/filters.h:16-30)."""
    global _DTYPE
    dt = np.dtype(dtype)
    if dt not in _SO_NAMES:
        raise ValueError(f"native engine supports float32/float64, got {dt}")
    _DTYPE = dt


def get_dtype():
    return _DTYPE


def build(force: bool = False, dtype=None) -> str:
    """Build the native library with make if missing or stale."""
    dt = np.dtype(dtype) if dtype is not None else _DTYPE
    name = _SO_NAMES[dt]
    so = os.path.join(_CPP_DIR, name)
    src = os.path.join(_CPP_DIR, "pdwt_cpu.cpp")
    if force or not os.path.exists(so) or (
        os.path.getmtime(so) < os.path.getmtime(src)
    ):
        subprocess.run(["make", name], cwd=_CPP_DIR, check=True,
                       capture_output=True)
    return so


def _load() -> ctypes.CDLL:
    lib = _libs.get(_DTYPE)
    if lib is None:
        lib = ctypes.CDLL(build())
        lib.pdwt_forward2d.restype = ctypes.c_int
        lib.pdwt_inverse2d.restype = ctypes.c_int
        lib.pdwt_forward1d.restype = ctypes.c_int
        lib.pdwt_inverse1d.restype = ctypes.c_int
        lib.pdwt_forward3d.restype = ctypes.c_int
        lib.pdwt_inverse3d.restype = ctypes.c_int
        lib.pdwt_norm1.restype = ctypes.c_double
        lib.pdwt_norm2sq.restype = ctypes.c_double
        lib.pdwt_norm_l21.restype = ctypes.c_double
        _libs[_DTYPE] = lib
    return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _real_p():
    return _c_double_p if _DTYPE == np.float64 else _c_float_p


def _c_real(v: float):
    return (ctypes.c_double(v) if _DTYPE == np.float64
            else ctypes.c_float(v))


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(_real_p())


def _dptr(a: np.ndarray) -> _c_double_p:
    return a.ctypes.data_as(_c_double_p)


def _ptr_array(arrs) -> ctypes.Array:
    return (_real_p() * len(arrs))(*[_fptr(a) for a in arrs])


def dwt2d(img: np.ndarray, wav: Wavelet, levels: int, *,
          swt: bool = False) -> Coeffs2D:
    lib = _load()
    img = np.ascontiguousarray(img, dtype=_DTYPE)
    nr, nc = img.shape
    a_shape, det_shapes = coeff_shapes_2d(nr, nc, levels, swt)
    bufs = [np.empty(a_shape, _DTYPE)]
    for s in det_shapes:
        bufs.extend(np.empty(s, _DTYPE) for _ in range(3))
    rc = lib.pdwt_forward2d(
        _fptr(img), nr, nc, _dptr(wav.dec_lo), _dptr(wav.dec_hi),
        wav.hlen, levels, int(swt), _ptr_array(bufs))
    if rc:
        raise RuntimeError(f"pdwt_forward2d failed ({rc})")
    details = tuple(
        (bufs[3 * i + 1], bufs[3 * i + 2], bufs[3 * i + 3])
        for i in range(levels)
    )
    return Coeffs2D(bufs[0], details)


def idwt2d(coeffs: Coeffs2D, wav: Wavelet, shape: Tuple[int, int], *,
           swt: bool = False) -> np.ndarray:
    lib = _load()
    nr, nc = shape
    levels = coeffs.levels
    bufs = [np.ascontiguousarray(coeffs.approx, _DTYPE)]
    for det in coeffs.details:
        bufs.extend(np.ascontiguousarray(b, _DTYPE) for b in det)
    out = np.empty((nr, nc), _DTYPE)
    rc = lib.pdwt_inverse2d(
        _ptr_array(bufs), nr, nc, _dptr(wav.rec_lo), _dptr(wav.rec_hi),
        wav.hlen, levels, int(swt), _fptr(out))
    if rc:
        raise RuntimeError(f"pdwt_inverse2d failed ({rc})")
    return out


def dwt1d(x: np.ndarray, wav: Wavelet, levels: int, *,
          swt: bool = False) -> Coeffs1D:
    lib = _load()
    x = np.ascontiguousarray(np.atleast_2d(x), dtype=_DTYPE)
    batch, n = x.shape
    a_len, det_lens = coeff_shapes_1d(n, levels, swt)
    bufs = [np.empty((batch, a_len), _DTYPE)]
    bufs.extend(np.empty((batch, m), _DTYPE) for m in det_lens)
    rc = lib.pdwt_forward1d(
        _fptr(x), batch, n, _dptr(wav.dec_lo), _dptr(wav.dec_hi),
        wav.hlen, levels, int(swt), _ptr_array(bufs))
    if rc:
        raise RuntimeError(f"pdwt_forward1d failed ({rc})")
    return Coeffs1D(bufs[0], tuple(bufs[1:]))


def idwt1d(coeffs: Coeffs1D, wav: Wavelet, length: int, *,
           swt: bool = False) -> np.ndarray:
    lib = _load()
    bufs = [np.ascontiguousarray(coeffs.approx, _DTYPE)]
    bufs.extend(np.ascontiguousarray(d, _DTYPE) for d in coeffs.details)
    batch = bufs[0].shape[0]
    out = np.empty((batch, length), _DTYPE)
    rc = lib.pdwt_inverse1d(
        _ptr_array(bufs), batch, length, _dptr(wav.rec_lo),
        _dptr(wav.rec_hi), wav.hlen, coeffs.levels, int(swt), _fptr(out))
    if rc:
        raise RuntimeError(f"pdwt_inverse1d failed ({rc})")
    return out


def dwt3d(vol: np.ndarray, wav: Wavelet, levels: int, *,
          swt: bool = False) -> Coeffs3D:
    """3D separable transform (no reference counterpart — its README
    lists 3D as the first limitation)."""
    lib = _load()
    vol = np.ascontiguousarray(vol, dtype=_DTYPE)
    nd, nr, nc = vol.shape
    a_shape, det_shapes = coeff_shapes_3d(nd, nr, nc, levels, swt)
    bufs = [np.empty(a_shape, _DTYPE)]
    for s in det_shapes:
        bufs.extend(np.empty(s, _DTYPE) for _ in range(7))
    rc = lib.pdwt_forward3d(
        _fptr(vol), nd, nr, nc, _dptr(wav.dec_lo), _dptr(wav.dec_hi),
        wav.hlen, levels, int(swt), _ptr_array(bufs))
    if rc:
        raise RuntimeError(f"pdwt_forward3d failed ({rc})")
    details = tuple(
        tuple(bufs[7 * i + 1 + j] for j in range(7)) for i in range(levels)
    )
    return Coeffs3D(bufs[0], details)


def idwt3d(coeffs: Coeffs3D, wav: Wavelet, shape, *,
           swt: bool = False) -> np.ndarray:
    lib = _load()
    nd, nr, nc = shape
    bufs = [np.ascontiguousarray(coeffs.approx, _DTYPE)]
    for bands in coeffs.details:
        bufs.extend(np.ascontiguousarray(b, _DTYPE) for b in bands)
    out = np.empty((nd, nr, nc), _DTYPE)
    rc = lib.pdwt_inverse3d(
        _ptr_array(bufs), nd, nr, nc, _dptr(wav.rec_lo), _dptr(wav.rec_hi),
        wav.hlen, coeffs.levels, int(swt), _fptr(out))
    if rc:
        raise RuntimeError(f"pdwt_inverse3d failed ({rc})")
    return out


def soft_threshold(x: np.ndarray, beta: float) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, _DTYPE).copy()
    lib.pdwt_soft_threshold(_fptr(x), ctypes.c_long(x.size),
                            _c_real(beta))
    return x


def garrote_threshold(x: np.ndarray, beta: float) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, _DTYPE).copy()
    lib.pdwt_garrote_threshold(_fptr(x), ctypes.c_long(x.size),
                               _c_real(beta))
    return x


def firm_threshold(x: np.ndarray, beta: float, beta2: float) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, _DTYPE).copy()
    lib.pdwt_firm_threshold(_fptr(x), ctypes.c_long(x.size),
                            _c_real(beta), _c_real(beta2))
    return x


def norm1(x: np.ndarray) -> float:
    lib = _load()
    x = np.ascontiguousarray(x, _DTYPE)
    return float(lib.pdwt_norm1(_fptr(x), ctypes.c_long(x.size)))


def norm2sq(x: np.ndarray) -> float:
    lib = _load()
    x = np.ascontiguousarray(x, _DTYPE)
    return float(lib.pdwt_norm2sq(_fptr(x), ctypes.c_long(x.size)))


def norm_l21(h, v, d, a=None) -> float:
    """Group-lasso (L2,1) norm over (h, v, d[, a]) — the grouping of
    group_soft_threshold."""
    lib = _load()
    h = np.ascontiguousarray(h, _DTYPE)
    v = np.ascontiguousarray(v, _DTYPE)
    d = np.ascontiguousarray(d, _DTYPE)
    ap = None
    if a is not None:
        a = np.ascontiguousarray(a, _DTYPE)
        ap = _fptr(a)
    return float(lib.pdwt_norm_l21(_fptr(h), _fptr(v), _fptr(d), ap,
                                   ctypes.c_long(h.size)))


def dwt2d_ns(img: np.ndarray, quads: np.ndarray, levels: int, *,
             swt: bool = False) -> Coeffs2D:
    """Non-separable 2D forward with true-2D quads (4, hlen, hlen)."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=_DTYPE)
    q = np.ascontiguousarray(quads, dtype=np.float64)
    hlen = q.shape[-1]
    nr, nc = img.shape
    a_shape, det_shapes = coeff_shapes_2d(nr, nc, levels, swt)
    bufs = [np.empty(a_shape, _DTYPE)]
    for s in det_shapes:
        bufs.extend(np.empty(s, _DTYPE) for _ in range(3))
    rc = lib.pdwt_forward2d_ns(_fptr(img), nr, nc, _dptr(q), hlen, levels,
                               int(swt), _ptr_array(bufs))
    if rc:
        raise RuntimeError(f"pdwt_forward2d_ns failed ({rc})")
    details = tuple(
        (bufs[3 * i + 1], bufs[3 * i + 2], bufs[3 * i + 3])
        for i in range(levels)
    )
    return Coeffs2D(bufs[0], details)


def idwt2d_ns(coeffs: Coeffs2D, quads_inv: np.ndarray,
              shape: Tuple[int, int], *, swt: bool = False) -> np.ndarray:
    lib = _load()
    q = np.ascontiguousarray(quads_inv, dtype=np.float64)
    hlen = q.shape[-1]
    nr, nc = shape
    bufs = [np.ascontiguousarray(coeffs.approx, _DTYPE)]
    for det in coeffs.details:
        bufs.extend(np.ascontiguousarray(b, _DTYPE) for b in det)
    out = np.empty((nr, nc), _DTYPE)
    rc = lib.pdwt_inverse2d_ns(_ptr_array(bufs), nr, nc, _dptr(q), hlen,
                               coeffs.levels, int(swt), _fptr(out))
    if rc:
        raise RuntimeError(f"pdwt_inverse2d_ns failed ({rc})")
    return out


def shrink(x: np.ndarray, beta: float) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, _DTYPE).copy()
    lib.pdwt_shrink(_fptr(x), ctypes.c_long(x.size), _c_real(beta))
    return x


def group_soft_threshold(h, v, d, beta: float, a=None):
    """Group-lasso shrink over (h, v, d[, a]); returns new arrays."""
    lib = _load()
    h = np.ascontiguousarray(h, _DTYPE).copy()
    v = np.ascontiguousarray(v, _DTYPE).copy()
    d = np.ascontiguousarray(d, _DTYPE).copy()
    ap = None
    if a is not None:
        a = np.ascontiguousarray(a, _DTYPE).copy()
        ap = _fptr(a)
    lib.pdwt_group_soft_threshold(_fptr(h), _fptr(v), _fptr(d), ap,
                                  ctypes.c_long(h.size), _c_real(beta))
    return (h, v, d) if a is None else (h, v, d, a)


def axpy(y: np.ndarray, x: np.ndarray, alpha: float) -> np.ndarray:
    lib = _load()
    y = np.ascontiguousarray(y, _DTYPE).copy()
    x = np.ascontiguousarray(x, _DTYPE)
    lib.pdwt_axpy(_fptr(y), _fptr(x), ctypes.c_long(y.size),
                  _c_real(alpha))
    return y
