"""Container conversion to/from the PyWavelets coefficient formats.

PDWT's own TODO.txt targets PyWavelets compatibility for the filter
data ("Update filters coefficients ... to be compatible with
PyWavelets"); this module extends that to the coefficient CONTAINERS so
pipelines written against ``pywt.wavedec/wavedec2/wavedecn`` can hand
their lists straight to this framework and back:

* 1D: ``[cA_n, cD_n, ..., cD_1]``               (``pywt.wavedec``)
* 2D: ``[cA_n, (cH_n, cV_n, cD_n), ..., lvl 1]`` (``pywt.wavedec2``)
* 3D: ``[cA_n, {'add': ...}, ..., lvl 1]``       (``pywt.wavedecn``)

Convention notes.  Numerical equality with pywt holds for
``mode='periodization'`` (up to each wavelet's phase convention) AND —
since the core grew the full pywt extension-mode set (core/modes.py) —
for every non-periodization mode (``pywt.wavedec*(..., mode=
'symmetric'|'zero'|...)`` ↔ ``dwt*( ..., mode=...)``), for every
wavelet whose filter bank matches pywt's published coefficients
(verified against the pywt-algorithm oracle in tests/test_modes.py;
pywt itself is not installable in this environment).  Structure
conventions:

* pywt orders levels coarsest-first; ``Coeffs*`` pytrees are
  finest-first (``details[0]`` = level 1).
* pywt's ``cH`` is the 'da' key of ``dwtn`` — detail along axis 0
  (rows) — which is exactly this framework's H (highpass along rows,
  see core/conv.py), so the band tuples map 1:1.
* 3D keys are per-axis 'a'/'d' letters in (depth, row, col) order;
  ``DETAIL_KEYS_3D`` uses the same axis order with 'd' marking the
  highpass axis, so ``daa`` ↔ pywt key ``'daa'`` etc.
"""
from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp

from ..core.separable import Coeffs1D, Coeffs2D
from ..core.separable3d import DETAIL_KEYS_3D, Coeffs3D


def to_pywt(coeffs) -> List[Any]:
    """Convert a ``Coeffs1D/2D/3D`` pytree to the matching pywt list
    (arrays stay on device as ``jax.Array``s; ``np.asarray`` them if a
    genuine pywt call follows)."""
    if isinstance(coeffs, Coeffs1D):
        return [coeffs.approx] + [d for d in reversed(coeffs.details)]
    if isinstance(coeffs, Coeffs2D):
        return [coeffs.approx] + [tuple(lvl)
                                  for lvl in reversed(coeffs.details)]
    if isinstance(coeffs, Coeffs3D):
        return [coeffs.approx] + [
            dict(zip(DETAIL_KEYS_3D, lvl))
            for lvl in reversed(coeffs.details)]
    raise TypeError(f"expected a Coeffs pytree, got {type(coeffs)}")


def from_pywt(clist) -> Any:
    """Convert a pywt-style coefficient list back to the matching
    ``Coeffs1D/2D/3D`` pytree (inverse of :func:`to_pywt`).  The level
    kind is inferred from the first detail entry: dict → 3D, tuple/list
    → 2D, array → 1D."""
    if not isinstance(clist, (list, tuple)) or not clist:
        raise TypeError("expected a non-empty pywt coefficient list")
    approx = jnp.asarray(clist[0])
    dets = list(clist[1:])
    if not dets:
        raise ValueError("coefficient list has no detail levels")
    first = dets[0]
    if isinstance(first, dict):
        try:
            levels = tuple(
                tuple(jnp.asarray(d[k]) for k in DETAIL_KEYS_3D)
                for d in reversed(dets))
        except KeyError as e:
            raise ValueError(f"3D level dict missing key {e}") from None
        return Coeffs3D(approx, levels)
    if isinstance(first, (tuple, list)):
        for d in dets:
            if len(d) != 3:
                raise ValueError("2D levels need (cH, cV, cD) triples")
        levels = tuple(tuple(jnp.asarray(b) for b in d)
                       for d in reversed(dets))
        return Coeffs2D(approx, levels)
    return Coeffs1D(approx,
                    tuple(jnp.asarray(d) for d in reversed(dets)))


# ---------------------------------------------------------------------------
# One-call pywt-compatible API (wavedec/waverec family)
#
# Drop-in entry points with pywt's signatures, DEFAULTS (mode="symmetric"
# is pywt's default, not the reference's periodization) and container
# formats, so `import pdwt_tpu.utils.interop as pywt`-style migration
# works for the decomposition workhorses.  Transforms run over the
# trailing axes (pywt's default axes); outputs stay on device.
# ---------------------------------------------------------------------------

def _wav(wavelet):
    from ..filters import get_wavelet

    return get_wavelet(wavelet) if isinstance(wavelet, str) else wavelet


def dwt_max_level(data_len: int, filter_len) -> int:
    """pywt.dwt_max_level: floor(log2(data_len / (filter_len - 1)))."""
    from ..core.shapes import max_level

    if not isinstance(filter_len, int):
        filter_len = _wav(filter_len).hlen
    return max_level(int(data_len), filter_len)


def _levels(shape, wav, level, ndim):
    if level is None:
        level = dwt_max_level(min(shape[-ndim:]), wav.hlen)
    if level < 0:
        raise ValueError(f"level must be >= 0, got {level}")
    return level


def wavedec(data, wavelet, mode: str = "symmetric", level=None, *,
            backend=None) -> List[Any]:
    """pywt.wavedec over the trailing axis: [cA_n, cD_n, ..., cD_1]."""
    from ..core.separable import dwt1d

    data = jnp.asarray(data)
    wav = _wav(wavelet)
    level = _levels(data.shape, wav, level, 1)
    if level == 0:
        return [data]
    return to_pywt(dwt1d(data, wav, level, mode=mode, backend=backend))


def wavedec2(data, wavelet, mode: str = "symmetric", level=None, *,
             backend=None) -> List[Any]:
    """pywt.wavedec2 over the trailing two axes:
    [cA_n, (cH_n, cV_n, cD_n), ..., level 1]."""
    from ..core.separable import dwt2d

    data = jnp.asarray(data)
    wav = _wav(wavelet)
    level = _levels(data.shape, wav, level, 2)
    if level == 0:
        return [data]
    return to_pywt(dwt2d(data, wav, level, mode=mode, backend=backend))


def wavedecn(data, wavelet, mode: str = "symmetric", level=None, *,
             backend=None) -> List[Any]:
    """pywt.wavedecn for 3D volumes (trailing three axes):
    [cA_n, {'daa': ..., ..., 'ddd': ...}, ..., level 1].  For 1D/2D use
    :func:`wavedec`/:func:`wavedec2` (pywt's per-axis dict keys map to
    the tuple containers there)."""
    from ..core.separable3d import dwt3d

    data = jnp.asarray(data)
    if data.ndim < 3:
        raise ValueError("wavedecn here is the 3D entry point; use "
                         "wavedec/wavedec2 for 1D/2D")
    wav = _wav(wavelet)
    level = _levels(data.shape, wav, level, 3)
    if level == 0:
        return [data]
    return to_pywt(dwt3d(data, wav, level, mode=mode, backend=backend))


def _crop_like(a, shape, ndim):
    """pywt waverec cA/cD alignment: per trailing axis, a reconstructed
    cA may overshoot the stored cD by exactly one sample — crop it."""
    from jax import lax

    for ax in range(-ndim, 0):
        if a.shape[ax] == shape[ax] + 1:
            a = lax.slice_in_dim(a, 0, shape[ax], axis=ax)
        elif a.shape[ax] != shape[ax]:
            raise ValueError(
                f"coefficient shape mismatch on axis {ax}: approx "
                f"{a.shape[ax]} vs detail {shape[ax]} (corrupt list?)")
    return a


def waverec(coeffs, wavelet, mode: str = "symmetric", *,
            backend=None) -> jnp.ndarray:
    """pywt.waverec: inverse of :func:`wavedec`.  Output length is the
    full ``2M - F + 2`` (or ``2M`` for periodization) of the finest
    level, exactly like pywt — slice to the original length if it was
    odd."""
    from ..core.modes import rec_len
    from ..core.separable import Coeffs1D as C1
    from ..core.separable import idwt1d

    wav = _wav(wavelet)
    if len(coeffs) == 1:
        return jnp.asarray(coeffs[0])
    a = jnp.asarray(coeffs[0])
    for d in coeffs[1:]:  # coarsest -> finest
        d = jnp.asarray(d)
        a = _crop_like(a, d.shape, 1)
        a = idwt1d(C1(a, (d,)), wav,
                   rec_len(d.shape[-1], wav.hlen, mode), mode=mode,
                   backend=backend)
    return a


def waverec2(coeffs, wavelet, mode: str = "symmetric", *,
             backend=None) -> jnp.ndarray:
    """pywt.waverec2: inverse of :func:`wavedec2`."""
    from ..core.modes import rec_len
    from ..core.separable import Coeffs2D as C2
    from ..core.separable import idwt2d

    wav = _wav(wavelet)
    if len(coeffs) == 1:
        return jnp.asarray(coeffs[0])
    a = jnp.asarray(coeffs[0])
    for lvl in coeffs[1:]:
        h, v, d = (jnp.asarray(t) for t in lvl)
        a = _crop_like(a, h.shape, 2)
        shape = tuple(rec_len(n, wav.hlen, mode) for n in h.shape[-2:])
        a = idwt2d(C2(a, ((h, v, d),)), wav, shape, mode=mode,
                   backend=backend)
    return a


def waverecn(coeffs, wavelet, mode: str = "symmetric", *,
             backend=None) -> jnp.ndarray:
    """pywt.waverecn (3D): inverse of :func:`wavedecn`."""
    from ..core.modes import rec_len
    from ..core.separable3d import Coeffs3D as C3
    from ..core.separable3d import idwt3d

    wav = _wav(wavelet)
    if len(coeffs) == 1:
        return jnp.asarray(coeffs[0])
    a = jnp.asarray(coeffs[0])
    for lvl in coeffs[1:]:
        bands = tuple(jnp.asarray(lvl[k]) for k in DETAIL_KEYS_3D)
        a = _crop_like(a, bands[0].shape, 3)
        shape = tuple(rec_len(n, wav.hlen, mode)
                      for n in bands[0].shape[-3:])
        a = idwt3d(C3(a, (bands,)), wav, shape, mode=mode,
                   backend=backend)
    return a


def dwt(data, wavelet, mode: str = "symmetric", *, backend=None):
    """pywt.dwt: single-level 1D decomposition → ``(cA, cD)``."""
    cl = wavedec(data, wavelet, mode, level=1, backend=backend)
    return cl[0], cl[1]


def idwt(cA, cD, wavelet, mode: str = "symmetric", *, backend=None):
    """pywt.idwt: single-level 1D reconstruction.  Either of ``cA``/
    ``cD`` may be None (pywt semantics: the missing branch is zeros)."""
    if cA is None and cD is None:
        raise ValueError("at least one of cA/cD is required")
    if cA is None:
        cA = jnp.zeros_like(jnp.asarray(cD))
    if cD is None:
        cD = jnp.zeros_like(jnp.asarray(cA))
    return waverec([cA, cD], wavelet, mode, backend=backend)


def dwt2(data, wavelet, mode: str = "symmetric", *, backend=None):
    """pywt.dwt2: single-level 2D decomposition → ``(cA, (cH, cV, cD))``."""
    cl = wavedec2(data, wavelet, mode, level=1, backend=backend)
    return cl[0], cl[1]


def idwt2(coeffs, wavelet, mode: str = "symmetric", *, backend=None):
    """pywt.idwt2: inverse of :func:`dwt2`; ``coeffs = (cA, (cH, cV,
    cD))`` with None entries treated as zeros (pywt semantics)."""
    cA, hvd = coeffs
    bands = [None if b is None else jnp.asarray(b) for b in hvd]
    ref = next((b for b in [cA] + bands if b is not None), None)
    if ref is None:
        raise ValueError("all coefficients are None")
    ref = jnp.asarray(ref)
    if cA is None:
        cA = jnp.zeros_like(ref)
    bands = [jnp.zeros_like(ref) if b is None else b for b in bands]
    return waverec2([jnp.asarray(cA), tuple(bands)], wavelet, mode,
                    backend=backend)


def swt(data, wavelet, level: int, *, backend=None) -> List[Any]:
    """pywt.swt-shaped stationary transform: coarsest-first
    ``[(cA_n, cD_n), ..., (cA_1, cD_1)]`` pairs (the per-level
    approximation stack is the framework's ``keep_approx=True``).
    Container compatibility — coefficient values follow THIS
    framework's à-trous phase convention (core/conv.py), which may
    differ from pywt's by a per-level shift."""
    from ..core.separable import swt1d

    c, approxs = swt1d(jnp.asarray(data), _wav(wavelet), level,
                       backend=backend, keep_approx=True)
    return [(approxs[i], c.details[i]) for i in range(level - 1, -1, -1)]


def iswt(coeffs, wavelet, *, backend=None) -> jnp.ndarray:
    """Inverse of :func:`swt` (uses the deepest approximation + all
    details, like pywt.iswt)."""
    from ..core.separable import Coeffs1D, iswt1d

    details = tuple(d for _, d in reversed(coeffs))  # finest-first
    return iswt1d(Coeffs1D(jnp.asarray(coeffs[0][0]), details),
                  _wav(wavelet), backend=backend)


def swt2(data, wavelet, level: int, *, backend=None) -> List[Any]:
    """pywt.swt2-shaped 2D stationary transform: coarsest-first
    ``[(cA_i, (cH_i, cV_i, cD_i)), ...]`` (phase note: see
    :func:`swt`)."""
    from ..core.separable import swt2d

    c, approxs = swt2d(jnp.asarray(data), _wav(wavelet), level,
                       backend=backend, keep_approx=True)
    return [(approxs[i], tuple(c.details[i]))
            for i in range(level - 1, -1, -1)]


def iswt2(coeffs, wavelet, *, backend=None) -> jnp.ndarray:
    """Inverse of :func:`swt2`."""
    from ..core.separable import Coeffs2D, iswt2d

    details = tuple(tuple(jnp.asarray(b) for b in hvd)
                    for _, hvd in reversed(coeffs))
    return iswt2d(Coeffs2D(jnp.asarray(coeffs[0][0]), details),
                  _wav(wavelet), backend=backend)
