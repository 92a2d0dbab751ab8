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
