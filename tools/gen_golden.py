"""Generate tests/golden/golden.npz — vendored golden coefficients.

Breaks the oracle circularity called out in round 1: every other oracle
in the repo (tests/np_oracle.py, the fma/xla/gather backends) shares the
vectorized algebraic recasting of the reference index semantics.  This
generator instead evaluates the REFERENCE kernels' scalar index
arithmetic directly — one Python loop per output coefficient, explicit
modular wrap, float64 — transliterated from the reference formulas:

  forward analysis  (reference: src/separable.cu:91-131):
      c      = hlen//2 if hlen odd else hlen//2 - 1
      out[n] = sum_j f[hlen-1-j] * xe[(2n - c + j) mod Ne]
      (xe = x with the last element repeated when N is odd,
       reference: src/separable.cu:116-121)

  inverse synthesis (reference: src/separable.cu:246-328), recast as the
  zero-stuffed correlation at fixed shift s (see core/conv docstring):
      h2 = hlen//2; c2 = h2//2; s = 2*c2+1 if h2 odd else 2*c2
      u[2t] = a[t]; u[2t+1] = 0
      out[g] = sum_j rec[hlen-1-j] * u[(g - s + j) mod 2M]

  SWT analysis      (reference: src/separable.cu:409-493): stride 1,
      filter dilated by fct = 2^(level-1), center c*fct:
      out[n] = sum_j f[hlen-1-j] * x[(n - c*fct + j*fct) mod N]

  SWT synthesis     (reference: src/separable.cu:553-626): center
      (hlen//2)*fct, taps halved per pass:
      out[n] = sum_j 0.5*rec[hlen-1-j] * band[(n - (hlen//2)*fct + j*fct) mod N]

2D = the row pass then the column pass (separable passes commute;
reference runs columns first, src/separable.cu:196-197).  Subband
convention: H = highpass along rows.

The committed npz is the fixture; re-run this script only if the spec
itself changes (tests/test_golden.py will catch any drift).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.filters import get_wavelet  # noqa: E402


def fwd_center(hlen):
    return hlen // 2 if hlen % 2 else hlen // 2 - 1


def inv_shift(hlen):
    h2 = hlen // 2
    c2 = h2 // 2
    return 2 * c2 + 1 if h2 % 2 else 2 * c2


def analysis_1d(x, filt):
    """Decimated periodic analysis along the last axis, scalar loops."""
    x = np.asarray(x, np.float64)
    n = x.shape[-1]
    if n % 2:  # virtual extension (reference: src/separable.cu:116-121)
        x = np.concatenate([x, x[..., -1:]], axis=-1)
        n += 1
    hlen = len(filt)
    c = fwd_center(hlen)
    m = n // 2
    out = np.zeros(x.shape[:-1] + (m,), np.float64)
    for nn in range(m):
        acc = np.zeros(x.shape[:-1], np.float64)
        for j in range(hlen):
            acc += filt[hlen - 1 - j] * x[..., (2 * nn - c + j) % n]
        out[..., nn] = acc
    return out


def synthesis_1d(lo, hi, rec_lo, rec_hi, out_len):
    """Decimated periodic synthesis along the last axis, scalar loops."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    m = lo.shape[-1]
    hlen = len(rec_lo)
    s = inv_shift(hlen)
    n2 = 2 * m
    u_lo = np.zeros(lo.shape[:-1] + (n2,), np.float64)
    u_hi = np.zeros_like(u_lo)
    u_lo[..., 0::2] = lo
    u_hi[..., 0::2] = hi
    out = np.zeros(lo.shape[:-1] + (n2,), np.float64)
    for g in range(n2):
        acc = np.zeros(lo.shape[:-1], np.float64)
        for j in range(hlen):
            idx = (g - s + j) % n2
            acc += rec_lo[hlen - 1 - j] * u_lo[..., idx]
            acc += rec_hi[hlen - 1 - j] * u_hi[..., idx]
        out[..., g] = acc
    return out[..., :out_len]


def swt_analysis_1d(x, filt, level):
    x = np.asarray(x, np.float64)
    n = x.shape[-1]
    hlen = len(filt)
    f = 1 << (level - 1)
    c = fwd_center(hlen) * f
    out = np.zeros_like(x)
    for nn in range(n):
        acc = np.zeros(x.shape[:-1], np.float64)
        for j in range(hlen):
            acc += filt[hlen - 1 - j] * x[..., (nn - c + j * f) % n]
        out[..., nn] = acc
    return out


def swt_synthesis_1d(lo, hi, rec_lo, rec_hi, level):
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    n = lo.shape[-1]
    hlen = len(rec_lo)
    f = 1 << (level - 1)
    c = (hlen // 2) * f
    out = np.zeros_like(lo)
    for nn in range(n):
        acc = np.zeros(lo.shape[:-1], np.float64)
        for j in range(hlen):
            idx = (nn - c + j * f) % n
            acc += 0.5 * rec_lo[hlen - 1 - j] * lo[..., idx]
            acc += 0.5 * rec_hi[hlen - 1 - j] * hi[..., idx]
        out[..., nn] = acc
    return out


def rows(fn, x, *a, **k):
    """Apply a last-axis transform along the -2 axis."""
    return np.swapaxes(fn(np.swapaxes(x, -1, -2), *a, **k), -1, -2)


def dwt2d_level(x, lo, hi):
    tl = analysis_1d(x, lo)   # pass along the last axis (W)
    th = analysis_1d(x, hi)
    a = rows(analysis_1d, tl, lo)
    h = rows(analysis_1d, tl, hi)   # H = highpass along rows (axis -2)
    v = rows(analysis_1d, th, lo)
    d = rows(analysis_1d, th, hi)
    return a, h, v, d


def swt2d_level(x, lo, hi, level):
    tl = swt_analysis_1d(x, lo, level)
    th = swt_analysis_1d(x, hi, level)
    a = rows(swt_analysis_1d, tl, lo, level)
    h = rows(swt_analysis_1d, tl, hi, level)
    v = rows(swt_analysis_1d, th, lo, level)
    d = rows(swt_analysis_1d, th, hi, level)
    return a, h, v, d


def main():
    rng = np.random.default_rng(20260816)
    out = {}

    # --- 2D decimated, multi-level, even + odd sizes -------------------
    for wname, shape, levels in (("haar", (16, 12), 2), ("db2", (16, 12), 2),
                                 ("db7", (32, 32), 3), ("bior4.4", (32, 32), 2),
                                 ("db3", (15, 13), 2), ("sym8", (32, 32), 1)):
        w = get_wavelet(wname)
        x = rng.standard_normal(shape)
        out[f"dwt2d/{wname}/x"] = x
        a = x
        for lvl in range(1, levels + 1):
            a, h, v, d = dwt2d_level(a, w.dec_lo, w.dec_hi)
            out[f"dwt2d/{wname}/L{lvl}/h"] = h
            out[f"dwt2d/{wname}/L{lvl}/v"] = v
            out[f"dwt2d/{wname}/L{lvl}/d"] = d
        out[f"dwt2d/{wname}/a"] = a
        out[f"dwt2d/{wname}/levels"] = np.int64(levels)

    # --- 2D inverse from random coefficients ---------------------------
    for wname, m in (("db7", 16), ("bior4.4", 12), ("haar", 8)):
        w = get_wavelet(wname)
        a, h, v, d = (rng.standard_normal((m, m)) for _ in range(4))
        # rows pass combines (a,h) and (v,d); W pass combines the temps
        t1 = synthesis_1d(a.T, h.T, w.rec_lo, w.rec_hi, 2 * m).T
        t2 = synthesis_1d(v.T, d.T, w.rec_lo, w.rec_hi, 2 * m).T
        y = synthesis_1d(t1, t2, w.rec_lo, w.rec_hi, 2 * m)
        for k, arr in (("a", a), ("h", h), ("v", v), ("d", d), ("y", y)):
            out[f"idwt2d/{wname}/{k}"] = arr

    # --- 2D SWT, 2 levels ----------------------------------------------
    for wname in ("db4", "haar"):
        w = get_wavelet(wname)
        x = rng.standard_normal((16, 16))
        out[f"swt2d/{wname}/x"] = x
        a = x
        for lvl in (1, 2):
            a, h, v, d = swt2d_level(a, w.dec_lo, w.dec_hi, lvl)
            out[f"swt2d/{wname}/L{lvl}/h"] = h
            out[f"swt2d/{wname}/L{lvl}/v"] = v
            out[f"swt2d/{wname}/L{lvl}/d"] = d
        out[f"swt2d/{wname}/a"] = a

    # --- 2D iSWT level-1 from random coefficients -----------------------
    w = get_wavelet("db4")
    a, h, v, d = (rng.standard_normal((16, 16)) for _ in range(4))
    t1 = swt_synthesis_1d(a.T, h.T, w.rec_lo, w.rec_hi, 1).T
    t2 = swt_synthesis_1d(v.T, d.T, w.rec_lo, w.rec_hi, 1).T
    y = swt_synthesis_1d(t1, t2, w.rec_lo, w.rec_hi, 1)
    for k, arr in (("a", a), ("h", h), ("v", v), ("d", d), ("y", y)):
        out[f"iswt2d/db4/{k}"] = arr

    # --- batched 1D ------------------------------------------------------
    for wname, n, levels in (("sym4", 32, 2), ("db2", 24, 2), ("db5", 31, 1)):
        w = get_wavelet(wname)
        x = rng.standard_normal((3, n))
        out[f"dwt1d/{wname}/x"] = x
        a = x
        for lvl in range(1, levels + 1):
            d = analysis_1d(a, w.dec_hi)
            a = analysis_1d(a, w.dec_lo)
            out[f"dwt1d/{wname}/L{lvl}/d"] = d
        out[f"dwt1d/{wname}/a"] = a
        out[f"dwt1d/{wname}/levels"] = np.int64(levels)

    # --- 1D SWT ----------------------------------------------------------
    w = get_wavelet("db2")
    x = rng.standard_normal((2, 32))
    out["swt1d/db2/x"] = x
    a = x
    for lvl in (1, 2):
        out[f"swt1d/db2/L{lvl}/d"] = swt_analysis_1d(a, w.dec_hi, lvl)
        a = swt_analysis_1d(a, w.dec_lo, lvl)
    out["swt1d/db2/a"] = a

    path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                        "golden.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(out)} arrays")


if __name__ == "__main__":
    main()
