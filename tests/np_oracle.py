"""Pure-numpy oracle implementing the transform index semantics directly.

This is an independent, loop-level statement of the spec (periodic
convolution with the reference's centering/phase rules — see
pdwt_tpu/core/conv.py docstring) used to cross-check the JAX engines.
Deliberately simple and slow.
"""
import numpy as np


def fwd_center(hlen):
    return hlen // 2 if hlen % 2 else hlen // 2 - 1


def inv_shift(hlen):
    h2 = hlen // 2
    return 2 * (h2 // 2) + 1 if h2 % 2 else 2 * (h2 // 2)


def dwt1_level(x, dec_lo, dec_hi):
    """x: (..., N) -> (lo, hi) each (..., ceil(N/2))."""
    n = x.shape[-1]
    if n % 2:
        x = np.concatenate([x, x[..., -1:]], axis=-1)
    ne = x.shape[-1]
    hlen = len(dec_lo)
    c = fwd_center(hlen)
    idx = (2 * np.arange(ne // 2)[:, None] - c + np.arange(hlen)) % ne
    win = x[..., idx]
    return win @ dec_lo[::-1].copy(), win @ dec_hi[::-1].copy()


def idwt1_level(lo, hi, rec_lo, rec_hi, out_len):
    m = lo.shape[-1]
    hlen = len(rec_lo)
    s = inv_shift(hlen)
    u_lo = np.zeros(lo.shape[:-1] + (2 * m,))
    u_hi = np.zeros_like(u_lo)
    u_lo[..., ::2] = lo
    u_hi[..., ::2] = hi
    idx = (np.arange(2 * m)[:, None] - s + np.arange(hlen)) % (2 * m)
    out = u_lo[..., idx] @ rec_lo[::-1].copy() + u_hi[..., idx] @ rec_hi[::-1].copy()
    return out[..., :out_len]


def swt1_level(x, dec_lo, dec_hi, level):
    n = x.shape[-1]
    hlen = len(dec_lo)
    f = 1 << (level - 1)
    c = fwd_center(hlen) * f
    idx = (np.arange(n)[:, None] - c + f * np.arange(hlen)) % n
    win = x[..., idx]
    return win @ dec_lo[::-1].copy(), win @ dec_hi[::-1].copy()


def iswt1_level(lo, hi, rec_lo, rec_hi, level):
    n = lo.shape[-1]
    hlen = len(rec_lo)
    f = 1 << (level - 1)
    c = (hlen // 2) * f
    idx = (np.arange(n)[:, None] - c + f * np.arange(hlen)) % n
    out = lo[..., idx] @ (rec_lo[::-1] / 2).copy()
    out += hi[..., idx] @ (rec_hi[::-1] / 2).copy()
    return out


def dwt2_level(x, dec_lo, dec_hi):
    """x: (H, W) -> (a, h, v, d).  H = highpass along rows (axis 0)."""
    lo_x, hi_x = dwt1_level(x, dec_lo, dec_hi)
    a, h = dwt1_level(lo_x.T, dec_lo, dec_hi)
    v, d = dwt1_level(hi_x.T, dec_lo, dec_hi)
    return a.T, h.T, v.T, d.T


def idwt2_level(a, h, v, d, rec_lo, rec_hi, out_shape):
    t1 = idwt1_level(a.T, h.T, rec_lo, rec_hi, out_shape[0]).T
    t2 = idwt1_level(v.T, d.T, rec_lo, rec_hi, out_shape[0]).T
    return idwt1_level(t1, t2, rec_lo, rec_hi, out_shape[1])
