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


# ---------------------------------------------------------------------------
# Boundary modes (pywt non-periodization semantics)
#
# Independent statement of the pywt C algorithm (_extensions/c/common.c
# extension loops, convolution.c downsampling_convolution /
# upsampling_convolution_valid_sf), deliberately formulated differently
# from pdwt_tpu/core/modes.py (iterative re-extension vs closed-form
# index maps) so the two implementations genuinely cross-check.
# ---------------------------------------------------------------------------

def _ext_right(x, w, mode):
    """Right extension values (w samples) along the last axis, built by
    repeatedly extending the working signal one cycle at a time, the way
    pywt's C extension loops handle widths wider than the signal."""
    if w == 0:
        return x[..., :0]
    if mode == "zero":
        return np.zeros(x.shape[:-1] + (w,), x.dtype)
    if mode == "constant":
        return np.repeat(x[..., -1:], w, axis=-1)
    if mode == "periodic":
        idx = np.arange(w) % x.shape[-1]
        return x[..., idx]
    if mode == "smooth":
        if x.shape[-1] == 1:
            return np.repeat(x[..., -1:], w, axis=-1)
        slope = x[..., -1:] - x[..., -2:-1]
        return x[..., -1:] + slope * np.arange(1, w + 1)
    cur = x
    chunks = []
    got = 0
    while got < w:
        if mode == "symmetric":
            c = cur[..., ::-1]
        elif mode == "antisymmetric":
            c = -cur[..., ::-1]
        elif mode == "reflect":
            c = cur[..., -2::-1]
        elif mode == "antireflect":
            c = 2 * cur[..., -1:] - cur[..., -2::-1]
        else:
            raise ValueError(mode)
        chunks.append(c)
        got += c.shape[-1]
        cur = np.concatenate([cur, c], axis=-1)
    return np.concatenate(chunks, axis=-1)[..., :w]


def ext1(x, lo, hi, mode):
    """Extend the last axis by (lo, hi) samples of the pywt mode."""
    left = _ext_right(x[..., ::-1], lo, mode)[..., ::-1]
    right = _ext_right(x, hi, mode)
    return np.concatenate([left, x, right], axis=-1)


def dwt1_level_mode(x, dec_lo, dec_hi, mode):
    """pywt downsampling_convolution, step 2:
    out[m] = sum_j f[j] * x_ext[2m + 1 - j], m in [0, floor((N+F-1)/2))."""
    n = x.shape[-1]
    hlen = len(dec_lo)
    n_out = (n + hlen - 1) // 2
    xe = ext1(x, hlen - 1, hlen - 1, mode)  # x_ext[t] = xe[..., t + hlen - 1]
    lo = np.zeros(x.shape[:-1] + (n_out,))
    hi = np.zeros_like(lo)
    for m in range(n_out):
        for j in range(hlen):
            v = xe[..., 2 * m + 1 - j + hlen - 1]
            lo[..., m] += dec_lo[j] * v
            hi[..., m] += dec_hi[j] * v
    return lo, hi


def idwt1_level_mode(lo, hi, rec_lo, rec_hi, out_len):
    """pywt upsampling_convolution_valid_sf: out[i] = sum_k f[k] *
    u[i + F - 2 - k] with u the zero-stuffed coefficients (no boundary
    extension); full length 2M - F + 2, sliced to out_len."""
    m = lo.shape[-1]
    hlen = len(rec_lo)
    assert hlen % 2 == 0
    full = 2 * m - hlen + 2
    u_lo = np.zeros(lo.shape[:-1] + (2 * m,))
    u_hi = np.zeros_like(u_lo)
    u_lo[..., ::2] = lo
    u_hi[..., ::2] = hi
    out = np.zeros(lo.shape[:-1] + (full,))
    for i in range(full):
        for k in range(hlen):
            t = i + hlen - 2 - k
            if 0 <= t < 2 * m:
                out[..., i] += rec_lo[k] * u_lo[..., t]
                out[..., i] += rec_hi[k] * u_hi[..., t]
    return out[..., :out_len]


def dwt2_level_mode(x, dec_lo, dec_hi, mode):
    lo_x, hi_x = dwt1_level_mode(x, dec_lo, dec_hi, mode)
    a, h = dwt1_level_mode(lo_x.T, dec_lo, dec_hi, mode)
    v, d = dwt1_level_mode(hi_x.T, dec_lo, dec_hi, mode)
    return a.T, h.T, v.T, d.T


def idwt2_level_mode(a, h, v, d, rec_lo, rec_hi, out_shape):
    t1 = idwt1_level_mode(a.T, h.T, rec_lo, rec_hi, out_shape[0]).T
    t2 = idwt1_level_mode(v.T, d.T, rec_lo, rec_hi, out_shape[0]).T
    return idwt1_level_mode(t1, t2, rec_lo, rec_hi, out_shape[1])
