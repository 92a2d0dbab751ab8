"""MXU (banded-matmul) DWT level kernels — bf16 and mixed precision.

The exact-f32 level kernels (separable_pallas) are VPU-bound: each FIR
tap costs a misaligned sublane-shift plus an FMA, and the measured op
count sits within ~5% of the vreg-level floor of that formulation.  The
MXU changes the game when bf16 products are acceptable: a decimating
dual-FIR is a banded matrix multiply (the systolic array absorbs the
windowing), and this chip runs bf16 matmuls ~8x faster than exact-f32
ones (measured: 193-266 TF/s DEFAULT vs 30 TF/s HIGHEST).

Two modes, selected by the callers in core/separable.py:

* ``bf16``  — bf16 arrays in/out (half HBM traffic: the serving mode the
  reference's dual-precision build approximates from the other side,
  reference: src/filters.h:16-30, Makefile:36-39).  One bf16 matmul per
  pass, f32 accumulation.  Coefficient error ~2^-8 relative (the bf16
  input representation already carries that).
* ``mixed`` — f32 arrays in/out, bf16x3 compute: operands split into
  bf16 hi+lo halves, three DEFAULT-precision matmuls reconstruct the
  product to ~2^-17 relative (missing only the lo*lo term).  ~2.5x
  faster than the exact path at ~1e-5 relative coefficient error.

Filter matrices are built once per (wavelet, tile) as numpy constants
and passed as pallas operands pinned by a constant index_map (fetched
once, resident in VMEM across the grid) — the MXU-era analogue of the
reference's constant-memory filters (reference: src/common.h:15-36).

Index semantics identical to core/conv; equality tests run on the chip.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import conv
from .separable_pallas import (
    _INTERPRET,
    _ceil_to,
    _phases,
    _poly_geometry,
    _taps,
)

# fixed tile for the MXU kernels: M=2*TR=256 and K tiles near the MXU's
# native 128 while keeping the dense-band waste bounded.
_TR = 128
_TC = 256


def _split_bf16(m: np.ndarray):
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return hi, lo


def _analysis_mats(dec_lo, dec_hi, rows: int, cols: int, pr: int, pc: int):
    """A (2TR, rows): dual decimating FIR along sublanes; B (cols, 2TC):
    dual decimating FIR along lanes.  out = [[a|v],[h|d]] = (A @ x) @ B.
    pr/pc are the aligned-lo-pad phases baked into the band offsets."""
    tl, th = _taps(dec_lo), _taps(dec_hi)
    hlen = len(tl)
    A = np.zeros((2 * _TR, rows), np.float32)
    for m in range(_TR):
        for j in range(hlen):
            A[m, pr + 2 * m + j] = tl[j]
            A[_TR + m, pr + 2 * m + j] = th[j]
    B = np.zeros((cols, 2 * _TC), np.float32)
    for m in range(_TC):
        for j in range(hlen):
            B[pc + 2 * m + j, m] = tl[j]
            B[pc + 2 * m + j, _TC + m] = th[j]
    return A, B


def _synthesis_mats(rec_lo, rec_hi, hlen: int, rows: int, cols: int,
                    pr: int, pc: int):
    """S (2TR, rows) with rows = band rows [lo | hi stacked]: pass-1
    synthesis out = S @ [lo_band; hi_band]; T (2*cols, 2TC): pass-2
    synthesis out = [t1 | t2] @ T.  pr/pc are the aligned-lo phases."""
    tl, th = _taps(rec_lo), _taps(rec_hi)
    p, o, lo_pad, _ = _poly_geometry(hlen)
    band = rows // 2

    def fill(S, m_out, stride_band, ph):
        for q in (0, 1):
            for bi, taps in enumerate((tl, th)):
                for b, j in enumerate(range(p[q], hlen, 2)):
                    for m in range(m_out):
                        S[2 * m + q, bi * stride_band + ph + lo_pad + o[q]
                          + b + m] += taps[j]

    S = np.zeros((2 * _TR, rows), np.float32)
    fill(S, _TR, band, pr)
    # pass 2 operates transposed: out[r, g] = sum_c t[r, c] * T[c, g]
    band2 = cols
    St = np.zeros((2 * _TC, 2 * band2), np.float32)
    fill(St, _TC, band2, pc)
    return S, St.T.copy()  # T: (2*cols, 2TC)


# ---------------------------------------------------------------------------
# forward level
# ---------------------------------------------------------------------------

def _fwd_mxu_kernel(mode, TRR, COLS):
    def kernel(xp_hbm, *refs):
        if mode == "mixed":
            (Ah, Al, Bh, Bl, a_ref, h_ref, v_ref, d_ref, xt, sem) = refs
        else:
            (Ah, Bh, a_ref, h_ref, v_ref, d_ref, xt, sem) = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        dma = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(2 * _TR * i, TRR), pl.ds(2 * _TC * j, COLS)],
            xt, sem)
        dma.start()
        dma.wait()
        x = xt[:]
        if mode == "mixed":
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            t = (jnp.dot(Ah[:], xh, preferred_element_type=jnp.float32)
                 + jnp.dot(Ah[:], xl, preferred_element_type=jnp.float32)
                 + jnp.dot(Al[:], xh, preferred_element_type=jnp.float32))
            th_ = t.astype(jnp.bfloat16)
            tl_ = (t - th_.astype(jnp.float32)).astype(jnp.bfloat16)
            out = (jnp.dot(th_, Bh[:], preferred_element_type=jnp.float32)
                   + jnp.dot(tl_, Bh[:], preferred_element_type=jnp.float32)
                   + jnp.dot(th_, Bl[:], preferred_element_type=jnp.float32))
        else:
            t = jnp.dot(Ah[:], x, preferred_element_type=jnp.float32)
            out = jnp.dot(t.astype(jnp.bfloat16), Bh[:],
                          preferred_element_type=jnp.float32)
        out = out.astype(a_ref.dtype)
        a_ref[0] = out[:_TR, :_TC]
        v_ref[0] = out[:_TR, _TC:]
        h_ref[0] = out[_TR:, :_TC]
        d_ref[0] = out[_TR:, _TC:]

    return kernel


def _mxu_supported(r: int, c: int, hlen: int) -> bool:
    return (hlen % 2 == 0 and hlen <= 40 and r % (2 * _TR) == 0
            and c % (2 * _TC) == 0)


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "mode",
                                             "mshape"))
def _fwd_mxu_call(xp, mats, taps, hlen, mode, mshape):
    B = xp.shape[0]
    mr, mc = mshape
    cen = conv.fwd_center(hlen)
    pr = _ceil_to(cen, 16) - cen   # bf16 tiles: 16-sublane alignment
    pc = _phases(cen)[3]
    TRR = _ceil_to(2 * _TR + hlen - 2 + pr, 16)
    COLS = _ceil_to(2 * _TC + hlen - 2 + pc, 128)
    kernel = _fwd_mxu_kernel(mode, TRR, COLS)
    out_spec = pl.BlockSpec((1, _TR, _TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    out_dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    shape = jax.ShapeDtypeStruct((B, mr, mc), out_dtype)
    mat_specs = [
        pl.BlockSpec(m.shape, (lambda b, i, j: (0, 0)),
                     memory_space=pltpu.VMEM) for m in mats
    ]
    return pl.pallas_call(
        kernel,
        grid=(B, mr // _TR, mc // _TC),
        out_shape=(shape,) * 4,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] + mat_specs,
        out_specs=(out_spec,) * 4,
        scratch_shapes=[pltpu.VMEM((TRR, COLS), xp.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=_INTERPRET(),
    )(xp, *mats)


def fwd_level_2d_mxu(x: jnp.ndarray, dec_lo, dec_hi, mode: str):
    """One forward level on (B, R, C) via MXU matmuls; None if the
    geometry is unsupported.  mode: "bf16" (bf16 in/out) or "mixed"
    (f32 in/out, bf16x3 compute)."""
    B, r, c = x.shape
    hlen = len(dec_lo)
    if not _mxu_supported(r, c, hlen):
        return None
    cen = conv.fwd_center(hlen)
    lo_r16 = _ceil_to(cen, 16)
    lo_c, pc = _phases(cen)[1], _phases(cen)[3]
    pr = lo_r16 - cen
    TRR = _ceil_to(2 * _TR + hlen - 2 + pr, 16)
    COLS = _ceil_to(2 * _TC + hlen - 2 + pc, 128)
    hi_r = (r - 2 * _TR + TRR) - r - lo_r16
    hi_c = (c - 2 * _TC + COLS) - c - lo_c
    xp = conv.wrap_pad(x, -1, lo_c, hi_c)
    xp = conv.wrap_pad(xp, -2, lo_r16, hi_r)
    A, Bm = _analysis_mats(dec_lo, dec_hi, TRR, COLS, pr, pc)
    taps = (_taps(dec_lo), _taps(dec_hi))
    if mode == "mixed":
        Ah, Al = _split_bf16(A)
        Bh, Bl = _split_bf16(Bm)
        mats = (Ah, Al, Bh, Bl)
    else:
        mats = (jnp.asarray(A, jnp.bfloat16), jnp.asarray(Bm, jnp.bfloat16))
        xp = xp.astype(jnp.bfloat16)
    return _fwd_mxu_call(xp, mats, taps, hlen, mode, (r // 2, c // 2))


# ---------------------------------------------------------------------------
# inverse level
# ---------------------------------------------------------------------------

def _inv_mxu_kernel(mode, ROWS, COLS):
    def kernel(a_hbm, h_hbm, v_hbm, d_hbm, *refs):
        if mode == "mixed":
            (Sh, Sl, Th, Tl, out_ref, at, ht, vt, dt, sems) = refs
        else:
            (Sh, Th, out_ref, at, ht, vt, dt, sems) = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        copies = []
        for idx, (src, dst) in enumerate(
                ((a_hbm, at), (h_hbm, ht), (v_hbm, vt), (d_hbm, dt))):
            dma = pltpu.make_async_copy(
                src.at[b, pl.ds(_TR * i, ROWS), pl.ds(_TC * j, COLS)],
                dst, sems.at[idx])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()

        def synth(Smat_pair, lo_band, hi_band):
            # bands stacked along sublanes -> one matmul per pass
            u = jnp.concatenate([lo_band, hi_band], axis=0)
            if mode == "mixed":
                uh = u.astype(jnp.bfloat16)
                ul = (u - uh.astype(jnp.float32)).astype(jnp.bfloat16)
                return (jnp.dot(Smat_pair[0][:], uh,
                                preferred_element_type=jnp.float32)
                        + jnp.dot(Smat_pair[0][:], ul,
                                  preferred_element_type=jnp.float32)
                        + jnp.dot(Smat_pair[1][:], uh,
                                  preferred_element_type=jnp.float32))
            return jnp.dot(Smat_pair[0][:], u.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        S_pair = (Sh, Sl) if mode == "mixed" else (Sh, None)
        T_pair = (Th, Tl) if mode == "mixed" else (Th, None)
        t1 = synth(S_pair, at[:], ht[:])   # (2TR, COLS)
        t2 = synth(S_pair, vt[:], dt[:])
        u = jnp.concatenate([t1, t2], axis=1)  # (2TR, 2*COLS)
        if mode == "mixed":
            uh = u.astype(jnp.bfloat16)
            ul = (u - uh.astype(jnp.float32)).astype(jnp.bfloat16)
            out = (jnp.dot(uh, T_pair[0][:],
                           preferred_element_type=jnp.float32)
                   + jnp.dot(ul, T_pair[0][:],
                             preferred_element_type=jnp.float32)
                   + jnp.dot(uh, T_pair[1][:],
                             preferred_element_type=jnp.float32))
        else:
            out = jnp.dot(u.astype(jnp.bfloat16), T_pair[0][:],
                          preferred_element_type=jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "mode",
                                             "mshape"))
def _inv_mxu_call(ap, hp, vp, dp, mats, taps, hlen, mode, mshape):
    B = ap.shape[0]
    mr, mc = mshape
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    pr = _ceil_to(lo_pad, 16) - lo_pad
    pc = _phases(lo_pad)[3]
    ROWS = _ceil_to(_TR + lo_pad + hi_pad + pr, 16)
    COLS = _ceil_to(_TC + lo_pad + hi_pad + pc, 128)
    kernel = _inv_mxu_kernel(mode, ROWS, COLS)
    out_spec = pl.BlockSpec((1, 2 * _TR, 2 * _TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    out_dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    shape = jax.ShapeDtypeStruct((B, 2 * mr, 2 * mc), out_dtype)
    mat_specs = [
        pl.BlockSpec(m.shape, (lambda b, i, j: (0, 0)),
                     memory_space=pltpu.VMEM) for m in mats
    ]
    tile = lambda: pltpu.VMEM((ROWS, COLS), ap.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, mr // _TR, mc // _TC),
        out_shape=shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4 + mat_specs,
        out_specs=out_spec,
        scratch_shapes=[tile(), tile(), tile(), tile(),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=_INTERPRET(),
    )(ap, hp, vp, dp, *mats)


def inv_level_2d_mxu(a, h, v, d, rec_lo, rec_hi, mode: str):
    """One inverse level via MXU matmuls; None if unsupported."""
    B, mr, mc = a.shape
    hlen = len(rec_lo)
    if not _mxu_supported(2 * mr, 2 * mc, hlen):
        return None
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    lo_r16 = _ceil_to(lo_pad, 16)
    pr = lo_r16 - lo_pad
    lo_c, pc = _phases(lo_pad)[1], _phases(lo_pad)[3]
    ROWS = _ceil_to(_TR + lo_pad + hi_pad + pr, 16)
    COLS = _ceil_to(_TC + lo_pad + hi_pad + pc, 128)
    hi_r = (mr - _TR + ROWS) - mr - lo_r16
    hi_c = (mc - _TC + COLS) - mc - lo_c

    S, T = _synthesis_mats(rec_lo, rec_hi, hlen, 2 * ROWS, COLS, pr, pc)
    taps = (_taps(rec_lo), _taps(rec_hi))
    if mode == "mixed":
        Sh, Sl = _split_bf16(S)
        Th, Tl = _split_bf16(T)
        mats = (Sh, Sl, Th, Tl)
        cast = lambda t: t.astype(jnp.float32)
    else:
        mats = (jnp.asarray(S, jnp.bfloat16), jnp.asarray(T, jnp.bfloat16))
        cast = lambda t: t.astype(jnp.bfloat16)

    def pad2(arr):
        arr = conv.wrap_pad(arr, -1, lo_c, hi_c)
        return conv.wrap_pad(arr, -2, lo_r16, hi_r)

    return _inv_mxu_call(pad2(cast(a)), pad2(cast(h)), pad2(cast(v)),
                         pad2(cast(d)), mats, taps, hlen, mode, (mr, mc))


# ---------------------------------------------------------------------------
# autodiff wrappers (same adjoint algebra as the exact kernels: the
# analysis adjoint is the synthesis with reversed taps and vice versa)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fwd_level_2d_mxu_ad(x, dec_lo_t, dec_hi_t, mode):
    return fwd_level_2d_mxu(x, np.asarray(dec_lo_t), np.asarray(dec_hi_t),
                            mode)


def _fwd_mxu_fwd(x, dec_lo_t, dec_hi_t, mode):
    return fwd_level_2d_mxu_ad(x, dec_lo_t, dec_hi_t, mode), None


def _fwd_mxu_bwd(dec_lo_t, dec_hi_t, mode, _, ct):
    a, h, v, d = ct
    lo_r = np.asarray(dec_lo_t)[::-1]
    hi_r = np.asarray(dec_hi_t)[::-1]
    y = inv_level_2d_mxu(a, h, v, d, lo_r, hi_r, mode)
    if y is None:
        from .separable_pallas import _fma_inv_level
        y = _fma_inv_level(a.astype(jnp.float32), h.astype(jnp.float32),
                           v.astype(jnp.float32), d.astype(jnp.float32),
                           lo_r, hi_r).astype(a.dtype)
    return (y,)


fwd_level_2d_mxu_ad.defvjp(_fwd_mxu_fwd, _fwd_mxu_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def inv_level_2d_mxu_ad(a, h, v, d, rec_lo_t, rec_hi_t, mode):
    return inv_level_2d_mxu(a, h, v, d, np.asarray(rec_lo_t),
                            np.asarray(rec_hi_t), mode)


def _inv_mxu_fwd(a, h, v, d, rec_lo_t, rec_hi_t, mode):
    return inv_level_2d_mxu_ad(a, h, v, d, rec_lo_t, rec_hi_t, mode), None


def _inv_mxu_bwd(rec_lo_t, rec_hi_t, mode, _, ct):
    lo_r = np.asarray(rec_lo_t)[::-1]
    hi_r = np.asarray(rec_hi_t)[::-1]
    res = fwd_level_2d_mxu(ct, lo_r, hi_r, mode)
    if res is None:
        from .separable_pallas import _fma_fwd_level
        r = _fma_fwd_level(ct.astype(jnp.float32), lo_r, hi_r)
        res = tuple(t.astype(ct.dtype) for t in r)
    return res


inv_level_2d_mxu_ad.defvjp(_inv_mxu_fwd, _inv_mxu_bwd)
