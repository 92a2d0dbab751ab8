"""MXU (banded-matmul) batched-1D level kernels — bf16 / mixed modes.

The batched-1D transforms (reference: src/separable.cu:213-236, 366-395,
519-537, 653-672 — batch rides the rows) are a single-pass version of
the 2D kernels: the batch occupies the sublane (M) axis untouched and
the signal axis becomes the K/N dims of ONE banded matmul per tile:

    decimated analysis:   out = x_pad @ B     B[pc + 2m + j, m]   = tap[j]
    decimated synthesis:  out = [lo|hi] @ T   (polyphase columns of T)
    à-trous analysis:     out = x_pad @ B_f   B[pc + n + f*j, n]  = tap[j]
    à-trous synthesis:    out = [lo|hi] @ T_f (1/2 factor in entries)

Modes and schemes mirror matmul_pallas: ``mixed`` (f32, bf16x3) and
``bf16`` (bf16 details, f32 approximation chain; b1 for bf16 operands,
DEFAULT-f32 otherwise).  Index semantics identical to core/conv.
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
from .matmul_pallas import (PAIR_SCHEMES, _bf16_l1_schemes,
                            _mats_for_scheme, _mm)
from .swt_matmul_pallas import _mode_scheme, _swt_scheme

_TB_TILES = (512, 256, 128, 64, 32, 16)
_TC_TILES = (256, 128)


def _pick_1d_tiles(B: int, m: int) -> Optional[Tuple[int, int]]:
    tb = next((t for t in _TB_TILES if B % t == 0), None)
    tc = next((t for t in _TC_TILES if m % t == 0), None)
    if tb is None or tc is None:
        return None
    return tb, tc


# --- matrix builders -------------------------------------------------------

def _ana_mat_1d(dec_lo, dec_hi, cols, pc, TC):
    tl, th = _taps(dec_lo), _taps(dec_hi)
    B = np.zeros((cols, 2 * TC), np.float32)
    for m in range(TC):
        for j in range(len(tl)):
            B[pc + 2 * m + j, m] += tl[j]
            B[pc + 2 * m + j, TC + m] += th[j]
    return B


def _syn_mat_1d(rec_lo, rec_hi, cols, pc, TC):
    tl, th = _taps(rec_lo), _taps(rec_hi)
    hlen = len(tl)
    p, o, lo_pad, _ = _poly_geometry(hlen)
    St = np.zeros((2 * TC, 2 * cols), np.float32)
    for q in (0, 1):
        for bi, taps in enumerate((tl, th)):
            for b, j in enumerate(range(p[q], hlen, 2)):
                for m in range(TC):
                    St[2 * m + q, bi * cols + pc + lo_pad + o[q] + b + m] \
                        += taps[j]
    return St.T.copy()  # (2*cols, 2TC)


def _ana_mat_swt1d(dec_lo, dec_hi, cols, pc, TC, f):
    tl, th = _taps(dec_lo), _taps(dec_hi)
    B = np.zeros((cols, 2 * TC), np.float32)
    for n in range(TC):
        for j in range(len(tl)):
            B[pc + n + f * j, n] += tl[j]
            B[pc + n + f * j, TC + n] += th[j]
    return B


def _syn_mat_swt1d(rec_lo, rec_hi, cols, pc, TC, f):
    # single 1D pass -> one 1/2 factor (reference: src/separable.cu:653-672)
    tl = _taps(np.asarray(rec_lo) * 0.5)
    th = _taps(np.asarray(rec_hi) * 0.5)
    T = np.zeros((2 * cols, TC), np.float32)
    for n in range(TC):
        for j in range(len(tl)):
            T[pc + n + f * j, n] += tl[j]
            T[cols + pc + n + f * j, n] += th[j]
    return T


# --- generic single-matmul kernels ----------------------------------------

def _fwd1d_kernel(scheme, TB, TC, COLS, stride):
    nmats = 2 if scheme in PAIR_SCHEMES else 1

    def kernel(xp_hbm, *refs):
        mats = refs[:nmats]
        lo_ref, hi_ref, xt, sem = refs[nmats:]
        b = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(TB * b, TB), pl.ds(stride * TC * j, COLS)],
            xt, sem)
        dma.start()
        dma.wait()
        x = xt[:]
        if scheme in PAIR_SCHEMES:
            out = _mm(scheme, x, None, right_pair=(mats[0][:], mats[1][:]))
        else:
            out = _mm(scheme, x, mats[0][:])
        lo_ref[:] = out[:, :TC].astype(lo_ref.dtype)
        hi_ref[:] = out[:, TC:].astype(hi_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scheme", "tiles", "cols",
                                             "stride", "m", "out_dtypes"))
def _fwd1d_call(xp, mats, scheme, tiles, cols, stride, m, out_dtypes):
    TB, TC = tiles
    B = xp.shape[0]
    kernel = _fwd1d_kernel(scheme, TB, TC, cols, stride)
    out_spec = pl.BlockSpec((TB, TC), lambda b, j: (b, j),
                            memory_space=pltpu.VMEM)
    lo_dt, hi_dt = out_dtypes
    shapes = (jax.ShapeDtypeStruct((B, m), lo_dt),
              jax.ShapeDtypeStruct((B, m), hi_dt))
    mat_specs = [
        pl.BlockSpec(mt.shape, (lambda b, j: (0, 0)),
                     memory_space=pltpu.VMEM) for mt in mats
    ]
    return pl.pallas_call(
        kernel,
        grid=(B // TB, m // TC),
        out_shape=shapes,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + mat_specs,
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((TB, cols), xp.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=_INTERPRET(),
    )(xp, *mats)


def _inv1d_kernel(scheme, TB, TC, COLS, n_out):
    nmats = 2 if scheme in PAIR_SCHEMES else 1

    def kernel(lo_hbm, hi_hbm, *refs):
        mats = refs[:nmats]
        out_ref, lt, ht, sems = refs[nmats:]
        b = pl.program_id(0)
        j = pl.program_id(1)
        d1 = pltpu.make_async_copy(
            lo_hbm.at[pl.ds(TB * b, TB), pl.ds(TC * j, COLS)], lt,
            sems.at[0])
        d2 = pltpu.make_async_copy(
            hi_hbm.at[pl.ds(TB * b, TB), pl.ds(TC * j, COLS)], ht,
            sems.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()
        cd = jnp.bfloat16 if scheme == "b1" else jnp.float32
        u = jnp.concatenate([lt[:].astype(cd), ht[:].astype(cd)], axis=1)
        if scheme in PAIR_SCHEMES:
            out = _mm(scheme, u, None, right_pair=(mats[0][:], mats[1][:]))
        else:
            out = _mm(scheme, u, mats[0][:])
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scheme", "tiles", "cols",
                                             "n_out_tile", "n", "out_dtype"))
def _inv1d_call(lp, hp, mats, scheme, tiles, cols, n_out_tile, n,
                out_dtype):
    TB, TC = tiles
    B = lp.shape[0]
    kernel = _inv1d_kernel(scheme, TB, TC, cols, n_out_tile)
    out_spec = pl.BlockSpec((TB, n_out_tile), lambda b, j: (b, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, n), out_dtype)
    mat_specs = [
        pl.BlockSpec(mt.shape, (lambda b, j: (0, 0)),
                     memory_space=pltpu.VMEM) for mt in mats
    ]
    return pl.pallas_call(
        kernel,
        grid=(B // TB, n // n_out_tile),
        out_shape=shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2 + mat_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((TB, cols), lp.dtype),
                        pltpu.VMEM((TB, cols), hp.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_INTERPRET(),
    )(lp, hp, *mats)


# --- public entry points ---------------------------------------------------

def fwd_level_1d_mxu(x, dec_lo, dec_hi, mode: str, pad_fn=None):
    """One decimated level on (B, N) -> (lo, hi); None if unsupported.
    bf16 mode: lo out f32 (A-chain), hi out bf16."""
    B, n = x.shape
    hlen = len(dec_lo)
    if hlen % 2 or hlen > 40 or n % 2:
        return None
    m = n // 2
    tiles = _pick_1d_tiles(B, m)
    if tiles is None:
        return None
    TB, TC = tiles
    cen = conv.fwd_center(hlen)
    lo_c, pc = _phases(cen)[1], _phases(cen)[3]
    COLS = _ceil_to(2 * TC + hlen - 2 + pc, 128)
    hi_c = (n - 2 * TC + COLS) - n - lo_c
    xp = (pad_fn or conv.wrap_pad)(x, -1, lo_c, hi_c)
    Bm = _ana_mat_1d(dec_lo, dec_hi, COLS, pc, TC)
    scheme = _mode_scheme(mode, x.dtype)
    out_dtypes = ((jnp.float32, jnp.float32) if mode == "mixed"
                  else (jnp.float32, jnp.bfloat16))
    mats = _mats_for_scheme((Bm,), scheme)
    return _fwd1d_call(xp, mats, scheme, (TB, TC), COLS, 2, m, out_dtypes)


def inv_level_1d_mxu(lo, hi, rec_lo, rec_hi, mode: str, out_dtype=None,
                     pad_fn=None):
    """One decimated inverse level: (B, M) x2 -> (B, 2M); None if
    unsupported."""
    B, m = lo.shape
    hlen = len(rec_lo)
    if hlen % 2 or hlen > 40:
        return None
    tiles = _pick_1d_tiles(B, m)
    if tiles is None:
        return None
    TB, TC = tiles
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    lo_c, pc = _phases(lo_pad)[1], _phases(lo_pad)[3]
    COLS = _ceil_to(TC + lo_pad + hi_pad + pc, 128)
    hi_c = (m - TC + COLS) - m - lo_c
    T = _syn_mat_1d(rec_lo, rec_hi, COLS, pc, TC)
    if mode == "mixed":
        scheme = "b3"
        out_dtype = jnp.float32
    elif mode == "bf16":
        # final level (bf16 out) = the PDWT_TPU_BF16_ACCURACY tier's
        # inverse scheme; deep intermediate levels = bf16x3 (see
        # matmul_pallas)
        out_dtype = jnp.bfloat16 if out_dtype is None else out_dtype
        scheme = (_bf16_l1_schemes()[1]
                  if out_dtype == jnp.bfloat16 else "b3")
        lo = lo.astype(jnp.float32)
    else:
        raise ValueError(mode)
    mats = _mats_for_scheme((T,), scheme)
    pad1 = lambda t: (pad_fn or conv.wrap_pad)(t, -1, lo_c, hi_c)
    return _inv1d_call(pad1(lo), pad1(hi), mats, scheme, (TB, TC), COLS,
                       2 * TC, 2 * m, out_dtype)


def swt_fwd_level_1d_mxu(x, dec_lo, dec_hi, level: int, mode: str,
                         pad_fn=None):
    """One 1D à-trous level: (B, N) -> (lo, hi) full-size; None if
    unsupported."""
    B, n = x.shape
    hlen = len(dec_lo)
    f = 1 << (level - 1)
    if hlen % 2 or hlen > 40:
        return None
    tiles = _pick_1d_tiles(B, n)
    if tiles is None:
        return None
    TB, TC = tiles
    span = (hlen - 1) * f
    if span > 2 * TC:
        return None
    cen = conv.fwd_center(hlen) * f
    lo_c, pc = _phases(cen)[1], _phases(cen)[3]
    COLS = _ceil_to(TC + span + pc, 128)
    hi_c = (n - TC + COLS) - n - lo_c
    xp = (pad_fn or conv.wrap_pad)(x, -1, lo_c, hi_c)
    Bm = _ana_mat_swt1d(dec_lo, dec_hi, COLS, pc, TC, f)
    scheme = _swt_scheme(mode, x.dtype)
    out_dtypes = ((jnp.float32, jnp.float32) if mode == "mixed"
                  else (jnp.float32, jnp.bfloat16))
    mats = _mats_for_scheme((Bm,), scheme)
    return _fwd1d_call(xp, mats, scheme, (TB, TC), COLS, 1, n, out_dtypes)


def swt_inv_level_1d_mxu(lo, hi, rec_lo, rec_hi, level: int, mode: str,
                         out_dtype=None, pad_fn=None):
    """One 1D à-trous inverse level (1/2 factor in the matrix); None if
    unsupported."""
    B, n = lo.shape
    hlen = len(rec_lo)
    f = 1 << (level - 1)
    if hlen % 2 or hlen > 40:
        return None
    tiles = _pick_1d_tiles(B, n)
    if tiles is None:
        return None
    TB, TC = tiles
    span = (hlen - 1) * f
    if span > 2 * TC:
        return None
    cen = conv.swt_inv_center(hlen) * f
    lo_c, pc = _phases(cen)[1], _phases(cen)[3]
    COLS = _ceil_to(TC + span + pc, 128)
    hi_c = (n - TC + COLS) - n - lo_c
    T = _syn_mat_swt1d(rec_lo, rec_hi, COLS, pc, TC, f)
    if mode == "mixed":
        scheme = "b3"
        out_dtype = jnp.float32
    elif mode == "bf16":
        # single pass at every level (undecimated; see _swt_scheme)
        out_dtype = jnp.bfloat16 if out_dtype is None else out_dtype
        scheme = "fd"
        lo = lo.astype(jnp.float32)
    else:
        raise ValueError(mode)
    mats = _mats_for_scheme((T,), scheme)
    pad1 = lambda t: (pad_fn or conv.wrap_pad)(t, -1, lo_c, hi_c)
    return _inv1d_call(pad1(lo), pad1(hi), mats, scheme, (TB, TC), COLS,
                       TC, n, out_dtype)


# ---------------------------------------------------------------------------
# autodiff wrappers
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fwd_level_1d_mxu_ad(x, dec_lo_t, dec_hi_t, mode):
    return fwd_level_1d_mxu(x, np.asarray(dec_lo_t), np.asarray(dec_hi_t),
                            mode)


def _fwd1dm_fwd(x, dec_lo_t, dec_hi_t, mode):
    return (fwd_level_1d_mxu_ad(x, dec_lo_t, dec_hi_t, mode),
            jnp.zeros((0,), x.dtype))


def _fwd1dm_bwd(dec_lo_t, dec_hi_t, mode, probe, ct):
    from .swt_pallas import _fma_inv1

    lo_b, hi_b = ct
    lo_r = np.asarray(dec_lo_t)[::-1]
    hi_r = np.asarray(dec_hi_t)[::-1]
    y = inv_level_1d_mxu(lo_b, hi_b, lo_r, hi_r, mode,
                         out_dtype=probe.dtype)
    if y is None:
        y = _fma_inv1(lo_b.astype(jnp.float32), hi_b.astype(jnp.float32),
                      lo_r, hi_r).astype(probe.dtype)
    return (y,)


fwd_level_1d_mxu_ad.defvjp(_fwd1dm_fwd, _fwd1dm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def inv_level_1d_mxu_ad(lo_b, hi_b, rec_lo_t, rec_hi_t, mode,
                        out_dtype=None):
    return inv_level_1d_mxu(lo_b, hi_b, np.asarray(rec_lo_t),
                            np.asarray(rec_hi_t), mode, out_dtype=out_dtype)


def _inv1dm_fwd(lo_b, hi_b, rec_lo_t, rec_hi_t, mode, out_dtype):
    res = (jnp.zeros((0,), lo_b.dtype), jnp.zeros((0,), hi_b.dtype))
    return inv_level_1d_mxu_ad(lo_b, hi_b, rec_lo_t, rec_hi_t, mode,
                               out_dtype), res


def _inv1dm_bwd(rec_lo_t, rec_hi_t, mode, out_dtype, probes, ct):
    from .swt_pallas import _fma_fwd1

    lo_r = np.asarray(rec_lo_t)[::-1]
    hi_r = np.asarray(rec_hi_t)[::-1]
    res = fwd_level_1d_mxu(ct, lo_r, hi_r, mode)
    if res is None:
        res = _fma_fwd1(ct.astype(jnp.float32), lo_r, hi_r)
    return tuple(t.astype(p.dtype) for t, p in zip(res, probes))


inv_level_1d_mxu_ad.defvjp(_inv1dm_fwd, _inv1dm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def swt_fwd_level_1d_mxu_ad(x, dec_lo_t, dec_hi_t, level, mode):
    return swt_fwd_level_1d_mxu(x, np.asarray(dec_lo_t),
                                np.asarray(dec_hi_t), level, mode)


def _sfwd1dm_fwd(x, dec_lo_t, dec_hi_t, level, mode):
    return (swt_fwd_level_1d_mxu_ad(x, dec_lo_t, dec_hi_t, level, mode),
            jnp.zeros((0,), x.dtype))


def _sfwd1dm_bwd(dec_lo_t, dec_hi_t, level, mode, probe, ct):
    from .swt_pallas import _fma_swt_inv1

    lo_b, hi_b = ct
    lo_r = 2.0 * np.asarray(dec_lo_t)[::-1]
    hi_r = 2.0 * np.asarray(dec_hi_t)[::-1]
    y = swt_inv_level_1d_mxu(lo_b, hi_b, lo_r, hi_r, level, mode,
                             out_dtype=probe.dtype)
    if y is None:
        y = _fma_swt_inv1(lo_b.astype(jnp.float32),
                          hi_b.astype(jnp.float32), lo_r, hi_r,
                          level).astype(probe.dtype)
    return (y,)


swt_fwd_level_1d_mxu_ad.defvjp(_sfwd1dm_fwd, _sfwd1dm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def swt_inv_level_1d_mxu_ad(lo_b, hi_b, rec_lo_t, rec_hi_t, level, mode,
                            out_dtype=None):
    return swt_inv_level_1d_mxu(lo_b, hi_b, np.asarray(rec_lo_t),
                                np.asarray(rec_hi_t), level, mode,
                                out_dtype=out_dtype)


def _sinv1dm_fwd(lo_b, hi_b, rec_lo_t, rec_hi_t, level, mode, out_dtype):
    res = (jnp.zeros((0,), lo_b.dtype), jnp.zeros((0,), hi_b.dtype))
    return swt_inv_level_1d_mxu_ad(lo_b, hi_b, rec_lo_t, rec_hi_t, level,
                                   mode, out_dtype), res


def _sinv1dm_bwd(rec_lo_t, rec_hi_t, level, mode, out_dtype, probes, ct):
    from .swt_pallas import _fma_swt_fwd1

    lo_r = 0.5 * np.asarray(rec_lo_t)[::-1]
    hi_r = 0.5 * np.asarray(rec_hi_t)[::-1]
    res = swt_fwd_level_1d_mxu(ct, lo_r, hi_r, level, mode)
    if res is None:
        res = _fma_swt_fwd1(ct.astype(jnp.float32), lo_r, hi_r, level)
    return tuple(t.astype(p.dtype) for t, p in zip(res, probes))


swt_inv_level_1d_mxu_ad.defvjp(_sinv1dm_fwd, _sinv1dm_bwd)
