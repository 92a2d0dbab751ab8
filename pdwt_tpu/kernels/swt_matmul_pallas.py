"""MXU (banded-matmul) à-trous SWT level kernels — bf16 / mixed modes.

The stationary transform is the flagship workload (translation-invariant
denoising, reference demo scenario 3: src/demo.cpp:201-205) and was the
largest remaining VPU-bound surface after round 2.  A dilated dual FIR
is still a banded matrix multiply — the band just has stride ``f =
2^(level-1)`` (reference à-trous kernels: src/separable.cu:409-493,
553-626) — so both separable passes of a level run as two MXU matmuls
per tile, exactly like the decimated kernels in matmul_pallas:

    pass 1 (sublanes): t = A @ x      A[m, pr + m + f*j]      = tap[j]
    pass 2 (lanes):    o = t @ B      B[pc + n + f*j, n]      = tap[j]

Undecimated means M == TR (no 2x) and the K-dim waste is *smaller* than
the decimated kernels' (K = TR + (hlen-1)*f vs 2*TR + hlen - 2), so the
5-6x DEFAULT-vs-HIGHEST matmul advantage carries over per level until
the dilated span approaches the tile size.

The inverse fuses the per-level detail threshold (soft/hard, SMEM beta)
into the tile read — the TI-denoise step never materializes thresholded
subbands in HBM (the reference launches a separate elementwise kernel
per subband: src/common.cu:219-249).

Modes mirror matmul_pallas: ``mixed`` (f32 in/out, bf16x3) and ``bf16``
(bf16 details, f32 approximation chain, one bf16 matmul per pass for
bf16 operands / DEFAULT-f32 for the f32 A-chain).  The inverse's
1/2-per-pass normalization lives in the matrix entries (reference:
src/separable.cu:581-584).
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
    _taps,
)
from .matmul_pallas import PAIR_SCHEMES, _mats_for_scheme, _mm, _tile_candidates
from .swt_pallas import _thresh_tile

_SWT_VMEM = 11 * 1024 * 1024


def _swt_mxu_tiles(r: int, c: int, hlen: int, f: int, scheme: str = "b1"):
    """Best (TR, TC) whose padded tile + matrices fit VMEM; None if
    unsupported (odd hlen, >40 taps, indivisible, or dilated span too
    wide for the banded formulation to be worth it).  Candidates and
    preference order come from matmul_pallas._tile_candidates (one
    scheme-keyed table, PDWT_TPU_MXU_TILES override included)."""
    if hlen % 2 or hlen > 40:
        return None
    span = (hlen - 1) * f
    for tr, tc in _tile_candidates(scheme):
        if r % tr or c % tc:
            continue
        if span > 2 * tr:  # K-dim waste explodes; VPU path wins
            continue
        rows = _ceil_to(tr + span + 16, 16)
        cols = _ceil_to(tc + span + 128, 128)
        # x tile + 4 matrices (split) + out accum, coarse bound
        est = rows * cols * 4 + 2 * (rows * (2 * tr) + cols * 2 * tc) * 4
        if est > _SWT_VMEM:
            continue
        return tr, tc
    return None


def _swt_analysis_mats(dec_lo, dec_hi, rows, cols, pr, pc, TR, TC, f):
    tl, th = _taps(dec_lo), _taps(dec_hi)
    hlen = len(tl)
    A = np.zeros((2 * TR, rows), np.float32)
    for m in range(TR):
        for j in range(hlen):
            A[m, pr + m + f * j] += tl[j]
            A[TR + m, pr + m + f * j] += th[j]
    B = np.zeros((cols, 2 * TC), np.float32)
    for n in range(TC):
        for j in range(hlen):
            B[pc + n + f * j, n] += tl[j]
            B[pc + n + f * j, TC + n] += th[j]
    return A, B


def _swt_synthesis_mats(rec_lo, rec_hi, rows, cols, pr, pc, TR, TC, f):
    # taps carry the 1/2-per-pass factor (reference: src/separable.cu:581)
    tl = _taps(np.asarray(rec_lo) * 0.5)
    th = _taps(np.asarray(rec_hi) * 0.5)
    hlen = len(tl)
    S = np.zeros((TR, 2 * rows), np.float32)
    for m in range(TR):
        for j in range(hlen):
            S[m, pr + m + f * j] += tl[j]
            S[m, rows + pr + m + f * j] += th[j]
    T = np.zeros((2 * cols, TC), np.float32)
    for n in range(TC):
        for j in range(hlen):
            T[pc + n + f * j, n] += tl[j]
            T[cols + pc + n + f * j, n] += th[j]
    return S, T


def _mode_scheme(mode: str, in_dtype) -> str:
    """Forward-pass compute scheme for DECIMATED kernels: bf16 operands
    get the PDWT_TPU_BF16_ACCURACY tier's forward scheme (default b1,
    the single-matmul fast path); the f32 A-chain gets full bf16x3
    (a single lossy pass on the deep levels cost ~10 absolute on [0,255]
    in the round-3 measurements, and decimation makes b3 cheap there)."""
    if mode == "mixed":
        return "b3"
    if mode == "bf16":
        from .matmul_pallas import _bf16_l1_schemes
        return _bf16_l1_schemes()[0] if in_dtype == jnp.bfloat16 else "b3"
    raise ValueError(mode)


def _swt_scheme(mode: str, in_dtype) -> str:
    """À-trous compute scheme.  Unlike the decimated transform, SWT
    levels never shrink, so bf16x3 on deep levels would triple most of
    the work (measured: TI step 0.70 ms vs 0.29 single-pass at 1024^2);
    and the undecimated inverse's 1/4-averaging keeps the single-pass
    error bounded (~6 vs ~3.7 absolute on worst-case [0,255] noise).
    bf16 mode therefore runs ONE matmul per pass at every level
    (PDWT_TPU_SWT_BF16_SCHEME overrides for sweeps)."""
    if mode == "mixed":
        return "b3"
    if mode == "bf16":
        return _swt_bf16_scheme(default=("b1" if in_dtype == jnp.bfloat16
                                         else "fd"))
    raise ValueError(mode)


def _swt_bf16_scheme(default: str) -> str:
    """À-trous bf16 compute scheme: PDWT_TPU_SWT_BF16_SCHEME wins, then
    the PDWT_TPU_BF16_ACCURACY tier.  balanced AND accurate both map to
    b2f here — the round-4 chip A/B (tools/swt_b2_ab_results.json):
    default err 6.5 at TI 0.30 ms, b2f err 2.4 at 0.48 ms, b2d err 5.5
    at 0.50 ms (dominated: the filter rounding is the big à-trous error
    source), and b3 is SLOWER than the exact kernels (0.70 vs 0.65 ms,
    round 3) so it is never the right à-trous point — past b2f, use
    f32 arrays."""
    import os

    from ..core import precision

    ov = os.environ.get("PDWT_TPU_SWT_BF16_SCHEME")
    if ov:
        return ov
    if precision.bf16_accuracy() != "fast":
        return "b2f"
    return default


# ---------------------------------------------------------------------------
# forward level
# ---------------------------------------------------------------------------

def _swt_fwd_mxu_kernel(scheme, ROWS, COLS, TR, TC, halo=None):
    from .halo_dma import emit_halo_copies

    nmats = 4 if scheme in PAIR_SCHEMES else 2

    def kernel(xp_hbm, *refs):
        mats = refs[:nmats]
        a_ref, h_ref, v_ref, d_ref, xt, sem = refs[nmats:]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        if halo is None:
            dma = pltpu.make_async_copy(
                xp_hbm.at[b, pl.ds(TR * i, ROWS), pl.ds(TC * j, COLS)],
                xt, sem)
            dma.start()
            dma.wait()
        else:
            # periodic window assembled straight from the unpadded
            # array — no XLA pad materialization (halo_dma docstring)
            emit_halo_copies(xp_hbm, xt, b, i, j, halo[0], halo[1], sem)
        x = xt[:]
        if scheme in PAIR_SCHEMES:
            Ah, Al, Bh, Bl = (m[:] for m in mats)
            t = _mm(scheme, None, x, left_pair=(Ah, Al))
            out = _mm(scheme, t, None, right_pair=(Bh, Bl))
        else:
            Am, Bm = (m[:] for m in mats)
            t = _mm(scheme, Am, x)
            out = _mm(scheme, t, Bm)
        a_ref[0] = out[:TR, :TC].astype(a_ref.dtype)
        v_ref[0] = out[:TR, TC:].astype(v_ref.dtype)
        h_ref[0] = out[TR:, :TC].astype(h_ref.dtype)
        d_ref[0] = out[TR:, TC:].astype(d_ref.dtype)

    return kernel


def _swt_geometry(hlen: int, f: int, cen: int, tiles):
    """Aligned-pad phases + padded tile dims for an à-trous pass with
    center ``cen`` — computed ONCE and passed (static) into the jitted
    calls so the entry wrappers and kernels can never disagree."""
    TR, TC = tiles
    span = (hlen - 1) * f
    lo_r = _ceil_to(cen, 16)
    lo_c = _ceil_to(cen, 128)
    pr = lo_r - cen
    pc = lo_c - cen
    ROWS = _ceil_to(TR + span + pr, 16)
    COLS = _ceil_to(TC + span + pc, 128)
    return lo_r, lo_c, pr, pc, ROWS, COLS


@functools.partial(jax.jit, static_argnames=("scheme", "tiles",
                                             "nshape", "out_dtypes", "geom",
                                             "halo"))
def _swt_fwd_mxu_call(xp, mats, scheme, tiles, nshape, out_dtypes, geom,
                      halo=False):
    B = xp.shape[0]
    TR, TC = tiles
    nr, nc = nshape
    lo_r, lo_c, pr, pc, ROWS, COLS = geom
    geoms = ((nr // TR, TR, lo_r, ROWS, nr, 16),
             (nc // TC, TC, lo_c, COLS, nc, 128)) if halo else None
    kernel = _swt_fwd_mxu_kernel(scheme, ROWS, COLS, TR, TC, geoms)
    out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    a_dt, d_dt = out_dtypes
    shapes = tuple(jax.ShapeDtypeStruct((B, nr, nc), dt)
                   for dt in (a_dt, d_dt, d_dt, d_dt))
    mat_specs = [
        pl.BlockSpec(m.shape, (lambda b, i, j: (0, 0)),
                     memory_space=pltpu.VMEM) for m in mats
    ]
    return pl.pallas_call(
        kernel,
        grid=(B, nr // TR, nc // TC),
        out_shape=shapes,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + mat_specs,
        out_specs=(out_spec,) * 4,
        scratch_shapes=[pltpu.VMEM((ROWS, COLS), xp.dtype),
                        pltpu.SemaphoreType.DMA((9,) if halo else ())],
        interpret=_INTERPRET(),
    )(xp, *mats)


def swt_fwd_level_2d_mxu(x, dec_lo, dec_hi, level: int, mode: str,
                         pad_fn=None):
    """One à-trous forward level on (B, R, C) via MXU matmuls; None if
    unsupported.  Output dtypes per mode: mixed -> all f32; bf16 ->
    f32 approximation + bf16 details (see matmul_pallas).  ``pad_fn``
    substitutes the distributed ring halo exchange (disables the
    in-kernel periodic halo, which assumes a single-device wrap)."""
    B, r, c = x.shape
    hlen = len(dec_lo)
    f = 1 << (level - 1)
    scheme = _swt_scheme(mode, x.dtype)
    tiles = _swt_mxu_tiles(r, c, hlen, f, scheme)
    if tiles is None:
        return None
    TR, TC = tiles
    cen = conv.fwd_center(hlen) * f
    geom = _swt_geometry(hlen, f, cen, tiles)
    lo_r, lo_c, pr, pc, ROWS, COLS = geom
    A, Bm = _swt_analysis_mats(dec_lo, dec_hi, ROWS, COLS, pr, pc, TR, TC, f)
    out_dtypes = ((jnp.float32, jnp.float32) if mode == "mixed"
                  else (jnp.float32, jnp.bfloat16))
    mats = _mats_for_scheme((A, Bm), scheme)
    from .halo_dma import halo_enabled, halo_safe
    if pad_fn is None and halo_enabled() \
            and halo_safe(r // TR, TR, lo_r, ROWS, r) \
            and halo_safe(c // TC, TC, lo_c, COLS, c):
        return _swt_fwd_mxu_call(x, mats, scheme, (TR, TC), (r, c),
                                 out_dtypes, geom, halo=True)
    hi_r = (r - TR + ROWS) - r - lo_r
    hi_c = (c - TC + COLS) - c - lo_c
    pad = pad_fn or conv.wrap_pad
    xp = pad(x, -1, lo_c, hi_c)
    xp = pad(xp, -2, lo_r, hi_r)
    return _swt_fwd_mxu_call(xp, mats, scheme, (TR, TC), (r, c),
                             out_dtypes, geom)


# ---------------------------------------------------------------------------
# inverse level (optionally with fused detail threshold)
# ---------------------------------------------------------------------------

def _swt_inv_mxu_kernel(scheme, ROWS, COLS, TR, TC, thresh_mode,
                        halo=None):
    from .halo_dma import emit_halo_copies

    nmats = 4 if scheme in PAIR_SCHEMES else 2

    def kernel(*refs):
        if thresh_mode is not None:
            beta_ref = refs[0]
            refs = refs[1:]
        a_hbm, h_hbm, v_hbm, d_hbm = refs[:4]
        mats = refs[4:4 + nmats]
        out_ref, at, ht, vt, dt, sems = refs[4 + nmats:]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        if halo is None:
            copies = []
            for idx, (src, dst) in enumerate(
                    ((a_hbm, at), (h_hbm, ht), (v_hbm, vt), (d_hbm, dt))):
                dma = pltpu.make_async_copy(
                    src.at[b, pl.ds(TR * i, ROWS), pl.ds(TC * j, COLS)],
                    dst, sems.at[idx])
                dma.start()
                copies.append(dma)
            for dma in copies:
                dma.wait()
        else:
            # four periodic windows assembled from the unpadded
            # subbands (the big win: no 4x full-size XLA pads)
            for idx, (src, dst) in enumerate(
                    ((a_hbm, at), (h_hbm, ht), (v_hbm, vt), (d_hbm, dt))):
                emit_halo_copies(src, dst, b, i, j, halo[0], halo[1],
                                 sems.at[idx])

        if scheme in PAIR_SCHEMES:
            Sh, Sl, Th, Tl = (m[:] for m in mats)
        else:
            Sm, Tm = (m[:] for m in mats)

        cd = jnp.bfloat16 if scheme == "b1" else jnp.float32

        def det(tile):
            x = tile[:]
            if thresh_mode is not None:
                # fused detail threshold in the tile read (VPU
                # elementwise; f32 so bf16 details threshold exactly)
                x = _thresh_tile(x.astype(jnp.float32), thresh_mode,
                                 beta_ref[0])
            return x.astype(cd)

        def synth(lo_t, hi_t):
            u = jnp.concatenate([lo_t, hi_t], axis=0)
            if scheme in PAIR_SCHEMES:
                return _mm(scheme, None, u, left_pair=(Sh, Sl))
            return _mm(scheme, Sm, u)

        t1 = synth(at[:].astype(cd), det(ht))   # (TR, COLS)
        t2 = synth(det(vt), det(dt))
        u = jnp.concatenate([t1, t2], axis=1)   # (TR, 2*COLS)
        if scheme in PAIR_SCHEMES:
            out = _mm(scheme, u, None, right_pair=(Th, Tl))
        else:
            out = _mm(scheme, u, Tm)
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scheme", "tiles",
                                             "nshape", "out_dtype", "geom",
                                             "thresh_mode", "halo"))
def _swt_inv_mxu_call(ap, hp, vp, dp, mats, scheme, tiles, nshape,
                      out_dtype, geom, thresh_mode=None, beta=None,
                      halo=False):
    B = ap.shape[0]
    TR, TC = tiles
    nr, nc = nshape
    lo_r, lo_c, pr, pc, ROWS, COLS = geom
    geoms = ((nr // TR, TR, lo_r, ROWS, nr, 16),
             (nc // TC, TC, lo_c, COLS, nc, 128)) if halo else None
    kernel = _swt_inv_mxu_kernel(scheme, ROWS, COLS, TR, TC, thresh_mode,
                                 geoms)
    out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, nr, nc), out_dtype)
    mat_specs = [
        pl.BlockSpec(m.shape, (lambda b, i, j: (0, 0)),
                     memory_space=pltpu.VMEM) for m in mats
    ]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 4 + mat_specs
    args = (ap, hp, vp, dp) + tuple(mats)
    if thresh_mode is not None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (jnp.asarray(beta, jnp.float32).reshape(1),) + args
    tiles_scr = [pltpu.VMEM((ROWS, COLS), t.dtype)
                 for t in (ap, hp, vp, dp)]
    return pl.pallas_call(
        kernel,
        grid=(B, nr // TR, nc // TC),
        out_shape=shape,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=tiles_scr
        + [pltpu.SemaphoreType.DMA((4, 9) if halo else (4,))],
        interpret=_INTERPRET(),
    )(*args)


def swt_inv_level_2d_mxu(a, h, v, d, rec_lo, rec_hi, level: int, mode: str,
                         out_dtype=None, threshold=None, pad_fn=None):
    """One à-trous inverse level via MXU matmuls (1/2-per-pass in the
    matrices); None if unsupported.  ``threshold=("soft"|"hard", beta)``
    fuses the detail threshold into the tile read."""
    B, r, c = a.shape
    hlen = len(rec_lo)
    f = 1 << (level - 1)
    if mode == "mixed":
        scheme = "b3"
        out_dtype = jnp.float32
    elif mode == "bf16":
        # single pass at EVERY level (see _swt_scheme: undecimated
        # levels never shrink, so b3 would triple most of the work);
        # the accuracy tier / PDWT_TPU_SWT_BF16_SCHEME upgrade to b2f
        out_dtype = jnp.bfloat16 if out_dtype is None else out_dtype
        scheme = _swt_bf16_scheme(default="fd")
        a = a.astype(jnp.float32)
    else:
        raise ValueError(mode)
    tiles = _swt_mxu_tiles(r, c, hlen, f, scheme)
    if tiles is None:
        return None
    TR, TC = tiles
    cen = conv.swt_inv_center(hlen) * f
    geom = _swt_geometry(hlen, f, cen, tiles)
    lo_r, lo_c, pr, pc, ROWS, COLS = geom

    S, T = _swt_synthesis_mats(rec_lo, rec_hi, ROWS, COLS, pr, pc, TR, TC, f)
    mats = _mats_for_scheme((S, T), scheme)
    tmode, beta = (None, None) if threshold is None else threshold

    from .halo_dma import halo_enabled, halo_safe
    if pad_fn is None and halo_enabled() \
            and halo_safe(r // TR, TR, lo_r, ROWS, r) \
            and halo_safe(c // TC, TC, lo_c, COLS, c):
        return _swt_inv_mxu_call(a, h, v, d, mats, scheme,
                                 (TR, TC), (r, c), out_dtype, geom,
                                 thresh_mode=tmode, beta=beta, halo=True)

    hi_r = (r - TR + ROWS) - r - lo_r
    hi_c = (c - TC + COLS) - c - lo_c
    pad = pad_fn or conv.wrap_pad

    def pad2(arr):
        arr = pad(arr, -1, lo_c, hi_c)
        return pad(arr, -2, lo_r, hi_r)

    return _swt_inv_mxu_call(pad2(a), pad2(h), pad2(v), pad2(d), mats,
                             scheme, (TR, TC), (r, c), out_dtype, geom,
                             thresh_mode=tmode, beta=beta)


# ---------------------------------------------------------------------------
# autodiff wrappers (linear transforms; adjoint algebra as swt_pallas)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def swt_fwd_level_2d_mxu_ad(x, dec_lo_t, dec_hi_t, level, mode):
    return swt_fwd_level_2d_mxu(x, np.asarray(dec_lo_t),
                                np.asarray(dec_hi_t), level, mode)


def _swt_fwd_mxu_fwd(x, dec_lo_t, dec_hi_t, level, mode):
    return (swt_fwd_level_2d_mxu_ad(x, dec_lo_t, dec_hi_t, level, mode),
            jnp.zeros((0,), x.dtype))


def _swt_fwd_mxu_bwd(dec_lo_t, dec_hi_t, level, mode, probe, ct):
    from .swt_pallas import _fma_swt_inv

    a, h, v, d = ct
    lo_r = 2.0 * np.asarray(dec_lo_t)[::-1]
    hi_r = 2.0 * np.asarray(dec_hi_t)[::-1]
    y = swt_inv_level_2d_mxu(a, h, v, d, lo_r, hi_r, level, mode,
                             out_dtype=probe.dtype)
    if y is None:
        y = _fma_swt_inv(a.astype(jnp.float32), h.astype(jnp.float32),
                         v.astype(jnp.float32), d.astype(jnp.float32),
                         lo_r, hi_r, level).astype(probe.dtype)
    return (y,)


swt_fwd_level_2d_mxu_ad.defvjp(_swt_fwd_mxu_fwd, _swt_fwd_mxu_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def swt_inv_level_2d_mxu_ad(a, h, v, d, rec_lo_t, rec_hi_t, level, mode,
                            out_dtype=None):
    return swt_inv_level_2d_mxu(a, h, v, d, np.asarray(rec_lo_t),
                                np.asarray(rec_hi_t), level, mode,
                                out_dtype=out_dtype)


def _swt_inv_mxu_fwd(a, h, v, d, rec_lo_t, rec_hi_t, level, mode,
                     out_dtype):
    res = tuple(jnp.zeros((0,), t.dtype) for t in (a, h, v, d))
    return swt_inv_level_2d_mxu_ad(a, h, v, d, rec_lo_t, rec_hi_t, level,
                                   mode, out_dtype), res


def _swt_inv_mxu_bwd(rec_lo_t, rec_hi_t, level, mode, out_dtype, probes,
                     ct):
    from .swt_pallas import _fma_swt_fwd

    lo_r = 0.5 * np.asarray(rec_lo_t)[::-1]
    hi_r = 0.5 * np.asarray(rec_hi_t)[::-1]
    res = swt_fwd_level_2d_mxu(ct, lo_r, hi_r, level, mode)
    if res is None:
        res = _fma_swt_fwd(ct.astype(jnp.float32), lo_r, hi_r, level)
    return tuple(t.astype(p.dtype) for t, p in zip(res, probes))


swt_inv_level_2d_mxu_ad.defvjp(_swt_inv_mxu_fwd, _swt_inv_mxu_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def swt_inv_level_2d_mxu_denoise_ad(a, h, v, d, beta, rec_lo_t, rec_hi_t,
                                    level, mode, thr_mode, out_dtype=None):
    """Differentiable fused threshold + à-trous MXU inverse level (the
    MXU counterpart of swt_pallas.swt_inv_level_2d_denoise_ad):
    backward = linear-synthesis adjoint chained through the threshold's
    a.e.-derivative with the saved un-thresholded details as the mask."""
    return swt_inv_level_2d_mxu(a, h, v, d, np.asarray(rec_lo_t),
                                np.asarray(rec_hi_t), level, mode,
                                out_dtype=out_dtype,
                                threshold=(thr_mode, beta))


def _swt_inv_mxu_den_fwd(a, h, v, d, beta, rec_lo_t, rec_hi_t, level, mode,
                         thr_mode, out_dtype):
    y = swt_inv_level_2d_mxu_denoise_ad(a, h, v, d, beta, rec_lo_t,
                                        rec_hi_t, level, mode, thr_mode,
                                        out_dtype)
    res = None if y is None else (h, v, d, beta, jnp.zeros((0,), a.dtype))
    return y, res


def _swt_inv_mxu_den_bwd(rec_lo_t, rec_hi_t, level, mode, thr_mode,
                         out_dtype, res, ct):
    from .swt_pallas import _fma_swt_fwd

    h, v, d, beta, a_probe = res
    lo_r = 0.5 * np.asarray(rec_lo_t)[::-1]
    hi_r = 0.5 * np.asarray(rec_hi_t)[::-1]
    out = swt_fwd_level_2d_mxu(ct, lo_r, hi_r, level, mode)
    if out is None:
        out = _fma_swt_fwd(ct.astype(jnp.float32), lo_r, hi_r, level)
    from .swt_pallas import _thresh_vjp_factors

    ct_a, cth_p, ctv_p, ctd_p = out
    f32 = jnp.float32
    b = jnp.asarray(beta, f32)
    cts, ct_beta = [], 0.0
    for cp, t in zip((cth_p, ctv_p, ctd_p), (h, v, d)):
        tf = t.astype(f32)
        m = jnp.abs(tf) > b
        dfdx, dfdb = _thresh_vjp_factors(thr_mode, tf, b)
        cts.append(jnp.where(m, cp.astype(f32) * dfdx, 0.0).astype(t.dtype))
        if dfdb is not None:
            ct_beta = ct_beta + jnp.sum(
                jnp.where(m, cp.astype(f32) * dfdb, 0.0))
    ct_beta = jnp.asarray(ct_beta, jnp.result_type(beta)).reshape(
        jnp.shape(beta))
    return (ct_a.astype(a_probe.dtype), cts[0], cts[1], cts[2], ct_beta)


swt_inv_level_2d_mxu_denoise_ad.defvjp(_swt_inv_mxu_den_fwd,
                                       _swt_inv_mxu_den_bwd)
