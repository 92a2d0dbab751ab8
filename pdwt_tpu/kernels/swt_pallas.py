"""Fused à-trous (SWT) level kernels and batched-1D kernels (Pallas TPU).

SWT (reference: src/separable.cu:409-493, 553-626): stride 1, filter
dilated by ``2^(level-1)``; no decimation means no parity machinery —
each pass is a plain dual FIR of contiguous slices at dilated offsets.
The inverse carries the 1/2-per-pass normalization in its taps
(reference: src/separable.cu:581-584).  Both separable passes fuse into
one kernel per level, like the decimated kernels in separable_pallas.

Batched 1D (reference: src/separable.cu:213-236): the batch rides the
sublane axis untouched; the signal axis transposes into sublanes for the
(parity-split) FIR and back.
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
    _fir_decim_sub,
    _fir_synth_sub,
    _phases,
    _pick_tile,
    _poly_geometry,
    _taps,
    _vpu_tile_override,
    _SUB_TILES,
    _LANE_TILES,
    _VMEM_BUDGET,
)


def _fir_atrous_sub(x, taps_lo, taps_hi, n_out, f, off=0):
    """Dual à-trous FIR along axis 0: out[m] = sum_j t[j]*x[off+m+f*j].

    The shifted window is formed once per tap and shared by both
    filters (the vreg-shift per misaligned slice dominates the FMA)."""
    acc_lo = acc_hi = None
    for j in range(len(taps_lo)):
        sl = x[off + f * j:off + f * j + n_out, :]
        tl = taps_lo[j] * sl
        th = taps_hi[j] * sl
        acc_lo = tl if acc_lo is None else acc_lo + tl
        acc_hi = th if acc_hi is None else acc_hi + th
    return acc_lo, acc_hi


def _fir_atrous_pair_sub(lo_band, hi_band, taps_lo, taps_hi, n_out, f,
                         off=0):
    """À-trous synthesis combine: out[m] = sum_j tl[j]*lo[off+m+f*j] +
    th[j]*hi[off+m+f*j] (taps carry the 1/2 factor)."""
    acc = None
    for j in range(len(taps_lo)):
        term = (taps_lo[j] * lo_band[off + f * j:off + f * j + n_out, :]
                + taps_hi[j] * hi_band[off + f * j:off + f * j + n_out, :])
        acc = term if acc is None else acc + term
    return acc


def _swt_tiles(nr: int, nc: int, hlen: int, f: int, lo: int = 0):
    span = (hlen - 1) * f
    _, _, pr, pc = _phases(lo)
    ov = _vpu_tile_override(nr, nc, "swt")
    if ov is not None:
        return ov
    best = None
    for tr in _SUB_TILES:
        if nr % tr:
            continue
        for tc in _LANE_TILES:
            if nc % tc:
                continue
            rows = _ceil_to(tr + span + pr, 8)
            cols = _ceil_to(tc + span + pc, 128)
            if rows * cols * 4 * (hlen // 2 + 8) > _VMEM_BUDGET:
                continue
            if best is None or tr * tc > best[0] * best[1]:
                best = (tr, tc)
    return best


# ---------------------------------------------------------------------------
# SWT forward level
# ---------------------------------------------------------------------------

def _make_swt_fwd_kernel(taps_lo, taps_hi, hlen, f, TR, TC, grid):
    from .separable_pallas import _decode3

    span = (hlen - 1) * f
    B, GI, GJ = grid
    nsteps = B * GI * GJ
    _, _, pr, pc = _phases(conv.fwd_center(hlen) * f)
    rows = _ceil_to(TR + span + pr, 8)
    cols = _ceil_to(TC + span + pc, 128)

    def copy_for(xp_hbm, xt2, sems, t):
        b, i, j = _decode3(t, GI, GJ)
        slot = t % 2
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(TR * i, rows), pl.ds(TC * j, cols)],
            xt2.at[slot], sems.at[slot])

    def kernel(xp_hbm, a_ref, h_ref, v_ref, d_ref, xt2, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        t = (b * GI + i) * GJ + j

        @pl.when(t == 0)
        def _():
            copy_for(xp_hbm, xt2, sems, t).start()

        @pl.when(t + 1 < nsteps)
        def _():
            copy_for(xp_hbm, xt2, sems, t + 1).start()

        copy_for(xp_hbm, xt2, sems, t).wait()

        def compute(x):
            tlo, thi = _fir_atrous_sub(x, taps_lo, taps_hi, TR, f, off=pr)
            a_t, v_t = _fir_atrous_sub(tlo.T, taps_lo, taps_hi, TC, f,
                                       off=pc)
            h_t, d_t = _fir_atrous_sub(thi.T, taps_lo, taps_hi, TC, f,
                                       off=pc)
            a_ref[0] = a_t.T
            h_ref[0] = h_t.T
            v_ref[0] = v_t.T
            d_ref[0] = d_t.T

        slot = t % 2

        @pl.when(slot == 0)
        def _():
            compute(xt2[0])

        @pl.when(slot == 1)
        def _():
            compute(xt2[1])

    return kernel, rows, cols


@functools.partial(jax.jit,
                   static_argnames=("taps", "hlen", "f", "tiles", "nshape"))
def _swt_fwd_call(xp, taps, hlen, f, tiles, nshape):
    taps_lo, taps_hi = taps
    TR, TC = tiles
    B = xp.shape[0]
    nr, nc = nshape
    grid = (B, nr // TR, nc // TC)
    kernel, rows, cols = _make_swt_fwd_kernel(taps_lo, taps_hi, hlen, f,
                                              TR, TC, grid)
    out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, nr, nc), xp.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(shape, shape, shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((2, rows, cols), xp.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=_INTERPRET(),
    )(xp)


def swt_fwd_level_2d(x, dec_lo, dec_hi, level: int):
    """One à-trous forward level on (B, R, C) -> (a, h, v, d) full-size;
    None if unsupported."""
    B, r, c = x.shape
    hlen = len(dec_lo)
    f = 1 << (level - 1)
    if x.dtype != jnp.float32:
        return None
    cen = conv.fwd_center(hlen) * f
    tiles = _swt_tiles(r, c, hlen, f, cen)
    if tiles is None:
        return None
    TR, TC = tiles
    span = (hlen - 1) * f
    lo_r, lo_c, pr, pc = _phases(cen)
    rows_al = _ceil_to(TR + span + pr, 8)
    cols_al = _ceil_to(TC + span + pc, 128)
    hi_r = (r - TR + rows_al) - r - lo_r
    hi_c = (c - TC + cols_al) - c - lo_c
    xp = conv.wrap_pad(x, -1, lo_c, hi_c)
    xp = conv.wrap_pad(xp, -2, lo_r, hi_r)
    return _swt_fwd_call(xp, (_taps(dec_lo), _taps(dec_hi)), hlen, f,
                         (TR, TC), (r, c))


# ---------------------------------------------------------------------------
# SWT inverse level
# ---------------------------------------------------------------------------

def _thresh_tile(x, mode, beta):
    if mode == "soft":
        return jnp.sign(x) * jnp.maximum(jnp.abs(x) - beta, 0.0)
    if mode == "hard":
        return jnp.where(jnp.abs(x) > beta, x, 0.0)
    if mode == "garrote":
        safe = jnp.where(x == 0, 1.0, x)
        return jnp.where(x * x > beta * beta, x - beta * beta / safe, 0.0)
    raise ValueError(mode)


def _thresh_vjp_factors(mode, t, b):
    """(d thresh/d x, d thresh/d beta) on the mask |t| > b (a.e.
    derivatives; zero off-mask).  Shared by the VPU and MXU fused
    denoise backward passes."""
    if mode == "soft":
        return 1.0, -jnp.sign(t)
    if mode == "hard":
        return 1.0, None
    if mode == "garrote":
        safe = jnp.where(t == 0, 1.0, t)
        return 1.0 + (b * b) / (safe * safe), -2.0 * b / safe
    raise ValueError(mode)


def _make_swt_inv_kernel(taps_lo, taps_hi, hlen, f, TR, TC, grid,
                         thresh_mode):
    from .separable_pallas import _decode3

    span = (hlen - 1) * f
    B, GI, GJ = grid
    nsteps = B * GI * GJ
    _, _, pr, pc = _phases((hlen // 2) * f)
    rows = _ceil_to(TR + span + pr, 8)
    cols = _ceil_to(TC + span + pc, 128)

    def copies_for(srcs, tiles, sems, t):
        b, i, j = _decode3(t, GI, GJ)
        slot = t % 2
        return [
            pltpu.make_async_copy(
                src.at[b, pl.ds(TR * i, rows), pl.ds(TC * j, cols)],
                tile.at[slot], sems.at[slot, idx])
            for idx, (src, tile) in enumerate(zip(srcs, tiles))
        ]

    def kernel(*refs):
        if thresh_mode is not None:
            beta_ref = refs[0]
            refs = refs[1:]
        a_hbm, h_hbm, v_hbm, d_hbm, out_ref, at, ht, vt, dt, sems = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        t = (b * GI + i) * GJ + j
        srcs = (a_hbm, h_hbm, v_hbm, d_hbm)
        tiles = (at, ht, vt, dt)

        @pl.when(t == 0)
        def _():
            for dma in copies_for(srcs, tiles, sems, t):
                dma.start()

        @pl.when(t + 1 < nsteps)
        def _():
            for dma in copies_for(srcs, tiles, sems, t + 1):
                dma.start()

        for dma in copies_for(srcs, tiles, sems, t):
            dma.wait()

        def compute(s):
            a, h, v, d = at[s], ht[s], vt[s], dt[s]
            if thresh_mode is not None:
                # fused detail threshold: the separate elementwise pass
                # over 3 full-size subbands per level (and its HBM
                # round-trip) disappears into the tile read.
                bval = beta_ref[0]
                h = _thresh_tile(h, thresh_mode, bval)
                v = _thresh_tile(v, thresh_mode, bval)
                d = _thresh_tile(d, thresh_mode, bval)
            t1 = _fir_atrous_pair_sub(a, h, taps_lo, taps_hi, TR, f,
                                      off=pr)
            t2 = _fir_atrous_pair_sub(v, d, taps_lo, taps_hi, TR, f,
                                      off=pr)
            out_t = _fir_atrous_pair_sub(t1.T, t2.T, taps_lo, taps_hi,
                                         TC, f, off=pc)
            out_ref[0] = out_t.T

        slot = t % 2

        @pl.when(slot == 0)
        def _():
            compute(0)

        @pl.when(slot == 1)
        def _():
            compute(1)

    return kernel, rows, cols


@functools.partial(jax.jit,
                   static_argnames=("taps", "hlen", "f", "tiles", "nshape",
                                    "thresh_mode"))
def _swt_inv_call(ap, hp, vp, dp, taps, hlen, f, tiles, nshape,
                  thresh_mode=None, beta=None):
    taps_lo, taps_hi = taps
    TR, TC = tiles
    B = ap.shape[0]
    nr, nc = nshape
    grid = (B, nr // TR, nc // TC)
    kernel, rows, cols = _make_swt_inv_kernel(taps_lo, taps_hi, hlen, f,
                                              TR, TC, grid, thresh_mode)
    out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, nr, nc), ap.dtype)
    tile = lambda: pltpu.VMEM((2, rows, cols), ap.dtype)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 4
    args = (ap, hp, vp, dp)
    if thresh_mode is not None:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        args = (jnp.asarray(beta, ap.dtype).reshape(1),) + args
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=shape,
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[tile(), tile(), tile(), tile(),
                        pltpu.SemaphoreType.DMA((2, 4))],
        interpret=_INTERPRET(),
    )(*args)


def swt_inv_level_2d(a, h, v, d, rec_lo, rec_hi, level: int,
                     threshold=None):
    """One à-trous inverse level (1/2-per-pass normalization included);
    None if unsupported.  ``threshold=("soft"|"hard", beta)`` fuses the
    detail threshold into the tile read (beta may be traced); note the
    fused form is NOT differentiable — use the _ad wrapper without
    threshold for gradients."""
    B, r, c = a.shape
    hlen = len(rec_lo)
    f = 1 << (level - 1)
    if a.dtype != jnp.float32:
        return None
    cen = (hlen // 2) * f  # swt synthesis center (src/separable.cu:559-568)
    tiles = _swt_tiles(r, c, hlen, f, cen)
    if tiles is None:
        return None
    TR, TC = tiles
    span = (hlen - 1) * f
    lo_r, lo_c, pr, pc = _phases(cen)
    rows_al = _ceil_to(TR + span + pr, 8)
    cols_al = _ceil_to(TC + span + pc, 128)
    hi_r = (r - TR + rows_al) - r - lo_r
    hi_c = (c - TC + cols_al) - c - lo_c

    def pad2(arr):
        arr = conv.wrap_pad(arr, -1, lo_c, hi_c)
        return conv.wrap_pad(arr, -2, lo_r, hi_r)

    taps = (_taps(np.asarray(rec_lo) * 0.5), _taps(np.asarray(rec_hi) * 0.5))
    mode, beta = (None, None) if threshold is None else threshold
    return _swt_inv_call(pad2(a), pad2(h), pad2(v), pad2(d), taps, hlen, f,
                         (TR, TC), (r, c), thresh_mode=mode, beta=beta)


# ---------------------------------------------------------------------------
# batched 1D (decimated): batch on sublanes, signal transposed through
# ---------------------------------------------------------------------------

def _tiles_1d(B: int, m: int, hlen: int, cols_of_tc):
    """Largest (TB, TC) under the VMEM budget (TB divides batch, TC the
    decimated signal length)."""
    best = None
    for tb in (512, 256, 128, 64, 32, 16, 8):
        if B % tb:
            continue
        for tc in _LANE_TILES:
            if m % tc:
                continue
            if tb * cols_of_tc(tc) * 4 * (hlen // 2 + 8) > _VMEM_BUDGET:
                continue
            if best is None or tb * tc > best[0] * best[1]:
                best = (tb, tc)
    return best

def _make_1d_fwd_kernel(taps_lo, taps_hi, hlen, TB, TC):
    _, _, _, pc = _phases(conv.fwd_center(hlen), lane_aligned=False)
    cols = _ceil_to(2 * TC + hlen - 2 + pc, 128)

    def kernel(xp_hbm, lo_ref, hi_ref, xt, sem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(TB * b, TB), pl.ds(2 * TC * j, cols)], xt, sem)
        dma.start()
        dma.wait()
        lo_t, hi_t = _fir_decim_sub(xt[:].T, taps_lo, taps_hi, TC, off=pc)
        lo_ref[:] = lo_t.T
        hi_ref[:] = hi_t.T

    return kernel, cols


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "tiles", "m"))
def _fwd1d_call(xp, taps, hlen, tiles, m):
    taps_lo, taps_hi = taps
    TB, TC = tiles
    B = xp.shape[0]
    kernel, cols = _make_1d_fwd_kernel(taps_lo, taps_hi, hlen, TB, TC)
    out_spec = pl.BlockSpec((TB, TC), lambda b, j: (b, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, m), xp.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // TB, m // TC),
        out_shape=(shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((TB, cols), xp.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=_INTERPRET(),
    )(xp)


def fwd_level_1d(x, dec_lo, dec_hi):
    """One decimated level on (B, N) even N -> (lo, hi) each (B, N/2);
    None if unsupported."""
    B, n = x.shape
    hlen = len(dec_lo)
    if x.dtype != jnp.float32 or hlen % 2 or n % 2:
        return None
    m = n // 2
    _pc = _phases(conv.fwd_center(hlen), lane_aligned=False)[3]
    tiles = _tiles_1d(B, m, hlen,
                      lambda tc: _ceil_to(2 * tc + hlen - 2 + _pc, 128))
    if tiles is None:
        return None
    TB, TC = tiles
    _, lo_c, _, pc = _phases(conv.fwd_center(hlen), lane_aligned=False)
    cols_al = _ceil_to(2 * TC + hlen - 2 + pc, 128)
    hi_c = (n - 2 * TC + cols_al) - n - lo_c
    xp = conv.wrap_pad(x, -1, lo_c, hi_c)
    return _fwd1d_call(xp, (_taps(dec_lo), _taps(dec_hi)), hlen, (TB, TC), m)


def _make_1d_inv_kernel(taps_lo, taps_hi, hlen, TB, TC, pad):
    lo_pad, hi_pad = pad
    _, _, _, pc = _phases(lo_pad, lane_aligned=False)
    cols = _ceil_to(TC + lo_pad + hi_pad + pc, 128)

    def kernel(lo_hbm, hi_hbm, out_ref, lt, ht, sems):
        b = pl.program_id(0)
        j = pl.program_id(1)
        d1 = pltpu.make_async_copy(
            lo_hbm.at[pl.ds(TB * b, TB), pl.ds(TC * j, cols)], lt, sems.at[0])
        d2 = pltpu.make_async_copy(
            hi_hbm.at[pl.ds(TB * b, TB), pl.ds(TC * j, cols)], ht, sems.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()
        out_t = _fir_synth_sub(lt[:].T, ht[:].T, taps_lo, taps_hi, TC,
                               off=pc)
        out_ref[:] = out_t.T

    return kernel, cols


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "tiles", "pad",
                                             "m"))
def _inv1d_call(lp, hp, taps, hlen, tiles, pad, m):
    taps_lo, taps_hi = taps
    TB, TC = tiles
    B = lp.shape[0]
    kernel, cols = _make_1d_inv_kernel(taps_lo, taps_hi, hlen, TB, TC, pad)
    out_spec = pl.BlockSpec((TB, 2 * TC), lambda b, j: (b, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, 2 * m), lp.dtype)
    tile = lambda: pltpu.VMEM((TB, cols), lp.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // TB, m // TC),
        out_shape=shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=out_spec,
        scratch_shapes=[tile(), tile(), pltpu.SemaphoreType.DMA((2,))],
        interpret=_INTERPRET(),
    )(lp, hp)


def inv_level_1d(lo, hi, rec_lo, rec_hi):
    """One decimated inverse level: (B, M) x2 -> (B, 2M); None if
    unsupported."""
    B, m = lo.shape
    hlen = len(rec_lo)
    if lo.dtype != jnp.float32 or hlen % 2:
        return None
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    _, lo_c, _, pc = _phases(lo_pad, lane_aligned=False)
    tiles = _tiles_1d(B, m, hlen,
                      lambda tc: _ceil_to(tc + lo_pad + hi_pad + pc, 128))
    if tiles is None:
        return None
    TB, TC = tiles
    cols_al = _ceil_to(TC + lo_pad + hi_pad + pc, 128)
    hi_c = (m - TC + cols_al) - m - lo_c

    def pad1(arr):
        return conv.wrap_pad(arr, -1, lo_c, hi_c)

    return _inv1d_call(pad1(lo), pad1(hi), (_taps(rec_lo), _taps(rec_hi)),
                       hlen, (TB, TC), (lo_pad, hi_pad), m)


# ---------------------------------------------------------------------------
# batched 1D a-trous (SWT)
# ---------------------------------------------------------------------------

def _make_swt1d_fwd_kernel(taps_lo, taps_hi, hlen, f, TB, TC):
    span = (hlen - 1) * f
    _, _, _, pc = _phases(conv.fwd_center(hlen) * f)
    cols = _ceil_to(TC + span + pc, 128)

    def kernel(xp_hbm, lo_ref, hi_ref, xt, sem):
        b = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            xp_hbm.at[pl.ds(TB * b, TB), pl.ds(TC * j, cols)], xt, sem)
        dma.start()
        dma.wait()
        lo_t, hi_t = _fir_atrous_sub(xt[:].T, taps_lo, taps_hi, TC, f,
                                     off=pc)
        lo_ref[:] = lo_t.T
        hi_ref[:] = hi_t.T

    return kernel, cols


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "f", "tiles",
                                             "n"))
def _swt1d_fwd_call(xp, taps, hlen, f, tiles, n):
    taps_lo, taps_hi = taps
    TB, TC = tiles
    B = xp.shape[0]
    kernel, cols = _make_swt1d_fwd_kernel(taps_lo, taps_hi, hlen, f, TB, TC)
    out_spec = pl.BlockSpec((TB, TC), lambda b, j: (b, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, n), xp.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // TB, n // TC),
        out_shape=(shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[pltpu.VMEM((TB, cols), xp.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=_INTERPRET(),
    )(xp)


def swt_fwd_level_1d(x, dec_lo, dec_hi, level: int):
    """One 1D a-trous level: (B, N) -> (lo, hi) full-size; None if
    unsupported."""
    B, n = x.shape
    hlen = len(dec_lo)
    f = 1 << (level - 1)
    if x.dtype != jnp.float32:
        return None
    span = (hlen - 1) * f
    cen = conv.fwd_center(hlen) * f
    _, lo_c, _, pc = _phases(cen)
    tiles = _tiles_1d(B, n, hlen,
                      lambda tc: _ceil_to(tc + span + pc, 128))
    if tiles is None:
        return None
    TB, TC = tiles
    cols_al = _ceil_to(TC + span + pc, 128)
    hi_c = (n - TC + cols_al) - n - lo_c
    xp = conv.wrap_pad(x, -1, lo_c, hi_c)
    return _swt1d_fwd_call(xp, (_taps(dec_lo), _taps(dec_hi)), hlen, f,
                           (TB, TC), n)


def _make_swt1d_inv_kernel(taps_lo, taps_hi, hlen, f, TB, TC):
    span = (hlen - 1) * f
    _, _, _, pc = _phases((hlen // 2) * f)
    cols = _ceil_to(TC + span + pc, 128)

    def kernel(lo_hbm, hi_hbm, out_ref, lt, ht, sems):
        b = pl.program_id(0)
        j = pl.program_id(1)
        d1 = pltpu.make_async_copy(
            lo_hbm.at[pl.ds(TB * b, TB), pl.ds(TC * j, cols)], lt, sems.at[0])
        d2 = pltpu.make_async_copy(
            hi_hbm.at[pl.ds(TB * b, TB), pl.ds(TC * j, cols)], ht, sems.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()
        out_t = _fir_atrous_pair_sub(lt[:].T, ht[:].T, taps_lo, taps_hi,
                                     TC, f, off=pc)
        out_ref[:] = out_t.T

    return kernel, cols


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "f", "tiles",
                                             "n"))
def _swt1d_inv_call(lp, hp, taps, hlen, f, tiles, n):
    taps_lo, taps_hi = taps
    TB, TC = tiles
    B = lp.shape[0]
    kernel, cols = _make_swt1d_inv_kernel(taps_lo, taps_hi, hlen, f, TB, TC)
    out_spec = pl.BlockSpec((TB, TC), lambda b, j: (b, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, n), lp.dtype)
    tile = lambda: pltpu.VMEM((TB, cols), lp.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // TB, n // TC),
        out_shape=shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=out_spec,
        scratch_shapes=[tile(), tile(), pltpu.SemaphoreType.DMA((2,))],
        interpret=_INTERPRET(),
    )(lp, hp)


def swt_inv_level_1d(lo, hi, rec_lo, rec_hi, level: int):
    """One 1D a-trous inverse level (single pass -> one 1/2 factor,
    reference: src/separable.cu:653-672); None if unsupported."""
    B, n = lo.shape
    hlen = len(rec_lo)
    f = 1 << (level - 1)
    if lo.dtype != jnp.float32:
        return None
    span = (hlen - 1) * f
    cen = (hlen // 2) * f
    _, lo_c, _, pc = _phases(cen)
    tiles = _tiles_1d(B, n, hlen,
                      lambda tc: _ceil_to(tc + span + pc, 128))
    if tiles is None:
        return None
    TB, TC = tiles
    cols_al = _ceil_to(TC + span + pc, 128)
    hi_c = (n - TC + cols_al) - n - lo_c

    def pad1(arr):
        return conv.wrap_pad(arr, -1, lo_c, hi_c)

    taps = (_taps(np.asarray(rec_lo) * 0.5), _taps(np.asarray(rec_hi) * 0.5))
    return _swt1d_inv_call(pad1(lo), pad1(hi), taps, hlen, f, (TB, TC), n)


# ---------------------------------------------------------------------------
# autodiff wrappers — the a-trous analysis' adjoint is the a-trous
# correlation with reversed taps at the complementary center, which for
# even hlen is exactly the inverse kernel's center (hlen/2)*f; the inverse
# kernels bake a 0.5-per-pass factor, cancelled by doubling the taps.
# ---------------------------------------------------------------------------

def _fma_swt_fwd(x, lo, hi, level):
    f = 1 << (level - 1)
    dec = (np.asarray(lo), np.asarray(hi))
    z = conv.analysis_pass(x[:, None], dec, axis=-1, dilation=f,
                           decimate=False, backend="fma")
    z = conv.analysis_pass(z, dec, axis=-2, dilation=f, decimate=False,
                           backend="fma")
    return z[:, 0], z[:, 1], z[:, 2], z[:, 3]


def _fma_swt_inv(a, h, v, d, lo, hi, level):
    """A-trous synthesis WITHOUT normalization (filters passed as-is are
    applied at (hlen//2)*f per axis)."""
    f = 1 << (level - 1)
    rec = (np.asarray(lo) * 0.5, np.asarray(hi) * 0.5)
    z = jnp.concatenate([t[:, None] for t in (a, h, v, d)], axis=1)
    t2 = conv.synthesis_pass(z, rec, axis=-2, dilation=f, decimated=False,
                             backend="fma")
    return conv.synthesis_pass(t2, rec, axis=-1, dilation=f,
                               decimated=False, backend="fma")[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def swt_fwd_level_2d_ad(x, dec_lo_t, dec_hi_t, level):
    return swt_fwd_level_2d(x, np.asarray(dec_lo_t), np.asarray(dec_hi_t),
                            level)


def _swt_fwd2d_fwd(x, dec_lo_t, dec_hi_t, level):
    return swt_fwd_level_2d_ad(x, dec_lo_t, dec_hi_t, level), None


def _swt_fwd2d_bwd(dec_lo_t, dec_hi_t, level, _, ct):
    a, h, v, d = ct
    # adjoint = inverse-kernel structure with taps 2*f[::-1] (cancels the
    # baked 1/2 per pass)
    lo_r = 2.0 * np.asarray(dec_lo_t)[::-1]
    hi_r = 2.0 * np.asarray(dec_hi_t)[::-1]
    y = swt_inv_level_2d(a, h, v, d, lo_r, hi_r, level)
    if y is None:
        y = _fma_swt_inv(a, h, v, d, lo_r, hi_r, level)
    return (y,)


swt_fwd_level_2d_ad.defvjp(_swt_fwd2d_fwd, _swt_fwd2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def swt_inv_level_2d_ad(a, h, v, d, rec_lo_t, rec_hi_t, level):
    return swt_inv_level_2d(a, h, v, d, np.asarray(rec_lo_t),
                            np.asarray(rec_hi_t), level)


def _swt_inv2d_fwd(a, h, v, d, rec_lo_t, rec_hi_t, level):
    return swt_inv_level_2d_ad(a, h, v, d, rec_lo_t, rec_hi_t, level), None


def _swt_inv2d_bwd(rec_lo_t, rec_hi_t, level, _, ct):
    # adjoint of (synthesis with 1/2-per-pass at center c2) = analysis
    # with 0.5*taps[::-1] PER AXIS at the complementary center (= fwd
    # center for even hlen); total 1/4 like the primal
    lo_r = 0.5 * np.asarray(rec_lo_t)[::-1]
    hi_r = 0.5 * np.asarray(rec_hi_t)[::-1]
    res = swt_fwd_level_2d(ct, lo_r, hi_r, level)
    if res is None:
        res = _fma_swt_fwd(ct, lo_r, hi_r, level)
    return res


swt_inv_level_2d_ad.defvjp(_swt_inv2d_fwd, _swt_inv2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def swt_inv_level_2d_denoise_ad(a, h, v, d, beta, rec_lo_t, rec_hi_t,
                                level, mode):
    """Differentiable fused detail-threshold + à-trous inverse level.

    Same computation as ``swt_inv_level_2d(..., threshold=(mode, beta))``
    but with a custom VJP: the backward pass runs the (linear) analysis
    adjoint and chains through the threshold's a.e.-derivative using the
    saved UN-thresholded details as the mask (soft/hard: 1{|x|>beta};
    soft also contributes -sign(x)·1{|x|>beta} to d/dbeta).  Returns
    None when the kernel geometry is unsupported (caller falls back to
    the unfused, natively-differentiable path)."""
    return swt_inv_level_2d(a, h, v, d, np.asarray(rec_lo_t),
                            np.asarray(rec_hi_t), level,
                            threshold=(mode, beta))


def _swt_inv2d_den_fwd(a, h, v, d, beta, rec_lo_t, rec_hi_t, level, mode):
    y = swt_inv_level_2d_denoise_ad(a, h, v, d, beta, rec_lo_t, rec_hi_t,
                                    level, mode)
    res = None if y is None else (h, v, d, beta)
    return y, res


def _swt_inv2d_den_bwd(rec_lo_t, rec_hi_t, level, mode, res, ct):
    h, v, d, beta = res
    # linear-synthesis adjoint (see _swt_inv2d_bwd)
    lo_r = 0.5 * np.asarray(rec_lo_t)[::-1]
    hi_r = 0.5 * np.asarray(rec_hi_t)[::-1]
    out = swt_fwd_level_2d(ct, lo_r, hi_r, level)
    if out is None:
        out = _fma_swt_fwd(ct, lo_r, hi_r, level)
    ct_a, cth_p, ctv_p, ctd_p = out
    b = jnp.asarray(beta, h.dtype)
    masks = [(jnp.abs(t) > b) for t in (h, v, d)]
    ct_bands, ct_beta = [], 0.0
    for m, cp, t in zip(masks, (cth_p, ctv_p, ctd_p), (h, v, d)):
        dfdx, dfdb = _thresh_vjp_factors(mode, t, b)
        ct_bands.append(jnp.where(m, cp * dfdx, 0.0))
        if dfdb is not None:
            ct_beta = ct_beta + jnp.sum(jnp.where(m, cp * dfdb, 0.0))
    ct_beta = jnp.asarray(ct_beta, jnp.result_type(beta)).reshape(
        jnp.shape(beta))
    return ct_a, ct_bands[0], ct_bands[1], ct_bands[2], ct_beta


swt_inv_level_2d_denoise_ad.defvjp(_swt_inv2d_den_fwd, _swt_inv2d_den_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fwd_level_1d_ad(x, dec_lo_t, dec_hi_t):
    return fwd_level_1d(x, np.asarray(dec_lo_t), np.asarray(dec_hi_t))


def _fwd1d_fwd(x, dec_lo_t, dec_hi_t):
    return fwd_level_1d_ad(x, dec_lo_t, dec_hi_t), None


def _fma_fwd1(x, lo, hi):
    dec = (np.asarray(lo), np.asarray(hi))
    z = conv.analysis_pass(x[:, None, None], dec, axis=-1, backend="fma")
    return z[:, 0, 0], z[:, 1, 0]


def _fma_inv1(lo_b, hi_b, lo, hi):
    rec = (np.asarray(lo), np.asarray(hi))
    z = jnp.concatenate([lo_b[:, None, None], hi_b[:, None, None]], axis=1)
    return conv.synthesis_pass(z, rec, axis=-1, backend="fma")[:, 0, 0]


def _fwd1d_bwd(dec_lo_t, dec_hi_t, _, ct):
    lo_b, hi_b = ct
    lo_r = np.asarray(dec_lo_t)[::-1]
    hi_r = np.asarray(dec_hi_t)[::-1]
    y = inv_level_1d(lo_b, hi_b, lo_r, hi_r)
    if y is None:
        y = _fma_inv1(lo_b, hi_b, lo_r, hi_r)
    return (y,)


fwd_level_1d_ad.defvjp(_fwd1d_fwd, _fwd1d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def inv_level_1d_ad(lo_b, hi_b, rec_lo_t, rec_hi_t):
    return inv_level_1d(lo_b, hi_b, np.asarray(rec_lo_t),
                        np.asarray(rec_hi_t))


def _inv1d_fwd(lo_b, hi_b, rec_lo_t, rec_hi_t):
    return inv_level_1d_ad(lo_b, hi_b, rec_lo_t, rec_hi_t), None


def _inv1d_bwd(rec_lo_t, rec_hi_t, _, ct):
    lo_r = np.asarray(rec_lo_t)[::-1]
    hi_r = np.asarray(rec_hi_t)[::-1]
    res = fwd_level_1d(ct, lo_r, hi_r)
    if res is None:
        res = _fma_fwd1(ct, lo_r, hi_r)
    return res


inv_level_1d_ad.defvjp(_inv1d_fwd, _inv1d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def swt_fwd_level_1d_ad(x, dec_lo_t, dec_hi_t, level):
    return swt_fwd_level_1d(x, np.asarray(dec_lo_t), np.asarray(dec_hi_t),
                            level)


def _swt_fwd1d_fwd(x, dec_lo_t, dec_hi_t, level):
    return swt_fwd_level_1d_ad(x, dec_lo_t, dec_hi_t, level), None


def _fma_swt_fwd1(x, lo, hi, level):
    f = 1 << (level - 1)
    dec = (np.asarray(lo), np.asarray(hi))
    z = conv.analysis_pass(x[:, None, None], dec, axis=-1, dilation=f,
                           decimate=False, backend="fma")
    return z[:, 0, 0], z[:, 1, 0]


def _fma_swt_inv1(lo_b, hi_b, lo, hi, level):
    f = 1 << (level - 1)
    rec = (np.asarray(lo) * 0.5, np.asarray(hi) * 0.5)
    z = jnp.concatenate([lo_b[:, None, None], hi_b[:, None, None]], axis=1)
    return conv.synthesis_pass(z, rec, axis=-1, dilation=f,
                               decimated=False, backend="fma")[:, 0, 0]


def _swt_fwd1d_bwd(dec_lo_t, dec_hi_t, level, _, ct):
    lo_b, hi_b = ct
    lo_r = 2.0 * np.asarray(dec_lo_t)[::-1]
    hi_r = 2.0 * np.asarray(dec_hi_t)[::-1]
    y = swt_inv_level_1d(lo_b, hi_b, lo_r, hi_r, level)
    if y is None:
        y = _fma_swt_inv1(lo_b, hi_b, lo_r, hi_r, level)
    return (y,)


swt_fwd_level_1d_ad.defvjp(_swt_fwd1d_fwd, _swt_fwd1d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def swt_inv_level_1d_ad(lo_b, hi_b, rec_lo_t, rec_hi_t, level):
    return swt_inv_level_1d(lo_b, hi_b, np.asarray(rec_lo_t),
                            np.asarray(rec_hi_t), level)


def _swt_inv1d_fwd(lo_b, hi_b, rec_lo_t, rec_hi_t, level):
    return swt_inv_level_1d_ad(lo_b, hi_b, rec_lo_t, rec_hi_t, level), None


def _swt_inv1d_bwd(rec_lo_t, rec_hi_t, level, _, ct):
    # single 1D pass -> baked factor is 1/2; adjoint scales by 1/2
    lo_r = 0.5 * np.asarray(rec_lo_t)[::-1]
    hi_r = 0.5 * np.asarray(rec_hi_t)[::-1]
    res = swt_fwd_level_1d(ct, lo_r, hi_r, level)
    if res is None:
        res = _fma_swt_fwd1(ct, lo_r, hi_r, level)
    return res


swt_inv_level_1d_ad.defvjp(_swt_inv1d_fwd, _swt_inv1d_bwd)


# ---------------------------------------------------------------------------
# padded entry points for the distributed engine (see separable_pallas
# fwd_geometry): the sharded path ring-halo-exchanges exactly these
# amounts and calls the kernels on pre-padded local shards.
# ---------------------------------------------------------------------------

def swt_fwd_geometry(r: int, c: int, hlen: int, level: int):
    """(lo_r, lo_c, hi_r, hi_c) padding the à-trous forward kernel
    expects (aligned lo pads, see separable_pallas.fwd_geometry), or
    None if unsupported."""
    f = 1 << (level - 1)
    cen = conv.fwd_center(hlen) * f
    tiles = _swt_tiles(r, c, hlen, f, cen)
    if tiles is None:
        return None
    TR, TC = tiles
    span = (hlen - 1) * f
    lo_r, lo_c, pr, pc = _phases(cen)
    rows_al = _ceil_to(TR + span + pr, 8)
    cols_al = _ceil_to(TC + span + pc, 128)
    hi_r = (r - TR + rows_al) - r - lo_r
    hi_c = (c - TC + cols_al) - c - lo_c
    return lo_r, lo_c, hi_r, hi_c


def swt_fwd_level_2d_padded(xp, dec_lo, dec_hi, level: int, nshape):
    hlen = len(dec_lo)
    f = 1 << (level - 1)
    nr, nc = nshape
    TR, TC = _swt_tiles(nr, nc, hlen, f, conv.fwd_center(hlen) * f)
    return _swt_fwd_call(xp, (_taps(dec_lo), _taps(dec_hi)), hlen, f,
                         (TR, TC), (nr, nc))


def swt_inv_geometry(r: int, c: int, hlen: int, level: int):
    f = 1 << (level - 1)
    cen = (hlen // 2) * f
    tiles = _swt_tiles(r, c, hlen, f, cen)
    if tiles is None:
        return None
    TR, TC = tiles
    span = (hlen - 1) * f
    lo_r, lo_c, pr, pc = _phases(cen)
    rows_al = _ceil_to(TR + span + pr, 8)
    cols_al = _ceil_to(TC + span + pc, 128)
    hi_r = (r - TR + rows_al) - r - lo_r
    hi_c = (c - TC + cols_al) - c - lo_c
    return lo_r, lo_c, hi_r, hi_c


def swt_inv_level_2d_padded(ap, hp, vp, dp, rec_lo, rec_hi, level: int,
                            nshape):
    hlen = len(rec_lo)
    f = 1 << (level - 1)
    nr, nc = nshape
    TR, TC = _swt_tiles(nr, nc, hlen, f, (hlen // 2) * f)
    taps = (_taps(np.asarray(rec_lo) * 0.5), _taps(np.asarray(rec_hi) * 0.5))
    return _swt_inv_call(ap, hp, vp, dp, taps, hlen, f, (TR, TC), (nr, nc))


# ---------------------------------------------------------------------------
# padded 1D entry points for the distributed engine — mirrors the 2D
# fwd/inv_geometry + *_padded pairs: the sharded path ring-halo-exchanges
# exactly these amounts along the signal axis and calls the kernels on
# pre-padded local shards (reference batched-1D: src/separable.cu:213-236,
# 366-395, 519-537, 653-672).
# ---------------------------------------------------------------------------

def fwd1d_geometry(bsz: int, n: int, hlen: int):
    """(lo, hi) signal-axis padding the 1D forward kernel expects
    (lane-aligned lo), or None if unsupported (tile pick depends on the
    local batch size)."""
    if hlen % 2 or n % 2:
        return None
    m = n // 2
    _, lo_c, _, pc = _phases(conv.fwd_center(hlen), lane_aligned=False)
    tiles = _tiles_1d(bsz, m, hlen,
                      lambda tc: _ceil_to(2 * tc + hlen - 2 + pc, 128))
    if tiles is None:
        return None
    _, TC = tiles
    cols_al = _ceil_to(2 * TC + hlen - 2 + pc, 128)
    return lo_c, (n - 2 * TC + cols_al) - n - lo_c


def fwd_level_1d_padded(xp, dec_lo, dec_hi, m: int):
    hlen = len(dec_lo)
    B = xp.shape[0]
    pc = _phases(conv.fwd_center(hlen), lane_aligned=False)[3]
    tiles = _tiles_1d(B, m, hlen,
                      lambda tc: _ceil_to(2 * tc + hlen - 2 + pc, 128))
    return _fwd1d_call(xp, (_taps(dec_lo), _taps(dec_hi)), hlen, tiles, m)


def inv1d_geometry(bsz: int, m: int, hlen: int):
    if hlen % 2:
        return None
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    _, lo_c, _, pc = _phases(lo_pad, lane_aligned=False)
    tiles = _tiles_1d(bsz, m, hlen,
                      lambda tc: _ceil_to(tc + lo_pad + hi_pad + pc, 128))
    if tiles is None:
        return None
    _, TC = tiles
    cols_al = _ceil_to(TC + lo_pad + hi_pad + pc, 128)
    return lo_c, (m - TC + cols_al) - m - lo_c


def inv_level_1d_padded(lp, hp, rec_lo, rec_hi, m: int):
    hlen = len(rec_lo)
    B = lp.shape[0]
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    pc = _phases(lo_pad, lane_aligned=False)[3]
    tiles = _tiles_1d(B, m, hlen,
                      lambda tc: _ceil_to(tc + lo_pad + hi_pad + pc, 128))
    return _inv1d_call(lp, hp, (_taps(rec_lo), _taps(rec_hi)), hlen, tiles,
                       (lo_pad, hi_pad), m)


def swt1d_fwd_geometry(bsz: int, n: int, hlen: int, level: int):
    f = 1 << (level - 1)
    span = (hlen - 1) * f
    cen = conv.fwd_center(hlen) * f
    _, lo_c, _, pc = _phases(cen)
    tiles = _tiles_1d(bsz, n, hlen,
                      lambda tc: _ceil_to(tc + span + pc, 128))
    if tiles is None:
        return None
    _, TC = tiles
    cols_al = _ceil_to(TC + span + pc, 128)
    return lo_c, (n - TC + cols_al) - n - lo_c


def swt_fwd_level_1d_padded(xp, dec_lo, dec_hi, level: int, n: int):
    hlen = len(dec_lo)
    f = 1 << (level - 1)
    B = xp.shape[0]
    span = (hlen - 1) * f
    pc = _phases(conv.fwd_center(hlen) * f)[3]
    tiles = _tiles_1d(B, n, hlen,
                      lambda tc: _ceil_to(tc + span + pc, 128))
    return _swt1d_fwd_call(xp, (_taps(dec_lo), _taps(dec_hi)), hlen, f,
                           tiles, n)


def swt1d_inv_geometry(bsz: int, n: int, hlen: int, level: int):
    f = 1 << (level - 1)
    span = (hlen - 1) * f
    cen = (hlen // 2) * f
    _, lo_c, _, pc = _phases(cen)
    tiles = _tiles_1d(bsz, n, hlen,
                      lambda tc: _ceil_to(tc + span + pc, 128))
    if tiles is None:
        return None
    _, TC = tiles
    cols_al = _ceil_to(TC + span + pc, 128)
    return lo_c, (n - TC + cols_al) - n - lo_c


def swt_inv_level_1d_padded(lp, hp, rec_lo, rec_hi, level: int, n: int):
    hlen = len(rec_lo)
    f = 1 << (level - 1)
    B = lp.shape[0]
    span = (hlen - 1) * f
    pc = _phases((hlen // 2) * f)[3]
    tiles = _tiles_1d(B, n, hlen,
                      lambda tc: _ceil_to(tc + span + pc, 128))
    taps = (_taps(np.asarray(rec_lo) * 0.5), _taps(np.asarray(rec_hi) * 0.5))
    return _swt1d_inv_call(lp, hp, taps, hlen, f, tiles, n)
