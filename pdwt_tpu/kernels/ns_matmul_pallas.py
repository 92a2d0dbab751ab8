"""MXU kernels for the rank-r NON-separable engine (bf16 / mixed).

Genuinely-2D quads run as a joint separable-sum (core.nonseparable
._rank_decomp): Q_s = sum_k outer(a_k^(s), b_k).  That sum is still two
banded matmuls per tile — the rank dimension rides along as matrix
blocks (reference true-2D path: src/nonseparable.cu:114-225, one thread
per output with an hlen^2 loop):

    pass 1 (lanes, decimate):    t = x_pad @ B    B (COLS, r*TC), block
                                 k = decimating band of col filter b_k
    stack:                       T = vstack_k t[:, k*TC:(k+1)*TC]
    pass 2 (sublanes, decimate): out = M @ T     M (4*TR, r*TRR), block
                                 (s, k) = band of row filter a_k^(s)
                                 -> out rows [s*TR:(s+1)*TR] = subband s

The inverse runs r 4-band polyphase row-synthesis matmuls (S_k) and one
column-synthesis matmul over their lane-concatenation (G).  Modes and
schemes as matmul_pallas ("mixed" = bf16x3; "bf16" = one pass for bf16
operands, bf16x3 for the f32 A-chain; details stored bf16).
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
    _poly_geometry,
)
from .matmul_pallas import (PAIR_SCHEMES, _bf16_l1_schemes,
                            _mats_for_scheme, _mm, _pick_mxu_tiles)
from .swt_matmul_pallas import _mode_scheme, _swt_geometry, _swt_scheme

_MAX_RANK = 4
_NS_VMEM = 10 * 1024 * 1024


def _rev(f):
    return np.asarray(f, np.float64)[::-1]


# --- matrix builders -------------------------------------------------------

def _ns_fwd_mats(A_rk, B_rk, TRR, COLS, pr, pc, TR, TC):
    """A_rk (4, r, hlen) row filters, B_rk (r, hlen) col filters."""
    four, r, hlen = A_rk.shape
    B = np.zeros((COLS, r * TC), np.float32)
    for k in range(r):
        taps = _rev(B_rk[k])
        for n in range(TC):
            for j in range(hlen):
                B[pc + 2 * n + j, k * TC + n] += taps[j]
    M = np.zeros((4 * TR, r * TRR), np.float32)
    for s in range(4):
        for k in range(r):
            taps = _rev(A_rk[s, k])
            for m in range(TR):
                for j in range(hlen):
                    M[s * TR + m, k * TRR + pr + 2 * m + j] += taps[j]
    return B, M


def _ns_inv_mats(A_rk, B_rk, ROWS, COLS, pr, pc, TR, TC):
    """Synthesis: r row matrices S_k (2TR, 4*ROWS) + one col matrix
    G (r*COLS, 2TC) (polyphase, see separable _synthesis_mats)."""
    four, r, hlen = A_rk.shape
    p, o, lo_pad, _ = _poly_geometry(hlen)
    Ss = []
    for k in range(r):
        S = np.zeros((2 * TR, 4 * ROWS), np.float32)
        for s in range(4):
            taps = _rev(A_rk[s, k])
            for q in (0, 1):
                for b, j in enumerate(range(p[q], hlen, 2)):
                    for m in range(TR):
                        S[2 * m + q,
                          s * ROWS + pr + lo_pad + o[q] + b + m] += taps[j]
        Ss.append(S)
    Gt = np.zeros((2 * TC, r * COLS), np.float32)
    for k in range(r):
        taps = _rev(B_rk[k])
        for q in (0, 1):
            for b, j in enumerate(range(p[q], hlen, 2)):
                for n in range(TC):
                    Gt[2 * n + q,
                       k * COLS + pc + lo_pad + o[q] + b + n] += taps[j]
    return Ss, Gt.T.copy()


# --- forward ---------------------------------------------------------------

def _ns_fwd_kernel(scheme, rank, WIN_R, WIN_C, TR, TC, stride):
    """Shared by the decimated (stride=2) and à-trous (stride=1)
    forward kernels — the rank/block algebra is identical; only the
    DMA tile stride and window dims differ."""
    per = 2 if scheme in PAIR_SCHEMES else 1

    def kernel(xp_hbm, *refs):
        mats = refs[:2 * per]
        a_ref, h_ref, v_ref, d_ref, xt, sem = refs[2 * per:]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        dma = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(stride * TR * i, WIN_R),
                      pl.ds(stride * TC * j, WIN_C)],
            xt, sem)
        dma.start()
        dma.wait()
        x = xt[:]
        Bp = tuple(m[:] for m in mats[:per])
        Mp = tuple(m[:] for m in mats[per:])
        if scheme in PAIR_SCHEMES:
            t = _mm(scheme, x, None, right_pair=Bp)
        else:
            t = _mm(scheme, x, Bp[0])
        tstack = jnp.concatenate(
            [t[:, k * TC:(k + 1) * TC] for k in range(rank)], axis=0)
        if scheme in PAIR_SCHEMES:
            out = _mm(scheme, None, tstack, left_pair=Mp)
        else:
            out = _mm(scheme, Mp[0], tstack)
        a_ref[0] = out[:TR].astype(a_ref.dtype)
        h_ref[0] = out[TR:2 * TR].astype(h_ref.dtype)
        v_ref[0] = out[2 * TR:3 * TR].astype(v_ref.dtype)
        d_ref[0] = out[3 * TR:].astype(d_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scheme", "rank", "tiles",
                                             "mshape", "geom", "out_dtypes"))
def _ns_fwd_call(xp, mats, scheme, rank, tiles, mshape, geom, out_dtypes):
    B = xp.shape[0]
    TR, TC = tiles
    mr, mc = mshape
    TRR, COLS = geom
    kernel = _ns_fwd_kernel(scheme, rank, TRR, COLS, TR, TC, 2)
    out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    a_dt, d_dt = out_dtypes
    shapes = tuple(jax.ShapeDtypeStruct((B, mr, mc), dt)
                   for dt in (a_dt, d_dt, d_dt, d_dt))
    mat_specs = [
        pl.BlockSpec(m.shape, (lambda b, i, j: (0, 0)),
                     memory_space=pltpu.VMEM) for m in mats
    ]
    return pl.pallas_call(
        kernel,
        grid=(B, mr // TR, mc // TC),
        out_shape=shapes,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + mat_specs,
        out_specs=(out_spec,) * 4,
        scratch_shapes=[pltpu.VMEM((TRR, COLS), xp.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=_INTERPRET(),
    )(xp, *mats)


def ns_fwd_level_2d_mxu(x, A_rk, B_rk, mode: str):
    """One rank-r non-separable forward level on (B, R, C); None if
    unsupported (odd sizes/hlen, rank > 4, indivisible, VMEM)."""
    Bsz, r0, c0 = x.shape
    four, rank, hlen = A_rk.shape
    if hlen % 2 or hlen > 40 or rank > _MAX_RANK or r0 % 2 or c0 % 2:
        return None
    scheme = _mode_scheme(mode, x.dtype)
    tiles = _pick_mxu_tiles(r0 // 2, c0 // 2, hlen, scheme)
    if tiles is None:
        return None
    TR, TC = tiles
    cen = conv.fwd_center(hlen)
    lo_r = _ceil_to(cen, 16)
    lo_c = _ceil_to(cen, 128)
    pr, pc = lo_r - cen, lo_c - cen
    TRR = _ceil_to(2 * TR + hlen - 2 + pr, 16)
    COLS = _ceil_to(2 * TC + hlen - 2 + pc, 128)
    est = (TRR * COLS + COLS * rank * TC + 4 * TR * rank * TRR
           + TRR * rank * TC) * 4
    if est > _NS_VMEM:
        return None
    hi_r = (r0 - 2 * TR + TRR) - r0 - lo_r
    hi_c = (c0 - 2 * TC + COLS) - c0 - lo_c
    xp = conv.wrap_pad(x, -1, lo_c, hi_c)
    xp = conv.wrap_pad(xp, -2, lo_r, hi_r)
    Bm, Mm = _ns_fwd_mats(np.asarray(A_rk), np.asarray(B_rk), TRR, COLS,
                          pr, pc, TR, TC)
    mats = (_mats_for_scheme((Bm,), scheme)
            + _mats_for_scheme((Mm,), scheme))
    out_dtypes = ((jnp.float32, jnp.float32) if mode == "mixed"
                  else (jnp.float32, jnp.bfloat16))
    return _ns_fwd_call(xp, mats, scheme, rank, (TR, TC),
                        (r0 // 2, c0 // 2), (TRR, COLS), out_dtypes)


# --- inverse ---------------------------------------------------------------

def _ns_inv_kernel(scheme, rank, ROWS, COLS, TR, TC):
    per = 2 if scheme in PAIR_SCHEMES else 1

    def kernel(a_hbm, h_hbm, v_hbm, d_hbm, *refs):
        mats = refs[:(rank + 1) * per]
        out_ref, at, ht, vt, dt, sems = refs[(rank + 1) * per:]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
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
        cd = jnp.bfloat16 if scheme == "b1" else jnp.float32
        u = jnp.concatenate([t[:].astype(cd)
                             for t in (at, ht, vt, dt)], axis=0)
        tks = []
        for k in range(rank):
            Sp = tuple(m[:] for m in mats[k * per:(k + 1) * per])
            if scheme in PAIR_SCHEMES:
                tks.append(_mm(scheme, None, u, left_pair=Sp))
            else:
                tks.append(_mm(scheme, Sp[0], u))
        u2 = jnp.concatenate(tks, axis=1)       # (2TR, rank*COLS)
        Gp = tuple(m[:] for m in mats[rank * per:])
        if scheme in PAIR_SCHEMES:
            out = _mm(scheme, u2, None, right_pair=Gp)
        else:
            out = _mm(scheme, u2, Gp[0])
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scheme", "rank", "tiles",
                                             "mshape", "geom", "out_dtype"))
def _ns_inv_call(ap, hp, vp, dp, mats, scheme, rank, tiles, mshape, geom,
                 out_dtype):
    B = ap.shape[0]
    TR, TC = tiles
    mr, mc = mshape
    ROWS, COLS = geom
    kernel = _ns_inv_kernel(scheme, rank, ROWS, COLS, TR, TC)
    out_spec = pl.BlockSpec((1, 2 * TR, 2 * TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, 2 * mr, 2 * mc), out_dtype)
    mat_specs = [
        pl.BlockSpec(m.shape, (lambda b, i, j: (0, 0)),
                     memory_space=pltpu.VMEM) for m in mats
    ]
    tiles_scr = [pltpu.VMEM((ROWS, COLS), t.dtype)
                 for t in (ap, hp, vp, dp)]
    return pl.pallas_call(
        kernel,
        grid=(B, mr // TR, mc // TC),
        out_shape=shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + mat_specs,
        out_specs=out_spec,
        scratch_shapes=tiles_scr + [pltpu.SemaphoreType.DMA((4,))],
        interpret=_INTERPRET(),
    )(ap, hp, vp, dp, *mats)


def ns_inv_level_2d_mxu(a, h, v, d, A_rk, B_rk, mode: str, out_dtype=None):
    """One rank-r non-separable inverse level; None if unsupported."""
    Bsz, mr, mc = a.shape
    four, rank, hlen = A_rk.shape
    if hlen % 2 or hlen > 40 or rank > _MAX_RANK:
        return None
    if mode == "mixed":
        scheme = "b3"
        out_dtype = jnp.float32
    elif mode == "bf16":
        out_dtype = jnp.bfloat16 if out_dtype is None else out_dtype
        scheme = (_bf16_l1_schemes()[1]
                  if out_dtype == jnp.bfloat16 else "b3")
        a = a.astype(jnp.float32)
    else:
        raise ValueError(mode)
    tiles = _pick_mxu_tiles(mr, mc, hlen, scheme)
    if tiles is None:
        return None
    TR, TC = tiles
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    lo_r = _ceil_to(lo_pad, 16)
    lo_c = _ceil_to(lo_pad, 128)
    pr, pc = lo_r - lo_pad, lo_c - lo_pad
    ROWS = _ceil_to(TR + lo_pad + hi_pad + pr, 16)
    COLS = _ceil_to(TC + lo_pad + hi_pad + pc, 128)
    est = (4 * ROWS * COLS + rank * 2 * TR * 4 * ROWS
           + rank * COLS * 2 * TC + 2 * TR * rank * COLS) * 4
    if est > _NS_VMEM:
        return None
    hi_r = (mr - TR + ROWS) - mr - lo_r
    hi_c = (mc - TC + COLS) - mc - lo_c
    Ss, G = _ns_inv_mats(np.asarray(A_rk), np.asarray(B_rk), ROWS, COLS,
                         pr, pc, TR, TC)
    mats = ()
    for S in Ss:
        mats = mats + _mats_for_scheme((S,), scheme)
    mats = mats + _mats_for_scheme((G,), scheme)

    def pad2(arr):
        arr = conv.wrap_pad(arr, -1, lo_c, hi_c)
        return conv.wrap_pad(arr, -2, lo_r, hi_r)

    return _ns_inv_call(pad2(a), pad2(h), pad2(v), pad2(d), mats, scheme,
                        rank, (TR, TC), (mr, mc), (ROWS, COLS), out_dtype)


# ---------------------------------------------------------------------------
# à-trous (SWT) rank-r kernels: same block structure with dilated bands,
# undecimated outputs (reference: src/nonseparable.cu:304-401; the 1/4
# inverse normalization rides on the shared column basis)
# ---------------------------------------------------------------------------

def _ns_swt_fwd_mats(A_rk, B_rk, ROWS, COLS, pr, pc, TR, TC, f):
    four, r, hlen = A_rk.shape
    B = np.zeros((COLS, r * TC), np.float32)
    for k in range(r):
        taps = _rev(B_rk[k])
        for n in range(TC):
            for j in range(hlen):
                B[pc + n + f * j, k * TC + n] += taps[j]
    M = np.zeros((4 * TR, r * ROWS), np.float32)
    for s in range(4):
        for k in range(r):
            taps = _rev(A_rk[s, k])
            for m in range(TR):
                for j in range(hlen):
                    M[s * TR + m, k * ROWS + pr + m + f * j] += taps[j]
    return B, M


def _ns_swt_inv_mats(A_rk, B_rk, ROWS, COLS, pr, pc, TR, TC, f):
    four, r, hlen = A_rk.shape
    Ss = []
    for k in range(r):
        S = np.zeros((TR, 4 * ROWS), np.float32)
        for s in range(4):
            taps = _rev(A_rk[s, k])
            for m in range(TR):
                for j in range(hlen):
                    S[m, s * ROWS + pr + m + f * j] += taps[j]
        Ss.append(S)
    Gt = np.zeros((TC, r * COLS), np.float32)
    for k in range(r):
        taps = _rev(B_rk[k] * 0.25)   # the engine's 1/4 normalization
        for n in range(TC):
            for j in range(hlen):
                Gt[n, k * COLS + pc + n + f * j] += taps[j]
    return Ss, Gt.T.copy()


@functools.partial(jax.jit, static_argnames=("scheme", "rank", "tiles",
                                             "nshape", "geom", "out_dtypes"))
def _ns_swt_fwd_call(xp, mats, scheme, rank, tiles, nshape, geom,
                     out_dtypes):
    B = xp.shape[0]
    TR, TC = tiles
    nr, nc = nshape
    ROWS, COLS = geom
    kernel = _ns_fwd_kernel(scheme, rank, ROWS, COLS, TR, TC, 1)
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
                        pltpu.SemaphoreType.DMA(())],
        interpret=_INTERPRET(),
    )(xp, *mats)


def ns_swt_fwd_level_2d_mxu(x, A_rk, B_rk, level: int, mode: str):
    """One à-trous rank-r non-separable forward level; None if
    unsupported."""
    Bsz, r0, c0 = x.shape
    four, rank, hlen = A_rk.shape
    f = 1 << (level - 1)
    span = (hlen - 1) * f
    if hlen % 2 or hlen > 40 or rank > _MAX_RANK:
        return None
    scheme = _swt_scheme(mode, x.dtype)
    tiles = _pick_mxu_tiles(r0, c0, hlen, scheme)
    if tiles is None:
        return None
    TR, TC = tiles
    if span > 2 * TR:
        return None
    cen = conv.fwd_center(hlen) * f
    lo_r, lo_c, pr, pc, ROWS, COLS = _swt_geometry(hlen, f, cen, tiles)
    est = (ROWS * COLS + COLS * rank * TC + 4 * TR * rank * ROWS
           + ROWS * rank * TC) * 4
    if est > _NS_VMEM:
        return None
    hi_r = (r0 - TR + ROWS) - r0 - lo_r
    hi_c = (c0 - TC + COLS) - c0 - lo_c
    xp = conv.wrap_pad(x, -1, lo_c, hi_c)
    xp = conv.wrap_pad(xp, -2, lo_r, hi_r)
    Bm, Mm = _ns_swt_fwd_mats(np.asarray(A_rk), np.asarray(B_rk), ROWS,
                              COLS, pr, pc, TR, TC, f)
    mats = (_mats_for_scheme((Bm,), scheme)
            + _mats_for_scheme((Mm,), scheme))
    out_dtypes = ((jnp.float32, jnp.float32) if mode == "mixed"
                  else (jnp.float32, jnp.bfloat16))
    return _ns_swt_fwd_call(xp, mats, scheme, rank, (TR, TC), (r0, c0),
                            (ROWS, COLS), out_dtypes)


@functools.partial(jax.jit, static_argnames=("scheme", "rank", "tiles",
                                             "nshape", "geom", "out_dtype"))
def _ns_swt_inv_call(ap, hp, vp, dp, mats, scheme, rank, tiles, nshape,
                     geom, out_dtype):
    B = ap.shape[0]
    TR, TC = tiles
    nr, nc = nshape
    ROWS, COLS = geom
    # the inverse kernel body is shape-agnostic (matrices carry the
    # decimated-vs-à-trous difference) — shared with _ns_inv_call
    kernel = _ns_inv_kernel(scheme, rank, ROWS, COLS, TR, TC)
    out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, nr, nc), out_dtype)
    mat_specs = [
        pl.BlockSpec(m.shape, (lambda b, i, j: (0, 0)),
                     memory_space=pltpu.VMEM) for m in mats
    ]
    tiles_scr = [pltpu.VMEM((ROWS, COLS), t.dtype)
                 for t in (ap, hp, vp, dp)]
    return pl.pallas_call(
        kernel,
        grid=(B, nr // TR, nc // TC),
        out_shape=shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4 + mat_specs,
        out_specs=out_spec,
        scratch_shapes=tiles_scr + [pltpu.SemaphoreType.DMA((4,))],
        interpret=_INTERPRET(),
    )(ap, hp, vp, dp, *mats)


def ns_swt_inv_level_2d_mxu(a, h, v, d, A_rk, B_rk, level: int, mode: str,
                            out_dtype=None):
    """One à-trous rank-r non-separable inverse level (1/4 normalization
    baked); None if unsupported."""
    Bsz, r0, c0 = a.shape
    four, rank, hlen = A_rk.shape
    f = 1 << (level - 1)
    span = (hlen - 1) * f
    if hlen % 2 or hlen > 40 or rank > _MAX_RANK:
        return None
    if mode == "mixed":
        scheme = "b3"
        out_dtype = jnp.float32
    elif mode == "bf16":
        out_dtype = jnp.bfloat16 if out_dtype is None else out_dtype
        scheme = "fd"
        a = a.astype(jnp.float32)
    else:
        raise ValueError(mode)
    tiles = _pick_mxu_tiles(r0, c0, hlen, scheme)
    if tiles is None:
        return None
    TR, TC = tiles
    if span > 2 * TR:
        return None
    cen = conv.swt_inv_center(hlen) * f
    lo_r, lo_c, pr, pc, ROWS, COLS = _swt_geometry(hlen, f, cen, tiles)
    est = (4 * ROWS * COLS + rank * TR * 4 * ROWS + rank * COLS * TC
           + TR * rank * COLS) * 4
    if est > _NS_VMEM:
        return None
    hi_r = (r0 - TR + ROWS) - r0 - lo_r
    hi_c = (c0 - TC + COLS) - c0 - lo_c
    Ss, G = _ns_swt_inv_mats(np.asarray(A_rk), np.asarray(B_rk), ROWS,
                             COLS, pr, pc, TR, TC, f)
    mats = ()
    for S in Ss:
        mats = mats + _mats_for_scheme((S,), scheme)
    mats = mats + _mats_for_scheme((G,), scheme)

    def pad2(arr):
        arr = conv.wrap_pad(arr, -1, lo_c, hi_c)
        return conv.wrap_pad(arr, -2, lo_r, hi_r)

    return _ns_swt_inv_call(pad2(a), pad2(h), pad2(v), pad2(d), mats,
                            scheme, rank, (TR, TC), (r0, c0),
                            (ROWS, COLS), out_dtype)


# ---------------------------------------------------------------------------
# autodiff wrappers: the rank-r transform is a sum of separable passes,
# so its adjoint is the rank-r synthesis with per-filter reversed taps
# (and vice versa); the à-trous pair carries the 4x / 0.25x factors that
# cancel the inverse's baked 1/4 normalization (same algebra as the
# separable swt wrappers).  Filters ride as nested tuples (hashable
# nondiff args); fallbacks defer-import the core rank compositions.
# ---------------------------------------------------------------------------

def _tup2(m):
    return tuple(tuple(float(v) for v in row) for row in np.asarray(m))


def _tup3(m):
    return tuple(_tup2(x) for x in np.asarray(m))


def _core_ns():
    from ..core import nonseparable as ns_core
    return ns_core


def _rank_fwd_fallback(x, A, Bc):
    ns_core = _core_ns()
    z = ns_core._rank_fwd_level(x.astype(jnp.float32)[:, None], A, Bc)
    return z[:, 0], z[:, 1], z[:, 2], z[:, 3]


def _rank_inv_fallback(a, h, v, d, A, Bc, out_shape):
    ns_core = _core_ns()
    z = jnp.concatenate([t.astype(jnp.float32)[:, None]
                         for t in (a, h, v, d)], axis=1)
    return ns_core._rank_inv_level(z, A, Bc, out_shape)[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def ns_fwd_level_2d_mxu_ad(x, A_t, B_t, mode):
    return ns_fwd_level_2d_mxu(x, np.asarray(A_t), np.asarray(B_t), mode)


def _ns_fwd_ad_fwd(x, A_t, B_t, mode):
    return (ns_fwd_level_2d_mxu_ad(x, A_t, B_t, mode),
            jnp.zeros((0,), x.dtype))


def _ns_fwd_ad_bwd(A_t, B_t, mode, probe, ct):
    a, h, v, d = ct
    A_r = np.asarray(A_t)[..., ::-1]
    B_r = np.asarray(B_t)[:, ::-1]
    y = ns_inv_level_2d_mxu(a, h, v, d, A_r, B_r, mode,
                            out_dtype=probe.dtype)
    if y is None:
        shape = (2 * a.shape[-2], 2 * a.shape[-1])
        y = _rank_inv_fallback(a, h, v, d, A_r, B_r,
                               shape).astype(probe.dtype)
    return (y,)


ns_fwd_level_2d_mxu_ad.defvjp(_ns_fwd_ad_fwd, _ns_fwd_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def ns_inv_level_2d_mxu_ad(a, h, v, d, A_t, B_t, mode, out_dtype=None):
    return ns_inv_level_2d_mxu(a, h, v, d, np.asarray(A_t),
                               np.asarray(B_t), mode, out_dtype=out_dtype)


def _ns_inv_ad_fwd(a, h, v, d, A_t, B_t, mode, out_dtype):
    res = tuple(jnp.zeros((0,), t.dtype) for t in (a, h, v, d))
    return ns_inv_level_2d_mxu_ad(a, h, v, d, A_t, B_t, mode,
                                  out_dtype), res


def _ns_inv_ad_bwd(A_t, B_t, mode, out_dtype, probes, ct):
    A_r = np.asarray(A_t)[..., ::-1]
    B_r = np.asarray(B_t)[:, ::-1]
    res = ns_fwd_level_2d_mxu(ct, A_r, B_r, mode)
    if res is None:
        res = _rank_fwd_fallback(ct, A_r, B_r)
    return tuple(t.astype(p.dtype) for t, p in zip(res, probes))


ns_inv_level_2d_mxu_ad.defvjp(_ns_inv_ad_fwd, _ns_inv_ad_bwd)


def _rank_swt_fwd_fallback(x, A, Bc, level):
    f = 1 << (level - 1)
    a = x.astype(jnp.float32)[:, None]
    t = conv.analysis_pass(a, list(Bc), axis=-1, dilation=f,
                           decimate=False)
    z = None
    for k in range(Bc.shape[0]):
        w4 = conv.analysis_pass(t[:, k:k + 1], list(A[:, k]), axis=-2,
                                dilation=f, decimate=False)
        z = w4 if z is None else z + w4
    return z[:, 0], z[:, 1], z[:, 2], z[:, 3]


def _rank_swt_inv_fallback(a, h, v, d, A, Bc4, level):
    f = 1 << (level - 1)
    z = jnp.concatenate([t.astype(jnp.float32)[:, None]
                         for t in (a, h, v, d)], axis=1)
    ts = [conv.synthesis_pass(z, list(A[:, k]), axis=-2, dilation=f,
                              decimated=False) for k in range(A.shape[1])]
    t = jnp.concatenate(ts, axis=1)
    return conv.synthesis_pass(t, list(Bc4), axis=-1, dilation=f,
                               decimated=False)[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def ns_swt_fwd_level_2d_mxu_ad(x, A_t, B_t, level, mode):
    return ns_swt_fwd_level_2d_mxu(x, np.asarray(A_t), np.asarray(B_t),
                                   level, mode)


def _ns_sfwd_ad_fwd(x, A_t, B_t, level, mode):
    return (ns_swt_fwd_level_2d_mxu_ad(x, A_t, B_t, level, mode),
            jnp.zeros((0,), x.dtype))


def _ns_sfwd_ad_bwd(A_t, B_t, level, mode, probe, ct):
    a, h, v, d = ct
    A_r = np.asarray(A_t)[..., ::-1]
    B_r = np.asarray(B_t)[:, ::-1]
    # the inverse bakes 0.25 on the column basis; the adjoint is the
    # UNnormalized synthesis -> scale by 4
    y = ns_swt_inv_level_2d_mxu(a, h, v, d, A_r, 4.0 * B_r, level, mode,
                                out_dtype=probe.dtype)
    if y is None:
        y = _rank_swt_inv_fallback(a, h, v, d, A_r, B_r,
                                   level).astype(probe.dtype)
    return (y,)


ns_swt_fwd_level_2d_mxu_ad.defvjp(_ns_sfwd_ad_fwd, _ns_sfwd_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def ns_swt_inv_level_2d_mxu_ad(a, h, v, d, A_t, B_t, level, mode,
                               out_dtype=None):
    return ns_swt_inv_level_2d_mxu(a, h, v, d, np.asarray(A_t),
                                   np.asarray(B_t), level, mode,
                                   out_dtype=out_dtype)


def _ns_sinv_ad_fwd(a, h, v, d, A_t, B_t, level, mode, out_dtype):
    res = tuple(jnp.zeros((0,), t.dtype) for t in (a, h, v, d))
    return ns_swt_inv_level_2d_mxu_ad(a, h, v, d, A_t, B_t, level, mode,
                                      out_dtype), res


def _ns_sinv_ad_bwd(A_t, B_t, level, mode, out_dtype, probes, ct):
    A_r = np.asarray(A_t)[..., ::-1]
    B_r = np.asarray(B_t)[:, ::-1]
    # primal applies (A, 0.25*Bc); adjoint analyzes with the reversed
    # effective filters
    res = ns_swt_fwd_level_2d_mxu(ct, A_r, 0.25 * B_r, level, mode)
    if res is None:
        res = _rank_swt_fwd_fallback(ct, A_r, 0.25 * B_r, level)
    return tuple(t.astype(p.dtype) for t, p in zip(res, probes))


ns_swt_inv_level_2d_mxu_ad.defvjp(_ns_sinv_ad_fwd, _ns_sinv_ad_bwd)
