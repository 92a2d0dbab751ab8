"""MXU (banded-matmul) DWT level kernels — bf16 and mixed precision.

The exact-f32 level kernels (separable_pallas) are VPU-bound: each FIR
tap costs a misaligned sublane-shift plus an FMA, and the measured op
count sits within ~5% of the vreg-level floor of that formulation.  The
MXU changes the game when bf16 products are acceptable: a decimating
dual-FIR is a banded matrix multiply (the systolic array absorbs the
windowing), and this chip runs bf16 matmuls ~8x faster than exact-f32
ones (measured: 193-266 TF/s DEFAULT vs 30 TF/s HIGHEST).

Two user-facing modes, selected by the callers in core/separable.py:

* ``bf16``  — bf16 arrays in/out (half HBM traffic: the serving mode the
  reference's dual-precision build approximates from the other side,
  reference: src/filters.h:16-30, Makefile:36-39).  Details are stored
  bf16; the approximation chain — whose magnitude doubles per level and
  whose rounding error dominated the round-2 reconstruction error — is
  carried in f32 between levels.  Level-1 (bf16 input) runs one bf16
  matmul per pass; deeper levels (f32 approx input) run DEFAULT-precision
  f32 matmuls (the chip's bf16x1 fast path, ~2^-9 relative).
* ``mixed`` — f32 arrays in/out, bf16x3 compute: operands split into
  bf16 hi+lo halves, three DEFAULT-precision matmuls reconstruct the
  product to ~2^-17 relative (missing only the lo*lo term).  ~2.5x
  faster than the exact path at ~1e-5 relative coefficient error.

Internally each kernel is parameterized by a compute ``scheme``:
``b1`` (one bf16 matmul per pass), ``fd`` (f32 operands, DEFAULT
precision), ``b3`` (bf16x3 split) — and by per-output dtypes, so the
approximation and detail subbands can differ (f32 A-chain + bf16
details in bf16 mode).

Tiles adapt to the level geometry (TR in {128, 64, 32}, TC in
{256, 128}) so the deep levels of a multi-level transform stay on the
MXU instead of falling back to the VPU kernels.

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

# (TR, TC) candidates, best first, PER COMPUTE SCHEME — measured on the
# v5e (round-3 sweep, 2048^2 db7 5-level roundtrip):
#   b1 (one bf16 matmul/pass): big tiles pipeline best — (128,256) was
#     26.4 GPix/s vs 15.0 at (128,128);
#   b3/fd (3 matmuls / f32 operands): FLOPs dominate and scale with the
#     K dims (TRR ~ 2TR + hlen, COLS ~ 2TC + hlen), so smaller tiles
#     win — (64,128) was 7.7 GPix/s vs 6.4 at (128,256).
# Override order with PDWT_TPU_MXU_TILES="TRxTC" for sweeps.
_TILES_BIG = ((128, 256), (128, 128), (64, 128), (32, 128))
_TILES_SMALL = ((64, 128), (32, 128), (128, 128), (128, 256))


def _tile_candidates(scheme: str):
    import os

    # single-matmul schemes (b1, fd) pipeline best with big tiles; the
    # 3-matmul b3 is FLOP-bound and wants small K dims.  The 2-matmul
    # b2 schemes start from the big-tile order (sweepable via env).
    base = _TILES_SMALL if scheme == "b3" else _TILES_BIG
    env = os.environ.get("PDWT_TPU_MXU_TILES")
    if env:
        tr, tc = (int(v) for v in env.lower().split("x"))
        return ((tr, tc),) + base
    return base


def _pick_mxu_tiles(mr: int, mc: int, hlen: int,
                    scheme: str = "b1") -> Optional[Tuple[int, int]]:
    """Best supported (TR, TC) for subband dims (mr, mc), or None."""
    if hlen % 2 or hlen > 40:
        return None
    for tr, tc in _tile_candidates(scheme):
        if mr % tr == 0 and mc % tc == 0:
            return tr, tc
    return None


def _split_bf16(m: np.ndarray):
    hi = m.astype(jnp.bfloat16)
    lo = (m - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    return hi, lo


def _analysis_mats(dec_lo, dec_hi, rows: int, cols: int, pr: int, pc: int,
                   TR: int, TC: int):
    """A (2TR, rows): dual decimating FIR along sublanes; B (cols, 2TC):
    dual decimating FIR along lanes.  out = [[a|v],[h|d]] = (A @ x) @ B.
    pr/pc are the aligned-lo-pad phases baked into the band offsets."""
    tl, th = _taps(dec_lo), _taps(dec_hi)
    hlen = len(tl)
    A = np.zeros((2 * TR, rows), np.float32)
    for m in range(TR):
        for j in range(hlen):
            A[m, pr + 2 * m + j] = tl[j]
            A[TR + m, pr + 2 * m + j] = th[j]
    B = np.zeros((cols, 2 * TC), np.float32)
    for m in range(TC):
        for j in range(hlen):
            B[pc + 2 * m + j, m] = tl[j]
            B[pc + 2 * m + j, TC + m] = th[j]
    return A, B


def _synthesis_mats(rec_lo, rec_hi, hlen: int, rows: int, cols: int,
                    pr: int, pc: int, TR: int, TC: int):
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

    S = np.zeros((2 * TR, rows), np.float32)
    fill(S, TR, band, pr)
    # pass 2 operates transposed: out[r, g] = sum_c t[r, c] * T[c, g]
    band2 = cols
    St = np.zeros((2 * TC, 2 * band2), np.float32)
    fill(St, TC, band2, pc)
    return S, St.T.copy()  # T: (2*cols, 2TC)


#: schemes whose constant filter matrices ship as (hi, lo) bf16 splits
#: and whose kernels route through the left_pair/right_pair call form.
#: b3  = both sides corrected (3 matmuls, ~2^-17 rel, drops lo*lo);
#: b2f = filter exact, data rounded once (2 matmuls — when the data is
#:       ALREADY bf16 this equals b3 exactly, since data_lo == 0);
#: b2d = data corrected, filter rounded once (2 matmuls — removes the
#:       data-rounding term that dominates when the data side is the
#:       large-magnitude f32 approximation chain).
PAIR_SCHEMES = ("b3", "b2f", "b2d")

#: bf16-mode L1 accuracy tiers, measured on the v5e (round-4 sweep,
#: tools/b2_sweep_*.json — 2048^2 db7 5-level roundtrip, max error on
#: [0,255] worst-case noise):
#:   fast     (b1 fwd, fd inv)  13.9 GPix/s, err 4.0   [default]
#:   balanced (b2f : b2f)        9.2 GPix/s, err 2.0
#:   accurate (b3  : b3)         7.7 GPix/s, err 1.0 (the bf16 storage
#:            floor; at this point "mixed" — f32 storage, err 0.02 at
#:            ~7.0 GPix/s — is usually the better mode)
_BF16_TIERS = {"fast": ("b1", "fd"), "balanced": ("b2f", "b2f"),
               "accurate": ("b3", "b3")}


def _bf16_l1_schemes() -> Tuple[str, str]:
    """(forward, inverse) compute scheme for the bf16-mode L1 passes:
    the active precision tier (core/precision.py — facade kwarg /
    precision_scope, else the PDWT_TPU_BF16_ACCURACY env default)
    selects a measured rung; the raw PDWT_TPU_BF16_L1FWD / _L1INV knobs
    override individually (sweeps)."""
    import os

    from ..core import precision

    f, i = _BF16_TIERS[precision.bf16_accuracy()]
    return (os.environ.get("PDWT_TPU_BF16_L1FWD", f),
            os.environ.get("PDWT_TPU_BF16_L1INV", i))


def _mats_for_scheme(mats_f32, scheme: str):
    """Constant operand arrays for a compute scheme: the pair schemes
    ship bf16 hi+lo splits, b1 ships bf16, fd ships f32."""
    if scheme in PAIR_SCHEMES:
        out = []
        for m in mats_f32:
            out.extend(_split_bf16(m))
        return tuple(out)
    if scheme == "b1":
        return tuple(jnp.asarray(m, jnp.bfloat16) for m in mats_f32)
    return tuple(jnp.asarray(m, jnp.float32) for m in mats_f32)


def _mm(scheme: str, left, right, left_pair=None, right_pair=None):
    """One banded-matmul pass under a compute scheme.

    ``left_pair``/``right_pair`` hold the (hi, lo) constant splits for
    the pair schemes when that side is a filter matrix; the
    non-constant (data) side is split in-kernel as the scheme needs."""
    f32 = jnp.float32
    dot = functools.partial(jnp.dot, preferred_element_type=f32)
    if scheme in PAIR_SCHEMES:
        if left_pair is not None:
            Lh, Ll = left_pair
            x = right
            if scheme == "b2f":
                xb = x.astype(jnp.bfloat16)
                return dot(Lh, xb) + dot(Ll, xb)
            xh = x.astype(jnp.bfloat16)
            xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
            if scheme == "b2d":
                return dot(Lh, xh) + dot(Lh, xl)
            return dot(Lh, xh) + dot(Lh, xl) + dot(Ll, xh)
        Rh, Rl = right_pair
        x = left
        if scheme == "b2f":
            xb = x.astype(jnp.bfloat16)
            return dot(xb, Rh) + dot(xb, Rl)
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(f32)).astype(jnp.bfloat16)
        if scheme == "b2d":
            return dot(xh, Rh) + dot(xl, Rh)
        return dot(xh, Rh) + dot(xl, Rh) + dot(xh, Rl)
    if scheme == "b1":
        return dot(left.astype(jnp.bfloat16), right.astype(jnp.bfloat16))
    # fd: f32 operands, DEFAULT precision (the chip's fast f32 path)
    return dot(left.astype(f32), right.astype(f32))


# ---------------------------------------------------------------------------
# forward level
# ---------------------------------------------------------------------------

def _fwd_mxu_kernel(scheme, TRR, COLS, TR, TC):
    nmats = 4 if scheme in PAIR_SCHEMES else 2

    def kernel(xp_hbm, *refs):
        mats = refs[:nmats]
        a_ref, h_ref, v_ref, d_ref, xt, sem = refs[nmats:]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        dma = pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(2 * TR * i, TRR), pl.ds(2 * TC * j, COLS)],
            xt, sem)
        dma.start()
        dma.wait()
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


@functools.partial(jax.jit, static_argnames=("hlen", "scheme", "tiles",
                                             "mshape", "out_dtypes"))
def _fwd_mxu_call(xp, mats, hlen, scheme, tiles, mshape, out_dtypes):
    B = xp.shape[0]
    TR, TC = tiles
    mr, mc = mshape
    cen = conv.fwd_center(hlen)
    pr = _ceil_to(cen, 16) - cen   # bf16 tiles: 16-sublane alignment
    pc = _phases(cen)[3]
    TRR = _ceil_to(2 * TR + hlen - 2 + pr, 16)
    COLS = _ceil_to(2 * TC + hlen - 2 + pc, 128)
    kernel = _fwd_mxu_kernel(scheme, TRR, COLS, TR, TC)
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


def fwd_level_2d_mxu(x: jnp.ndarray, dec_lo, dec_hi, mode: str,
                     pad_fn=None):
    """One forward level on (B, R, C) via MXU matmuls; None if the
    geometry is unsupported.

    mode "mixed": f32 in, all-f32 out (bf16x3 compute).
    mode "bf16": bf16 OR f32 input; approx out f32, details out bf16
    (one bf16 matmul per pass for bf16 input, bf16x3 for the f32
    A-chain).  ``pad_fn`` overrides the periodic padding — the
    distributed engine substitutes the ICI ring halo exchange."""
    B, r, c = x.shape
    hlen = len(dec_lo)
    if r % 2 or c % 2:
        return None
    if mode == "mixed":
        scheme = "b3"
        out_dtypes = (jnp.float32, jnp.float32)
    elif mode == "bf16":
        # bf16 input (level 1): the PDWT_TPU_BF16_ACCURACY tier picks
        # the pass scheme (default b1 = one matmul/pass).  f32 input
        # (the deep A-chain, <= 1/4 of the pixels): full bf16x3 — a
        # single lossy pass there cost ~10 absolute on [0,255] at depth.
        if x.dtype == jnp.bfloat16:
            scheme = _bf16_l1_schemes()[0]
        else:
            scheme = "b3"
        out_dtypes = (jnp.float32, jnp.bfloat16)
    else:
        raise ValueError(mode)
    tiles = _pick_mxu_tiles(r // 2, c // 2, hlen, scheme)
    if tiles is None:
        return None
    TR, TC = tiles
    cen = conv.fwd_center(hlen)
    lo_r16 = _ceil_to(cen, 16)
    lo_c, pc = _phases(cen)[1], _phases(cen)[3]
    pr = lo_r16 - cen
    TRR = _ceil_to(2 * TR + hlen - 2 + pr, 16)
    COLS = _ceil_to(2 * TC + hlen - 2 + pc, 128)
    hi_r = (r - 2 * TR + TRR) - r - lo_r16
    hi_c = (c - 2 * TC + COLS) - c - lo_c
    pad = pad_fn or conv.wrap_pad
    xp = pad(x, -1, lo_c, hi_c)
    xp = pad(xp, -2, lo_r16, hi_r)
    A, Bm = _analysis_mats(dec_lo, dec_hi, TRR, COLS, pr, pc, TR, TC)
    mats = _mats_for_scheme((A, Bm), scheme)
    return _fwd_mxu_call(xp, mats, hlen, scheme, (TR, TC), (r // 2, c // 2),
                         out_dtypes)


# ---------------------------------------------------------------------------
# inverse level
# ---------------------------------------------------------------------------

def _inv_mxu_kernel(scheme, ROWS, COLS, TR, TC):
    nmats = 4 if scheme in PAIR_SCHEMES else 2

    def kernel(a_hbm, h_hbm, v_hbm, d_hbm, *refs):
        mats = refs[:nmats]
        out_ref, at, ht, vt, dt, sems = refs[nmats:]
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

        if scheme in PAIR_SCHEMES:
            Sh, Sl, Th, Tl = (m[:] for m in mats)
            S_pair, T_pair = (Sh, Sl), (Th, Tl)
        else:
            Sm, Tm = (m[:] for m in mats)

        def synth(lo_band, hi_band):
            # bands stacked along sublanes -> one matmul per pass; mixed
            # input dtypes (f32 A-chain + bf16 details) meet at the
            # compute dtype here.
            cd = jnp.bfloat16 if scheme == "b1" else jnp.float32
            u = jnp.concatenate([lo_band.astype(cd), hi_band.astype(cd)],
                                axis=0)
            if scheme in PAIR_SCHEMES:
                return _mm(scheme, None, u, left_pair=S_pair)
            return _mm(scheme, Sm, u)

        t1 = synth(at[:], ht[:])   # (2TR, COLS)
        t2 = synth(vt[:], dt[:])
        u = jnp.concatenate([t1, t2], axis=1)  # (2TR, 2*COLS)
        if scheme in PAIR_SCHEMES:
            out = _mm(scheme, u, None, right_pair=T_pair)
        else:
            out = _mm(scheme, u, Tm)
        out_ref[0] = out.astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("hlen", "scheme", "tiles",
                                             "mshape", "out_dtype"))
def _inv_mxu_call(ap, hp, vp, dp, mats, hlen, scheme, tiles, mshape,
                  out_dtype):
    B = ap.shape[0]
    TR, TC = tiles
    mr, mc = mshape
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    pr = _ceil_to(lo_pad, 16) - lo_pad
    pc = _phases(lo_pad)[3]
    ROWS = _ceil_to(TR + lo_pad + hi_pad + pr, 16)
    COLS = _ceil_to(TC + lo_pad + hi_pad + pc, 128)
    kernel = _inv_mxu_kernel(scheme, ROWS, COLS, TR, TC)
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


def inv_level_2d_mxu(a, h, v, d, rec_lo, rec_hi, mode: str,
                     out_dtype=None, pad_fn=None):
    """One inverse level via MXU matmuls; None if unsupported.

    mode "mixed": all-f32 in/out, bf16x3 compute.
    mode "bf16": f32 (or bf16) approx + bf16 details in; DEFAULT-f32
    compute; ``out_dtype`` selects the output (bf16 for the final image,
    f32 to keep the intermediate approximation chain exact-ish)."""
    B, mr, mc = a.shape
    hlen = len(rec_lo)
    if mode == "mixed":
        scheme = "b3"
        out_dtype = jnp.float32
        cast = lambda t: t.astype(jnp.float32)
    elif mode == "bf16":
        # The FINAL level (bf16 output, 3/4 of the inverse work) runs
        # the PDWT_TPU_BF16_ACCURACY tier's inverse scheme (default fd
        # = one DEFAULT-f32 pass, ~2^-9 on the |a|~2x-range approx);
        # the deep intermediate levels run bf16x3 so A-chain error does
        # not accumulate across the level loop.
        out_dtype = jnp.bfloat16 if out_dtype is None else out_dtype
        scheme = (_bf16_l1_schemes()[1]
                  if out_dtype == jnp.bfloat16 else "b3")
        cast = lambda t: t
        a = a.astype(jnp.float32)
    else:
        raise ValueError(mode)
    tiles = _pick_mxu_tiles(mr, mc, hlen, scheme)
    if tiles is None:
        return None
    TR, TC = tiles
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    lo_r16 = _ceil_to(lo_pad, 16)
    pr = lo_r16 - lo_pad
    lo_c, pc = _phases(lo_pad)[1], _phases(lo_pad)[3]
    ROWS = _ceil_to(TR + lo_pad + hi_pad + pr, 16)
    COLS = _ceil_to(TC + lo_pad + hi_pad + pc, 128)
    hi_r = (mr - TR + ROWS) - mr - lo_r16
    hi_c = (mc - TC + COLS) - mc - lo_c

    S, T = _synthesis_mats(rec_lo, rec_hi, hlen, 2 * ROWS, COLS, pr, pc,
                           TR, TC)
    mats = _mats_for_scheme((S, T), scheme)

    pad = pad_fn or conv.wrap_pad

    def pad2(arr):
        arr = pad(arr, -1, lo_c, hi_c)
        return pad(arr, -2, lo_r16, hi_r)

    return _inv_mxu_call(pad2(cast(a)), pad2(cast(h)), pad2(cast(v)),
                         pad2(cast(d)), mats, hlen, scheme, (TR, TC),
                         (mr, mc), out_dtype)


# ---------------------------------------------------------------------------
# autodiff wrappers (same adjoint algebra as the exact kernels: the
# analysis adjoint is the synthesis with reversed taps and vice versa)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fwd_level_2d_mxu_ad(x, dec_lo_t, dec_hi_t, mode):
    return fwd_level_2d_mxu(x, np.asarray(dec_lo_t), np.asarray(dec_hi_t),
                            mode)


def _fwd_mxu_fwd(x, dec_lo_t, dec_hi_t, mode):
    # residual: zero-size probe carrying the input dtype (dtype objects
    # are not pytree leaves)
    return (fwd_level_2d_mxu_ad(x, dec_lo_t, dec_hi_t, mode),
            jnp.zeros((0,), x.dtype))


def _fwd_mxu_bwd(dec_lo_t, dec_hi_t, mode, probe, ct):
    in_dtype = probe.dtype
    a, h, v, d = ct
    lo_r = np.asarray(dec_lo_t)[::-1]
    hi_r = np.asarray(dec_hi_t)[::-1]
    y = inv_level_2d_mxu(a, h, v, d, lo_r, hi_r, mode, out_dtype=in_dtype)
    if y is None:
        from .separable_pallas import _fma_inv_level
        y = _fma_inv_level(a.astype(jnp.float32), h.astype(jnp.float32),
                           v.astype(jnp.float32), d.astype(jnp.float32),
                           lo_r, hi_r).astype(in_dtype)
    return (y,)


fwd_level_2d_mxu_ad.defvjp(_fwd_mxu_fwd, _fwd_mxu_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def inv_level_2d_mxu_ad(a, h, v, d, rec_lo_t, rec_hi_t, mode,
                        out_dtype=None):
    return inv_level_2d_mxu(a, h, v, d, np.asarray(rec_lo_t),
                            np.asarray(rec_hi_t), mode, out_dtype=out_dtype)


def _inv_mxu_fwd(a, h, v, d, rec_lo_t, rec_hi_t, mode, out_dtype):
    res = tuple(jnp.zeros((0,), t.dtype) for t in (a, h, v, d))
    return inv_level_2d_mxu_ad(a, h, v, d, rec_lo_t, rec_hi_t, mode,
                               out_dtype), res


def _inv_mxu_bwd(rec_lo_t, rec_hi_t, mode, out_dtype, probes, ct):
    lo_r = np.asarray(rec_lo_t)[::-1]
    hi_r = np.asarray(rec_hi_t)[::-1]
    res = fwd_level_2d_mxu(ct, lo_r, hi_r, mode)
    if res is None:
        from .separable_pallas import _fma_fwd_level
        res = _fma_fwd_level(ct.astype(jnp.float32), lo_r, hi_r)
    return tuple(t.astype(p.dtype) for t, p in zip(res, probes))


inv_level_2d_mxu_ad.defvjp(_inv_mxu_fwd, _inv_mxu_bwd)
