"""Fused separable DWT level kernels (Pallas TPU).

One kernel invocation computes a FULL decomposition level — both separable
passes — on VMEM-resident tiles.  The reference needs two kernel launches
with an HBM round-trip of the temps between them (reference:
src/separable.cu:196-197), and XLA's jnp lowering materializes every
tap's strided slice; this kernel reads the (padded) image once and writes
each subband once.

The TPU-native formulation (Mosaic supports no strided slicing at all):

* every decimating FIR runs along the SUBLANE axis, where the even/odd
  polyphase split is a free ``(R, C) -> (R/2, 2, C)`` reshape (the memory
  layout is unchanged) — the contiguous-slice FMA then never touches a
  stride;
* the other (lane) axis is handled by an in-VMEM transpose before and
  after its pass — VPU-speed tile shuffles, far cheaper than the
  HBM-level relayouts XLA emits for the same ops;
* the inverse uses the zero-stuff-free polyphase synthesis (see
  core/conv._fma_synthesis_poly): each output parity is a half-length FIR
  over the unstuffed coefficients, and the parities interleave with a
  sublane ``stack + reshape`` (also layout-free).

Index semantics are identical to pdwt_tpu.core.conv (reference:
src/separable.cu:91-328); tests assert equality against the gather
oracle.  Filter taps are baked into the kernel as immediate constants —
the TPU-native analogue of the reference's CUDA constant memory
(reference: src/common.h:15-36).

Geometry limits: even filter length (all 72 built-in wavelets), even
level input sizes, subband sizes divisible by a supported tile.  Anything
else returns None and the caller falls back to the (bit-identical) jnp
fma backend.
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

_SUB_TILES = (256, 128, 64, 32, 16, 8)     # sublane-axis output tile
_LANE_TILES = (256, 128)                   # lane-axis output tile
_VMEM_BUDGET = 11 * 1024 * 1024            # stack budget per kernel body

# Interpreter mode: lets the kernels run on the CPU backend (slowly) so
# the sharded pallas path can be validated on the virtual test mesh.
# Read at call time so the default test suite can toggle it per-test.
def _INTERPRET() -> bool:
    return __import__("os").environ.get("PDWT_PALLAS_INTERPRET") == "1"


def _pick_tile(m: int, candidates) -> Optional[int]:
    for t in candidates:
        if m % t == 0:
            return t
    return None


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _vmem_est(rows: int, cols: int, hlen: int) -> int:
    # Empirical Mosaic stack usage of the fused level body: the input
    # tile plus per-tap slice temporaries and the transposed temps.
    return rows * cols * 4 * (hlen // 2 + 8)


def _phases(lo: int, *, lane_aligned: bool = True):
    """Static phase of sublane/lane-ALIGNED lo pads.  An XLA wrap pad
    whose lo amount is tile-aligned is a pure copy; unaligned lo shifts
    the whole body (a relayout measured ~10x slower), so kernels pad by
    the aligned amount and carry the phase in their slice arithmetic.

    Row alignment is free (the 8-quantized tile height rarely grows and
    sublane slice offsets cost the same at any phase).  LANE alignment
    is a trade-off: the phase (up to 127) widens the 128-quantized tile,
    growing pass-1 FIR work.  The decimated kernels' lane halos are tiny
    (cen < 20) and their unaligned lane pads cheap, so they keep exact
    lane pads (``lane_aligned=False``); the SWT kernels' four full-size
    subband pads dominate instead, so they align both axes."""
    lo_r = _ceil_to(lo, 8)
    lo_c = _ceil_to(lo, 128) if lane_aligned else lo
    return lo_r, lo_c, lo_r - lo, lo_c - lo


def _vpu_tile_override(mr: int, mc: int, role: str = "any"):
    """Sweep knob: PDWT_TPU_VPU_TILES="TRxTC" pins the exact-kernel tile
    pair (when divisibility holds), bypassing the VMEM estimate so
    tools/vpu_tile_sweep.py can measure configs the conservative formula
    rejects.  A comma list of "role:TRxTC" entries pins per kernel
    family instead ("fwd"/"inv" = decimated DWT passes, "swt" = the
    à-trous kernels) so A/B runs can isolate one family.  Not a
    user-facing knob — oversized tiles fail Mosaic compilation."""
    env = __import__("os").environ.get("PDWT_TPU_VPU_TILES")
    if not env:
        return None
    for part in env.split(","):
        want, _, tiles = part.rpartition(":")
        if want and want != role:
            continue
        tr, tc = (int(v) for v in tiles.split("x"))
        if mr % tr == 0 and mc % tc == 0:
            return tr, tc
    return None


def _pick_tiles_2d(mr: int, mc: int, hlen: int, *, inv: bool):
    """Largest (TR, TC) pair whose kernel body fits the VMEM budget."""
    ov = _vpu_tile_override(mr, mc, "inv" if inv else "fwd")
    if ov is not None:
        return ov
    if inv:
        _, _, lo, hi = _poly_geometry(hlen)
        _, _, pr, pc = _phases(lo, lane_aligned=False)
        dims = lambda tr, tc: (_ceil_to(tr + lo + hi + pr, 8),
                               _ceil_to(tc + lo + hi + pc, 128))
    else:
        _, _, pr, pc = _phases(conv.fwd_center(hlen), lane_aligned=False)
        dims = lambda tr, tc: (_ceil_to(2 * tr + hlen - 2 + pr, 8),
                               _ceil_to(2 * tc + hlen - 2 + pc, 128))
    best = None
    for tr in _SUB_TILES:
        if mr % tr:
            continue
        for tc in _LANE_TILES:
            if mc % tc:
                continue
            rows, cols = dims(tr, tc)
            if _vmem_est(rows, cols, hlen) > _VMEM_BUDGET:
                continue
            if best is None or tr * tc > best[0] * best[1]:
                best = (tr, tc)
    return best


def _taps(f: np.ndarray) -> Tuple[float, ...]:
    """Reversed (correlation-order) taps as a hashable tuple."""
    return tuple(float(v) for v in np.asarray(f, np.float64)[::-1])


# ---------------------------------------------------------------------------
# in-kernel building blocks (operate on VMEM values)
# ---------------------------------------------------------------------------

def _fir_decim_sub(x, taps_lo, taps_hi, n_out, off: int = 0):
    """Dual decimate-by-2 FIR along axis 0 (sublanes).

    x: (2*n_out + hlen - 2 + off, C).  out[m] = sum_j t[j] * x[2m+j+off]
    via the free parity reshape; returns (lo, hi) each (n_out, C).

    Each tap's misaligned sublane slice costs a vreg-shift of the whole
    tile — the dominant kernel cost — so the slice is formed ONCE and
    shared by both filters (the lo/hi taps read identical windows)."""
    hlen = len(taps_lo)
    rows, c = x.shape
    xr = x.reshape(rows // 2, 2, c)
    even, odd = xr[:, 0, :], xr[:, 1, :]

    acc_lo = acc_hi = None
    for j in range(hlen):
        jj = j + off  # static phase: aligned lo pads shift every window
        src = even if jj % 2 == 0 else odd
        a = jj // 2
        sl = src[a:a + n_out, :]
        tl = taps_lo[j] * sl
        th = taps_hi[j] * sl
        acc_lo = tl if acc_lo is None else acc_lo + tl
        acc_hi = th if acc_hi is None else acc_hi + th
    return acc_lo, acc_hi


def _poly_geometry(hlen: int):
    """Parity/offset bookkeeping of the stuff-free synthesis (matches
    core/conv._fma_synthesis_poly)."""
    s = conv.inv_shift(hlen)
    p = (s % 2, 1 - s % 2)
    o = (-(s // 2), (1 - s + (1 - s % 2)) // 2)
    nb = tuple(len(range(p[q], hlen, 2)) for q in (0, 1))
    lo = max(0, -min(o))
    hi = max(0, max(o[q] + nb[q] - 1 for q in (0, 1)))
    return p, o, lo, hi


def _fir_synth_sub(lo_band, hi_band, taps_lo, taps_hi, m_out, off: int = 0):
    """Stuff-free synthesis along axis 0: bands (m_out + lo + hi + off, C)
    -> upsampled (2*m_out, C), parities interleaved via sublane reshape.
    ``off`` is the static phase of an aligned lo pad.

    Slices are cached by (band, start): when both parities' offset sets
    overlap (they coincide for every even-hlen wavelet), each shifted
    window is materialized once instead of once per parity."""
    hlen = len(taps_lo)
    p, o, lo_pad, _ = _poly_geometry(hlen)
    cache = {}

    def window(bi, band, start):
        key = (bi, start)
        if key not in cache:
            cache[key] = band[start:start + m_out, :]
        return cache[key]

    outs = []
    for q in (0, 1):
        acc = None
        for bi, (band, taps) in enumerate(((lo_band, taps_lo),
                                           (hi_band, taps_hi))):
            for b, j in enumerate(range(p[q], hlen, 2)):
                term = taps[j] * window(bi, band, off + lo_pad + o[q] + b)
                acc = term if acc is None else acc + term
        outs.append(acc)
    c = outs[0].shape[1]
    return jnp.stack(outs, axis=1).reshape(2 * m_out, c)


# ---------------------------------------------------------------------------
# forward level
# ---------------------------------------------------------------------------

def _decode3(t, g1, g2):
    """Linear grid step -> (b, i, j) for a (B, g1, g2) grid."""
    b = t // (g1 * g2)
    r = t % (g1 * g2)
    return b, r // g2, r % g2


def _make_fwd_kernel(taps_lo, taps_hi, hlen, TR, TC, grid):
    # DMA windows must be tile-aligned (8 sublanes x 128 lanes); the
    # padded input carries aligned lo pads (pure-copy XLA pad) and the
    # alignment margin; the FIR slice arithmetic carries the phase.
    B, GI, GJ = grid
    nsteps = B * GI * GJ
    _, _, pr, pc = _phases(conv.fwd_center(hlen), lane_aligned=False)
    rows = _ceil_to(2 * TR + hlen - 2 + pr, 8)
    cols = _ceil_to(2 * TC + hlen - 2 + pc, 128)

    def copy_for(xp_hbm, xt2, sems, t):
        b, i, j = _decode3(t, GI, GJ)
        slot = t % 2
        return pltpu.make_async_copy(
            xp_hbm.at[b, pl.ds(2 * TR * i, rows), pl.ds(2 * TC * j, cols)],
            xt2.at[slot], sems.at[slot])

    def kernel(xp_hbm, a_ref, h_ref, v_ref, d_ref, xt2, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        t = (b * GI + i) * GJ + j

        # double-buffered input pipeline: tile t was prefetched at step
        # t-1 (t=0 fetches synchronously); tile t+1 starts now and lands
        # while this tile computes.
        @pl.when(t == 0)
        def _():
            copy_for(xp_hbm, xt2, sems, t).start()

        @pl.when(t + 1 < nsteps)
        def _():
            copy_for(xp_hbm, xt2, sems, t + 1).start()

        copy_for(xp_hbm, xt2, sems, t).wait()

        def compute(x):
            # pass 1: along rows (sublanes), keeping the column halo.
            # The separable passes commute, so running the row axis
            # first is equivalent to the reference's column-first order.
            tlo, thi = _fir_decim_sub(x, taps_lo, taps_hi, TR, off=pr)
            # pass 2: columns -> transpose so the FIR runs on sublanes.
            # H = highpass along rows = hi row-pass + lo col-pass.
            a_t, v_t = _fir_decim_sub(tlo.T, taps_lo, taps_hi, TC, off=pc)
            h_t, d_t = _fir_decim_sub(thi.T, taps_lo, taps_hi, TC, off=pc)
            a_ref[0] = a_t.T
            h_ref[0] = h_t.T
            v_ref[0] = v_t.T
            d_ref[0] = d_t.T

        # static slot indices: dynamic VMEM addressing taxes every FIR
        # slice, so the body is instantiated per slot under pl.when.
        slot = t % 2

        @pl.when(slot == 0)
        def _():
            compute(xt2[0])

        @pl.when(slot == 1)
        def _():
            compute(xt2[1])

    return kernel, rows, cols


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "tiles", "mshape"))
def _fwd_call(xp, taps, hlen, tiles, mshape):
    taps_lo, taps_hi = taps
    TR, TC = tiles
    B = xp.shape[0]
    mr, mc = mshape
    grid = (B, mr // TR, mc // TC)
    kernel, rows, cols = _make_fwd_kernel(taps_lo, taps_hi, hlen, TR, TC,
                                          grid)
    out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, mr, mc), xp.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(shape, shape, shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_INTERPRET(),
    )(xp)


def pallas_supported_fwd(shape: Tuple[int, int], hlen: int) -> bool:
    r, c = shape
    if hlen % 2 or r % 2 or c % 2:
        return False
    return _pick_tiles_2d(r // 2, c // 2, hlen, inv=False) is not None


def fwd_geometry(r: int, c: int, hlen: int):
    """(lo_r, lo_c, hi_r, hi_c) padding a forward level's kernel expects
    around an even (r, c) input — periodic support rounded UP to aligned
    lo pads (pure-copy XLA pad; the kernel carries the phase) + the DMA
    alignment margin — or None if unsupported.  The distributed engine
    fetches these amounts via ring halo exchange instead of local wrap
    padding."""
    if hlen % 2 or r % 2 or c % 2:
        return None
    tiles = _pick_tiles_2d(r // 2, c // 2, hlen, inv=False)
    if tiles is None:
        return None
    TR, TC = tiles
    lo_r, lo_c, pr, pc = _phases(conv.fwd_center(hlen), lane_aligned=False)
    rows_al = _ceil_to(2 * TR + hlen - 2 + pr, 8)
    cols_al = _ceil_to(2 * TC + hlen - 2 + pc, 128)
    # hi pad covers the filter support plus the DMA alignment margin of
    # the last tile: total rows = lo_r + r + hi_r = (r - 2*TR) + rows_al.
    hi_r = (r - 2 * TR + rows_al) - r - lo_r
    hi_c = (c - 2 * TC + cols_al) - c - lo_c
    return lo_r, lo_c, hi_r, hi_c


def fwd_level_2d_padded(xp: jnp.ndarray, dec_lo, dec_hi,
                        mshape: Tuple[int, int]):
    """Forward level on an already-padded input (see fwd_geometry)."""
    hlen = len(dec_lo)
    mr, mc = mshape
    TR, TC = _pick_tiles_2d(mr, mc, hlen, inv=False)
    return _fwd_call(xp, (_taps(dec_lo), _taps(dec_hi)), hlen, (TR, TC),
                     (mr, mc))


def fwd_level_2d(x: jnp.ndarray, dec_lo: np.ndarray, dec_hi: np.ndarray):
    """One forward level on (B, R, C) even-sized input -> (a, h, v, d)
    each (B, R/2, C/2); None if the geometry is unsupported."""
    B, r, c = x.shape
    hlen = len(dec_lo)
    if x.dtype != jnp.float32:
        return None
    geo = fwd_geometry(r, c, hlen)
    if geo is None:
        return None
    lo_r, lo_c, hi_r, hi_c = geo
    xp = conv.wrap_pad(x, -1, lo_c, hi_c)
    xp = conv.wrap_pad(xp, -2, lo_r, hi_r)
    return fwd_level_2d_padded(xp, dec_lo, dec_hi, (r // 2, c // 2))


# ---------------------------------------------------------------------------
# inverse level
# ---------------------------------------------------------------------------

def _make_inv_kernel(taps_lo, taps_hi, hlen, TR, TC, pad, grid):
    lo_pad, hi_pad = pad
    B, GI, GJ = grid
    nsteps = B * GI * GJ
    _, _, pr, pc = _phases(lo_pad, lane_aligned=False)
    rows = _ceil_to(TR + lo_pad + hi_pad + pr, 8)
    cols = _ceil_to(TC + lo_pad + hi_pad + pc, 128)

    def copies_for(srcs, tiles, sems, t):
        b, i, j = _decode3(t, GI, GJ)
        slot = t % 2
        return [
            pltpu.make_async_copy(
                src.at[b, pl.ds(TR * i, rows), pl.ds(TC * j, cols)],
                tile.at[slot], sems.at[slot, idx])
            for idx, (src, tile) in enumerate(zip(srcs, tiles))
        ]

    def kernel(a_hbm, h_hbm, v_hbm, d_hbm, out_ref, at, ht, vt, dt, sems):
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
            # pass 1: rows (sublanes), column halo kept: (2TR, cols)
            t1 = _fir_synth_sub(at[s], ht[s], taps_lo, taps_hi, TR, off=pr)
            t2 = _fir_synth_sub(vt[s], dt[s], taps_lo, taps_hi, TR, off=pr)
            # pass 2: columns via transpose: (2TC, 2TR) -> out (2TR, 2TC)
            out_t = _fir_synth_sub(t1.T, t2.T, taps_lo, taps_hi, TC, off=pc)
            out_ref[0] = out_t.T

        slot = t % 2

        @pl.when(slot == 0)
        def _():
            compute(0)

        @pl.when(slot == 1)
        def _():
            compute(1)

    return kernel, rows, cols


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "tiles", "pad",
                                              "mshape"))
def _inv_call(ap, hp, vp, dp, taps, hlen, tiles, pad, mshape):
    taps_lo, taps_hi = taps
    TR, TC = tiles
    lo_pad, hi_pad = pad
    B = ap.shape[0]
    mr, mc = mshape
    grid = (B, mr // TR, mc // TC)
    kernel, rows, cols = _make_inv_kernel(taps_lo, taps_hi, hlen, TR, TC,
                                          pad, grid)
    out_spec = pl.BlockSpec((1, 2 * TR, 2 * TC), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, 2 * mr, 2 * mc), ap.dtype)
    tile = lambda: pltpu.VMEM((2, rows, cols), ap.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=out_spec,
        scratch_shapes=[tile(), tile(), tile(), tile(),
                        pltpu.SemaphoreType.DMA((2, 4))],
        interpret=_INTERPRET(),
    )(ap, hp, vp, dp)


def pallas_supported_inv(mshape: Tuple[int, int], hlen: int) -> bool:
    mr, mc = mshape
    if hlen % 2:
        return False
    return _pick_tiles_2d(mr, mc, hlen, inv=True) is not None


def inv_geometry(mr: int, mc: int, hlen: int):
    """(lo_r, lo_c, hi_r, hi_c) coefficient-domain padding the inverse
    kernel expects around (mr, mc) subbands (aligned lo pads, see
    fwd_geometry), or None if unsupported."""
    if hlen % 2:
        return None
    tiles = _pick_tiles_2d(mr, mc, hlen, inv=True)
    if tiles is None:
        return None
    TR, TC = tiles
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    lo_r, lo_c, pr, pc = _phases(lo_pad, lane_aligned=False)
    rows_al = _ceil_to(TR + lo_pad + hi_pad + pr, 8)
    cols_al = _ceil_to(TC + lo_pad + hi_pad + pc, 128)
    hi_r = (mr - TR + rows_al) - mr - lo_r
    hi_c = (mc - TC + cols_al) - mc - lo_c
    return lo_r, lo_c, hi_r, hi_c


def inv_level_2d_padded(ap, hp, vp, dp, rec_lo, rec_hi,
                        mshape: Tuple[int, int]):
    """Inverse level on already-padded subbands (see inv_geometry)."""
    hlen = len(rec_lo)
    mr, mc = mshape
    TR, TC = _pick_tiles_2d(mr, mc, hlen, inv=True)
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)
    return _inv_call(ap, hp, vp, dp, (_taps(rec_lo), _taps(rec_hi)), hlen,
                     (TR, TC), (lo_pad, hi_pad), (mr, mc))


def inv_level_2d(a, h, v, d, rec_lo: np.ndarray, rec_hi: np.ndarray):
    """One inverse level: subbands (B, Mr, Mc) -> (B, 2Mr, 2Mc); None if
    unsupported (caller slices to odd out_len when needed)."""
    B, mr, mc = a.shape
    hlen = len(rec_lo)
    if a.dtype != jnp.float32:
        return None
    geo = inv_geometry(mr, mc, hlen)
    if geo is None:
        return None
    lo_r, lo_c, hi_r, hi_c = geo

    def pad2(arr):
        arr = conv.wrap_pad(arr, -1, lo_c, hi_c)
        return conv.wrap_pad(arr, -2, lo_r, hi_r)

    return inv_level_2d_padded(pad2(a), pad2(h), pad2(v), pad2(d),
                               rec_lo, rec_hi, (mr, mc))


# ---------------------------------------------------------------------------
# trailing-level fusion: once the approximation fits in VMEM, every
# remaining level runs inside ONE kernel invocation — periodic wrap
# becomes a value concatenate, there is no XLA pad, no per-level
# dispatch, and no tile-divisibility constraint (so the 64^2-and-below
# levels that used to fall back to the fma path stay fused).  The
# reference launches 2 kernels + an HBM round-trip per level regardless
# of size (reference: src/separable.cu:199-207).
# ---------------------------------------------------------------------------

_TAIL_BUDGET = 9 * 1024 * 1024


def _tail_supported(shape: Tuple[int, int], hlen: int, levels: int) -> bool:
    r, c = shape
    if hlen % 2 or levels < 1:
        return False
    if r % (1 << levels) or c % (1 << levels):
        return False
    if r % 8 or c % 128 or r < 8 or c < 128:
        return False  # whole-image DMA window must be tile-aligned
    est = (r + hlen + 8) * c * 4 * (hlen // 2 + 8)
    return est <= _TAIL_BUDGET


def _wrap_sub(x, lo: int, hi: int):
    """Periodic extension along axis 0 as a value concatenate.  Halos
    wider than the axis tile whole copies (like conv.wrap_pad) — long
    wavelets fused down to tiny deep levels need lo/hi > axis length."""
    n = x.shape[0]
    if lo == 0 and hi == 0:
        return x
    parts = []
    if lo:
        full, rem = divmod(lo, n)
        if rem:
            parts.append(x[n - rem:, :])
        parts.extend([x] * full)
    parts.append(x)
    if hi:
        full, rem = divmod(hi, n)
        parts.extend([x] * full)
        if rem:
            parts.append(x[:rem, :])
    return jnp.concatenate(parts, axis=0)


def _make_tail_fwd_kernel(taps_lo, taps_hi, hlen, shape, levels):
    R, C = shape
    cen = conv.fwd_center(hlen)
    hi_ext = hlen - 2 - cen

    def kernel(x_hbm, *refs):
        a_ref = refs[0]
        det_refs = refs[1:3 * levels + 1]
        xt, sem = refs[3 * levels + 1], refs[3 * levels + 2]
        b = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[b], xt, sem)
        dma.start()
        dma.wait()
        a = xt[:]
        for lvl in range(levels):
            r, c = a.shape
            u = _wrap_sub(a, cen, hi_ext)
            tlo, thi = _fir_decim_sub(u, taps_lo, taps_hi, r // 2)
            ul = _wrap_sub(tlo.T, cen, hi_ext)
            uh = _wrap_sub(thi.T, cen, hi_ext)
            a_t, v_t = _fir_decim_sub(ul, taps_lo, taps_hi, c // 2)
            h_t, d_t = _fir_decim_sub(uh, taps_lo, taps_hi, c // 2)
            det_refs[3 * lvl][0] = h_t.T
            det_refs[3 * lvl + 1][0] = v_t.T
            det_refs[3 * lvl + 2][0] = d_t.T
            a = a_t.T
        a_ref[0] = a

    return kernel


def fwd_tail_2d(x: jnp.ndarray, dec_lo, dec_hi, levels: int):
    """All remaining `levels` on a VMEM-resident (B, R, C) approx in one
    kernel.  Returns (a, [(h, v, d), ...]) or None if unsupported."""
    B, R, C = x.shape
    hlen = len(dec_lo)
    if x.dtype != jnp.float32 or not _tail_supported((R, C), hlen, levels):
        return None
    return _tail_fwd_call(x, (_taps(dec_lo), _taps(dec_hi)), hlen, levels)


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "levels"))
def _tail_fwd_call(x, taps, hlen, levels):
    taps_lo, taps_hi = taps
    B, R, C = x.shape
    kernel = _make_tail_fwd_kernel(taps_lo, taps_hi, hlen, (R, C), levels)
    out_shapes = [jax.ShapeDtypeStruct((B, R >> levels, C >> levels),
                                       x.dtype)]
    out_specs = [pl.BlockSpec((1, R >> levels, C >> levels),
                              lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    for lvl in range(1, levels + 1):
        shp = (B, R >> lvl, C >> lvl)
        spec = pl.BlockSpec((1, R >> lvl, C >> lvl), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
        for _ in range(3):
            out_shapes.append(jax.ShapeDtypeStruct(shp, x.dtype))
            out_specs.append(spec)
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((R, C), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=_INTERPRET(),
    )(x)
    a = outs[0]
    details = [tuple(outs[1 + 3 * k:4 + 3 * k]) for k in range(levels)]
    return a, details


def _make_tail_inv_kernel(taps_lo, taps_hi, hlen, levels, batch):
    # The subbands are too small for sliced DMA windows (lane dims drop
    # under 128), so the whole (B, m, m') arrays are copied in one go
    # and the batch loop is unrolled in the kernel body.
    _, _, lo_pad, hi_pad = _poly_geometry(hlen)

    def kernel(*refs):
        # inputs: a, (h, v, d) x levels (deepest first); output: image
        srcs = refs[:3 * levels + 1]
        out_ref = refs[3 * levels + 1]
        tiles = refs[3 * levels + 2:6 * levels + 3]
        sems = refs[6 * levels + 3]
        copies = [pltpu.make_async_copy(src, tile, sems.at[k])
                  for k, (src, tile) in enumerate(zip(srcs, tiles))]
        for dma in copies:
            dma.start()
        for dma in copies:
            dma.wait()
        for b in range(batch):
            a = tiles[0][b]
            for lvl in range(levels):  # deepest first
                h = tiles[1 + 3 * lvl][b]
                v = tiles[2 + 3 * lvl][b]
                d = tiles[3 + 3 * lvl][b]
                m_r, m_c = a.shape
                ua = _wrap_sub(a, lo_pad, hi_pad)
                uh = _wrap_sub(h, lo_pad, hi_pad)
                uv = _wrap_sub(v, lo_pad, hi_pad)
                ud = _wrap_sub(d, lo_pad, hi_pad)
                t1 = _fir_synth_sub(ua, uh, taps_lo, taps_hi, m_r)
                t2 = _fir_synth_sub(uv, ud, taps_lo, taps_hi, m_r)
                u1 = _wrap_sub(t1.T, lo_pad, hi_pad)
                u2 = _wrap_sub(t2.T, lo_pad, hi_pad)
                out_t = _fir_synth_sub(u1, u2, taps_lo, taps_hi, m_c)
                a = out_t.T
            out_ref[b] = a

    return kernel


def inv_tail_2d(a: jnp.ndarray, details, rec_lo, rec_hi):
    """Inverse of fwd_tail_2d: a (B, m, m') + details (deepest-first list
    of (h, v, d)) -> (B, m<<levels, m'<<levels); None if unsupported."""
    levels = len(details)
    B, mr, mc = a.shape
    hlen = len(rec_lo)
    if a.dtype != jnp.float32:
        return None
    R, C = mr << levels, mc << levels
    # whole-array DMA: the batch rides along, so it scales the budget
    if not _tail_supported((R, C), hlen, levels) or \
            B * (R + hlen + 8) * C * 4 * (hlen // 2 + 8) > _TAIL_BUDGET:
        return None
    flat = []
    for (h, v, d) in details:
        flat.extend((h, v, d))
    return _tail_inv_call(a, tuple(flat), (_taps(rec_lo), _taps(rec_hi)),
                          hlen, levels)


@functools.partial(jax.jit, static_argnames=("taps", "hlen", "levels"))
def _tail_inv_call(a, flat_details, taps, hlen, levels):
    taps_lo, taps_hi = taps
    B, mr, mc = a.shape
    R, C = mr << levels, mc << levels
    kernel = _make_tail_inv_kernel(taps_lo, taps_hi, hlen, levels, B)
    scratch = [pltpu.VMEM((B, mr, mc), a.dtype)]
    for lvl in range(levels):
        for _ in range(3):
            scratch.append(pltpu.VMEM((B, mr << lvl, mc << lvl), a.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((3 * levels + 1,)))
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((B, R, C), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (3 * levels + 1),
        out_specs=pl.BlockSpec((B, R, C), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=_INTERPRET(),
    )(a, *flat_details)
    return out


# ---------------------------------------------------------------------------
# autodiff: the transforms are linear; the adjoint of the decimated
# analysis with filters f is the (stuff-free polyphase) synthesis with
# taps f[::-1] — for even hlen the synthesis shift inv_shift(hlen) ==
# hlen/2 equals the complementary analysis center hlen-1-c, so the
# existing kernels implement each other's VJPs exactly.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fwd_level_2d_ad(x, dec_lo_t, dec_hi_t):
    """Differentiable wrapper (filters as hashable tuples)."""
    return fwd_level_2d(x, np.asarray(dec_lo_t), np.asarray(dec_hi_t))


def _fwd2d_fwd(x, dec_lo_t, dec_hi_t):
    return fwd_level_2d_ad(x, dec_lo_t, dec_hi_t), None


def _fwd2d_bwd(dec_lo_t, dec_hi_t, _, ct):
    a, h, v, d = ct
    lo_r = np.asarray(dec_lo_t)[::-1]
    hi_r = np.asarray(dec_hi_t)[::-1]
    y = inv_level_2d(a, h, v, d, lo_r, hi_r)
    if y is None:
        y = _fma_inv_level(a, h, v, d, lo_r, hi_r)
    return (y,)


fwd_level_2d_ad.defvjp(_fwd2d_fwd, _fwd2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def inv_level_2d_ad(a, h, v, d, rec_lo_t, rec_hi_t):
    return inv_level_2d(a, h, v, d, np.asarray(rec_lo_t),
                        np.asarray(rec_hi_t))


def _inv2d_fwd(a, h, v, d, rec_lo_t, rec_hi_t):
    return inv_level_2d_ad(a, h, v, d, rec_lo_t, rec_hi_t), None


def _inv2d_bwd(rec_lo_t, rec_hi_t, _, ct):
    lo_r = np.asarray(rec_lo_t)[::-1]
    hi_r = np.asarray(rec_hi_t)[::-1]
    res = fwd_level_2d(ct, lo_r, hi_r)
    if res is None:
        res = _fma_fwd_level(ct, lo_r, hi_r)
    return res


inv_level_2d_ad.defvjp(_inv2d_fwd, _inv2d_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fwd_tail_2d_ad(x, dec_lo_t, dec_hi_t, levels):
    return fwd_tail_2d(x, np.asarray(dec_lo_t), np.asarray(dec_hi_t),
                       levels)


def _tail_fwd_fwd(x, dec_lo_t, dec_hi_t, levels):
    return fwd_tail_2d_ad(x, dec_lo_t, dec_hi_t, levels), None


def _tail_fwd_bwd(dec_lo_t, dec_hi_t, levels, _, ct):
    ct_a, ct_details = ct
    lo_r = np.asarray(dec_lo_t)[::-1]
    hi_r = np.asarray(dec_hi_t)[::-1]
    # adjoint of the fused analysis = fused synthesis with reversed taps
    dets = list(reversed(list(ct_details)))  # deepest first
    y = inv_tail_2d(ct_a, dets, lo_r, hi_r)
    if y is None:
        a = ct_a
        for (h, v, d) in dets:
            a = _fma_inv_level(a, h, v, d, lo_r, hi_r)
        y = a
    return (y,)


fwd_tail_2d_ad.defvjp(_tail_fwd_fwd, _tail_fwd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def inv_tail_2d_ad(a, flat_details, rec_lo_t, rec_hi_t, levels):
    dets = [tuple(flat_details[3 * k:3 * k + 3]) for k in range(levels)]
    return inv_tail_2d(a, dets, np.asarray(rec_lo_t), np.asarray(rec_hi_t))


def _tail_inv_fwd(a, flat_details, rec_lo_t, rec_hi_t, levels):
    return inv_tail_2d_ad(a, flat_details, rec_lo_t, rec_hi_t, levels), None


def _tail_inv_bwd(rec_lo_t, rec_hi_t, levels, _, ct):
    lo_r = np.asarray(rec_lo_t)[::-1]
    hi_r = np.asarray(rec_hi_t)[::-1]
    res = fwd_tail_2d(ct, lo_r, hi_r, levels)
    if res is None:
        a, dets = ct, []
        for _ in range(levels):
            r = _fma_fwd_level(a, lo_r, hi_r)
            a = r[0]
            dets.append((r[1], r[2], r[3]))
        res = a, dets
    a_ct, det_ct = res
    flat = []
    for (h, v, d) in reversed(det_ct):  # back to deepest-first
        flat.extend((h, v, d))
    return a_ct, tuple(flat)


inv_tail_2d_ad.defvjp(_tail_inv_fwd, _tail_inv_bwd)


def _fma_fwd_level(x, lo, hi):
    """fma fallback used inside VJPs when a kernel geometry is refused."""
    dec = (np.asarray(lo), np.asarray(hi))
    z = conv.analysis_pass(x[:, None], dec, axis=-1, backend="fma")
    z = conv.analysis_pass(z, dec, axis=-2, backend="fma")
    return z[:, 0], z[:, 1], z[:, 2], z[:, 3]


def _fma_inv_level(a, h, v, d, lo, hi):
    rec = (np.asarray(lo), np.asarray(hi))
    z = jnp.concatenate([t[:, None] for t in (a, h, v, d)], axis=1)
    t2 = conv.synthesis_pass(z, rec, axis=-2, backend="fma")
    return conv.synthesis_pass(t2, rec, axis=-1, backend="fma")[:, 0]
