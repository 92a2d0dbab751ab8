"""In-kernel periodic halo assembly via region DMAs.

The XLA ``wrap_pad`` the level kernels fed on costs a full materialized
copy of every (padded) operand per level — measured ~70-80 us/level on
the SWT inverse's four full-size subbands at 2048^2.  The reference
avoids this with per-thread ``mod N`` indexing (reference:
src/separable.cu:111-121, 433-438); the TPU-native equivalent is to
assemble each tile's padded VMEM window directly from the UNPADDED HBM
array with up to 3x3 region DMAs (wrap-lo | body | wrap-hi per axis),
branching on the tile's grid position.

All offsets/sizes stay tile-aligned by construction: lo pads are
already aligned (sublane 16 / lane 128 — the aligned-pad phase
machinery), tile strides are multiples of the alignment, and the array
dims divide the tiles.

Safety conditions (checked by :func:`halo_safe`; callers fall back to
the XLA-pad path when violated):

* ``lo <= T``            — only the first tile wraps at the low edge;
* ``WIN - lo <= 2*T``    — only the last tile wraps at the high edge;
* wrap amounts ``<= n``  — one whole-array copy covers each wrap.
"""
from __future__ import annotations

from typing import Tuple

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def halo_enabled() -> bool:
    """In-kernel halo is OPT-IN (PDWT_TPU_INKERNEL_HALO=1): on the v5e
    the tile-ALIGNED XLA pads the kernels otherwise feed on are nearly
    free, and the measured TI step was ~5-10% slower with the in-kernel
    assembly (the edge tiles' serialized region DMAs can't overlap the
    matmuls).  Kept for configs where pad materialization does matter
    (huge subbands, HBM-pressure-bound runs) and as the building block
    for future HBM->HBM staging."""
    import os

    return os.environ.get("PDWT_TPU_INKERNEL_HALO") == "1"


def halo_safe(G: int, T: int, lo: int, WIN: int, n: int) -> bool:
    """Can the periodic window [T*i - lo, T*i - lo + WIN) be assembled
    with the static segment cases below for every tile i in [0, G)?"""
    if lo > n or WIN - lo - (n if G == 1 else T) > n:
        return False
    if G == 1:
        return True
    return lo <= T and WIN - lo <= 2 * T


def _axis_segments(G: int, T: int, lo: int, WIN: int, n: int, q: int = 1):
    """Per-axis segment cases: list of (case, segs) where case is one of
    "first"/"mid"/"last"/"single" and segs is a list of
    (src_start(i), dst_off, size) with static dst_off/size.

    ``q`` is the axis' tile quantum (8/16 sublanes, 128 lanes): dynamic
    starts are emitted in the factored form ``(i*(T//q) - lo//q) * q``
    so Mosaic's divisibility prover accepts the HBM slice (a plain
    ``T*i - lo`` expression fails the proof even when divisible)."""
    if q > 1 and T % q == 0 and lo % q == 0:
        def dyn(i):
            return (i * (T // q) - lo // q) * q
    else:
        def dyn(i):
            return T * i - lo
    if G == 1:
        segs = [(lambda i: n - lo, 0, lo)] if lo else []
        segs.append((lambda i: 0, lo, n))
        hi = WIN - lo - n
        if hi:
            segs.append((lambda i: 0, lo + n, hi))
        return [("single", segs)]
    cases = []
    # first tile: wrap-lo from the far end + body
    fsegs = [(lambda i: n - lo, 0, lo)] if lo else []
    fsegs.append((lambda i: 0, lo, WIN - lo))
    cases.append(("first", fsegs))
    # middle tiles: one contiguous window (exists only for G >= 3, and
    # then WIN <= lo + 2T <= 3T <= n keeps the static slice in bounds)
    if G >= 3:
        cases.append(("mid", [(dyn, 0, WIN)]))
    # last tile: body to the end + wrap-hi from the start
    hi = WIN - lo - T  # bytes beyond the array end for tile G-1
    lsegs = [(dyn, 0, lo + T)]
    if hi:
        lsegs.append((lambda i: 0, lo + T, hi))
    cases.append(("last", lsegs))
    return cases


def _case_pred(case: str, idx, G: int):
    if case in ("single",):
        return None
    if case == "first":
        return idx == 0
    if case == "last":
        return idx == G - 1
    return (idx > 0) & (idx < G - 1)


def emit_halo_copies(src_hbm, dst_vmem, b, i, j, row_geom, col_geom,
                     sems) -> None:
    """Fill ``dst_vmem`` (WIN_r, WIN_c) with the periodic window of
    ``src_hbm[b]`` for tile (i, j).  ``row_geom``/``col_geom`` =
    (G, T, lo, WIN, n).  ``sems`` must hold >= 9 DMA semaphores.
    Starts and waits all DMAs inside the matching grid-position branch.
    """
    rcases = _axis_segments(*row_geom)
    ccases = _axis_segments(*col_geom)
    G_i, G_j = row_geom[0], col_geom[0]

    for rcase, rsegs in rcases:
        for ccase, csegs in ccases:
            rp = _case_pred(rcase, i, G_i)
            cp = _case_pred(ccase, j, G_j)
            if rp is None and cp is None:
                pred = None
            elif rp is None:
                pred = cp
            elif cp is None:
                pred = rp
            else:
                pred = rp & cp

            def body(rsegs=rsegs, csegs=csegs):
                dmas = []
                k = 0
                for (rs, rd, rn) in rsegs:
                    for (cs, cd, cn) in csegs:
                        dma = pltpu.make_async_copy(
                            src_hbm.at[b, pl.ds(rs(i), rn),
                                       pl.ds(cs(j), cn)],
                            dst_vmem.at[pl.ds(rd, rn), pl.ds(cd, cn)],
                            sems.at[k])
                        dma.start()
                        dmas.append(dma)
                        k += 1
                for dma in dmas:
                    dma.wait()

            if pred is None:
                body()
            else:
                pl.when(pred)(body)
