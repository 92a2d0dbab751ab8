"""Micro-probes of the fused forward-level kernel (real TPU only).

Times incrementally-complete kernel variants on the headline L1 geometry
(2048^2 db7) to attribute the kernel's device time to DMA, pass-1 FIR,
the inter-pass transposes, pass-2 FIR, and the output transposes — and
compares MXU (banded-matmul) formulations against the VPU FIR.

Run: python tools/kernel_probe.py
"""
from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdwt_tpu.core import conv
from pdwt_tpu.filters import get_wavelet
from pdwt_tpu.kernels import separable_pallas as sp
from pdwt_tpu.utils import device_time_any

N = 2048
WAV = get_wavelet("db7")
HLEN = WAV.hlen
B = 1

MR = MC = N // 2
TR, TC = sp._pick_tiles_2d(MR, MC, HLEN, inv=False)
_, _, PR, PC = sp._phases(sp.conv.fwd_center(HLEN))
ROWS = sp._ceil_to(2 * TR + HLEN - 2 + PR, 8)
COLS = sp._ceil_to(2 * TC + HLEN - 2 + PC, 128)
TAPS_LO = sp._taps(WAV.dec_lo)
TAPS_HI = sp._taps(WAV.dec_hi)
print(f"tiles (TR,TC)=({TR},{TC}), tile dims ({ROWS},{COLS}), "
      f"grid {MR//TR}x{MC//TC}")

LO_RG, LO_CG, hi_r, hi_c = sp.fwd_geometry(N, N, HLEN)
rng = np.random.default_rng(0)
IMG = jnp.asarray(rng.standard_normal((B, N, N)) * 255.0, jnp.float32)
XP = jax.jit(lambda x: conv.wrap_pad(conv.wrap_pad(x, -1, LO_CG, hi_c),
                                     -2, LO_RG, hi_r))(IMG)
XP.block_until_ready()


def run_probe(kernel_body, n_out=4, out_shape=None, extra_inputs=(),
              transposed_out=False):
    """pallas_call wrapper mirroring _fwd_call's structure."""
    if transposed_out:
        out_spec = pl.BlockSpec((1, TC, TR), lambda b, i, j: (b, j, i),
                                memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((B, MC, MR), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                                memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((B, MR, MC), jnp.float32)
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    for e in extra_inputs:
        in_specs.append(pl.BlockSpec(e.shape, lambda b, i, j: (0,) * e.ndim,
                                     memory_space=pltpu.VMEM))

    @jax.jit
    def call(xp, *extras):
        return pl.pallas_call(
            kernel_body,
            grid=(B, MR // TR, MC // TC),
            out_shape=(shape,) * n_out,
            in_specs=in_specs,
            out_specs=(out_spec,) * n_out,
            scratch_shapes=[pltpu.VMEM((ROWS, COLS), xp.dtype),
                            pltpu.SemaphoreType.DMA(())],
        )(xp, *extras)

    return call


def dma_tile(xp_hbm, xt, sem):
    b, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    dma = pltpu.make_async_copy(
        xp_hbm.at[b, pl.ds(2 * TR * i, ROWS), pl.ds(2 * TC * j, COLS)],
        xt, sem)
    dma.start()
    dma.wait()
    return xt[:]


# --- variant kernels -------------------------------------------------------

def k_dma_only(xp_hbm, a, h, v, d, xt, sem):
    x = dma_tile(xp_hbm, xt, sem)
    a[0] = x[:TR, :TC]
    h[0] = x[:TR, TC:2 * TC]
    v[0] = x[TR:2 * TR, :TC]
    d[0] = x[TR:2 * TR, TC:2 * TC]


def k_pass1(xp_hbm, a, h, v, d, xt, sem):
    x = dma_tile(xp_hbm, xt, sem)
    tlo, thi = sp._fir_decim_sub(x, TAPS_LO, TAPS_HI, TR)   # (TR, COLS)
    a[0] = tlo[:, :TC]
    h[0] = thi[:, :TC]
    v[0] = tlo[:, TC:2 * TC]
    d[0] = thi[:, TC:2 * TC]


def k_pass1_t(xp_hbm, a, h, v, d, xt, sem):
    x = dma_tile(xp_hbm, xt, sem)
    tlo, thi = sp._fir_decim_sub(x, TAPS_LO, TAPS_HI, TR)
    tlo_t, thi_t = tlo.T, thi.T                             # (COLS, TR)

    def wide(src):  # (TR, TC) block assembled from (COLS, TR) pieces
        parts = [src[k * TR:(k + 1) * TR, :] for k in range(TC // TR)]
        return jnp.concatenate(parts, axis=1)

    a[0] = wide(tlo_t)
    h[0] = wide(thi_t)
    v[0] = wide(tlo_t)
    d[0] = wide(thi_t)


def k_full_transposed_out(xp_hbm, a, h, v, d, xt, sem):
    """Full level but outputs written in pass-2 orientation (TC, TR) —
    the alternating-orientation candidate."""
    x = dma_tile(xp_hbm, xt, sem)
    tlo, thi = sp._fir_decim_sub(x, TAPS_LO, TAPS_HI, TR)
    a_t, v_t = sp._fir_decim_sub(tlo.T, TAPS_LO, TAPS_HI, TC)
    h_t, d_t = sp._fir_decim_sub(thi.T, TAPS_LO, TAPS_HI, TC)
    a[0], h[0], v[0], d[0] = a_t, h_t, v_t, d_t


def make_banded():
    A = np.zeros((2 * TR, ROWS), np.float32)
    for m in range(TR):
        for j in range(HLEN):
            A[m, 2 * m + j] = TAPS_LO[j]
            A[TR + m, 2 * m + j] = TAPS_HI[j]
    Bm = np.zeros((COLS, 2 * TC), np.float32)
    for m in range(TC):
        for j in range(HLEN):
            Bm[2 * m + j, m] = TAPS_LO[j]
            Bm[2 * m + j, TC + m] = TAPS_HI[j]
    return jnp.asarray(A), jnp.asarray(Bm)


def k_matmul(precision):
    def kern(xp_hbm, A_ref, B_ref, a, h, v, d, xt, sem):
        x = dma_tile(xp_hbm, xt, sem)
        t = jnp.dot(A_ref[:], x, precision=precision,
                    preferred_element_type=jnp.float32)     # (2TR, COLS)
        out = jnp.dot(t, B_ref[:], precision=precision,
                      preferred_element_type=jnp.float32)   # (2TR, 2TC)
        a[0] = out[:TR, :TC]
        v[0] = out[:TR, TC:]
        h[0] = out[TR:, :TC]
        d[0] = out[TR:, TC:]
    return kern


def t(label, fn, *xs):
    sec = device_time_any(fn, *xs)
    gb = (N * N * 4 * 2) / sec / 1e9
    print(f"{label:42s} {sec*1e3:8.3f} ms  ({gb:7.1f} GB/s eff 2x16MB)")
    return sec


def main():
    ref = jax.jit(partial(sp.fwd_level_2d_padded, dec_lo=WAV.dec_lo,
                          dec_hi=WAV.dec_hi, mshape=(MR, MC)))(XP)
    ref_a = np.asarray(ref[0])

    t("A: full current kernel",
      lambda x: sp.fwd_level_2d_padded(x, WAV.dec_lo, WAV.dec_hi, (MR, MC)),
      XP)
    t("B: DMA only", run_probe(k_dma_only), XP)
    t("C: DMA + pass1 FIR", run_probe(k_pass1), XP)
    t("D: DMA + pass1 + 2 transposes", run_probe(k_pass1_t), XP)
    t("E: full, transposed outputs",
      run_probe(k_full_transposed_out, transposed_out=True), XP)

    Am, Bm = make_banded()
    for prec, name in ((jax.lax.Precision.HIGHEST, "HIGHEST"),
                       (jax.lax.Precision.DEFAULT, "DEFAULT")):
        call = run_probe(k_matmul(prec), extra_inputs=(Am, Bm))
        out = jax.jit(call)(XP, Am, Bm)
        err = float(np.abs(np.asarray(out[0]) - ref_a).max())
        rel = err / float(np.abs(ref_a).max())
        t(f"F: MXU banded matmul ({name}) rel_err={rel:.1e}", call, XP, Am,
          Bm)

    # bf16 input tiles (serving mode): input already rounded, so DEFAULT
    # matmul precision loses nothing extra; f32 accumulation via
    # preferred_element_type.
    XPb = XP.astype(jnp.bfloat16)

    def k_matmul_bf16(xp_hbm, A_ref, B_ref, a, h, v, d, xt, sem):
        x = dma_tile(xp_hbm, xt, sem).astype(jnp.float32)
        tm = jnp.dot(A_ref[:], x, preferred_element_type=jnp.float32)
        out = jnp.dot(tm, B_ref[:], preferred_element_type=jnp.float32)
        a[0] = out[:TR, :TC]
        v[0] = out[:TR, TC:]
        h[0] = out[TR:, :TC]
        d[0] = out[TR:, TC:]

    @jax.jit
    def call_bf16(xp, Amx, Bmx):
        out_spec = pl.BlockSpec((1, TR, TC), lambda b, i, j: (b, i, j),
                                memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((B, MR, MC), jnp.float32)
        return pl.pallas_call(
            k_matmul_bf16,
            grid=(B, MR // TR, MC // TC),
            out_shape=(shape,) * 4,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(Amx.shape, lambda b, i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(Bmx.shape, lambda b, i, j: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(out_spec,) * 4,
            scratch_shapes=[pltpu.VMEM((ROWS, COLS), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA(())],
        )(xp, Amx, Bmx)

    out = call_bf16(XPb, Am, Bm)
    rel = (float(np.abs(np.asarray(out[0]) - ref_a).max())
           / float(np.abs(ref_a).max()))
    t(f"G: bf16-in MXU matmul rel_err={rel:.1e}", call_bf16, XPb, Am, Bm)


if __name__ == "__main__":
    main()
