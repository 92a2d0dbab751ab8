"""Chip probe: formulations of the à-trous DEPTH pass on (D, R, C).

The round-4 profile puts the 3D SWT TI bottleneck in the depth passes
(~3.2 ms analysis / ~4.5 ms synthesis per level at 64x512x512 vs a
~0.5 ms memory roofline): the MXU banded matmul multiplies mostly
zeros (8/64 density at HIGHEST = bf16x6), and the XLA fma slice-FMA
pays pad materialization.  Candidates, all computing the dual FIR
(lo+hi) along the major axis with periodic wrap:

  mm    — the shipped depth_matmul einsum (HIGHEST)
  roll  — sum_j taps[j] * jnp.roll(x, shift_j, axis=0): wrap free,
          XLA should fuse the rolls into one pass
  fma   — conv.analysis_pass(axis=-3, backend=fma) (pads materialize)

Usage: python tools/depth_fir_probe.py [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np


def main(out_path="tools/depth_fir_probe_results.json"):
    from _cli import check_out
    out_path = check_out(out_path)
    import jax.numpy as jnp

    from pdwt_tpu.core import conv
    from pdwt_tpu.core.depth_matmul import depth_analysis_mm
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.utils import device_time_any

    w = get_wavelet("db4")
    D, R, C = 64, 512, 512
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, D, R, C)), jnp.float32)
    taps_lo = np.asarray(w.dec_lo, np.float64)[::-1]
    taps_hi = np.asarray(w.dec_hi, np.float64)[::-1]
    hlen = len(taps_lo)
    rows = {}

    for dil in (1, 2):
        cen = conv.fwd_center(hlen) * dil

        def roll_form(v, _dil=dil, _cen=cen):
            lo = jnp.zeros_like(v)
            hi = jnp.zeros_like(v)
            for j in range(hlen):
                sh = -(j * _dil - _cen)
                r = jnp.roll(v, sh, axis=-3)
                lo = lo + float(taps_lo[j]) * r
                hi = hi + float(taps_hi[j]) * r
            return jnp.concatenate([lo, hi], axis=1)

        def mm_form(v, _dil=dil):
            return depth_analysis_mm(v, (w.dec_lo, w.dec_hi),
                                     dilation=_dil, decimate=False)

        def fma_form(v, _dil=dil):
            return conv.analysis_pass(v, (w.dec_lo, w.dec_hi), axis=-3,
                                      dilation=_dil, decimate=False,
                                      backend="fma")

        # correctness first (roll_form channel order differs: lo block
        # then hi block vs interleaved — compare per filter)
        ref = np.asarray(fma_form(x))
        got = np.asarray(roll_form(x))
        dev = max(np.abs(got[:, :4] - ref[:, 0::2]).max(),
                  np.abs(got[:, 4:] - ref[:, 1::2]).max())
        rows[f"roll_dev_dil{dil}"] = float(dev)
        for name, fn in (("mm", mm_form), ("roll", roll_form),
                         ("fma", fma_form)):
            t = device_time_any(fn, x)
            rows[f"{name}_dil{dil}_ms"] = round(t * 1e3, 3)
            print(f"{name} dil={dil}: {t*1e3:.3f} ms", flush=True)

    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
