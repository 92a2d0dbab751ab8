"""Phase breakdown of the 3D SWT TI denoise step (bench_all config 7).

The composed step measured 39 ms at 64x512x512 db4 2-level — about 4x
a 2D-kernel-scaled VPU floor — and the suspect is the fma depth pass
(XLA slice-FMA re-reads the volume once per tap).  Times each phase
separately on chip so the optimization target is a measurement, not a
guess.  Usage: python tools/profile_3d.py [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np


def main(out_path="tools/profile_3d_results.json"):
    from _cli import check_out
    out_path = check_out(out_path)
    import jax.numpy as jnp

    from pdwt_tpu.core import conv
    from pdwt_tpu.core import separable3d as s3
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.models.denoiser import denoise_step_3d
    from pdwt_tpu.utils import device_time, device_time_any

    w = get_wavelet("db4")
    D, R, C = 64, 512, 512
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((D, R, C)), jnp.float32)
    rows = {}

    def rec(name, t):
        rows[name] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.3f} ms", flush=True)

    def guard(name, fn):
        try:
            rec(name, fn())
        except Exception as e:
            rows[name] = f"error: {type(e).__name__}: {e}"
            print(rows[name], flush=True)

    # 0. the whole fused TI step (the config-7 measurement)
    guard("ti_step", lambda: device_time(
        lambda v: denoise_step_3d(v, None, w, 2, 25.0, swt=True)[0], vol))

    # 1. forward / inverse alone
    c = s3.swt3d(vol, w, 2)
    guard("swt3d_fwd",
          lambda: device_time_any(lambda v: s3.swt3d(v, w, 2), vol))
    guard("iswt3d", lambda: device_time_any(lambda cc: s3.iswt3d(cc, w), c))

    # 2. the fused 2D SWT level kernel with depth as batch (level 1, 2)
    from pdwt_tpu import kernels
    lo_t = tuple(float(v) for v in w.dec_lo)
    hi_t = tuple(float(v) for v in w.dec_hi)
    flat = vol.reshape(D, R, C)
    for lvl in (1, 2):
        fn = getattr(kernels, "swt_fwd_level_2d_ad", None)
        if fn is None:
            break
        guard(f"fused2d_lvl{lvl}",
              lambda lvl=lvl: device_time_any(
                  lambda x: fn(x, lo_t, hi_t, lvl), flat))

    # 3. fma depth pass alone: analysis along axis -3, dil 1 and 2,
    # on the 4-channel stack the composition actually feeds it
    stk = jnp.stack([vol] * 4, axis=0)[None]          # (1, 4, D, R, C)
    for dil in (1, 2):
        guard(f"fma_depth_dil{dil}", lambda dil=dil: device_time_any(
            lambda z: conv.analysis_pass(z, (w.dec_lo, w.dec_hi),
                                         axis=-3, dilation=dil,
                                         decimate=False, backend="fma"),
            stk))

    # 4. depth synthesis alone (8 -> 4 channels)
    z8 = jnp.stack([vol] * 8, axis=0)[None]           # (1, 8, D, R, C)
    for dil in (1, 2):
        guard(f"fma_depth_synth_dil{dil}", lambda dil=dil: device_time_any(
            lambda z: conv.synthesis_pass(
                z, (w.rec_lo * 0.5, w.rec_hi * 0.5), axis=-3,
                dilation=dil, decimated=False, backend="fma"),
            z8))

    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
