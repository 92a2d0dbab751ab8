"""Targeted same-run A/B of the vpu_tile_sweep.py finding: pinning
(128,256) measured ~6% faster on the headline roundtrip than the
default picks.  The global knob cannot say WHICH kernel family wins,
so this pins per role (fwd / inv / both / swt-only control) and times
the exact-f32 headline roundtrip + the SWT TI step interleaved in one
process.  Usage: python tools/tile_ab.py [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np

CONFIGS = (None, "inv:128x256", "fwd:128x256", "128x256",
           "swt:128x256", "inv:128x128", "inv:64x256")


def main(out_path="tools/tile_ab_results.json"):
    from _cli import check_out
    out_path = check_out(out_path)
    import jax.numpy as jnp

    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.models.denoiser import denoise_step
    from pdwt_tpu.utils import device_time

    rng = np.random.default_rng(0)
    w = get_wavelet("db7")
    x = jnp.asarray(rng.uniform(0, 255, (2048, 2048)), jnp.float32)
    xt = jnp.asarray(rng.uniform(0, 255, (1024, 1024)), jnp.float32)
    rows = []
    for cfg in CONFIGS:
        if cfg is None:
            os.environ.pop("PDWT_TPU_VPU_TILES", None)
        else:
            os.environ["PDWT_TPU_VPU_TILES"] = cfg
        try:
            rt = device_time(
                lambda v: sep.idwt2d(sep.dwt2d(v, w, 5), w, (2048, 2048)),
                x) * 1e3
        except Exception as e:
            rt = f"error: {type(e).__name__}"
        try:
            ti = device_time(
                lambda v: denoise_step(v, None, w, 3, 25.0, swt=True)[0],
                xt) * 1e3
        except Exception as e:
            ti = f"error: {type(e).__name__}"
        rows.append({"tiles": cfg or "default",
                     "rt_ms": round(rt, 3) if isinstance(rt, float) else rt,
                     "ti_ms": round(ti, 3) if isinstance(ti, float) else ti})
        print(rows[-1], flush=True)
    os.environ.pop("PDWT_TPU_VPU_TILES", None)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
