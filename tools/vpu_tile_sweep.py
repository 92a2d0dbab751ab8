"""Exact-VPU tile autotune sweep (real TPU) — measures whether tiles the
conservative VMEM estimate rejects (roadmap: (256,256)-class) actually
compile and win on the headline exact-f32 workloads.

The PDWT_TPU_VPU_TILES override pins the (TR, TC) pair for every exact
fused kernel in a run; configs that exceed real VMEM fail Mosaic
compilation and are recorded as "compile_error".  Sweeps the headline
roundtrip (2D db7 5-level 2048^2) and the exact SWT TI step (1024^2
3-level db7).  Run: ``python tools/vpu_tile_sweep.py [out.json]``.

Static analysis of the db7 candidates (what the default picker does
and what the sweep can change) — input-region cells per output pixel
measure the redundant-halo + lane-padding work of the forward pass:

  fwd L1-3 default (128,256): 272x640 cells for 32.8k out = 5.31  10.0 MB
      (256,128):              528x384 = 6.18 cells/out (WORSE)    11.6 MB
      (256,256):              528x640 = 5.16 cells/out (-3%)      19.3 MB
  inv L1-3 default: already (256,256) (smaller halo geometry).

So the only head-room the 11 MB budget hides is fwd (256,256) at an
estimated 19.3 MB — a real-VMEM gamble worth one measured attempt —
and the predicted ceiling is ~3% on pass-1 work.  The inverse cannot
improve by tiling (already maximal).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np

TILES = (None, "256x256", "256x128", "128x256", "128x128", "64x256")


def main(out_path: str = "tools/vpu_tile_sweep_results.json") -> None:
    from _cli import check_out
    out_path = check_out(out_path)
    import jax
    import jax.numpy as jnp

    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet
    from pdwt_tpu.utils import device_time

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    w = get_wavelet("db7")
    N = 2048
    x = jnp.asarray(rng.uniform(0, 255, (N, N)), jnp.float32)
    M = 1024
    x1 = jnp.asarray(rng.uniform(0, 255, (M, M)), jnp.float32)

    def rt(v):
        return sep.idwt2d(sep.dwt2d(v, w, 5), w, (N, N))

    def ti(v):
        c = sep.swt2d(v, w, 3)
        return sep.iswt2d_denoise(c, w, 10.0, mode="soft")

    results = {"device": f"{dev.platform}:{dev.device_kind}",
               "config": "exact f32: 2D db7 5-level fwd+inv 2048^2 / "
                         "SWT TI 1024^2 3-level",
               "caveat": "remote-tunnel timings swing ~2x between runs; "
                         "within-run ordering is meaningful, cross-run "
                         "absolute values are not.",
               "sweep": []}
    for tiles in TILES:
        if tiles is None:
            os.environ.pop("PDWT_TPU_VPU_TILES", None)
        else:
            os.environ["PDWT_TPU_VPU_TILES"] = tiles
        row = {"tiles": tiles or "default"}
        for key, fn, arg in (("rt_ms", rt, x), ("ti_ms", ti, x1)):
            try:
                jax.block_until_ready(jax.jit(fn)(arg))
                row[key] = round(device_time(fn, arg) * 1e3, 3)
            except Exception as e:  # Mosaic VMEM OOM etc.
                row[key] = f"compile_error: {type(e).__name__}"
        results["sweep"].append(row)
        print(row, flush=True)
    os.environ.pop("PDWT_TPU_VPU_TILES", None)

    for mode, key in (("rt", "rt_ms"), ("ti", "ti_ms")):
        timed = [r for r in results["sweep"]
                 if isinstance(r[key], float)]
        if timed:
            results[f"best_{mode}"] = min(timed, key=lambda r: r[key])[
                "tiles"]
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
