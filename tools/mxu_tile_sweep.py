"""MXU tile autotune sweep (real TPU) — records the measured basis for
the scheme-dependent tile preference tables in
``kernels/matmul_pallas._tile_candidates``.

Sweeps the (TR, TC) candidates over the headline roundtrip for each
precision mode (the PDWT_TPU_MXU_TILES override pins the preference
order per run) and the SWT TI step, writing one JSON artifact with the
winner per mode.  Run: ``python tools/mxu_tile_sweep.py [out.json]``.

Round-3 findings this sweep produced (v5e, 2048^2 db7 5-level, same-run
slope timings — see CLAUDE.md "Perf facts settled in round 3"):

  bf16  (single-pass schemes): (128,256) 26.4 GPix/s > (32,128) 18.2
        > (64,128) 15.7 > (128,128) 15.0  -> big tiles win
  mixed (bf16x3):              (32,128) 7.73 ~ (64,128) 7.68
        > (128,128) 6.5 > (128,256) 6.4   -> small K dims win
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np

TILES = ("128x256", "128x128", "64x128", "32x128")


def main(out_path: str = "tools/mxu_tile_sweep_results.json") -> None:
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
    xb = x.astype(jnp.bfloat16)
    M = 1024
    x1 = jnp.asarray(rng.uniform(0, 255, (M, M)), jnp.float32)
    x1b = x1.astype(jnp.bfloat16)

    def rt(v):
        return sep.idwt2d(sep.dwt2d(v, w, 5), w, (N, N))

    def ti(v):
        c = sep.swt2d(v, w, 3)
        return sep.iswt2d_denoise(c, w, 10.0, mode="soft")

    results = {"device": f"{dev.platform}:{dev.device_kind}",
               "config": "2D db7 5-level fwd+inv 2048^2 / SWT TI 1024^2",
               "caveat": "remote-tunnel timings swing ~2x between runs "
                         "(MEMORY/CLAUDE.md); within-run ordering is "
                         "meaningful, cross-run absolute values are not. "
                         "The shipped defaults come from the cleanest "
                         "(fast-phase) runs: b1/fd -> (128,256), "
                         "b3 -> (64,128).",
               "sweep": []}
    for tiles in TILES:
        os.environ["PDWT_TPU_MXU_TILES"] = tiles
        row = {"tiles": tiles}
        jax.block_until_ready(jax.jit(rt)(xb))
        row["bf16_ms"] = round(device_time(rt, xb) * 1e3, 3)
        os.environ["PDWT_TPU_PRECISION"] = "mixed"
        jax.block_until_ready(jax.jit(lambda v: rt(v) * 1.0)(x))
        row["mixed_ms"] = round(
            device_time(lambda v: rt(v) * 1.0, x) * 1e3, 3)
        del os.environ["PDWT_TPU_PRECISION"]
        jax.block_until_ready(jax.jit(ti)(x1b))
        row["ti_bf16_ms"] = round(device_time(ti, x1b) * 1e3, 3)
        results["sweep"].append(row)
        print(row, flush=True)
    del os.environ["PDWT_TPU_MXU_TILES"]

    for mode, key in (("bf16", "bf16_ms"), ("mixed", "mixed_ms"),
                      ("ti_bf16", "ti_bf16_ms")):
        best = min(results["sweep"], key=lambda r: r[key])
        results[f"best_{mode}"] = best["tiles"]
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
